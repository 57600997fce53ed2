"""Shared functional transformer layers for the frozen-backbone model zoo.

One parameterized layer set covers all four ViT dialects the pipeline needs
(DINOv2, CLIP, AlphaCLIP, SAM-ViT).  Models are *pure functions over param
pytrees* (the nested dicts produced by ``models.convert``): frozen inference
models need no module machinery, and Grad-CAM style taps become ordinary
``jax.value_and_grad`` over an intermediate activation.

Attention-map statistics: the refinement operator (PIR) only ever consumes
the *mean over the last N blocks and all heads* of the patch-token attention
probabilities (reference: mars/components/PriorInformationRefinementModule.py:31-44).
Instead of materializing per-block per-head maps (24 x 16 x 1374 x 1374 fp32
~ 1.2 GB in the reference, SURVEY §5.7/§7.8), blocks return the
head-averaged map and the backbone keeps a running sum — ~400x less HBM
traffic, in the same pass that produces features.

Layout: batch-first (B, L, D) tokens; images NHWC.
"""
from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def quick_gelu(x):
    """CLIP's QuickGELU (reference: clip/model.py:274-276)."""
    return x * jax.nn.sigmoid(1.702 * x)


def exact_gelu(x):
    """torch.nn.GELU default (erf formulation), used by DINOv2 and SAM."""
    return jax.nn.gelu(x, approximate=False)


def layer_norm(p, x, eps: float = 1e-5):
    """LayerNorm in float32 regardless of input dtype (fp16-safe, matching
    the CLIP fork's LayerNorm, reference: clip/model.py:266-271)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(dtype)


def dense(p, x):
    k = p["kernel"]
    if isinstance(k, dict):  # weight-only quantized (models.quantization)
        from mars_tpu.models.quantization import quantized_dense

        return quantized_dense(p, x)
    y = x @ k
    if "bias" in p:
        y = y + p["bias"]
    return y


def conv_patch_embed(p, images, patch_size: int):
    """(B, H, W, C) → (B, gh*gw, D) via a stride-p convolution (MXU-friendly:
    lowered by XLA to one big matmul over p*p*C patches).  Images follow the
    kernel dtype, so bf16-cast params make the whole tower bf16."""
    y = jax.lax.conv_general_dilated(
        images.astype(p["kernel"].dtype),
        p["kernel"],
        window_strides=(patch_size, patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"]
    b, gh, gw, d = y.shape
    return y.reshape(b, gh * gw, d)


# Tapped self-attention implementation.  "pallas" fuses the head-mean
# reduction into the attention kernel (ops.flash_attention) instead of
# materializing per-head probs in HBM; measured 1.61 vs 2.06 ms/layer at
# DINOv2-L@518 geometry on v5e (in-program — standalone timings are
# swamped by the ~32 ms tunnel dispatch floor for ANY program, which is
# what round 1 mistook for pallas overhead).  "auto" = pallas on TPU.
_ATTENTION_IMPL = os.environ.get("MARS_ATTENTION_IMPL", "auto")


def set_attention_impl(impl: str):
    global _ATTENTION_IMPL
    assert impl in ("auto", "xla", "pallas", "pallas_interpret")
    _ATTENTION_IMPL = impl


def _attention_impl() -> str:
    if _ATTENTION_IMPL == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return _ATTENTION_IMPL


# Untapped-block attention impl: "xla" by measurement (see mha below);
# interpret-mode tests follow the main impl switch so kernel-parity tests
# drive the notap path the same way they drive the tapped one.
_ATTENTION_NOTAP_IMPL = os.environ.get("MARS_ATTENTION_NOTAP_IMPL", "xla")


def _notap_impl() -> str:
    if _ATTENTION_IMPL in ("pallas_interpret", "xla"):
        # follow the main switch when it is pinned: interpret-mode tests
        # drive the kernel; an explicit "xla" pin (parallel.runner's
        # GSPMD-auto trace — pallas_call cannot be auto-partitioned) must
        # silence BOTH kernels
        return _ATTENTION_IMPL
    return _ATTENTION_NOTAP_IMPL


import contextlib as _contextlib


@_contextlib.contextmanager
def attention_impl(impl: str):
    """Trace-time override of the attention implementation.

    ``mha`` reads the module global while the caller's function is being
    TRACED, so wrapping the body of a jitted/shard_mapped function in this
    context pins the impl for that program only (used by parallel.runner:
    a pallas_call cannot be auto-partitioned by GSPMD, so programs whose
    towers shard over an auto mesh axis must trace the XLA path)."""
    global _ATTENTION_IMPL
    prev = _ATTENTION_IMPL
    set_attention_impl(impl)
    try:
        yield
    finally:
        _ATTENTION_IMPL = prev


def mha(p, x, num_heads: int, return_attn: bool = False, mask=None,
        force_xla: bool = False):
    """Multi-head self-attention with optional head-averaged prob tap.

    The tap returns the (B, L, L) head-mean of softmax(qk) — exactly torch
    MultiheadAttention's ``need_weights=True`` output that PIR consumes
    (reference: clip/model.py:293-295, dinov2/layers/attention.py:49-68).

    ``force_xla``: callers that differentiate through the tap (the Grad-CAM
    head) must take the XLA path — pallas_call has no VJP.
    """
    b, l, d = x.shape
    head_dim = d // num_heads
    qkv = dense(p["qkv"], x).reshape(b, l, 3, num_heads, head_dim)
    if (return_attn and mask is None and not force_xla
            and _attention_impl() != "xla"):
        from mars_tpu.ops import flash_attention

        # qkv keeps the tower dtype: K/V stream through VMEM at input width
        # (logits/softmax/tap accumulate in f32 inside the kernel)
        out, attn = flash_attention.mha_pallas(
            qkv, num_heads,
            interpret=_attention_impl() == "pallas_interpret",
        )
        return dense(p["proj"], out.astype(x.dtype)), attn
    if (not return_attn and mask is None and not force_xla
            and _notap_impl() != "xla"):
        # UNTAPPED blocks default to XLA by measurement, not by omission:
        # ops/flash_attention.attention_notap LOSES to the XLA schedule at
        # both production geometries on v5e (AlphaCLIP L/14@336 B=16:
        # 2.52 vs 2.32 ms/layer; DINOv2-L@518 B=1: 4.08 vs 1.83 —
        # tools/clip_attn_ab.py, BASELINE.md).  Unlike the tapped case,
        # XLA is free to fuse untapped attention without materializing the
        # (B, H, L, L) probs for a second consumer, and it does.
        # MARS_ATTENTION_NOTAP_IMPL=pallas re-routes for re-measurement.
        from mars_tpu.ops import flash_attention

        out = flash_attention.mha_pallas_notap(
            qkv, num_heads,
            interpret=_notap_impl() == "pallas_interpret",
        )
        return dense(p["proj"], out.astype(x.dtype)), None
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, L, H, hd)
    q = q * (head_dim ** -0.5)
    # logits follow the tower dtype (bf16 towers keep the big (B,H,L,L)
    # tensor half-width — measured 1.7x on the AlphaCLIP stage); the softmax
    # itself and the PIR statistics compute in f32
    logits = jnp.einsum("blhd,bmhd->bhlm", q, k)
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhlm,bmhd->blhd", probs.astype(x.dtype), v).reshape(b, l, d)
    out = dense(p["proj"], out)
    if return_attn:
        return out, jnp.mean(probs, axis=1)
    return out, None


def mlp(p, x, act: Callable):
    return dense(p["fc2"], act(dense(p["fc1"], x)))


def block(
    p,
    x,
    num_heads: int,
    act: Callable = exact_gelu,
    ln_eps: float = 1e-5,
    return_attn: bool = False,
    mask=None,
):
    """Pre-LN residual block covering DINOv2 (layerscale) and CLIP dialects.

    x = x + ls1(attn(ln1(x))); x = x + ls2(mlp(ln2(x)))
    (reference: dinov2/layers/block.py:86-115, clip/model.py:297-302).
    """
    a, attn_probs = mha(p["attn"], layer_norm(p["ln1"], x, ln_eps), num_heads,
                        return_attn=return_attn, mask=mask)
    if "ls1" in p:
        a = a * p["ls1"]["gamma"]
    x = x + a
    h = mlp(p["mlp"], layer_norm(p["ln2"], x, ln_eps), act)
    if "ls2" in p:
        h = h * p["ls2"]["gamma"]
    x = x + h
    return x, attn_probs


def _torch_cubic_1d(x: jnp.ndarray, out_len: int, scale: float, axis: int,
                    a: float = -0.75) -> jnp.ndarray:
    """torch F.interpolate(mode='bicubic', align_corners=False,
    antialias=False) along one axis: Keys kernel with A=-0.75 (jax.image's
    'cubic' is Catmull-Rom A=-0.5), source coords (i+0.5)/scale - 0.5 with
    border replication.  ``scale`` is the torch scale FACTOR — under
    DINOv2's interpolate_offset kludge it is (w0+offset)/M, NOT w0/M."""
    in_len = x.shape[axis]
    src = (jnp.arange(out_len, dtype=jnp.float32) + 0.5) / scale - 0.5
    i0 = jnp.floor(src).astype(jnp.int32)
    t = src - i0  # in [0, 1)

    def k(dist):  # Keys cubic kernel
        d = jnp.abs(dist)
        near = (a + 2.0) * d ** 3 - (a + 3.0) * d ** 2 + 1.0
        far = a * d ** 3 - 5.0 * a * d ** 2 + 8.0 * a * d - 4.0 * a
        return jnp.where(d <= 1.0, near, jnp.where(d < 2.0, far, 0.0))

    offs = jnp.arange(-1, 3)
    weights = k(t[None, :] - offs[:, None])  # (4, out)
    idx = jnp.clip(i0[None, :] + offs[:, None], 0, in_len - 1)  # (4, out)
    gathered = jnp.take(x, idx.reshape(-1), axis=axis)
    gshape = list(x.shape)
    gshape[axis:axis + 1] = [4, out_len]
    gathered = gathered.reshape(gshape)
    wshape = [1] * gathered.ndim
    wshape[axis], wshape[axis + 1] = 4, out_len
    return jnp.sum(gathered * weights.reshape(wshape), axis=axis)


def interpolate_pos_embed(
    pos_embed: jnp.ndarray,
    grid_hw: Tuple[int, int],
    num_prefix: int = 1,
    method: str = "bicubic",
    antialias: bool = False,
    interpolate_offset: float = 0.0,
) -> jnp.ndarray:
    """Resample a (1, num_prefix + P, D) learned pos embed to a new grid.

    Covers DINOv2's bicubic interpolation (reference:
    dinov2/models/vision_transformer.py:188-222) and CLIP's bilinear
    ``upsample_pos_emb`` (reference: clip/model.py:102-117).  Prefix tokens
    (CLS) pass through untouched.

    ``method='bicubic'`` reproduces torch semantics exactly: the Keys
    A=-0.75 kernel, and — when ``interpolate_offset`` is nonzero (DINOv2's
    default 0.1 "historical kludge", :204-209) — SCALE-FACTOR-based source
    coordinates (i+0.5)·M/(w0+offset) - 0.5 rather than size-based ones.
    'bilinear' keeps jax.image.resize (identical to torch half-pixel).
    """
    prefix = pos_embed[:, :num_prefix]
    grid = pos_embed[:, num_prefix:]
    n, d = grid.shape[1], grid.shape[2]
    m = int(round(n ** 0.5))
    assert m * m == n, f"pos embed grid is not square: {n}"
    h, w = grid_hw
    if (h, w) == (m, m):
        return pos_embed
    grid = grid.reshape(1, m, m, d).astype(jnp.float32)
    if method == "bicubic":
        assert not antialias, "antialiased bicubic pos-embed not implemented"
        sy = (h + interpolate_offset) / m if interpolate_offset else h / m
        sx = (w + interpolate_offset) / m if interpolate_offset else w / m
        grid = _torch_cubic_1d(grid, h, sy, axis=1)
        grid = _torch_cubic_1d(grid, w, sx, axis=2)
    else:
        jmethod = {"bilinear": "linear"}.get(method, method)
        grid = jax.image.resize(grid, (1, h, w, d), method=jmethod,
                                antialias=antialias)
    grid = grid.reshape(1, h * w, d).astype(pos_embed.dtype)
    return jnp.concatenate([prefix.astype(pos_embed.dtype), grid], axis=1)


# ---------------------------------------------------------------------------
# random init (for tests / benchmarks without checkpoints)
# ---------------------------------------------------------------------------

def _init_dense(key, d_in, d_out, bias=True, std=0.02):
    k1, _ = jax.random.split(key)
    p = {"kernel": jax.random.normal(k1, (d_in, d_out), jnp.float32) * std}
    if bias:
        p["bias"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _init_ln(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def init_block_params(key, dim, mlp_hidden, layer_scale: Optional[float] = None, qkv_bias=True):
    ks = jax.random.split(key, 4)
    p = {
        "ln1": _init_ln(dim),
        "ln2": _init_ln(dim),
        "attn": {
            "qkv": _init_dense(ks[0], dim, 3 * dim, bias=qkv_bias),
            "proj": _init_dense(ks[1], dim, dim),
        },
        "mlp": {
            "fc1": _init_dense(ks[2], dim, mlp_hidden),
            "fc2": _init_dense(ks[3], mlp_hidden, dim),
        },
    }
    if layer_scale is not None:
        p["ls1"] = {"gamma": jnp.full((dim,), layer_scale, jnp.float32)}
        p["ls2"] = {"gamma": jnp.full((dim,), layer_scale, jnp.float32)}
    return p
