"""Weight-only quantization for the frozen towers (VLM especially).

The reference runs ViP-LLaVA-7B 4/8-bit through bitsandbytes CUDA kernels
(reference: TextRetrieverModule.py:468-471).  The TPU-native equivalent is
weight-only int8/int4 with per-output-channel scales: kernels are stored
quantized in HBM (2-4x less weight traffic — the dominant cost of
autoregressive decoding) and dequantized on the fly; with per-column scales
the scale multiplies AFTER the matmul, so XLA keeps the int8 operand feeding
the MXU directly.

``layers.dense`` understands the quantized leaf format, so quantized params
drop into every model in the zoo unchanged.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# The 16-entry NormalFloat-4 codebook (QLoRA, Dettmers et al. 2023) exactly
# as published in bitsandbytes — the codebook behind the reference's
# ``load_in_4bit`` VLM path (reference: TextRetrieverModule.py:468-471,
# bnb_4bit_quant_type="nf4").  Values are the quantiles of N(0,1) scaled to
# [-1, 1]; index 7 is an exact zero so sparse weights survive.
NF4_CODE = np.array(
    [-1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
     -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
     0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
     0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
     0.7229568362236023, 1.0], np.float32)
# bnb quantizes by binary search against the interval midpoints
_NF4_MID = (NF4_CODE[1:] + NF4_CODE[:-1]) / 2.0

NF4_BLOCK = 64  # bitsandbytes' default blocksize for NF4


@partial(jax.jit, static_argnums=(1,))
def quantize_kernel_nf4(w: jnp.ndarray, block: int = NF4_BLOCK):
    """(in, out) kernel → NF4 leaf: {"nf4": packed codes, "bscale": f32}.

    bitsandbytes blocks the row-major (out, in) weight in runs of 64, i.e.
    along the input dim of each output row; for the transposed (in, out)
    kernel layout that is blocks of 64 along axis 0 per output column.
    Per-block absmax scaling, nearest-codebook rounding (midpoint search —
    identical to bnb's binary search), two codes packed per byte along the
    input dim (even row = low nibble).
    """
    d_in, d_out = w.shape
    assert d_in % block == 0 and d_in % 2 == 0, (d_in, block)
    wf = w.astype(jnp.float32).reshape(d_in // block, block, d_out)
    bscale = jnp.max(jnp.abs(wf), axis=1)            # (in/block, out)
    xn = wf / jnp.maximum(bscale, 1e-12)[:, None, :]
    codes = jnp.searchsorted(jnp.asarray(_NF4_MID), xn.reshape(d_in, d_out))
    lo, hi = codes[0::2], codes[1::2]
    packed = (lo | (hi << 4)).astype(jnp.int8)       # bit pattern only
    return {"nf4": packed, "bscale": bscale.astype(jnp.float32)}


def dequantize_nf4(p, dtype=jnp.float32) -> jnp.ndarray:
    """NF4 leaf → dense (in, out) weights: codebook lookup × block scales."""
    packed = p["nf4"].astype(jnp.int32) & 0xFF       # undo int8 sign-extend
    lo, hi = packed & 0xF, (packed >> 4) & 0xF
    n2, d_out = p["nf4"].shape
    codes = jnp.stack([lo, hi], axis=1).reshape(n2 * 2, d_out)
    vals = jnp.take(jnp.asarray(NF4_CODE), codes, axis=0)
    block = (n2 * 2) // p["bscale"].shape[0]
    scale = jnp.repeat(p["bscale"], block, axis=0)
    return (vals * scale).astype(dtype)


@partial(jax.jit, static_argnums=(1,))
def quantize_kernel(w: jnp.ndarray, bits: int = 8):
    """(in, out) kernel → quantized leaf with per-output-channel scales.

    bits=8: {"q": int8 (in, out), "scale": f32 (out,)}.
    bits=4: {"q4": int8 (in/2, out) with two nibbles packed along the input
    dim, "scale": f32 (out,)} — native jnp.int4 arrays cannot cross a jit
    boundary on this environment (argument resharding recurses), so 4-bit
    is stored packed and unpacked inside the matmul (ops.int4_matmul).

    Jitted (cached per kernel shape — a ViT has only a handful): the eager
    version costs ~6 device round trips per kernel, ~15 s per tower on a
    remote-attached chip."""
    assert bits in (4, 8)
    maxq = 127.0 if bits == 8 else 7.0
    absmax = jnp.max(jnp.abs(w), axis=0)
    scale = absmax / maxq
    q = jnp.round(w / jnp.maximum(scale, 1e-12)[None, :])
    q = jnp.clip(q, -maxq, maxq).astype(jnp.int8)
    if bits == 4:
        from mars_tpu.ops.int4_matmul import pack_int4

        return {"q4": pack_int4(q), "scale": scale.astype(jnp.float32)}
    return {"q": q, "scale": scale.astype(jnp.float32)}


def dequantize_kernel(p) -> jnp.ndarray:
    if "nf4" in p:
        return dequantize_nf4(p)
    if "q4" in p:
        from mars_tpu.ops.int4_matmul import unpack_int4

        return unpack_int4(p["q4"]).astype(jnp.float32) * p["scale"][None, :]
    return p["q"].astype(jnp.float32) * p["scale"][None, :]


def quantized_dense(p, x):
    """x @ W for a quantized kernel: int matmul + per-column rescale.

    Kernels carrying an ``act8`` marker (quantize_params(act_bits=8)) also
    quantize the ACTIVATIONS per row on the fly: the MXU then runs a true
    s8 x s8 -> s32 matmul — ~2x the bf16 peak on v5e — and the result is
    rescaled by (row scale x column scale).  Dynamic per-row absmax keeps
    it calibration-free (the bnb "LLM.int8" pattern without outlier
    decomposition — adequate for the frozen ViT towers)."""
    k = p["kernel"]
    if "q" in k and "act8" in k and jnp.issubdtype(x.dtype, jnp.floating):
        ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        sx = jnp.maximum(ax, 1e-8) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127)
        y = jnp.einsum("...i,io->...o", xq.astype(jnp.int8), k["q"],
                       preferred_element_type=jnp.int32)
        y = (y.astype(jnp.float32) * sx * k["scale"]).astype(x.dtype)
        if "bias" in p:
            y = y + p["bias"]
        return y
    if "nf4" in k:
        # The reference's NF4 --vlm4bit numerics (bnb codebook + per-64
        # absmax).  On TPU the Pallas kernel streams packed codes + block
        # scales and does the 16-entry lookup in VMEM (select tree — no
        # vector gather on the VPU); elsewhere, dequant to the activation
        # dtype and run a dense matmul (the XLA einsum over a materialized
        # bf16 weight measured 304 ms/step on the 7B through the tunnel).
        from mars_tpu.ops import int4_matmul

        if jax.default_backend() == "tpu" and k["nf4"].shape[0] % 32 == 0:
            shape = x.shape
            y = int4_matmul.matmul_nf4(
                x.reshape(-1, shape[-1]), k["nf4"], k["bscale"])
            y = y.reshape(shape[:-1] + (k["nf4"].shape[1],)).astype(x.dtype)
        else:
            w = dequantize_nf4(k, x.dtype)
            y = jnp.einsum("...i,io->...o", x, w,
                           preferred_element_type=jnp.float32).astype(x.dtype)
    elif "q4" in k:
        from mars_tpu.ops import int4_matmul

        if jax.default_backend() == "tpu":
            shape = x.shape
            y = int4_matmul.matmul_int4(
                x.reshape(-1, shape[-1]), k["q4"], k["scale"])
            y = y.reshape(shape[:-1] + (k["q4"].shape[1],))
        else:
            w = int4_matmul.unpack_int4(k["q4"]).astype(x.dtype)
            y = jnp.einsum("...i,io->...o", x, w,
                           preferred_element_type=jnp.float32)
            y = (y * k["scale"]).astype(x.dtype)
    else:
        y = jnp.einsum(
            "...i,io->...o", x, k["q"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        y = (y * k["scale"]).astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"]
    return y


def quantize_params(params, bits: int = 8, min_size: int = 1 << 14,
                    act_bits: int = None, int4_format: str = "affine"):
    """Quantize every 2-D floating kernel with ≥ min_size elements.

    Leaves biases, norms, embeddings (1-D/3-D+) untouched.  Returns a pytree
    layers.dense consumes transparently.  ``act_bits=8`` (with bits=8) marks
    kernels for dynamic activation quantization too — true s8xs8 MXU
    matmuls (see quantized_dense).  ``int4_format`` (with bits=4):
    "affine" = hybrid-packed uniform int4 (the speed/memory kernel),
    "nf4" = the bitsandbytes NormalFloat-4 codebook the reference's
    --vlm4bit uses — numerics parity at a dense-matmul cost.
    """
    assert int4_format in ("affine", "nf4"), int4_format

    def q(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
        leaf_name = names[-1] if names else ""
        # NOTE: lm_head stays floating — bitsandbytes (the reference's 8-bit
        # loader) skips it too; int8 argmax over near-tied logits flips
        # greedy tokens, and the head is only ~3% of decode bandwidth
        if (
            leaf_name == "kernel"
            and hasattr(leaf, "ndim")
            and leaf.ndim == 2
            and jnp.issubdtype(leaf.dtype, jnp.floating)
            and leaf.size >= min_size
        ):
            if bits == 4 and int4_format == "nf4":
                arr = jnp.asarray(leaf)
                if arr.shape[0] % NF4_BLOCK == 0:
                    return quantize_kernel_nf4(arr)
                # non-block-multiple input dim (none in the zoo at
                # production scale): fall through to affine int4
            out = quantize_kernel(jnp.asarray(leaf), bits)
            if act_bits == 8 and bits == 8:
                out["act8"] = jnp.ones((), jnp.int8)  # marker leaf
            return out
        return leaf

    return jax.tree_util.tree_map_with_path(
        q, params, is_leaf=lambda x: not isinstance(x, dict)
    )
