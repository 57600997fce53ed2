"""Swin Transformer backbone (pure functions over param pytrees, NHWC).

The Semantic-SAM variant of the Matcher drives a SwinL-backed network
(reference: matcher/Matcher_SemanticSAM.py:23 imports the external
``semantic_sam`` package — the reference does not vendor it; this is the
TPU-native implementation of that backbone).  Inference path only:
window / shifted-window attention with relative position bias, patch
merging between stages, per-stage feature maps out.

TPU notes: window partitioning is pure reshape/transpose (no gathers),
the shift is a static jnp.roll, and attention masks plus relative-index
tables are compile-time constants — every block lowers to dense MXU
matmuls over (num_windows·B, ws², C) tiles.

Parity: tested against the transformers SwinModel oracle (same
architecture family; weight layout converted in models/convert.py).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mars_tpu.models import layers as L


@dataclass(frozen=True)
class SwinConfig:
    patch_size: int = 4
    embed_dim: int = 192  # Swin-L
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (6, 12, 24, 48)
    window: int = 12
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-5

    @property
    def num_stages(self) -> int:
        return len(self.depths)

    def stage_dim(self, i: int) -> int:
        return self.embed_dim * (2 ** i)


SWIN_L = SwinConfig()
# Semantic-SAM's released SwinL uses window 12 @ 1024-px class of inputs;
# the tiny test config mirrors the structure at toy scale.


def _rel_index(window: int, table_window: int = None) -> np.ndarray:
    """(ws², ws²) index into the relative-position-bias table (standard
    Swin construction).  ``table_window`` is the window the TABLE was built
    for — its rows are laid out with stride ``2*table_window - 1``.  When a
    small input clamps the runtime window below cfg.window, the index must
    still use the table's stride (converted checkpoints lay the table out
    for cfg.window), reading the central sub-range of offsets."""
    tw = table_window if table_window is not None else window
    assert window <= tw
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))  # (2, w, w)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, w², w²)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += tw - 1
    rel[:, :, 1] += tw - 1
    rel[:, :, 0] *= 2 * tw - 1
    return (rel[:, :, 0] + rel[:, :, 1]).astype(np.int32)


def _shift_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """(nW, ws², ws²) additive attention mask for shifted windows."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    for hs in slices:
        for ws_ in slices:
            img[hs, ws_] = cnt
            cnt += 1
    nw_h, nw_w = h // window, w // window
    win = img.reshape(nw_h, window, nw_w, window).transpose(0, 2, 1, 3)
    win = win.reshape(-1, window * window)
    mask = win[:, :, None] != win[:, None, :]
    return np.where(mask, -100.0, 0.0).astype(np.float32)


def _window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """(B, H, W, C) → (B·nW, ws², C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, c)


def _window_reverse(x: jnp.ndarray, window: int, h: int, w: int) -> jnp.ndarray:
    b = x.shape[0] // ((h // window) * (w // window))
    x = x.reshape(b, h // window, w // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


def _window_attention(p, x, num_heads: int, rel_idx, mask=None):
    """x: (nWB, ws², C); mask: (nW, ws², ws²) additive or None."""
    nwb, l, c = x.shape
    hd = c // num_heads
    qkv = L.dense(p["qkv"], x).reshape(nwb, l, 3, num_heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    q = q * (hd ** -0.5)
    logits = jnp.einsum("blhd,bmhd->bhlm", q, k)
    bias = p["rel_bias_table"][rel_idx]  # (ws², ws², heads)
    logits = logits + bias.transpose(2, 0, 1)[None]
    if mask is not None:
        nw = mask.shape[0]
        logits = logits.reshape(nwb // nw, nw, num_heads, l, l)
        logits = logits + mask[None, :, None]
        logits = logits.reshape(nwb, num_heads, l, l)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(nwb, l, c)
    return L.dense(p["proj"], out)


def _swin_block(p, x, num_heads: int, window: int, shift: int, rel_idx,
                mask, ln_eps: float):
    b, h, w, c = x.shape
    shortcut = x
    y = L.layer_norm(p["ln1"], x, eps=ln_eps)
    # torch Swin zero-pads to window multiples inside EVERY block (and
    # crops after), so pad tokens enter each block as zeros
    ph, pw = -h % window, -w % window
    if ph or pw:
        y = jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)))
    if shift:
        y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
    fh, fw = h + ph, w + pw
    y = _window_partition(y, window)
    y = _window_attention(p["attn"], y, num_heads, rel_idx, mask)
    y = _window_reverse(y, window, fh, fw)
    if shift:
        y = jnp.roll(y, (shift, shift), axis=(1, 2))
    if ph or pw:
        y = y[:, :h, :w]
    x = shortcut + y
    x = x + L.mlp(p["mlp"], L.layer_norm(p["ln2"], x, eps=ln_eps), L.exact_gelu)
    return x


def _patch_merge(p, x, ln_eps: float):
    """(B, H, W, C) → (B, H/2, W/2, 2C): concat 2x2 neighbours (torch
    order: x[0::2,0::2], x[1::2,0::2], x[0::2,1::2], x[1::2,1::2]),
    LN, then 4C→2C reduction."""
    x = jnp.concatenate(
        [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
        axis=-1,
    )
    x = L.layer_norm(p["norm"], x, eps=ln_eps)
    return L.dense(p["reduction"], x)


@partial(jax.jit, static_argnames=("cfg",))
def forward_features(params, images: jnp.ndarray, cfg: SwinConfig):
    """images: (B, H, W, 3) normalized → dict stage{i}: (B, Hi, Wi, Ci)
    per-stage pre-downsample feature maps (the multi-scale pyramid the
    pixel decoder consumes)."""
    b, h, w, _ = images.shape
    x = L.conv_patch_embed(params["patch_embed"], images, cfg.patch_size)
    gh, gw = h // cfg.patch_size, w // cfg.patch_size
    x = L.layer_norm(params["patch_norm"], x, eps=cfg.ln_eps)
    x = x.reshape(b, gh, gw, cfg.embed_dim)

    out = {}
    for s in range(cfg.num_stages):
        sh, sw = x.shape[1], x.shape[2]
        # torch Swin: clamp the window to the resolution and drop the shift
        # when a single window covers the map
        window = min(cfg.window, sh, sw)
        shift = 0 if min(sh, sw) <= window else window // 2
        fh, fw = sh + (-sh % window), sw + (-sw % window)
        rel_idx = jnp.asarray(_rel_index(window, cfg.window))
        mask = (jnp.asarray(_shift_mask(fh, fw, window, shift))
                if shift else None)
        sp = params[f"stage{s}"]
        for i in range(cfg.depths[s]):
            blk_shift = shift if i % 2 else 0
            x = _swin_block(sp[f"block{i}"], x, cfg.num_heads[s], window,
                            blk_shift, rel_idx,
                            mask if blk_shift else None, cfg.ln_eps)
        out[f"stage{s}"] = x
        if s + 1 < cfg.num_stages:
            # patch merging pads odd dims (torch F.pad in maybe_pad)
            if sh % 2 or sw % 2:
                x = jnp.pad(x, ((0, 0), (0, sh % 2), (0, sw % 2), (0, 0)))
            x = _patch_merge(sp["downsample"], x, cfg.ln_eps)
    return out


def init_params(key, cfg: SwinConfig):
    """Random params with the converter's exact tree structure."""
    keys = iter(jax.random.split(key, 512))

    def dense_p(di, do, std=0.02):
        return L._init_dense(next(keys), di, do, std=std)

    params = {
        "patch_embed": {
            "kernel": jax.random.normal(
                next(keys), (cfg.patch_size, cfg.patch_size, 3, cfg.embed_dim)
            ) * 0.02,
            "bias": jnp.zeros((cfg.embed_dim,)),
        },
        "patch_norm": L._init_ln(cfg.embed_dim),
    }
    for s in range(cfg.num_stages):
        dim = cfg.stage_dim(s)
        stage = {}
        for i in range(cfg.depths[s]):
            stage[f"block{i}"] = {
                "ln1": L._init_ln(dim),
                "ln2": L._init_ln(dim),
                "attn": {
                    "qkv": dense_p(dim, 3 * dim),
                    "proj": dense_p(dim, dim),
                    "rel_bias_table": jax.random.normal(
                        next(keys),
                        ((2 * cfg.window - 1) ** 2, cfg.num_heads[s]),
                    ) * 0.02,
                },
                "mlp": {
                    "fc1": dense_p(dim, int(dim * cfg.mlp_ratio)),
                    "fc2": dense_p(int(dim * cfg.mlp_ratio), dim),
                },
            }
        if s + 1 < cfg.num_stages:
            stage["downsample"] = {
                "norm": L._init_ln(4 * dim),
                "reduction": L._init_dense(next(keys), 4 * dim, 2 * dim,
                                           bias=False),
            }
        params[f"stage{s}"] = stage
    return params
