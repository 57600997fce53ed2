"""Multi-scale deformable attention (Deformable-DETR / MaskDINO family).

The Semantic-SAM pixel decoder is a MaskDINO encoder built on
MSDeformAttn; the reference consumes it through the external
``semantic_sam`` package (reference: matcher/Matcher_SemanticSAM.py:23).
CUDA implementations use a custom im2col kernel; on TPU the same math is
a batched bilinear gather + weighted sum, which XLA lowers to vector
gathers — no custom kernel needed (the op is gather-bound, not MXU-bound).

Parity: the core is tested against the transformers
MultiScaleDeformableAttention torch fallback (grid_sample with
align_corners=False, zero padding).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from mars_tpu.models import layers as L


def _bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """grid_sample(bilinear, padding zeros, align_corners=False).

    img: (N, H, W, D); x, y: (N, S) pixel-space coords (already mapped
    from the normalized grid).  → (N, S, D)
    """
    n, h, w, d = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    out = 0.0
    for dy, wy in ((0, 1.0 - wy1), (1, wy1)):
        for dx, wx in ((0, 1.0 - wx1), (1, wx1)):
            xi = x0.astype(jnp.int32) + dx
            yi = y0.astype(jnp.int32) + dy
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            xi = jnp.clip(xi, 0, w - 1)
            yi = jnp.clip(yi, 0, h - 1)
            v = img[jnp.arange(n)[:, None], yi, xi]  # (N, S, D)
            out = out + v * (wx * wy * valid)[..., None]
    return out


def msda_core(
    value: jnp.ndarray,  # (B, L, H, D) — L = sum of level sizes
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,  # (B, Q, H, levels, P, 2) in [0, 1]
    attention_weights: jnp.ndarray,  # (B, Q, H, levels, P), sums to 1
) -> jnp.ndarray:
    """→ (B, Q, H·D).  Matches the Deformable-DETR reference math."""
    b, l, nh, d = value.shape
    q = sampling_locations.shape[1]
    grids = 2.0 * sampling_locations - 1.0
    start = 0
    out = 0.0
    for lev, (hh, ww) in enumerate(spatial_shapes):
        v = value[:, start:start + hh * ww]
        start += hh * ww
        v = v.transpose(0, 2, 1, 3).reshape(b * nh, hh, ww, d)
        g = grids[:, :, :, lev]  # (B, Q, H, P, 2)
        g = g.transpose(0, 2, 1, 3, 4).reshape(b * nh, q * g.shape[3], 2)
        # align_corners=False: pixel = ((grid + 1) * size - 1) / 2
        px = ((g[..., 0] + 1.0) * ww - 1.0) / 2.0
        py = ((g[..., 1] + 1.0) * hh - 1.0) / 2.0
        sampled = _bilinear_sample(v, px, py)  # (BH, Q*P, D)
        p = sampling_locations.shape[4]
        sampled = sampled.reshape(b, nh, q, p, d)
        wts = attention_weights[:, :, :, lev].transpose(0, 2, 1, 3)  # (B,H,Q,P)
        out = out + jnp.einsum("bhqpd,bhqp->bhqd", sampled, wts)
    return out.transpose(0, 2, 1, 3).reshape(b, q, nh * d)


def init_msda_params(key, d_model: int, num_heads: int, num_levels: int,
                     num_points: int):
    k = jax.random.split(key, 4)
    return {
        "value_proj": L._init_dense(k[0], d_model, d_model),
        "sampling_offsets": L._init_dense(
            k[1], d_model, num_heads * num_levels * num_points * 2, std=0.01),
        "attention_weights": L._init_dense(
            k[2], d_model, num_heads * num_levels * num_points, std=0.01),
        "output_proj": L._init_dense(k[3], d_model, d_model),
    }


def msda_layer(
    p,
    query: jnp.ndarray,  # (B, Q, C)
    reference_points: jnp.ndarray,  # (B, Q, levels, 2) in [0,1] or (..., 4)
    value: jnp.ndarray,  # (B, L, C)
    spatial_shapes: Sequence[Tuple[int, int]],
    num_heads: int,
    num_points: int,
) -> jnp.ndarray:
    """Full MSDeformAttn layer (Deformable-DETR MSDeformAttn.forward).

    ``value`` may have batch 1 while ``query`` is batched (shared memory,
    e.g. many interactive clicks against one encoded image): the value is
    projected ONCE and queries are folded into its batch for the gather —
    broadcasting the memory per query would materialize B×L×C.
    """
    b, q, c = query.shape
    nl = len(spatial_shapes)
    d = c // num_heads
    shared = value.shape[0] == 1 and b > 1
    v = L.dense(p["value_proj"], value).reshape(value.shape[0], -1,
                                                num_heads, d)
    off = L.dense(p["sampling_offsets"], query).reshape(
        b, q, num_heads, nl, num_points, 2)
    w = L.dense(p["attention_weights"], query).reshape(
        b, q, num_heads, nl * num_points)
    w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(query.dtype)
    w = w.reshape(b, q, num_heads, nl, num_points)
    if reference_points.shape[-1] == 2:
        norm = jnp.asarray([[ww, hh] for hh, ww in spatial_shapes],
                           jnp.float32)  # (levels, 2) as (w, h)
        loc = (reference_points[:, :, None, :, None, :]
               + off / norm[None, None, None, :, None, :])
    else:  # box reference: offsets scaled by box size / num_points
        loc = (reference_points[:, :, None, :, None, :2]
               + off / num_points
               * reference_points[:, :, None, :, None, 2:] * 0.5)
    if shared:
        loc = loc.reshape(1, b * q, num_heads, nl, num_points, 2)
        w = w.reshape(1, b * q, num_heads, nl, num_points)
        out = msda_core(v, spatial_shapes, loc, w).reshape(b, q, c)
    else:
        out = msda_core(v, spatial_shapes, loc, w)
    return L.dense(p["output_proj"], out)
