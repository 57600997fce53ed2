"""Device-side image transforms.

The reference does resize/normalize on the host with torchvision/PIL
(reference: matcher/data/dataset.py:32-35, utils/backbone_loader.py:172-196).
Here every transform is a jittable jnp function over NHWC arrays so the whole
per-episode preprocessing fuses into the device graph.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# Normalization constants (RGB, 0-1 range) used by the frozen backbones.
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
SAM_MEAN = (123.675 / 255.0, 116.28 / 255.0, 103.53 / 255.0)
SAM_STD = (58.395 / 255.0, 57.12 / 255.0, 57.375 / 255.0)


def normalize(img: jnp.ndarray, mean: Sequence[float], std: Sequence[float]) -> jnp.ndarray:
    """Channel-normalize an (..., H, W, 3) image in [0, 1]."""
    mean = jnp.asarray(mean, img.dtype)
    std = jnp.asarray(std, img.dtype)
    return (img - mean) / std


def resize(img: jnp.ndarray, size: Tuple[int, int], method: str = "bilinear") -> jnp.ndarray:
    """Resize (..., H, W, C) to (..., size[0], size[1], C)."""
    out_shape = img.shape[:-3] + (size[0], size[1], img.shape[-1])
    return jax.image.resize(img, out_shape, method=method)


def resize_mask(mask: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor resize for (..., H, W) masks."""
    out_shape = mask.shape[:-2] + (size[0], size[1])
    return jax.image.resize(mask, out_shape, method="nearest")


def interpolate_2d(x: jnp.ndarray, size: Tuple[int, int], method: str = "nearest") -> jnp.ndarray:
    """Resize a (..., H, W) map with an arbitrary method (reference:
    mars/MARS.py:77-82 interpolates the VTA prior onto the VVA grid).

    "nearest" uses torch's F.interpolate indexing — source index
    floor(i*in/out) — NOT jax.image.resize's rounding convention: on the
    production 33->37 VTA-grid resize the two pick different source cells
    for 24 of 37 rows."""
    if method == "nearest":
        h, w = x.shape[-2], x.shape[-1]
        ri = (jnp.arange(size[0]) * h) // size[0]
        ci = (jnp.arange(size[1]) * w) // size[1]
        return x[..., ri[:, None], ci[None, :]]
    out_shape = x.shape[:-2] + (size[0], size[1])
    return jax.image.resize(x, out_shape, method=method)


def min_max_scale(x: jnp.ndarray, axis=None, eps: float = 1e-8) -> jnp.ndarray:
    """Scale to [0, 1] over ``axis`` (all axes if None)."""
    mn = jnp.min(x, axis=axis, keepdims=axis is not None)
    mx = jnp.max(x, axis=axis, keepdims=axis is not None)
    return (x - mn) / (mx - mn + eps)


def masked_min_max_scale(x: jnp.ndarray, valid: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Min-max scale a vector over its valid entries only (padded rows ignored).

    Replaces the reference's scaling over ragged per-proposal score lists
    (reference: mars/components/FilteringMergingModule.py:125-132).
    """
    big = jnp.finfo(x.dtype).max
    mn = jnp.min(jnp.where(valid, x, big))
    mx = jnp.max(jnp.where(valid, x, -big))
    return jnp.where(valid, (x - mn) / (mx - mn + eps), 0.0)


@partial(jax.jit, static_argnums=(1, 2))
def adaptive_max_pool(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Adaptive max pooling over the last two axes, torch-compatible windows.

    Torch's window for output i is [floor(i*H/out), ceil((i+1)*H/out)).
    Uniform windows (divisible case, e.g. 518 -> 37 with 14x14 windows,
    reference: mars/components/VisualVisualAlignmentModule.py:72-75) lower to a
    single reshape+max; the general case lowers to two one-axis gathers.
    """
    h, w = x.shape[-2], x.shape[-1]
    if h % out_h == 0 and w % out_w == 0:
        kh, kw = h // out_h, w // out_w
        shp = x.shape[:-2] + (out_h, kh, out_w, kw)
        return jnp.max(x.reshape(shp), axis=(-3, -1))
    return _adaptive_pool_general(x, out_h, out_w, jnp.max)


@partial(jax.jit, static_argnums=(1, 2))
def adaptive_avg_pool(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Adaptive average pooling (reference pools support masks with avg_pool
    then thresholds at 0, matcher/Matcher.py:173-179)."""
    h, w = x.shape[-2], x.shape[-1]
    if h % out_h == 0 and w % out_w == 0:
        kh, kw = h // out_h, w // out_w
        shp = x.shape[:-2] + (out_h, kh, out_w, kw)
        return jnp.mean(x.reshape(shp), axis=(-3, -1))
    return _adaptive_pool_general(x, out_h, out_w, jnp.mean)


def _adaptive_pool_general(x, out_h, out_w, reduce_fn):
    """General adaptive pooling via per-output-cell masked reduction.

    Builds a (out, in) window-membership matrix per axis; max/mean become
    matmul-like masked reductions — static shapes, MXU/VPU friendly.
    """
    h, w = x.shape[-2], x.shape[-1]

    def window_matrix(out_n, in_n):
        i = jnp.arange(out_n)[:, None]
        j = jnp.arange(in_n)[None, :]
        start = (i * in_n) // out_n
        end = -((-(i + 1) * in_n) // out_n)  # ceil
        return (j >= start) & (j < end)  # (out_n, in_n) bool

    wh = window_matrix(out_h, h)
    ww = window_matrix(out_w, w)
    if reduce_fn is jnp.mean:
        whf = wh / jnp.sum(wh, axis=1, keepdims=True)
        wwf = ww / jnp.sum(ww, axis=1, keepdims=True)
        return jnp.einsum(
            "...hw,oh,pw->...op", x, whf, wwf, precision=jax.lax.Precision.HIGHEST
        )
    # max: broadcast-reduce one axis at a time
    neg = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    # (..., out_h, w): for each output row, max over member input rows
    xh = jnp.max(jnp.where(wh[:, :, None], x[..., None, :, :], neg), axis=-2)
    # (..., out_h, out_w): for each output col, max over member input cols
    xw = jnp.max(jnp.where(ww[None, :, :], xh[..., :, None, :], neg), axis=-1)
    return xw


def pool_mask_to_grid(mask: jnp.ndarray, grid: int) -> jnp.ndarray:
    """Pool a (..., H, W) binary mask to (..., grid, grid) via max pooling,
    matching the reference's adaptive_max_pool2d usage for support masks and
    proposals (FilteringMergingModule.py:104-107)."""
    return adaptive_max_pool(mask.astype(jnp.float32), grid, grid)
