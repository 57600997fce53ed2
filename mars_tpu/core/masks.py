"""Device-side mask geometry: boxes, IoU, stability, crops.

Replaces the reference's host-side mask utilities (reference:
segment_anything/utils/amg.py — batched_mask_to_box:310, stability score:156,
uncrop ops:241-272) and torchvision ``batched_nms`` consumers with pure jnp.
Masks stay dense in HBM; there is deliberately no RLE on the device path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def mask_to_box(mask: jnp.ndarray) -> jnp.ndarray:
    """XYXY box around the nonzero region of a (..., H, W) mask.

    Edges are INCLUSIVE pixel indices ([left, top, right, bottom]) and
    empty masks produce [0, 0, 0, 0] — exactly the reference's
    batched_mask_to_box (segment_anything/utils/amg.py:310-352).  The
    convention feeds NMS: a +1 exclusive right/bottom shifts box IoUs
    enough to flip suppression decisions near the threshold.
    """
    h, w = mask.shape[-2], mask.shape[-1]
    m = mask > 0
    rows = jnp.any(m, axis=-1)  # (..., H)
    cols = jnp.any(m, axis=-2)  # (..., W)
    ri = jnp.arange(h)
    ci = jnp.arange(w)
    big = jnp.int32(1 << 30)
    y0 = jnp.min(jnp.where(rows, ri, big), axis=-1)
    y1 = jnp.max(jnp.where(rows, ri, -1), axis=-1)
    x0 = jnp.min(jnp.where(cols, ci, big), axis=-1)
    x1 = jnp.max(jnp.where(cols, ci, -1), axis=-1)
    empty = ~jnp.any(rows, axis=-1)
    box = jnp.stack([x0, y0, x1, y1], axis=-1).astype(jnp.int32)
    return jnp.where(empty[..., None], jnp.zeros_like(box), box)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of (..., 4) XYXY boxes."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0)
    return w * h


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between (N, 4) and (M, 4) XYXY boxes → (N, M)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def mask_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between (N, H, W) and (M, H, W) binary masks → (N, M).

    One batched matmul on flattened masks (MXU-friendly) instead of a host
    loop.
    """
    af = a.reshape(a.shape[0], -1).astype(jnp.float32)
    bf = b.reshape(b.shape[0], -1).astype(jnp.float32)
    inter = af @ bf.T
    union = af.sum(-1)[:, None] + bf.sum(-1)[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def stability_score(mask_logits: jnp.ndarray, mask_threshold: float, offset: float) -> jnp.ndarray:
    """IoU between masks binarized at (thr+offset) and (thr-offset).

    Reference: segment_anything/utils/amg.py:156-177.
    """
    hi = jnp.sum(mask_logits > (mask_threshold + offset), axis=(-1, -2)).astype(jnp.float32)
    lo = jnp.sum(mask_logits > (mask_threshold - offset), axis=(-1, -2)).astype(jnp.float32)
    return hi / jnp.maximum(lo, 1e-9)


def is_box_near_crop_edge(
    boxes: jnp.ndarray, crop_box, orig_box, atol: float = 20.0
) -> jnp.ndarray:
    """True for boxes touching the crop edge but not the original image edge.

    Reference: segment_anything/utils/amg.py:84-100.
    """
    crop = jnp.asarray(crop_box, jnp.float32)
    orig = jnp.asarray(orig_box, jnp.float32)
    b = boxes.astype(jnp.float32)
    near_crop = jnp.abs(b - crop[None]) <= atol
    near_orig = jnp.abs(b - orig[None]) <= atol
    return jnp.any(near_crop & ~near_orig, axis=-1)


def uncrop_boxes_xyxy(boxes: jnp.ndarray, crop_box) -> jnp.ndarray:
    """Shift XYXY boxes from crop coordinates back to image coordinates."""
    x0, y0 = crop_box[0], crop_box[1]
    off = jnp.asarray([x0, y0, x0, y0], boxes.dtype)
    return boxes + off[None]


def uncrop_points(points: jnp.ndarray, crop_box) -> jnp.ndarray:
    """Shift (…, 2) XY points from crop coords to image coords."""
    off = jnp.asarray([crop_box[0], crop_box[1]], points.dtype)
    return points + off


def uncrop_masks(masks: jnp.ndarray, crop_box, orig_h: int, orig_w: int) -> jnp.ndarray:
    """Pad (…, h, w) crop-frame masks back into the (…, H, W) image frame
    (reference segment_anything/utils/amg.py:262-271).  crop_box is a static
    python (x0, y0, x1, y1); shapes stay static."""
    x0, y0, x1, y1 = crop_box
    if x0 == 0 and y0 == 0 and x1 == orig_w and y1 == orig_h:
        return masks
    widths = [(0, 0)] * (masks.ndim - 2)
    widths += [(y0, orig_h - y1), (x0, orig_w - x1)]
    return jnp.pad(masks, widths, constant_values=0)


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray, axis=None, eps: float = 1e-9) -> jnp.ndarray:
    """Mean of ``values`` where ``mask`` is nonzero."""
    m = mask.astype(values.dtype)
    return jnp.sum(values * m, axis=axis) / (jnp.sum(m, axis=axis) + eps)


def coverage_and_prior_scores(
    prior_grid: jnp.ndarray,  # (G, G) prior in [0, 1]
    proposal_grids: jnp.ndarray,  # (P, G, G) pooled proposal masks in {0,1}
    support_grid: jnp.ndarray,  # (G, G) pooled support-side reference area
    alpha: float,
) -> jnp.ndarray:
    """Batched prior-alignment score for every proposal at once.

    score_p = alpha * mean(prior under proposal) + (1-alpha) * coverage where
    coverage = |proposal ∩ prior>0| / |prior>0| — the vectorized form of the
    reference's per-proposal host loop (FilteringMergingModule.py:104-123).
    ``support_grid`` is the thresholded prior footprint used for coverage.
    """
    p = proposal_grids.astype(jnp.float32)
    mean_under = jnp.sum(prior_grid[None] * p, axis=(-1, -2)) / (
        jnp.sum(p, axis=(-1, -2)) + 1e-9
    )
    fg = (support_grid > 0).astype(jnp.float32)
    cov = jnp.sum(fg[None] * p, axis=(-1, -2)) / (jnp.sum(fg) + 1e-9)
    return alpha * mean_under + (1.0 - alpha) * cov
