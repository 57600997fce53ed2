"""Box NMS in XLA, matching torchvision.ops.nms semantics.

The reference calls torchvision's C++/CUDA ``batched_nms`` on host tensors
(reference: segment_anything/automatic_mask_generator.py:284-290,370-376,
592-598) with all categories zero — i.e. plain NMS.  Here: one O(N²) IoU
matrix + a scan over boxes in score order, fixed shapes, validity masks.
torchvision suppresses when IoU > threshold (strict), keeps ties.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mars_tpu.core.masks import box_iou


@jax.jit
def nms_keep(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
             iou_threshold: float) -> jnp.ndarray:
    """Greedy NMS → bool keep mask (N,).

    boxes: (N, 4) XYXY; scores: (N,); valid: (N,) padding mask.
    Invalid rows are never kept and never suppress.
    """
    n = boxes.shape[0]
    # score order, invalid rows last; stable tie-break by index like torch sort
    order = jnp.argsort(jnp.where(valid, -scores, jnp.inf), stable=True)
    iou = box_iou(boxes, boxes)  # (N, N)
    iou_ord = iou[order][:, order]
    valid_ord = valid[order]

    # dynamic trip count: invalid rows sort last and can never be kept, so
    # the greedy walk stops at the valid count — a mostly-dead decode
    # layout (combos family, thresholded proposals) pays only for live rows
    n_valid = jnp.sum(valid)

    def cond(c):
        i, _ = c
        return i < n_valid

    def body(c):
        i, keep_ord = c
        # keep i iff valid and no earlier kept box overlaps > thr
        earlier = jnp.arange(n) < i
        suppressed = jnp.any(keep_ord & earlier & (iou_ord[i] > iou_threshold))
        keep_i = valid_ord[i] & ~suppressed
        return i + 1, keep_ord.at[i].set(keep_i)

    _, keep_ord = jax.lax.while_loop(cond, body,
                                     (jnp.int32(0), jnp.zeros((n,), bool)))
    # unsort
    keep = jnp.zeros((n,), bool).at[order].set(keep_ord)
    return keep
