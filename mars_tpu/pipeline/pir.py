"""Prior Information Refinement (PIR) — fully on device.

Functional parity with the reference's PIR operator
(reference: mars/components/PriorInformationRefinementModule.py:20-122),
which round-trips the prior through numpy/cv2 mid-pipeline.  Here:

  prior (G, G) in [0,1],  A = mean attention (L, L), L = G² →
    B  = union of bounding boxes of the thresholded prior's
         8-connected components           (device kernel, ops.components)
    D  = A / colsum(A);  D = D / rowsum(D)   (the CLIP-ES "Sinkhorn" steps)
    R  = max(D, D Dᵀ);  R = R R
    out = (R ⊙ B_row) @ prior_flat  reshaped to (G, G)

The attention mean arrives pre-reduced from the backbone's attention tap
(models.layers docstring) instead of as 24 x 16 full maps.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mars_tpu.ops.components import component_boxes_union, threshold_prior

_P = jax.lax.Precision.HIGHEST


@jax.jit
def refine(prior: jnp.ndarray, attn_mean: jnp.ndarray, box_threshold: float) -> jnp.ndarray:
    """prior: (G, G); attn_mean: (L, L) with L = G*G. Returns (G, G)."""
    g1, g2 = prior.shape
    fg = threshold_prior(prior, box_threshold)
    b = component_boxes_union(fg).reshape(-1)  # (L,)

    a = attn_mean.astype(jnp.float32)
    d = a / jnp.sum(a, axis=0, keepdims=True)
    d = d / jnp.sum(d, axis=1, keepdims=True)
    ddt = jnp.matmul(d, d.T, precision=_P)
    r = jnp.maximum(d, ddt)
    r = jnp.matmul(r, r, precision=_P)
    r_b = r * b[None, :]
    refined = jnp.matmul(r_b, prior.reshape(-1, 1).astype(jnp.float32), precision=_P)
    return refined.reshape(g1, g2)
