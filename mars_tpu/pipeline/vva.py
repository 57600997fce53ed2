"""Visual-Visual Alignment (VVA): DINOv2 patch-matching prior.

Functional parity with the reference
(reference: mars/components/VisualVisualAlignmentModule.py:42-131):
  - L2-normalized prenorm patch features for support shots and query
  - similarity S = sup @ qryᵀ and cost C = (1-S)/2, kept ON DEVICE (the
    reference ships them to CPU for the later EMD loop, :69-70)
  - fg prior = colmax·colmean of masked-support→query similarities, minus
    the same for background patches when any exist (:78-101)
  - min-max scale, PIR refinement over the query's mean attention (taken
    from the same forward pass — the reference runs DINOv2 twice), min-max.

Fixed shapes: the shot dimension is padded; padded shots contribute
neither foreground nor background patches.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from mars_tpu.core import imaging
from mars_tpu.models import dinov2
from mars_tpu.pipeline import pir

_P = jax.lax.Precision.HIGHEST
NEG = -1e9


@dataclass(frozen=True)
class VVAConfig:
    refinement_box_threshold: float = 0.8  # scripts/coco_1shot.sh
    attn_tap_last_n: int = 24
    grid: int = 37  # 518 / 14


@partial(jax.jit, static_argnames=("model_cfg", "cfg"))
def compute(
    params,
    support_images: jnp.ndarray,  # (S, H, W, 3) raw [0,1]
    support_masks: jnp.ndarray,  # (S, H, W) {0,1}
    support_valid: jnp.ndarray,  # (S,) bool
    query_image: jnp.ndarray,  # (H, W, 3) raw [0,1]
    model_cfg: dinov2.DinoV2Config,
    cfg: VVAConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (vva (g, g) in [0,1], cost_matrix (S·L, L), support_fg (S·L,))."""
    g = cfg.grid
    norm = lambda im: imaging.normalize(im, imaging.IMAGENET_MEAN, imaging.IMAGENET_STD)

    out_s = dinov2.forward_features(params, norm(support_images), model_cfg)
    out_q = dinov2.forward_features(
        params, norm(query_image)[None], model_cfg, attn_tap_last_n=cfg.attn_tap_last_n
    )
    sup = dinov2.patch_features(out_s, model_cfg.num_register_tokens)  # (S*L, D)
    qry = dinov2.patch_features(out_q, model_cfg.num_register_tokens)  # (L, D)

    s_mat = jnp.matmul(sup.astype(jnp.float32), qry.T.astype(jnp.float32), precision=_P)  # (S*L, L)
    cost = (1.0 - s_mat) / 2.0

    pooled = imaging.pool_mask_to_grid(support_masks, g) > 0  # (S, g, g)
    pooled = pooled & support_valid[:, None, None]
    fg = pooled.reshape(-1)  # (S*L,)
    shot_live = jnp.repeat(support_valid, g * g)
    bg = (~fg) & shot_live

    def max_mean(row_mask):
        masked = jnp.where(row_mask[:, None], s_mat, NEG)
        mx = jnp.max(masked, axis=0)  # (L,)
        cnt = jnp.sum(row_mask)
        mean = jnp.sum(jnp.where(row_mask[:, None], s_mat, 0.0), axis=0) / jnp.maximum(cnt, 1)
        return (mean * mx).reshape(g, g), cnt

    vva_fg, _ = max_mean(fg)
    vva_bg, bg_cnt = max_mean(bg)
    vva = jnp.where(bg_cnt > 0, vva_fg - vva_bg, vva_fg)
    vva = (vva - vva.min()) / (1e-7 + vva.max() - vva.min())

    refined = pir.refine(vva, out_q["attn_mean"][0], cfg.refinement_box_threshold)
    refined = (refined - refined.min()) / (1e-7 + refined.max() - refined.min())
    return refined, cost, fg
