"""Proposal scoring, filtering, and merging — one batched device pass.

Functional parity with the reference
(reference: mars/components/FilteringMergingModule.py:35-221), which loops
over proposals on the host (pooling, numpy sums, one ot.emd2 C++ call per
proposal, AlphaCLIP in chunks of 128).  Here every proposal in the padded
bucket is scored at once:

  - pooled footprints via one batched max-pool
  - pvv/pvt = α·mean(prior under footprint) + (1-α)·coverage, where
    coverage = |footprint| / |union-of-proposals footprint|  (:104-123)
  - EMD against the support footprint via the batched Sinkhorn kernel
  - AlphaCLIP: ONE vmapped visual forward over all proposals' alpha masks
  - min-max scale EMD & AlphaCLIP over valid rows (:125-132)
  - final = mean of 4; merge = union of proposals above the static
    threshold, or above dynamic·top when the top score is below it
    (:209-221) — rank-free: thresholds only need the max score.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mars_tpu.core import imaging
from mars_tpu.models import clip as clip_m
from mars_tpu.ops import emd as emd_ops


@dataclass(frozen=True)
class FilterMergeConfig:
    alpha: float = 0.85  # --alpha_coverage
    static_threshold: float = 0.55
    dynamic_threshold: float = 0.95
    grid: int = 37
    alpha_clip_size: int = 336
    # 16 beats 32 on v5e both at full bucket (525 vs 576 ms) and for small
    # episodes (one live chunk: 97 vs 173 ms)
    alpha_clip_batch: int = 16
    emd_row_bucket: int = 1024
    emd_col_bucket: int = 512


@partial(jax.jit, static_argnames=("model_cfg", "cfg"))
def alphaclip_scores(
    params,
    query_image: jnp.ndarray,  # (H, W, 3) raw [0,1]
    proposal_masks: jnp.ndarray,  # (P, H, W) {0,1}
    text_feats: jnp.ndarray,  # (1, out_dim) normalized alpha-clip text
    model_cfg: clip_m.ClipVisualConfig,
    cfg: FilterMergeConfig,
    proposal_valid: Optional[jnp.ndarray] = None,  # (P,) bool
) -> jnp.ndarray:
    """Masked-region ↔ text cosine for every proposal (P,).

    reference:_compute_alphaclip_vis_feats:183-207 — image resized 336
    bicubic + CLIP norm; masks resized 336 bilinear, normalized with
    mean 0.5 / std 0.26 (utils/backbone_loader.py:183-188).

    When ``proposal_valid`` is given, valid rows are compacted to the
    front and all-padding chunks skip the AlphaCLIP-L tower through a
    runtime ``lax.cond`` — XLA conditionals execute only the taken
    branch, so a 7-proposal episode in a 128 bucket pays 1 chunk of
    tower compute instead of 8, with a single compiled program.
    """
    s = cfg.alpha_clip_size
    img = imaging.resize(query_image, (s, s), "bicubic")
    img = imaging.normalize(img, imaging.CLIP_MEAN, imaging.CLIP_STD)
    # torchvision's tensor Resize does NOT antialias (reference
    # backbone_loader mask_transforms) — and the antialiased 518→336 down-
    # sample is also ~10x more expensive
    p = proposal_masks.shape[0]
    if proposal_valid is not None:
        order = jnp.argsort(~proposal_valid, stable=True)
        inv = jnp.zeros((p,), jnp.int32).at[order].set(
            jnp.arange(p, dtype=jnp.int32))
        masks_in = proposal_masks[order]
        n_valid = jnp.sum(proposal_valid)
    else:
        inv = None
        masks_in = proposal_masks
        n_valid = jnp.int32(p)
    alphas = jax.image.resize(
        masks_in[..., None], (p, s, s, 1), "bilinear", antialias=False
    )[..., 0]
    alphas = (alphas - 0.5) / 0.26

    nb = cfg.alpha_clip_batch
    if p % nb == 0:
        alphas = alphas.reshape(p // nb, nb, s, s)
        starts = jnp.arange(p // nb, dtype=jnp.int32) * nb
    else:
        alphas = alphas[None]
        starts = jnp.zeros((1,), jnp.int32)
    d = text_feats.shape[-1]

    def chunk(alpha):
        imgs = jnp.broadcast_to(img[None], (alpha.shape[0],) + img.shape)
        emb = clip_m.visual_cls(params, imgs, model_cfg, alpha=alpha)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return emb.astype(jnp.float32)

    def body(_, inp):
        alpha, start = inp
        emb = jax.lax.cond(
            start < n_valid,
            chunk,
            lambda a: jnp.zeros((a.shape[0], d), jnp.float32),
            alpha,
        )
        return None, emb

    _, feats = jax.lax.scan(body, None, (alphas, starts))
    scores = feats.reshape(p, -1) @ text_feats[0].astype(jnp.float32)
    return scores if inv is None else scores[inv]


@partial(jax.jit, static_argnames=("cfg",))
def score_and_merge(
    proposal_masks: jnp.ndarray,  # (P, H, W) {0,1}
    proposal_valid: jnp.ndarray,  # (P,) bool
    support_fg: jnp.ndarray,  # (S·L,) bool pooled support footprint
    cost_matrix: jnp.ndarray,  # (S·L, L)
    vva: jnp.ndarray,  # (g, g) in [0,1]
    vta: jnp.ndarray,  # (g, g) in [0,1]
    aclip_scores: jnp.ndarray,  # (P,)
    cfg: FilterMergeConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (merged mask (H, W) float {0,1}, final scores (P,))."""
    return score_and_merge_core(proposal_masks, proposal_valid, support_fg,
                                cost_matrix, vva, vta, aclip_scores, cfg)


def score_and_merge_core(
    proposal_masks, proposal_valid, support_fg, cost_matrix,
    vva, vta, aclip_scores, cfg: FilterMergeConfig,
    any_reduce=None, minmax=None, max_reduce=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The scoring/filter/merge math (reference
    FilteringMergingModule.py:104-132,209-221), parameterized over its
    cross-proposal reductions so the proposal-sharded ranker
    (parallel/runner.make_proposal_parallel_ranker) runs the SAME formulas
    with collectives swapped in: ``any_reduce`` for the footprint/mask
    unions, ``minmax`` for the masked min-max score scaling, ``max_reduce``
    for the top-score threshold.  Defaults are the single-device
    reductions."""
    g = cfg.grid
    p = proposal_masks.shape[0]
    if minmax is None:
        minmax = imaging.masked_min_max_scale

    pooled = imaging.pool_mask_to_grid(proposal_masks, g) > 0  # (P, g, g)
    pooled = pooled & proposal_valid[:, None, None]
    union = jnp.any(pooled, axis=0)  # (g, g)
    if any_reduce is not None:
        union = any_reduce(union)

    fp = pooled.reshape(p, -1).astype(jnp.float32)
    sizes = jnp.sum(fp, axis=1)
    coverage = sizes / (1e-7 + jnp.sum(union))
    pvv_align = fp @ vva.reshape(-1) / (1e-7 + sizes)
    pvt_align = fp @ vta.reshape(-1) / (1e-7 + sizes)
    pvv = cfg.alpha * pvv_align + (1 - cfg.alpha) * coverage
    pvt = cfg.alpha * pvt_align + (1 - cfg.alpha) * coverage

    emd = emd_ops.batched_emd(
        cost_matrix, support_fg, pooled.reshape(p, -1),
        cfg.emd_row_bucket, cfg.emd_col_bucket,
        col_valid=proposal_valid,
    )
    emd_score = 1.0 - emd

    emd_n = minmax(emd_score, proposal_valid)
    ac_n = minmax(aclip_scores, proposal_valid)

    final = (emd_n + ac_n + pvv + pvt) / 4.0
    final = jnp.where(proposal_valid, final, -jnp.inf)

    top = jnp.max(final)
    if max_reduce is not None:
        top = max_reduce(top)
    thr = jnp.where(top < cfg.static_threshold,
                    cfg.dynamic_threshold * top, cfg.static_threshold)
    keep = proposal_valid & (final >= thr)
    merged = jnp.any(proposal_masks.astype(bool) & keep[:, None, None], axis=0)
    if any_reduce is not None:
        merged = any_reduce(merged)
    return merged.astype(jnp.float32), final
