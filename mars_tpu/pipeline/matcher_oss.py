"""Open-set Matcher variant driving a pluggable point predictor
(Semantic-SAM style).

Functional parity with the reference's Matcher_SemanticSAM
(reference: matcher/Matcher_SemanticSAM.py:28-385, built by
main_eval_matcher_oss-style scripts via ``build_matcher_oss``,
common/utils.py:481):

  - the SAME DINOv2 bidirectional patch matching + top-half similarity
    reduction as the main Matcher (:188-243)
  - optional k-means++ clustering to ``num_centers`` (:245-258)
  - NO negative priors, NO dense AMG sweep, NO SAM iou/stability
    filtering — each sampled prompt set goes straight to a point
    predictor that returns MULTI-GRANULARITY masks per click (the
    external Semantic-SAM returns 6; our SAM adapter returns its 3
    multimask layers), reference :260-283
  - per-mask purity/coverage/EMD scoring and the identical metric
    filters + score/top-k merge (:284-372)

The reference does NOT vendor the ``semantic_sam`` network (it imports
the external package, :23); correspondingly this module ships the
*driver* plus a ``PointPredictorBackend`` protocol, with a SAM-based
adapter so the flow runs end-to-end on TPU today.  A native
Semantic-SAM (SwinL + mask decoder) can slot in by implementing the
protocol.

TPU design notes: every stage below is a fixed-shape jitted program —
prompt sets live in static combination tables with validity masks, the
backend decodes all sets in one batched call, and scoring/merging is a
single compiled graph, so the whole variant costs two device dispatches
after the towers.
"""
from __future__ import annotations

from typing import Protocol, Tuple

import jax
import jax.numpy as jnp

from mars_tpu.models import dinov2, sam
from mars_tpu.ops import kmeans
from mars_tpu.pipeline import amg
from mars_tpu.pipeline import matcher as matcher_lib


class PointPredictorBackend(Protocol):
    """Point-prompted mask predictor with multi-granularity outputs.

    The reference's SemanticSAMPredictor.predict takes 0-1 normalized
    click coords on a 640px bicubic-resized target and returns several
    masks per click (Matcher_SemanticSAM.py:120-139, 266-276); this
    protocol keeps the normalized-coordinate contract but batches every
    prompt set into one call.
    """

    masks_per_prompt: int

    def predict_batch(
        self,
        query_image01: jnp.ndarray,  # (H, W, 3) raw [0,1]
        coords01: jnp.ndarray,  # (B, K, 2) xy in [0,1] of the query frame
        labels: jnp.ndarray,  # (B, K) {-1, 0, 1}; -1 = padding
        set_valid: jnp.ndarray,  # (B,) bool
        original_size: Tuple[int, int],
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """→ (masks (B*M, H, W) bool at original_size, valid (B*M,))."""
        ...


class SamPointBackend:
    """SAM standing in for Semantic-SAM: the 3 multimask layers are the
    granularity stack, no iou/stability gating (the variant scores with
    matcher metrics only, reference :284-310)."""

    def __init__(self, params, model_cfg: sam.SamConfig, decode_batch: int = 32):
        self.params = params
        self.model_cfg = model_cfg
        # all 3 multimask slots, thresholds off (sel_output_layer 3 →
        # slots 0..2; see amg._select_layers)
        self.amg_cfg = amg.AmgConfig(
            sel_pred_iou_thresh=0.0,
            sel_stability_score_thresh=0.0,
            sel_multimask_output=True,
            sel_output_layer=3,
            decode_batch=decode_batch,
        )
        self.masks_per_prompt = 3
        self._embed_cache = None

    def predict_batch(self, query_image01, coords01, labels, set_valid,
                      original_size):
        if self._embed_cache is None or self._embed_cache[0] is not query_image01:
            emb = amg.encode_target(self.params, query_image01, self.model_cfg)
            self._embed_cache = (query_image01, emb)
        emb = self._embed_cache[1]
        scale = jnp.asarray([original_size[1], original_size[0]], jnp.float32)
        out = amg.decode_prompt_sets(
            self.params, emb, coords01 * scale, labels, set_valid,
            self.model_cfg, self.amg_cfg, original_size=original_size,
        )
        return out["masks"], out["valid"]


def generate_proposals_oss(
    key,
    dino_params,
    dino_cfg: dinov2.DinoV2Config,
    backend: PointPredictorBackend,
    cfg: matcher_lib.MatcherConfig,
    support_images: jnp.ndarray,  # (S, H, W, 3) raw [0,1]
    support_masks: jnp.ndarray,  # (S, H, W)
    support_valid: jnp.ndarray,  # (S,)
    query_image: jnp.ndarray,  # (H, W, 3) raw [0,1]
) -> dict:
    """Matcher_SemanticSAM.predict (reference :151-161) on a pluggable
    backend.  Returns the same dict shape as matcher.generate_proposals
    (minus SAM-specific iou/stability arrays)."""
    g = cfg.grid
    s_mat, cost, support_fg = matcher_lib._features_and_matrices(
        dino_params, support_images, support_masks, support_valid, query_image,
        dino_cfg, g,
    )
    points, point_valid = matcher_lib.matched_points(s_mat, support_fg, cfg)

    key, k1, k2 = jax.random.split(key, 3)
    if not cfg.use_points_or_centers:
        n_pts = jnp.sum(point_valid)
        centers, _ = kmeans.kmeans_pp(k1, points, point_valid, cfg.num_centers)
        centers = jnp.round(centers)
        c_valid = jnp.arange(cfg.num_centers) < jnp.minimum(n_pts, cfg.num_centers)
        pad = points.shape[0] - cfg.num_centers
        prompt_pts = jnp.pad(centers, ((0, pad), (0, 0)))
        prompt_valid = jnp.pad(c_valid, (0, pad))
    else:
        prompt_pts, prompt_valid = points, point_valid

    coords, labels, set_valid = matcher_lib.sample_prompt_sets(
        k2, prompt_pts, prompt_valid, cfg)

    # normalized coords: the reference divides clicks by input_size before
    # handing them to the predictor (:265-268)
    hq, wq = query_image.shape[:2]
    coords01 = coords / jnp.asarray([wq, hq], jnp.float32)
    masks, mask_valid = backend.predict_batch(
        query_image, coords01, labels, set_valid, (hq, wq))

    emd_score, purity, coverage = matcher_lib.score_masks(
        masks, mask_valid, points, point_valid, support_fg, cost, cfg)
    merged, final_score, chosen = matcher_lib.filter_and_merge(
        masks, mask_valid, emd_score, purity, coverage, cfg)

    return {
        "proposal_masks": masks,
        "proposal_valid": mask_valid,
        "emd_score": emd_score,
        "purity": purity,
        "coverage": coverage,
        "merged": merged,
        "final_score": final_score,
        "chosen": chosen,
        "cost": cost,
        "support_fg": support_fg,
        "telemetry": {"n_matched_points": jnp.sum(point_valid)},
    }


class SemanticSamBackend:
    """The native Semantic-SAM network (models/semantic_sam.py) behind the
    protocol — the configuration the reference reaches via the external
    ``semantic_sam`` package (Matcher_SemanticSAM.py:118-139): target
    bicubic-resized to ``cfg.input_size`` (:130 uses 640), 0-1 normalized
    clicks, multi-granularity masks per prompt.

    A prompt set of K clicks runs every positive click as an interactive
    query; per-granularity logits are averaged over the set's clicks
    (multi-click consensus), giving ``num_granularities`` masks per set.
    """

    def __init__(self, params, cfg):
        from mars_tpu.models import semantic_sam as ss

        self._ss = ss
        self.params = params
        self.cfg = cfg
        self.masks_per_prompt = cfg.num_granularities
        self._embed_cache = None

    def predict_batch(self, query_image01, coords01, labels, set_valid,
                      original_size):
        from mars_tpu.core import imaging

        ss, cfg = self._ss, self.cfg
        s = cfg.input_size
        if self._embed_cache is None or self._embed_cache[0] is not query_image01:
            img = imaging.resize(query_image01, (s, s), "bicubic")
            img = imaging.normalize(img, imaging.IMAGENET_MEAN,
                                    imaging.IMAGENET_STD)
            self._embed_cache = (query_image01,
                                 ss.encode_image(self.params, img, cfg))
        memory, mask_feats = self._embed_cache[1]
        shapes = ss.feature_shapes(cfg, s, s)

        b, k, _ = coords01.shape
        g = cfg.num_granularities
        emb, _iou = ss.predict_points(
            self.params, memory, mask_feats, coords01.reshape(b * k, 2),
            cfg, shapes=shapes, return_embeddings=True)  # (B*K, G, C)
        emb = emb.reshape(b, k, g, -1)
        # the mask head is linear in the embedding, so averaging click
        # embeddings == averaging their mask logits — and avoids ever
        # materializing (B·K·G, H/4, W/4) logits
        live = ((labels == 1) & set_valid[:, None]).astype(emb.dtype)
        denom = jnp.maximum(jnp.sum(live, axis=1), 1.0)  # (B,)
        emb = jnp.einsum("bkgc,bk->bgc", emb, live) / denom[:, None, None]
        logits = jnp.einsum("bgc,zhwc->bghw", emb, mask_feats)
        logits = logits.reshape(b * g, *logits.shape[-2:])
        # chunked bilinear upsample to the query frame (the reference's
        # F.interpolate(..., input_size, bilinear) > 0, :269-276)
        nb = 64
        pad = -logits.shape[0] % nb
        lp = jnp.pad(logits, ((0, pad), (0, 0), (0, 0)))
        full = jax.lax.map(
            lambda ch: imaging.interpolate_2d(ch, original_size,
                                              "bilinear") > 0.0,
            lp.reshape(-1, nb, *lp.shape[-2:]),
        ).reshape(-1, *original_size)[:b * g]
        valid = jnp.repeat(set_valid, g)
        return full, valid
