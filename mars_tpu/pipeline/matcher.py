"""Matcher: bidirectional patch matching → prompt sampling → SAM proposals.

Functional parity with the reference Matcher (reference: matcher/Matcher.py)
re-designed fixed-shape for TPU:

  - bidirectional matching (``patch_level_matching`` :419-577): forward
    Hungarian over masked-support rows and reverse Hungarian over matched
    columns become two on-device auction assignments; the matched-pair set
    is represented densely as per-query-column (matched_row, valid) — the
    reference's dedup-via-set is structurally a no-op because assignment
    columns are already distinct
  - top-half filter (>40 matches keeps the better half, :505-508), patch
    index → pixel-center coordinates (:519-535)
  - k-means++ clustering to 8 centers (:579-591, matcher/k_means.py) or the
    raw point set (``use_points_or_centers``)
  - RobustPromptSampler (:1226-1295): all C(n,i) combinations for n ≤ 8 are
    static tables masked by ``all(idx) < n``; for n > 8, ``max_iterations``
    keyed Gumbel-top-k draws per size — every prompt set is a fixed (6,)
    row padded with label -1
  - SAM decode + AMG filters (pipeline.amg), per-mask purity/coverage/EMD
    scoring (``get_mask_scores`` :1152-1210) as one batched pass, metric
    filters and top-k merging (``mask_generation`` :619-834)
"""
from __future__ import annotations

import itertools
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mars_tpu.core import imaging
from mars_tpu.models import dinov2, sam
from mars_tpu.ops import assignment, emd as emd_ops, kmeans
from mars_tpu.pipeline import amg

_P = jax.lax.Precision.HIGHEST
NEG = -1e9


@dataclass(frozen=True)
class MatcherConfig:
    input_size: int = 518
    grid: int = 37
    patch_size: int = 14
    num_centers: int = 8
    use_points_or_centers: bool = True  # True → use raw matched points
    sample_range: Tuple[int, int] = (4, 6)
    max_sample_iterations: int = 30
    use_box: bool = False
    # negative priors (reference :304-417,643-660)
    use_negative_priors_from_discarded: bool = False
    use_negative_priors_from_cost: bool = False
    merge_prompt_types: bool = False
    # mask scoring (reference :719-720): score = α·emd + β·purity·coverage^exp
    alpha: float = 1.0
    beta: float = 0.0
    exp: float = 0.0
    # score_filter_cfg (reference build_matcher_oss :1341-1349)
    emd_filter: float = 0.0
    purity_filter: float = 0.02
    coverage_filter: float = 0.0
    use_score_filter: bool = True
    deep_score_filter: float = 0.33
    deep_score_norm_filter: float = 0.1
    topk_scores_threshold: float = 0.0
    num_merging_mask: int = 10
    emd_row_bucket: int = 1024
    emd_col_bucket: int = 512


# ---------------------------------------------------------------------------
# bidirectional matching
# ---------------------------------------------------------------------------

@jax.jit
def bidirectional_match(s_mat: jnp.ndarray, support_fg: jnp.ndarray):
    """Forward+reverse auction matching.

    s_mat: (R, L) support-patch x query-patch similarities (R = S·L).
    support_fg: (R,) bool.

    Returns per-query-column arrays (L,):
      matched_row: forward-matched support row (or -1)
      pair_valid:  column was matched forward
      retained:    reverse match landed inside the support mask
                   (with the all-discarded fallback keeping everything,
                   reference :486-498)
      sim:         similarity of the forward pair
      retained_raw: retained before the fallback (negative-prior source,
                   reference :304-348)
    """
    r, l = s_mat.shape
    t = jnp.sum(support_fg)

    def fwd_rows(_):
        # support_fg is sparse (|footprint| bidders over an R×L matrix) →
        # chunk-gated bidding: war rounds read only live-bidder chunks
        cols = assignment.auction_assignment(s_mat, support_fg,
                                             row_chunk=128)  # (R,)
        tgt = jnp.where(cols >= 0, cols, l)  # out-of-range → dropped
        matched_row = jnp.full((l,), -1, jnp.int32).at[tgt].set(
            jnp.arange(r, dtype=jnp.int32), mode="drop"
        )
        return matched_row

    def fwd_cols(_):
        # more masked rows than columns → every query column gets matched;
        # solve the transposed problem (same optimal pair set)
        st = jnp.where(support_fg[None, :], s_mat.T, NEG)  # (L, R)
        rows = assignment.auction_assignment(st, jnp.ones((l,), bool))
        return rows.astype(jnp.int32)

    matched_row = jax.lax.cond(t <= l, fwd_rows, fwd_cols, None)
    pair_valid = matched_row >= 0
    sim = jnp.where(
        pair_valid,
        s_mat[jnp.clip(matched_row, 0, r - 1), jnp.arange(l)],
        NEG,
    )

    # reverse: matched query columns compete for support patches (all R cols)
    rev = assignment.auction_assignment(s_mat.T, pair_valid,
                                        row_chunk=128)  # (L,) → row in R
    retained_raw = pair_valid & support_fg[jnp.clip(rev, 0, r - 1)] & (rev >= 0)
    retained = jax.lax.cond(
        jnp.any(retained_raw), lambda: retained_raw, lambda: pair_valid
    )
    return matched_row, pair_valid, retained, sim, retained_raw


@partial(jax.jit, static_argnames=("cfg",))
def matched_points(s_mat, support_fg, cfg: MatcherConfig):
    """Full matching → pixel-center points (L, 2) + validity (L,).

    Applies the reference's top-half similarity filter (:505-508).
    """
    l = s_mat.shape[1]
    g = cfg.grid
    _, _, retained, sim, _ = bidirectional_match(s_mat, support_fg)

    n_pos = jnp.sum(retained)
    reduced = jnp.where(n_pos > 40, n_pos // 2, n_pos)
    order = jnp.argsort(jnp.where(retained, -sim, jnp.inf))
    rank = jnp.zeros((l,), jnp.int32).at[order].set(jnp.arange(l, dtype=jnp.int32))
    keep = retained & (rank < reduced)

    j = jnp.arange(l, dtype=jnp.int32)
    x = (j % g) * cfg.patch_size + cfg.patch_size // 2
    y = (j // g) * cfg.patch_size + cfg.patch_size // 2
    points = jnp.stack([x, y], axis=-1).astype(jnp.float32)
    return points, keep


@partial(jax.jit, static_argnames=("cfg",))
def negative_points_from_discarded(s_mat, support_fg, cfg: MatcherConfig):
    """Negative priors = forward pairs whose reverse match fell OUTSIDE the
    support mask, keeping the (half of the) LEAST similar ones (reference
    sample_negative_points_from_discarded :304-348).

    Returns (points (L, 2), neg_valid (L,))."""
    l = s_mat.shape[1]
    g = cfg.grid
    _, pair_valid, _, sim, retained_raw = bidirectional_match(s_mat, support_fg)
    # the raw (pre-fallback) discarded set: reference uses isin(..., invert)
    discarded = pair_valid & ~retained_raw
    n = jnp.sum(discarded)
    reduced = jnp.where(n > 40, n // 2, n)
    order = jnp.argsort(jnp.where(discarded, sim, jnp.inf))  # ascending sim
    rank = jnp.zeros((l,), jnp.int32).at[order].set(jnp.arange(l, dtype=jnp.int32))
    keep = discarded & (rank < reduced)
    j = jnp.arange(l, dtype=jnp.int32)
    pts = jnp.stack([(j % g) * cfg.patch_size + cfg.patch_size // 2,
                     (j // g) * cfg.patch_size + cfg.patch_size // 2], -1).astype(jnp.float32)
    return pts, keep


@partial(jax.jit, static_argnames=("cfg",))
def negative_points_from_cost(cost, support_fg, cfg: MatcherConfig):
    """Negative priors from maximizing the COST matrix: most-dissimilar
    forward matches whose reverse match is outside the mask, top-half by
    cost descending (reference sample_negative_points_from_cost :350-417)."""
    l = cost.shape[1]
    g = cfg.grid
    r = cost.shape[0]
    # square/contested instances need ε-scaling (see auction_assignment);
    # a tall matrix (R > L, multi-shot) can never assign every row, so run
    # the auction on the side that CAN fully assign — same LSA optimum
    if r <= l:
        cols = assignment.auction_assignment(cost, jnp.ones((r,), bool),
                                             n_phases=5)
        tgt = jnp.where(cols >= 0, cols, l)
        matched_row = jnp.full((l,), -1, jnp.int32).at[tgt].set(
            jnp.arange(r, dtype=jnp.int32), mode="drop")
    else:
        matched_row = assignment.auction_assignment(
            cost.T, jnp.ones((l,), bool), n_phases=5)
    pair_valid = matched_row >= 0
    cost_f = jnp.where(pair_valid, cost[jnp.clip(matched_row, 0, r - 1), jnp.arange(l)], -jnp.inf)
    # ε-scaling only when square (carryover is unsound for strongly
    # rectangular valid subsets — multi-shot keeps the single phase)
    # pair_valid is DENSE here (a full square/tall assignment matches every
    # column) — chunk-gated bidding would only add per-round overhead
    rev = assignment.auction_assignment(cost.T, pair_valid,
                                        n_phases=5 if r == l else 1)
    outside = pair_valid & ~support_fg[jnp.clip(rev, 0, r - 1)]
    # reference keeps ALL matched pairs' costs but filters to `outside` when
    # any exist; the top-half is then taken over the FULL matched set
    # (indices_forward_neg_f, :388-396) — mirror that quirk
    n = jnp.sum(pair_valid)
    reduced = jnp.where(n > 40, n // 2, n)
    order = jnp.argsort(jnp.where(pair_valid, -cost_f, jnp.inf))
    rank = jnp.zeros((l,), jnp.int32).at[order].set(jnp.arange(l, dtype=jnp.int32))
    keep = pair_valid & (rank < reduced)
    j = jnp.arange(l, dtype=jnp.int32)
    pts = jnp.stack([(j % g) * cfg.patch_size + cfg.patch_size // 2,
                     (j // g) * cfg.patch_size + cfg.patch_size // 2], -1).astype(jnp.float32)
    return pts, keep


@partial(jax.jit, static_argnames=("cfg",))
def co_sample_negatives(key, set_valid, neg_points, neg_valid, cfg: MatcherConfig):
    """For each prompt set, draw as many negative points as its size
    (reference :1243-1267: without replacement when >8 negatives exist,
    with replacement otherwise).  Returns (coords (B, K, 2), labels (B, K))
    with label 0, padded with -1; sizes follow prompt_set_sizes."""
    sizes = jnp.asarray(prompt_set_sizes(cfg))
    b = sizes.shape[0]
    k = cfg.sample_range[1]
    l = neg_points.shape[0]
    n_neg = jnp.sum(neg_valid)
    order = jnp.argsort(~neg_valid, stable=True)
    pts_c = neg_points[order]

    kb = jax.random.split(key, b)

    def draw(kk):
        g = jax.random.gumbel(kk, (l,))
        g = jnp.where(jnp.arange(l) < n_neg, g, -jnp.inf)
        wo = jnp.argsort(-g)[:k]  # without replacement
        wr = jax.random.categorical(
            kk, jnp.where(jnp.arange(l) < n_neg, 0.0, -jnp.inf), shape=(k,)
        )  # with replacement
        return jnp.where(n_neg > 8, wo, wr)

    idx = jax.vmap(draw)(kb)  # (B, K)
    in_set = jnp.arange(k)[None, :] < sizes[:, None]
    coords = jnp.where(in_set[..., None], pts_c[idx], 0.0)
    labels = jnp.where(in_set & (n_neg > 0), 0, -1).astype(jnp.int32)
    return coords, labels


# ---------------------------------------------------------------------------
# prompt sampling
# ---------------------------------------------------------------------------

def _combination_tables(max_n: int, sizes) -> Tuple[np.ndarray, np.ndarray]:
    """Static (n_sets, max_size) index table + per-set sizes for all
    combinations C(max_n, i), i in sizes, padded with -1."""
    max_size = max(sizes)
    rows, szs = [], []
    for i in sizes:
        for combo in itertools.combinations(range(max_n), i):
            rows.append(list(combo) + [-1] * (max_size - i))
            szs.append(i)
    return np.asarray(rows, np.int32), np.asarray(szs, np.int32)


def prompt_set_sizes(cfg: MatcherConfig) -> np.ndarray:
    """Static per-row prompt-set sizes matching sample_prompt_sets' layout:
    the combinations family (sizes 1..hi over 8 slots) followed by the
    random-draw family (max_iterations rows per size lo..hi)."""
    lo, hi = cfg.sample_range
    _, tsizes = _combination_tables(8, tuple(range(1, hi + 1)))
    draw_sizes = np.repeat(np.arange(lo, hi + 1), cfg.max_sample_iterations)
    return np.concatenate([tsizes, draw_sizes]).astype(np.int32)


def prompt_family_rows(cfg: MatcherConfig):
    """(combo_rows, draw_rows): static row-index ranges of the two prompt
    families in sample_prompt_sets' layout.  Exactly one family is active
    per episode (n ≤ 8 → combinations, n > 8 → draws, reference :1234-1267),
    so callers can decode only the active family's rows."""
    lo, hi = cfg.sample_range
    _, tsizes = _combination_tables(8, tuple(range(1, hi + 1)))
    nc = len(tsizes)
    nd = (hi - lo + 1) * cfg.max_sample_iterations
    return np.arange(nc), nc + np.arange(nd)


def union_family_rows(cfg: MatcherConfig):
    """Both families' rows as one static tuple.  sample_prompt_sets already
    gates each family's validity by n (combo_ok has n ≤ 8, draw_ok n > 8),
    so decoding the UNION is exact with no host decision: the inactive
    family's rows are invalid in place and the decode/EMD dead-chunk skips
    price only the active family.  This is the SPMD vehicle — an
    episode-parallel batch can't branch per episode on the host
    (parallel/runner.make_batched_proposal_generator)."""
    combo, draw = prompt_family_rows(cfg)
    return tuple(np.concatenate([combo, draw]).tolist())


@partial(jax.jit, static_argnames=("cfg",))
def sample_prompt_sets(key, points, point_valid, cfg: MatcherConfig):
    """RobustPromptSampler as fixed-shape tables.

    Returns (coords (B, K, 2), labels (B, K), set_valid (B,)) where
    K = sample_range[1]; row sizes are the STATIC ``prompt_set_sizes`` so
    the caller can decode size-homogeneous groups (exactly the reference's
    per-size prompt arrays, :1276-1295).  Two families concatenated:
      - combinations of the first min(8, n) compacted points, active
        when n ≤ 8 (reference :1254-1267); a combo is valid when its size
        i lies in [min(lo, n), min(hi, n)] and all its indices < n
      - max_iterations random draws per size (reference :1236-1252),
        active when n > 8 — Gumbel-top-k over the valid points gives
        without-replacement draws at fixed shape
    """
    lo, hi = cfg.sample_range
    k = hi
    n = jnp.sum(point_valid)
    l = points.shape[0]

    # compact valid points to the front (stable order = column order,
    # mirroring the reference's sorted-set order, :513-516)
    order = jnp.argsort(~point_valid, stable=True)
    pts_c = points[order]  # (L, 2) valid first

    # --- combinations family (n ≤ 8) ---
    sizes = tuple(range(1, hi + 1))
    table, tsizes = _combination_tables(8, sizes)
    table_j = jnp.asarray(table)
    tsizes_j = jnp.asarray(tsizes)
    i_lo = jnp.minimum(lo, n)
    i_hi = jnp.minimum(hi, n)
    combo_ok = (
        (tsizes_j >= i_lo)
        & (tsizes_j <= i_hi)
        & jnp.all((table_j < n) | (table_j < 0), axis=1)
        & (n <= 8)
        & (n > 0)
    )
    combo_coords = jnp.where(
        (table_j >= 0)[..., None], pts_c[jnp.clip(table_j, 0, l - 1)], 0.0
    )
    combo_labels = jnp.where(table_j >= 0, 1, -1)
    pad = k - table.shape[1]
    if pad > 0:
        combo_coords = jnp.pad(combo_coords, ((0, 0), (0, pad), (0, 0)))
        combo_labels = jnp.pad(combo_labels, ((0, 0), (0, pad)), constant_values=-1)

    # --- random-draw family (n > 8) ---
    n_draw = cfg.max_sample_iterations
    draw_sizes = jnp.repeat(jnp.arange(lo, hi + 1), n_draw)  # (D,)
    d = draw_sizes.shape[0]
    gumbel = jax.random.gumbel(key, (d, l))
    gumbel = jnp.where((jnp.arange(l)[None, :] < n), gumbel, -jnp.inf)
    topk_idx = jnp.argsort(-gumbel, axis=1)[:, :k]  # (D, K) indices into pts_c
    in_set = jnp.arange(k)[None, :] < draw_sizes[:, None]
    draw_coords = jnp.where(in_set[..., None], pts_c[topk_idx], 0.0)
    draw_labels = jnp.where(in_set, 1, -1)
    draw_ok = jnp.full((d,), True) & (n > 8)

    coords = jnp.concatenate([combo_coords, draw_coords], axis=0)
    labels = jnp.concatenate([combo_labels, draw_labels], axis=0).astype(jnp.int32)
    valid = jnp.concatenate([combo_ok, draw_ok], axis=0)
    return coords, labels, valid


# ---------------------------------------------------------------------------
# mask scoring + merge
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",))
def score_masks(
    masks: jnp.ndarray,  # (N, H, W) bool
    mask_valid: jnp.ndarray,  # (N,)
    points: jnp.ndarray,  # (L, 2) all matched points (pixel coords)
    point_valid: jnp.ndarray,  # (L,)
    support_fg: jnp.ndarray,  # (R,)
    cost: jnp.ndarray,  # (R, L)
    cfg: MatcherConfig,
):
    """purity/coverage/EMD for every mask at once (reference
    get_mask_scores :1152-1210 runs per mask on host)."""
    g = cfg.grid
    pooled = imaging.pool_mask_to_grid(masks.astype(jnp.float32), g) > 0  # (N, g, g)

    # empty pooled footprint: the reference's threshold trick
    # (get_mask_scores :1181-1185, thres = max - 1e-6 when max <= 0) turns
    # it into a FULL-grid footprint, so its EMD is the whole-image transport
    # cost (~0.5 with unit-normalized features) — NOT 0, which would score
    # 1-0 = 1.0 and let an empty mask win the merge
    mask_empty = ~jnp.any(pooled, axis=(1, 2))
    pooled_for_emd = jnp.where(mask_empty[:, None, None], True, pooled)
    emd = emd_ops.batched_emd(
        cost, support_fg, pooled_for_emd.reshape(masks.shape[0], -1),
        cfg.emd_row_bucket, cfg.emd_col_bucket,
        col_valid=mask_valid,
    )
    emd_score = 1.0 - emd

    xi = jnp.clip(points[:, 0].astype(jnp.int32), 0, masks.shape[2] - 1)
    yi = jnp.clip(points[:, 1].astype(jnp.int32), 0, masks.shape[1] - 1)
    inside = masks[:, yi, xi] & point_valid[None, :]  # (N, L)
    pts_in = jnp.sum(inside, axis=1).astype(jnp.float32)
    n_pts = jnp.maximum(jnp.sum(point_valid), 1).astype(jnp.float32)
    area = jnp.maximum(jnp.sum(pooled, axis=(1, 2)).astype(jnp.float32), 1.0)
    purity = pts_in / area + 1e-6
    coverage = pts_in / n_pts + 1e-6
    return emd_score, purity, coverage


@partial(jax.jit, static_argnames=("cfg",))
def filter_and_merge(
    masks: jnp.ndarray,  # (N, H, W) bool
    valid: jnp.ndarray,  # (N,)
    emd_score: jnp.ndarray,
    purity: jnp.ndarray,
    coverage: jnp.ndarray,
    cfg: MatcherConfig,
):
    """Metric filters + score-based merge (reference :731-833).

    Returns (merged (H, W) float, final_score (), keep_mask (N,)).
    """
    score = cfg.alpha * emd_score + cfg.beta * purity * coverage ** cfg.exp
    keep = valid

    for metric, thr_cfg in (
        (coverage, cfg.coverage_filter),
        (emd_score, cfg.emd_filter),
        (purity, cfg.purity_filter),
    ):
        if thr_cfg > 0:
            mmax = jnp.max(jnp.where(keep, metric, -jnp.inf))
            thr = jnp.minimum(thr_cfg, mmax)
            keep = keep & (metric >= thr)

    n = masks.shape[0]
    if cfg.use_score_filter:
        # reference :749-787: distances = 1-score sorted asc; keep
        # distances < score_thr AND normalized distances < score_norm;
        # always keep the best; cap at num_merging_mask
        dist = jnp.where(keep, 1.0 - score, jnp.inf)
        order = jnp.argsort(dist, stable=True)
        dist_sorted = dist[order]
        dmin = dist_sorted[0]
        dmax = jnp.max(jnp.where(keep, 1.0 - score, -jnp.inf))
        dnorm = (dist_sorted - dmin) / (dmax + 1e-6)
        sel = (dist_sorted < cfg.deep_score_filter)
        sel = sel.at[0].set(keep[order[0]])
        sel = sel & (dnorm < cfg.deep_score_norm_filter)
        sel = sel & (jnp.arange(n) < cfg.num_merging_mask) & (dist_sorted < jnp.inf)
        chosen = jnp.zeros((n,), bool).at[order].set(sel)
        merged = jnp.any(masks & chosen[:, None, None], axis=0)
        final = jnp.sum(jnp.where(chosen, score, 0.0)) / jnp.maximum(jnp.sum(chosen), 1)
        return merged.astype(jnp.float32), final, chosen

    # top-k path (reference :788-832)
    topk = cfg.num_merging_mask
    s = jnp.where(keep, score, -jnp.inf)
    order = jnp.argsort(-s, stable=True)
    in_topk = jnp.zeros((n,), bool).at[order[:topk]].set(True) & keep
    if cfg.topk_scores_threshold > 0:
        # reference :797-799 REASSIGNS topk_scores to the normalized values,
        # so both the filter and the returned mean use score/max
        smax = jnp.max(jnp.where(in_topk, score, -jnp.inf))
        eff = score / smax
    else:
        eff = score
    chosen = in_topk & (eff > cfg.topk_scores_threshold)
    merged = jnp.any(masks & chosen[:, None, None], axis=0)
    final = jnp.sum(jnp.where(chosen, eff, 0.0)) / jnp.maximum(jnp.sum(chosen), 1)
    return merged.astype(jnp.float32), final, chosen


# ---------------------------------------------------------------------------
# end-to-end proposal generation
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("dino_cfg", "grid"))
def _features_and_matrices(dino_params, support_images, support_masks,
                           support_valid, query_image, dino_cfg, grid):
    """Feature extraction + similarity/cost matrices + pooled support mask,
    in one compiled graph (reference extract_img_feats :251-302 + the
    empty-support fallback :141-154 and avg-pool>0 :173-180)."""
    # empty-support fallback: centered 14x14 square
    empty = jnp.sum(support_masks) == 0
    h, w = support_masks.shape[-2:]
    square = jnp.zeros_like(support_masks).at[
        ..., h // 2 - 7 : h // 2 + 7, w // 2 - 7 : w // 2 + 7
    ].set(1.0)
    support_masks = jnp.where(empty, square, support_masks)

    norm = lambda im: imaging.normalize(im, imaging.IMAGENET_MEAN, imaging.IMAGENET_STD)
    out_s = dinov2.forward_features(dino_params, norm(support_images), dino_cfg)
    out_q = dinov2.forward_features(dino_params, norm(query_image)[None], dino_cfg)
    sup = dinov2.patch_features(out_s, dino_cfg.num_register_tokens)
    qry = dinov2.patch_features(out_q, dino_cfg.num_register_tokens)
    s_mat = jnp.matmul(sup.astype(jnp.float32), qry.T.astype(jnp.float32), precision=_P)
    cost = (1.0 - s_mat) / 2.0

    pooled = imaging.pool_mask_to_grid(support_masks, grid) > 0
    pooled = pooled & support_valid[:, None, None]
    return s_mat, cost, pooled.reshape(-1)

@partial(jax.jit, static_argnames=("dino_cfg", "cfg"))
def _match_stage(key, dino_params, support_images, support_masks,
                 support_valid, query_image, dino_cfg, cfg: MatcherConfig):
    """Program 1 of 2: features + matching (+ optional kmeans centers).

    Everything up to the single host decision point (which prompt family is
    active) runs as ONE dispatch — on the tunnel-attached chip every
    dispatch costs ~35 ms, so program count is the latency budget."""
    s_mat, cost, support_fg = _features_and_matrices(
        dino_params, support_images, support_masks, support_valid,
        query_image, dino_cfg, cfg.grid,
    )
    points, point_valid = matched_points(s_mat, support_fg, cfg)
    if not cfg.use_points_or_centers:
        n_pts = jnp.sum(point_valid)
        centers, _ = kmeans.kmeans_pp(
            jax.random.fold_in(key, 0), points, point_valid, cfg.num_centers)
        centers = jnp.round(centers)
        c_valid = jnp.arange(cfg.num_centers) < jnp.minimum(n_pts, cfg.num_centers)
        # pad to the same (L,) layout for sampling
        pad = points.shape[0] - cfg.num_centers
        prompt_pts = jnp.pad(centers, ((0, pad), (0, 0)))
        prompt_valid = jnp.pad(c_valid, (0, pad))
    else:
        prompt_pts, prompt_valid = points, point_valid
    return {
        "s_mat": s_mat, "cost": cost, "support_fg": support_fg,
        "points": points, "point_valid": point_valid,
        "prompt_pts": prompt_pts, "prompt_valid": prompt_valid,
        "n_prompt": jnp.sum(prompt_valid),
    }


@partial(jax.jit, static_argnames=("sam_cfg", "amg_cfg", "cfg", "rows",
                                   "use_mask_input", "bucket"))
def _propose_stage(key, m, query_image, sam_params, mask_input,
                   sam_cfg, amg_cfg, cfg: MatcherConfig, rows,
                   use_mask_input: bool, bucket=None):
    """Program 2 of 2: prompt sampling → SAM encode → ONE batched decode of
    the active family (pad slots attention-masked, exact vs the reference's
    per-size batches :1276-1295) → NMS → scoring → merge."""
    rows_np = np.asarray(rows, np.int32)
    k_s = jax.random.fold_in(key, 1)
    coords, labels, set_valid = sample_prompt_sets(
        k_s, m["prompt_pts"], m["prompt_valid"], cfg)

    # negative priors: per prompt set, co-sample an equal number of label-0
    # points from each active negative source (reference :643-660); with
    # merge_prompt_types the plain positive sets are decoded as well
    use_negs = (cfg.use_negative_priors_from_discarded
                or cfg.use_negative_priors_from_cost)
    groups = []  # (coords, labels, valid) per prompt family
    if use_negs:
        neg_sources = []
        if cfg.use_negative_priors_from_discarded:
            neg_sources.append(
                negative_points_from_discarded(m["s_mat"], m["support_fg"], cfg))
        if cfg.use_negative_priors_from_cost:
            neg_sources.append(
                negative_points_from_cost(m["cost"], m["support_fg"], cfg))
        for si, (neg_pts, neg_valid) in enumerate(neg_sources):
            kn = jax.random.fold_in(key, 2 + si)
            ncoords, nlabels = co_sample_negatives(
                kn, set_valid, neg_pts, neg_valid, cfg)
            groups.append((
                jnp.concatenate([coords, ncoords], axis=1),
                jnp.concatenate([labels, nlabels], axis=1),
                set_valid,
            ))
        if cfg.merge_prompt_types:
            groups.append((coords, labels, set_valid))
    else:
        groups.append((coords, labels, set_valid))

    points, point_valid = m["points"], m["point_valid"]
    box = None
    if cfg.use_box:
        xv = jnp.where(point_valid, points[:, 0], jnp.inf)
        yv = jnp.where(point_valid, points[:, 1], jnp.inf)
        box = jnp.asarray([
            jnp.maximum(jnp.min(xv), 0),
            jnp.maximum(jnp.min(yv), 0),
            jnp.minimum(jnp.max(jnp.where(point_valid, points[:, 0], -jnp.inf)), cfg.input_size - 1),
            jnp.minimum(jnp.max(jnp.where(point_valid, points[:, 1], -jnp.inf)), cfg.input_size - 1),
        ])

    embedding = amg.encode_target(sam_params, query_image, sam_cfg)

    results = []
    for gcoords, glabels, gvalid in groups:
        results.append(amg.decode_prompt_sets(
            sam_params, embedding,
            gcoords[rows_np], glabels[rows_np], gvalid[rows_np],
            sam_cfg, amg_cfg,
            original_size=(cfg.input_size, cfg.input_size),
            box=box, use_box=cfg.use_box,
            mask_input=mask_input, use_mask_input=use_mask_input,
        ))
    dec = amg.nms_filter(amg.concat_decodes(results), amg_cfg.box_nms_thresh)

    emd_score, purity, coverage = score_masks(
        dec["masks"], dec["valid"], points, point_valid, m["support_fg"],
        m["cost"], cfg,
    )
    merged, final_score, chosen = filter_and_merge(
        dec["masks"], dec["valid"], emd_score, purity, coverage, cfg,
    )
    mask_score = cfg.alpha * emd_score + cfg.beta * purity * coverage ** cfg.exp
    out = {}
    if bucket is not None:
        # ranking-bucket compaction fused into this program: valid rows
        # first, best mask_score first (the decode layout carries dead rows
        # IN PLACE — the size-1..3 combination sets lead the n<=8 family).
        # Doing it here instead of a separate jitted program saves one
        # ~35 ms tunnel dispatch per episode on the inline-proposal path
        # (cli.bucket_generated_proposals consumes these keys when present).
        from mars_tpu.core.episode import pad_proposals

        order = jnp.argsort(jnp.where(dec["valid"], -mask_score, jnp.inf),
                            stable=True)
        bm = dec["masks"][order] * dec["valid"][order][:, None, None]
        props = pad_proposals(bm.astype(jnp.float32), bucket,
                              valid=dec["valid"][order])
        out["bucket_masks"] = props.masks
        out["bucket_valid"] = props.valid
    return out | {
        "proposal_masks": dec["masks"],
        "proposal_valid": dec["valid"],
        "low_res_logits": dec["low_res_logits"],
        "iou": dec["iou"],
        "stability": dec["stability"],
        "emd_score": emd_score,
        "purity": purity,
        "coverage": coverage,
        # per-mask combined score (reference :719-720) — the ranking key
        # for bucketing proposals downstream (cli.bucket_generated_proposals)
        "mask_score": mask_score,
        "merged": merged,
        "final_score": final_score,
        "chosen": chosen,
        "embedding": embedding,  # reusable for cascaded refinement
        # internal-state telemetry (reference Matcher getters :1039-1095)
        "telemetry": {
            "n_support_patches": jnp.sum(m["support_fg"]),
            "n_matched_points": jnp.sum(point_valid),
            "n_prompt_sets": jnp.sum(set_valid) * len(groups),
            "n_proposals": jnp.sum(dec["valid"]),
            "n_merged": jnp.sum(chosen),
            "positive_points_inside_mask": jnp.sum(
                point_valid
                & (merged[jnp.clip(points[:, 1].astype(jnp.int32), 0, merged.shape[0] - 1),
                          jnp.clip(points[:, 0].astype(jnp.int32), 0, merged.shape[1] - 1)] > 0)
            ),
        },
    }


@partial(jax.jit, static_argnames=("dino_cfg", "sam_cfg", "amg_cfg", "cfg",
                                   "rows", "use_mask_input", "bucket"))
def _fused_stage(key, dino_params, sam_params, support_images, support_masks,
                 support_valid, query_image, mask_input,
                 dino_cfg, sam_cfg, amg_cfg, cfg: MatcherConfig, rows,
                 use_mask_input: bool, bucket=None):
    """Match + propose as ONE compiled program over ``rows`` (normally
    union_family_rows — no data-dependent host decision inside).  Shared by
    generate_proposals(fuse_programs=True) and the episode-parallel dp
    generator (parallel/runner.make_batched_proposal_generator)."""
    m = _match_stage(key, dino_params, support_images, support_masks,
                     support_valid, query_image, dino_cfg, cfg)
    out = _propose_stage(key, m, query_image, sam_params, mask_input,
                         sam_cfg, amg_cfg, cfg, rows, use_mask_input,
                         bucket=bucket)
    return m, out


def generate_proposals(
    key,
    dino_params,
    dino_cfg: dinov2.DinoV2Config,
    sam_params,  # {"encoder","prompt_encoder","decoder"}
    sam_cfg: sam.SamConfig,
    amg_cfg: amg.AmgConfig,
    cfg: MatcherConfig,
    support_images: jnp.ndarray,  # (S, H, W, 3) raw [0,1]
    support_masks: jnp.ndarray,  # (S, H, W)
    support_valid: jnp.ndarray,  # (S,)
    query_image: jnp.ndarray,  # (H, W, 3) raw [0,1]
    target_mask_low_res: Optional[jnp.ndarray] = None,  # (4G, 4G) cascade
    timers=None,
    bucket: Optional[int] = None,
    fuse_programs: bool = False,
):
    """Full Matcher flow (reference Matcher.predict :216-249).

    ``bucket``: if set, the propose program ALSO emits a compacted ranking
    bucket ("bucket_masks"/"bucket_valid", best mask_score first) so the
    inline eval path needs no separate compaction dispatch.

    Returns dict with proposal masks (N, H, W) bool + valid, scores,
    merged prediction, and the cost matrix / support footprint (reusable
    by the MARS ranking stage).

    The whole episode runs as exactly TWO compiled programs split at the
    single data-dependent host decision (which prompt family is active,
    n ≤ 8 → combinations, else random draws): dispatches through the
    tunnel-attached chip cost ~35 ms each, so the old 6-8-program flow
    paid a ~190 ms host-dispatch gap per episode (BASELINE.md round-2
    stage profile).  ``timers`` therefore carries two coarse spans
    ("match", "propose"); use jax.profiler (utils.profiling.trace) for
    intra-program detail.  ``fuse_programs=True`` goes further — ONE
    program decoding the union of both families' rows (bit-exact,
    tests/test_matcher.py::TestEndToEnd).
    """
    import contextlib

    span = (timers.span if timers is not None
            else (lambda *a, **k: contextlib.nullcontext()))
    if timers is not None:
        from mars_tpu.utils.profiling import force_sync

    if fuse_programs:
        # ONE program, no host sync: union-family rows replace the host
        # branch (the inactive family is invalid in place; dead-chunk skips
        # price only the active one).  Saves one ~35 ms tunnel dispatch plus
        # the n_prompt device_get round trip, at the cost of the union's
        # larger static decode/NMS/score buffers — A/B per deployment
        # (tools/propose_profile.py --fused).
        rows = union_family_rows(cfg)
        with span("fused"):
            m, out = _fused_stage(
                key, dino_params, sam_params, support_images, support_masks,
                support_valid, query_image, target_mask_low_res,
                dino_cfg, sam_cfg, amg_cfg, cfg, rows,
                target_mask_low_res is not None, bucket=bucket)
            if timers is not None:
                force_sync(out["final_score"])
        out["cost_matrix"] = m["cost"]
        out["support_fg"] = m["support_fg"]
        out["points"] = m["points"]
        out["point_valid"] = m["point_valid"]
        return out

    with span("match"):
        m = _match_stage(key, dino_params, support_images, support_masks,
                         support_valid, query_image, dino_cfg, cfg)
        if timers is not None:
            force_sync(m["prompt_valid"])

    combo_rows, draw_rows = prompt_family_rows(cfg)
    n_pts_host = int(jax.device_get(m["n_prompt"]))
    rows = tuple((draw_rows if n_pts_host > 8 else combo_rows).tolist())

    with span("propose"):
        out = _propose_stage(
            key, m, query_image, sam_params, target_mask_low_res,
            sam_cfg, amg_cfg, cfg, rows,
            target_mask_low_res is not None, bucket=bucket,
        )
        if timers is not None:
            force_sync(out["final_score"])
    out["cost_matrix"] = m["cost"]
    out["support_fg"] = m["support_fg"]
    out["points"] = m["points"]
    out["point_valid"] = m["point_valid"]
    return out
