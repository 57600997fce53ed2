"""End-to-end golden parity for the proposal path (Matcher.predict).

The fixture is one tiny episode pushed through the ACTUAL reference Matcher
(matcher/Matcher.py:216-249,619-834) with seeded weights — tiny DINOv2,
tiny SAM whose prompt conditioning was briefly trained so decoding is
genuinely prompt-driven — and a config that keeps the flow deterministic
(≤8 matched points → combinations family, use_points_or_centers, sel
thresholds 0).  See tools/make_fixtures.py::make_golden_matcher.

The piecewise oracles (auction vs scipy, Sinkhorn vs exact EMD, multi-crop
AMG fixture) pin kernels; this pins the cross-stage WIRING of the whole
proposal pipeline: matching → prompt enumeration → SAM decode → NMS →
purity/coverage/EMD → metric filters → merge (both the score-filter and
top-k paths).

Comparisons are content-based (masks matched by IoU): the reference
enumerates combinations in a different order, but over the same point set
the collection of prompt subsets — and therefore the proposal set — is
order-independent.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mars_tpu.models import convert, dinov2, sam
from mars_tpu.pipeline import amg, matcher

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _sub(sd, prefix):
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _mask_iou_matrix(a, b):
    """(N, H, W) x (M, H, W) bool → (N, M) IoU; empty-vs-empty = 1."""
    af = a.reshape(len(a), -1).astype(np.float64)
    bf = b.reshape(len(b), -1).astype(np.float64)
    inter = af @ bf.T
    union = af.sum(1)[:, None] + bf.sum(1)[None, :] - inter
    iou = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
    return iou


def _greedy_match(iou):
    """Greedy best-IoU assignment → list of (i, j, iou)."""
    iou = iou.copy()
    out = []
    for _ in range(min(iou.shape)):
        i, j = np.unravel_index(np.argmax(iou), iou.shape)
        out.append((int(i), int(j), float(iou[i, j])))
        iou[i, :] = -1
        iou[:, j] = -1
    return out


@pytest.fixture(scope="module")
def golden():
    data = np.load(os.path.join(FIXTURES, "golden_matcher_tiny.npz"))
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    d = {k: data[k] for k in data.files if not k.startswith("sd.")}

    dino_cfg = dinov2.DinoV2Config(
        patch_size=8, embed_dim=32, depth=3, num_heads=2,
        num_register_tokens=4, pos_embed_grid=8,
    )
    scfg = sam.SamConfig(
        img_size=64, patch_size=16, embed_dim=32, depth=3, num_heads=2,
        global_attn_indexes=(1,), window_size=2, out_chans=32,
        decoder_mlp_dim=64, decoder_heads=2,
    )
    sam_sd = _sub(sd, "sam.")
    sam_params = {
        "encoder": convert.sam_encoder_to_flax(sam_sd, depth=3),
        "prompt_encoder": convert.sam_prompt_encoder_to_flax(sam_sd),
        "decoder": convert.sam_decoder_to_flax(sam_sd),
    }
    dino_params = convert.dinov2_to_flax(_sub(sd, "dino."), depth=3,
                                         num_register_tokens=4)
    # generator config mirrors the fixture's (make_fixtures.py)
    mcfg = matcher.MatcherConfig(
        input_size=64, grid=8, patch_size=8,
        sample_range=(2, 3), max_sample_iterations=4,
        alpha=1.0, beta=0.0, exp=0.0,
        emd_filter=0.0, purity_filter=0.02, coverage_filter=0.0,
        use_score_filter=True, deep_score_filter=0.6,
        deep_score_norm_filter=0.4, topk_scores_threshold=0.0,
        num_merging_mask=10, emd_row_bucket=16, emd_col_bucket=64,
    )
    acfg = amg.AmgConfig(
        sel_pred_iou_thresh=0.0, sel_stability_score_thresh=0.0,
        box_nms_thresh=0.5, sel_multimask_output=True, sel_output_layer=3,
        decode_batch=16,
    )
    sup = jnp.asarray(d["support_images"][0].transpose(0, 2, 3, 1))  # (S,H,W,3)
    supm = jnp.asarray(d["support_masks"][0])  # (S,H,W)
    qry = jnp.asarray(d["query_image"][0].transpose(1, 2, 0))  # (H,W,3)
    out = matcher.generate_proposals(
        jax.random.PRNGKey(0), dino_params, dino_cfg, sam_params, scfg,
        acfg, mcfg, sup, supm, jnp.ones((1,), bool), qry,
    )
    return d, out, mcfg


class TestGoldenMatcher:
    def test_cost_matrix_and_footprint(self, golden):
        d, out, _ = golden
        np.testing.assert_allclose(
            np.asarray(out["cost_matrix"]), d["cost_matrix"],
            atol=3e-5, rtol=1e-4)
        np.testing.assert_array_equal(
            np.asarray(out["support_fg"]), d["ref_masks_pool"] > 0)

    def test_matched_points(self, golden):
        d, out, _ = golden
        ours = np.asarray(out["points"])[np.asarray(out["point_valid"])]
        ours_set = {tuple(map(int, p)) for p in ours}
        ref_set = {tuple(map(int, p)) for p in d["points"]}
        assert ours_set == ref_set

    def test_proposal_set(self, golden):
        d, out, _ = golden
        valid = np.asarray(out["proposal_valid"])
        ours = np.asarray(out["proposal_masks"])[valid]
        ref = d["proposals"] > 0
        assert len(ours) == len(ref), (len(ours), len(ref))
        matches = _greedy_match(_mask_iou_matrix(ref, ours))
        for i, j, iou in matches:
            assert iou >= 0.99, f"ref mask {i} best IoU {iou:.4f}"

    def test_per_mask_scores(self, golden):
        d, out, _ = golden
        valid = np.asarray(out["proposal_valid"])
        ours_masks = np.asarray(out["proposal_masks"])[valid]
        matches = _greedy_match(_mask_iou_matrix(d["proposals"] > 0, ours_masks))
        pur = np.asarray(out["purity"])[valid]
        cov = np.asarray(out["coverage"])[valid]
        emd = np.asarray(out["emd_score"])[valid]
        iou_p = np.asarray(out["iou"])[valid]
        stab = np.asarray(out["stability"])[valid]
        for i, j, _ in matches:
            np.testing.assert_allclose(pur[j], d["purity"][i], atol=1e-5)
            np.testing.assert_allclose(cov[j], d["coverage"][i], atol=1e-5)
            # Sinkhorn vs the exact LP solver (PARITY_REPORT.md tolerance)
            np.testing.assert_allclose(emd[j], d["emd"][i], atol=3e-3)
            np.testing.assert_allclose(iou_p[j], d["iou_preds"][i], atol=1e-3)
            np.testing.assert_allclose(stab[j], d["stability"][i], atol=1e-3)

    def test_merged_score_filter_path(self, golden):
        d, out, _ = golden
        merged = np.asarray(out["merged"]) > 0
        ref = d["merged"][0] > 0
        iou = _mask_iou_matrix(ref[None], merged[None])[0, 0]
        assert iou >= 0.99, iou
        np.testing.assert_allclose(
            float(out["final_score"]), d["final_score"], atol=3e-3)

    def test_merged_topk_path(self, golden):
        d, out, mcfg = golden
        from dataclasses import replace

        tk_cfg = replace(mcfg, use_score_filter=False,
                         topk_scores_threshold=0.2)
        merged, final, chosen = matcher.filter_and_merge(
            out["proposal_masks"], out["proposal_valid"], out["emd_score"],
            out["purity"], out["coverage"], tk_cfg,
        )
        iou = _mask_iou_matrix((d["merged_topk"][0] > 0)[None],
                               (np.asarray(merged) > 0)[None])[0, 0]
        assert iou >= 0.99, iou
        np.testing.assert_allclose(float(final), d["final_topk"], atol=3e-3)
