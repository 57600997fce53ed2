"""Matcher pipeline tests: matching oracle parity, prompt sampling structure,
end-to-end proposal generation smoke (tiny random-weight models)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mars_tpu.models import dinov2, sam
from mars_tpu.pipeline import amg, matcher


def reference_matching_oracle(s, fg):
    """Replicates patch_level_matching's pair selection with scipy
    (reference matcher/Matcher.py:436-509) → (pos query cols, sims)."""
    from scipy.optimize import linear_sum_assignment

    s_fwd = s[fg]
    ri, ci = linear_sum_assignment(s_fwd, maximize=True)
    sim_f = s_fwd[ri, ci]
    fg_rows = np.nonzero(fg)[0]
    s_rev = s.T[ci]
    r2, c2 = linear_sum_assignment(s_rev, maximize=True)
    retain = np.isin(c2, fg_rows)
    if not retain.any():
        retain = np.ones_like(retain)
    pos_cols = ci[retain]
    pos_sims = sim_f[retain]
    n = len(pos_sims)
    reduced = n // 2 if n > 40 else n
    order = np.argsort(-pos_sims)
    return set(pos_cols[order[:reduced]].tolist())


class TestMatching:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_scipy_oracle(self, seed):
        rng = np.random.RandomState(seed)
        l = 25
        s = rng.rand(l, l).astype(np.float32)
        fg = rng.rand(l) > 0.6
        if not fg.any():
            fg[0] = True
        cfg = matcher.MatcherConfig(grid=5, patch_size=4, input_size=20)
        points, keep = matcher.matched_points(jnp.asarray(s), jnp.asarray(fg), cfg)
        got_cols = set(np.nonzero(np.asarray(keep))[0].tolist())
        want_cols = reference_matching_oracle(s, fg)
        # auction is near-exact; allow tiny disagreement on ties
        sym_diff = got_cols ^ want_cols
        assert len(sym_diff) <= max(1, len(want_cols) // 10), (got_cols, want_cols)

    def test_points_are_patch_centers(self):
        rng = np.random.RandomState(2)
        s = rng.rand(16, 16).astype(np.float32)
        fg = np.zeros(16, bool)
        fg[3] = True
        cfg = matcher.MatcherConfig(grid=4, patch_size=14, input_size=56)
        points, keep = matcher.matched_points(jnp.asarray(s), jnp.asarray(fg), cfg)
        pts = np.asarray(points)
        # col j → x = (j%4)*14+7, y = (j//4)*14+7
        j = 5
        assert pts[j, 0] == (j % 4) * 14 + 7
        assert pts[j, 1] == (j // 4) * 14 + 7


class TestPromptSampling:
    def _cfg(self):
        return matcher.MatcherConfig(sample_range=(4, 6), max_sample_iterations=30)

    def test_combinations_path(self):
        cfg = self._cfg()
        l = 20
        pts = np.arange(l * 2).reshape(l, 2).astype(np.float32)
        valid = np.zeros(l, bool)
        valid[:5] = True  # n=5 → sizes [4, 5] → C(5,4)+C(5,5) = 6 sets
        coords, labels, set_valid = matcher.sample_prompt_sets(
            jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(valid), cfg
        )
        sv = np.asarray(set_valid)
        sizes = matcher.prompt_set_sizes(cfg)
        assert sv.sum() == 6
        assert set(sizes[sv].tolist()) == {4, 5}
        # active sets only reference valid points (first 5 compacted)
        lv = np.asarray(labels)[sv]
        cv = np.asarray(coords)[sv]
        n_pts = (lv == 1).sum(axis=1)
        np.testing.assert_array_equal(np.sort(n_pts), [4, 4, 4, 4, 4, 5])
        assert np.all(cv[lv == 1][:, 0] < 10)  # all from the first 5 points

    def test_random_path(self):
        cfg = self._cfg()
        l = 40
        pts = np.arange(l * 2).reshape(l, 2).astype(np.float32)
        valid = np.ones(l, bool)  # n = 40 > 8 → 30 draws per size 4..6
        coords, labels, set_valid = matcher.sample_prompt_sets(
            jax.random.PRNGKey(1), jnp.asarray(pts), jnp.asarray(valid), cfg
        )
        sv = np.asarray(set_valid)
        sizes = matcher.prompt_set_sizes(cfg)
        assert sv.sum() == 90
        assert np.all(sizes[sv] >= 4)
        # no duplicate points within a set (without-replacement draws)
        cv, lv = np.asarray(coords), np.asarray(labels)
        for r in np.nonzero(sv)[0][:10]:
            pts_r = cv[r][lv[r] == 1]
            assert len({tuple(p) for p in pts_r}) == len(pts_r)


class TestEndToEnd:
    def test_generate_proposals_smoke(self):
        key = jax.random.PRNGKey(0)
        dcfg = dinov2.DinoV2Config(
            patch_size=14, embed_dim=32, depth=2, num_heads=2,
            num_register_tokens=4, pos_embed_grid=4,
        )
        scfg = sam.SamConfig(
            img_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=2,
            global_attn_indexes=(1,), window_size=2, out_chans=16,
            decoder_mlp_dim=32, decoder_heads=2,
        )
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        dino_params = dinov2.init_params(k1, dcfg)
        sam_params = {
            "encoder": sam.init_encoder_params(k2, scfg),
            "prompt_encoder": sam.init_prompt_encoder_params(k3, scfg),
            "decoder": sam.init_decoder_params(k4, scfg),
        }
        mcfg = matcher.MatcherConfig(
            input_size=56, grid=4, patch_size=14,
            sample_range=(2, 3), max_sample_iterations=4,
            emd_row_bucket=16, emd_col_bucket=16,
        )
        acfg = amg.AmgConfig(
            sel_pred_iou_thresh=0.0, sel_stability_score_thresh=0.0,
            decode_batch=8,
        )
        s, h = 1, 56
        sup = jax.random.uniform(k5, (s, h, h, 3))
        qry = jax.random.uniform(jax.random.PRNGKey(9), (h, h, 3))
        masks = jnp.zeros((s, h, h)).at[:, 10:30, 10:30].set(1.0)

        out = matcher.generate_proposals(
            jax.random.PRNGKey(7), dino_params, dcfg, sam_params, scfg,
            acfg, mcfg, sup, masks, jnp.ones((s,), bool), qry,
        )
        pm = np.asarray(out["proposal_masks"])
        assert pm.shape[1:] == (56, 56)
        assert np.isfinite(np.asarray(out["emd_score"])).all()
        assert np.isfinite(np.asarray(out["merged"])).all()
        assert np.asarray(out["merged"]).shape == (56, 56)
        # at least one proposal should be live with zeroed thresholds
        assert np.asarray(out["proposal_valid"]).sum() >= 1

        # in-program bucket compaction (bucket=) must match the standalone
        # cli.bucket_generated_proposals program bit-for-bit
        from mars_tpu import cli

        out_b = matcher.generate_proposals(
            jax.random.PRNGKey(7), dino_params, dcfg, sam_params, scfg,
            acfg, mcfg, sup, masks, jnp.ones((s,), bool), qry, bucket=8,
        )
        fused = cli.bucket_generated_proposals(out_b, bucket=8)
        standalone = cli.bucket_generated_proposals(out, bucket=8)
        np.testing.assert_array_equal(np.asarray(fused.masks),
                                      np.asarray(standalone.masks))
        np.testing.assert_array_equal(np.asarray(fused.valid),
                                      np.asarray(standalone.valid))

        # fuse_programs=True (ONE program, union-family rows, no host
        # decision) must be bit-exact on the bucket view and the merged
        # prediction; per-row arrays live in the union layout so only the
        # compacted outputs are comparable
        out_f = matcher.generate_proposals(
            jax.random.PRNGKey(7), dino_params, dcfg, sam_params, scfg,
            acfg, mcfg, sup, masks, jnp.ones((s,), bool), qry, bucket=8,
            fuse_programs=True,
        )
        np.testing.assert_array_equal(np.asarray(out_f["bucket_masks"]),
                                      np.asarray(out_b["bucket_masks"]))
        np.testing.assert_array_equal(np.asarray(out_f["bucket_valid"]),
                                      np.asarray(out_b["bucket_valid"]))
        np.testing.assert_array_equal(np.asarray(out_f["merged"]),
                                      np.asarray(out_b["merged"]))


class TestNegativePriors:
    def test_negatives_disjoint_from_positives(self):
        rng = np.random.RandomState(3)
        l = 25
        s = rng.rand(l, l).astype(np.float32)
        fg = rng.rand(l) > 0.5
        cfg = matcher.MatcherConfig(grid=5, patch_size=4, input_size=20)
        _, pos = matcher.matched_points(jnp.asarray(s), jnp.asarray(fg), cfg)
        _, neg = matcher.negative_points_from_discarded(
            jnp.asarray(s), jnp.asarray(fg), cfg
        )
        # discarded-negatives are forward pairs NOT retained → can't overlap
        # with the retained-positive set unless the fallback fired
        overlap = np.asarray(pos) & np.asarray(neg)
        if np.asarray(neg).any():
            assert not overlap.any()

    def test_cost_negatives_shape(self):
        rng = np.random.RandomState(4)
        l = 16
        cost = rng.rand(l, l).astype(np.float32) * 0.5
        fg = rng.rand(l) > 0.5
        cfg = matcher.MatcherConfig(grid=4, patch_size=4, input_size=16)
        pts, keep = matcher.negative_points_from_cost(
            jnp.asarray(cost), jnp.asarray(fg), cfg
        )
        assert pts.shape == (l, 2)
        assert np.asarray(keep).dtype == bool

    def test_co_sample_negatives(self):
        cfg = matcher.MatcherConfig(sample_range=(2, 3), max_sample_iterations=4)
        l = 20
        neg_pts = np.arange(l * 2).reshape(l, 2).astype(np.float32)
        neg_valid = np.zeros(l, bool)
        neg_valid[:5] = True
        sizes = matcher.prompt_set_sizes(cfg)
        coords, labels = matcher.co_sample_negatives(
            jax.random.PRNGKey(0), jnp.ones(len(sizes), bool),
            jnp.asarray(neg_pts), jnp.asarray(neg_valid), cfg,
        )
        lv = np.asarray(labels)
        assert coords.shape == (len(sizes), 3, 2)
        for r in range(len(sizes)):
            assert (lv[r] == 0).sum() == sizes[r]
        # all drawn negatives come from the valid pool (first 5 points)
        cv = np.asarray(coords)
        assert cv[lv == 0].max() < 10


class TestDenseGrid:
    def test_generate_dense_smoke(self):
        key = jax.random.PRNGKey(0)
        scfg = sam.SamConfig(
            img_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=2,
            global_attn_indexes=(1,), window_size=2, out_chans=16,
            decoder_mlp_dim=32, decoder_heads=2,
        )
        ks = jax.random.split(key, 3)
        params = {
            "encoder": sam.init_encoder_params(ks[0], scfg),
            "prompt_encoder": sam.init_prompt_encoder_params(ks[1], scfg),
            "decoder": sam.init_decoder_params(ks[2], scfg),
        }
        acfg = amg.AmgConfig(points_per_side=4, pred_iou_thresh=0.0,
                             stability_score_thresh=0.0, decode_batch=8)
        img = jax.random.uniform(ks[2], (56, 56, 3))
        emb = amg.encode_target(params, img, scfg)
        out = amg.generate_dense(params, emb, scfg, acfg, original_size=(56, 56))
        assert out["masks"].shape[0] == 48  # 4x4 grid x 3 multimask slots
        assert np.isfinite(np.asarray(out["iou"])).all()


class TestNegativeEndToEnd:
    def test_generate_with_negative_priors(self):
        key = jax.random.PRNGKey(0)
        dcfg = dinov2.DinoV2Config(
            patch_size=14, embed_dim=32, depth=2, num_heads=2,
            num_register_tokens=4, pos_embed_grid=4,
        )
        scfg = sam.SamConfig(
            img_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=2,
            global_attn_indexes=(1,), window_size=2, out_chans=16,
            decoder_mlp_dim=32, decoder_heads=2,
        )
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        dino_params = dinov2.init_params(k1, dcfg)
        sam_params = {
            "encoder": sam.init_encoder_params(k2, scfg),
            "prompt_encoder": sam.init_prompt_encoder_params(k3, scfg),
            "decoder": sam.init_decoder_params(k4, scfg),
        }
        mcfg = matcher.MatcherConfig(
            input_size=56, grid=4, patch_size=14,
            sample_range=(2, 3), max_sample_iterations=2,
            emd_row_bucket=16, emd_col_bucket=16,
            use_negative_priors_from_discarded=True,
            use_negative_priors_from_cost=True, merge_prompt_types=True,
        )
        acfg = amg.AmgConfig(sel_pred_iou_thresh=0.0,
                             sel_stability_score_thresh=0.0, decode_batch=8)
        sup = jax.random.uniform(k5, (1, 56, 56, 3))
        qry = jax.random.uniform(jax.random.PRNGKey(9), (56, 56, 3))
        masks = jnp.zeros((1, 56, 56)).at[:, 10:30, 10:30].set(1.0)
        out = matcher.generate_proposals(
            jax.random.PRNGKey(7), dino_params, dcfg, sam_params, scfg,
            acfg, mcfg, sup, masks, jnp.ones((1,), bool), qry, bucket=8,
        )
        assert np.isfinite(np.asarray(out["merged"])).all()
        assert int(out["telemetry"]["n_prompt_sets"]) >= 0

        # the fused single-program flow must stay bit-exact with BOTH
        # negative-prior sources enabled (the cost-matrix source is the
        # 1376x1536 auction geometry that exceeded the Pallas kernel's
        # default VMEM cap on hardware)
        out_f = matcher.generate_proposals(
            jax.random.PRNGKey(7), dino_params, dcfg, sam_params, scfg,
            acfg, mcfg, sup, masks, jnp.ones((1,), bool), qry, bucket=8,
            fuse_programs=True,
        )
        np.testing.assert_array_equal(np.asarray(out_f["bucket_masks"]),
                                      np.asarray(out["bucket_masks"]))
        np.testing.assert_array_equal(np.asarray(out_f["bucket_valid"]),
                                      np.asarray(out["bucket_valid"]))
        np.testing.assert_array_equal(np.asarray(out_f["merged"]),
                                      np.asarray(out["merged"]))


class TestCascade:
    def test_cascaded_refinement(self):
        """Second decode pass conditioned on a previous low-res prediction."""
        key = jax.random.PRNGKey(0)
        dcfg = dinov2.DinoV2Config(
            patch_size=14, embed_dim=32, depth=2, num_heads=2,
            num_register_tokens=4, pos_embed_grid=4,
        )
        scfg = sam.SamConfig(
            img_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=2,
            global_attn_indexes=(1,), window_size=2, out_chans=16,
            decoder_mlp_dim=32, decoder_heads=2,
        )
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        dino_params = dinov2.init_params(k1, dcfg)
        sam_params = {
            "encoder": sam.init_encoder_params(k2, scfg),
            "prompt_encoder": sam.init_prompt_encoder_params(k3, scfg),
            "decoder": sam.init_decoder_params(k4, scfg),
        }
        mcfg = matcher.MatcherConfig(
            input_size=56, grid=4, patch_size=14,
            sample_range=(2, 3), max_sample_iterations=2,
            emd_row_bucket=16, emd_col_bucket=16,
        )
        acfg = amg.AmgConfig(sel_pred_iou_thresh=0.0,
                             sel_stability_score_thresh=0.0, decode_batch=8)
        sup = jax.random.uniform(k5, (1, 56, 56, 3))
        qry = jax.random.uniform(jax.random.PRNGKey(9), (56, 56, 3))
        masks = jnp.zeros((1, 56, 56)).at[:, 10:30, 10:30].set(1.0)
        prev = jax.random.normal(jax.random.PRNGKey(11), (16, 16))
        out = matcher.generate_proposals(
            jax.random.PRNGKey(7), dino_params, dcfg, sam_params, scfg,
            acfg, mcfg, sup, masks, jnp.ones((1,), bool), qry,
            target_mask_low_res=prev,
        )
        assert np.isfinite(np.asarray(out["merged"])).all()
        out0 = matcher.generate_proposals(
            jax.random.PRNGKey(7), dino_params, dcfg, sam_params, scfg,
            acfg, mcfg, sup, masks, jnp.ones((1,), bool), qry,
        )
        # conditioning on a mask input must change the decoded logits
        assert not np.allclose(
            np.asarray(out["low_res_logits"]), np.asarray(out0["low_res_logits"])
        )


class TestMultiCropAmg:
    def test_crop_boxes_match_reference(self):
        # geometry oracle values computed from utils/amg.py:200-239 by hand
        boxes, layers = amg.generate_crop_boxes((64, 64), 1, 512 / 1500)
        assert boxes[0] == (0, 0, 64, 64) and layers[0] == 0
        assert len(boxes) == 5 and layers[1:] == [1, 1, 1, 1]
        # overlap=int(512/1500*64)=21, crop_len=ceil((21+64)/2)=43, x0 in {0,22}
        assert boxes[1] == (0, 0, 43, 43)
        assert boxes[4] == (22, 22, 64, 64)

    def test_matches_reference_fixture(self):
        """End-to-end dense AMG with crop_n_layers=1 vs the reference
        SamAutomaticMaskGenerator output (fixture from make_fixtures.py)."""
        import os

        from mars_tpu.models import convert

        path = os.path.join(os.path.dirname(__file__), "fixtures",
                            "amg_multicrop_tiny.npz")
        data = np.load(path)
        sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
        scfg = sam.SamConfig(
            img_size=64, patch_size=16, embed_dim=32, depth=3, num_heads=2,
            global_attn_indexes=(1,), window_size=2, out_chans=16,
            decoder_mlp_dim=32, decoder_heads=2,
        )
        params = {
            "encoder": convert.sam_encoder_to_flax(sd, depth=3),
            "prompt_encoder": convert.sam_prompt_encoder_to_flax(sd),
            "decoder": convert.sam_decoder_to_flax(sd),
        }
        acfg = amg.AmgConfig(
            points_per_side=4, decode_batch=16,
            pred_iou_thresh=0.0, stability_score_thresh=0.0,
            box_nms_thresh=0.5, crop_n_layers=1, crop_nms_thresh=0.5,
            multimask_output=True, output_layer=3,
        )
        img01 = jnp.asarray(data["image"].astype(np.float32) / 255.0)
        out = amg.generate_multicrop(params, img01, scfg, acfg,
                                     original_size=(64, 64))
        valid = np.asarray(out["valid"])
        got = np.asarray(out["masks"])[valid]
        # empty masks stay valid on both sides (they never win or lose
        # NMS, reference keeps them) — compare the non-empty sets
        got = got[got.sum(axis=(1, 2)) > 0]
        want = data["masks"].astype(bool)
        want = want[want.sum(axis=(1, 2)) > 0]
        assert got.shape[0] == want.shape[0]
        inter = np.einsum("ihw,jhw->ij", got.astype(np.float64),
                          want.astype(np.float64))
        union = (got.sum(axis=(1, 2))[:, None] + want.sum(axis=(1, 2))[None]
                 - inter)
        iou = inter / np.maximum(union, 1)
        # every reference mask has an exact (or near-exact) counterpart
        assert (iou.max(axis=0) > 0.98).all(), iou.max(axis=0)


class TestPostprocessSmallRegions:
    def test_cleanup_and_renms(self):
        h = 32
        masks = np.zeros((2, h, h), bool)
        masks[0, 4:20, 4:20] = True
        masks[0, 8, 8] = False          # small hole → filled
        masks[0, 28, 28] = True         # small island → removed
        masks[1, 22:30, 2:10] = True    # untouched
        data = {
            "masks": jnp.asarray(masks),
            "boxes": jnp.zeros((2, 4), jnp.float32),
            "iou": jnp.asarray([0.9, 0.8]),
            "valid": jnp.ones(2, bool),
        }
        out = amg.postprocess_small_regions(data, min_area=4, nms_thresh=0.7)
        m = np.asarray(out["masks"])
        assert m[0, 8, 8]          # hole filled
        assert not m[0, 28, 28]    # island gone
        assert np.asarray(out["valid"]).all()
        np.testing.assert_array_equal(
            np.asarray(out["boxes"][0]), [4, 4, 19, 19]
        )


class TestMultiShotMatcher:
    def test_generate_proposals_two_shots(self):
        key = jax.random.PRNGKey(0)
        dcfg = dinov2.DinoV2Config(
            patch_size=14, embed_dim=32, depth=2, num_heads=2,
            num_register_tokens=4, pos_embed_grid=4,
        )
        scfg = sam.SamConfig(
            img_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=2,
            global_attn_indexes=(1,), window_size=2, out_chans=16,
            decoder_mlp_dim=32, decoder_heads=2,
        )
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        dino_params = dinov2.init_params(k1, dcfg)
        sam_params = {
            "encoder": sam.init_encoder_params(k2, scfg),
            "prompt_encoder": sam.init_prompt_encoder_params(k3, scfg),
            "decoder": sam.init_decoder_params(k4, scfg),
        }
        mcfg = matcher.MatcherConfig(
            input_size=56, grid=4, patch_size=14,
            sample_range=(2, 3), max_sample_iterations=2,
            emd_row_bucket=32, emd_col_bucket=16,
        )
        acfg = amg.AmgConfig(sel_pred_iou_thresh=0.0,
                             sel_stability_score_thresh=0.0, decode_batch=8)
        # 2 real shots + 1 padded; large masks force T > L (fwd_cols branch)
        sup = jax.random.uniform(k5, (3, 56, 56, 3))
        masks = jnp.zeros((3, 56, 56)).at[:2].set(1.0)
        valid = jnp.asarray([True, True, False])
        qry = jax.random.uniform(jax.random.PRNGKey(9), (56, 56, 3))
        out = matcher.generate_proposals(
            jax.random.PRNGKey(7), dino_params, dcfg, sam_params, scfg,
            acfg, mcfg, sup, masks, valid, qry,
        )
        assert np.isfinite(np.asarray(out["merged"])).all()
        # T = 2*16 = 32 > L = 16 → every query column matched via transpose
        assert int(out["telemetry"]["n_support_patches"]) == 32


class TestPaddedDecode:
    def test_masked_padding_matches_exact_slicing(self):
        """A prompt row padded to a larger K with label -1 slots must decode
        EXACTLY like the unpadded row: pad tokens are attention-masked in
        the two-way decoder (sam.decode_masks sparse_valid), which is what
        lets mixed-size families share one batched decode where the
        reference batches per size (automatic_mask_generator.py:455-556)."""
        scfg = sam.SamConfig(
            img_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=2,
            global_attn_indexes=(1,), window_size=2, out_chans=16,
            decoder_mlp_dim=32, decoder_heads=2,
        )
        ks = jax.random.split(jax.random.PRNGKey(3), 4)
        params = {
            "encoder": sam.init_encoder_params(ks[0], scfg),
            "prompt_encoder": sam.init_prompt_encoder_params(ks[1], scfg),
            "decoder": sam.init_decoder_params(ks[2], scfg),
        }
        acfg = amg.AmgConfig(sel_pred_iou_thresh=0.0,
                             sel_stability_score_thresh=0.0,
                             sel_multimask_output=True, sel_output_layer=3,
                             decode_batch=4)
        emb = amg.encode_target(params, jax.random.uniform(ks[3], (56, 56, 3)),
                                scfg)
        coords2 = jnp.asarray([[[12.0, 20.0], [40.0, 31.0]],
                               [[7.0, 7.0], [30.0, 44.0]]])
        labels2 = jnp.ones((2, 2), jnp.int32)
        exact = amg.decode_prompt_sets(
            params, emb, coords2, labels2, jnp.ones((2,), bool), scfg, acfg,
            original_size=(56, 56))
        coords6 = jnp.pad(coords2, ((0, 0), (0, 4), (0, 0)),
                          constant_values=33.0)  # junk coords in pad slots
        labels6 = jnp.pad(labels2, ((0, 0), (0, 4)), constant_values=-1)
        padded = amg.decode_prompt_sets(
            params, emb, coords6, labels6, jnp.ones((2,), bool), scfg, acfg,
            original_size=(56, 56))
        np.testing.assert_allclose(np.asarray(padded["iou"]),
                                   np.asarray(exact["iou"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(padded["low_res_logits"]),
                                   np.asarray(exact["low_res_logits"]),
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(padded["masks"]),
                                      np.asarray(exact["masks"]))
        np.testing.assert_array_equal(np.asarray(padded["boxes"]),
                                      np.asarray(exact["boxes"]))


class TestMatcherOss:
    """Semantic-SAM-variant driver (matcher_oss) on the SAM adapter."""

    def _models(self):
        dcfg = dinov2.DinoV2Config(
            patch_size=14, embed_dim=32, depth=2, num_heads=2,
            num_register_tokens=4, pos_embed_grid=4,
        )
        scfg = sam.SamConfig(
            img_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=2,
            global_attn_indexes=(1,), window_size=2, out_chans=16,
            decoder_mlp_dim=32, decoder_heads=2,
        )
        ks = jax.random.split(jax.random.PRNGKey(1), 4)
        dino_params = dinov2.init_params(ks[0], dcfg)
        sam_params = {
            "encoder": sam.init_encoder_params(ks[1], scfg),
            "prompt_encoder": sam.init_prompt_encoder_params(ks[2], scfg),
            "decoder": sam.init_decoder_params(ks[3], scfg),
        }
        return dcfg, dino_params, scfg, sam_params

    def test_oss_flow(self):
        from mars_tpu.pipeline import matcher_oss

        dcfg, dino_params, scfg, sam_params = self._models()
        cfg = matcher.MatcherConfig(
            input_size=56, grid=4, patch_size=14,
            sample_range=(1, 2), max_sample_iterations=2,
            emd_row_bucket=16, emd_col_bucket=16,
        )
        backend = matcher_oss.SamPointBackend(sam_params, scfg, decode_batch=8)
        sup = jax.random.uniform(jax.random.PRNGKey(2), (1, 56, 56, 3))
        masks = jnp.zeros((1, 56, 56)).at[:, 10:40, 10:40].set(1.0)
        qry = jax.random.uniform(jax.random.PRNGKey(3), (56, 56, 3))
        out = matcher_oss.generate_proposals_oss(
            jax.random.PRNGKey(4), dino_params, dcfg, backend, cfg,
            sup, masks, jnp.ones(1, bool), qry,
        )
        assert out["merged"].shape == (56, 56)
        assert np.isfinite(np.asarray(out["emd_score"])).all()
        # 3 granularity masks per prompt set
        assert out["proposal_masks"].shape[0] == 3 * (
            out["chosen"].shape[0] // 3) == out["chosen"].shape[0]
        # embedding cache: second call on the same query reuses the encode
        emb1 = backend._embed_cache[1]
        matcher_oss.generate_proposals_oss(
            jax.random.PRNGKey(5), dino_params, dcfg, backend, cfg,
            sup, masks, jnp.ones(1, bool), qry,
        )
        assert backend._embed_cache[1] is emb1

    def test_oss_clustering_path(self):
        from mars_tpu.pipeline import matcher_oss

        dcfg, dino_params, scfg, sam_params = self._models()
        cfg = matcher.MatcherConfig(
            input_size=56, grid=4, patch_size=14,
            sample_range=(1, 2), max_sample_iterations=2,
            emd_row_bucket=16, emd_col_bucket=16,
            use_points_or_centers=False, num_centers=3,
        )
        backend = matcher_oss.SamPointBackend(sam_params, scfg, decode_batch=8)
        sup = jax.random.uniform(jax.random.PRNGKey(6), (1, 56, 56, 3))
        masks = jnp.ones((1, 56, 56))
        qry = jax.random.uniform(jax.random.PRNGKey(7), (56, 56, 3))
        out = matcher_oss.generate_proposals_oss(
            jax.random.PRNGKey(8), dino_params, dcfg, backend, cfg,
            sup, masks, jnp.ones(1, bool), qry,
        )
        assert np.isfinite(float(out["final_score"]))


class TestSemanticSamBackend:
    """The native Semantic-SAM network behind the PointPredictorBackend
    protocol — closes the reference's external-package configuration
    (Matcher_SemanticSAM.py:23)."""

    def _models(self):
        from mars_tpu.models import semantic_sam as ss

        dcfg = dinov2.DinoV2Config(
            patch_size=14, embed_dim=32, depth=2, num_heads=2,
            num_register_tokens=4, pos_embed_grid=4,
        )
        dino_params = dinov2.init_params(jax.random.PRNGKey(1), dcfg)
        ss_params = ss.init_params(jax.random.PRNGKey(2), ss.SEMANTIC_SAM_TINY)
        return dcfg, dino_params, ss.SEMANTIC_SAM_TINY, ss_params

    def test_backend_contract(self):
        from mars_tpu.pipeline import matcher_oss

        dcfg, dino_params, sscfg, ss_params = self._models()
        backend = matcher_oss.SemanticSamBackend(ss_params, sscfg)
        qry = jax.random.uniform(jax.random.PRNGKey(3), (56, 56, 3))
        coords = jnp.asarray([[[0.3, 0.4], [0.6, 0.6]],
                              [[0.1, 0.9], [0.5, 0.5]]])
        labels = jnp.asarray([[1, 1], [1, -1]])
        sv = jnp.asarray([True, False])
        masks, valid = backend.predict_batch(qry, coords, labels, sv, (56, 56))
        g = sscfg.num_granularities
        assert masks.shape == (2 * g, 56, 56) and masks.dtype == bool
        assert valid.shape == (2 * g,)
        np.testing.assert_array_equal(np.asarray(valid),
                                      [True] * g + [False] * g)

    def test_oss_flow_native_backend(self):
        from mars_tpu.pipeline import matcher_oss

        dcfg, dino_params, sscfg, ss_params = self._models()
        cfg = matcher.MatcherConfig(
            input_size=56, grid=4, patch_size=14,
            sample_range=(1, 2), max_sample_iterations=2,
            emd_row_bucket=16, emd_col_bucket=16,
        )
        backend = matcher_oss.SemanticSamBackend(ss_params, sscfg)
        sup = jax.random.uniform(jax.random.PRNGKey(4), (1, 56, 56, 3))
        masks = jnp.zeros((1, 56, 56)).at[:, 10:40, 10:40].set(1.0)
        qry = jax.random.uniform(jax.random.PRNGKey(5), (56, 56, 3))
        out = matcher_oss.generate_proposals_oss(
            jax.random.PRNGKey(6), dino_params, dcfg, backend, cfg,
            sup, masks, jnp.ones(1, bool), qry,
        )
        assert out["merged"].shape == (56, 56)
        assert out["proposal_masks"].shape[1:] == (56, 56)
        assert out["proposal_masks"].shape[0] % sscfg.num_granularities == 0
        assert np.isfinite(np.asarray(out["emd_score"])).all()
        # encode cache reused across calls on the same query
        emb1 = backend._embed_cache[1]
        matcher_oss.generate_proposals_oss(
            jax.random.PRNGKey(7), dino_params, dcfg, backend, cfg,
            sup, masks, jnp.ones(1, bool), qry,
        )
        assert backend._embed_cache[1] is emb1
