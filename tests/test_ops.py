"""Kernel tests against host oracles (cv2, scipy, numpy)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mars_tpu.ops import assignment, components, emd, kmeans, nms


def cv2_box_union(fg: np.ndarray) -> np.ndarray:
    """Oracle reproducing the reference's _scoremap2bbox + box paint
    (PriorInformationRefinementModule.py:53-63,91-122)."""
    import cv2

    h, w = fg.shape
    img = (fg.astype(np.uint8) * 255)[..., None]
    contours = cv2.findContours(img, cv2.RETR_TREE, cv2.CHAIN_APPROX_SIMPLE)[0]
    B = np.zeros((h, w), np.float32)
    if len(contours) == 0:
        return B
    for contour in contours:
        x, y, ww, hh = cv2.boundingRect(contour)
        x1 = min(x + ww, w - 1)
        y1 = min(y + hh, h - 1)
        B[y:y1, x:x1] = 1
    return B


class TestComponents:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_box_union_matches_cv2(self, seed):
        rng = np.random.RandomState(seed)
        fg = rng.rand(37, 37) > 0.8
        got = np.asarray(components.component_boxes_union(jnp.asarray(fg)))
        want = cv2_box_union(fg)
        np.testing.assert_array_equal(got, want)

    def test_box_union_blobs(self):
        fg = np.zeros((37, 37), bool)
        fg[2:6, 3:9] = True
        fg[20:30, 15:25] = True
        fg[35:, 30:] = True  # touches bottom/right edge → clamp quirk
        got = np.asarray(components.component_boxes_union(jnp.asarray(fg)))
        np.testing.assert_array_equal(got, cv2_box_union(fg))

    def test_box_union_empty(self):
        fg = np.zeros((16, 16), bool)
        got = np.asarray(components.component_boxes_union(jnp.asarray(fg)))
        assert got.sum() == 0

    def test_labels_diagonal_connectivity(self):
        fg = np.zeros((8, 8), bool)
        fg[0, 0] = fg[1, 1] = fg[2, 2] = True  # 8-connected diagonal chain
        lab = np.asarray(components.label_components(jnp.asarray(fg)))
        assert lab[0, 0] == lab[1, 1] == lab[2, 2] == 0

    def test_threshold_prior_matches_cv2(self):
        import cv2

        rng = np.random.RandomState(7)
        prior = rng.rand(37, 37).astype(np.float32)
        got = np.asarray(components.threshold_prior(jnp.asarray(prior), 0.4))
        img = (prior * 255).astype(np.uint8)[..., None]
        _, thr = cv2.threshold(img, int(0.4 * img.max()), 255, cv2.THRESH_BINARY)
        np.testing.assert_array_equal(got, thr > 0)

    def test_remove_small_regions(self):
        mask = np.zeros((20, 20), bool)
        mask[2:12, 2:12] = True
        mask[5, 5] = False  # 1-px hole
        mask[16, 16] = True  # 1-px island
        filled, ch1 = components.remove_small_regions(jnp.asarray(mask), 4.0, True)
        assert bool(ch1)
        assert np.asarray(filled)[5, 5]  # hole filled
        out, ch2 = components.remove_small_regions(filled, 4.0, False)
        assert bool(ch2)
        assert not np.asarray(out)[16, 16]  # island removed
        assert np.asarray(out)[3, 3]

    @staticmethod
    def _rsr_oracle(mask, area_thresh, mode_holes):
        """cv2-based oracle for segment_anything/utils/amg.py:274-299,
        including the islands-mode keep-largest fallback (:292-296)."""
        import cv2

        work = (~mask if mode_holes else mask).astype(np.uint8)
        n, lab, stats, _ = cv2.connectedComponentsWithStats(work, 8)
        sizes = stats[1:, -1]
        small = np.flatnonzero(sizes < area_thresh) + 1
        if small.size == 0:
            return mask, False
        if mode_holes:
            out = np.isin(lab, np.concatenate([[0], small]))
        else:
            keep = np.setdiff1d(np.arange(1, n), small)
            if keep.size == 0:
                keep = np.array([np.argmax(sizes) + 1])
            out = np.isin(lab, keep)
        return out, True

    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("mode_holes", [False, True])
    def test_remove_small_regions_vs_cv2(self, seed, mode_holes):
        rng = np.random.RandomState(seed)
        mask = rng.rand(24, 24) > 0.7
        # 1e6 puts every region below threshold → islands keep-largest path
        for thresh in (2.0, 6.0, 1e6):
            got, ch = components.remove_small_regions(
                jnp.asarray(mask), thresh, mode_holes
            )
            want, wch = self._rsr_oracle(mask, thresh, mode_holes)
            np.testing.assert_array_equal(np.asarray(got), want, err_msg=f"{thresh}")
            assert bool(ch) == wch

    def test_remove_small_regions_all_small_keeps_largest(self):
        # the round-1 parity bug: every island below threshold must keep the
        # largest, not empty the mask (amg.py:292-296)
        mask = np.zeros((16, 16), bool)
        mask[1:3, 1:3] = True   # 4 px
        mask[8:11, 8:11] = True  # 9 px — the survivor
        mask[14, 14] = True      # 1 px
        out, ch = components.remove_small_regions(jnp.asarray(mask), 100.0, False)
        want, _ = self._rsr_oracle(mask, 100.0, False)
        np.testing.assert_array_equal(np.asarray(out), want)
        assert bool(ch) and np.asarray(out).sum() == 9

    def test_remove_small_regions_empty(self):
        mask = np.zeros((12, 12), bool)
        out, ch = components.remove_small_regions(jnp.asarray(mask), 5.0, False)
        assert not bool(ch) and np.asarray(out).sum() == 0


class TestEmd:
    @pytest.mark.parametrize("seed,t,c", [(0, 12, 8), (1, 20, 5), (2, 7, 15)])
    def test_matches_exact_lp(self, seed, t, c):
        rng = np.random.RandomState(seed)
        cost = rng.rand(40, 30).astype(np.float32) * 0.5
        row_mask = np.zeros(40, bool)
        row_mask[rng.choice(40, t, replace=False)] = True
        col_mask = np.zeros((1, 30), bool)
        col_mask[0, rng.choice(30, c, replace=False)] = True

        got = float(
            emd.batched_emd(
                jnp.asarray(cost), jnp.asarray(row_mask), jnp.asarray(col_mask),
                row_bucket=64, col_bucket=64,
            )[0]
        )
        exact = emd.exact_emd_lp(cost[row_mask][:, col_mask[0]])
        assert abs(got - exact) < 5e-3, (got, exact)

    def test_batched_and_empty(self):
        rng = np.random.RandomState(3)
        cost = rng.rand(30, 30).astype(np.float32)
        row_mask = np.ones(30, bool)
        col_masks = np.zeros((3, 30), bool)
        col_masks[0, :10] = True
        col_masks[1, 5:25] = True
        # col_masks[2] empty
        out = np.asarray(
            emd.batched_emd(jnp.asarray(cost), jnp.asarray(row_mask),
                            jnp.asarray(col_masks), row_bucket=32, col_bucket=32)
        )
        assert out.shape == (3,)
        assert out[2] == 0.0
        for i, cm in enumerate(col_masks[:2]):
            exact = emd.exact_emd_lp(cost[:, cm])
            assert abs(out[i] - exact) < 5e-3


class TestAssignment:
    @pytest.mark.parametrize("seed,t,n", [(0, 10, 10), (1, 15, 40), (2, 60, 80)])
    def test_near_optimal_vs_scipy(self, seed, t, n):
        from scipy.optimize import linear_sum_assignment

        rng = np.random.RandomState(seed)
        s = rng.rand(t, n).astype(np.float32)
        cols = np.asarray(
            assignment.auction_assignment(jnp.asarray(s), jnp.ones(t, bool))
        )
        # valid assignment: distinct columns
        assert len(set(cols.tolist())) == t
        got_total = s[np.arange(t), cols].sum()
        ri, ci = linear_sum_assignment(s, maximize=True)
        opt_total = s[ri, ci].sum()
        assert got_total >= opt_total - 1e-3 * t, (got_total, opt_total)

    def test_row_mask(self):
        rng = np.random.RandomState(4)
        s = rng.rand(8, 12).astype(np.float32)
        valid = np.array([True] * 5 + [False] * 3)
        cols = np.asarray(assignment.auction_assignment(jnp.asarray(s), jnp.asarray(valid)))
        assert (cols[5:] == -1).all()
        assert len(set(cols[:5].tolist())) == 5

    @pytest.mark.parametrize("seed,t,n,chunk", [
        (0, 200, 300, 32),   # sparse scattered valid
        (1, 200, 300, 64),   # chunk not dividing t
        (2, 96, 96, 32),     # square, dense valid (identity compaction)
        (3, 150, 150, 32),   # near-tie degenerate values (bidding wars)
    ])
    def test_chunk_gated_matches_dense(self, seed, t, n, chunk):
        """row_chunk compaction + chunk-gated bidding is BIT-EXACT vs the
        dense path: stable compaction preserves valid rows' relative order,
        so the largest-row-index tie-break picks the same physical row."""
        rng = np.random.RandomState(seed)
        if seed == 3:
            # degenerate: few distinct values → long bidding wars, ties
            s = rng.randint(0, 4, (t, n)).astype(np.float32) / 4.0
        else:
            s = rng.rand(t, n).astype(np.float32)
        valid = rng.rand(t) < (0.25 if seed != 2 else 1.1)
        dense = np.asarray(assignment.auction_assignment(
            jnp.asarray(s), jnp.asarray(valid)))
        chunked = np.asarray(assignment.auction_assignment(
            jnp.asarray(s), jnp.asarray(valid), row_chunk=chunk))
        np.testing.assert_array_equal(chunked, dense)

    @pytest.mark.parametrize("seed,t,n,chunk,phases", [
        (0, 200, 300, None, 1),   # dense path
        (1, 200, 300, 64, 1),     # chunk-gated path
        (3, 150, 150, 32, 1),     # near-tie degenerate values (long wars)
        (5, 120, 120, None, 5),   # ε-scaled square (negative-prior config)
    ])
    def test_small_bidder_path_matches_reference_rounds(
            self, seed, t, n, chunk, phases):
        """The small-bidder gather path + round unrolling are BIT-EXACT vs
        the plain one-round-per-iteration dense/chunked auction: gathered
        rows see identical float values (same argmax ties), non-bidders'
        j_best is never consumed, and post-convergence unrolled rounds are
        identity steps."""
        rng = np.random.RandomState(seed)
        if seed == 3:
            s = rng.randint(0, 4, (t, n)).astype(np.float32) / 4.0
        else:
            s = rng.rand(t, n).astype(np.float32)
        valid = rng.rand(t) < (0.3 if t != n else 1.1)
        ref = np.asarray(assignment.auction_assignment(
            jnp.asarray(s), jnp.asarray(valid), n_phases=phases,
            row_chunk=chunk, small_k=None, unroll=1))
        fast = np.asarray(assignment.auction_assignment(
            jnp.asarray(s), jnp.asarray(valid), n_phases=phases,
            row_chunk=chunk, small_k=16, unroll=4))
        np.testing.assert_array_equal(fast, ref)

    @pytest.mark.parametrize("seed,t,n,phases", [
        (0, 200, 300, 1),    # rectangular, sparse valid
        (2, 96, 96, 1),      # square, dense valid
        (3, 150, 150, 1),    # near-tie degenerate values (long wars)
        (5, 120, 120, 5),    # ε-scaled (negative-prior config)
        (6, 3, 700, 1),      # tall-N: multiple column tiles, tiny T
    ])
    def test_pallas_kernel_matches_xla(self, seed, t, n, phases):
        """The whole-loop Pallas auction kernel (interpret mode on CPU) is
        BIT-EXACT vs the XLA while_loop path: identical float expressions,
        argmax-first ties via min-of-iota-at-max, column-winner ties toward
        the largest row index via max-of-row-iota."""
        rng = np.random.RandomState(seed)
        if seed == 3:
            s = rng.randint(0, 4, (t, n)).astype(np.float32) / 4.0
        else:
            s = rng.rand(t, n).astype(np.float32)
        valid = rng.rand(t) < (0.3 if t != n else 1.1)
        if not valid.any():
            valid[0] = True
        xla = np.asarray(assignment.auction_assignment(
            jnp.asarray(s), jnp.asarray(valid), n_phases=phases,
            use_kernel=False))
        kern = np.asarray(assignment.auction_assignment(
            jnp.asarray(s), jnp.asarray(valid), n_phases=phases,
            use_kernel=True))
        np.testing.assert_array_equal(kern, xla)

    def test_kernel_vmem_grant_and_fallback(self):
        """The Pallas kernel's scoped-VMEM grant covers the production
        geometries (matching 1369², negative priors ~1376x1536 — the
        latter OOMed Mosaic's default 16 MB cap on hardware), and
        auction_assignment silently falls back to the XLA path for
        instances beyond the 100 MB cap."""
        # production shapes fit, with the grant sized above 16 MB
        assert assignment._kernel_fits(1369, 1369)
        assert assignment._kernel_fits(1376, 1536)
        assert assignment._kernel_vmem_bytes(1376, 1536) > (16 << 20)
        # a matrix whose 2.5x resident footprint exceeds 100 MB must not
        assert not assignment._kernel_fits(5000, 8192)
        # and the public entry point still returns a valid assignment
        # (use_kernel=True is overridden by the fits guard; tiny T keeps
        # the XLA fallback fast)
        rng = np.random.RandomState(0)
        s = rng.rand(4, 8192).astype(np.float32)
        pad = np.zeros((4996, 8192), np.float32)
        s = np.concatenate([s, pad], 0)
        valid = np.zeros((5000,), bool)
        valid[:4] = True
        col = np.asarray(assignment.auction_assignment(
            jnp.asarray(s), jnp.asarray(valid), use_kernel=True))
        assert (col[:4] >= 0).all() and (col[4:] == -1).all()
        assert len(np.unique(col[:4])) == 4

    def test_chunk_gated_composes_with_phases(self):
        """row_chunk under Bertsekas ε-scaling (n_phases>1) stays bit-exact
        vs the dense multi-phase path."""
        rng = np.random.RandomState(7)
        s = rng.rand(160, 200).astype(np.float32)
        valid = rng.rand(160) < 0.3
        dense = np.asarray(assignment.auction_assignment(
            jnp.asarray(s), jnp.asarray(valid), n_phases=3))
        chunked = np.asarray(assignment.auction_assignment(
            jnp.asarray(s), jnp.asarray(valid), n_phases=3, row_chunk=64))
        np.testing.assert_array_equal(chunked, dense)


class TestNms:
    def test_matches_greedy_oracle(self):
        rng = np.random.RandomState(0)
        n = 40
        xy = rng.rand(n, 2) * 80
        wh = rng.rand(n, 2) * 30 + 5
        boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)

        def oracle(boxes, scores, thr):
            idxs = np.argsort(-scores)
            keep = []
            for i in idxs:
                ok = True
                for j in keep:
                    xx1 = max(boxes[i, 0], boxes[j, 0]); yy1 = max(boxes[i, 1], boxes[j, 1])
                    xx2 = min(boxes[i, 2], boxes[j, 2]); yy2 = min(boxes[i, 3], boxes[j, 3])
                    inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
                    a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
                    b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
                    if inter / (a + b - inter) > thr:
                        ok = False
                        break
                if ok:
                    keep.append(i)
            m = np.zeros(n, bool)
            m[keep] = True
            return m

        for thr in (0.3, 0.5, 0.7):
            got = np.asarray(
                nms.nms_keep(jnp.asarray(boxes), jnp.asarray(scores),
                             jnp.ones(n, bool), thr)
            )
            np.testing.assert_array_equal(got, oracle(boxes, scores, thr))

    def test_padding_rows_ignored(self):
        boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]], jnp.float32)
        scores = jnp.asarray([0.9, 0.8, 0.1])
        valid = jnp.asarray([True, False, True])
        keep = np.asarray(nms.nms_keep(boxes, scores, valid, 0.5))
        np.testing.assert_array_equal(keep, [True, False, True])


class TestKmeans:
    def test_clusters_blobs(self):
        rng = np.random.RandomState(0)
        blobs = np.concatenate([
            rng.randn(30, 2) + [0, 0],
            rng.randn(30, 2) + [20, 0],
            rng.randn(30, 2) + [0, 20],
        ]).astype(np.float32)
        centers, assign = kmeans.kmeans_pp(
            jax.random.PRNGKey(0), jnp.asarray(blobs), jnp.ones(90, bool), 3
        )
        centers = np.asarray(centers)
        # every true blob center has a kmeans center nearby
        for target in ([0, 0], [20, 0], [0, 20]):
            assert np.min(np.linalg.norm(centers - target, axis=1)) < 2.0
        # no empty clusters
        assert len(np.unique(np.asarray(assign))) == 3

    def test_masked_points(self):
        pts = np.concatenate([np.zeros((10, 2)), np.full((10, 2), 100.0)]).astype(np.float32)
        valid = np.array([True] * 10 + [False] * 10)
        centers, assign = kmeans.kmeans_pp(
            jax.random.PRNGKey(1), jnp.asarray(pts), jnp.asarray(valid), 2
        )
        assert np.all(np.abs(np.asarray(centers)) < 50)  # never uses masked pts


class TestEmdChunkSkip:
    def test_col_valid_matches_dense(self):
        from mars_tpu.ops import emd

        k = jax.random.PRNGKey(0)
        cost = jax.random.uniform(k, (64, 64))
        row_mask = jax.random.uniform(jax.random.PRNGKey(1), (64,)) < 0.4
        cols = jax.random.uniform(jax.random.PRNGKey(2), (32, 64)) < 0.3
        dense = emd.batched_emd(cost, row_mask, cols, 32, 32)
        # prefix validity: second chunk dead with chunk=8
        valid = jnp.arange(32) < 5
        sparse = emd.batched_emd(cost, row_mask, cols, 32, 32,
                                 col_valid=valid, chunk=8)
        np.testing.assert_allclose(np.asarray(sparse)[:5],
                                   np.asarray(dense)[:5], rtol=1e-5)
        assert (np.asarray(sparse)[8:] == 0).all()
        # scattered validity restores order
        valid2 = jnp.asarray([i % 3 == 0 for i in range(32)])
        sparse2 = emd.batched_emd(cost, row_mask, cols, 32, 32,
                                  col_valid=valid2, chunk=8)
        np.testing.assert_allclose(np.asarray(sparse2)[::3],
                                   np.asarray(dense)[::3], rtol=1e-5)


class TestEmdRowLadder:
    def test_row_ladder_matches_full_bucket(self):
        """The static row-bucket ladder (smallest {256, 512, row_bucket}
        slice covering the live rows) must reproduce the full-bucket
        solve: dead compacted rows only contribute exp(NEG)=0 to the
        column logsumexp, so the slice size is a pure work knob."""
        from mars_tpu.ops import emd

        k = jax.random.PRNGKey(7)
        cost = jax.random.uniform(k, (1369, 1369))
        cols = jax.random.uniform(jax.random.PRNGKey(8), (4, 1369)) < 0.1
        for n_rows in (100, 300, 600):  # → ladder levels 256, 512, 1024
            row_mask = jnp.arange(1369) < n_rows
            # row_bucket == live rows: single-level, no ladder (reference
            # result with no dead-row slack beyond the bucket)
            tight = emd.batched_emd(cost, row_mask, cols,
                                    row_bucket=n_rows + 24, col_bucket=256)
            laddered = emd.batched_emd(cost, row_mask, cols,
                                       row_bucket=1024, col_bucket=256)
            np.testing.assert_allclose(np.asarray(laddered),
                                       np.asarray(tight), rtol=1e-5,
                                       err_msg=f"n_rows={n_rows}")


class TestAuctionScaled:
    def test_scaled_square_matches_scipy(self):
        from scipy.optimize import linear_sum_assignment

        from mars_tpu.ops import assignment

        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        a = jax.random.normal(k1, (200, 16))
        a = a / jnp.linalg.norm(a, axis=1, keepdims=True)
        b = jax.random.normal(k2, (200, 16))
        b = b / jnp.linalg.norm(b, axis=1, keepdims=True)
        cost = (1.0 - a @ b.T) / 2.0  # contested near-tie instance
        cols = assignment.auction_assignment(
            cost, jnp.ones(200, bool), n_phases=5)
        cn = np.asarray(cost, np.float64)
        ri, ci = linear_sum_assignment(cn, maximize=True)
        o = np.asarray(cols)
        obj = cn[np.arange(200), o].sum()
        assert (o >= 0).all() and len(set(o.tolist())) == 200
        assert (cn[ri, ci].sum() - obj) / cn[ri, ci].sum() < 1e-4


class TestInt4Matmul:
    """Packed-nibble weight-only matmul (ops.int4_matmul) — the 4-bit VLM
    path (reference TextRetrieverModule.py:468-471 defaults to 4-bit bnb)."""

    def _ref(self, x, packed, scale):
        from mars_tpu.ops.int4_matmul import unpack_int4

        w = np.asarray(unpack_int4(packed), np.float32) * np.asarray(scale)
        return np.asarray(x, np.float32) @ w

    @pytest.mark.parametrize("shape", [(1, 512, 256), (3, 256, 512),
                                       (2, 300, 200)])  # last: padding path
    def test_kernel_matches_dequant(self, shape):
        from mars_tpu.models.quantization import quantize_kernel
        from mars_tpu.ops.int4_matmul import matmul_int4

        b, din, dout = shape
        rng = np.random.RandomState(0)
        w = jnp.asarray(rng.randn(din, dout).astype(np.float32))
        q = quantize_kernel(w, bits=4)
        x = jnp.asarray(rng.randn(b, din).astype(np.float32))
        got = matmul_int4(x, q["q4"], q["scale"], interpret=True)
        want = self._ref(x, q["q4"], q["scale"])
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-3,
                                   rtol=1e-3)

    def test_kernel_bf16(self):
        from mars_tpu.models.quantization import quantize_kernel
        from mars_tpu.ops.int4_matmul import matmul_int4

        rng = np.random.RandomState(1)
        w = jnp.asarray(rng.randn(256, 256).astype(np.float32))
        q = quantize_kernel(w, bits=4)
        x = jnp.asarray(rng.randn(2, 256).astype(np.float32)).astype(jnp.bfloat16)
        got = matmul_int4(x, q["q4"], q["scale"], interpret=True)
        assert got.dtype == jnp.bfloat16
        want = self._ref(x.astype(jnp.float32), q["q4"], q["scale"])
        np.testing.assert_allclose(
            np.asarray(got.astype(jnp.float32)), want, atol=0.15, rtol=2e-2)

    @pytest.mark.parametrize("shape", [(1, 512, 256), (3, 256, 512),
                                       (2, 320, 200)])  # last: padding path
    def test_nf4_kernel_matches_dequant(self, shape):
        """Pallas NF4 matmul == dequantize_nf4 dense reference (the kernel
        folds codebook lookup + per-64-block scales in VMEM)."""
        from mars_tpu.models.quantization import (dequantize_nf4,
                                                  quantize_kernel_nf4)
        from mars_tpu.ops.int4_matmul import matmul_nf4

        b, din, dout = shape
        rng = np.random.RandomState(5)
        w = jnp.asarray((rng.randn(din, dout) *
                         rng.gamma(1.0, 1.0, (1, dout))).astype(np.float32))
        q = quantize_kernel_nf4(w)
        x = jnp.asarray(rng.randn(b, din).astype(np.float32))
        got = matmul_nf4(x, q["nf4"], q["bscale"], interpret=True)
        want = np.asarray(x, np.float32) @ np.asarray(dequantize_nf4(q))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-3,
                                   rtol=1e-3)

    def test_nf4_kernel_bf16(self):
        from mars_tpu.models.quantization import (dequantize_nf4,
                                                  quantize_kernel_nf4)
        from mars_tpu.ops.int4_matmul import matmul_nf4

        rng = np.random.RandomState(6)
        w = jnp.asarray(rng.randn(256, 256).astype(np.float32))
        q = quantize_kernel_nf4(w)
        x = jnp.asarray(rng.randn(2, 256).astype(np.float32)).astype(jnp.bfloat16)
        got = matmul_nf4(x, q["nf4"], q["bscale"], interpret=True)
        assert got.dtype == jnp.bfloat16
        want = (np.asarray(x.astype(jnp.float32), np.float32)
                @ np.asarray(dequantize_nf4(q)))
        np.testing.assert_allclose(
            np.asarray(got.astype(jnp.float32)), want, atol=0.15, rtol=2e-2)

    def test_quantize_dequantize_roundtrip(self):
        from mars_tpu.models.quantization import (dequantize_kernel,
                                                  quantize_kernel)

        rng = np.random.RandomState(2)
        w = rng.randn(128, 64).astype(np.float32)
        back = np.asarray(dequantize_kernel(quantize_kernel(jnp.asarray(w), 4)))
        # 4-bit: |err| <= scale/2 = absmax/14 per column
        bound = np.abs(w).max(axis=0) / 14.0 + 1e-6
        assert (np.abs(back - w) <= bound[None, :]).all()

    def test_quantized_dense_q4_fallback(self):
        """dense() consumes the packed leaf transparently (CPU fallback)."""
        from mars_tpu.models import layers as L
        from mars_tpu.models.quantization import quantize_kernel

        rng = np.random.RandomState(3)
        w = jnp.asarray(rng.randn(256, 128).astype(np.float32))
        b = jnp.asarray(rng.randn(128).astype(np.float32))
        x = jnp.asarray(rng.randn(4, 7, 256).astype(np.float32))
        p = {"kernel": quantize_kernel(w, 4), "bias": b}
        got = L.dense(p, x)
        want = self._ref(x.reshape(-1, 256), p["kernel"]["q4"],
                         p["kernel"]["scale"]).reshape(4, 7, 128) + np.asarray(b)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=1e-3)


class TestDeformableAttention:
    """msda_core vs the transformers MultiScaleDeformableAttention torch
    fallback (grid_sample bilinear, zeros padding, align_corners=False)."""

    def test_core_matches_transformers(self):
        import torch
        from transformers.models.deformable_detr.modeling_deformable_detr \
            import MultiScaleDeformableAttention as TorchMSDA

        from mars_tpu.ops import deformable_attention as da

        rng = np.random.RandomState(0)
        b, nh, d, p = 2, 2, 8, 3
        shapes = [(6, 8), (3, 4), (2, 2)]
        l = sum(h * w for h, w in shapes)
        q = 5
        value = rng.randn(b, l, nh, d).astype(np.float32)
        # sampling locations straddle the borders to exercise zero padding
        locs = rng.uniform(-0.1, 1.1,
                           (b, q, nh, len(shapes), p, 2)).astype(np.float32)
        wts = rng.rand(b, q, nh, len(shapes), p).astype(np.float32)
        wts /= wts.sum(axis=(-2, -1), keepdims=True)

        got = da.msda_core(jnp.asarray(value), shapes, jnp.asarray(locs),
                           jnp.asarray(wts))

        torch_msda = TorchMSDA()
        shapes_t = torch.tensor(shapes, dtype=torch.long)
        starts = torch.cat([shapes_t.new_zeros(1),
                            (shapes_t[:, 0] * shapes_t[:, 1]).cumsum(0)[:-1]])
        want = torch_msda(
            torch.from_numpy(value), shapes_t, shapes, starts,
            torch.from_numpy(locs), torch.from_numpy(wts), im2col_step=64,
        ).numpy()
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5,
                                   rtol=1e-4)

    def test_layer_shapes_and_softmax(self):
        from mars_tpu.ops import deformable_attention as da

        key = jax.random.PRNGKey(0)
        c, nh, npnt = 16, 2, 4
        shapes = [(4, 4), (2, 2)]
        p = da.init_msda_params(key, c, nh, len(shapes), npnt)
        q = jax.random.normal(key, (1, 5, c))
        v = jax.random.normal(key, (1, 20, c))
        ref = jax.random.uniform(key, (1, 5, len(shapes), 2))
        out = da.msda_layer(p, q, ref, v, shapes, nh, npnt)
        assert out.shape == (1, 5, c)
        assert np.isfinite(np.asarray(out)).all()
        # box-format reference points
        ref4 = jnp.concatenate([ref, jnp.full((1, 5, len(shapes), 2), 0.3)],
                               axis=-1)
        out4 = da.msda_layer(p, q, ref4, v, shapes, nh, npnt)
        assert out4.shape == (1, 5, c)
