import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mars_tpu.core import imaging, masks
from mars_tpu.core.episode import pad_proposals


class TestAdaptivePool:
    def test_divisible_max_matches_torch(self):
        import torch
        import torch.nn.functional as F

        x = np.random.RandomState(0).rand(2, 28, 28).astype(np.float32)
        got = imaging.adaptive_max_pool(jnp.asarray(x), 7, 7)
        want = F.adaptive_max_pool2d(torch.from_numpy(x), (7, 7)).numpy()
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)

    def test_general_max_matches_torch(self):
        import torch
        import torch.nn.functional as F

        x = np.random.RandomState(1).rand(3, 30, 41).astype(np.float32)
        got = imaging._adaptive_pool_general(jnp.asarray(x), 7, 9, jnp.max)
        want = F.adaptive_max_pool2d(torch.from_numpy(x), (7, 9)).numpy()
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)

    def test_general_avg_matches_torch(self):
        import torch
        import torch.nn.functional as F

        x = np.random.RandomState(2).rand(30, 41).astype(np.float32)
        got = imaging._adaptive_pool_general(jnp.asarray(x), 7, 9, jnp.mean)
        want = F.adaptive_avg_pool2d(torch.from_numpy(x)[None], (7, 9))[0].numpy()
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)

    def test_mask_pool_518_to_37(self):
        m = np.zeros((518, 518), np.float32)
        m[100:150, 200:260] = 1.0
        g = imaging.pool_mask_to_grid(jnp.asarray(m), 37)
        assert g.shape == (37, 37)
        # cell (100//14=7 .. 149//14=10, 200//14=14 .. 259//14=18) must be 1
        assert np.asarray(g)[7:11, 14:19].min() == 1.0
        assert np.asarray(g).sum() == 4 * 5


class TestMinMax:
    def test_min_max_scale(self):
        x = jnp.asarray([1.0, 3.0, 5.0])
        y = np.asarray(imaging.min_max_scale(x))
        np.testing.assert_allclose(y, [0.0, 0.5, 1.0], atol=1e-6)

    def test_masked_min_max(self):
        x = jnp.asarray([10.0, 1.0, 3.0, 5.0])
        valid = jnp.asarray([False, True, True, True])
        y = np.asarray(imaging.masked_min_max_scale(x, valid))
        np.testing.assert_allclose(y, [0.0, 0.0, 0.5, 1.0], atol=1e-6)


class TestBoxes:
    def test_mask_to_box(self):
        m = np.zeros((20, 30), np.float32)
        m[3:7, 10:15] = 1
        box = np.asarray(masks.mask_to_box(jnp.asarray(m)))
        # inclusive edges (reference batched_mask_to_box)
        np.testing.assert_array_equal(box, [10, 3, 14, 6])

    def test_mask_to_box_empty(self):
        m = jnp.zeros((20, 30))
        np.testing.assert_array_equal(np.asarray(masks.mask_to_box(m)), [0, 0, 0, 0])

    def test_mask_to_box_batched(self):
        m = np.zeros((2, 8, 8), np.float32)
        m[0, 1:3, 2:5] = 1
        boxes = np.asarray(masks.mask_to_box(jnp.asarray(m)))
        np.testing.assert_array_equal(boxes[0], [2, 1, 4, 2])
        np.testing.assert_array_equal(boxes[1], [0, 0, 0, 0])

    def test_box_iou_identity(self):
        b = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15]], jnp.float32)
        iou = np.asarray(masks.box_iou(b, b))
        np.testing.assert_allclose(np.diag(iou), [1.0, 1.0], atol=1e-6)
        np.testing.assert_allclose(iou[0, 1], 25.0 / 175.0, atol=1e-6)

    def test_mask_iou(self):
        a = np.zeros((2, 10, 10), np.float32)
        a[0, :5] = 1
        a[1, :, :5] = 1
        iou = np.asarray(masks.mask_iou(jnp.asarray(a), jnp.asarray(a)))
        np.testing.assert_allclose(np.diag(iou), [1.0, 1.0], atol=1e-6)
        np.testing.assert_allclose(iou[0, 1], 25.0 / 75.0, atol=1e-6)


class TestStability:
    def test_stability_score(self):
        logits = jnp.asarray([[[2.0, 0.5], [0.5, -1.0]]])
        # thr 0, offset 1: hi = logits>1 → 1 px; lo = logits>-1 → 3 px
        s = np.asarray(masks.stability_score(logits, 0.0, 1.0))
        np.testing.assert_allclose(s, [1.0 / 3.0], atol=1e-6)


class TestProposals:
    def test_pad(self):
        m = jnp.ones((3, 8, 8))
        p = pad_proposals(m, 5)
        assert p.masks.shape == (5, 8, 8)
        assert np.asarray(p.valid).tolist() == [True] * 3 + [False] * 2

    def test_truncate(self):
        m = jnp.ones((7, 8, 8))
        p = pad_proposals(m, 5)
        assert p.masks.shape == (5, 8, 8)
        assert bool(np.all(np.asarray(p.valid)))


class TestInterpolate2D:
    def test_nearest_matches_torch_33_to_37(self):
        """The production VTA->VVA grid resize (mars/MARS.py:77-82):
        torch nearest floors the source index; jax.image.resize rounds —
        they disagree on 24 of 37 rows at this size."""
        import torch
        import torch.nn.functional as F

        x = np.random.RandomState(2).rand(33, 33).astype(np.float32)
        got = imaging.interpolate_2d(jnp.asarray(x), (37, 37), "nearest")
        want = F.interpolate(
            torch.from_numpy(x)[None, None], (37, 37), mode="nearest"
        )[0, 0].numpy()
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_nearest_matches_torch_downsample(self):
        import torch
        import torch.nn.functional as F

        x = np.random.RandomState(3).rand(2, 37, 41).astype(np.float32)
        got = imaging.interpolate_2d(jnp.asarray(x), (9, 13), "nearest")
        want = F.interpolate(
            torch.from_numpy(x)[None], (9, 13), mode="nearest"
        )[0].numpy()
        np.testing.assert_array_equal(np.asarray(got), want)


class TestPriorScores:
    def test_coverage_and_prior(self):
        g = 4
        prior = jnp.zeros((g, g)).at[:2, :2].set(1.0)
        props = jnp.stack([
            jnp.zeros((g, g)).at[:2, :2].set(1.0),   # perfect overlap
            jnp.zeros((g, g)).at[2:, 2:].set(1.0),   # disjoint
        ])
        s = np.asarray(masks.coverage_and_prior_scores(prior, props, prior, alpha=0.5))
        np.testing.assert_allclose(s[0], 1.0, atol=1e-5)
        np.testing.assert_allclose(s[1], 0.0, atol=1e-5)


def test_eight_virtual_devices():
    assert jax.device_count() == 8
