"""Native C++ solver tests: exact EMD, exact assignment, RLE codec."""
import numpy as np
import pytest

from mars_tpu import native
from mars_tpu.ops import emd as emd_ops


class TestEmdExact:
    @pytest.mark.parametrize("seed,t,c", [(0, 8, 5), (1, 12, 12), (2, 5, 20), (3, 30, 17)])
    def test_matches_lp(self, seed, t, c):
        rng = np.random.RandomState(seed)
        cost = rng.rand(t, c)
        got = native.emd_exact(cost)
        want = emd_ops.exact_emd_lp(cost.astype(np.float32))
        assert abs(got - want) < 1e-6, (got, want)

    def test_large_instance_runs(self):
        rng = np.random.RandomState(4)
        cost = rng.rand(200, 120)
        got = native.emd_exact(cost)
        assert 0 <= got <= 1

    def test_validates_device_sinkhorn(self):
        import jax.numpy as jnp

        rng = np.random.RandomState(5)
        cost = (rng.rand(60, 40) * 0.5).astype(np.float32)
        exact = native.emd_exact(cost)
        approx = float(
            emd_ops.batched_emd(
                jnp.asarray(cost), jnp.ones(60, bool), jnp.ones((1, 40), bool),
                row_bucket=64, col_bucket=64,
            )[0]
        )
        assert abs(approx - exact) < 5e-3


class TestAssignmentExact:
    @pytest.mark.parametrize("seed,t,n", [(0, 10, 10), (1, 15, 40), (2, 60, 80)])
    def test_matches_scipy(self, seed, t, n):
        from scipy.optimize import linear_sum_assignment

        rng = np.random.RandomState(seed)
        s = rng.rand(t, n)
        cols = native.assignment_exact(s)
        assert len(set(cols.tolist())) == t
        ri, ci = linear_sum_assignment(s, maximize=True)
        np.testing.assert_allclose(
            s[np.arange(t), cols].sum(), s[ri, ci].sum(), rtol=1e-12
        )


class TestRle:
    def test_roundtrip(self):
        rng = np.random.RandomState(0)
        mask = (rng.rand(37, 53) > 0.6).astype(np.uint8)
        rle = native.rle_encode(mask)
        back = native.rle_decode(rle)
        np.testing.assert_array_equal(back, mask)
        assert sum(rle["counts"]) == 37 * 53

    def test_column_major_semantics(self):
        # first run counts zeros in column-major order
        mask = np.zeros((4, 3), np.uint8)
        mask[0, 1] = 1  # flat col-major index 4
        rle = native.rle_encode(mask)
        assert rle["counts"][0] == 4
        assert rle["counts"][1] == 1

    def test_empty_and_full(self):
        z = np.zeros((5, 5), np.uint8)
        assert native.rle_encode(z)["counts"] == [25]
        f = np.ones((5, 5), np.uint8)
        assert native.rle_encode(f)["counts"] == [0, 25]


def _pyco_counts_to_string(counts):
    """Independent pure-Python rendering of the pycocotools compressed-RLE
    string format (COCO mask API: 2-back difference coding from the 4th
    count on, little-endian base-32 signed varints, chars offset by 48) —
    written from the format spec, structured differently from the C++
    (recursive chunking over an explicit list), so the pair agreeing is
    two independent readings of the spec, not one implementation twice."""
    out = bytearray()
    for i, cnt in enumerate(counts):
        x = int(cnt) - (int(counts[i - 2]) if i > 2 else 0)
        chunks = []
        while True:
            chunks.append(x & 0x1F)
            x >>= 5  # python's >> on ints is arithmetic
            if (chunks[-1] & 0x10 and x == -1) or (
                    not chunks[-1] & 0x10 and x == 0):
                break
        for c in chunks[:-1]:
            out.append((c | 0x20) + 48)
        out.append(chunks[-1] + 48)
    return bytes(out)


class TestRleCompressed:
    """pycocotools-interchange compressed strings (mask.encode format).
    pycocotools itself is not in this image; correctness rests on two
    independent spec implementations agreeing + exact round-trips."""

    def test_matches_independent_python_encoder(self):
        rng = np.random.RandomState(3)
        for h, w in ((7, 9), (37, 53), (64, 64)):
            mask = (rng.rand(h, w) > 0.7).astype(np.uint8)
            rle = native.rle_encode(mask)
            got = native.rle_compress(rle)["counts"]
            assert got == _pyco_counts_to_string(rle["counts"])

    def test_roundtrip_and_decode_dispatch(self):
        rng = np.random.RandomState(4)
        mask = (rng.rand(41, 29) > 0.55).astype(np.uint8)
        comp = native.rle_encode_compressed(mask)
        assert isinstance(comp["counts"], bytes)
        np.testing.assert_array_equal(native.rle_decode(comp), mask)
        np.testing.assert_array_equal(
            native.rle_decode_compressed(comp), mask)
        # str counts (e.g. from json round trips) decode identically
        comp_s = {"size": comp["size"],
                  "counts": comp["counts"].decode("ascii")}
        np.testing.assert_array_equal(native.rle_decode(comp_s), mask)

    def test_negative_deltas_and_long_runs(self):
        # descending counts force negative deltas (sign-extension path);
        # a 2^20 run forces multi-chunk varints
        counts = [0, 3, 1048576, 2, 5, 1, 700000, 1]
        s = native._counts_to_string(np.asarray(counts, np.uint32))
        assert s == _pyco_counts_to_string(counts)
        back = native._string_to_counts(s)
        np.testing.assert_array_equal(back, counts)

    def test_leading_zero_and_single_count(self):
        for counts in ([25], [0, 25], [0, 1, 0, 1, 0, 23]):
            s = native._counts_to_string(np.asarray(counts, np.uint32))
            np.testing.assert_array_equal(
                native._string_to_counts(s), counts)
            assert s == _pyco_counts_to_string(counts)


def test_rle_decode_matches_lvis_python_decoder():
    """Two uncompressed-RLE decoders exist (data/lvis.py:rle_to_mask for
    dataset masks, native.rle_decode for the codec) — pin them
    bit-identical so a fix to one cannot silently diverge the other."""
    import numpy as np

    from mars_tpu import native
    from mars_tpu.data.lvis import rle_to_mask

    rng = np.random.RandomState(5)
    for h, w in ((7, 9), (16, 16), (33, 21)):
        mask = (rng.rand(h, w) > 0.6).astype(np.uint8)
        rle = native.rle_encode(mask)
        np.testing.assert_array_equal(native.rle_decode(rle),
                                      rle_to_mask(rle))


def test_emd_exact_degenerate_and_guards():
    import numpy as np
    import pytest

    from mars_tpu import native

    assert native.emd_exact(np.zeros((0, 5))) == 0.0
    assert native.emd_exact(np.zeros((5, 0))) == 0.0
    with pytest.raises(ValueError):
        native.assignment_exact(np.zeros((5, 3)))  # tall: t > n
