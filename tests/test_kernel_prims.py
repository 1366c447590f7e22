"""Direct unit tests for the megakernel toolbox (ops/fused_upsample.py):
lane-chunked cumsum, counting inverse-CDF, counting merge. These run as
plain jnp functions (the same code executes inside the Pallas kernels)."""
import jax
import jax.numpy as jnp
import numpy as np

from neurecon_tpu.ops.fused_upsample import (_cumsum_lanes, _shift_lanes,
                                             invert_cdf_counting,
                                             merge_sorted_counting)
from neurecon_tpu.ops.sampling import sample_pdf


class TestShiftLanes:
    """_shift_lanes replaces the shift-by-concat idiom (real Mosaic rejects
    lane concats of offset-mismatched slices)."""

    def test_shift_right_same_width(self):
        rng = np.random.RandomState(0)
        for W in (5, 63, 127, 128, 129, 300):
            x = jnp.asarray(rng.rand(4, W).astype(np.float32))
            want = np.concatenate(
                [np.zeros((4, 1), np.float32), np.asarray(x)[:, :-1]], -1)
            np.testing.assert_allclose(np.asarray(_shift_lanes(x)), want,
                                       rtol=1e-6, atol=1e-6)

    def test_prepend_zero_width_plus_one(self):
        rng = np.random.RandomState(1)
        for W in (7, 127, 128, 129, 257):
            x = jnp.asarray(rng.rand(3, W).astype(np.float32))
            got = np.asarray(_shift_lanes(x, out_width=W + 1))
            want = np.concatenate(
                [np.zeros((3, 1), np.float32), np.asarray(x)], -1)
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_shift_left(self):
        rng = np.random.RandomState(2)
        for W in (6, 128, 256, 300):
            x = jnp.asarray(rng.rand(2, W).astype(np.float32))
            got = np.asarray(_shift_lanes(x, shift=-1))
            want = np.concatenate(
                [np.asarray(x)[:, 1:], np.zeros((2, 1), np.float32)], -1)
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


class TestCumsumLanes:
    def test_matches_jnp_across_chunk_boundaries(self):
        rng = np.random.RandomState(0)
        for L in (5, 127, 128, 129, 300, 640):
            x = jnp.asarray(rng.rand(4, L).astype(np.float32))
            np.testing.assert_allclose(
                np.asarray(_cumsum_lanes(x, strict=False)),
                np.asarray(jnp.cumsum(x, -1)), rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(_cumsum_lanes(x, strict=True)),
                np.asarray(jnp.cumsum(x, -1) - x), rtol=1e-5, atol=1e-5)


class TestInvertCdfCounting:
    def test_matches_sample_pdf(self):
        rng = np.random.RandomState(1)
        T, M, n = 8, 64, 16
        bins = jnp.asarray(np.sort(rng.uniform(1, 5, (T, M)), -1)
                           .astype(np.float32))
        w = jnp.asarray((rng.rand(T, M - 1) ** 3).astype(np.float32))
        ref = sample_pdf(None, bins, w, n, det=True)
        w5 = w + 1e-5
        pdf = w5 / jnp.sum(w5, -1, keepdims=True)
        cdf = jnp.concatenate([jnp.zeros_like(pdf[:, :1]),
                               jnp.cumsum(pdf, -1)], -1)
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n), (T, n))
        got = invert_cdf_counting(bins, cdf, u)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestMergeSortedCounting:
    def test_equals_stable_concat_argsort(self):
        rng = np.random.RandomState(2)
        T, B, n = 6, 100, 37  # crosses the 128-lane scatter chunk
        d_a = np.sort(rng.randint(0, 40, (T, B)).astype(np.float32), -1)
        d_b = np.sort(rng.randint(0, 40, (T, n)).astype(np.float32), -1)
        # integer depths guarantee plenty of exact ties across a and b
        v_a = rng.rand(T, B).astype(np.float32)
        v_b = rng.rand(T, n).astype(np.float32)
        dd = np.concatenate([d_a, d_b], -1)
        vv = np.concatenate([v_a, v_b], -1)
        idx = np.argsort(dd, -1, kind="stable")
        ref_d = np.take_along_axis(dd, idx, -1)
        ref_v = np.take_along_axis(vv, idx, -1)
        got_d, got_v = merge_sorted_counting(
            jnp.asarray(d_a), jnp.asarray(d_b),
            extras_a=(jnp.asarray(v_a),), extras_b=(jnp.asarray(v_b),))
        np.testing.assert_array_equal(np.asarray(got_d), ref_d)
        np.testing.assert_array_equal(np.asarray(got_v), ref_v)

    def test_single_chunk_and_no_extras(self):
        d_a = jnp.asarray([[0.0, 1.0, 2.0]])
        d_b = jnp.asarray([[0.5, 1.0]])
        got = merge_sorted_counting(d_a, d_b)
        np.testing.assert_allclose(np.asarray(got),
                                   [[0.0, 0.5, 1.0, 1.0, 2.0]])
