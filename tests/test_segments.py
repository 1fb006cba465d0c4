"""Bucketed scatter-free segment reductions vs jax.ops.segment_sum."""

import jax.numpy as jnp
import numpy as np
from jax.ops import segment_sum

from cuda_bundle_adjustment_tpu.solver.segments import (
    build_bucket_plan,
    reduce_pair_products,
    reduce_rows,
    reduce_rows_f64_packed,
    reduce_rows_ff,
)


def test_reduce_rows_matches_segment_sum():
    rng = np.random.default_rng(0)
    N, M, K = 5000, 37, 7
    ids = rng.integers(0, M, N)
    X = rng.standard_normal((N, K))
    plan = build_bucket_plan(ids, M)
    got = np.asarray(reduce_rows(jnp.asarray(X), plan))
    want = np.asarray(segment_sum(jnp.asarray(X), jnp.asarray(ids), num_segments=M))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_reduce_rows_drops_out_of_range_ids():
    rng = np.random.default_rng(1)
    N, M, K = 200, 11, 3
    ids = rng.integers(0, M + 5, N)  # some ids >= M must be dropped
    X = rng.standard_normal((N, K))
    plan = build_bucket_plan(ids, M)
    got = np.asarray(reduce_rows(jnp.asarray(X), plan))
    want = np.zeros((M, K))
    for i, s in enumerate(ids):
        if s < M:
            want[s] += X[i]
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_reduce_rows_two_level_wide_segments():
    rng = np.random.default_rng(2)
    N, M, K = 3000, 4, 5
    ids = np.concatenate([np.zeros(2500, np.int64), rng.integers(1, M, 500)])
    X = rng.standard_normal((N, K))
    plan = build_bucket_plan(ids, M, max_bucket=256)
    assert plan.second is not None
    got = np.asarray(reduce_rows(jnp.asarray(X), plan))
    want = np.asarray(segment_sum(jnp.asarray(X), jnp.asarray(ids), num_segments=M))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_reduce_rows_empty_segments_and_empty_input():
    plan = build_bucket_plan(np.zeros(0, np.int64), 5)
    got = np.asarray(reduce_rows(jnp.zeros((0, 4)), plan))
    np.testing.assert_array_equal(got, np.zeros((5, 4)))


def test_reduce_pair_products_matches_dense():
    rng = np.random.default_rng(3)
    E, M, T = 300, 9, 1200
    A = rng.standard_normal((E, 18))
    B = rng.standard_normal((E, 18))
    ei = rng.integers(0, E, T)
    ej = rng.integers(0, E, T)
    k = np.sort(rng.integers(0, M, T))
    plan = build_bucket_plan(k, M, payloads=(ei, ej), sentinel=E)
    got = np.asarray(reduce_pair_products(jnp.asarray(A), jnp.asarray(B), plan))
    want = np.zeros((M, 36))
    for t in range(T):
        want[k[t]] += (
            A[ei[t]].reshape(6, 3) @ B[ej[t]].reshape(6, 3).T
        ).reshape(36)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def _adversarial_rows(rng, N, K):
    """Adversarial rows from the FLOAT-FLOAT representable domain (exact sums
    ``hi + lo`` of two f32 with ``|lo| <= 2**-26 |hi|``): magnitudes across
    ~22 decades, heavy cancellation pairs, exact-f32 rows (lo == 0), zeros,
    sign flips and sub-f32-ulp noise around 1.0.

    The domain matters: on TPU every f64 IS such a pair (CLAUDE.md), so the
    split in ``reduce_rows_f64_packed`` is exact and bit-identity vs the
    unpacked reduction is a real invariant.  A true-IEEE f64 (this CPU test
    host) carries 53 mantissa bits, 5 more than the pair holds — for those
    the split truncates at ~2**-48 relative and bit-identity is impossible,
    so the test feeds values where it is."""
    hi = np.float32(
        rng.standard_normal((N, K)) * np.exp(rng.uniform(-25, 25, (N, 1)))
    )
    lo = np.float32(
        np.clip(rng.standard_normal((N, K)), -3, 3) * (2.0**-28) * np.abs(hi)
    )  # |lo| <= 3*2**-28 |hi| < ulp32/8: the re-split recovers (hi, lo) exactly
    X = hi.astype(np.float64) + lo.astype(np.float64)
    X[::7] = np.float32(X[::7])  # exactly representable rows: lo half == 0
    X[1::7] *= -1.0
    X[2::7] = 0.0
    a, b = X[3::11], X[4::11]
    n = min(a.shape[0], b.shape[0])
    a[:n, : K // 2] = -b[:n, : K // 2]  # exact cancellation inside segments
    X[5::13] = 1.0 + np.float32(
        rng.standard_normal((X[5::13].shape[0], K))
    ).astype(np.float64) * 2.0**-30
    return X


def test_reduce_rows_ff_bit_identical_to_unpacked():
    """The packed float-float gather path (reduce_rows_f64_packed /
    reduce_rows_ff) claims BIT-identical results to reduce_rows on the same
    plan: hi + lo recombination is exact (disjoint mantissas) and the bucket
    summation order is the plan's either way.  Adversarial magnitudes and
    cancellations must not break that (VERDICT r2: a regression in the
    packing would otherwise only surface as a wrong trace on hardware)."""
    rng = np.random.default_rng(42)
    N, M, K = 4096, 61, 12
    ids = rng.integers(0, M + 3, N)  # include out-of-range drops
    X = _adversarial_rows(rng, N, K)
    plan = build_bucket_plan(ids, M)

    want = np.asarray(reduce_rows(jnp.asarray(X), plan))
    got = np.asarray(reduce_rows_f64_packed(jnp.asarray(X), plan))
    assert got.dtype == want.dtype == np.float64
    np.testing.assert_array_equal(got, want)  # BITWISE

    # the pre-packed entry point (kernel outputs arrive as [N, 2K] f32)
    hi = X.astype(np.float32)
    lo = (X - hi.astype(np.float64)).astype(np.float32)
    got2 = np.asarray(
        reduce_rows_ff(jnp.asarray(np.concatenate([hi, lo], axis=1)), plan,
                       jnp.float64)
    )
    np.testing.assert_array_equal(got2, want)


def test_reduce_rows_ff_two_level_bit_identical():
    rng = np.random.default_rng(43)
    N, M, K = 3000, 4, 6
    ids = np.concatenate([np.zeros(2500, np.int64), rng.integers(1, M, 500)])
    X = _adversarial_rows(rng, N, K)
    plan = build_bucket_plan(ids, M, max_bucket=256)
    assert plan.second is not None
    want = np.asarray(reduce_rows(jnp.asarray(X), plan))
    got = np.asarray(reduce_rows_f64_packed(jnp.asarray(X), plan))
    np.testing.assert_array_equal(got, want)
