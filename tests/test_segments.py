"""Bucketed scatter-free segment reductions vs jax.ops.segment_sum."""

import jax.numpy as jnp
import numpy as np
from jax.ops import segment_sum

from cuda_bundle_adjustment_tpu.solver.segments import (
    build_bucket_plan,
    reduce_pair_products,
    reduce_rows,
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
