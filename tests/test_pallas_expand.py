"""Pallas windowed one-hot expand vs XLA gather (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_bundle_adjustment_tpu.pallas.onehot import build_expand_plan, expand


@pytest.mark.parametrize("M,K,E", [(50, 7, 300), (1321, 7, 5000)])
def test_expand_small_table_exact(M, K, E):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((M, K)))
    idx = rng.integers(0, M, E)
    plan = build_expand_plan(idx, M, chunk=1024)
    out = expand(table, plan, interpret=True)
    want = np.asarray(table)[idx].T  # [K, E]
    np.testing.assert_array_equal(np.asarray(out), want)


def test_expand_sentinel_rows_are_zero():
    rng = np.random.default_rng(1)
    M, K, E = 40, 3, 200
    table = jnp.asarray(rng.standard_normal((M, K)))
    idx = rng.integers(0, M + 1, E)  # some == M (sentinel)
    plan = build_expand_plan(idx, M, chunk=1024)
    out = np.asarray(expand(table, plan, interpret=True))
    want = np.vstack([np.asarray(table), np.zeros((1, K))])[idx].T
    np.testing.assert_array_equal(out, want)


def test_expand_windowed_locality():
    rng = np.random.default_rng(2)
    M, K, E, C = 100_000, 3, 40_960, 1024
    # near-sorted indices: each 512-chunk spans ~1.3k of the 100k table
    idx = np.clip(
        np.sort(rng.integers(0, M, E)) + rng.integers(-50, 50, E), 0, M - 1
    )
    plan = build_expand_plan(idx, M, chunk=C, max_window=8192)
    assert plan is not None and plan.window < M
    table = jnp.asarray(rng.standard_normal((M, K)))
    out = np.asarray(expand(table, plan, interpret=True))
    np.testing.assert_array_equal(out, np.asarray(table)[idx].T)


def test_expand_no_locality_returns_none():
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 1_000_000, 4096)
    assert build_expand_plan(idx, 1_000_000, chunk=1024, max_window=2048) is None


def test_chunk_level_pose_expand_matches_edge_gather(monkeypatch):
    """expand_pose_state with a CHUNK-LEVEL plan (one row per (class, slot,
    chunk), solver chunk_pose) must equal the plain per-edge gather of the
    derived pose indices on every LIVE row (dummy-chunk rows read the Pa
    sentinel -> zeros vs clamped gather; they are masked by active = 0)."""
    import jax.numpy as jnp

    import cuda_bundle_adjustment_tpu.pallas.onehot as oh
    from cuda_bundle_adjustment_tpu.io.arrays import optimizer_from_problem
    from cuda_bundle_adjustment_tpu.io.synthetic import make_ba_problem
    from cuda_bundle_adjustment_tpu.models.ba import (
        _pose_state_table,
        expand_pose_state,
    )

    problem = make_ba_problem(
        num_poses=12, num_landmarks=120, mean_obs_per_landmark=3.0, seed=5
    )
    opt = optimizer_from_problem(problem)
    solver = opt.solver
    lay = solver.group_layout
    assert lay is not None and solver._cp_host is not None
    data = solver.packed[0]

    orig_expand = oh.expand
    monkeypatch.setattr(
        oh, "expand", lambda t, p, interpret=False: orig_expand(t, p, True)
    )
    pxp = oh.build_expand_plan(solver._cp_host, solver.P, chunk=1024)
    data = data._replace(pose_xp=pxp, lm_slot=lay.meta)
    m_chunk = sum(cm.d * cm.nc_pad for cm in lay.meta.classes)
    assert pxp.num_rows == m_chunk  # the chunk-branch detection fires

    qt = expand_pose_state(solver.graph, data)
    sT = _pose_state_table(solver.graph).T
    want = sT[:, jnp.minimum(data.pose_idx, sT.shape[1] - 1)]
    live = np.asarray(data.active) > 0
    np.testing.assert_array_equal(
        np.asarray(qt)[:, live], np.asarray(want)[:, live]
    )
