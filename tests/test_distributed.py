"""Distributed Schur reduction on a virtual 8-device CPU mesh vs single-chip."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from cuda_bundle_adjustment_tpu.io.arrays import optimizer_from_problem
from cuda_bundle_adjustment_tpu.io.synthetic import make_ba_problem
from cuda_bundle_adjustment_tpu.parallel.distributed import (
    distributed_optimize,
    make_distributed_lm_step,
    shard_problem,
)


@pytest.fixture(scope="module")
def mesh():
    devices = np.array(jax.devices()[:8])
    return Mesh(devices, ("d",))


def test_sharded_step_matches_single_chip(mesh):
    problem = make_ba_problem(
        num_poses=10, num_landmarks=64, mean_obs_per_landmark=4.0, kind="mono", seed=31
    )
    sp = shard_problem(problem, mesh.devices.size)
    step = make_distributed_lm_step(mesh, sp)

    # note: mono BA with one fixed pose has a scale gauge freedom, so the
    # system is only PD thanks to damping — use a robust lambda
    lam = 0.1
    q2, t2, Xw2, chi0, chi1, scale, success = step(sp.pose_q, sp.pose_t, sp.Xw, lam)
    assert bool(success)

    # single-chip reference
    opt = optimizer_from_problem(problem)
    solver = opt.solver
    solver.build_structure()
    chi_ref, sys = solver.head()
    new_graph, Fhat_ref, scale_ref, succ_ref = solver.trial(sys, lam)

    np.testing.assert_allclose(float(chi0), float(chi_ref), rtol=1e-10)
    np.testing.assert_allclose(float(chi1), float(Fhat_ref), rtol=1e-8)
    np.testing.assert_allclose(float(scale), float(scale_ref), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(q2), np.asarray(new_graph.q), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(t2), np.asarray(new_graph.t), atol=1e-9
    )

    # sharded landmarks: unshuffle and compare
    D = sp.num_shards
    Ls = sp.lms_per_shard
    Xw_got = np.asarray(Xw2).reshape(D, Ls, 3)
    L = problem.landmarks.shape[0]
    lm_shard = np.arange(L) % D
    lm_local = np.arange(L) // D
    # single-chip landmarks come back in group-layout order; un-permute
    solver.accept(new_graph)
    np.testing.assert_allclose(
        Xw_got[lm_shard, lm_local], solver.result_landmarks()[:L], atol=1e-9
    )


def test_distributed_lm_loop_matches_single_chip(mesh):
    problem = make_ba_problem(
        num_poses=8, num_landmarks=48, mean_obs_per_landmark=4.0, kind="mono", seed=37
    )
    sp = shard_problem(problem, mesh.devices.size)
    trace_dist, _ = distributed_optimize(mesh, sp, 4)

    opt = optimizer_from_problem(problem)
    opt.optimize(4)
    trace_single = [s.chi2 for s in opt.batch_statistics().get()]

    assert len(trace_dist) == len(trace_single)
    np.testing.assert_allclose(trace_dist, trace_single, rtol=1e-7)


def test_shard_counts(mesh):
    problem = make_ba_problem(
        num_poses=6, num_landmarks=20, mean_obs_per_landmark=3.0, kind="mono", seed=41
    )
    sp = shard_problem(problem, 4)
    # all real edges preserved
    assert int(np.asarray(sp.active).sum()) == problem.meas.shape[0]
    # every landmark appears exactly once across shards
    assert sp.num_shards * sp.lms_per_shard >= problem.landmarks.shape[0]
