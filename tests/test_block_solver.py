"""Block-solver stage tests against the dense numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_bundle_adjustment_tpu.io.arrays import optimizer_from_problem
from cuda_bundle_adjustment_tpu.io.synthetic import make_ba_problem
from cuda_bundle_adjustment_tpu.solver import block_solver as bs

from reference_impl import DenseLM


@pytest.fixture(scope="module", params=["mono", "stereo"])
def small_problem(request):
    return make_ba_problem(
        num_poses=12, num_landmarks=60, mean_obs_per_landmark=5.0,
        kind=request.param, seed=3,
    )


def _solver_for(problem, rk=0, delta=1.0):
    opt = optimizer_from_problem(problem, rk=rk, delta=delta)
    solver = opt.solver
    solver.build_structure()
    return solver


def test_chi_matches_dense(small_problem):
    solver = _solver_for(small_problem)
    chi, _ = solver.head()
    ref = DenseLM(small_problem)
    np.testing.assert_allclose(float(chi), ref.compute_chi(), rtol=1e-12)


def test_system_blocks_match_dense(small_problem):
    solver = _solver_for(small_problem)
    _, sys = solver.head()
    ref = DenseLM(small_problem)
    H, b = ref.build_dense_system()
    Pa, La = solver.Pa, solver.La

    Hpp = np.asarray(sys.Hpp)
    bp = np.asarray(sys.bp)
    for p in range(Pa):
        sp = slice(6 * p, 6 * p + 6)
        np.testing.assert_allclose(Hpp[p], H[sp, sp], rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(bp[p], b[sp], rtol=1e-9, atol=1e-9)

    # the group layout (solver/groups.py) renumbers free landmarks and
    # reorders edge rows; map original ids through it (identity without it)
    lay = solver.group_layout
    La_real = solver.La_real
    lm_row = (
        lay.lm_renumber if lay is not None else np.arange(La_real)
    )
    edge_src = (
        lay.edge_perm
        if lay is not None
        else np.arange(len(small_problem.pose_idx))
    )

    Hll = np.asarray(sys.Hll).reshape(La, 3, 3)
    bl = np.asarray(sys.bl)
    for l in range(La_real):
        sl = slice(6 * Pa + 3 * l, 6 * Pa + 3 * l + 3)
        np.testing.assert_allclose(Hll[lm_row[l]], H[sl, sl], rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(bl[lm_row[l]], b[sl], rtol=1e-9, atol=1e-9)

    # Hpl blocks: every both-free edge block must match the dense cross block;
    # accumulate per (pose, lm) because multiple edges can share a pair
    Hpl = np.asarray(sys.Hpl).reshape(-1, 6, 3)
    acc = {}
    for row, e in enumerate(edge_src):
        if e < 0:
            continue
        iP, iL = int(small_problem.pose_idx[e]), int(small_problem.lm_idx[e])
        if iP < Pa and iL < La_real:
            acc.setdefault((iP, iL), np.zeros((6, 3)))
            acc[(iP, iL)] += Hpl[row]
    for (iP, iL), blk in acc.items():
        sp = slice(6 * iP, 6 * iP + 6)
        sl = slice(6 * Pa + 3 * iL, 6 * Pa + 3 * iL + 3)
        np.testing.assert_allclose(blk, H[sp, sl], rtol=1e-9, atol=1e-9)


def test_max_diagonal_matches_dense(small_problem):
    solver = _solver_for(small_problem)
    _, sys = solver.head()
    ref = DenseLM(small_problem)
    H, _ = ref.build_dense_system()
    assert abs(solver.max_diagonal(sys) - np.max(np.diag(H))) < 1e-9 * np.max(np.diag(H))


def test_schur_solve_matches_dense_full_solve(small_problem):
    """The Schur-eliminated solution must equal the full dense damped solve."""
    solver = _solver_for(small_problem)
    _, sys = solver.head()
    lam = 1e-4 * solver.max_diagonal(sys)

    new_graph, Fhat, scale, success = solver.trial(sys, lam)
    assert bool(success)

    ref = DenseLM(small_problem)
    H, b = ref.build_dense_system()
    x = np.linalg.solve(H + lam * np.eye(H.shape[0]), b)

    # reproduce the update on the oracle and compare chi + scale
    ref.apply_update(x)
    Fhat_ref = ref.compute_chi()
    scale_ref = float(x @ (lam * x + b))
    np.testing.assert_allclose(float(Fhat), Fhat_ref, rtol=1e-9)
    np.testing.assert_allclose(float(scale), scale_ref, rtol=1e-9)

    # state parity (landmarks mapped through the group-layout renumbering)
    Pa, La = solver.Pa, solver.La_real
    lay = solver.group_layout
    lm_row = lay.lm_renumber if lay is not None else np.arange(La)
    np.testing.assert_allclose(np.asarray(new_graph.q)[:Pa], ref.q[:Pa], atol=1e-10)
    np.testing.assert_allclose(np.asarray(new_graph.t)[:Pa], ref.t[:Pa], atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(new_graph.Xw)[lm_row], ref.Xw[:La], atol=1e-9
    )
    # fixed poses untouched
    np.testing.assert_array_equal(
        np.asarray(new_graph.q)[Pa:], np.asarray(solver.graph.q)[Pa:]
    )


def test_robust_kernel_system_matches_dense():
    problem = make_ba_problem(
        num_poses=10, num_landmarks=40, mean_obs_per_landmark=4.0, kind="mono",
        seed=11, noise_px=4.0,
    )
    for rk, delta in [(1, 3.0), (2, 2.0), (3, 1.5)]:
        solver = _solver_for(problem, rk=rk, delta=delta)
        chi, sys = solver.head()
        ref = DenseLM(problem, rk=rk, delta=delta)
        np.testing.assert_allclose(float(chi), ref.compute_chi(), rtol=1e-11)
        H, b = ref.build_dense_system()
        Hpp = np.asarray(sys.Hpp)
        for p in range(solver.Pa):
            sp = slice(6 * p, 6 * p + 6)
            np.testing.assert_allclose(Hpp[p], H[sp, sp], rtol=1e-8, atol=1e-9)


def test_build_system_chi_matches_separate(small_problem):
    """build_system_chi must equal (build_system, compute_chi) exactly-ish:
    one shared residual pass vs two separate ones (fusion candidate API)."""
    solver = _solver_for(small_problem)
    chi_ref, sys_ref = solver.head()
    sys2, chi2 = bs.build_system_chi(
        solver.graph, solver.packed, solver.metas, solver.Pa, solver.La,
        solver.plan,
    )
    np.testing.assert_allclose(float(chi2), float(chi_ref), rtol=1e-12)
    for a, b in zip(jax.tree_util.tree_leaves(sys2),
                    jax.tree_util.tree_leaves(sys_ref)):
        b = np.asarray(b)
        # different compiled programs reassociate under
        # --xla_allow_excess_precision: compare to the term magnitudes
        np.testing.assert_allclose(
            np.asarray(a), b, atol=1e-11 * max(np.abs(b).max(), 1.0)
        )
