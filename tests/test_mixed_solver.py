"""Mixed-precision (f32 Cholesky + f64 iterative refinement) solve accuracy."""

import jax.numpy as jnp
import numpy as np

from cuda_bundle_adjustment_tpu.io.arrays import optimizer_from_problem
from cuda_bundle_adjustment_tpu.io.synthetic import make_ba_problem
from cuda_bundle_adjustment_tpu.solver.block_solver import _cho_solve_dense


def test_refined_solve_matches_f64_direct():
    rng = np.random.default_rng(61)
    n = 300
    A0 = rng.normal(size=(n, n)) / np.sqrt(n)
    A = jnp.asarray(A0 @ A0.T + 0.5 * np.eye(n))
    b = jnp.asarray(rng.normal(size=n))

    x64, ok64 = _cho_solve_dense(A, b, mixed=False)
    xmx, okmx = _cho_solve_dense(A, b, mixed=True)
    assert bool(ok64) and bool(okmx)
    rel = float(jnp.linalg.norm(xmx - x64) / jnp.linalg.norm(x64))
    assert rel < 1e-12


def test_refined_solve_ill_conditioned():
    """cond ~ 1e8 with a flat diagonal (Jacobi scaling can't help): the mixed
    solver must either converge or honestly report failure so LM re-damps."""
    rng = np.random.default_rng(63)
    n = 200
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    d = np.logspace(0, 8, n)
    A = jnp.asarray(Q @ np.diag(d) @ Q.T)
    b = jnp.asarray(rng.normal(size=n))
    x64, _ = _cho_solve_dense(A, b, mixed=False)
    xmx, ok = _cho_solve_dense(A, b, mixed=True)
    rel = float(jnp.linalg.norm(xmx - x64) / jnp.linalg.norm(x64))
    assert (not bool(ok)) or rel < 1e-7


def test_refined_solve_spread_diagonal():
    """cond ~ 1e8 carried by the diagonal (the realistic BA case): Jacobi
    scaling makes the f32 factorization succeed and IR recovers f64 accuracy."""
    rng = np.random.default_rng(67)
    n = 200
    A0 = rng.normal(size=(n, n)) / np.sqrt(n)
    A0 = A0 @ A0.T + np.eye(n)
    d = np.logspace(0, 8, n)
    S = np.diag(np.sqrt(d))
    A = jnp.asarray(S @ A0 @ S)  # diagonal spans 8 orders of magnitude
    b = jnp.asarray(rng.normal(size=n))
    x64, _ = _cho_solve_dense(A, b, mixed=False)
    xmx, ok = _cho_solve_dense(A, b, mixed=True)
    assert bool(ok)
    rel = float(jnp.linalg.norm(xmx - x64) / jnp.linalg.norm(x64))
    assert rel < 1e-10


def test_mixed_lm_trace_close_to_exact():
    problem = make_ba_problem(
        num_poses=10, num_landmarks=60, mean_obs_per_landmark=4.0, kind="mono", seed=65
    )
    from cuda_bundle_adjustment_tpu.graph import GraphOptimisationOptions

    opt_exact = optimizer_from_problem(
        problem, options=GraphOptimisationOptions(solver_precision="exact")
    )
    opt_exact.optimize(6)
    t_exact = [s.chi2 for s in opt_exact.batch_statistics().get()]

    opt_mixed = optimizer_from_problem(
        problem, options=GraphOptimisationOptions(solver_precision="mixed")
    )
    opt_mixed.optimize(6)
    t_mixed = [s.chi2 for s in opt_mixed.batch_statistics().get()]

    assert len(t_exact) == len(t_mixed)
    np.testing.assert_allclose(t_mixed, t_exact, rtol=1e-7)
