"""End-to-end LM optimisation: convergence and trace parity with the oracle."""

import numpy as np
import pytest

from cuda_bundle_adjustment_tpu.io.arrays import optimizer_from_problem
from cuda_bundle_adjustment_tpu.io.synthetic import make_ba_problem

from reference_impl import DenseLM


@pytest.mark.parametrize("kind", ["mono", "stereo"])
def test_chi_trace_matches_dense_oracle(kind):
    problem = make_ba_problem(
        num_poses=10, num_landmarks=50, mean_obs_per_landmark=4.0, kind=kind, seed=5
    )
    opt = optimizer_from_problem(problem)
    opt.optimize(5)
    got = [s.chi2 for s in opt.batch_statistics().get()]

    ref = DenseLM(problem)
    want = ref.optimize(5)

    assert len(got) == len(want)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # final states agree
    Pa, La = opt.solver.Pa, opt.solver.La_real
    np.testing.assert_allclose(np.asarray(opt.solver.graph.q)[:Pa], ref.q[:Pa], atol=1e-7)
    np.testing.assert_allclose(np.asarray(opt.solver.graph.t)[:Pa], ref.t[:Pa], atol=1e-6)
    np.testing.assert_allclose(opt.solver.result_landmarks()[:La], ref.Xw[:La], atol=1e-6)


def test_chi_decreases_monotonically():
    problem = make_ba_problem(
        num_poses=30, num_landmarks=300, mean_obs_per_landmark=5.0, kind="mono",
        seed=7, noise_px=0.5,
    )
    opt = optimizer_from_problem(problem)
    opt.optimize(8)
    trace = [s.chi2 for s in opt.batch_statistics().get()]
    assert len(trace) >= 2
    assert all(b <= a + 1e-9 for a, b in zip(trace, trace[1:]))


def test_robust_kernel_trace_matches_oracle():
    problem = make_ba_problem(
        num_poses=10, num_landmarks=60, mean_obs_per_landmark=4.0, kind="mono",
        seed=9, noise_px=3.0,
    )
    for rk, delta in [(2, 2.0), (3, 2.5)]:
        opt = optimizer_from_problem(problem, rk=rk, delta=delta)
        opt.optimize(4)
        got = [s.chi2 for s in opt.batch_statistics().get()]
        ref = DenseLM(problem, rk=rk, delta=delta)
        want = ref.optimize(4)
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_float32_mode_runs():
    from cuda_bundle_adjustment_tpu.graph import GraphOptimisationOptions

    problem = make_ba_problem(
        num_poses=8, num_landmarks=40, mean_obs_per_landmark=4.0, kind="mono", seed=1
    )
    opts = GraphOptimisationOptions(dtype="float32")
    opt = optimizer_from_problem(problem, options=opts)
    opt.optimize(3)
    trace = [s.chi2 for s in opt.batch_statistics().get()]
    assert np.all(np.isfinite(trace))
    assert trace[-1] <= trace[0]
