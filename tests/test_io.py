"""Graph-file IO round trips (OpenCV FileStorage JSON format)."""

import numpy as np

from cuda_bundle_adjustment_tpu.io import opencv_json
from cuda_bundle_adjustment_tpu.io.arrays import optimizer_from_problem
from cuda_bundle_adjustment_tpu.io.synthetic import make_ba_problem


def test_problem_roundtrip(tmp_path):
    problem = make_ba_problem(num_poses=6, num_landmarks=25, kind="mono", seed=43)
    path = str(tmp_path / "graph.json")
    opencv_json.write_graph(path, problem=problem)
    back = opencv_json.read_problem(path)

    assert back.kind == "mono"
    assert back.num_active_poses == problem.num_active_poses
    np.testing.assert_allclose(back.pose_q, problem.pose_q)
    np.testing.assert_allclose(back.pose_t, problem.pose_t)
    np.testing.assert_allclose(back.landmarks, problem.landmarks)
    np.testing.assert_allclose(back.meas, problem.meas)
    np.testing.assert_array_equal(back.pose_idx, problem.pose_idx)
    np.testing.assert_array_equal(back.lm_idx, problem.lm_idx)


def test_object_graph_load_and_optimize(tmp_path):
    import cuda_bundle_adjustment_tpu as tba

    problem = make_ba_problem(num_poses=6, num_landmarks=30, kind="stereo", seed=47)
    path = str(tmp_path / "graph.json")
    opencv_json.write_graph(path, problem=problem)

    poses, landmarks, edge_sets, camera = opencv_json.read_graph(path)
    assert len(poses) == 6
    assert len(edge_sets) == 1
    for es in edge_sets:
        es.set_information(0.0)  # information packed per edge below

    opt = tba.TpuGraphOptimisation.create(
        tba.GraphOptimisationOptions(per_edge_information=True)
    )
    opt.add_vertex_set(poses)
    opt.add_vertex_set(landmarks)
    for es in edge_sets:
        opt.add_edge_set(es)
    opt.initialize()
    opt.optimize(3)
    trace_obj = [s.chi2 for s in opt.batch_statistics().get()]

    opt2 = optimizer_from_problem(opencv_json.read_problem(path))
    opt2.optimize(3)
    trace_arr = [s.chi2 for s in opt2.batch_statistics().get()]
    np.testing.assert_allclose(trace_obj, trace_arr, rtol=1e-9)


# Expected 10-iteration chi2 trace of tests/data/mini_mixed_graph.json, from
# the dense f64 oracle (utils/dense_reference.DenseLM) — regenerate with
# ``python tools/make_golden_fixture.py`` if the fixture ever changes.
GOLDEN_MIXED_TRACE = [
    1797.1091985976145,
    1230.5173422653224,
    1194.830797312648,
    1172.7164165427946,
    1150.446571696927,
    1131.7173476567623,
    1112.5951707431036,
    1092.1643143753622,
    1076.0163186443292,
    1067.623531588372,
]


def test_golden_mixed_fixture_trace():
    """Golden-file lock on the FULL file-to-trace pipeline for the
    reference's real input shape (both edge lists, main.cpp:80-198):
    read_problem -> mono+stereo merge -> group layout -> fused LM loop must
    reproduce the committed oracle trace.  rtol 1e-6 is the established
    solver-vs-oracle parity bar (tests/test_lm.py); the committed values are
    plain f64 so the fixture also guards against accidental re-generation."""
    import os

    path = os.path.join(os.path.dirname(__file__), "data", "mini_mixed_graph.json")
    problem = opencv_json.read_problem(path)
    assert hasattr(problem, "specs") and len(problem.specs) == 2

    opt = optimizer_from_problem(problem)
    # the mixed pair must land on the merged masked-stereo fast path
    assert len(opt.solver.packed) == 1
    assert opt.solver.packed[0].mask3 is not None
    opt.optimize(10)
    got = [s.chi2 for s in opt.batch_statistics().get()]
    assert len(got) == len(GOLDEN_MIXED_TRACE)
    np.testing.assert_allclose(got, GOLDEN_MIXED_TRACE, rtol=1e-6)


def test_golden_mixed_fixture_matches_live_oracle():
    """The committed trace itself stays reproducible by the oracle (guards
    against silent fixture edits and oracle drift at once)."""
    import os

    from reference_impl import DenseLM

    path = os.path.join(os.path.dirname(__file__), "data", "mini_mixed_graph.json")
    problem = opencv_json.read_problem(path)
    want = DenseLM(problem).optimize(10)
    np.testing.assert_allclose(want, GOLDEN_MIXED_TRACE, rtol=1e-12)
