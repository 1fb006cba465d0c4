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
