"""Generate the committed golden mixed-input fixture + its expected trace.

Writes ``tests/data/mini_mixed_graph.json`` (a miniature OpenCV-JSON BA graph
carrying BOTH a monocular and a stereo edge list, the reference's real input
shape, /root/reference/samples/sample_ba_from_file/main.cpp:121-165) and
prints the dense f64 oracle's 10-iteration chi2 trace to paste into
``tests/test_io.py::test_golden_mixed_fixture_trace``.

Run ONCE on CPU and commit both outputs; the test replays the file through
``read_problem -> optimizer_from_problem -> optimize(10)`` and asserts the
committed trace, locking the whole file-to-trace pipeline.

Usage: python tools/make_golden_fixture.py
"""

from __future__ import annotations

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    from cuda_bundle_adjustment_tpu.io.opencv_json import read_problem, write_graph
    from cuda_bundle_adjustment_tpu.io.synthetic import make_mixed_ba_problem
    from cuda_bundle_adjustment_tpu.utils.dense_reference import DenseLM

    p = make_mixed_ba_problem(
        num_poses=14,
        num_landmarks=160,
        mean_obs_per_landmark=4.0,
        stereo_fraction=0.5,
        seed=123,
    )
    out = os.path.join(REPO, "tests", "data", "mini_mixed_graph.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    write_graph(out, problem=p)

    rp = read_problem(out)
    assert hasattr(rp, "specs") and len(rp.specs) == 2, "fixture must be mixed"
    ref = DenseLM(rp)
    trace = ref.optimize(10)
    print(f"wrote {out}")
    print("expected 10-iteration chi2 trace (dense f64 oracle):")
    print("EXPECTED_TRACE = [")
    for v in trace:
        print(f"    {v!r},")
    print("]")


if __name__ == "__main__":
    main()
