"""Regenerate tests/data/pcg_1000pose_oracle.json: the dense f64 oracle
(utils/dense_reference.DenseLM, the g2o stand-in) trace on the 1000-pose
loop-closure graph used by tests/test_pcg.py::
test_pcg_path_matches_dense_oracle_1000_poses.

The oracle factors a 9.6k-dim dense system per trial (~6 min total), which is
why the trace is stored rather than recomputed in CI.  Run after any change
to io/synthetic.py's generators or utils/dense_reference.py:

    PYTHONPATH=/root/repo python tools/make_pcg_golden.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

PARAMS = dict(
    num_poses=1000, num_landmarks=1200, mean_obs_per_landmark=4.0,
    long_range_fraction=0.3, seed=31,
)
NITER = 6
CG_MAXITER = 600  # the value the parity test runs the live PCG path with


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from reference_impl import DenseLM

    from cuda_bundle_adjustment_tpu.io.synthetic import (
        make_loop_closure_problem,
    )

    p = make_loop_closure_problem(**PARAMS)
    trace = [float(x) for x in DenseLM(p).optimize(NITER)]
    out = os.path.join(
        os.path.dirname(__file__), "..", "tests", "data",
        "pcg_1000pose_oracle.json",
    )
    with open(out, "w") as f:
        json.dump(
            {**PARAMS, "niterations": NITER, "cg_maxiter": CG_MAXITER,
             "oracle_trace": trace},
            f, indent=1,
        )
    print(f"wrote {os.path.abspath(out)}: {trace}")


if __name__ == "__main__":
    main()
