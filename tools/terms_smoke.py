"""Hardware smoke test of the fused linearisation kernel path.

Runs a mid-size mono and mixed problem twice on the real TPU — terms kernel
ON vs OFF (TBA_DISABLE_TERMS_KERNEL subprocess) is awkward, so both variants
run in-process by flipping the layout flag — and compares the full chi2
traces.  Expected agreement: ~1e-9 relative (double-float kernel vs XLA
float-float emulation: same precision class, different rounding).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/terms_smoke.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

REPO = "/root/repo"
sys.path.insert(0, REPO)


def run(kind: str, n: int = 8):
    import jax

    from cuda_bundle_adjustment_tpu.io.arrays import optimizer_from_problem
    from cuda_bundle_adjustment_tpu.io.synthetic import (
        make_ba_problem,
        make_mixed_ba_problem,
    )

    if kind == "mixed":
        p = make_mixed_ba_problem(
            num_poses=60, num_landmarks=3000, mean_obs_per_landmark=4.2,
            stereo_fraction=0.5, seed=5,
        )
    else:
        p = make_ba_problem(
            num_poses=60, num_landmarks=3000, mean_obs_per_landmark=4.2,
            kind=kind, seed=5,
        )

    traces = {}
    times = {}
    for label, disable in (("kernel", False), ("xla", True)):
        import os

        if disable:
            os.environ["TBA_DISABLE_TERMS_KERNEL"] = "1"
        else:
            os.environ.pop("TBA_DISABLE_TERMS_KERNEL", None)
        opt = optimizer_from_problem(p)
        t0 = time.perf_counter()
        opt.optimize(n)
        jax.block_until_ready(opt.solver.graph.q)
        tr = [s.chi2 for s in opt.batch_statistics().get()]
        times[label] = time.perf_counter() - t0
        traces[label] = np.asarray(tr)
        print(f"  {kind}/{label}: trace[0]={tr[0]:.9e} trace[-1]={tr[-1]:.9e} "
              f"({times[label]:.1f}s incl. compile)")
    rel = np.abs(traces["kernel"] - traces["xla"]) / np.abs(traces["xla"])
    print(f"  {kind}: max trace rel diff {rel.max():.2e}")
    assert rel.max() < 1e-7, f"{kind} trace diverged: {rel.max()}"
    return rel.max()


def main() -> int:
    for kind in ("mono", "stereo", "mixed"):
        run(kind)
    print("TERMS KERNEL SMOKE: OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
