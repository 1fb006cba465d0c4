"""Time ONLY the fused optimize(niters) dispatch (median of 5 + min), for
fast iteration on per-iteration costs.  Run:
PYTHONPATH=/root/repo:/root/.axon_site python tools/loop_bench.py [config] [niters]
"""

from __future__ import annotations

import sys
import time

import jax


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--hot"]
    config = args[0] if args else "kitti00_mono"
    niters = int(args[1]) if len(args) > 1 else 10

    sys.path.insert(0, "/root/repo")
    from bench import make_problem
    from cuda_bundle_adjustment_tpu.io.arrays import optimizer_from_problem

    problem, kwargs = make_problem(config)
    opt = optimizer_from_problem(problem, **kwargs)
    opt.optimize(niters)
    jax.block_until_ready(opt.solver.graph.q)
    chi_warm = opt.batch_statistics().get()[-1].chi2

    hot = "--hot" in sys.argv
    ts = []
    for _ in range(5):
        if hot:
            # pure fused-dispatch timing: SAME solver, no re-upload, no
            # build_structure (the graph state advances per repeat — only
            # the timing matters here)
            opt2 = opt
        else:
            opt2 = optimizer_from_problem(problem, **kwargs)
        t0 = time.perf_counter()
        opt2.optimize(niters)
        jax.block_until_ready(opt2.solver.graph.q)
        chi = opt2.batch_statistics().get()[-1].chi2
        ts.append(time.perf_counter() - t0)
    ts.sort()
    if not hot:
        assert abs(chi - chi_warm) <= 1e-6 * abs(chi_warm)
    print(
        f"{config} optimize({niters}){' HOT' if hot else ''}: "
        f"median {ts[2] * 1e3:.1f} ms, "
        f"min {ts[0] * 1e3:.1f} ms, all {[round(t * 1e3) for t in ts]}; "
        f"final chi2 {chi:.6e}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
