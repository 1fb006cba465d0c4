"""Capture a device xplane trace of the fused LM loop and print the op table.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/trace_fused.py [config] [outdir]
Then:  python tools/parse_xplane.py <outdir>
"""

from __future__ import annotations

import sys
import time

import jax
import numpy as np


def main() -> int:
    config = sys.argv[1] if len(sys.argv) > 1 else "kitti00_mono"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/xtrace"

    sys.path.insert(0, "/root/repo")
    from bench import make_problem
    from cuda_bundle_adjustment_tpu.io.arrays import optimizer_from_problem

    problem, kwargs = make_problem(config)
    opt = optimizer_from_problem(problem, **kwargs)
    opt.optimize(10)  # compile + warm
    jax.block_until_ready(opt.solver.graph.q)
    _ = opt.batch_statistics().get()[-1].chi2

    opt = optimizer_from_problem(problem, **kwargs)
    jax.profiler.start_trace(outdir)
    t0 = time.perf_counter()
    opt.optimize(10)
    jax.block_until_ready(opt.solver.graph.q)
    _ = opt.batch_statistics().get()[-1].chi2
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"traced optimize(10) [{config}]: {dt:.3f} s -> {outdir}")

    from tools.parse_xplane import device_op_table, device_planes, load_space

    planes = load_space(outdir)
    for p in planes:
        n = sum(len(ev) for _, ev in p.lines)
        print(f"plane {p.name!r}: {len(p.lines)} lines, {n} events")
    table = device_op_table(planes)
    rows = sorted(table.items(), key=lambda kv: -kv[1][1])
    print("top 45 device ops by total time:")
    for name, (cnt, ps) in rows[:45]:
        print(f"  {ps / 1e9:10.3f} ms  x{cnt:<6d} {name[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
