"""Split kitti07's 0.249 s into initialize / build_structure / fused optimize
/ trace fetch, plus dispatch counts — the small config is fixed-latency bound
(VERDICT r2 item 4).  Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/kitti07_diag.py
"""

from __future__ import annotations

import time

import jax
import numpy as np


def main():
    from cuda_bundle_adjustment_tpu.io.arrays import optimizer_from_problem
    from cuda_bundle_adjustment_tpu.io.synthetic import kitti07_scale_problem

    problem = kitti07_scale_problem(kind="mono", seed=0)

    # warm-up (compile everything at the same static shapes)
    opt = optimizer_from_problem(problem)
    opt.optimize(10)
    jax.block_until_ready(opt.solver.graph.q)
    _ = opt.batch_statistics().get()[-1].chi2

    for rep in range(3):
        t0 = time.perf_counter()
        opt = optimizer_from_problem(problem)
        t1 = time.perf_counter()
        opt.optimize(10)
        jax.block_until_ready(opt.solver.graph.q)
        t2 = time.perf_counter()
        _ = opt.batch_statistics().get()[-1].chi2
        t3 = time.perf_counter()
        print(
            f"rep{rep}: initialize {1e3*(t1-t0):7.1f} ms | optimize(10) "
            f"{1e3*(t2-t1):7.1f} ms | trace fetch {1e3*(t3-t2):7.1f} ms | "
            f"total {1e3*(t3-t0):7.1f} ms"
        )

    # decompose initialize: packing vs build_structure vs uploads
    t0 = time.perf_counter()
    opt = optimizer_from_problem(problem)
    t1 = time.perf_counter()
    opt.solver.build_structure()
    t2 = time.perf_counter()
    print(
        f"initialize total {1e3*(t1-t0):7.1f} ms; explicit build_structure "
        f"after: {1e3*(t2-t1):7.1f} ms"
    )

    # how much is ONE null dispatch + fetch?
    import jax.numpy as jnp

    x = jnp.zeros((8,), jnp.float64)
    f = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(f(x))[0]
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(f(x))[0]
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"null dispatch+fetch: {1e3*ts[2]:.1f} ms")


if __name__ == "__main__":
    main()
