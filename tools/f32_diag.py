"""Per-stage f64 vs f32 timing on TPU (the huber_f32 diagnosis tool).

Round-2 found build_system in f32 ~2.6x SLOWER than f64 at kitti00 scale
(XLA recomputed the f32 model into every consumer; fixed since, and round-5
routes f32 through the fused terms kernel).  Kept as the standing dtype
A/B-stage tool; the one-off follow-ups (f32_diag2/3) are folded into git
history.  Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/f32_diag.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(label, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(jnp.ravel(leaf)[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(jnp.ravel(leaf)[0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"  {label:32s} {ts[len(ts) // 2] * 1e3:10.2f} ms")
    return out


def run(dtype, rk, delta):
    from cuda_bundle_adjustment_tpu.graph import GraphOptimisationOptions
    from cuda_bundle_adjustment_tpu.io.arrays import optimizer_from_problem
    from cuda_bundle_adjustment_tpu.io.synthetic import kitti00_scale_problem
    from cuda_bundle_adjustment_tpu.solver import block_solver as bs

    problem = kitti00_scale_problem(kind="mono", seed=0)
    kwargs = {}
    if dtype == "float32":
        kwargs = dict(options=GraphOptimisationOptions(dtype="float32"),
                      rk=rk, delta=delta)
    opt = optimizer_from_problem(problem, **kwargs)
    solver = opt.solver
    solver.build_structure()
    metas, Pa, La = solver.metas, solver.Pa, solver.La
    plan = solver.plan
    nnz = solver.schur.nnz_blocks
    graph, packed = solver.graph, solver.packed
    print(f"dtype={graph.q.dtype} rk={metas[0].rk} mixed_solve={solver.mixed}")

    null_f = jax.jit(lambda g: g.q * 1.0)
    timeit("null dispatch", null_f, graph)

    chi_f = jax.jit(lambda g, p: bs.compute_chi(g, p, metas))
    timeit("compute_chi", chi_f, graph, packed)

    sys_f = jax.jit(lambda g, p, pl: bs.build_system(g, p, metas, Pa, La, pl))
    sys = timeit("build_system", sys_f, graph, packed, plan)

    lam = jnp.asarray(1e-5, graph.q.dtype)
    solve_f = jax.jit(
        lambda s, l, pl: bs.solve_schur(s, l, pl, Pa, La, nnz, mixed=solver.mixed)
    )
    xp, xl, ok = timeit("solve_schur", solve_f, sys, lam, plan)

    upd_f = jax.jit(lambda g, xp, xl: bs.apply_update(g, xp, xl, Pa, La))
    timeit("apply_update", upd_f, graph, xp, xl)


def main():
    print("== f64 (rk=0) ==")
    run("float64", 0, 1.0)
    print("== f32 (rk=3 huber, the bench config) ==")
    run("float32", 3, 10.0)


if __name__ == "__main__":
    main()
