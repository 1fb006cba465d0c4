"""Decompose the f32 build_system slowdown: sub-stage timing f64 vs f32.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/f32_diag2.py
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
    print(f"  {label:36s} {ts[len(ts) // 2] * 1e3:10.2f} ms")
    return out


def run(dtype, rk, delta):
    from cuda_bundle_adjustment_tpu.graph import GraphOptimisationOptions
    from cuda_bundle_adjustment_tpu.io.arrays import optimizer_from_problem
    from cuda_bundle_adjustment_tpu.io.synthetic import kitti00_scale_problem
    from cuda_bundle_adjustment_tpu.models.ba import MonoModel, expand_pose_state
    from cuda_bundle_adjustment_tpu.solver import block_solver as bs
    from cuda_bundle_adjustment_tpu.solver.segments import reduce_rows_f64_packed

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
    graph, packed = solver.graph, solver.packed
    data = packed[0]
    meta = metas[0]
    print(f"dtype={graph.q.dtype} rk={meta.rk}")

    exp_f = jax.jit(lambda g: expand_pose_state(g, data))
    timeit("expand_pose_state [12,E]", exp_f, graph)

    terms_f = jax.jit(
        lambda g: MonoModel.terms(g, data, meta.rk, meta.delta)
    )
    stacks = timeit("MonoModel.terms (resid+jac+stacks)", terms_f, graph)

    comb_f = jax.jit(
        lambda s: jnp.concatenate(list(s), axis=1)
    )
    combined = timeit("concat [E,72]", comb_f, stacks)

    presum_f = jax.jit(lambda c: bs._pose_chunk_presum(c, plan)[:, :42])
    pre = timeit("_pose_chunk_presum", presum_f, combined)

    red_f = jax.jit(lambda p: reduce_rows_f64_packed(p, plan.pose_plan))
    timeit("pose reduce_rows", red_f, pre)

    slot_f = jax.jit(lambda c: bs._lm_slot_sum(c[:, 42:54], plan, La))
    timeit("_lm_slot_sum", slot_f, combined)

    full_f = jax.jit(
        lambda g, p, pl: bs.build_system(g, p, metas, Pa, La, pl)
    )
    timeit("build_system (whole)", full_f, graph, packed, plan)


def main():
    print("== f64 rk=0 ==")
    run("float64", 0, 1.0)
    print("== f32 rk=3 (huber bench config) ==")
    run("float32", 3, 10.0)
    print("== f32 rk=0 (isolate huber) ==")
    run("float32", 0, 1.0)


if __name__ == "__main__":
    main()
