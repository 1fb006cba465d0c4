"""Test the fusion-pathology hypothesis: optimization_barrier on the [E,72]
combined stack should stop XLA recomputing the f32 model into every consumer.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/f32_diag3.py
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


def build_system_barrier(graph, packed, metas, Pa, La, plan):
    """_build_system_impl fast path with a barrier on the combined stack."""
    from cuda_bundle_adjustment_tpu.solver.block_solver import (
        MODEL_REGISTRY, _lm_slot_sum, _pose_chunk_presum,
    )
    from cuda_bundle_adjustment_tpu.solver.segments import reduce_rows_f64_packed
    from cuda_bundle_adjustment_tpu.types import SystemBlocks

    stacks = []
    for data, meta in zip(packed, metas):
        model = MODEL_REGISTRY[meta.kind]
        pose_stack, lm_stack, hpl = model.terms(graph, data, meta.rk, meta.delta)
        stacks.append(jnp.concatenate([pose_stack, lm_stack, hpl], axis=1))
    combined = jax.lax.optimization_barrier(jnp.concatenate(stacks, axis=0))
    pose_acc = reduce_rows_f64_packed(
        _pose_chunk_presum(combined, plan)[:, :42], plan.pose_plan
    )
    lm_acc = _lm_slot_sum(combined[:, 42:54], plan, La)
    Hpl = combined[:, 54:]
    return SystemBlocks(
        Hpp=pose_acc[:, :36].reshape(Pa, 6, 6), bp=pose_acc[:, 36:],
        Hll=lm_acc[:, :9], bl=lm_acc[:, 9:], Hpl=Hpl,
    )


def run(dtype):
    from cuda_bundle_adjustment_tpu.graph import GraphOptimisationOptions
    from cuda_bundle_adjustment_tpu.io.arrays import optimizer_from_problem
    from cuda_bundle_adjustment_tpu.io.synthetic import kitti00_scale_problem
    from cuda_bundle_adjustment_tpu.solver import block_solver as bs

    problem = kitti00_scale_problem(kind="mono", seed=0)
    kwargs = {}
    if dtype == "float32":
        kwargs = dict(options=GraphOptimisationOptions(dtype="float32"))
    opt = optimizer_from_problem(problem, **kwargs)
    solver = opt.solver
    solver.build_structure()
    metas, Pa, La = solver.metas, solver.Pa, solver.La
    plan = solver.plan
    graph, packed = solver.graph, solver.packed
    print(f"dtype={graph.q.dtype}")

    cur_f = jax.jit(lambda g, p, pl: bs.build_system(g, p, metas, Pa, La, pl))
    a = timeit("build_system CURRENT", cur_f, graph, packed, plan)

    bar_f = jax.jit(
        lambda g, p, pl: build_system_barrier(g, p, metas, Pa, La, pl)
    )
    b = timeit("build_system BARRIER", bar_f, graph, packed, plan)

    for name in ("Hpp", "bp", "Hll", "bl", "Hpl"):
        x, y = getattr(a, name), getattr(b, name)
        if x is None:
            continue
        d = float(jnp.max(jnp.abs(x - y)))
        m = float(jnp.max(jnp.abs(x))) or 1.0
        print(f"    {name}: max|diff| rel {d / m:.2e}")


def main():
    print("== f32 ==")
    run("float32")
    print("== f64 ==")
    run("float64")


if __name__ == "__main__":
    main()
