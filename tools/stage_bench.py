"""Per-stage TPU timing at ba_kitti_00 scale.

Times each jitted LM pipeline stage in isolation (median of 5 after a
pipeline-forcing warm-up) so optimisation effort goes where the time is —
the TPU analogue of the reference's ProfileItem stage table
(/root/reference/src/block_solver.h:27-39).

NOTE on methodology: behind the axon RPC tunnel, ``block_until_ready`` only
reports completion once the pipeline has actually been forced by a data
fetch; every timer below therefore fetches one scalar after its warm-up.
Run:  python tools/stage_bench.py
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
    _ = np.asarray(jnp.ravel(leaf)[0])  # force pipeline
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{label:34s} {ts[len(ts) // 2] * 1e3:10.2f} ms")
    return out


def main():
    from cuda_bundle_adjustment_tpu.io.arrays import optimizer_from_problem
    from cuda_bundle_adjustment_tpu.io.synthetic import kitti00_scale_problem
    from cuda_bundle_adjustment_tpu.solver import block_solver as bs

    problem = kitti00_scale_problem(kind="mono", seed=0)
    opt = optimizer_from_problem(problem)
    solver = opt.solver
    t0 = time.perf_counter()
    solver.build_structure()
    print(f"{'build_structure (host symbolic)':34s} "
          f"{(time.perf_counter() - t0) * 1e3:10.2f} ms")

    metas, Pa, La = solver.metas, solver.Pa, solver.La
    plan = solver.plan
    nnz = solver.schur.nnz_blocks
    graph, packed = solver.graph, solver.packed
    dtype = graph.q.dtype
    print(f"P={Pa} L={La} E={sum(m.nedges for m in metas)} nnz_blocks={nnz} "
          f"T={solver.schur.nmul_blocks} dtype={dtype}")

    chi_f = jax.jit(lambda g, p: bs.compute_chi(g, p, metas))
    timeit("compute_chi", chi_f, graph, packed)

    sys_f = jax.jit(lambda g, p, pl: bs.build_system(g, p, metas, Pa, La, pl))
    sys = timeit("build_system (planned)", sys_f, graph, packed, plan)

    lam = jnp.asarray(1e-5, dtype)

    solve_f = jax.jit(
        lambda s, l, pl: bs.solve_schur(s, l, pl, Pa, La, nnz, mixed=solver.mixed)
    )
    xp, xl, ok = timeit("solve_schur (full trial solve)", solve_f, sys, lam, plan)

    upd_f = jax.jit(lambda g, xp, xl: bs.apply_update(g, xp, xl, Pa, La))
    timeit("apply_update (SE3 exp)", upd_f, graph, xp, xl)

    trial_f = jax.jit(
        lambda g, s, l, pl: bs._jit_trial.__wrapped__(
            g, s, l, packed, pl, metas, Pa, La, nnz, True, solver.mixed
        )
    )
    timeit("full LM trial (solve+update+chi)", trial_f, graph, sys, lam, plan)


if __name__ == "__main__":
    main()
