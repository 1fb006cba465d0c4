"""Hardware parity artifact: double-float Schur kernel vs the f64 triple path.

The grouped pair-product kernel (pallas/pairprod.py `schur_pair_rows_v2`)
claims f64-equivalent accuracy via double-float (two-float32) arithmetic with
Mosaic-simplification barriers.  Interpret mode cannot validate that claim —
XLA:CPU re-simplifies the two-sum compensation (tests/test_groups.py relaxes
to f32 tolerance there) — so this tool runs BOTH paths for real:

* CPU backend (subprocess): the bucketed f64 triple path
  (`schur_reduce` fallback, `use_kernel=False` — true f64 on CPU).
* TPU backend (this process): the Mosaic-lowered kernel path.

and compares the Schur-complement blocks and bsc vectors key-by-key.  The
block orderings differ between backends (layout keys vs symbolic CSR walk),
so blocks align on their (row, col) keys.  Expected: rel error ~1e-13
(double-float carries ~49 mantissa bits; CLAUDE.md "TPU f64").

Run on the real chip and commit the output:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_parity.py \
        | tee artifacts/TPU_PARITY.log

Also appends a full `samples/sample_comparison_with_cpu.py` run (chi2-trace
parity + RMSE vs the dense f64 oracle, the g2o stand-in).
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_CPU_SNIPPET = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from cuda_bundle_adjustment_tpu.io.arrays import optimizer_from_problem
from cuda_bundle_adjustment_tpu.io.synthetic import make_ba_problem
from cuda_bundle_adjustment_tpu.solver import block_solver as bs

problem = make_ba_problem(
    num_poses=24, num_landmarks=220, mean_obs_per_landmark=5.0,
    kind="mono", seed=13,
)
opt = optimizer_from_problem(problem)
solver = opt.solver
solver.build_structure()
assert solver.plan.tri_plan is not None, "CPU build must keep the f64 triple path"
assert solver.group_layout is None or not solver.group_layout.use_kernel
_, sys_blocks = solver.head()
lam = jnp.asarray(1e-3, solver.dtype)
blocks, bsc, _ = bs.schur_reduce(
    sys_blocks, lam, solver.plan, solver.Pa, solver.La, solver.schur.nnz_blocks
)
key = solver.schur.blk_row.astype(np.int64) * solver.Pa + solver.schur.blk_col
np.savez(
    OUT,
    blocks=np.asarray(blocks, dtype=np.float64),
    bsc=np.asarray(bsc, dtype=np.float64),
    key=np.asarray(key),
)
print("cpu blocks:", blocks.shape, "tri path ok")
"""


def main() -> int:
    out = "/tmp/tpu_parity_cpu.npz"
    print("== Schur kernel parity: CPU f64 triple path vs TPU Mosaic kernel ==")
    print("[1/3] CPU f64 triple path (subprocess, forced cpu backend)...")
    snippet = f"OUT = {out!r}\n" + _CPU_SNIPPET
    r = subprocess.run(
        [sys.executable, "-c", snippet],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    sys.stdout.write(r.stdout)
    if r.returncode != 0:
        sys.stderr.write(r.stderr)
        return 1
    ref = np.load(out)

    print("[2/3] TPU kernel path (this process)...")
    import jax.numpy as jnp

    from cuda_bundle_adjustment_tpu.io.arrays import optimizer_from_problem
    from cuda_bundle_adjustment_tpu.io.synthetic import make_ba_problem
    from cuda_bundle_adjustment_tpu.solver import block_solver as bs

    problem = make_ba_problem(
        num_poses=24, num_landmarks=220, mean_obs_per_landmark=5.0,
        kind="mono", seed=13,
    )
    opt = optimizer_from_problem(problem)
    solver = opt.solver
    solver.build_structure()
    lay = solver.group_layout
    assert lay is not None and lay.use_kernel, (
        "TPU build must take the Mosaic kernel path"
    )
    _, sys_blocks = solver.head()
    lam = jnp.asarray(1e-3, solver.dtype)
    blocks, bsc, _ = bs.schur_reduce(
        sys_blocks, lam, solver.plan, solver.Pa, solver.La,
        solver.schur.nnz_blocks,
    )
    key = (
        solver.schur.blk_row.astype(np.int64) * solver.Pa
        + solver.schur.blk_col
    )
    blocks = np.asarray(blocks, dtype=np.float64)
    bsc = np.asarray(bsc, dtype=np.float64)

    # align by block key (orderings differ: layout unique-keys vs CSR walk)
    k_t, k_c = np.asarray(key), ref["key"]
    pos = {int(k): i for i, k in enumerate(k_c)}
    # every key present on one side must exist on the other with the same value
    only_t = [k for k in k_t if int(k) not in pos]
    assert not only_t, f"TPU-only Hsc blocks: {only_t[:5]}"
    bt = blocks
    bc = ref["blocks"][[pos[int(k)] for k in k_t]]
    # CPU-only keys must be (numerically) zero blocks
    missing = set(int(k) for k in k_c) - set(int(k) for k in k_t)
    if missing:
        rows = [np.flatnonzero(k_c == k)[0] for k in missing]
        zmax = float(np.abs(ref["blocks"][rows]).max())
        print(f"  cpu-only keys: {len(missing)} (max |block| = {zmax:.3e})")
        assert zmax < 1e-9

    scale = float(np.abs(bc).max())
    err_blocks = float(np.abs(bt - bc).max()) / scale
    err_bsc = float(np.abs(bsc - ref["bsc"]).max()) / float(
        np.abs(ref["bsc"]).max()
    )
    print(f"  Hsc blocks: n={bt.shape[0]}  max rel err = {err_blocks:.3e}")
    print(f"  bsc:        max rel err = {err_bsc:.3e}")
    ok = err_blocks < 1e-11 and err_bsc < 1e-11
    print("KERNEL PARITY:", "OK" if ok else "FAIL")
    if not ok:
        return 1

    print("[3/3] full chi2-trace parity sample (dense f64 oracle)...")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "samples", "sample_comparison_with_cpu.py"),
         "--synthetic", "10"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    sys.stdout.write(r.stdout)
    if r.returncode != 0:
        sys.stderr.write(r.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
