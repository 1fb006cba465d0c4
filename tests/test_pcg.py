"""Chunked-block-Jacobi PCG on flat Hsc blocks vs a dense reference solve."""

import jax.numpy as jnp
import numpy as np

from cuda_bundle_adjustment_tpu.solver.pcg import build_pcg_plan, solve_blocks_pcg


def _random_block_system(Pa, extra_offdiag, seed):
    """Random SPD system stored as upper-tri flat 6x6 blocks on a banded +
    random-long-range pattern."""
    rng = np.random.default_rng(seed)
    pairs = {(i, i) for i in range(Pa)}
    for i in range(Pa - 1):
        pairs.add((i, i + 1))
    while len(pairs) < Pa * 2 + extra_offdiag:
        a, b = sorted(rng.integers(0, Pa, 2))
        pairs.add((a, b))
    pairs = sorted(pairs)
    n = Pa * 6
    A = np.zeros((n, n))
    for (i, j) in pairs:
        blk = rng.standard_normal((6, 6)) * 0.3
        A[i * 6 : i * 6 + 6, j * 6 : j * 6 + 6] += blk
        if i != j:
            A[j * 6 : j * 6 + 6, i * 6 : i * 6 + 6] += blk.T
    A = A @ A.T + np.eye(n) * (1.0 + 0.1 * Pa)  # SPD, decently conditioned
    # re-extract the upper blocks of the SPD matrix on the FULL pattern of
    # A@A.T (fill-in!): easier to just use a dense pattern of nonzero blocks
    blocks, rows, cols = [], [], []
    for i in range(Pa):
        for j in range(i, Pa):
            blk = A[i * 6 : i * 6 + 6, j * 6 : j * 6 + 6]
            if np.any(blk != 0.0):
                blocks.append(blk.reshape(36))
                rows.append(i)
                cols.append(j)
    blocks = np.array(blocks)
    rows = np.array(rows)
    cols = np.array(cols)
    keys = rows * Pa + cols
    order = np.argsort(keys)
    blocks, rows, cols = blocks[order], rows[order], cols[order]
    diag_pos = np.searchsorted(keys[order], np.arange(Pa) * (Pa + 1))
    b = rng.standard_normal((Pa, 6))
    return A, blocks, rows, cols, diag_pos, b


def test_pcg_matches_dense_solve():
    Pa = 40
    A, blocks, rows, cols, diag_pos, b = _random_block_system(Pa, 30, 0)
    pc = build_pcg_plan(rows, cols, Pa)
    xp, ok = solve_blocks_pcg(
        jnp.asarray(blocks), jnp.asarray(b), Pa,
        jnp.asarray(rows.astype(np.int32)), jnp.asarray(cols.astype(np.int32)),
        jnp.asarray(diag_pos.astype(np.int32)), pc,
    )
    assert bool(ok)
    want = np.linalg.solve(A, b.reshape(-1)).reshape(Pa, 6)
    np.testing.assert_allclose(np.asarray(xp), want, rtol=1e-7, atol=1e-9)


def test_pcg_reports_failure_on_indefinite():
    Pa = 16
    A, blocks, rows, cols, diag_pos, b = _random_block_system(Pa, 10, 1)
    # make it violently indefinite: flip the diagonal sign
    blocks = blocks.copy()
    blocks[diag_pos] *= -1.0
    pc = build_pcg_plan(rows, cols, Pa)
    xp, ok = solve_blocks_pcg(
        jnp.asarray(blocks), jnp.asarray(b), Pa,
        jnp.asarray(rows.astype(np.int32)), jnp.asarray(cols.astype(np.int32)),
        jnp.asarray(diag_pos.astype(np.int32)), pc,
        maxiter=50,
    )
    assert not bool(ok)
