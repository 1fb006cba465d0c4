"""Schur-structure symbolic analysis vs a brute-force oracle."""

import numpy as np
import pytest

from cuda_bundle_adjustment_tpu.solver.symbolic import build_schur_structure


def _brute_force(pose_idx, lm_idx, Pa, La):
    """Oracle: dense enumeration of blocks and multiply pairs."""
    valid = [
        e
        for e in range(len(pose_idx))
        if 0 <= pose_idx[e] < Pa and 0 <= lm_idx[e] < La
    ]
    by_lm = {}
    for e in valid:
        by_lm.setdefault(lm_idx[e], []).append(e)
    pairs = set()
    triples = []
    for lm, edges in sorted(by_lm.items()):
        edges = sorted(edges, key=lambda e: (pose_idx[e], e))
        for i, ei in enumerate(edges):
            for ej in edges[i:]:
                pi, pj = pose_idx[ei], pose_idx[ej]
                pairs.add((pi, pj))
                triples.append((ei, ej, pi, pj))
                if pi == pj and ei != ej:
                    # diagonal blocks are not mirrored: need both orders
                    triples.append((ej, ei, pi, pj))
    blocks = sorted(pairs | {(p, p) for p in range(Pa)})
    return blocks, triples


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_structure_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    Pa, La = 7, 15
    E = 60
    # include some fixed poses/landmarks (indices beyond the active counts)
    pose_idx = rng.integers(0, Pa + 2, size=E)
    lm_idx = rng.integers(0, La + 3, size=E)

    s = build_schur_structure(pose_idx, lm_idx, Pa, La, use_native=False)
    blocks_want, triples_want = _brute_force(pose_idx, lm_idx, Pa, La)

    blocks_got = sorted(zip(s.blk_row.tolist(), s.blk_col.tolist()))
    assert blocks_got == blocks_want
    assert s.nmul_blocks == len(triples_want)

    # every triple must target the block of its pose pair
    block_of = {rc: k for k, rc in enumerate(zip(s.blk_row.tolist(), s.blk_col.tolist()))}
    got = sorted(zip(s.tri_ei.tolist(), s.tri_ej.tolist(), s.tri_k.tolist()))
    want = sorted((ei, ej, block_of[(pi, pj)]) for ei, ej, pi, pj in triples_want)
    assert got == want

    # diag positions point at (p, p)
    for p in range(Pa):
        k = s.diag_pos[p]
        assert (s.blk_row[k], s.blk_col[k]) == (p, p)

    # CSR row pointers consistent
    assert s.rowptr[-1] == s.nnz_blocks
    counts = np.diff(s.rowptr)
    np.testing.assert_array_equal(counts, np.bincount(s.blk_row, minlength=Pa))


def test_native_matches_numpy():
    pytest.importorskip("ctypes")
    import os
    import subprocess
    import sys

    from cuda_bundle_adjustment_tpu.native import build as native_build_mod

    try:
        native_build_mod.build()
    except (subprocess.CalledProcessError, FileNotFoundError):
        pytest.skip("g++ unavailable")

    # force a reload of the lazy loader state
    from cuda_bundle_adjustment_tpu.solver import native_symbolic

    native_symbolic._TRIED = False
    native_symbolic._LIB = None

    rng = np.random.default_rng(42)
    Pa, La, E = 11, 40, 300
    pose_idx = rng.integers(0, Pa + 2, size=E)
    lm_idx = rng.integers(0, La + 3, size=E)

    s_np = build_schur_structure(pose_idx, lm_idx, Pa, La, use_native=False)
    s_nat = build_schur_structure(pose_idx, lm_idx, Pa, La, use_native=True)

    np.testing.assert_array_equal(s_np.blk_row, s_nat.blk_row)
    np.testing.assert_array_equal(s_np.blk_col, s_nat.blk_col)
    # triples are emitted in path-specific (but deterministic) enumeration
    # order; compare as canonicalised sets
    trip_np = sorted(zip(s_np.tri_k.tolist(), s_np.tri_ei.tolist(), s_np.tri_ej.tolist()))
    trip_nat = sorted(zip(s_nat.tri_k.tolist(), s_nat.tri_ei.tolist(), s_nat.tri_ej.tolist()))
    assert trip_np == trip_nat
    np.testing.assert_array_equal(s_np.diag_pos, s_nat.diag_pos)
