"""ctypes binding for the C++ symbolic-structure builder.

The native library (``native/symbolic.cpp``) performs the landmark-pair
enumeration — the hot host loop of structure analysis (the reference spends
353.8 ms in host symbolic work per structure, README.md:123) — in one pass.
Falls back to the vectorised numpy path in :mod:`.symbolic` when the shared
library has not been built.  Build it with ``python -m
cuda_bundle_adjustment_tpu.native.build``.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    from ..native.build import ensure_built

    path = ensure_built()  # builds on demand; None when unavailable/disabled
    if path is None or not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.tba_count_pairs.restype = ctypes.c_int64
    lib.tba_count_pairs.argtypes = [i64p, i64p, ctypes.c_int64]
    lib.tba_index_pairs_count.restype = ctypes.c_int64
    lib.tba_index_pairs_count.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64, i32p]
    lib.tba_index_pairs_emit.restype = None
    lib.tba_index_pairs_emit.argtypes = [
        i64p, ctypes.c_int64, ctypes.c_int64, i32p, i32p, i32p, i32p, i32p]
    lib.tba_fill_bucket.restype = None
    lib.tba_fill_bucket.argtypes = [
        i64p, i64p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, i32p]
    lib.tba_emit_sorted.restype = None
    lib.tba_emit_sorted.argtypes = [
        i64p, i64p, i64p, ctypes.c_int64, ctypes.c_int64, i32p,
        ctypes.c_int64, i64p, i32p, i32p, i32p]
    lib.tba_enumerate_pairs.restype = None
    lib.tba_enumerate_pairs.argtypes = [
        i64p,  # sorted edge ids
        i64p,  # sorted pose idx
        i64p,  # sorted landmark idx
        ctypes.c_int64,  # n edges
        ctypes.c_int64,  # Pa
        i64p,  # out pair_keys
        i64p,  # out tri_ei
        i64p,  # out tri_ej
    ]
    _LIB = lib
    return _LIB


def native_build(eids: np.ndarray, ep: np.ndarray, el: np.ndarray, Pa: int):
    """Run the native pair enumeration; returns None if the lib is absent."""
    lib = _load()
    if lib is None:
        return None

    order = np.lexsort((eids, ep, el))
    eid_s = np.ascontiguousarray(eids[order], dtype=np.int64)
    ep_s = np.ascontiguousarray(ep[order], dtype=np.int64)
    el_s = np.ascontiguousarray(el[order], dtype=np.int64)
    n = eid_s.size

    i64p = ctypes.POINTER(ctypes.c_int64)
    as_ptr = lambda a: a.ctypes.data_as(i64p)

    T = lib.tba_count_pairs(as_ptr(ep_s), as_ptr(el_s), n)
    pair_keys = np.empty(T, dtype=np.int64)
    tri_ei = np.empty(T, dtype=np.int64)
    tri_ej = np.empty(T, dtype=np.int64)
    lib.tba_enumerate_pairs(
        as_ptr(eid_s),
        as_ptr(ep_s),
        as_ptr(el_s),
        n,
        Pa,
        as_ptr(pair_keys),
        as_ptr(tri_ei),
        as_ptr(tri_ej),
    )
    return pair_keys, tri_ei, tri_ej


def native_index(pair_keys: np.ndarray, Pa: int):
    """Index the Hsc block pattern from raw pair keys (counting pass over the
    dense Pa^2 key space).  Returns (tri_k, blk_row, blk_col, diag_pos) or
    None if the native lib is absent."""
    lib = _load()
    if lib is None:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    keys = np.ascontiguousarray(pair_keys, dtype=np.int64)
    T = keys.size
    pos = np.empty(Pa * Pa, dtype=np.int32)
    nnz = lib.tba_index_pairs_count(
        keys.ctypes.data_as(i64p), T, Pa, pos.ctypes.data_as(i32p)
    )
    tri_k = np.empty(T, dtype=np.int32)
    blk_row = np.empty(nnz, dtype=np.int32)
    blk_col = np.empty(nnz, dtype=np.int32)
    diag_pos = np.empty(Pa, dtype=np.int32)
    lib.tba_index_pairs_emit(
        keys.ctypes.data_as(i64p), T, Pa, pos.ctypes.data_as(i32p),
        tri_k.ctypes.data_as(i32p), blk_row.ctypes.data_as(i32p),
        blk_col.ctypes.data_as(i32p), diag_pos.ctypes.data_as(i32p),
    )
    return tri_k, blk_row, blk_col, diag_pos


def native_structure(pair_keys, tri_ei, tri_ej, Pa: int):
    """Full native pattern indexing + k-sorted triple emission.

    Returns (tri_ei_s, tri_ej_s, tri_k_s, blk_row, blk_col, diag_pos, rowptr)
    with triples counting-sorted by target block, or None without the lib."""
    lib = _load()
    if lib is None:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    keys = np.ascontiguousarray(pair_keys, dtype=np.int64)
    ei = np.ascontiguousarray(tri_ei, dtype=np.int64)
    ej = np.ascontiguousarray(tri_ej, dtype=np.int64)
    T = keys.size
    pos = np.empty(Pa * Pa, dtype=np.int32)
    nnz = lib.tba_index_pairs_count(
        keys.ctypes.data_as(i64p), T, Pa, pos.ctypes.data_as(i32p)
    )
    tri_k = np.empty(T, dtype=np.int32)
    blk_row = np.empty(nnz, dtype=np.int32)
    blk_col = np.empty(nnz, dtype=np.int32)
    diag_pos = np.empty(Pa, dtype=np.int32)
    lib.tba_index_pairs_emit(
        keys.ctypes.data_as(i64p), T, Pa, pos.ctypes.data_as(i32p),
        tri_k.ctypes.data_as(i32p), blk_row.ctypes.data_as(i32p),
        blk_col.ctypes.data_as(i32p), diag_pos.ctypes.data_as(i32p),
    )
    rowptr = np.empty(nnz + 1, dtype=np.int64)
    ei_s = np.empty(T, dtype=np.int32)
    ej_s = np.empty(T, dtype=np.int32)
    k_s = np.empty(T, dtype=np.int32)
    lib.tba_emit_sorted(
        keys.ctypes.data_as(i64p), ei.ctypes.data_as(i64p),
        ej.ctypes.data_as(i64p), T, Pa, pos.ctypes.data_as(i32p),
        nnz, rowptr.ctypes.data_as(i64p), ei_s.ctypes.data_as(i32p),
        ej_s.ctypes.data_as(i32p), k_s.ctypes.data_as(i32p),
    )
    return ei_s, ej_s, k_s, blk_row, blk_col, diag_pos, rowptr


def native_fill_bucket(payload, perm, row_start, row_len, S, sentinel):
    """C++ bucket-matrix fill; returns None if the lib is absent."""
    lib = _load()
    if lib is None:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    payload = np.ascontiguousarray(payload, dtype=np.int64)
    row_start = np.ascontiguousarray(row_start, dtype=np.int64)
    row_len = np.ascontiguousarray(row_len, dtype=np.int64)
    n_b = row_start.size
    out = np.empty(n_b * int(S), dtype=np.int32)
    pptr = (
        np.ascontiguousarray(perm, dtype=np.int64).ctypes.data_as(i64p)
        if perm is not None
        else ctypes.cast(None, i64p)
    )
    lib.tba_fill_bucket(
        payload.ctypes.data_as(i64p), pptr,
        row_start.ctypes.data_as(i64p), row_len.ctypes.data_as(i64p),
        n_b, int(S), int(sentinel), out.ctypes.data_as(i32p),
    )
    return out.reshape(n_b, int(S))
