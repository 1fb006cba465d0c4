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
    path = os.path.join(os.path.dirname(__file__), "..", "native", "libtba_symbolic.so")
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.tba_count_pairs.restype = ctypes.c_int64
    lib.tba_count_pairs.argtypes = [i64p, i64p, ctypes.c_int64]
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
