"""ctypes binding for the C++ group-layout builder + edge packer.

The native library (``native/layout.cpp``) builds the co-visibility group
layout (the host symbolic stage, solver/groups.py) and packs the per-edge
payloads into layout order in fused single passes — together ~100 ms of the
timed ``initialize()`` region at KITTI-00 scale on this 1-core host.  Every
array is bit-identical to the numpy implementation (pinned by
tests/test_native_layout.py); the numpy path remains the fallback when the
shared library has not been built (``python -m
cuda_bundle_adjustment_tpu.native.build``).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False

_MAX_CLASSES = 1024


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
    if not hasattr(lib, "tba_layout_analyze"):  # stale pre-layout build
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i16p = ctypes.POINTER(ctypes.c_int16)
    i8p = ctypes.POINTER(ctypes.c_int8)
    f64p = ctypes.POINTER(ctypes.c_double)
    i64 = ctypes.c_int64
    lib.tba_layout_analyze.restype = i64
    lib.tba_layout_analyze.argtypes = [
        i64p, i64p, i64, i64, i64, i64, i64,
        i64p, i64p, i64p, i64p, i64p,
        i64, i64p, i64p, i64p, i64p, i64p, i64p,
    ]
    lib.tba_layout_emit.restype = i64
    lib.tba_layout_emit.argtypes = [
        i64p, i64,
        i64p, i64p, i64p, i64p,
        i64, i64p, i64p, i64p, i64p, i64, i64,
        i64p, i64p, i64p, i64p, i64p, i64p, i64,
    ]
    lib.tba_pack_edges.restype = i64
    lib.tba_pack_edges.argtypes = [
        i64p, i64,
        f64p, i64, i64,
        f64p, i64,
        f64p,
        f64p, i64,
        i64p, i64p, i64p, i64,
        i64, i64p, i64p, i64p,
        i64,
        f64p, f64p, i8p, i8p, i16p, i32p, i32p,
    ]
    _LIB = lib
    return _LIB


def _p(a, ty):
    return a.ctypes.data_as(ty)


def native_group_layout(pose_idx, lm_idx, Pa, La, gc=8, tile_n=128):
    """Native :func:`~.groups.build_group_layout` core.

    Returns ``None`` (caller falls back to numpy) if the library is absent.
    Otherwise returns the same :class:`~.groups.GroupLayout`.
    """
    lib = _load()
    if lib is None:
        return None
    from .groups import ClassMeta, GroupLayout, GroupLayoutMeta

    i64p = ctypes.POINTER(ctypes.c_int64)
    pose_idx = np.ascontiguousarray(pose_idx, dtype=np.int64)
    lm_idx = np.ascontiguousarray(lm_idx, dtype=np.int64)
    E = pose_idx.size

    sort_buf = np.empty(max(E, 1), dtype=np.int64)
    lm_sorted = np.empty(max(E, 1), dtype=np.int64)
    deg = np.empty(max(La, 1), dtype=np.int64)
    lms_s_all = np.empty(max(La, 1), dtype=np.int64)
    gid_all = np.empty(max(La, 1), dtype=np.int64)
    cd = np.empty(_MAX_CLASSES, dtype=np.int64)
    cld = np.empty(_MAX_CLASSES, dtype=np.int64)
    cnc = np.empty(_MAX_CLASSES, dtype=np.int64)
    cgc = np.empty(_MAX_CLASSES, dtype=np.int64)
    cnp = np.empty(_MAX_CLASSES, dtype=np.int64)
    fixc = np.zeros(1, dtype=np.int64)

    n_classes = lib.tba_layout_analyze(
        _p(pose_idx, i64p), _p(lm_idx, i64p), E, Pa, La, gc, tile_n,
        _p(sort_buf, i64p), _p(lm_sorted, i64p), _p(deg, i64p),
        _p(lms_s_all, i64p), _p(gid_all, i64p),
        _MAX_CLASSES, _p(cd, i64p), _p(cld, i64p), _p(cnc, i64p),
        _p(cgc, i64p), _p(cnp, i64p), _p(fixc, i64p),
    )
    if n_classes < 0:
        return None  # absurd degree diversity; numpy path handles it

    cd, cld, cnc, cgc, cnp = (
        a[:n_classes] for a in (cd, cld, cnc, cgc, cnp)
    )
    nc_pad = -(-cnc // tile_n) * tile_n
    e_sizes = cd * cgc * nc_pad
    lm_sizes = cgc * nc_pad
    out_sizes = cnp * nc_pad
    cp_sizes = cd * nc_pad
    e_starts = np.concatenate([[0], np.cumsum(e_sizes)])
    lm_starts = np.concatenate([[0], np.cumsum(lm_sizes)])
    out_starts = np.concatenate([[0], np.cumsum(out_sizes)])
    e_classes = int(e_starts[-1])

    edge_perm_cls = np.empty(max(e_classes, 1), dtype=np.int64)
    lm_order_cls = np.empty(max(int(lm_starts[-1]), 1), dtype=np.int64)
    lm_renumber = np.empty(max(La, 1), dtype=np.int64)
    out_key = np.empty(max(int(out_starts[-1]), 1), dtype=np.int64)
    chunk_pose = np.empty(max(int(np.sum(cp_sizes)), 1), dtype=np.int64)
    fix_rows = np.empty(max(int(fixc[0]), 1), dtype=np.int64)

    nfix = lib.tba_layout_emit(
        _p(pose_idx, i64p), Pa,
        _p(lm_sorted, i64p), _p(deg, i64p),
        _p(lms_s_all, i64p), _p(gid_all, i64p),
        n_classes, _p(cd, i64p), _p(cld, i64p), _p(cnc, i64p),
        _p(cgc, i64p), tile_n, La,
        _p(edge_perm_cls, i64p), _p(lm_order_cls, i64p),
        _p(lm_renumber, i64p), _p(out_key, i64p), _p(chunk_pose, i64p),
        _p(fix_rows, i64p), int(fixc[0]),
    )
    assert nfix == int(fixc[0]), (nfix, int(fixc[0]))

    # d0 region + extras: tiny, numpy (same as groups.py)
    lm_cursor = int(lm_starts[-1])
    d0 = np.nonzero(deg[:La] == 0)[0]
    lm_order_parts = [lm_order_cls[: int(lm_starts[-1])]]
    if d0.size:
        lm_renumber[d0] = lm_cursor + np.arange(d0.size)
        lm_order_parts.append(d0)
        lm_cursor += d0.size
    both_free = (pose_idx < Pa) & (lm_idx < La)
    extra_rows = np.nonzero(~both_free)[0]
    edge_perm = np.concatenate([edge_perm_cls[:e_classes], extra_rows])

    classes = tuple(
        ClassMeta(
            d=int(cd[i]),
            nc_pad=int(nc_pad[i]),
            e_start=int(e_starts[i]),
            lm_start=int(lm_starts[i]),
            npairs=int(cnp[i]),
            out_start=int(out_starts[i]),
            gc=int(cgc[i]),
        )
        for i in range(n_classes)
    )
    a_luts, b_luts = [], []
    for i in range(n_classes):
        aa, bb = np.triu_indices(int(cd[i]))
        a_luts.append(aa.astype(np.int32))
        b_luts.append(bb.astype(np.int32))

    meta = GroupLayoutMeta(
        classes=classes,
        gc=gc,
        e_classes=e_classes,
        e_total=int(edge_perm.size),
        la_pad=int(lm_cursor),
        n_extras=int(extra_rows.size),
        n_out=int(out_starts[-1]),
    )
    return GroupLayout(
        meta=meta,
        edge_perm=edge_perm,
        lm_order=np.concatenate(lm_order_parts)
        if lm_order_parts
        else np.zeros(0, dtype=np.int64),
        lm_renumber=lm_renumber[:La],
        a_lut=tuple(a_luts),
        b_lut=tuple(b_luts),
        out_key=out_key[: int(out_starts[-1])],
        fix_rows=fix_rows[:nfix] if nfix else np.zeros(0, dtype=np.int64),
        chunk_pose=chunk_pose,
    )


def native_pack_edges(
    lay, meas, omega, active, mask3, pose_idx, lm_idx, lm_renumber_full,
    Pa, M_out, use_int16, compact_meas=True,
):
    """Fused layout-order packing of the per-edge payloads.

    Returns ``(measT, omega_or_None, active_i8, mask3_i8_or_None, pose_up,
    lm_idx)`` — the host arrays :meth:`initialize_from_arrays` uploads — or
    ``None`` when the library is absent.  ``meas`` is ``[E, M_in]`` f64;
    ``measT`` comes back component-major: ``[M_out, n_active]`` COMPACT
    (``compact_meas``, the default — only rows with ``active_i8 == 1``, in
    layout order; the device restores padding with one monotone gather,
    cutting the dominant upload by the ~26% dummy fraction) or
    ``[M_out, e_total]`` padded (third row zero-filled for pure-mono sets
    so the device transpose disappears).
    """
    lib = _load()
    if lib is None:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i16p = ctypes.POINTER(ctypes.c_int16)
    i8p = ctypes.POINTER(ctypes.c_int8)
    f64p = ctypes.POINTER(ctypes.c_double)

    edge_perm = np.ascontiguousarray(lay.edge_perm, dtype=np.int64)
    e_total = edge_perm.size
    meas = np.ascontiguousarray(meas, dtype=np.float64)
    M_in = meas.shape[1]
    per_edge_omega = omega is not None and omega.size > 1
    omega_c = (
        np.ascontiguousarray(omega, dtype=np.float64)
        if per_edge_omega
        else np.zeros(1)
    )
    # tba_pack_edges indexes active[src] / mask3[src] for every real row, so a
    # scalar/size-1 array (the "all edges share one flag" shorthand the numpy
    # path accepts) must be broadcast to source-edge length before the call —
    # otherwise the C++ reads out of bounds.
    n_src = meas.shape[0]
    active_c = np.ascontiguousarray(active, dtype=np.float64)
    if active_c.size == 1 and n_src > 1:
        active_c = np.full(n_src, float(active_c.reshape(-1)[0]))
    has_mask3 = mask3 is not None
    mask3_c = (
        np.ascontiguousarray(mask3, dtype=np.float64)
        if has_mask3
        else np.zeros(1)
    )
    if has_mask3 and mask3_c.size == 1 and n_src > 1:
        mask3_c = np.full(n_src, float(mask3_c.reshape(-1)[0]))
    pose_c = np.ascontiguousarray(pose_idx, dtype=np.int64)
    lm_c = np.ascontiguousarray(lm_idx, dtype=np.int64)
    lmr = np.ascontiguousarray(lm_renumber_full, dtype=np.int64)

    cls = lay.meta.classes
    ces = np.array([c.e_start for c in cls], dtype=np.int64)
    cls_lm = np.array([c.lm_start for c in cls], dtype=np.int64)
    css = np.array([c.gc * c.nc_pad for c in cls], dtype=np.int64)
    if not len(cls):  # no classes: plain layout, let numpy handle it
        return None

    if compact_meas:
        real = edge_perm >= 0
        if active_c.size > 1:
            n_meas = int(np.count_nonzero(active_c[edge_perm[real]] > 0))
        else:
            n_meas = int(np.count_nonzero(real)) if float(active_c[0]) > 0 else 0
        if n_meas == 0 or n_meas >= e_total:
            compact_meas = False
    meas_cols = n_meas if compact_meas else e_total
    measT = np.empty((M_out, meas_cols), dtype=np.float64)
    omega_out = np.empty(e_total if per_edge_omega else 1, dtype=np.float64)
    active_out = np.empty(e_total, dtype=np.int8)
    mask3_out = np.empty(e_total if has_mask3 else 1, dtype=np.int8)
    if use_int16:
        pose_out = np.empty(e_total, dtype=np.int16)
        p16, p32 = _p(pose_out, i16p), None
    else:
        pose_out = np.empty(e_total, dtype=np.int32)
        p16, p32 = None, _p(pose_out, i32p)
    lm_out = np.empty(e_total, dtype=np.int32)

    written = lib.tba_pack_edges(
        _p(edge_perm, i64p), e_total,
        _p(meas, f64p), M_in, M_out,
        _p(omega_c, f64p), int(per_edge_omega),
        _p(active_c, f64p),
        _p(mask3_c, f64p), int(has_mask3),
        _p(pose_c, i64p), _p(lm_c, i64p), _p(lmr, i64p), Pa,
        len(cls), _p(ces, i64p), _p(cls_lm, i64p), _p(css, i64p),
        meas_cols,
        _p(measT, f64p),
        _p(omega_out, f64p),
        _p(active_out, i8p),
        _p(mask3_out, i8p),
        p16, p32,
        _p(lm_out, i32p),
    )
    assert written == meas_cols, (written, meas_cols)
    return (
        measT,
        omega_out if per_edge_omega else None,
        active_out,
        mask3_out if has_mask3 else None,
        pose_out,
        lm_out,
    )
