"""Block solver: packing, structure analysis and the jitted LM pipeline stages.

TPU-first re-design of the reference ``BlockSolver``
(/root/reference/src/block_solver.h:54-140, block_solver.cpp) with the same
stage decomposition but functional, statically-shaped semantics:

* atomics -> ``jax.ops.segment_sum`` over edge->pose / edge->landmark indices
  (fixed vertices sit at indices >= active count, so out-of-range segment ids
  drop their contributions exactly like the reference's EDGE_FLAG checks);
* Hpl never materialises as a BSR matrix: it stays per-edge ``[E, 6, 3]``
  blocks (the reference stores one block per both-free edge too,
  cuda_block_solver.cu:1215-1219);
* the Schur product uses a host-precomputed multiply plan
  (:mod:`.symbolic`) + batched einsum + segment_sum instead of the
  one-thread-per-triple atomic kernel (cuda_block_solver.cu:1327-1345);
* LM trial push/pop (block_solver.cpp:431-439) disappears: stages are pure, a
  rejected trial simply discards the candidate state;
* the linear solve densifies the reduced camera system and runs a Cholesky
  factorization (the sparse-supernodal Pallas path is the planned next step;
  Hsc for KITTI-00 is 7932 x 7932, comfortably on-chip).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.ops import segment_sum

from ..graph import EdgeSet, LandmarkVertexSet, PoseVertexSet
from ..models import MODEL_REGISTRY
from ..ops.linalg import add_lambda, block_diag_solve
from ..ops.lie import se3_exp, se3_update_left
from ..ops.robust import robust_derivative, robustify
from ..types import GraphArrays, PackedEdges, SystemBlocks
from .symbolic import SchurStructure, build_schur_structure


# Pose count above which a wide (non-banded) Hsc pattern solves with
# block-Jacobi PCG instead of densifying (below it the dense MXU Cholesky is
# both faster and exact; module-level so tests can force the PCG path on
# small, oracle-checkable graphs).
PCG_MIN_POSES = 1024

# -- structure cache ----------------------------------------------------------
#
# Re-optimising the same graph STRUCTURE (identical edge index arrays) is the
# common production pattern (sliding-window SLAM re-packs the same topology
# every frame; the reference benchmark itself re-runs initialize+optimize on
# one input, samples/sample_ba_from_file/main.cpp:167-190).  The whole host
# symbolic pipeline — RCM ordering, co-visibility layout, Schur pattern,
# bucket plans — and the plan's device uploads depend ONLY on the index
# arrays and a few static knobs, so they are cached here keyed on a content
# digest.  Values are immutable once built (NamedTuples + device arrays that
# every consumer treats as read-only), so sharing across solver instances is
# safe.  The reference has no analogue (it redoes its symbolic analysis per
# initialize, optimisable_graph.hpp:475-572); this is a TPU-side win because
# behind the axon tunnel the plan upload alone costs ~1-2 dispatch RTTs.
from collections import OrderedDict as _OrderedDict

_STRUCT_CACHE: "_OrderedDict[str, dict]" = _OrderedDict()
_STRUCT_CACHE_MAX = 8


def _struct_bundle(key: str) -> dict:
    b = _STRUCT_CACHE.get(key)
    if b is None:
        b = {}
        _STRUCT_CACHE[key] = b
        while len(_STRUCT_CACHE) > _STRUCT_CACHE_MAX:
            _STRUCT_CACHE.popitem(last=False)
    else:
        _STRUCT_CACHE.move_to_end(key)
    return b


def _struct_digest(edge_specs, P, Pa, L, La) -> str:
    """Content digest of everything the host symbolic pipeline reads."""
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    h.update(np.array([P, Pa, L, La], dtype=np.int64).tobytes())
    for sp in edge_specs:
        h.update(sp["kind"].encode())
        h.update(b"|")
        h.update(
            np.ascontiguousarray(
                np.asarray(sp["pose_idx"], dtype=np.int64)
            ).tobytes()
        )
        li = sp.get("lm_idx")
        if li is not None:
            h.update(
                np.ascontiguousarray(np.asarray(li, dtype=np.int64)).tobytes()
            )
    return h.hexdigest()


class EdgeSetMeta(NamedTuple):
    """Static (hashable) per-edge-set compile-time info."""

    kind: str
    rk: int  # RobustKernelType value
    delta: float
    has_landmark: bool
    mdim: int
    nedges: int


class BandMeta(NamedTuple):
    """Static band-solver constants (leafless pytree: jit keys on it)."""

    bw: int  # block bandwidth (max |col - row| over the Hsc pattern)
    sb: int  # band height padded to a sublane multiple


jax.tree_util.register_pytree_node(
    BandMeta, lambda m: ((), m), lambda aux, _: aux
)


class SchurPlan(NamedTuple):
    """Device-side plan for the jitted pipeline stages (constant per
    structure, passed as jit arguments so XLA does not inline them).

    Every segment reduction in the hot path is a scatter-free
    :class:`~.segments.BucketPlan` (TPU scatters cost ~115 ns/row regardless
    of width; the bucketed gather+dense-sum form is 3-10x cheaper and
    bit-deterministic):

    * ``tri_plan``   — Schur multiply triples -> Hsc blocks ([T] -> [nnz])
    * ``bsc_plan``   — BA-edge rows -> poses (bsc correction term)
    * ``lm_plan``    — BA-edge rows -> landmarks (Hll/bl assembly + back-sub)
    * ``pose_plan``  — all-edge rows -> poses (Hpp/bp assembly)
    """

    ba_pose_idx: jnp.ndarray  # [Eba] int32 over concatenated landmark edge sets
    ba_lm_idx: jnp.ndarray  # [Eba] int32
    blk_row: jnp.ndarray  # [nnz]
    blk_col: jnp.ndarray  # [nnz]
    diag_pos: jnp.ndarray  # [Pa]
    tri_plan: object
    bsc_plan: object
    lm_plan: object
    pose_plan: object
    blk_row_plan: object = None  # Hsc blocks -> pose rows (refinement SpMV)
    blk_col_plan: object = None  # Hsc blocks -> pose cols (transpose term)
    # co-visibility group layout (solver/groups.py); layout is a leafless
    # static pytree, the rest are device constants for the grouped fast path
    layout: object = None  # GroupLayoutMeta | None
    class_a: tuple = ()  # per class: int32 [npairs] first slot of each pair
    class_b: tuple = ()
    outk_plan: object = None  # kernel output rows (+fix rows) -> Hsc blocks
    fix_rows: object = None  # int32 rows needing a transposed duplicate
    lm_extra_pos: object = None  # int32 [n_extras] landmark position per extra
    band: object = None  # BandMeta | None: banded Hsc -> Pallas band solver
    chunk_pose: object = None  # int32 [M] pose per (class, slot, chunk) row
    pcg: object = None  # PcgPlan | None: wide-pattern fallback (solver/pcg.py)


@functools.partial(jax.jit, static_argnames=("Pa", "La", "dtype"))
def _pack_device(meas, cam, pose_idx, lm_idx, active_i8, mask3_i8, Pa, La, dtype):
    """Device side of edge packing, one dispatch per edge set.

    - float masks are DERIVED from the int32 indices and 1-byte masks
      (uploading them as f64 costs ~22 MB per KITTI-00-scale edge set over
      the ~20-70 MB/s axon tunnel; both_free is a pure function of the
      indices, active/mask3 are 0/1);
    - meas/cam transpose to component-first [K, E] ON DEVICE (the host
      numpy transpose of a [755k, 2] array is a strided element-wise copy,
      ~0.3-1 s on this throttled core; on the TPU it is one relayout)."""
    pose_idx = pose_idx.astype(jnp.int32)  # int16 upload when P < 2^15
    both_free = ((pose_idx < Pa) & (lm_idx < La)).astype(dtype)
    active = active_i8.astype(dtype)
    mask3 = None if mask3_i8 is None else mask3_i8.astype(dtype)
    return (
        meas.astype(dtype).T,
        cam.astype(dtype).T,
        pose_idx,
        both_free,
        active,
        mask3,
    )


@functools.partial(jax.jit, static_argnames=("Pa", "La", "dtype"))
def _pack_device_cm(measT, cam, pose_idx, lm_idx, active_i8, mask3_i8, Pa, La, dtype):
    """:func:`_pack_device` for the native-pack path: ``measT`` arrives
    already component-major from C++ (native/layout.cpp), so only the dtype
    casts and index-derived masks remain on device."""
    pose_idx = pose_idx.astype(jnp.int32)
    both_free = ((pose_idx < Pa) & (lm_idx < La)).astype(dtype)
    active = active_i8.astype(dtype)
    mask3 = None if mask3_i8 is None else mask3_i8.astype(dtype)
    return (
        measT.astype(dtype),
        cam.astype(dtype).T,
        pose_idx,
        both_free,
        active,
        mask3,
    )


@functools.partial(jax.jit, static_argnames=("classes", "Pa", "La", "dtype"))
def _pack_device_cm_derived(
    measT, cam, chunk_pose, ex_pose, ex_lm, active_i8, mask3_i8,
    classes, Pa, La, dtype,
):
    """:func:`_pack_device_cm` with the CLASS-REGION indices DERIVED on
    device instead of uploaded (-4.5 MB per KITTI-00-scale repeat over the
    ~20-80 MB/s axon tunnel):

    - ``lm_idx`` of class row ``(slot a, member g, chunk c)`` is by
      construction its landmark's layout position ``lm_start + g*nc_pad + c``
      — a broadcast iota (solver/groups.py layout invariant: free landmarks
      are renumbered to their slot positions, and the dummy fill uses the
      SAME formula);
    - ``pose_idx`` is the class's ``chunk_pose[a*nc_pad + c]`` repeated over
      the ``gc`` members, from the small ``[sum_d d*nc_pad]`` int32 table
      (already Pa-sentineled for dummy chunks).  Ragged dummy MEMBERS (group
      smaller than gc) get their chunk's real pose where the host pack wrote
      the Pa sentinel — every consumer masks dummies by ``active = 0``
      (types.py PackedEdges), never by the sentinel, so this is safe; only
      the extras tail (``ex_pose``/``ex_lm``) still ships from the host.
    """
    pose_parts, lm_parts = [], []
    cp_off = 0
    for cm in classes:
        S = cm.gc * cm.nc_pad
        cp = jax.lax.slice_in_dim(
            chunk_pose, cp_off, cp_off + cm.d * cm.nc_pad, axis=0
        )
        pose_parts.append(
            jnp.broadcast_to(
                cp.reshape(cm.d, 1, cm.nc_pad), (cm.d, cm.gc, cm.nc_pad)
            ).reshape(-1)
        )
        lm_parts.append(
            jnp.broadcast_to(
                (cm.lm_start + jax.lax.iota(jnp.int32, S))[None, :],
                (cm.d, S),
            ).reshape(-1)
        )
        cp_off += cm.d * cm.nc_pad
    pose_idx = jnp.concatenate(pose_parts + [ex_pose.astype(jnp.int32)])
    lm_idx = jnp.concatenate(lm_parts + [ex_lm])
    both_free = ((pose_idx < Pa) & (lm_idx < La)).astype(dtype)
    active = active_i8.astype(dtype)
    mask3 = None if mask3_i8 is None else mask3_i8.astype(dtype)
    E = active_i8.shape[0]
    n = measT.shape[1]
    if n < E:
        # COMPACT measurement upload (native/layout.cpp): only rows with
        # active == 1 shipped, in layout order — restore the padded layout
        # with one monotone gather (~30 ms device at KITTI-00 scale vs
        # 40-90 ms of tunnel time for the dropped ~26% dummy bytes).
        # Inactive/dummy rows read the appended zero column; their meas is
        # never consumed unmasked (same contract as the dummy fills).
        pos = jnp.cumsum(active_i8.astype(jnp.int32)) - 1
        idx = jnp.where(active_i8 > 0, pos, n)
        measp = jnp.concatenate(
            [measT, jnp.zeros((measT.shape[0], 1), measT.dtype)], axis=1
        )
        measT = measp[:, idx]
    return (
        measT.astype(dtype),
        cam.astype(dtype).T,
        pose_idx,
        lm_idx,
        both_free,
        active,
        mask3,
    )


def _ids_to_indices(sets, ids):
    """Vectorised vertex-id -> GLOBAL-index lookup across several vertex
    sets (``Vertex.index`` is globally assigned by BlockSolver.initialize's
    active-first reindex).  Ids must be unique across sets of one role."""
    if len(sets) == 1:
        return sets[0].index_of_ids(ids)
    all_ids, all_idx = [], []
    for vs in sets:
        n = len(vs._vertices)
        all_ids.append(np.fromiter(vs._vertices.keys(), dtype=np.int64, count=n))
        all_idx.append(
            np.fromiter(
                (v.index for v in vs._vertices.values()), dtype=np.int64, count=n
            )
        )
        if vs._bulk_ids is not None:
            all_ids.append(vs._bulk_ids)
            all_idx.append(vs._bulk_gindex)
    cat_ids = np.concatenate(all_ids)
    cat_idx = np.concatenate(all_idx)
    order = np.argsort(cat_ids)
    sorted_ids = cat_ids[order]
    ids = np.asarray(ids, dtype=np.int64)
    pos = np.searchsorted(sorted_ids, ids)
    n = sorted_ids.size
    if np.any(pos >= n) or np.any(sorted_ids[np.minimum(pos, n - 1)] != ids):
        raise KeyError("edge references a vertex id not in any set")
    return cat_idx[order][pos]


def _merge_ba_specs(edge_specs):
    """Merge mono+stereo edge specs into one masked stereo spec.

    The mono Jacobian/residual is exactly the stereo model's rows 0-1, so a
    per-edge third-component mask (``PackedEdges.mask3``) makes one stereo
    set bit-equivalent to running both sets — and a SINGLE set is what the
    co-visibility group layout requires (solver/groups.py).  Specs with
    differing robust kernels keep the unmerged slow path.
    """
    kinds = [s["kind"] for s in edge_specs]
    if (
        len(edge_specs) < 2
        or not all(k in ("mono", "stereo") for k in kinds)
        or len({(s.get("rk", 0), s.get("delta", 1.0)) for s in edge_specs}) != 1
    ):
        return edge_specs

    meas_p, mask_p, omega_p, cam_p, pi_p, li_p, act_p = [], [], [], [], [], [], []
    thr = []
    for s in edge_specs:
        meas = np.asarray(s["meas"], dtype=np.float64)
        E = meas.shape[0]
        if s["kind"] == "mono":
            meas = np.concatenate([meas, np.zeros((E, 1))], axis=1)
            mask_p.append(np.zeros(E))
        else:
            mask_p.append(np.ones(E))
        meas_p.append(meas)
        omega_p.append(np.asarray(s["omega"], np.float64).reshape(-1))
        cam = np.asarray(s.get("cam", np.zeros(5)), dtype=np.float64)
        cam_p.append(cam.reshape(-1, 5))
        pi_p.append(np.asarray(s["pose_idx"]))
        li_p.append(np.asarray(s["lm_idx"]))
        act = s.get("active")
        act_p.append(
            np.ones(E) if act is None else np.asarray(act, dtype=np.float64)
        )
        t = s.get("outlier_threshold", 0.0)
        thr.append((np.asarray(t, dtype=np.float64), E))
    # keep uniform omega/camera COLLAPSED (single row) instead of
    # materialising + re-detecting E-sized broadcasts (the camera
    # broadcast alone is ~22 MB of host traffic at KITTI-00 scale)
    sizes = tuple(E for _, E in thr)
    if all(o.size == 1 for o in omega_p) and all(
        np.array_equal(o, omega_p[0]) for o in omega_p[1:]
    ):
        omega = omega_p[0]
    else:
        omega = np.concatenate([
            np.broadcast_to(o, (E,)) for o, E in zip(omega_p, sizes)
        ])
    if all(c.shape[0] == 1 for c in cam_p) and all(
        np.array_equal(c, cam_p[0]) for c in cam_p[1:]
    ):
        cam_m = cam_p[0]
    else:
        cam_m = np.concatenate([
            np.broadcast_to(c, (E, 5)) for c, E in zip(cam_p, sizes)
        ])
    merged = dict(
        kind="stereo",
        meas=np.concatenate(meas_p, axis=0),
        pose_idx=np.concatenate(pi_p),
        lm_idx=np.concatenate(li_p),
        omega=omega,
        cam=cam_m,
        rk=edge_specs[0].get("rk", 0),
        delta=edge_specs[0].get("delta", 1.0),
        mask3=np.concatenate(mask_p),
        active=np.concatenate(act_p),
        merged_sizes=sizes,  # un-merge map for write-backs
    )
    if any(np.any(t > 0) for t, _ in thr):
        merged["outlier_threshold"] = np.concatenate(
            [np.broadcast_to(t, (E,)) for t, E in thr]
        )
    return [merged]


def _resolve_schur_plan(plan: SchurPlan) -> SchurPlan:
    """Materialise deferred :class:`~.segments.UploadPool` handles (the plan
    is built against a pool so all its int32 arrays ride ONE upload)."""
    from .segments import BucketPlan, _Handle, _resolve_plan

    from .pcg import PcgPlan

    def fix(v):
        if isinstance(v, _Handle):
            return v.get()
        if isinstance(v, BucketPlan):
            return _resolve_plan(v)
        if isinstance(v, PcgPlan):
            return PcgPlan(
                *(x.get() if isinstance(x, _Handle) else x for x in v[:4]),
                v.nch, v.tol, v.maxiter,
            )
        if isinstance(v, tuple) and any(isinstance(x, _Handle) for x in v):
            return tuple(x.get() if isinstance(x, _Handle) else x for x in v)
        return v

    return SchurPlan(**{k: fix(v) for k, v in plan._asdict().items()})


# ---------------------------------------------------------------------------
# pure stage functions (jitted with static meta closures)
# ---------------------------------------------------------------------------


def _lm_slot_sum(X, plan, num_active_landmarks):
    """Landmark-indexed reduction of per-edge rows ``X [E', K]`` under the
    group layout: each landmark's contributions sit at a fixed stride across
    the ``d`` slot slices of its class, so the reduction is a sum of ``d``
    contiguous slices — no gather (solver/groups.py).  The few extras rows
    (single-free edges) scatter-add at the end."""
    lay = plan.layout
    K = X.shape[1]
    parts = []
    covered = 0
    for cm in lay.classes:
        S = cm.gc * cm.nc_pad
        seg = jax.lax.slice_in_dim(X, cm.e_start, cm.e_start + cm.d * S, axis=0)
        parts.append(seg.reshape(cm.d, S, K).sum(axis=0))
        covered += S
    if covered < num_active_landmarks:
        parts.append(jnp.zeros((num_active_landmarks - covered, K), X.dtype))
    acc = (
        jnp.concatenate(parts, axis=0)
        if parts
        else jnp.zeros((num_active_landmarks, K), X.dtype)
    )
    if lay.n_extras:
        ex = jax.lax.slice_in_dim(X, lay.e_classes, lay.e_total, axis=0)
        acc = acc + segment_sum(
            ex, plan.lm_extra_pos, num_segments=num_active_landmarks
        )
    return acc


def _lm_slot_expand(tbl, plan):
    """Inverse of :func:`_lm_slot_sum` for table reads: per-edge rows of a
    ``[La, K]`` landmark table under the group layout are ``d`` stacked
    copies of each class's table slice (plus a tiny gather for extras)."""
    lay = plan.layout
    parts = []
    for cm in lay.classes:
        S = cm.gc * cm.nc_pad
        cls = jax.lax.slice_in_dim(tbl, cm.lm_start, cm.lm_start + S, axis=0)
        parts.append(jnp.tile(cls, (cm.d, 1)))
    if lay.n_extras:
        idx = jnp.minimum(plan.ba_lm_idx[lay.e_classes :], tbl.shape[0] - 1)
        parts.append(tbl[idx])
    return jnp.concatenate(parts, axis=0)


def _pose_chunk_presum(X, plan):
    """Dense pre-reduction of per-edge rows over chunk members: every member
    of a co-visibility chunk shares the same pose per slot (solver/groups.py),
    so the pose-side bucket reduction only needs one row per (class, slot,
    chunk) — ~Gc x fewer gathered rows.  Returns ``[M (+extras), K]`` rows
    ordered to match the plan built over ``GroupLayout.chunk_pose``."""
    lay = plan.layout
    K = X.shape[1]
    parts = []
    for cm in lay.classes:
        S = cm.gc * cm.nc_pad
        seg = jax.lax.slice_in_dim(X, cm.e_start, cm.e_start + cm.d * S, axis=0)
        parts.append(
            seg.reshape(cm.d, cm.gc, cm.nc_pad, K)
            .sum(axis=1)
            .reshape(cm.d * cm.nc_pad, K)
        )
    if lay.n_extras:
        parts.append(jax.lax.slice_in_dim(X, lay.e_classes, lay.e_total, axis=0))
    return jnp.concatenate(parts, axis=0)


def _hpl_class_ff(Hpl36, cm):
    """One class's packed-Hpl halves as ``[18, DG, nc_pad]`` f32 blocks."""
    DG = cm.d * cm.gc
    span = DG * cm.nc_pad

    def part(rows):
        return jax.lax.slice_in_dim(
            rows, cm.e_start, cm.e_start + span, axis=1
        ).reshape(18, DG, cm.nc_pad)

    return part(Hpl36[:18]), part(Hpl36[18:])


def _bsc_rows_kernel_ff(Hpl36, y, plan, dtype=jnp.float64):
    """``Hpl @ y`` rows for the bsc reduce via the per-class Pallas product
    (pallas/schurvec.py), member-presummed — returns the ff-packed
    component-major ``[12, M (+extras)]`` rows ``reduce_rows_ff_cmajor``
    consumes.  Extras keep the XLA f64 math on a sliced view."""
    from ..pallas import schurvec
    from ..pallas.terms import split_ff

    lay = plan.layout
    if isinstance(y, tuple):  # pre-split [3, La] pair (pallas/lminv.py)
        y_h, y_l = y
    else:
        y_h, y_l = split_ff(y.T)  # [3, La]
    parts_h, parts_l = [], []
    for cm in lay.classes:
        S = cm.gc * cm.nc_pad
        hpl_h, hpl_l = _hpl_class_ff(Hpl36, cm)

        def ytile(yy):
            return jnp.tile(
                jax.lax.slice_in_dim(
                    yy, cm.lm_start, cm.lm_start + S, axis=1
                ).reshape(3, cm.gc, cm.nc_pad),
                (1, cm.d, 1),
            )

        oh, ol = schurvec.hpl_mv_class_call(
            hpl_h, hpl_l, ytile(y_h), ytile(y_l), d=cm.d, gc=cm.gc
        )
        parts_h.append(oh.reshape(6, cm.d * cm.nc_pad))
        parts_l.append(ol.reshape(6, cm.d * cm.nc_pad))
    if lay.n_extras:
        if isinstance(y, tuple):
            # lminv path: recombine the cm pair just for the tiny extras
            # slice's XLA product
            dt = dtype
            yT = y_h.astype(dt) + y_l.astype(dt)  # [3, La]
        else:
            dt = y.dtype
            yT = y.T
        ex = jax.lax.slice_in_dim(Hpl36, lay.e_classes, lay.e_total, axis=1)
        Hpl_ex = ex[:18].astype(dt) + ex[18:].astype(dt)
        idx = jnp.minimum(plan.ba_lm_idx[lay.e_classes :], yT.shape[1] - 1)
        rows_ex = _flat_mv_6x3_cm(Hpl_ex, yT[:, idx])  # [6, n_ex] f64
        eh, el = split_ff(rows_ex)
        parts_h.append(eh)
        parts_l.append(el)
    return jnp.concatenate(
        [jnp.concatenate(parts_h, axis=1), jnp.concatenate(parts_l, axis=1)],
        axis=0,
    )


def _backsub_lm_sum_kernel_ff(Hpl36, xp, plan, Pa, La, dtype):
    """``Hpl^T @ xp`` summed per landmark via the per-class Pallas product
    (pallas/schurvec.py) — returns ``[3, La]`` in ``dtype`` (slot sums of
    the class regions + extras scatter-add)."""
    from ..pallas import schurvec
    from ..pallas.terms import split_ff

    lay = plan.layout
    xp_cT = xp[jnp.minimum(plan.chunk_pose, Pa - 1)].T  # [6, M] f64
    xh, xl = split_ff(xp_cT)
    parts = []
    covered = 0
    off = 0
    for cm in lay.classes:
        rows = cm.d * cm.nc_pad
        S = cm.gc * cm.nc_pad
        hpl_h, hpl_l = _hpl_class_ff(Hpl36, cm)

        def xtile(xx):
            return jnp.broadcast_to(
                jax.lax.slice_in_dim(xx, off, off + rows, axis=1).reshape(
                    6, cm.d, 1, cm.nc_pad
                ),
                (6, cm.d, cm.gc, cm.nc_pad),
            ).reshape(6, cm.d * cm.gc, cm.nc_pad)

        oh, ol = schurvec.hpl_mtv_class_call(
            hpl_h, hpl_l, xtile(xh), xtile(xl), d=cm.d, gc=cm.gc
        )
        parts.append(oh.reshape(3, S).astype(dtype) + ol.reshape(3, S).astype(dtype))
        covered += S
        off += rows
    acc = jnp.concatenate(parts, axis=1)
    if covered < La:
        acc = jnp.concatenate(
            [acc, jnp.zeros((3, La - covered), dtype)], axis=1
        )
    if lay.n_extras:
        ex = jax.lax.slice_in_dim(Hpl36, lay.e_classes, lay.e_total, axis=1)
        Hpl_ex = ex[:18].astype(dtype) + ex[18:].astype(dtype)
        idx = plan.ba_pose_idx[lay.e_classes :]
        xp_ex = xp.T[:, jnp.minimum(idx, Pa - 1)]
        contrib_ex = _flat_mtv_6x3_cm(Hpl_ex, xp_ex)  # [3, n_ex]
        acc = acc + segment_sum(
            contrib_ex.T, plan.lm_extra_pos, num_segments=La
        ).T
    return acc


def _flat_mv_6x3_cm(A18cm, v3cm):
    """``y[i] = sum_c A[3i+c] v[c]`` on component-major rows -> ``[6, E]``."""
    return jnp.stack(
        [
            sum(A18cm[i * 3 + c] * v3cm[c] for c in range(3))
            for i in range(6)
        ],
        axis=0,
    )


def _flat_mtv_6x3_cm(A18cm, v6cm):
    """``y[j] = sum_c A[c*3+j] v[c]`` on component-major rows -> ``[3, E]``."""
    return jnp.stack(
        [
            sum(A18cm[c * 3 + j] * v6cm[c] for c in range(6))
            for j in range(3)
        ],
        axis=0,
    )


def _terms_kernel_inputs(graph, data, meta, dtype, pose_state):
    """Prologue shared by the linearisation- and chi-kernel paths
    (pallas/terms.py): per-edge pose state, (hi, lo) f32 splits of
    state/measurements/weights, and the lane-broadcast camera constants."""
    from ..pallas.terms import split_ff

    if pose_state is None:
        if data.pose_xp is not None:
            from ..models.ba import expand_pose_state

            pose_state = expand_pose_state(graph, data)
        else:  # CPU / interpret testing: no expand plan, plain XLA gather
            from ..models.ba import _pose_state_table

            sT = _pose_state_table(graph).T  # [12, P]
            pose_state = sT[
                :, jnp.minimum(data.pose_idx, sT.shape[1] - 1)
            ]
    qt_h, qt_l = split_ff(pose_state)  # [12, E]
    xw_h, xw_l = split_ff(graph.Xw.T)  # [3, L]
    meas = data.meas
    if meas.shape[0] < 3:  # pure-mono set: pad the unused third row
        meas = jnp.concatenate(
            [meas, jnp.zeros((3 - meas.shape[0], meas.shape[1]), meas.dtype)],
            axis=0,
        )
    ms_h, ms_l = split_ff(meas)
    omega = data.omega
    if omega.shape[0] == 1:
        omega = jnp.broadcast_to(omega, data.active.shape)
    wa_h, wa_l = split_ff(omega * data.active)
    act32 = data.active.astype(jnp.float32)
    m3_32 = None if data.mask3 is None else data.mask3.astype(jnp.float32)
    cam64 = data.cam[:, 0]
    cam64 = jax.lax.optimization_barrier(cam64)  # exact-split guard
    cam_hi = cam64.astype(jnp.float32)
    cam_lo = (cam64 - cam_hi.astype(dtype)).astype(jnp.float32)
    cam = jnp.broadcast_to(
        jnp.concatenate([cam_hi, cam_lo])[:, None], (10, 128)
    )
    mdim = 2 if meta.kind == "mono" else 3
    return (qt_h, qt_l, xw_h, xw_l, ms_h, ms_l, wa_h, wa_l, act32, m3_32,
            cam, mdim)


def _terms_class_args(cm, qt_h, qt_l, xw_h, xw_l, ms_h, ms_l, wa_h, wa_l,
                      act32, m3_32):
    """Slice one co-visibility class's kernel inputs out of the flat
    edge-order arrays (slot-tiled landmark state, [lead, DG, nc_pad]
    reshapes)."""
    DG = cm.d * cm.gc
    span = DG * cm.nc_pad
    S = cm.gc * cm.nc_pad

    def csl(x, lead):
        return jax.lax.slice_in_dim(
            x, cm.e_start, cm.e_start + span, axis=1
        ).reshape(lead, DG, cm.nc_pad)

    xw_c_h = jnp.tile(
        jax.lax.slice_in_dim(
            xw_h, cm.lm_start, cm.lm_start + S, axis=1
        ).reshape(3, cm.gc, cm.nc_pad),
        (1, cm.d, 1),
    )
    xw_c_l = jnp.tile(
        jax.lax.slice_in_dim(
            xw_l, cm.lm_start, cm.lm_start + S, axis=1
        ).reshape(3, cm.gc, cm.nc_pad),
        (1, cm.d, 1),
    )
    act_c = jax.lax.slice_in_dim(
        act32, cm.e_start, cm.e_start + span, axis=0
    ).reshape(DG, cm.nc_pad)
    m3_c = (
        None
        if m3_32 is None
        else jax.lax.slice_in_dim(
            m3_32, cm.e_start, cm.e_start + span, axis=0
        ).reshape(DG, cm.nc_pad)
    )
    return (
        csl(qt_h, 12), csl(qt_l, 12),
        xw_c_h, xw_c_l,
        csl(ms_h, 3), csl(ms_l, 3),
        wa_h[cm.e_start : cm.e_start + span].reshape(1, DG, cm.nc_pad),
        wa_l[cm.e_start : cm.e_start + span].reshape(1, DG, cm.nc_pad),
        act_c,
        m3_c,
    )


def compute_chi_kernel(graph, data, meta, plan, pose_state=None):
    """Total chi2 via the fused chi kernel (pallas/terms.py chi_class_call),
    one call per co-visibility class + the XLA model on the extras tail.
    Engaged under the SAME gate as the linearisation kernel
    (``plan.layout.terms_kernel``: single non-robust f64 mono/stereo set,
    one camera).  Summation order is fixed per compiled program (class
    order, then row-major within class), so traces stay deterministic."""
    from ..pallas import terms as _terms

    lay = plan.layout
    dtype = graph.q.dtype
    (qt_h, qt_l, xw_h, xw_l, ms_h, ms_l, wa_h, wa_l, act32, m3_32,
     cam, mdim) = _terms_kernel_inputs(graph, data, meta, dtype, pose_state)

    total = jnp.zeros((), dtype)
    for cm in lay.classes:
        args = _terms_class_args(
            cm, qt_h, qt_l, xw_h, xw_l, ms_h, ms_l, wa_h, wa_l, act32, m3_32
        )
        ch, cl = _terms.chi_class_call(
            cam, *args,
            d=cm.d, gc=cm.gc, mdim=mdim, has_m3=m3_32 is not None,
        )
        x = ch.astype(dtype) + cl.astype(dtype)
        if meta.rk:
            # rho(x) applied OUTSIDE the kernel on the well-tiled [DG, ncp]
            # class array (the kernel emits per-edge x = w*||e||^2; inert
            # rows have x = 0 and rho(0) = 0 for every kernel, so no active
            # re-mask is needed).  Reference applies rho in-kernel the same
            # way (cuda_block_solver.cu:1085-1097).
            x = robustify(meta.rk, meta.delta, x)
        total = total + jnp.sum(x)

    n_ex = lay.n_extras
    if n_ex:
        ex_sl = slice(lay.e_classes, lay.e_total)
        ex_data = data._replace(
            meas=data.meas[:, ex_sl],
            omega=data.omega if data.omega.shape[0] == 1 else data.omega[ex_sl],
            cam=data.cam,
            pose_idx=data.pose_idx[ex_sl],
            lm_idx=data.lm_idx[ex_sl],
            both_free=data.both_free[ex_sl],
            active=data.active[ex_sl],
            pose_xp=None,
            lm_xp=None,
            lm_slot=None,
            mask3=None if data.mask3 is None else data.mask3[ex_sl],
        )
        model = MODEL_REGISTRY[meta.kind]
        # NO pose_state slice here: with pose_state set but lm_xp/lm_slot
        # stripped, _edge_inputs would take the expand branch and crash on
        # the missing landmark plan — the plain XLA-gather branch re-gathers
        # the handful of extras rows instead (same as the build-side extras
        # path above)
        total = total + jnp.sum(
            model.chi(graph, ex_data, meta.rk, meta.delta)
        )
    return total


def _build_system_terms_kernel(graph, data, meta, Pa, La, plan, pose_state):
    """build_system via the fused linearisation kernel (pallas/terms.py).

    Emits the same SystemBlocks as the XLA path EXCEPT ``Hpl``, which stays
    in the kernel's packed float-float component-major form ``[36, e_total]``
    f32 (hi rows | lo rows) — the format the Schur pair-product kernel and
    the (recombined-on-the-fly) trial products consume.  Gated by
    ``plan.layout.terms_kernel`` so every consumer agrees on the layout."""
    from ..pallas import terms as _terms
    from ..pallas.terms import split_ff
    from .segments import reduce_rows_ff_cmajor

    lay = plan.layout
    dtype = graph.q.dtype
    (qt_h, qt_l, xw_h, xw_l, ms_h, ms_l, wa_h, wa_l, act32, m3_32,
     cam, mdim) = _terms_kernel_inputs(graph, data, meta, dtype, pose_state)

    pose_parts_h, pose_parts_l = [], []
    lm_parts_h, lm_parts_l = [], []
    hpl_parts_h, hpl_parts_l = [], []
    for ci, cm in enumerate(lay.classes):
        DG = cm.d * cm.gc
        span = DG * cm.nc_pad
        S = cm.gc * cm.nc_pad
        args = _terms_class_args(
            cm, qt_h, qt_l, xw_h, xw_l, ms_h, ms_l, wa_h, wa_l, act32, m3_32
        )
        if meta.rk:
            # robustified set: scale the weight by rho'(x) BEFORE the
            # quadratic form, exactly as the reference does in-kernel
            # (cuda_block_solver.cu:1188-1197).  x = w*||e||^2 comes from
            # one chi-kernel pass (cheap: ~0.2 ms/class at KITTI-00 scale);
            # rho' runs in XLA on the well-tiled [DG, ncp] class array.
            # Inert rows: x = 0 -> rho'(0) = 1 -> w stays 0.
            ch, cl = _terms.chi_class_call(
                cam, *args,
                d=cm.d, gc=cm.gc, mdim=mdim, has_m3=m3_32 is not None,
            )
            x = ch.astype(dtype) + cl.astype(dtype)
            wr = (args[6].astype(dtype) + args[7].astype(dtype)) * (
                robust_derivative(meta.rk, meta.delta, x)[None]
            )
            wr_h, wr_l = split_ff(wr)
            args = args[:6] + (wr_h, wr_l) + args[8:]
        ph, pl_, lh, ll, hh, hl = _terms.terms_class_call(
            cam, *args,
            d=cm.d, gc=cm.gc, mdim=mdim, has_m3=m3_32 is not None,
        )
        pose_parts_h.append(ph.reshape(42, cm.d * cm.nc_pad))
        pose_parts_l.append(pl_.reshape(42, cm.d * cm.nc_pad))
        lm_parts_h.append(lh.reshape(12, S))
        lm_parts_l.append(ll.reshape(12, S))
        hpl_parts_h.append(hh.reshape(18, span))
        hpl_parts_l.append(hl.reshape(18, span))

    # extras (single-free edges): tiny, keep the XLA model on a sliced view
    n_ex = lay.n_extras
    if n_ex:
        ex_sl = slice(lay.e_classes, lay.e_total)
        ex_data = data._replace(
            meas=data.meas[:, ex_sl],
            omega=data.omega if data.omega.shape[0] == 1 else data.omega[ex_sl],
            cam=data.cam,
            pose_idx=data.pose_idx[ex_sl],
            lm_idx=data.lm_idx[ex_sl],
            both_free=data.both_free[ex_sl],
            active=data.active[ex_sl],
            pose_xp=None,
            lm_xp=None,
            lm_slot=None,
            mask3=None if data.mask3 is None else data.mask3[ex_sl],
        )
        model = MODEL_REGISTRY[meta.kind]
        ex_pose, ex_lm, ex_hpl = model.terms(
            graph, ex_data, meta.rk, meta.delta
        )
        ex_pose_h, ex_pose_l = split_ff(ex_pose.T)
        pose_parts_h.append(ex_pose_h)
        pose_parts_l.append(ex_pose_l)
        ex_hpl_h, ex_hpl_l = split_ff(ex_hpl.T)
        hpl_parts_h.append(ex_hpl_h)
        hpl_parts_l.append(ex_hpl_l)

    pose_ff = jnp.concatenate(
        [jnp.concatenate(pose_parts_h, axis=1),
         jnp.concatenate(pose_parts_l, axis=1)],
        axis=0,
    )  # [84, M (+extras)]
    pose_acc = reduce_rows_ff_cmajor(pose_ff, plan.pose_plan, dtype).T

    lm_h_cat = jnp.concatenate(lm_parts_h, axis=1)
    lm_l_cat = jnp.concatenate(lm_parts_l, axis=1)
    covered = lm_h_cat.shape[1]
    lm_cm = lm_h_cat.astype(dtype) + lm_l_cat.astype(dtype)  # [12, covered]
    if covered < La:
        lm_cm = jnp.concatenate(
            [lm_cm, jnp.zeros((12, La - covered), dtype)], axis=1
        )
    lm_acc = lm_cm.T
    if n_ex:
        lm_acc = lm_acc + segment_sum(
            ex_lm, plan.lm_extra_pos, num_segments=La
        )
    # component-major copy for the per-trial lminv kernel (one relayout per
    # OUTER iteration instead of [La,1]-column f64 emulation per trial)
    lm_cm_full = lm_acc.T if n_ex else lm_cm

    Hpl36 = jnp.concatenate(
        [jnp.concatenate(hpl_parts_h, axis=1),
         jnp.concatenate(hpl_parts_l, axis=1)],
        axis=0,
    )  # [36, e_total] f32 ff-packed, component-major

    return SystemBlocks(
        Hpp=pose_acc[:, :36].reshape(Pa, 6, 6),
        bp=pose_acc[:, 36:],
        Hll=lm_acc[:, :9],
        bl=lm_acc[:, 9:],
        Hpl=Hpl36,
        lm_cm=lm_cm_full,
    )


def compute_chi(
    graph: GraphArrays,
    packed: tuple[PackedEdges, ...],
    metas: tuple[EdgeSetMeta, ...],
    pose_state=None,
    plan=None,
) -> jnp.ndarray:
    """Total chi2 over all edge sets (reference stage "2: Compute Error").

    ``pose_state``: precomputed per-edge pose state for the single-BA-set
    case (the fused loop shares it with the next linearisation).
    ``plan``: when its layout carries the terms-kernel gate, the chi pass
    runs as the fused Pallas chi kernel per co-visibility class."""
    if (
        plan is not None
        and len(packed) == 1
        and plan.layout is not None
        and getattr(plan.layout, "terms_kernel", False)
    ):
        return compute_chi_kernel(
            graph, packed[0], metas[0], plan, pose_state
        )
    total = jnp.zeros((), dtype=graph.q.dtype)
    for data, meta in zip(packed, metas):
        model = MODEL_REGISTRY[meta.kind]
        if pose_state is not None and len(packed) == 1:
            chi_e = model.chi(graph, data, meta.rk, meta.delta, pose_state)
        else:
            chi_e = model.chi(graph, data, meta.rk, meta.delta)
        total = total + jnp.sum(chi_e)
    return total


def build_system(
    graph: GraphArrays,
    packed: tuple[PackedEdges, ...],
    metas: tuple[EdgeSetMeta, ...],
    num_active_poses: int,
    num_active_landmarks: int,
    plan: Optional[SchurPlan] = None,
    pose_state=None,
) -> SystemBlocks:
    """Assemble Hpp/bp/Hll/bl and per-edge Hpl blocks (stage "3: Build System").

    With a ``plan``, the accumulations run as scatter-free bucketed
    reductions (:mod:`.segments`); the fallback is ``segment_sum`` with
    ``num_segments = active count``.  Either way, contributions of fixed
    vertices are dropped because their dense indices lie past the active
    count — replacing the reference's per-thread flag checks + atomic
    accumulation (cuda_block_solver.cu:1199-1219).  All per-edge blocks
    arrive flat ([E,42]/[E,12]/[E,18]) from the models to keep TPU tiling
    sane.
    """
    sys, _ = _build_system_impl(
        graph, packed, metas, num_active_poses, num_active_landmarks, plan,
        with_chi=False, pose_state=pose_state,
    )
    return sys


def build_system_chi(
    graph: GraphArrays,
    packed: tuple[PackedEdges, ...],
    metas: tuple[EdgeSetMeta, ...],
    num_active_poses: int,
    num_active_landmarks: int,
    plan: Optional[SchurPlan] = None,
) -> tuple[SystemBlocks, jnp.ndarray]:
    """Assemble the system AND the total chi2 in one pass: the LM trial's
    accept test and the next iteration's linearisation share the state
    expansion and residual evaluation (the reference runs them as separate
    kernels, cuda_block_solver.cu:1059-1110 vs 1151-1220)."""
    return _build_system_impl(
        graph, packed, metas, num_active_poses, num_active_landmarks, plan,
        with_chi=True,
    )


def _build_system_impl(
    graph, packed, metas, num_active_poses, num_active_landmarks, plan,
    with_chi, pose_state=None,
):
    from .segments import reduce_rows, reduce_rows_f64_packed

    Pa, La = num_active_poses, num_active_landmarks
    dtype = graph.q.dtype

    # fused linearisation kernel path (pallas/terms.py): everything below is
    # computed in one Pallas call per co-visibility class with only the
    # reduced outputs written.  with_chi callers (none today) keep the XLA
    # path — its Hpl layout differs (packed ff component-major), and the two
    # MUST not mix within one solver instance.
    if (
        not with_chi
        and len(packed) == 1
        and plan is not None
        and plan.layout is not None
        and getattr(plan.layout, "terms_kernel", False)
    ):
        return _build_system_terms_kernel(
            graph, packed[0], metas[0], Pa, La, plan, pose_state
        ), None

    pose_stacks, lm_stacks, Hpl_parts = [], [], []
    all_ba = all(m.has_landmark for m in metas)

    chi = jnp.zeros((), dtype) if with_chi else None
    for data, meta in zip(packed, metas):
        model = MODEL_REGISTRY[meta.kind]
        ps = pose_state if (pose_state is not None and len(packed) == 1) else None
        if with_chi:
            pose_stack, lm_stack, hpl, chi_e = model.terms_chi(
                graph, data, meta.rk, meta.delta
            )
            chi = chi + jnp.sum(chi_e)
        elif ps is not None:
            pose_stack, lm_stack, hpl = model.terms(
                graph, data, meta.rk, meta.delta, pose_state=ps
            )
        else:
            pose_stack, lm_stack, hpl = model.terms(
                graph, data, meta.rk, meta.delta
            )
        if all_ba and plan is not None:
            # ONE [E,72] stack per set instead of three: every [E,K<128]
            # array pads to [E,128] physically, so separate 42/12/18-wide
            # stacks cost ~3x the HBM writes.  The pose/landmark reductions
            # sum whole rows (the unused columns are discarded after), which
            # reads the same padded bytes either way.
            pose_stacks.append(
                (jnp.concatenate([pose_stack, lm_stack, hpl], axis=1), None)
            )
        else:
            pose_stacks.append((pose_stack, data.pose_idx))
            if meta.has_landmark:
                lm_stacks.append((lm_stack, data.lm_idx))
                Hpl_parts.append(hpl)

    if all_ba and plan is not None:
        combined = jnp.concatenate([s for s, _ in pose_stacks], axis=0)  # [E,72]
        if dtype != jnp.float64:
            # f32 fusion pathology: XLA's cost model treats the f32 per-edge
            # model as cheap enough to RECOMPUTE into every consumer of this
            # stack (pose presum, lm slot sum, the bucket gathers, the Hpl
            # output) instead of materialising it once — measured 60 ms vs
            # 7 ms net at kitti00 scale (tools/f32_diag3.py).  The barrier
            # forces one materialisation.  f64 already materialises (emulated
            # ops are costed high) and is bit-identical without it, so it is
            # left un-barriered to keep its established trace bit-exact.
            combined = jax.lax.optimization_barrier(combined)
        if plan.layout is not None:
            pose_acc = reduce_rows_f64_packed(
                _pose_chunk_presum(combined, plan)[:, :42], plan.pose_plan
            )
            lm_acc = _lm_slot_sum(combined[:, 42:54], plan, La)
        else:
            pose_acc = reduce_rows_f64_packed(
                combined[:, :42], plan.pose_plan
            )
            lm_acc = reduce_rows_f64_packed(
                combined[:, 42:54], plan.lm_plan
            )
        Hpl = combined[:, 54:]
        Hpp = pose_acc[:, :36].reshape(Pa, 6, 6)
        return SystemBlocks(
            Hpp=Hpp, bp=pose_acc[:, 36:], Hll=lm_acc[:, :9], bl=lm_acc[:, 9:],
            Hpl=Hpl,
        ), chi

    if plan is not None and plan.pose_plan is not None:
        pose_acc = reduce_rows_f64_packed(
            jnp.concatenate([s for s, _ in pose_stacks], axis=0), plan.pose_plan
        )
    else:
        pose_acc = jnp.zeros((Pa, 42), dtype)
        for s, idx in pose_stacks:
            pose_acc = pose_acc + segment_sum(s, idx, num_segments=Pa)

    lm_acc = None
    if La > 0 and lm_stacks:
        if plan is not None and plan.lm_plan is not None:
            lm_acc = reduce_rows_f64_packed(
                jnp.concatenate([s for s, _ in lm_stacks], axis=0), plan.lm_plan
            )
        else:
            lm_acc = jnp.zeros((La, 12), dtype)
            for s, idx in lm_stacks:
                lm_acc = lm_acc + segment_sum(s, idx, num_segments=La)

    Hpp = pose_acc[:, :36].reshape(Pa, 6, 6)
    bp = pose_acc[:, 36:]
    if lm_acc is not None:
        Hll = lm_acc[:, :9]
        bl = lm_acc[:, 9:]
    else:
        Hll = bl = None
    Hpl = jnp.concatenate(Hpl_parts, axis=0) if Hpl_parts else None
    return SystemBlocks(Hpp=Hpp, bp=bp, Hll=Hll, bl=bl, Hpl=Hpl), chi


def max_diagonal(sys: SystemBlocks) -> jnp.ndarray:
    """Max Hessian diagonal entry for the initial lambda (block_solver.cpp:309-320)."""
    m = jnp.max(jnp.diagonal(sys.Hpp, axis1=-2, axis2=-1))
    if sys.Hll is not None:
        m = jnp.maximum(m, jnp.max(sys.Hll[:, (0, 4, 8)]))
    return m


def _cho_solve_dense(
    A: jnp.ndarray, b: jnp.ndarray, mixed: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dense SPD solve; success = all pivots finite (zero-pivot analogue,
    /root/reference/src/cholesky.hpp:59-92).

    ``mixed=True`` factorises in f32 on the MXU and recovers f64 solve
    accuracy with three rounds of iterative refinement against the f64 matrix
    (f64 Cholesky on TPU is emulated and ~60x slower than f32: 964 ms vs
    15 ms at n = 7932 on v5e).  The refined solution matches the f64 direct
    solve to ~1e-12 relative for LM-damped systems (tests/test_mixed_solver.py).
    """
    from jax.scipy.linalg import solve_triangular

    if not mixed or A.dtype != jnp.float64:
        L = jnp.linalg.cholesky(A)
        y = solve_triangular(L, b, lower=True)
        x = solve_triangular(L.T, y, lower=False)
        return x, jnp.all(jnp.isfinite(x))

    # symmetric Jacobi pre-scaling: BA Hessian diagonals span many orders of
    # magnitude (focal-length-squared pixel terms vs unit-metric terms), which
    # would otherwise eat the f32 factorization's headroom
    d = jnp.diagonal(A)
    s = 1.0 / jnp.sqrt(jnp.maximum(d, 1e-300))
    As = A * s[:, None] * s[None, :]
    bs = b * s

    L32 = jnp.linalg.cholesky(As.astype(jnp.float32))

    def solve32(r):
        r32 = r.astype(jnp.float32)
        y = solve_triangular(L32, r32, lower=True)
        return solve_triangular(L32.T, y, lower=False).astype(jnp.float64)

    x = solve32(bs)
    for _ in range(3):
        r = bs - As @ x
        x = x + solve32(r)

    # success requires an actually-converged refinement, not just finiteness:
    # if cond(A) defeats the f32 factorization the LM loop re-damps (exactly
    # like the reference treats a zero-pivot, cuda_linear_solver.cpp:48-52)
    res = jnp.linalg.norm(bs - As @ x)
    ok = jnp.isfinite(res) & (res <= 1e-8 * (jnp.linalg.norm(bs) + 1e-300))
    x = x * s
    return x, ok & jnp.all(jnp.isfinite(x))


def _solve_reduced_blocks(
    blocks: jnp.ndarray,
    brow: jnp.ndarray,
    bcol: jnp.ndarray,
    diag_pos: jnp.ndarray,
    bsc: jnp.ndarray,
    num_active_poses: int,
    mixed: bool,
    row_plan=None,
    col_plan=None,
    band: Optional[BandMeta] = None,
    pcg=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Solve ``Hsc xp = bsc`` given Hsc as flat upper-tri 6x6 blocks, without
    ever materialising a dense f64 matrix (one f64 dense copy of KITTI-00's
    7932x7932 Hsc is 0.5 GB; the old path held three plus an f32 factor).

    Jacobi pre-scaling happens in block form.  With ``band`` (trajectory
    graphs: Hsc block bandwidth ~11), the f32 factor+solves run in the
    Pallas band kernels (pallas/bandchol.py) straight off the block rows —
    no dense matrix at all; otherwise the dense operand is built in the
    scalar ``[Pa*6, Pa*6]`` layout for an MXU Cholesky.  The f64
    iterative-refinement matvecs run on the scaled flat blocks either way —
    a block SpMV, never a dense f64 product."""
    from jax.scipy.linalg import solve_triangular

    from ..ops.components import flat_mtv_6x6, flat_mv_6x6

    Pa = num_active_poses
    dtype = blocks.dtype
    nnz = blocks.shape[0]

    if band is None and pcg is not None:
        # wide sparsity at scale: preconditioned CG on the flat blocks —
        # O(nnz) memory where the dense build would be O(Pa^2)
        # (the role of the reference's general sparse Cholesky,
        # cholesky.hpp:292-297)
        from .pcg import solve_blocks_pcg

        return solve_blocks_pcg(
            blocks, bsc, Pa, brow, bcol, diag_pos, pcg,
            row_plan=row_plan, col_plan=col_plan,
        )

    # symmetric Jacobi scaling: BA Hessian diagonals span many orders of
    # magnitude (focal-length-squared pixel terms vs unit-metric terms)
    diag = blocks[diag_pos][:, jnp.array([0, 7, 14, 21, 28, 35])]  # [Pa,6]
    s = 1.0 / jnp.sqrt(jnp.maximum(diag, 1e-300))
    bl_s = blocks * (s[brow][:, :, None] * s[bcol][:, None, :]).reshape(nnz, 36)
    bv = bsc * s  # [Pa,6] scaled rhs

    target = jnp.float32 if (mixed and dtype == jnp.float64) else dtype
    off = brow != bcol
    if band is not None and target == jnp.float32:
        from ..pallas.bandchol import band_factor, band_factor2, band_solve

        SB = band.sb
        band_arr = jnp.zeros(((Pa + SB) * SB, 36), jnp.float32)
        band_arr = band_arr.at[brow * SB + (bcol - brow)].set(
            bl_s.astype(jnp.float32)
        )
        if SB * 6 <= 128:
            Lb = band_factor2(band_arr, Pa, SB)
        else:
            Lb = band_factor(band_arr, Pa, SB, band.bw)

        def tri_solve(r):
            x32 = band_solve(
                Lb, r.astype(jnp.float32), Pa, SB, band.bw
            )
            return x32.astype(dtype)

    else:
        # block-flat scatter first (13.5k-row scatters are ~4 ms), then one
        # reshape-transpose to scalar layout — the 4D scatter into
        # [Pa,6,Pa,6] lowers ~10x slower than this on v5e
        vals = bl_s.astype(target)
        mirror = jnp.where(
            off[:, None],
            vals.reshape(nnz, 6, 6).swapaxes(-1, -2).reshape(nnz, 36),
            jnp.zeros_like(vals),
        )
        flat = jnp.zeros((Pa * Pa, 36), target)
        flat = flat.at[brow * Pa + bcol].add(vals)
        flat = flat.at[bcol * Pa + brow].add(mirror)
        A = flat.reshape(Pa, Pa, 6, 6).transpose(0, 2, 1, 3).reshape(
            Pa * 6, Pa * 6
        )

        L = jnp.linalg.cholesky(A)

        def tri_solve(r):
            y = solve_triangular(L, r.reshape(-1).astype(target), lower=True)
            x = solve_triangular(L.T, y, lower=False)
            return x.astype(dtype).reshape(Pa, 6)

    x = tri_solve(bv)
    if target == dtype:
        # direct solve in the working precision: success = finite pivots
        # (zero-pivot analogue, /root/reference/src/cholesky.hpp:59-92)
        return x * s, jnp.all(jnp.isfinite(x))

    # f32 MXU factorization + f64 refinement (f64 Cholesky on TPU is emulated
    # and ~60x slower: 964 ms vs 15 ms at n = 7932 on v5e).  Three rounds of
    # refinement recover ~1e-12 relative accuracy for LM-damped systems.
    offm = off.astype(dtype)[:, None]

    def matvec(xv):  # symmetric block SpMV in the scaled space, f64
        if row_plan is not None:
            from .segments import reduce_rows, reduce_rows_f64_packed

            y = reduce_rows(flat_mv_6x6(bl_s, xv[bcol]), row_plan)
            return y + reduce_rows(flat_mtv_6x6(bl_s * offm, xv[brow]), col_plan)
        y = segment_sum(flat_mv_6x6(bl_s, xv[bcol]), brow, num_segments=Pa)
        return y + segment_sum(
            flat_mtv_6x6(bl_s * offm, xv[brow]), bcol, num_segments=Pa
        )

    # two rounds suffice for LM-damped, Jacobi-scaled systems (~1e-11 rel;
    # each round contracts the error by ~kappa_scaled * 2^-24 ~ 1e-4) — the
    # residual check below still REJECTS any solve the trim would hurt, so
    # correctness semantics are unchanged (LM re-damps, like the reference's
    # zero-pivot path)
    for _ in range(2):
        x = x + tri_solve(bv - matvec(x))

    # success requires an actually-converged refinement, not just finiteness:
    # if cond(A) defeats the f32 factorization the LM loop re-damps (exactly
    # like the reference treats a zero-pivot, cuda_linear_solver.cpp:48-52)
    res = jnp.linalg.norm(bv - matvec(x))
    ok = jnp.isfinite(res) & (res <= 1e-8 * (jnp.linalg.norm(bv) + 1e-300))
    xp = x * s
    return xp, ok & jnp.all(jnp.isfinite(xp))


def schur_reduce(
    sys: SystemBlocks,
    lam: jnp.ndarray,
    plan: SchurPlan,
    num_active_poses: int,
    num_active_landmarks: int,
    nnz_blocks: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Stage "4: Schur Complement": damp, invert Hll blocks, form
    ``bsc = bp - Hpl inv(Hll) bl`` and the Hsc blocks
    ``(Hpp + lam I) - Hpl inv(Hll) Hpl^T`` on the sparse block pattern.

    Math parity with gpu::computeBschure / computeHschure
    (cuda_block_solver.cu:1286-1345); returns ``(blocks, bsc, invHll)``.
    """
    from ..ops.components import (
        flat_mm_6x3_3x3,
        flat_mv_6x3,
        flat_sym3x3_inv,
    )
    from .segments import (
        reduce_pair_products,
        reduce_rows,
        reduce_rows_f64_packed,
    )

    Pa = num_active_poses
    dtype = sys.bp.dtype
    Hpp_d = add_lambda(sys.Hpp, lam)
    # landmark-side damped inversion: the lminv Pallas kernel on the
    # component-major copy (terms-kernel path; [La, k] row-major forms run
    # as [La,1]-column f64 emulation chains with per-iteration loop copies —
    # pallas/lminv.py docstring); invHll is then the (hi, lo) f32 pair the
    # pairprod/back-substitution kernels consume directly.
    import os as _os

    use_lminv = (
        plan is not None
        and plan.layout is not None
        and getattr(plan.layout, "terms_kernel", False)
        and sys.lm_cm is not None
        and not _os.environ.get("TBA_DISABLE_LMINV_KERNEL")
    )
    if use_lminv:
        from ..pallas.lminv import lminv_call

        inv_h, inv_l, y_h, y_l = lminv_call(sys.lm_cm, lam)
        invHll = (inv_h, inv_l)
    else:
        diag9 = jnp.zeros((9,), dtype).at[jnp.array([0, 4, 8])].set(1.0)
        Hll_d = sys.Hll + lam * diag9
        invHll = flat_sym3x3_inv(Hll_d)  # [La,9] flat

    # triple products Hsc[k] -= W[ei] Hpl[ej]^T with W = Hpl inv(Hll).
    # Grouped kernel path: W forms INSIDE the pair-product kernel from Hpl
    # and inv(Hll) splits (pallas/pairprod.py v2) — the ~1 GB padded f64 W
    # array never materialises — and the bsc correction re-associates as
    # Hpl @ (inv(Hll) bl) so it needs no W either.  Fallback: materialised
    # W + scatter-free bucketed contractions over all T triples (reference:
    # one-thread-per-triple atomics, cuda_block_solver.cu:1327-1345).
    if plan.layout is not None and plan.layout.use_kernel:
        from ..ops.components import flat_mv_3x3
        from ..pallas.pairprod import schur_pair_rows_packed, schur_pair_rows_v2

        y = (y_h, y_l) if use_lminv else flat_mv_3x3(invHll, sys.bl)
        # optimization_barrier (both branches): this f64 product is the only
        # per-trial f64 consumer of Hpl, and XLA's float-float mul emulation
        # contains is-finite/inf-handling subexpressions of the Hpl operand
        # alone.  Because Hpl is invariant across the inner damping trials,
        # LICM hoists those as ~[E,1] pred/f32 buffers carried through the
        # inner while loop — ten S(1)<->HBM round-trips per iteration,
        # ~10 ms/iter in the device trace (tools/trace_fused.py).  The
        # barrier pins the emulation inside the trial where it fuses with
        # the mul for free.  (The pairprod path's hi/lo SPLITS of Hpl stay
        # un-barriered: that hoist is the good kind.)
        if getattr(plan.layout, "terms_kernel", False):
            # Hpl arrives ff-packed component-major from pallas/terms.py;
            # the per-edge product runs as the Pallas class kernel on the
            # (hi, lo) halves (pallas/schurvec.py) — the former XLA f64
            # form was a [1, E]-tiled emulation swarm, ~2 ms/iteration
            from .segments import reduce_rows_ff_cmajor

            rows12 = _bsc_rows_kernel_ff(sys.Hpl, y, plan, dtype)
            bsc = sys.bp - reduce_rows_ff_cmajor(
                rows12, plan.bsc_plan, dtype
            ).T
            if use_lminv:
                # invHll is already the (hi, lo) pair — skip the transpose
                # + re-split schur_pair_rows_packed would do per trial
                from ..pallas.pairprod import _pair_rows_from_splits

                rows = _pair_rows_from_splits(
                    sys.Hpl[:18], sys.Hpl[18:], inv_h, inv_l, plan
                )
            else:
                rows = schur_pair_rows_packed(sys.Hpl, invHll, plan)
        else:
            bsc_rows = flat_mv_6x3(
                jax.lax.optimization_barrier(sys.Hpl), _lm_slot_expand(y, plan)
            )
            bsc = sys.bp - reduce_rows_f64_packed(
                _pose_chunk_presum(bsc_rows, plan), plan.bsc_plan
            )
            rows = schur_pair_rows_v2(sys.Hpl, invHll, plan)  # [n, 72] packed
        if plan.fix_rows is not None and plan.fix_rows.shape[0]:
            # pairs hitting a diagonal block via duplicate poses need the
            # transposed product added too (densify never mirrors the
            # diagonal; see symbolic.py:117-128); transpose BOTH ff halves
            t36 = np.arange(36).reshape(6, 6).T.reshape(-1)
            t72 = jnp.asarray(
                np.concatenate([t36, 36 + t36]), jnp.int32
            )
            rows = jnp.concatenate(
                [rows, rows[plan.fix_rows][:, t72]], axis=0
            )
        from .segments import reduce_rows_ff

        blocks = -reduce_rows_ff(rows, plan.outk_plan, dtype)
    else:
        # per-edge W; under the group layout the ib "gather" is d stacked
        # slice copies per class, otherwise one row gather of the combined
        # [La,12] table (TPU gather cost is per-row, not per-byte)
        tbl = jnp.concatenate([invHll, sys.bl], axis=1)  # [La,12]
        if plan.layout is not None:
            ib = _lm_slot_expand(tbl, plan)
        else:
            ib = tbl[plan.ba_lm_idx]  # [E,12]
        W = flat_mm_6x3_3x3(sys.Hpl, ib[:, :9])  # [E,18]
        bsc_rows = flat_mv_6x3(W, ib[:, 9:])
        if plan.layout is not None:
            bsc_rows = _pose_chunk_presum(bsc_rows, plan)
        bsc = sys.bp - reduce_rows_f64_packed(bsc_rows, plan.bsc_plan)
        blocks = -reduce_pair_products(W, sys.Hpl, plan.tri_plan)
    blocks = blocks.at[plan.diag_pos].add(Hpp_d.reshape(Pa, 36))
    return blocks, bsc, invHll


def schur_back_substitute(
    sys: SystemBlocks,
    invHll: jnp.ndarray,
    xp: jnp.ndarray,
    plan: SchurPlan,
    num_active_poses: int,
) -> jnp.ndarray:
    """Landmark back-substitution ``xl = inv(Hll)(bl - Hpl^T xp)``
    (gpu::schurComplementPost, cuda_block_solver.cu:1419-1442)."""
    from ..ops.components import flat_mtv_6x3, flat_mv_3x3
    from .segments import reduce_rows, reduce_rows_f64_packed

    Pa = num_active_poses
    if plan.layout is not None and getattr(plan.layout, "terms_kernel", False):
        # packed-Hpl path: the per-edge Hpl^T xp product runs as the Pallas
        # class kernel on the (hi, lo) halves (pallas/schurvec.py), already
        # slot-summed per landmark
        acc = _backsub_lm_sum_kernel_ff(
            sys.Hpl, xp, plan, Pa, sys.bl.shape[0], sys.bl.dtype
        )
        if isinstance(invHll, tuple):
            # lminv path: keep the whole chain component-major and in the
            # kernels — cl [3, La] cm, xl = inv @ cl via the mv kernel, ONE
            # transpose of the final [3, La] result back to row-major
            from ..pallas.lminv import sym3x3_mv_call
            from ..pallas.terms import split_ff

            cl_cm = sys.lm_cm[9:12] - acc
            c_h, c_l = split_ff(cl_cm)
            x_h, x_l = sym3x3_mv_call(invHll[0], invHll[1], c_h, c_l)
            dtype = sys.bl.dtype
            return (x_h.astype(dtype) + x_l.astype(dtype)).T
        cl = sys.bl - acc.T
        return flat_mv_3x3(invHll, cl)
    if plan.layout is not None and plan.chunk_pose is not None:
        # chunk members share their slot pose: gather xp once per chunk row
        # and broadcast over members (~Gc x fewer gathered rows)
        lay = plan.layout
        xp_c = xp[jnp.minimum(plan.chunk_pose, Pa - 1)]  # [M, 6]
        parts = []
        off = 0
        for cm in lay.classes:
            rows = cm.d * cm.nc_pad
            seg = jax.lax.slice_in_dim(xp_c, off, off + rows, axis=0)
            parts.append(
                jnp.broadcast_to(
                    seg.reshape(cm.d, 1, cm.nc_pad, 6),
                    (cm.d, cm.gc, cm.nc_pad, 6),
                ).reshape(cm.d * cm.gc * cm.nc_pad, 6)
            )
            off += rows
        if lay.n_extras:
            idx = plan.ba_pose_idx[lay.e_classes :]
            parts.append(xp[jnp.minimum(idx, Pa - 1)])
        xp_e = jnp.concatenate(parts, axis=0)
    else:
        xp_e = xp[jnp.minimum(plan.ba_pose_idx, Pa - 1)]
    # barrier: same per-trial Hpl-emulation hoist as in schur_reduce (see the
    # comment there) — without it the is-finite parts of this mul ride the
    # inner damping loop as copied [E,1] invariants
    contrib = flat_mtv_6x3(jax.lax.optimization_barrier(sys.Hpl), xp_e)
    if plan.layout is not None:
        cl = sys.bl - _lm_slot_sum(contrib, plan, sys.bl.shape[0])
    else:
        cl = sys.bl - reduce_rows_f64_packed(contrib, plan.lm_plan)
    return flat_mv_3x3(invHll, cl)


def solve_schur(
    sys: SystemBlocks,
    lam: jnp.ndarray,
    plan: SchurPlan,
    num_active_poses: int,
    num_active_landmarks: int,
    nnz_blocks: int,
    mixed: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Damp, form the Schur complement, solve for poses, back-substitute
    landmarks (stages "4: Schur Complement" + "6: Numerical Decomposition")."""
    Pa, La = num_active_poses, num_active_landmarks
    blocks, bsc, invHll = schur_reduce(sys, lam, plan, Pa, La, nnz_blocks)
    xp, success = _solve_reduced_blocks(
        blocks, plan.blk_row, plan.blk_col, plan.diag_pos, bsc, Pa, mixed,
        plan.blk_row_plan, plan.blk_col_plan, plan.band, plan.pcg,
    )
    xl = schur_back_substitute(sys, invHll, xp, plan, Pa)
    return xp, xl, success


def solve_pose_only(sys: SystemBlocks, lam: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pose-only path: Hpp is block-diagonal (every edge touches one pose), so
    the damped system solves per 6x6 block — same solution as the reference's
    densified cuSOLVER path (cuda_linear_solver.cpp:85-107)."""
    Hpp_d = add_lambda(sys.Hpp, lam)
    xp = block_diag_solve(Hpp_d, sys.bp)
    return xp, jnp.all(jnp.isfinite(xp))


def apply_update(
    graph: GraphArrays,
    xp: jnp.ndarray,
    xl: Optional[jnp.ndarray],
    num_active_poses: int,
    num_active_landmarks: int,
) -> GraphArrays:
    """SE3-exp left-compose pose update + additive landmark update (stage
    "7: Update Solution"; cuda_block_solver.cu:1444-1469)."""
    Pa, La = num_active_poses, num_active_landmarks
    dq, dt = se3_exp(xp)
    q_new, t_new = se3_update_left(dq, dt, graph.q[:Pa], graph.t[:Pa])
    q = jnp.concatenate([q_new, graph.q[Pa:]], axis=0)
    t = jnp.concatenate([t_new, graph.t[Pa:]], axis=0)
    if xl is not None and La > 0:
        Xw = jnp.concatenate([graph.Xw[:La] + xl, graph.Xw[La:]], axis=0)
    else:
        Xw = graph.Xw
    return GraphArrays(q=q, t=t, Xw=Xw)


def compute_scale(
    xp: jnp.ndarray,
    xl: Optional[jnp.ndarray],
    sys: SystemBlocks,
    lam: jnp.ndarray,
) -> jnp.ndarray:
    """LM gain-ratio denominator ``sum x (lam x + b)``
    (cuda_block_solver.cu:1471-1490)."""
    s = jnp.sum(xp * (lam * xp + sys.bp))
    if xl is not None and sys.bl is not None:
        s = s + jnp.sum(xl * (lam * xl + sys.bl))
    return s


# ---------------------------------------------------------------------------
# host orchestration
# ---------------------------------------------------------------------------


class BlockSolver:
    """Owns packed device arrays, the symbolic structure and compiled stages."""

    def __init__(self, options):
        self.options = options
        if options.dtype == "float64" and not jax.config.jax_enable_x64:
            # the f64 default is meaningless without x64; opt in on behalf of
            # the user (JAX would otherwise silently truncate to f32)
            jax.config.update("jax_enable_x64", True)
        self.dtype = jnp.float64 if options.dtype == "float64" else jnp.float32
        self.mixed = (
            getattr(options, "solver_precision", "mixed") == "mixed"
            and options.dtype == "float64"
        )
        self.graph: Optional[GraphArrays] = None
        self.packed: tuple[PackedEdges, ...] = ()
        self.metas: tuple[EdgeSetMeta, ...] = ()
        self.Pa = 0  # active pose count
        self.La = 0  # active landmark count (incl. layout padding slots)
        self.La_real = 0  # active landmarks before layout padding
        self.group_layout = None  # GroupLayout | None (fast array path)
        self.P = 0
        self.L = 0
        self.do_schur = False
        self.schur: Optional[SchurStructure] = None
        self.plan: Optional[SchurPlan] = None
        self.pose_perm = None  # RCM pose order (array path); None = identity
        self.symbolic_ms = 0.0
        self._fns = None
        self._pose_set: Optional[PoseVertexSet] = None
        self._lm_set: Optional[LandmarkVertexSet] = None
        self._pose_sets: list[PoseVertexSet] = []
        self._lm_sets: list[LandmarkVertexSet] = []
        self._obj_Pa = 0
        self._obj_La = 0
        self._edge_sets: list[EdgeSet] = []
        self._host_idx: list[tuple[np.ndarray, np.ndarray]] = []
        self._cp_host = None  # chunk-pose table (host/device): pose expand
        self._cp_dev = None  # plans run over chunk rows, not edges
        self._spec_thresholds: list = []  # array path: per-spec outlier thr
        self._outlier_counts: list[int] = []
        self._merged_sizes: list = []  # per packed spec: pre-merge set sizes

    # -- packing ------------------------------------------------------------

    def initialize(self, edge_sets: Sequence[EdgeSet], vertex_sets) -> None:
        """Pack the host graph into device arrays (stage "0: Initialize").

        Routes through :meth:`initialize_from_arrays` so object-API graphs
        get the same fast path as array problems — co-visibility group
        layout, RCM ordering, mono+stereo merging (round 1 built the layout
        only for array inputs).

        Any number of pose and landmark vertex sets is supported (the
        reference iterates arbitrary vertex sets, block_solver.cpp:34,62-77):
        sets concatenate into one global table with active-first indexing
        ACROSS sets (all active vertices of every set first, then all fixed
        ones), and ``Vertex.index`` is reassigned to the global index."""
        pose_sets = [v for v in vertex_sets if not v.is_marginilised()]
        lm_sets = [v for v in vertex_sets if v.is_marginilised()]
        if not pose_sets:
            raise ValueError("BlockSolver requires at least one pose vertex set")
        live_sets = [es for es in edge_sets if es.nedges() > 0]

        def reindex(sets):
            """Global active-first index assignment over several sets
            (vectorised; covers object AND bulk vertices)."""
            for vs in sets:
                vs.generate_estimate_data()
            acts = [vs.get_active_size() for vs in sets]
            tots = [vs.total_size() for vs in sets]
            na = sum(acts)
            act_off, fix_off = 0, na
            for vs, a, tot in zip(sets, acts, tots):
                gmap = np.empty(tot, dtype=np.int64)
                gmap[:a] = act_off + np.arange(a)
                gmap[a:] = fix_off + np.arange(tot - a)
                vs.assign_global_indices(gmap)
                act_off += a
                fix_off += tot - a
            return na, sum(tots)

        Pa, P = reindex(pose_sets)
        q = np.empty((P, 4), dtype=np.float64)
        t = np.empty((P, 3), dtype=np.float64)
        for vs in pose_sets:
            qs, ts = vs.estimates_array()  # per-set order
            q[vs._gmap] = qs
            t[vs._gmap] = ts

        La, L = reindex(lm_sets) if lm_sets else (0, 0)
        Xw = np.empty((L, 3), dtype=np.float64)
        for vs in lm_sets:
            Xw[vs._gmap] = vs.estimates_array()

        # the spec builder reads the vertex sets for bulk id lookups
        self._pose_sets = pose_sets
        self._lm_sets = lm_sets
        self._pose_set = pose_sets[0] if len(pose_sets) == 1 else None
        self._lm_set = lm_sets[0] if len(lm_sets) == 1 else None
        self._obj_Pa, self._obj_La = Pa, La
        specs = [self._spec_from_edge_set(es) for es in live_sets]
        self.initialize_from_arrays(
            pose_q=q, pose_t=t, num_active_poses=Pa,
            landmarks=Xw, num_active_landmarks=La, edge_specs=specs,
        )
        # restore the object references initialize_from_arrays cleared so
        # finalize()/update_edges() can write back into the graph objects
        self._pose_sets = pose_sets
        self._lm_sets = lm_sets
        self._pose_set = pose_sets[0] if len(pose_sets) == 1 else None
        self._lm_set = lm_sets[0] if len(lm_sets) == 1 else None
        self._edge_sets = live_sets

    def initialize_from_arrays(
        self,
        pose_q: np.ndarray,
        pose_t: np.ndarray,
        num_active_poses: int,
        landmarks: np.ndarray,
        num_active_landmarks: int,
        edge_specs: Sequence[dict],
    ) -> None:
        """Fast packing path: build device state directly from arrays, skipping
        per-edge Python objects (used by benchmarks and the distributed layer).

        Each ``edge_spec`` dict has keys: ``kind, meas [E,K], pose_idx [E],
        lm_idx [E], omega [E], cam ([5] or [E,5])`` and optional ``rk, delta``.
        """
        self._pose_set = None
        self._lm_set = None
        self._pose_sets = []
        self._lm_sets = []
        self._edge_sets = []
        self._host_idx = []
        self._cp_host = None
        self._cp_dev = None
        self._spec_thresholds = []
        self._outlier_counts = []
        self._merged_sizes = []
        dt = self.dtype

        # mono+stereo sets merge into ONE masked stereo set so the
        # co-visibility group layout (and with it the whole fast path)
        # covers the reference's real input shape — both edge lists at once
        # (samples/sample_ba_from_file/main.cpp:121-165)
        edge_specs = _merge_ba_specs(edge_specs)

        self.P = pose_q.shape[0]
        self.Pa = int(num_active_poses)
        self.L = landmarks.shape[0]
        self.La = int(num_active_landmarks)
        self.La_real = self.La
        self.group_layout = None
        self.do_schur = self.La > 0
        landmarks = np.asarray(landmarks, dtype=np.float64).reshape(-1, 3)

        # structure cache: everything derived from the index arrays alone
        # (RCM perm, group layout, later the whole SchurPlan) is reused
        # across solver instances with identical structure
        self._struct_bundle = _struct_bundle(
            _struct_digest(edge_specs, self.P, self.Pa, self.L, self.La)
        )
        bundle = self._struct_bundle

        # bandwidth-reducing pose ordering (solver/ordering.py): loop-closure
        # graphs regain the banded fast solve; trajectory graphs keep the
        # identity order (bit-exact traces unchanged)
        self.pose_perm = None
        if self.La > 0 and all(
            MODEL_REGISTRY[sp["kind"]].HAS_LANDMARK for sp in edge_specs
        ):
            from .ordering import plan_pose_order

            if "pose_perm" in bundle:
                perm = bundle["pose_perm"]
            else:
                all_pi = np.concatenate(
                    [np.asarray(sp["pose_idx"]) for sp in edge_specs]
                )
                all_li = np.concatenate(
                    [np.asarray(sp["lm_idx"]) for sp in edge_specs]
                )
                perm, bw0, bw1 = plan_pose_order(
                    all_pi, all_li, self.Pa, self.La
                )
                bundle["pose_perm"] = perm
            if perm is not None:
                self.pose_perm = perm  # perm[i] = old pose at new position i
                new_of_old = np.empty(self.Pa, dtype=np.int64)
                new_of_old[perm] = np.arange(self.Pa)
                pose_q = np.concatenate(
                    [np.asarray(pose_q)[perm], np.asarray(pose_q)[self.Pa :]]
                )
                pose_t = np.concatenate(
                    [np.asarray(pose_t)[perm], np.asarray(pose_t)[self.Pa :]]
                )
                remapped = []
                for sp in edge_specs:
                    pi = np.asarray(sp["pose_idx"], dtype=np.int64)
                    pi = np.where(
                        pi < self.Pa,
                        new_of_old[np.minimum(pi, self.Pa - 1)],
                        pi,
                    )
                    remapped.append(dict(sp, pose_idx=pi))
                edge_specs = remapped

        # co-visibility group layout (solver/groups.py): reorders edges
        # slot-major and renumbers free landmarks so every landmark-indexed
        # reduction becomes contiguous slices and the Schur product runs as
        # grouped dense pair products.  Single BA edge set only (the layout
        # interleaves a landmark's observations; multiple sets would need one
        # globally-ordered array, which per-set packing cannot produce).
        use_layout = (
            len(edge_specs) == 1
            and self.La > 0
            and MODEL_REGISTRY[edge_specs[0]["kind"]].HAS_LANDMARK
        )
        if use_layout:
            from .groups import build_group_layout

            spec = edge_specs[0]
            lay = self._struct_bundle.get("layout")
            if lay is None:
                pose_idx0 = np.asarray(spec["pose_idx"], dtype=np.int64)
                lm_idx0 = np.asarray(spec.get("lm_idx"), dtype=np.int64)
                lay = build_group_layout(pose_idx0, lm_idx0, self.Pa, self.La)
                self._struct_bundle["layout"] = lay
            self.group_layout = lay
            la_pad = lay.meta.la_pad

            # landmark state in layout order; dummy slots are inert zero rows
            Xw_new = np.zeros((la_pad + (self.L - self.La), 3), dtype=np.float64)
            real = lay.lm_order >= 0
            Xw_new[: la_pad][real] = landmarks[lay.lm_order[real]]
            Xw_new[la_pad:] = landmarks[self.La :]
            landmarks = Xw_new
            self.L = Xw_new.shape[0]
            self.La = la_pad

        # -- content-addressed upload cache ---------------------------------
        # Re-optimising identical DATA (same measurement/weight/state bytes)
        # reuses the device-resident arrays outright: behind the axon tunnel
        # the packed-edge upload is the single largest initialize cost
        # (~13 MB -> ~340 ms at KITTI-00 scale), and the windowed-SLAM /
        # benchmark re-run pattern re-ships unchanged bytes every time.
        # Content digests make reuse exact (any byte change misses); device
        # arrays are immutable (no donation anywhere in this codebase), so
        # sharing across solver instances is safe.  TBA_DISABLE_UPLOAD_CACHE=1
        # rolls back to always-upload.
        import os as _os

        bundle = self._struct_bundle
        upload_cache = not _os.environ.get("TBA_DISABLE_UPLOAD_CACHE")

        def _data_digest(tag, arrays):
            import hashlib

            h = hashlib.blake2b(digest_size=16)
            h.update(tag.encode())
            h.update(str(dt).encode())
            for a in arrays:
                if a is None:
                    h.update(b"<none>")
                    continue
                a = np.asarray(a)
                h.update(str(a.dtype).encode() + str(a.shape).encode())
                h.update(np.ascontiguousarray(a).tobytes())
            return h.hexdigest()

        if upload_cache:
            gkey = ("graph", _data_digest("g", [pose_q, pose_t, landmarks]))
            g = bundle.get(gkey)
            if g is None:
                g = GraphArrays(
                    q=jnp.asarray(pose_q, dt),
                    t=jnp.asarray(pose_t, dt),
                    Xw=jnp.asarray(landmarks, dt),
                )
                bundle[gkey] = g
            self.graph = g
        else:
            self.graph = GraphArrays(
                q=jnp.asarray(pose_q, dt),
                t=jnp.asarray(pose_t, dt),
                Xw=jnp.asarray(landmarks, dt),
            )

        data_key = None
        cached_pack = None
        if upload_cache:
            parts = []
            for spec in edge_specs:
                parts.extend([
                    spec["meas"], spec["omega"], spec.get("cam"),
                    spec.get("active"), spec.get("mask3"),
                    np.asarray(spec.get("outlier_threshold", 0.0)),
                    np.asarray([
                        int(spec.get("rk", 0)),
                        float(spec.get("delta", 1.0)),
                    ]),
                ])
            data_key = ("packed", _data_digest("p", parts))
            cached_pack = bundle.get(data_key)
            if cached_pack is not None:
                edge_specs = ()  # skip the packing loop entirely

        packed, metas = [], []
        for spec in edge_specs:
            kind = spec["kind"]
            model = MODEL_REGISTRY[kind]
            meas = np.asarray(spec["meas"], dtype=np.float64)
            E = meas.shape[0]
            pose_idx = np.asarray(spec["pose_idx"], dtype=np.int32)
            lm_idx = np.asarray(spec.get("lm_idx", np.zeros(E)), dtype=np.int32)
            omega = np.asarray(spec["omega"], dtype=np.float64)
            cam = np.asarray(spec.get("cam", np.zeros(5)), dtype=np.float64)
            if cam.ndim == 1:
                cam = cam.reshape(1, 5)
            mask3 = spec.get("mask3")
            if mask3 is not None:
                mask3 = np.asarray(mask3, dtype=np.float64)
            thr = spec.get("outlier_threshold", 0.0)
            active = np.asarray(
                spec.get("active", np.ones(E)), dtype=np.float64
            )
            self._merged_sizes.append(spec.get("merged_sizes"))
            # uniform omega / camera collapse to broadcastable single rows —
            # the device arrays stay [1] / [5,1] and never pay the ~44 MB
            # upload (the reference's global-vs-per-edge trade,
            # graph_optimisation_options.h:8-19, decided automatically here)
            if omega.size and np.all(omega == omega[0]):
                omega = omega[:1]
            if cam.shape[0] > 1 and np.all(cam == cam[0]):
                cam = cam[:1]

            native_pack = None
            if self.group_layout is not None:
                lay = self.group_layout
                perm = lay.edge_perm
                # layout order has dummy rows -> per-edge active is required;
                # broadcast the size-1 "all edges share one flag" shorthand
                # here so BOTH pack paths (native C++ and the numpy _take
                # fallback) see a full-length mask
                if active.size == 1 and E > 1:
                    active = np.full(E, float(active.reshape(-1)[0]))
                if isinstance(thr, np.ndarray) or cam.shape[0] > 1:
                    pass  # per-edge thresholds/cameras keep the numpy path
                else:
                    # fused C++ pack (native/layout.cpp tba_pack_edges):
                    # all the gathers + renumber + dummy fills below in ONE
                    # pass, emitting component-major meas and the 1-byte /
                    # int16 upload payloads directly
                    from .native_layout import native_pack_edges

                    lm_tbl = np.concatenate([
                        lay.lm_renumber,
                        self.La + np.arange(self.L - self.La, dtype=np.int64),
                    ])
                    native_pack = native_pack_edges(
                        lay,
                        meas,
                        omega if omega.size > 1 else None,
                        active,
                        mask3,
                        pose_idx,
                        lm_idx,
                        lm_tbl,
                        self.Pa,
                        M_out=meas.shape[1],
                        use_int16=self.P + 1 < 2**15,
                    )
                if native_pack is not None:
                    measT_h, omega_pk, active_i8, mask3_i8, pose_up, lm_i32 = (
                        native_pack
                    )
                    if omega_pk is not None:
                        omega = omega_pk
                    pose_idx = pose_up.astype(np.int32, copy=False)
                    lm_idx = lm_i32
                    nedges_pk = int(active_i8.sum())
                    E = perm.size
                else:
                    dummy = perm < 0
                    src = np.where(dummy, 0, perm)

                    def _take(a, fill=0.0):
                        out = a[src]  # fancy indexing already copies
                        out[dummy] = fill
                        return out

                    meas = _take(meas)
                    if omega.size > 1:
                        omega = _take(omega)
                    if cam.shape[0] > 1:
                        cam = _take(cam)
                    if mask3 is not None:
                        mask3 = _take(mask3)
                    if isinstance(thr, np.ndarray):
                        thr = _take(thr)
                    active = _take(active)
                    # dummy rows: pose sentinel Pa — NOTE the safety here
                    # comes from the active=0/both_free=0 masks zeroing every
                    # downstream contribution, NOT from the one-hot window
                    # (when P <= 8192 the window covers the whole table, so
                    # index Pa reads the first FIXED pose's real state).
                    # Landmark id = the slot's own position so landmark
                    # windows stay tight
                    pose_idx = _take(pose_idx).astype(np.int32, copy=False)
                    pose_idx[dummy] = self.Pa
                    new_lm = np.where(
                        lm_idx < self.La_real,
                        lay.lm_renumber[np.minimum(lm_idx, self.La_real - 1)],
                        lm_idx.astype(np.int64) - self.La_real + self.La,
                    )
                    lm_idx = new_lm[src].astype(np.int32)
                    # dummy landmark index = the dummy slot's own position
                    pos_in_class = np.full(perm.size, 0, dtype=np.int32)
                    for cm in lay.meta.classes:
                        S = cm.gc * cm.nc_pad
                        span = cm.d * S
                        sl = slice(cm.e_start, cm.e_start + span)
                        pos_in_class[sl] = (
                            cm.lm_start
                            + (np.arange(span, dtype=np.int64) % S)
                        ).astype(np.int32)
                    lm_idx[dummy] = pos_in_class[dummy]
                    E = perm.size

            if self.group_layout is not None and self._cp_host is None:
                # the chunk-pose table is reused as the pose expand plan's
                # device indices (_attach_expand_plans): keep host + device
                # (device copy cached with the layout — saves the upload on
                # identical-structure re-initialisation).  Layout-derived
                # only, so BOTH pack paths (native C++ and the numpy _take
                # fallback) must set it — without it the pose expand plan
                # degrades to per-edge-slot granularity (~Gc x more one-hot
                # work per iteration, measured ~6 ms/iter at KITTI-00 scale)
                cp_i32 = np.where(
                    self.group_layout.chunk_pose < 0,
                    self.Pa,
                    self.group_layout.chunk_pose,
                ).astype(np.int32)
                self._cp_host = cp_i32
                if "cp_dev" in self._struct_bundle:
                    self._cp_dev = self._struct_bundle["cp_dev"]
                else:
                    self._cp_dev = jnp.asarray(cp_i32)
                    self._struct_bundle["cp_dev"] = self._cp_dev
            if native_pack is not None:
                lay_ = self.group_layout
                n_cls = lay_.meta.e_classes
                ex_pose_up = (
                    pose_up[n_cls:].astype(np.int16)
                    if self.P + 1 < 2**15
                    else pose_up[n_cls:].astype(np.int32)
                )
                if dt == jnp.float32:
                    # f32 solve mode: cast the dominant upload on the host —
                    # bit-identical to the on-device cast and half the bytes
                    measT_h = measT_h.astype(np.float32)
                (measT, camT, pose_idx_dev, lm_idx_dev, both_free,
                 active_dev, mask3_dev) = _pack_device_cm_derived(
                    jnp.asarray(measT_h),
                    jnp.asarray(cam),
                    self._cp_dev,
                    jnp.asarray(ex_pose_up),
                    jnp.asarray(lm_idx[n_cls:]),
                    jnp.asarray(active_i8),
                    None if mask3_i8 is None else jnp.asarray(mask3_i8),
                    lay_.meta.classes,
                    self.Pa,
                    self.La,
                    dt,
                )
            else:
                # upload diet + one packing dispatch (see _pack_device); pose
                # indices ship as int16 when they fit (halves that upload)
                pi_up = (
                    pose_idx.astype(np.int16)
                    if self.P + 1 < 2**15
                    else pose_idx
                )
                lm_idx_dev = jnp.asarray(lm_idx)
                measT, camT, pose_idx_dev, both_free, active_dev, mask3_dev = (
                    _pack_device(
                        jnp.asarray(meas),
                        jnp.asarray(cam),
                        jnp.asarray(pi_up),
                        lm_idx_dev,
                        jnp.asarray((active > 0).astype(np.int8)),
                        None if mask3 is None else jnp.asarray(
                            (mask3 > 0).astype(np.int8)
                        ),
                        self.Pa,
                        self.La,
                        dt,
                    )
                )
            data = PackedEdges(
                meas=measT,
                omega=jnp.asarray(omega, dt),
                cam=camT,
                pose_idx=pose_idx_dev,
                lm_idx=lm_idx_dev,
                both_free=both_free,
                active=active_dev,
                mask3=mask3_dev,
            )
            meta = EdgeSetMeta(
                kind=kind,
                rk=int(spec.get("rk", 0)),
                delta=float(spec.get("delta", 1.0)),
                has_landmark=model.HAS_LANDMARK,
                mdim=model.MDIM,
                nedges=(
                    nedges_pk
                    if native_pack is not None
                    else int(np.sum(active > 0)) if active.size > 1 else E
                ),
            )
            packed.append(data)
            metas.append(meta)
            self._spec_thresholds.append(thr)
            self._host_idx.append((pose_idx, lm_idx))
        if cached_pack is not None:
            (self.packed, self.metas, hi, th, ms, self._cp_host,
             self._cp_dev) = cached_pack
            self._host_idx = list(hi)
            self._spec_thresholds = list(th)
            self._merged_sizes = list(ms)
        else:
            self.packed = tuple(packed)
            self.metas = tuple(metas)
            if data_key is not None:
                bundle[data_key] = (
                    self.packed, self.metas, tuple(self._host_idx),
                    tuple(self._spec_thresholds), tuple(self._merged_sizes),
                    self._cp_host, self._cp_dev,
                )
        self._fns = None

    def _spec_from_edge_set(self, es: EdgeSet) -> dict:
        """Build an array spec from an object edge set (the Arena-pack
        analogue, optimisable_graph.hpp:475-601).  Per-edge objects are
        extracted row by row; ``add_edges_bulk`` data passes straight
        through (vectorised id -> index lookup)."""
        opts = self.options

        E_obj = len(es.edges)
        if es.KIND in ("mono", "stereo", "depth"):
            K = es.MDIM
            if E_obj == 0:
                meas_obj = np.zeros((0, K), dtype=np.float64)
            else:
                # one-pass batch conversion (list -> one C-level np.array);
                # the per-row asarray/reshape loop costs 2.5x more at 100k
                # edges. Fallback covers ragged shapes ((K,1) mixed with
                # (K,), lists, etc.) the reshape cannot absorb uniformly.
                try:
                    meas_obj = np.array(
                        [e.measurement for e in es.edges], dtype=np.float64
                    ).reshape(E_obj, K)
                except (ValueError, TypeError):
                    meas_obj = np.zeros((E_obj, K), dtype=np.float64)
                    for i, edge in enumerate(es.edges):
                        meas_obj[i] = np.asarray(
                            edge.measurement, dtype=np.float64
                        ).reshape(K)
        else:
            vecs = [e.measurement.to_vec() for e in es.edges]
            K = 10 if es.KIND == "line" else 7
            meas_obj = (
                np.stack(vecs, axis=0) if vecs else np.zeros((0, K))
            )

        info_obj = np.fromiter(
            (e.information for e in es.edges), np.float64, E_obj
        )
        # Guard against the silent degenerate system the reference only
        # half-protects against (optimisable_graph.hpp:478-482 asserts the
        # converse): with the global-omega mode active, per-edge information
        # is ignored, so a zero edge-set information plus non-zero per-edge
        # values means the user forgot ``per_edge_information=True``.
        if (
            E_obj > 0
            and not opts.per_edge_information
            and es.information == 0.0
            and np.any(info_obj != 0.0)
        ):
            raise ValueError(
                f"{es.KIND} edge set: edges carry non-zero information but the "
                "edge set's global information is 0 and "
                "GraphOptimisationOptions.per_edge_information is False; either "
                "call edge_set.set_information(...) or enable per-edge "
                "information in the options"
            )

        pose_idx_obj = np.fromiter(
            (e.vertices[0].index for e in es.edges), np.int64, E_obj
        )
        if es.NVERTS == 2:
            lm_idx_obj = np.fromiter(
                (e.vertices[1].index for e in es.edges), np.int64, E_obj
            )
        else:
            lm_idx_obj = np.zeros(E_obj, dtype=np.int64)
        if opts.per_edge_information:
            omega_obj = info_obj
        else:
            omega_obj = np.full(E_obj, es.information)
        active_obj = np.fromiter(
            (e.is_active for e in es.edges), np.bool_, E_obj
        ).astype(np.float64)

        global_cam = es.camera.to_vec()
        cam = global_cam
        if opts.per_edge_camera and any(
            e.camera is not None for e in es.edges
        ):
            cam = np.broadcast_to(global_cam, (E_obj, 5)).copy()
            for i, e in enumerate(es.edges):
                if e.camera is not None:
                    cam[i] = e.camera.to_vec()

        meas, pose_idx, lm_idx, omega, active = (
            meas_obj, pose_idx_obj, lm_idx_obj, omega_obj, active_obj,
        )
        b = es._bulk
        if b is not None and b["meas"].shape[0]:
            Eb = b["meas"].shape[0]
            pib = _ids_to_indices(self._pose_sets, b["pose_id"])
            lib = (
                _ids_to_indices(self._lm_sets, b["lm_id"])
                if es.NVERTS == 2 and self._lm_sets
                else np.zeros(Eb, dtype=np.int64)
            )
            ob = (
                b["info"]
                if (opts.per_edge_information and b["info"] is not None)
                else np.full(Eb, es.information)
            )
            # NaN rows = bulk batches added without explicit information:
            # they take the edge set's global at pack time (graph.py)
            ob = np.where(np.isnan(ob), es.information, ob)
            meas = np.concatenate([meas, b["meas"]], axis=0)
            pose_idx = np.concatenate([pose_idx, pib])
            lm_idx = np.concatenate([lm_idx, lib])
            omega = np.concatenate([omega, ob])
            active = np.concatenate([active, b["active"].astype(np.float64)])
            if cam.ndim == 2:
                cam = np.concatenate(
                    [cam, np.broadcast_to(global_cam, (Eb, 5))], axis=0
                )

        # edges whose vertices are ALL fixed contribute nothing: mask them
        # (the reference drops them at pack time, optimisable_graph.hpp:487-504)
        # _obj_Pa/_obj_La are the GLOBAL active counts across all vertex sets
        # (active-first global indexing, see initialize()).
        Pa = self._obj_Pa
        La = self._obj_La if es.NVERTS == 2 else 0
        if es.NVERTS == 1:
            all_fixed = pose_idx >= Pa
        else:
            all_fixed = (pose_idx >= Pa) & (lm_idx >= La)
        active = np.where(all_fixed, 0.0, active)
        es._active_edge_size = int(np.sum(~all_fixed))

        return dict(
            kind=es.KIND,
            meas=meas,
            pose_idx=pose_idx,
            lm_idx=lm_idx,
            omega=omega,
            cam=cam,
            rk=int(es.robust_kernel_type),
            delta=float(es.robust_delta),
            active=active,
            outlier_threshold=float(es.outlier_threshold),
        )

    # -- structure ------------------------------------------------------------

    def build_structure(self) -> None:
        """Host symbolic analysis (stages "1: Build Structure" +
        "5: Symbolic Decomposition").  Pure host work: indices come from the
        numpy copies kept at packing time, never from device downloads (a
        device->host sync here would stall the pipeline and, behind an RPC
        tunnel, cost seconds)."""
        from .segments import UploadPool, _resolve_plan, build_bucket_plan

        # plan cache: the resolved SchurPlan (including its device-resident
        # plan arrays) depends only on the structure digest + these knobs —
        # identical-structure re-optimisation skips the whole symbolic pass
        # AND the plan upload (~1-2 tunnel RTTs + tens of ms host work)
        bundle = getattr(self, "_struct_bundle", None)
        knobs = self._plan_knobs()
        if (
            bundle is not None
            and "plan" in bundle
            and bundle.get("plan_knobs") == knobs
        ):
            self.schur = bundle["schur"]
            self.plan = bundle["plan"]
            self.symbolic_ms = 0.0
            self._attach_expand_plans()
            self._compile()
            return

        self._attach_expand_plans()
        if not self.do_schur:
            self.schur = None
            self.plan = None
            if bundle is not None:
                bundle["plan_knobs"] = knobs
                bundle["schur"] = None
                bundle["plan"] = None
            self._compile()
            return

        pose_parts, lm_parts = [], []
        for (pose_idx, lm_idx), meta in zip(self._host_idx, self.metas):
            if meta.has_landmark:
                pose_parts.append(pose_idx)
                lm_parts.append(lm_idx)
        ba_pose_idx = (
            np.concatenate(pose_parts) if pose_parts else np.zeros(0, dtype=np.int32)
        )
        ba_lm_idx = (
            np.concatenate(lm_parts) if lm_parts else np.zeros(0, dtype=np.int32)
        )
        all_pose_idx = np.concatenate([p for p, _ in self._host_idx])
        Eba = ba_pose_idx.size

        import time as _time

        lay = self.group_layout
        # TBA_DISABLE_SCHUR_KERNEL=1 forces the bucketed triple-product
        # fallback on TPU — a rollback switch, also used by tools/tpu_parity
        # to compare the Mosaic kernel against the XLA float-float path on
        # identical inputs
        import os as _os

        use_kernel = (
            lay is not None
            and jax.default_backend() != "cpu"
            and not _os.environ.get("TBA_DISABLE_SCHUR_KERNEL")
        )
        # fused linearisation kernel (pallas/terms.py): the projective path
        # with one camera per set — robust kernels included (rho'/rho
        # applied on the kernel's per-edge x output, matching the
        # reference's in-kernel robustification,
        # cuda_block_solver.cu:1188-1197) and f32 mode included (split_ff of
        # an f32 array is (x, 0); the df kernel math then just carries spare
        # compensation).  Per-edge-camera sets keep the (correct, slower)
        # XLA terms path.
        terms_kernel = (
            use_kernel
            and len(self.packed) == 1
            and self.metas[0].kind in ("mono", "stereo")
            and self.packed[0].cam.shape[1] == 1
            and self.packed[0].lm_slot is not None
            and not _os.environ.get("TBA_DISABLE_TERMS_KERNEL")
        )

        t0 = _time.perf_counter()
        kernel_out_ids = None  # rank of each real out_key row, from native
        if use_kernel:
            # the kernel path never reads the triple plan: derive the Hsc
            # pattern straight from the layout's group pair keys instead of
            # enumerating all ~1.7M multiply triples (saves ~250 ms host
            # time per structure)
            real = lay.out_key >= 0
            real_keys = lay.out_key[real]
            from .native_symbolic import native_index

            nat = native_index(real_keys, self.Pa)
            z = np.zeros(0, dtype=np.int32)
            if nat is not None:
                # counting pass over the dense Pa^2 key space (O(T + Pa^2))
                # replaces np.unique + both searchsorted passes (~50 ms at
                # KITTI-00 scale); tri_k doubles as the out_key -> block map
                tri_k, blk_row, blk_col, diag_pos = nat
                kernel_out_ids = (real, tri_k)
                self.schur = SchurStructure(
                    num_poses=self.Pa,
                    num_landmarks=self.La,
                    nnz_blocks=int(blk_row.size),
                    blk_row=blk_row,
                    blk_col=blk_col,
                    diag_pos=diag_pos,
                    tri_ei=z, tri_ej=z, tri_k=z, tri_sorted=True,
                    rowptr=np.zeros(self.Pa + 1, dtype=np.int64),
                    nmul_blocks=int(lay.meta.n_out),
                )
            else:
                diag_keys = np.arange(self.Pa, dtype=np.int64) * (self.Pa + 1)
                keys = np.unique(np.concatenate([real_keys, diag_keys]))
                self.schur = SchurStructure(
                    num_poses=self.Pa,
                    num_landmarks=self.La,
                    nnz_blocks=int(keys.size),
                    blk_row=(keys // self.Pa).astype(np.int32),
                    blk_col=(keys % self.Pa).astype(np.int32),
                    diag_pos=np.searchsorted(keys, diag_keys).astype(np.int32),
                    tri_ei=z, tri_ej=z, tri_k=z, tri_sorted=True,
                    rowptr=np.zeros(self.Pa + 1, dtype=np.int64),
                    nmul_blocks=int(lay.meta.n_out),
                )
        else:
            self.schur = build_schur_structure(
                ba_pose_idx, ba_lm_idx, self.Pa, self.La
            )
        self.symbolic_ms = (_time.perf_counter() - t0) * 1e3
        s = self.schur
        # all int32 plan arrays funnel through ONE batched upload (each
        # isolated transfer behind the axon tunnel pays ~27 ms of latency)
        pool = UploadPool()
        layout_fields = {}
        if lay is not None:
            meta = lay.meta._replace(
                use_kernel=use_kernel, terms_kernel=terms_kernel
            )
            ids = np.full(lay.meta.n_out + lay.fix_rows.size, s.nnz_blocks,
                          dtype=np.int64)
            if kernel_out_ids is not None:
                real, tri_k = kernel_out_ids
                ids[: lay.meta.n_out][real] = tri_k
            else:
                pattern_keys = (
                    s.blk_row.astype(np.int64) * self.Pa + s.blk_col
                )  # sorted ascending by construction (symbolic.py:130-149)
                real = lay.out_key >= 0
                ids[: lay.meta.n_out][real] = np.searchsorted(
                    pattern_keys, lay.out_key[real]
                )
            if lay.fix_rows.size:
                # fix rows point at real out rows, whose ranks are already in
                # ids[:n_out]
                ids[lay.meta.n_out :] = ids[: lay.meta.n_out][lay.fix_rows]
            extra_lm = ba_lm_idx[lay.meta.e_classes :].astype(np.int64)
            layout_fields = dict(
                layout=meta,
                class_a=tuple(pool.add(a) for a in lay.a_lut),
                class_b=tuple(pool.add(b) for b in lay.b_lut),
                outk_plan=build_bucket_plan(ids, s.nnz_blocks, pool=pool),
                fix_rows=pool.add(lay.fix_rows.astype(np.int32)),
                lm_extra_pos=pool.add(extra_lm.astype(np.int32)),
                chunk_pose=pool.add(
                    np.where(lay.chunk_pose < 0, self.Pa, lay.chunk_pose)
                    .astype(np.int32)
                ),
            )

        # banded Hsc -> Pallas band factor/solve (pallas/bandchol.py);
        # guarded by the whole-band-in-VMEM budget and a sane bandwidth
        band_meta = None
        if s.nnz_blocks and jax.default_backend() != "cpu":
            bw = int(np.max(s.blk_col.astype(np.int64) - s.blk_row))
            sb = -(-(bw + 1) // 8) * 8
            vmem = (self.Pa + sb) * sb * 512  # 36->128-lane f32 rows
            if bw + 1 <= 48 and vmem <= 11 * 2**20:
                band_meta = BandMeta(bw=bw, sb=sb)

        # wide pattern at scale (no band even after RCM): preconditioned CG
        # instead of the O(Pa^2)-memory dense build
        pcg_plan = None
        if band_meta is None and s.nnz_blocks and self.Pa >= PCG_MIN_POSES:
            from .pcg import build_pcg_plan

            pcg_plan = build_pcg_plan(s.blk_row, s.blk_col, self.Pa, pool=pool)

        chunked_pose_ids = None
        if lay is not None:
            extra_pose = ba_pose_idx[lay.meta.e_classes :].astype(np.int64)
            chunked_pose_ids = np.concatenate(
                [np.where(lay.chunk_pose < 0, self.Pa, lay.chunk_pose),
                 extra_pose]
            )

        tri_plan = None
        if not use_kernel:
            tri_plan = build_bucket_plan(
                s.tri_k, s.nnz_blocks, payloads=(s.tri_ei, s.tri_ej),
                sentinel=Eba, sorted_ids=s.tri_sorted, pool=pool,
            )
        # the BA index arrays already live on device inside PackedEdges —
        # reuse them (device concat for multi-set) instead of re-uploading
        # another ~7 MB through the tunnel
        ba_idx_dev = [
            (p.pose_idx, p.lm_idx)
            for p, m in zip(self.packed, self.metas)
            if m.has_landmark
        ]
        if len(ba_idx_dev) == 1:
            ba_pose_dev, ba_lm_dev = ba_idx_dev[0]
        elif ba_idx_dev:
            ba_pose_dev = jnp.concatenate([p for p, _ in ba_idx_dev])
            ba_lm_dev = jnp.concatenate([l for _, l in ba_idx_dev])
        else:
            ba_pose_dev = jnp.zeros(0, jnp.int32)
            ba_lm_dev = jnp.zeros(0, jnp.int32)
        plan = SchurPlan(
            ba_pose_idx=ba_pose_dev,
            ba_lm_idx=ba_lm_dev,
            blk_row=pool.add(s.blk_row),
            blk_col=pool.add(s.blk_col),
            diag_pos=pool.add(s.diag_pos),
            tri_plan=tri_plan,
            bsc_plan=build_bucket_plan(
                chunked_pose_ids if lay is not None else ba_pose_idx, self.Pa,
                pool=pool,
            ),
            lm_plan=None if lay is not None else build_bucket_plan(
                ba_lm_idx, self.La, pool=pool
            ),
            pose_plan=build_bucket_plan(
                chunked_pose_ids if lay is not None else all_pose_idx, self.Pa,
                pool=pool,
            ),
            blk_row_plan=build_bucket_plan(
                s.blk_row, self.Pa, sorted_ids=True, pool=pool
            ),
            blk_col_plan=build_bucket_plan(s.blk_col, self.Pa, pool=pool),
            band=band_meta,
            pcg=pcg_plan,
            **layout_fields,
        )
        pool.commit()
        self.plan = _resolve_schur_plan(plan)
        if bundle is not None:
            bundle["plan_knobs"] = knobs
            bundle["schur"] = self.schur
            bundle["plan"] = self.plan
        self._compile()

    def _plan_knobs(self):
        """Static knobs (beyond the index digest) the SchurPlan depends on."""
        import os as _os

        from . import pcg as _pcg

        return (
            jax.default_backend(),
            bool(_os.environ.get("TBA_DISABLE_SCHUR_KERNEL")),
            bool(_os.environ.get("TBA_DISABLE_TERMS_KERNEL")),
            str(self.dtype),
            tuple(int(p.cam.shape[1]) for p in self.packed),
            tuple(m.kind for m in self.metas),
            bool(self.do_schur),
            # PCG plans capture these module constants at build time
            # (pcg.py:94-97); tests monkeypatch them, and a stale cached
            # plan would silently keep the old values
            PCG_MIN_POSES, float(_pcg.CG_TOL), int(_pcg.CG_MAXITER),
        )

    def _attach_expand_plans(self) -> None:
        """Attach Pallas one-hot expansion plans for the per-edge state
        gathers (TPU only; CPU tests keep the XLA gather fallback).  Plans
        require index locality for large tables — ``build_expand_plan``
        returns None without it and the edge set keeps the fallback."""
        if jax.default_backend() == "cpu":
            return
        from ..pallas.onehot import build_expand_plan

        # under the group layout, cover only the class region (slot strides
        # are multiples of 1024, so chunk=1024 windows never straddle a slot
        # boundary); the few extras rows at the tail are gathered by XLA in
        # models._edge_inputs (their landmark ids are scattered and would
        # blow the window bound)
        cov = None
        if self.group_layout is not None:
            cov = self.group_layout.meta.e_classes
        new_packed = []
        for data, (pi, li), meta in zip(self.packed, self._host_idx, self.metas):
            if meta.has_landmark and data.pose_xp is None:
                if self.group_layout is not None and self._cp_dev is not None:
                    # chunk-level plan: one row per (class, slot, chunk);
                    # every member shares that pose, so expand_pose_state
                    # broadcasts the member axis for free (~Gc x less
                    # one-hot work than a per-edge plan).  Layout-derived
                    # only -> cached with the structure bundle.
                    bundle = getattr(self, "_struct_bundle", None)
                    pxp = bundle.get("pose_xp") if bundle is not None else None
                    if pxp is None:
                        pxp = build_expand_plan(
                            self._cp_host, self.P, chunk=1024,
                            device_idx=self._cp_dev,
                        )
                        if bundle is not None and pxp is not None:
                            bundle["pose_xp"] = pxp
                else:
                    pxp = build_expand_plan(
                        pi[:cov], self.P, chunk=1024, device_idx=data.pose_idx
                    )
                if self.group_layout is not None:
                    # landmark state comes from slot-tiled slices, not the
                    # one-hot kernel (models/ba.py:_edge_inputs)
                    if pxp is not None:
                        data = data._replace(
                            pose_xp=pxp, lm_slot=self.group_layout.meta
                        )
                else:
                    lxp = build_expand_plan(
                        li[:cov], self.L, chunk=1024, device_idx=data.lm_idx
                    )
                    if pxp is not None and lxp is not None:
                        data = data._replace(pose_xp=pxp, lm_xp=lxp)
            new_packed.append(data)
        self.packed = tuple(new_packed)

    # -- compiled stage wrappers ----------------------------------------------
    # module-level jits with static (hashable) meta args: the compile cache is
    # shared across solver instances with the same structure, so re-packing a
    # graph never retraces

    def _compile(self):
        # kept for interface symmetry; jit caching is global (see _jit_* below)
        self._fns = True

    # -- stage API used by the LM loop -----------------------------------------

    def head(self):
        return _jit_head(
            self.graph, self.packed, self.plan, self.metas, self.Pa, self.La
        )

    def max_diagonal(self, sys):
        return float(_jit_maxdiag(sys))

    def trial(self, sys, lam):
        lam = jnp.asarray(lam, self.dtype)
        nnz = self.schur.nnz_blocks if self.schur is not None else 0
        return _jit_trial(
            self.graph, sys, lam, self.packed, self.plan,
            self.metas, self.Pa, self.La, nnz, self.do_schur, self.mixed,
        )

    def accept(self, new_graph: GraphArrays) -> None:
        self.graph = new_graph

    def trial_profiled(self, sys, lam, timer):
        """Like :meth:`trial`, but runs each pipeline stage as its own jit
        call bracketed by :class:`~..utils.profiling.StageTimer` syncs — the
        TPU analogue of the reference's per-stage CUDA-event timing
        (block_solver.h:27-39).  Used only in profile mode; the fused path
        stays one dispatch."""
        from ..utils import profiling as prof

        lam = jnp.asarray(lam, self.dtype)
        nnz = self.schur.nnz_blocks if self.schur is not None else 0
        if self.do_schur:
            with timer.stage(prof.PROF_SCHUR_COMPLEMENT, sync=lambda: bsc):
                blocks, bsc, invHll = _jit_reduce(
                    sys, lam, self.plan, self.metas, self.Pa, self.La, nnz
                )
            with timer.stage(prof.PROF_NUMERICAL_DECOMP, sync=lambda: xp):
                xp, success = _jit_solve_reduced(
                    blocks, bsc, self.plan, self.Pa, self.mixed
                )
            with timer.stage(prof.PROF_UPDATE, sync=lambda: new_graph.q):
                xl = _jit_backsub(sys, invHll, xp, self.plan, self.Pa)
                new_graph = _jit_update(self.graph, xp, xl, self.Pa, self.La)
        else:
            with timer.stage(prof.PROF_SOLVE_HPP, sync=lambda: xp):
                xp, success = _jit_pose_only(sys, lam)
            xl = None
            with timer.stage(prof.PROF_UPDATE, sync=lambda: new_graph.q):
                new_graph = _jit_update(self.graph, xp, xl, self.Pa, self.La)
        with timer.stage(prof.PROF_COMPUTE_ERROR, sync=lambda: Fhat):
            Fhat = _jit_chi_only(new_graph, self.packed, self.metas)
        scale = _jit_scale(xp, xl, sys, lam)
        return new_graph, Fhat, scale, success

    def head_profiled(self, timer):
        """Per-stage version of :meth:`head` (profile mode)."""
        from ..utils import profiling as prof

        with timer.stage(prof.PROF_COMPUTE_ERROR, sync=lambda: chi):
            chi = _jit_chi_only(self.graph, self.packed, self.metas)
        with timer.stage(prof.PROF_BUILD_SYSTEM, sync=lambda: sys.bp):
            sys = build_system_jit(
                self.graph, self.packed, self.plan, self.metas, self.Pa, self.La
            )
        return chi, sys

    # -- outliers ---------------------------------------------------------------

    def update_edges(self) -> None:
        """Flag outlier edges (chi2 above the per-set threshold) and mask them
        out for subsequent optimize() calls.  Masking keeps shapes static —
        the TPU-native replacement for the reference's edge deactivation +
        structure rebuild (optimisable_graph.hpp:604-640).

        Works on the packed (possibly merged + layout-permuted) arrays, then
        maps the newly-thresholded masks back to original edge order for the
        object-API write-back (``edge.inactivate()``)."""
        newly_masks = self._update_edges_arrays()
        if newly_masks is None or not self._edge_sets:
            return
        # distribute original-order masks to the object edge sets; a merged
        # mono+stereo spec covers several sets contiguously
        if len(newly_masks) == 1 and self._merged_sizes and self._merged_sizes[0]:
            sizes = self._merged_sizes[0]
            if newly_masks[0] is None:
                parts = [None] * len(sizes)
            else:
                parts = np.split(newly_masks[0], np.cumsum(sizes)[:-1])
        else:
            parts = newly_masks
        for es, newly in zip(self._edge_sets, parts):
            if newly is None or es.outlier_threshold <= 0.0:
                continue
            n_out = 0
            for i, edge in enumerate(es.edges):
                if newly[i] and edge.is_active:
                    edge.inactivate()
                    n_out += 1
            b = es._bulk
            if b is not None and b["meas"].shape[0]:
                nb = newly[len(es.edges) :]
                n_out += int((b["active"] & nb).sum())
                b["active"] = b["active"] & ~nb
            es._outlier_count = n_out

    def _update_edges_arrays(self):
        """Outlier thresholding on the packed arrays (the analogue of
        gpu::computeOutliers, cuda_block_solver.cu:1135-1149), driven by the
        per-spec ``outlier_threshold`` (scalar, or per-edge array for merged
        mono+stereo sets).  Returns per-packed-spec keep masks mapped back
        to ORIGINAL edge order (None where no threshold applies)."""
        thrs = self._spec_thresholds
        if not thrs or not any(np.any(np.asarray(t) > 0) for t in thrs):
            return None
        chis = _jit_per_set_chi(self.graph, self.packed, self.metas)
        new_packed = []
        keeps = []
        self._outlier_counts = []
        for si, (data, thr, chi_e) in enumerate(zip(self.packed, thrs, chis)):
            thr_np = np.asarray(thr, dtype=np.float64)
            if np.any(thr_np > 0):
                chi_np = np.asarray(chi_e)
                was = np.asarray(data.active) > 0
                keep = ((thr_np <= 0) | (chi_np <= thr_np)) & was
                # newly = THRESHOLD-caused deactivations only.  ``was`` is
                # False for dummy-padding rows AND for edges whose vertices
                # are all fixed (masked at pack time) — those must NOT be
                # reported (or object-inactivated) as outliers
                newly = was & ~keep
                data = data._replace(
                    active=jnp.asarray(keep.astype(np.float64), self.dtype)
                )
                self._outlier_counts.append(int(newly.sum()))
                # map packed (layout) order back to original edge order; rows
                # with no packed slot stay False (not newly thresholded)
                if si == 0 and self.group_layout is not None:
                    perm = self.group_layout.edge_perm
                    rows = perm >= 0
                    n_orig = int(perm[rows].max()) + 1 if rows.any() else 0
                    ko = np.zeros(n_orig, dtype=bool)
                    ko[perm[rows]] = newly[rows]
                    keeps.append(ko)
                else:
                    keeps.append(newly)
            else:
                self._outlier_counts.append(0)
                keeps.append(None)
            new_packed.append(data)
        self.packed = tuple(new_packed)
        return keeps

    # -- finalize ----------------------------------------------------------------

    def finalize(self) -> None:
        """Download estimates back into the host vertex objects
        (block_solver.cpp:441-458)."""
        if not self._pose_sets:
            return  # array-initialized problems keep results in self.graph
        q, t = self.result_poses()  # undoes any RCM pose reordering
        for vs in self._pose_sets:
            # write_back indexes by the GLOBAL vertex index (covers object
            # and bulk vertices; single-set global == per-set index)
            vs.write_back(q, t)
        if self._lm_sets and self.L > 0:
            # undoes the group layout's landmark renumbering/padding
            Xw = self.result_landmarks()
            for vs in self._lm_sets:
                vs.write_back(Xw)

    def nedges(self) -> int:
        return sum(m.nedges for m in self.metas)

    # -- results (fast array path) ---------------------------------------------

    def result_poses(self) -> tuple[np.ndarray, np.ndarray]:
        """Pose estimates ``(q, t)`` in the caller's original order (RCM may
        reorder active poses internally; solver/ordering.py)."""
        q = np.asarray(self.graph.q, dtype=np.float64)
        t = np.asarray(self.graph.t, dtype=np.float64)
        if self.pose_perm is None:
            return q, t
        out_q, out_t = q.copy(), t.copy()
        out_q[self.pose_perm] = q[: self.Pa]
        out_t[self.pose_perm] = t[: self.Pa]
        return out_q, out_t

    def result_landmarks(self) -> np.ndarray:
        """Landmark estimates in the caller's original order (the group
        layout renumbers free landmarks internally; solver/groups.py)."""
        Xw = np.asarray(self.graph.Xw, dtype=np.float64)
        if self.group_layout is None:
            return Xw
        lay = self.group_layout
        n_fixed = self.L - self.La
        out = np.empty((self.La_real + n_fixed, 3), dtype=np.float64)
        real = lay.lm_order >= 0
        out[lay.lm_order[real]] = Xw[: self.La][real]
        out[self.La_real :] = Xw[self.La :]
        return out


# ---------------------------------------------------------------------------
# module-level jitted stage entry points (shared compile cache)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("metas", "Pa", "La"))
def _jit_head(graph, packed, plan, metas, Pa, La):
    chi = compute_chi(graph, packed, metas, plan=plan)
    sys = build_system(graph, packed, metas, Pa, La, plan)
    return chi, sys


@jax.jit
def _jit_maxdiag(sys):
    return max_diagonal(sys)


@functools.partial(
    jax.jit, static_argnames=("metas", "Pa", "La", "nnz", "do_schur", "mixed")
)
def _jit_trial(graph, sys, lam, packed, plan, metas, Pa, La, nnz, do_schur, mixed):
    if do_schur:
        xp, xl, success = solve_schur(sys, lam, plan, Pa, La, nnz, mixed=mixed)
    else:
        xp, success = solve_pose_only(sys, lam)
        xl = None
    new_graph = apply_update(graph, xp, xl, Pa, La)
    Fhat = compute_chi(new_graph, packed, metas, plan=plan)
    scale = compute_scale(xp, xl, sys, lam)
    return new_graph, Fhat, scale, success


@functools.partial(jax.jit, static_argnames=("metas", "Pa", "La"))
def build_system_jit(graph, packed, plan, metas, Pa, La):
    return build_system(graph, packed, metas, Pa, La, plan)


@functools.partial(jax.jit, static_argnames=("metas", "Pa", "La", "nnz"))
def _jit_reduce(sys, lam, plan, metas, Pa, La, nnz):
    return schur_reduce(sys, lam, plan, Pa, La, nnz)


@functools.partial(jax.jit, static_argnames=("Pa", "mixed"))
def _jit_solve_reduced(blocks, bsc, plan, Pa, mixed):
    return _solve_reduced_blocks(
        blocks, plan.blk_row, plan.blk_col, plan.diag_pos, bsc, Pa, mixed,
        plan.blk_row_plan, plan.blk_col_plan, plan.band, plan.pcg,
    )


@functools.partial(jax.jit, static_argnames=("Pa",))
def _jit_backsub(sys, invHll, xp, plan, Pa):
    return schur_back_substitute(sys, invHll, xp, plan, Pa)


@functools.partial(jax.jit, static_argnames=("Pa", "La"))
def _jit_update(graph, xp, xl, Pa, La):
    return apply_update(graph, xp, xl, Pa, La)


@jax.jit
def _jit_scale(xp, xl, sys, lam):
    return compute_scale(xp, xl, sys, lam)


@functools.partial(jax.jit, static_argnames=("metas",))
def _jit_chi_only(graph, packed, metas):
    return compute_chi(graph, packed, metas)


@jax.jit
def _jit_pose_only(sys, lam):
    return solve_pose_only(sys, lam)


@functools.partial(jax.jit, static_argnames=("metas",))
def _jit_per_set_chi(graph, packed, metas):
    out = []
    for data, meta in zip(packed, metas):
        model = MODEL_REGISTRY[meta.kind]
        out.append(model.chi(graph, data, meta.rk, meta.delta))
    return tuple(out)
