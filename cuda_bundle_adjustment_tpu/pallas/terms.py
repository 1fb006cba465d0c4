"""Fused per-edge linearisation kernel (residual + Jacobians + weighted
quadratic-form stacks) in explicit double-float, one call per co-visibility
class.

Replaces the XLA hot path of ``_build_system_impl`` (models/ba.py terms +
``weighted_block_stacks`` + the [E,72] column concatenate + the pose chunk
presum + the landmark slot sum).  The XLA form materialises each of the 72
stack columns as a separate ``[E,1]`` buffer with S(1) round-trips before a
2x (hi|lo) concatenate — ~9 ms/iteration of pure data movement at KITTI-00
scale in the device trace (tools/trace_fused.py), on top of ~4x f64-emulation
overhead in the math itself.  This kernel computes everything in VMEM and
writes only the three REDUCED outputs the solver actually consumes:

* ``pose [42, d, nc_pad]``  — hpp(36, row-major) | bp(6) rows, PRESUMMED over
  the ``gc`` chunk members (the pose-side bucket reduce consumes one row per
  (slot, chunk); solver/block_solver.py ``_pose_chunk_presum``);
* ``lm [12, gc, nc_pad]``   — hll(9) | bl(3), summed over the ``d`` slots
  (the landmark-side reduction of ``_lm_slot_sum``: landmark position
  ``m * nc_pad + c``);
* ``hpl [18, d*gc, nc_pad]`` — weighted w * JP^T JL blocks per edge,
  component-major — EXACTLY the (hi, lo) input format of the Schur
  pair-product kernel (pallas/pairprod.py), which previously re-split and
  re-sliced a row-major f64 Hpl every trial.

All outputs are (hi, lo) f32 pairs.  Math parity: the per-edge expressions
follow ops/components.py stereo_jacobian_comps / weighted_block_stacks
(themselves pinned to the reference kernels, cuda_block_solver.cu:1151-1220);
mono rows run the 2-row model (stereo rows 0-1), merged mono+stereo sets mask
the third row per edge with ``m3``.

Precision: Dekker products + two-sum accumulation, the same float-float
scheme as pallas/pairprod.py — precision-equivalent to XLA's emulated f64
(which is itself a (hi, lo) f32 pair on TPU).  The same Mosaic hazards apply:
``_opaque`` bitcast barriers protect compensation terms, and tracing runs
with x64 disabled.

Supported scope (callers fall back to the XLA path otherwise): f64 solve
dtype, robust kernel NONE (rk=0; robustified sets keep the XLA path), one
camera per edge set (the reference's global-camera mode,
graph_optimisation_options.h:8-19).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128


# ---------------------------------------------------------------------------
# double-float value algebra on (hi, lo) f32 pairs
# ---------------------------------------------------------------------------
#
# Same Dekker/two-sum scheme as pallas/pairprod.py, but the anti-simplification
# barrier is switchable: Mosaic needs the through-int bitcast (it ALGEBRAICALLY
# simplifies add/sub chains), while interpret mode runs the kernel as plain XLA
# ops where the bitcast pair gets folded and --xla_allow_excess_precision then
# destroys the compensation — there ``lax.optimization_barrier`` is the correct
# fence (it is not lowerable inside real Mosaic kernels, hence the switch).

_INTERPRET_OPAQUE = [False]


def _opq(x):
    if _INTERPRET_OPAQUE[0]:
        return jax.lax.optimization_barrier(x)
    return pltpu.bitcast(pltpu.bitcast(x, jnp.int32), jnp.float32)


def _two_sum(a, b):
    s = a + b
    v = _opq(s) - a
    e = (a - (_opq(s) - v)) + (b - v)
    return s, e


def _quick_two_sum(a, b):
    s = a + b
    e = b - (_opq(s) - a)
    return s, e


def _split(a):
    c = a * 4097.0
    hi = c - _opq(c - a)
    lo = a - _opq(hi)
    return hi, lo


def _df_add(a, b):
    s, e = _two_sum(a[0], b[0])
    e = e + (a[1] + b[1])
    return _quick_two_sum(s, e)


def _df_sub(a, b):
    return _df_add(a, (-b[0], -b[1]))


def _df_mul(a, b):
    p = a[0] * b[0]
    ah, al = _split(a[0])
    bh, bl = _split(b[0])
    e = ((ah * bh - _opq(p)) + ah * bl + al * bh) + al * bl
    e = e + (a[0] * b[1] + a[1] * b[0])
    return _quick_two_sum(p, e)


def _df_mul_f32(a, s):
    """Multiply by an EXACT f32 factor (0/1 masks): componentwise is exact."""
    return (a[0] * s, a[1] * s)


def _df_neg(a):
    return (-a[0], -a[1])


def _presplit(a):
    """(hi, lo, hi_split_h, hi_split_l) for repeated exact products."""
    sh, sl = _split(a[0])
    return (a[0], a[1], sh, sl)


def _ps_mul(A, B):
    """Unnormalised product of two pre-split values -> (p, e)."""
    p = A[0] * B[0]
    e = ((A[2] * B[2] - _opq(p)) + A[2] * B[3] + A[3] * B[2]) + A[3] * B[3]
    e = e + (A[0] * B[1] + A[1] * B[0])
    return p, e


def _acc(P, E, p, e):
    """Accumulate an unnormalised (p, e) into a running (P, E)."""
    if P is None:
        return p, e
    P, c = _two_sum(P, p)
    return P, E + (e + c)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _roll_sum_df(x, shifts, n, axis=0):
    """df-compensated ``out[r] = sum_{s in {0} + shifts} x[(r + s) mod n]``.

    ``pltpu.roll`` rotates FORWARD (``roll(x, s)[r] = x[r - s]``) and only
    takes non-negative shifts, so the backward access is ``n - s``."""
    P, E = x[0], x[1]
    for s in shifts:
        P, c = _two_sum(P, pltpu.roll(x[0], n - s, axis=axis))
        E = E + (pltpu.roll(x[1], n - s, axis=axis) + c)
    return P, E


def _edge_residual_df(cam_ref, qt_h, qt_l, xw_h, xw_l, ms_h, ms_l,
                      act_ref, m3_ref, mdim: int, has_m3: bool):
    """Shared per-edge residual evaluation in double-float: camera loads,
    ``Xc = R Xw + t``, masked reciprocal, and the (masked) residual rows.
    Used by both the linearisation kernel and the chi kernel so the two
    passes are the SAME expressions (reference: computeActiveErrors and
    constructQuadraticForm share their error math,
    cuda_block_solver.cu:1059-1110 / 1151-1220)."""

    def dfc(k):  # camera constant k as a [1, 128] df pair: lane-
        # broadcast ALREADY done on the host (Mosaic cannot lower a
        # [1,1] -> [DG,128] two-axis broadcast; a [1,128] value only
        # broadcasts along sublanes, which it can)
        return (cam_ref[k : k + 1, :], cam_ref[5 + k : 5 + k + 1, :])

    fx, fy, bf = dfc(0), dfc(1), dfc(4)
    # cx/cy (dfc(2), dfc(3)) cancel out of e: e0 = fx*x*iz + cx - m0 and
    # the caller pre-subtracts cx from m0 (exactly, in f64) -- NOT done:
    # keep the full expression for parity with the XLA path.
    cx, cy = dfc(2), dfc(3)

    def ld(ref_h, ref_l, k):
        return (ref_h[k], ref_l[k])

    R = [ld(qt_h, qt_l, 3 + i) for i in range(9)]
    t = [ld(qt_h, qt_l, i) for i in range(3)]
    Xw = [ld(xw_h, xw_l, i) for i in range(3)]
    m = [ld(ms_h, ms_l, i) for i in range(3)]
    act = act_ref[:, :]
    m3 = m3_ref[:, :] if has_m3 else None

    # Xc = R Xw + t
    Xc = []
    for i in range(3):
        P, E = None, None
        for j in range(3):
            p, e = _ps_mul(_presplit(R[3 * i + j]), _presplit(Xw[j]))
            P, E = _acc(P, E, p, e)
        Xc.append(_df_add(_quick_two_sum(P, E), t[i]))
    Xx, Xy, z = Xc

    # masked reciprocal: inert rows (act = 0) and degenerate z give an
    # exact-zero inv_z, so every downstream value stays finite
    safe = (jnp.abs(z[0]) > 1e-30).astype(jnp.float32) * act
    zh_safe = jnp.where(jnp.abs(z[0]) > 1e-30, z[0], 1.0)
    q0 = safe / zh_safe
    zq = _df_mul(z, (q0, jnp.zeros_like(q0)))
    err = _df_add((safe, jnp.zeros_like(q0)), _df_neg(zq))
    corr = _df_mul((q0, jnp.zeros_like(q0)), err)
    inv_z = _df_add((q0, jnp.zeros_like(q0)), corr)
    inv_zz = _df_mul(inv_z, inv_z)

    fx_iz = _df_mul(fx, inv_z)
    fy_iz = _df_mul(fy, inv_z)

    # residuals (stereo rows 0-1 == mono; components.py:60-67)
    u = _df_add(_df_mul(fx_iz, Xx), cx)
    e0 = _df_sub(u, m[0])
    e1 = _df_sub(_df_add(_df_mul(fy_iz, Xy), cy), m[1])
    e = [e0, e1]
    if mdim == 3:
        e2 = _df_sub(_df_sub(u, _df_mul(bf, inv_z)), m[2])
        if has_m3:
            e2 = _df_mul_f32(e2, m3)
        e.append(e2)
    return dict(
        e=e, R=R, Xx=Xx, Xy=Xy, inv_z=inv_z, inv_zz=inv_zz,
        fx=fx, fy=fy, bf=bf, fx_iz=fx_iz, fy_iz=fy_iz, act=act, m3=m3,
    )


def _make_terms_kernel(d: int, gc: int, mdim: int, has_m3: bool):
    DG = d * gc

    def kernel(cam_ref, qt_h, qt_l, xw_h, xw_l, ms_h, ms_l, wa_h, wa_l,
               act_ref, m3_ref, pose_h, pose_l, lm_h, lm_l, hpl_h, hpl_l):
        env = _edge_residual_df(
            cam_ref, qt_h, qt_l, xw_h, xw_l, ms_h, ms_l, act_ref, m3_ref,
            mdim, has_m3,
        )
        e = env["e"]
        R, Xx, Xy = env["R"], env["Xx"], env["Xy"]
        inv_z, inv_zz = env["inv_z"], env["inv_zz"]
        fx, fy, bf = env["fx"], env["fy"], env["bf"]
        fx_iz, fy_iz = env["fx_iz"], env["fy_iz"]
        act, m3 = env["act"], env["m3"]
        w = (wa_h[0], wa_l[0])

        # Jacobians (components.py:110-157, g2o sign convention)
        fxXx_izz = _df_mul(_df_mul(fx, Xx), inv_zz)
        fyXy_izz = _df_mul(_df_mul(fy, Xy), inv_zz)
        jl0 = [
            _df_add(_df_neg(_df_mul(fx_iz, R[0 + j])),
                    _df_mul(fxXx_izz, R[6 + j]))
            for j in range(3)
        ]
        jl1 = [
            _df_add(_df_neg(_df_mul(fy_iz, R[3 + j])),
                    _df_mul(fyXy_izz, R[6 + j]))
            for j in range(3)
        ]
        JL = [jl0, jl1]
        xizz = _df_mul(Xx, inv_zz)
        yizz = _df_mul(Xy, inv_zz)
        xy_izz = _df_mul(Xx, yizz)
        one = (jnp.ones_like(act), jnp.zeros_like(act))
        jp0 = [
            _df_mul(xy_izz, fx),
            _df_neg(_df_mul(_df_add(one, _df_mul(Xx, xizz)), fx)),
            _df_mul(_df_mul(Xy, inv_z), fx),
            _df_neg(fx_iz),
            None,
            _df_mul(xizz, fx),
        ]
        jp1 = [
            _df_mul(_df_add(one, _df_mul(Xy, yizz)), fy),
            _df_neg(_df_mul(xy_izz, fy)),
            _df_neg(_df_mul(_df_mul(Xx, inv_z), fy)),
            None,
            _df_neg(fy_iz),
            _df_mul(yizz, fy),
        ]
        JP = [jp0, jp1]
        if mdim == 3:
            bf_izz = _df_mul(bf, inv_zz)
            jl2 = [
                _df_sub(jl0[j], _df_mul(bf_izz, R[6 + j])) for j in range(3)
            ]
            jp2 = [
                _df_sub(jp0[0], _df_mul(bf, yizz)),
                _df_add(jp0[1], _df_mul(bf, xizz)),
                jp0[2],
                jp0[3],
                None,
                _df_sub(jp0[5], bf_izz),
            ]
            if has_m3:
                jl2 = [_df_mul_f32(v, m3) for v in jl2]
                jp2 = [
                    None if v is None else _df_mul_f32(v, m3) for v in jp2
                ]
            JL.append(jl2)
            JP.append(jp2)

        # pre-split everything entering the quadratic form
        wS = _presplit(w)
        JPs = [[None if v is None else _presplit(v) for v in row] for row in JP]
        JLs = [[_presplit(v) for v in row] for row in JL]
        es = [_presplit(v) for v in e]

        def wmul(P, E):
            if P is None:
                zz = jnp.zeros_like(act)
                return (zz, zz)
            s = _quick_two_sum(P, E)
            sh, sl = _split(s[0])
            p, er = _ps_mul((s[0], s[1], sh, sl), wS)
            return _quick_two_sum(p, er)

        def qsum(rows_a, rows_b, i, j):
            P, E = None, None
            for mm in range(mdim):
                A, B = rows_a[mm][i], rows_b[mm][j]
                if A is None or B is None:
                    continue
                p, er = _ps_mul(A, B)
                P, E = _acc(P, E, p, er)
            return wmul(P, E)

        def qsum_e(rows_a, i):
            P, E = None, None
            for mm in range(mdim):
                A = rows_a[mm][i]
                if A is None:
                    continue
                p, er = _ps_mul(A, es[mm])
                P, E = _acc(P, E, p, er)
            return wmul(P, E)

        # --- pose block: presum over the gc chunk members, store [42, d] ---
        gshifts = list(range(1, gc))

        def store_pose(entry, val):
            if gc > 1:
                P, E = _roll_sum_df(val, gshifts, DG)
            else:
                P, E = val
            for a in range(d):
                pose_h[entry, a, :] = P[a * gc, :]
                pose_l[entry, a, :] = E[a * gc, :]

        hpp = {}
        for i in range(6):
            for j in range(i, 6):
                hpp[(i, j)] = qsum(JPs, JPs, i, j)
        for i in range(6):
            for j in range(6):
                store_pose(i * 6 + j, hpp[(min(i, j), max(i, j))])
        for i in range(6):
            store_pose(36 + i, qsum_e(JPs, i))

        # --- landmark block: sum over slots, store [12, gc] rows 0:gc ------
        dshifts = [a * gc for a in range(1, d)]

        def store_lm(entry, val):
            if d > 1:
                P, E = _roll_sum_df(val, dshifts, DG)
            else:
                P, E = val
            lm_h[entry, :, :] = P[0:gc, :]
            lm_l[entry, :, :] = E[0:gc, :]

        hll = {}
        for i in range(3):
            for j in range(i, 3):
                hll[(i, j)] = qsum(JLs, JLs, i, j)
        for i in range(3):
            for j in range(3):
                store_lm(i * 3 + j, hll[(min(i, j), max(i, j))])
        for i in range(3):
            store_lm(9 + i, qsum_e(JLs, i))

        # --- hpl: per-edge weighted blocks, component-major ----------------
        for i in range(6):
            for j in range(3):
                v = qsum(JPs, JLs, i, j)
                hpl_h[i * 3 + j, :, :] = v[0]
                hpl_l[i * 3 + j, :, :] = v[1]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("d", "gc", "mdim", "has_m3", "interpret")
)
def terms_class_call(
    cam, qt_h, qt_l, xw_h, xw_l, ms_h, ms_l, wa_h, wa_l, act, m3,
    d: int, gc: int, mdim: int, has_m3: bool, interpret: bool = False,
):
    """One class's fused linearisation.

    Inputs (f32, component-major; DG = d*gc; lanes = chunks):
      cam  [10, 128]        camera, lane-broadcast (hi rows 0:5, lo rows 5:10
                            in fx fy cx cy bf order)
      qt_* [12, DG, nc_pad] per-edge pose state (t | R row-major)
      xw_* [3, DG, nc_pad]  per-edge landmark state (slot-tiled)
      ms_* [3, DG, nc_pad]  measurements
      wa_* [1, DG, nc_pad]  omega * active
      act  [DG, nc_pad]     1.0 live / 0.0 inert rows (f32)
      m3   [DG, nc_pad]     1.0 stereo / 0.0 mono third-row mask (has_m3)
    Returns (pose_h, pose_l [42, d, nc_pad], lm_h, lm_l [12, gc, nc_pad],
    hpl_h, hpl_l [18, DG, nc_pad]).
    """
    DG = d * gc
    nc_pad = act.shape[-1]
    grid = (nc_pad // TILE_N,)

    def cmap(g):
        return (0, 0)

    def m3d(g):
        return (0, 0, g)

    def m2d(g):
        return (0, g)

    in_specs = [
        pl.BlockSpec((10, 128), cmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((12, DG, TILE_N), m3d, memory_space=pltpu.VMEM),
        pl.BlockSpec((12, DG, TILE_N), m3d, memory_space=pltpu.VMEM),
        pl.BlockSpec((3, DG, TILE_N), m3d, memory_space=pltpu.VMEM),
        pl.BlockSpec((3, DG, TILE_N), m3d, memory_space=pltpu.VMEM),
        pl.BlockSpec((3, DG, TILE_N), m3d, memory_space=pltpu.VMEM),
        pl.BlockSpec((3, DG, TILE_N), m3d, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, DG, TILE_N), m3d, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, DG, TILE_N), m3d, memory_space=pltpu.VMEM),
        pl.BlockSpec((DG, TILE_N), m2d, memory_space=pltpu.VMEM),
        pl.BlockSpec((DG, TILE_N), m2d, memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((42, d, TILE_N), m3d, memory_space=pltpu.VMEM),
        pl.BlockSpec((42, d, TILE_N), m3d, memory_space=pltpu.VMEM),
        pl.BlockSpec((12, gc, TILE_N), m3d, memory_space=pltpu.VMEM),
        pl.BlockSpec((12, gc, TILE_N), m3d, memory_space=pltpu.VMEM),
        pl.BlockSpec((18, DG, TILE_N), m3d, memory_space=pltpu.VMEM),
        pl.BlockSpec((18, DG, TILE_N), m3d, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((42, d, nc_pad), jnp.float32),
        jax.ShapeDtypeStruct((42, d, nc_pad), jnp.float32),
        jax.ShapeDtypeStruct((12, gc, nc_pad), jnp.float32),
        jax.ShapeDtypeStruct((12, gc, nc_pad), jnp.float32),
        jax.ShapeDtypeStruct((18, DG, nc_pad), jnp.float32),
        jax.ShapeDtypeStruct((18, DG, nc_pad), jnp.float32),
    ]
    if m3 is None:
        m3 = act
    _INTERPRET_OPAQUE[0] = bool(interpret)
    with jax.enable_x64(False):
        return pl.pallas_call(
            _make_terms_kernel(d, gc, mdim, has_m3),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(cam, qt_h, qt_l, xw_h, xw_l, ms_h, ms_l, wa_h, wa_l, act, m3)


def _make_chi_kernel(d: int, gc: int, mdim: int, has_m3: bool):
    def kernel(cam_ref, qt_h, qt_l, xw_h, xw_l, ms_h, ms_l, wa_h, wa_l,
               act_ref, m3_ref, chi_h, chi_l):
        env = _edge_residual_df(
            cam_ref, qt_h, qt_l, xw_h, xw_l, ms_h, ms_l, act_ref, m3_ref,
            mdim, has_m3,
        )
        # chi_e = w * sum_m e_m^2 with w = omega * active (inert rows have
        # w = 0 and FINITE e, so the product is an exact zero) — the same
        # expression as models/ba.py _chi_projective (reference error pass,
        # cuda_block_solver.cu:1059-1110)
        P, E = None, None
        for v in env["e"]:
            vs = _presplit(v)
            p, er = _ps_mul(vs, vs)
            P, E = _acc(P, E, p, er)
        s = _quick_two_sum(P, E)
        sh, sl = _split(s[0])
        p, er = _ps_mul((s[0], s[1], sh, sl), _presplit((wa_h[0], wa_l[0])))
        v = _quick_two_sum(p, er)
        chi_h[:, :] = v[0]
        chi_l[:, :] = v[1]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("d", "gc", "mdim", "has_m3", "interpret")
)
def chi_class_call(
    cam, qt_h, qt_l, xw_h, xw_l, ms_h, ms_l, wa_h, wa_l, act, m3,
    d: int, gc: int, mdim: int, has_m3: bool, interpret: bool = False,
):
    """One class's fused chi pass (per-edge robustified-chi2 values, rk=0
    scope): the double-float residual evaluation of :func:`terms_class_call`
    with only ``w * ||e||^2`` written back — ``(chi_h, chi_l) [DG, nc_pad]``
    f32 pairs, well-tiled for the downstream f64 sum.  Replaces the XLA chi
    path's swarm of ``[1, E]``-shaped f64 elementwise ops (T(1,128) tiling,
    1/8 sublane utilisation — ~4 ms/iteration at KITTI-00 scale in the
    device trace)."""
    DG = d * gc
    nc_pad = act.shape[-1]
    grid = (nc_pad // TILE_N,)

    def cmap(g):
        return (0, 0)

    def m3d(g):
        return (0, 0, g)

    def m2d(g):
        return (0, g)

    in_specs = [
        pl.BlockSpec((10, 128), cmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((12, DG, TILE_N), m3d, memory_space=pltpu.VMEM),
        pl.BlockSpec((12, DG, TILE_N), m3d, memory_space=pltpu.VMEM),
        pl.BlockSpec((3, DG, TILE_N), m3d, memory_space=pltpu.VMEM),
        pl.BlockSpec((3, DG, TILE_N), m3d, memory_space=pltpu.VMEM),
        pl.BlockSpec((3, DG, TILE_N), m3d, memory_space=pltpu.VMEM),
        pl.BlockSpec((3, DG, TILE_N), m3d, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, DG, TILE_N), m3d, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, DG, TILE_N), m3d, memory_space=pltpu.VMEM),
        pl.BlockSpec((DG, TILE_N), m2d, memory_space=pltpu.VMEM),
        pl.BlockSpec((DG, TILE_N), m2d, memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((DG, TILE_N), m2d, memory_space=pltpu.VMEM),
        pl.BlockSpec((DG, TILE_N), m2d, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((DG, nc_pad), jnp.float32),
        jax.ShapeDtypeStruct((DG, nc_pad), jnp.float32),
    ]
    if m3 is None:
        m3 = act
    _INTERPRET_OPAQUE[0] = bool(interpret)
    with jax.enable_x64(False):
        return pl.pallas_call(
            _make_chi_kernel(d, gc, mdim, has_m3),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(cam, qt_h, qt_l, xw_h, xw_l, ms_h, ms_l, wa_h, wa_l, act, m3)


def split_ff(x):
    """Exact (hi, lo) f32 pair of an f64 array (on TPU f64 IS such a pair).

    The optimization_barrier is LOAD-BEARING: under
    ``--xla_allow_excess_precision`` XLA may fuse the producer into the
    split so ``hi`` is not the exactly-rounded f32 of ``x`` and
    ``hi + lo != x`` — which silently degrades every downstream
    double-float kernel to ~f32 accuracy (measured 3e-14 -> 8e-8 on the
    hardware exactness gate, tools/tpu_parity.py)."""
    x = jax.lax.optimization_barrier(x)
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo
