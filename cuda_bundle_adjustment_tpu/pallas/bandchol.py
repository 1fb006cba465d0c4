"""Banded block Cholesky factor + solve kernels (f32, whole band in VMEM).

The reduced camera system Hsc of a trajectory-style BA graph is BANDED in
block form: poses co-observe a landmark only within a small window (the
KITTI-00-scale graph has block bandwidth 11 at 86% band occupancy).  The
reference hands Hsc to cuSOLVER's general sparse Cholesky after METIS
reordering (cholesky.hpp:292-297; 45% of its runtime).  Here the band
structure lets the WHOLE factorization run inside one Pallas kernel with the
band resident in VMEM: no 252 MB dense matrix, no XLA relayout, and the
per-column sequential dependency is cheap on TPU (a 1321-step fori with
dynamic sublane windows measures ~2 ms on v5e — dispatch latency, not the
steps, dominates small kernels).

Storage: band row ``c*SB + d`` = upper block ``(c, c+d)`` of the scaled
matrix, flat row-major 6x6 in 36 lanes — exactly the solver's block layout,
so assembly is ONE 13.5k-row scatter and the lower-block transpose is
absorbed into static lane patterns.  ``SB`` = band height padded to a
sublane multiple; rows beyond the true bandwidth stay zero and their
updates are no-ops.  After factoring, row ``d=0`` of column ``c`` holds
``inv(L_cc)`` (solves only ever need the inverse) and rows ``d>=1`` hold
``Lt_d := L_{(c+d),c}^T`` (upper convention throughout).

Math per column c (right-looking):
  ``L_cc L_cc^T = A_cc``;   ``Lt_d = invL @ U_d``  (U_d = stored upper);
  trailing ``U'_{(c+d2),(d1-d2)} -= Lt_d2^T Lt_d1``  for 1 <= d2 <= d1.

Used by the mixed-precision solve in ``solver/block_solver.py``: f32 factor
+ f64 iterative refinement, same scheme and failure semantics as the dense
route it replaces (a non-SPD pivot yields inf/nan, the finiteness check
rejects the LM step like the reference's zero-pivot path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mask_col(j):
    """[1, 36] mask of lanes with ``lane % 6 == j`` (block column j)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 36), 1)
    return (lane % 6 == j).astype(jnp.float32)


def _mask_row(i):
    """[1, 36] mask of lanes with ``lane // 6 == i`` (block row i)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 36), 1)
    return (lane // 6 == i).astype(jnp.float32)


def _gb(X, k):
    """Group-broadcast block row ``k``: ``out[:, 6i+j] = X[:, 6k+j]``.

    Summing the six multiple-of-6 circular rolls of the masked input places
    row-group k's lanes into every group exactly once (36 = 6 groups x 6).
    """
    base = X * _mask_row(k)
    out = base
    for s in range(1, 6):
        out = out + pltpu.roll(base, 6 * s, axis=1)
    return out


def _rowpat(scalars):
    """[1, 36] pattern with ``scalars[i]`` on every lane of block row i."""
    out = None
    for i in range(6):
        t = scalars[i] * _mask_row(i)
        out = t if out is None else out + t
    return out


def _gspread(X, k):
    """Within-group spread: ``out[:, 6i+j] = X[:, 6i+k]`` for all j.

    Shifts stay inside each 6-lane group (|j-k| < 6), so plain circular
    rolls of the masked input are exact."""
    base = X * _mask_col(k)
    out = None
    for j in range(6):
        t = pltpu.roll(base, (j - k) % 36, axis=1) if j != k else base
        out = t if out is None else out + t
    return out


def _lane_T(X):
    """6x6 lane transpose: ``out[:, 6i+j] = X[:, 6j+i]``."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 36), 1)
    i_id, j_id = lane // 6, lane % 6
    out = None
    for d in range(-5, 6):
        m = (j_id - i_id == d).astype(jnp.float32)
        t = pltpu.roll(X * m, (5 * d) % 36, axis=1)
        out = t if out is None else out + t
    return out


def _chol6_inv_lanes(D):
    """Cholesky + lower-inverse of a 6x6 SPD block, all in [1, 36] lane form
    (entry (i, j) at lane 6i+j).  Returns ``invL`` lanes.

    Mosaic cannot lower value scatters or offset-mixing concats, so the
    whole elimination runs on masked lane vectors.  A non-positive pivot
    produces inf/nan; the caller's finiteness check rejects the LM step
    (the reference's zero-pivot semantics, cholesky.hpp:59-92).
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 36), 1)
    i_id, j_id = lane // 6, lane % 6
    L = jnp.zeros((1, 36), jnp.float32)
    for k in range(6):
        r = jax.lax.rsqrt(D[0, 6 * k + k])
        colk = D * _mask_col(k) * (i_id >= k).astype(jnp.float32) * r
        L = L + colk
        rowv = _gspread(colk, k)        # colv[i] at all lanes of group i
        colv = _lane_T(rowv)            # colv[j] at lane 6i+j
        D = D - rowv * colv
    invL = jnp.zeros((1, 36), jnp.float32)
    gbs = []
    for i in range(6):
        acc = jnp.zeros((1, 36), jnp.float32)
        for k in range(i):
            acc = acc + L[0, 6 * i + k] * gbs[k]
        ei = (lane == 6 * i + i).astype(jnp.float32)
        rowm = (i_id == i).astype(jnp.float32)
        row = (ei - acc * rowm) / L[0, 6 * i + i] * rowm
        invL = invL + row
        gbs.append(_gb(row, i))
    return invL


def _make_factor_kernel(Pa: int, SB: int, bw: int):
    def kernel(band_ref, out_ref):
        out_ref[:, :] = band_ref[:, :]
        row_id = jax.lax.broadcasted_iota(jnp.int32, (SB, 36), 0)

        def step(c, carry):
            base = c * SB
            strip = out_ref[pl.ds(base, SB), :]  # [SB, 36] updated uppers
            invL = _chol6_inv_lanes(strip[0:1, :])  # [1, 36] lanes

            # Lt_d = invL @ U_d  ->  Lt[:, 6i+j] = sum_k invL[i,k] U[:, 6k+j]
            gb_u = [_gb(strip, k) for k in range(6)]
            Lt = None
            for k in range(6):
                # invL[i, k] on every lane of block row i == _gspread(invL, k)
                t = gb_u[k] * _gspread(invL, k)
                Lt = t if Lt is None else Lt + t
            row0 = invL
            is0 = (row_id == 0).astype(jnp.float32)
            Lt = Lt * (1.0 - is0) + jnp.broadcast_to(row0, (SB, 36)) * is0
            out_ref[pl.ds(base, SB), :] = Lt

            # trailing: U'[(c+d2), d1-d2] -= Lt_d2^T Lt_d1, i.e.
            # upd[d1, 6i+j] = sum_k Lt_d2[k,i] * Lt_d1[k,j]
            gb_l = [_gb(Lt, k) for k in range(6)]
            for d2 in range(1, bw + 1):
                # pattern P_k[6i+j] = Lt_d2[k, i]: a lane transpose of row d2
                # followed by within-group spreads — vector ops instead of
                # 36 scalar extracts per d2
                Q = _lane_T(Lt[d2 : d2 + 1, :])  # Q[6i+k] = Lt_d2[k, i]
                upd = None
                for k in range(6):
                    t = gb_l[k] * _gspread(Q, k)
                    upd = t if upd is None else upd + t
                shifted = pltpu.roll(upd, SB - d2, axis=0)
                shifted = jnp.where(row_id < SB - d2, shifted, 0.0)
                tgt = out_ref[pl.ds(base + d2 * SB, SB), :]
                out_ref[pl.ds(base + d2 * SB, SB), :] = tgt - shifted
            return carry

        jax.lax.fori_loop(0, Pa, step, 0)

    return kernel


def _make_solve_kernel(Pa: int, SB: int, bw: int):
    def kernel(L_ref, b_ref, x_ref):
        x_ref[:, :] = b_ref[:, :]
        rid6 = jax.lax.broadcasted_iota(jnp.int32, (SB, 6), 0)

        def fwd(c, carry):
            base = c * SB
            strip = L_ref[pl.ds(base, SB), :]
            inv_row = strip[0:1, :]  # invL lanes (i,k) at 6i+k
            bc = x_ref[pl.ds(c, 1), 0:6]
            # y[i] = sum_k invL[i,k] b[k]
            cols1 = jax.lax.broadcasted_iota(jnp.int32, (1, 6), 1)
            y = jnp.zeros((1, 6), jnp.float32)
            for i in range(6):
                acc = inv_row[0, 6 * i] * bc[0, 0]
                for k in range(1, 6):
                    acc = acc + inv_row[0, 6 * i + k] * bc[0, k]
                y = y + acc * (cols1 == i).astype(jnp.float32)
            x_ref[pl.ds(c, 1), 0:6] = y
            # push: b[c+d] -= L_{(c+d),c} y;  (L_{(c+d),c} y)[j] =
            # sum_a Lt_d[a, j] y[a]
            ypat = _rowpat([y[0, a] for a in range(6)])  # y[a] on row a
            prod = strip * ypat
            red = prod
            for s in range(1, 6):
                red = red + pltpu.roll(prod, 36 - 6 * s, axis=1)
            contrib = red[:, 0:6]  # [SB, 6]: row d, entry j
            contrib = jnp.where((rid6 >= 1) & (rid6 <= bw), contrib, 0.0)
            win = x_ref[pl.ds(c + 1, SB), 0:6]
            x_ref[pl.ds(c + 1, SB), 0:6] = win - pltpu.roll(
                contrib, SB - 1, axis=0
            )
            return carry

        jax.lax.fori_loop(0, Pa, fwd, 0)

        def bwd(ci, carry):
            c = Pa - 1 - ci
            base = c * SB
            strip = L_ref[pl.ds(base, SB), :]
            # z_c = y_c - sum_d Lt_d x_{c+d};  (Lt_d x)[i] = sum_j Lt_d[i,j] x[j]
            xwin = pltpu.roll(x_ref[pl.ds(c + 1, SB), 0:6], 1, axis=0)
            xwin = jnp.where((rid6 >= 1) & (rid6 <= bw), xwin, 0.0)
            xpat = None  # [SB, 36]: xwin[d, j] at lane 6i+j
            for j in range(6):
                t = xwin[:, j : j + 1] * _mask_col(j)
                xpat = t if xpat is None else xpat + t
            prod = strip * xpat
            red = prod
            for s in range(1, 6):
                red = red + pltpu.roll(prod, 36 - s, axis=1)
            persum = jnp.sum(red, axis=0, keepdims=True)  # [1, 36]
            yc = x_ref[pl.ds(c, 1), 0:6]
            z = [yc[0, i] - persum[0, 6 * i] for i in range(6)]
            # x_c[k] = sum_i invL[i,k] z[i]
            inv_row = strip[0:1, :]
            cols1 = jax.lax.broadcasted_iota(jnp.int32, (1, 6), 1)
            x = jnp.zeros((1, 6), jnp.float32)
            for k in range(6):
                acc = inv_row[0, k] * z[0]
                for i in range(1, 6):
                    acc = acc + inv_row[0, 6 * i + k] * z[i]
                x = x + acc * (cols1 == k).astype(jnp.float32)
            x_ref[pl.ds(c, 1), 0:6] = x
            return carry

        jax.lax.fori_loop(0, Pa, bwd, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("Pa", "SB", "bw", "interpret"))
def band_factor(band, Pa, SB, bw, interpret=False):
    """Factor the banded block matrix in one kernel call.

    ``band``: [(Pa+SB)*SB, 36] f32 upper-band block rows (zeros beyond the
    pattern; the SB slack columns absorb tail writes).  Returns the same
    layout with ``invL_cc`` at d=0 and ``L_{(c+d),c}^T`` at d>=1.
    """
    with jax.enable_x64(False):
        return pl.pallas_call(
            _make_factor_kernel(Pa, SB, bw),
            out_shape=jax.ShapeDtypeStruct(band.shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(band)


@functools.partial(jax.jit, static_argnames=("Pa", "SB", "bw", "interpret"))
def band_solve(L, b, Pa, SB, bw, interpret=False):
    """Solve ``A x = b`` given the band factor; ``b`` [Pa, 6] f32 -> [Pa, 6]."""
    bp = jnp.zeros((Pa + SB + 1, 6), jnp.float32)
    bp = jax.lax.dynamic_update_slice(bp, b, (0, 0))
    with jax.enable_x64(False):
        out = pl.pallas_call(
            _make_solve_kernel(Pa, SB, bw),
            out_shape=jax.ShapeDtypeStruct(bp.shape, jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(L, bp)
    return out[:Pa]


# ---------------------------------------------------------------------------
# v2 factor: scalar-band layout, MXU inner ops
# ---------------------------------------------------------------------------
#
# Layout: ``band2[(c*6+ii), (6d+jj)] = upper(c, c+d)[ii, jj]`` — produced
# from the block-row band by one small XLA transpose
# (``[Pa+SB, SB, 6, 6] -> (0,2,1,3)``).  The whole array is VMEM-resident
# (~4 MB at KITTI-00 scale).  Per column step:
#
#   S6    = band2[c*6 : c*6+6, :]            # [6, 96]: row c of the upper
#   invL  = chol6_inv(S6[:, 0:6])            # sublane-form 6x6
#   LcT   = invL @ S6                        # ONE MXU dot = all L_d^T
#   U     = dot_general(LcT, LcT, contract sublanes)   # L L^T, no transpose
#   band2[c*6+6 : c*6+96, :] -= skew(U)[6:, :]         # 16 masked rolls
#
# ~150 vector ops + 2 MXU ops per column versus ~1600 vector ops for the
# lane-arithmetic v1 kernel.  Output comes back in the same layout with
# inv(L_cc) stored at the diagonal block; XLA inverse-transposes it into the
# block-row layout the (unchanged) solve kernels consume.


def _chol8_inv(D8):
    """6x6 Cholesky + lower-factor inverse on an [8, 8] tile (rows/cols 6-7
    are ignored on input and ZERO on output, so MXU contractions over the
    full 8-sublane tile are exact)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    cols8 = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 1)
    L = jnp.zeros((8, 8), jnp.float32)
    for k in range(6):
        r = jax.lax.rsqrt(D8[k, k])
        colk = jnp.where((rows >= k) & (rows < 6), D8[:, k : k + 1] * r, 0.0)
        L = L + colk * (cols8 == k).astype(jnp.float32)
        D8 = D8 - colk * colk.T
    cols1 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    invL = jnp.zeros((8, 8), jnp.float32)
    for i in range(6):
        acc = jnp.zeros((1, 8), jnp.float32)
        for k in range(i):
            acc = acc + L[i, k] * invL[k : k + 1, :]
        ei = (cols1 == i).astype(jnp.float32)
        invL = invL + (rows == i).astype(jnp.float32) * ((ei - acc) / L[i, i])
    return invL


def _make_factor2_kernel(Pa: int, SB: int):
    W6 = SB * 6
    LW = 128  # lane-padded width: v2 requires W6 <= 128 (caller guards)

    def kernel(band_ref, out_ref):
        out_ref[:, :] = band_ref[:, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (W6 - 6, LW), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (W6 - 6, LW), 0)
        dmask = []  # per block-row d >= 1: that block's rows, in-band lanes
        for d in range(1, SB):
            m = ((row // 6 == d - 1) & (lane < W6 - 6 * d)).astype(jnp.float32)
            dmask.append(m)
        def step(c, carry):
            base = c * 6
            # read 8 rows so every MXU dim is tile-exact; rows 6-7 belong to
            # the next column and are killed by invL8's zero rows/cols
            S8 = out_ref[pl.ds(base, 8), :]  # [8, LW]
            invL8 = _chol8_inv(S8[0:8, 0:8])
            LcT8 = jax.lax.dot_general(
                invL8, S8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [8, LW]; rows 6-7 zero
            # store rows (lanes 0:6 then hold inv(L_cc) for the solves)
            # single full-width store; lanes 0:6 carry inv(L_cc) for the
            # solves (narrow masked sub-stores miscompile on some Mosaic
            # versions)
            lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, LW), 1)
            eye8 = (
                lane8 == jax.lax.broadcasted_iota(jnp.int32, (8, LW), 0)
            ).astype(jnp.float32)
            inv_wide = jax.lax.dot_general(
                invL8, eye8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [8, LW]: invL at lanes 0:8, zero elsewhere
            keep = (lane8 < 6).astype(jnp.float32)
            store = LcT8 * (1.0 - keep) + inv_wide * keep
            out_ref[pl.ds(base, 6), :] = store[0:6, :]
            # U = L L^T over the window (contract the 8 sublanes; the two
            # zero rows contribute nothing)
            U = jax.lax.dot_general(
                LcT8, LcT8, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [LW, LW]
            # materialise the row-shifted view at sublane offset 0 first: a
            # value slice at offset 6 feeding rolls miscompiles silently
            Ut = pltpu.roll(U, LW - 6, axis=0)[0 : W6 - 6, :]
            skew = None
            for d in range(1, SB):
                # shift row-block d left by 6d over the EXPLICIT 128-lane
                # width (roll modulus must match the physical lanes); the
                # wrap-around lands at lanes >= LW - 6d and is masked off
                t = pltpu.roll(Ut, (LW - 6 * d) % LW, axis=1) * dmask[d - 1]
                skew = t if skew is None else skew + t
            tgt = out_ref[pl.ds(base + 6, W6 - 6), :]
            out_ref[pl.ds(base + 6, W6 - 6), :] = tgt - skew
            return carry

        jax.lax.fori_loop(0, Pa, step, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("Pa", "SB", "interpret"))
def band_factor2(band, Pa, SB, interpret=False):
    """v2 factor: takes/returns the BLOCK-ROW band layout (same contract as
    :func:`band_factor`); the scalar-band relayout happens in XLA around the
    kernel (a ~2 MB 4D transpose)."""
    rows = band.shape[0] // SB
    W6 = SB * 6
    assert W6 <= 128, "band_factor2 requires SB*6 <= 128 (use band_factor)"
    b2 = (
        band.reshape(rows, SB, 6, 6)
        .transpose(0, 2, 1, 3)
        .reshape(rows * 6, W6)
    )
    b2 = jnp.pad(b2, ((0, 0), (0, 128 - W6)))
    with jax.enable_x64(False):
        out2 = pl.pallas_call(
            _make_factor2_kernel(Pa, SB),
            out_shape=jax.ShapeDtypeStruct(b2.shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(b2)
    return (
        out2[:, :W6]
        .reshape(rows, 6, SB, 6)
        .transpose(0, 2, 1, 3)
        .reshape(rows * SB, 36)
    )
