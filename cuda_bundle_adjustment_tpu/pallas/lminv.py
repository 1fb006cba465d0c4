"""Damped landmark-block inversion + back-substitution products as
double-float Pallas kernels over component-major ``[k, La]`` rows.

Replaces the per-trial XLA chain ``Hll_d = Hll + lam*I; invHll =
flat_sym3x3_inv(Hll_d); y = invHll @ bl`` (and the back-substitution's
``xl = invHll @ cl``).  Those ran on row-major ``[La, 9]``/``[La, 3]`` f64
arrays whose 9/12-wide last axis tiles to 128 lanes (<10% utilisation), and
whose per-component slices became ``[La, 1]`` T(1,128) f64-emulation chains
with ~15 loop-carried copy-start/copy-done pairs per LM iteration in the
device trace (~0.11 ms each at kitti07 scale — the single largest item in
the round-4 "copies/masks/tail ~5 ms" bucket).  Here every component is a
``[1, La]`` lane row and the whole inversion is one VMEM-resident kernel.

Math parity: the adjugate formula of ``ops/components.py:flat_sym3x3_inv``
(itself pinned to the reference's device Hll inversion,
cuda_block_solver.cu:1286-1308), evaluated in the same Dekker/two-sum
double-float scheme as pallas/terms.py — precision-equivalent to XLA's
emulated f64.  The damping guarantees SPD blocks (padding slots hold
``lam * I``), so no zero-det guard is needed beyond the f32-safe divide.

Outputs are (hi, lo) f32 pairs in EXACTLY the layouts the downstream
kernels consume: ``inv`` feeds pallas/pairprod's ``_pair_rows_from_splits``
(which previously re-transposed and re-split a row-major f64 invHll every
trial) and ``y`` feeds the bsc class kernel (pallas/schurvec.py) pre-split.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .terms import (
    _INTERPRET_OPAQUE,
    _df_add,
    _df_mul,
    _df_neg,
    _quick_two_sum,
)

TILE_N = 128


def _make_lminv_kernel():
    def kernel(lam_ref, h_h, h_l, b_h, b_l, inv_h, inv_l, y_h, y_l):
        def ld(rh, rl, k):
            return (rh[k : k + 1, :], rl[k : k + 1, :])

        lam = (lam_ref[0:1, :], lam_ref[1:2, :])
        # damped symmetric block [A00 A01 A02; A01 A11 A12; A02 A12 A22]
        A00 = _df_add(ld(h_h, h_l, 0), lam)
        A01 = ld(h_h, h_l, 1)
        A02 = ld(h_h, h_l, 2)
        A11 = _df_add(ld(h_h, h_l, 4), lam)
        A12 = ld(h_h, h_l, 5)
        A22 = _df_add(ld(h_h, h_l, 8), lam)

        # adjugate cofactors (flat_sym3x3_inv's exact expressions)
        c00 = _df_add(_df_mul(A11, A22), _df_neg(_df_mul(A12, A12)))
        c01 = _df_add(_df_mul(A02, A12), _df_neg(_df_mul(A01, A22)))
        c02 = _df_add(_df_mul(A01, A12), _df_neg(_df_mul(A02, A11)))
        c11 = _df_add(_df_mul(A00, A22), _df_neg(_df_mul(A02, A02)))
        c12 = _df_add(_df_mul(A02, A01), _df_neg(_df_mul(A00, A12)))
        c22 = _df_add(_df_mul(A00, A11), _df_neg(_df_mul(A01, A01)))

        # det = A00*c00 + A01*(A02*A12 - A01*A22) + A02*(A01*A12 - A02*A11)
        det = _df_add(
            _df_mul(A00, c00),
            _df_add(_df_mul(A01, c01), _df_mul(A02, c02)),
        )

        # double-float reciprocal: f32 seed + one df Newton correction
        # (same recipe as the masked reciprocal in pallas/terms.py).  The
        # damped det is > 0 on every slot (padding blocks are lam * I).
        safe = (jnp.abs(det[0]) > 1e-30).astype(jnp.float32)
        d_safe = jnp.where(jnp.abs(det[0]) > 1e-30, det[0], 1.0)
        q0 = safe / d_safe
        zq = _df_mul(det, (q0, jnp.zeros_like(q0)))
        err = _df_add((safe, jnp.zeros_like(q0)), _df_neg(zq))
        corr = _df_mul((q0, jnp.zeros_like(q0)), err)
        invd = _quick_two_sum(*_df_add((q0, jnp.zeros_like(q0)), corr))

        B = {}
        for (i, j), c in (
            ((0, 0), c00), ((0, 1), c01), ((0, 2), c02),
            ((1, 1), c11), ((1, 2), c12), ((2, 2), c22),
        ):
            B[(i, j)] = _df_mul(invd, c)

        def entry(i, j):
            return B[(min(i, j), max(i, j))]

        for i in range(3):
            for j in range(3):
                v = entry(i, j)
                inv_h[i * 3 + j, :] = v[0][0, :]
                inv_l[i * 3 + j, :] = v[1][0, :]

        bl = [ld(b_h, b_l, k) for k in range(3)]
        for i in range(3):
            acc = _df_mul(entry(i, 0), bl[0])
            acc = _df_add(acc, _df_mul(entry(i, 1), bl[1]))
            acc = _df_add(acc, _df_mul(entry(i, 2), bl[2]))
            y_h[i, :] = acc[0][0, :]
            y_l[i, :] = acc[1][0, :]

    return kernel


def _make_mv_kernel():
    def kernel(i_h, i_l, c_h, c_l, x_h, x_l):
        def ld(rh, rl, k):
            return (rh[k : k + 1, :], rl[k : k + 1, :])

        cl = [ld(c_h, c_l, k) for k in range(3)]
        for i in range(3):
            acc = _df_mul(ld(i_h, i_l, i * 3 + 0), cl[0])
            acc = _df_add(acc, _df_mul(ld(i_h, i_l, i * 3 + 1), cl[1]))
            acc = _df_add(acc, _df_mul(ld(i_h, i_l, i * 3 + 2), cl[2]))
            x_h[i, :] = acc[0][0, :]
            x_l[i, :] = acc[1][0, :]

    return kernel


def _row_specs(rows, grid_tile):
    def m(g):
        return (0, g)

    return pl.BlockSpec((rows, grid_tile), m, memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lminv_call(lm_cm, lam, interpret: bool = False):
    """Damped inversion + y for all landmark blocks.

    ``lm_cm``: [12, La] f64 component-major (rows 0:9 = Hll flat, 9:12 = bl;
    any La — lanes are zero-padded to the 128 tile internally).
    ``lam``: f64 scalar.  Returns ``(inv_h, inv_l [9, La], y_h, y_l [3, La])``
    f32 pairs.
    """
    from .terms import split_ff

    La = lm_cm.shape[1]
    La_pad = -(-La // TILE_N) * TILE_N
    if La_pad != La:
        # zero-pad to the lane tile; padded slots become lam * I blocks
        # (invertible) and are sliced off the outputs below
        lm_cm = jnp.pad(lm_cm, ((0, 0), (0, La_pad - La)))
    h_h, h_l = split_ff(lm_cm[:9])
    b_h, b_l = split_ff(lm_cm[9:12])
    del lm_cm
    lam = jax.lax.optimization_barrier(lam)  # exact-split guard (split_ff)
    lam_h = lam.astype(jnp.float32)
    lam_l = (lam - lam_h.astype(lam.dtype)).astype(jnp.float32)
    lam_b = jnp.broadcast_to(
        jnp.stack([lam_h, lam_l])[:, None], (2, TILE_N)
    )
    grid = (La_pad // TILE_N,)

    def cmap(g):
        return (0, 0)

    _INTERPRET_OPAQUE[0] = bool(interpret)
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            _make_lminv_kernel(),
            grid=grid,
            in_specs=[
                pl.BlockSpec((2, TILE_N), cmap, memory_space=pltpu.VMEM),
                _row_specs(9, TILE_N), _row_specs(9, TILE_N),
                _row_specs(3, TILE_N), _row_specs(3, TILE_N),
            ],
            out_specs=[
                _row_specs(9, TILE_N), _row_specs(9, TILE_N),
                _row_specs(3, TILE_N), _row_specs(3, TILE_N),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((9, La_pad), jnp.float32),
                jax.ShapeDtypeStruct((9, La_pad), jnp.float32),
                jax.ShapeDtypeStruct((3, La_pad), jnp.float32),
                jax.ShapeDtypeStruct((3, La_pad), jnp.float32),
            ],
            interpret=interpret,
        )(lam_b, h_h, h_l, b_h, b_l)
    if La_pad != La:
        outs = tuple(o[:, :La] for o in outs)
    return outs


@functools.partial(jax.jit, static_argnames=("interpret",))
def sym3x3_mv_call(inv_h, inv_l, c_h, c_l, interpret: bool = False):
    """``x = inv @ c`` per landmark on (hi, lo) pairs -> [3, La] pairs."""
    La = inv_h.shape[1]
    La_pad = -(-La // TILE_N) * TILE_N
    if La_pad != La:
        pad = ((0, 0), (0, La_pad - La))
        inv_h, inv_l = jnp.pad(inv_h, pad), jnp.pad(inv_l, pad)
        c_h, c_l = jnp.pad(c_h, pad), jnp.pad(c_l, pad)
    grid = (La_pad // TILE_N,)
    _INTERPRET_OPAQUE[0] = bool(interpret)
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            _make_mv_kernel(),
            grid=grid,
            in_specs=[
                _row_specs(9, TILE_N), _row_specs(9, TILE_N),
                _row_specs(3, TILE_N), _row_specs(3, TILE_N),
            ],
            out_specs=[
                _row_specs(3, TILE_N), _row_specs(3, TILE_N),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((3, La_pad), jnp.float32),
                jax.ShapeDtypeStruct((3, La_pad), jnp.float32),
            ],
            interpret=interpret,
        )(inv_h, inv_l, c_h, c_l)
    if La_pad != La:
        outs = tuple(o[:, :La] for o in outs)
    return outs
