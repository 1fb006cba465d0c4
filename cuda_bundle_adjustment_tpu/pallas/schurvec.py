"""Per-edge Hpl block-vector products for the Schur stage, in double-float,
one Pallas call per co-visibility class.

Two products run on EVERY damping trial (reference: gpu::computeBschure's
``Hpl inv(Hll) bl`` term, cuda_block_solver.cu:1286-1325, and
gpu::schurComplementPost's ``Hpl^T xp``, cuda_block_solver.cu:1419-1442):

* ``bsc_rows[i] = sum_c Hpl[6x3][i,c] * y[c]`` per edge, PRESUMMED over the
  ``gc`` chunk members (the pose-side bucket reduce consumes one row per
  (class, slot, chunk) — solver/block_solver.py ``_pose_chunk_presum_cm``);
* ``contrib[c] = sum_i Hpl[i,c] * xp[i]`` per edge, summed over the ``d``
  slots (the landmark-side reduction of ``_lm_slot_sum_cm``).

The XLA forms of these ran as f64-emulated elementwise chains over
``[1, E]``-shaped rows (T(1,128) tiling, 1/8 sublane utilisation, with the
emulation's u32 mantissa ops materialised per row) — ~4 ms/iteration at
KITTI-00 scale in the device trace.  Here Hpl arrives in exactly the packed
float-float component-major ``[36, e_total]`` f32 form the linearisation
kernel emits (pallas/terms.py), and the products run on (hi, lo) pairs at
full ``[DG, 128]`` VPU utilisation with the same Dekker/two-sum scheme (and
Mosaic hazards) as the other kernels in this package.

Scope: engaged with the terms-kernel gate (``plan.layout.terms_kernel``);
the extras tail keeps the XLA math on sliced views.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .terms import (
    TILE_N,
    _INTERPRET_OPAQUE,
    _acc,
    _presplit,
    _ps_mul,
    _quick_two_sum,
    _roll_sum_df,
)


def _ld_ps(ref_h, ref_l, k):
    return _presplit((ref_h[k], ref_l[k]))


def _make_hpl_mv_kernel(d: int, gc: int):
    """bsc rows: ``out[i, a, :] = sum_{g} sum_c Hpl[3i+c] y[c]`` presummed
    over the chunk members g of each slot a."""
    DG = d * gc
    gshifts = list(range(1, gc))

    def kernel(hpl_h, hpl_l, y_h, y_l, out_h, out_l):
        ys = [_ld_ps(y_h, y_l, c) for c in range(3)]
        for i in range(6):
            P, E = None, None
            for c in range(3):
                p, e = _ps_mul(_ld_ps(hpl_h, hpl_l, 3 * i + c), ys[c])
                P, E = _acc(P, E, p, e)
            v = _quick_two_sum(P, E)
            if gc > 1:
                Pr, Er = _roll_sum_df(v, gshifts, DG)
            else:
                Pr, Er = v
            for a in range(d):
                out_h[i, a, :] = Pr[a * gc, :]
                out_l[i, a, :] = Er[a * gc, :]

    return kernel


def _make_hpl_mtv_kernel(d: int, gc: int):
    """landmark contributions: ``out[c, g, :] = sum_a sum_i Hpl[3i+c] xp[i]``
    summed over the d slots (rows 0:gc hold the slot sum)."""
    DG = d * gc
    dshifts = [a * gc for a in range(1, d)]

    def kernel(hpl_h, hpl_l, xp_h, xp_l, out_h, out_l):
        xs = [_ld_ps(xp_h, xp_l, i) for i in range(6)]
        for c in range(3):
            P, E = None, None
            for i in range(6):
                p, e = _ps_mul(_ld_ps(hpl_h, hpl_l, 3 * i + c), xs[i])
                P, E = _acc(P, E, p, e)
            v = _quick_two_sum(P, E)
            if d > 1:
                v = _roll_sum_df(v, dshifts, DG)
            out_h[c, :, :] = v[0][0:gc, :]
            out_l[c, :, :] = v[1][0:gc, :]

    return kernel


def _specs(lead_in2, DG, out_lead, out_rows):
    def m3d(g):
        return (0, 0, g)

    in_specs = [
        pl.BlockSpec((18, DG, TILE_N), m3d, memory_space=pltpu.VMEM),
        pl.BlockSpec((18, DG, TILE_N), m3d, memory_space=pltpu.VMEM),
        pl.BlockSpec((lead_in2, DG, TILE_N), m3d, memory_space=pltpu.VMEM),
        pl.BlockSpec((lead_in2, DG, TILE_N), m3d, memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((out_lead, out_rows, TILE_N), m3d, memory_space=pltpu.VMEM),
        pl.BlockSpec((out_lead, out_rows, TILE_N), m3d, memory_space=pltpu.VMEM),
    ]
    return in_specs, out_specs


@functools.partial(jax.jit, static_argnames=("d", "gc", "interpret"))
def hpl_mv_class_call(hpl_h, hpl_l, y_h, y_l, d, gc, interpret=False):
    """One class's ``Hpl @ y`` rows, member-presummed: inputs
    ``hpl_* [18, DG, nc_pad]``, ``y_* [3, DG, nc_pad]`` (slot-tiled) f32;
    returns ``(out_h, out_l) [6, d, nc_pad]``."""
    DG = d * gc
    nc_pad = hpl_h.shape[-1]
    in_specs, out_specs = _specs(3, DG, 6, d)
    out_shape = [
        jax.ShapeDtypeStruct((6, d, nc_pad), jnp.float32) for _ in range(2)
    ]
    _INTERPRET_OPAQUE[0] = bool(interpret)
    with jax.enable_x64(False):
        return pl.pallas_call(
            _make_hpl_mv_kernel(d, gc),
            grid=(nc_pad // TILE_N,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(hpl_h, hpl_l, y_h, y_l)


@functools.partial(jax.jit, static_argnames=("d", "gc", "interpret"))
def hpl_mtv_class_call(hpl_h, hpl_l, xp_h, xp_l, d, gc, interpret=False):
    """One class's ``Hpl^T @ xp`` rows, slot-summed: inputs
    ``hpl_* [18, DG, nc_pad]``, ``xp_* [6, DG, nc_pad]`` f32; returns
    ``(out_h, out_l) [3, gc, nc_pad]`` (the class's landmark positions in
    (member, chunk) order)."""
    DG = d * gc
    nc_pad = hpl_h.shape[-1]
    in_specs, out_specs = _specs(6, DG, 3, gc)
    out_shape = [
        jax.ShapeDtypeStruct((3, gc, nc_pad), jnp.float32) for _ in range(2)
    ]
    _INTERPRET_OPAQUE[0] = bool(interpret)
    with jax.enable_x64(False):
        return pl.pallas_call(
            _make_hpl_mtv_kernel(d, gc),
            grid=(nc_pad // TILE_N,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(hpl_h, hpl_l, xp_h, xp_l)
