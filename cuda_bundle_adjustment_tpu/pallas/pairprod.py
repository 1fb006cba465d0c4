"""Double-float pair-product kernel for the grouped Schur complement.

Computes, for every (degree-class, slot pair (a, b), landmark chunk), the
6x6 block ``sum_{g in chunk} W[e_{g,a}] @ Hpl[e_{g,b}]^T`` summed over the
chunk's ``Gc`` group members — the grouped form of the Schur triple product
(reference: gpu::computeHschureKernel, cuda_block_solver.cu:1327-1345).
The co-visibility layout (solver/groups.py) stores edges slot-major, so each
input block is a contiguous DMA and the chunk reduction is a dense sublane
tree: no gathers, no scatters.

Precision: TPU f64 is a float-float pair (~49-bit); this kernel carries
explicit (hi, lo) f32 pairs through Dekker products and two-sum
accumulation, which is precision-equivalent to XLA's emulated f64
(verified ~2e-16 term-relative on v5e).  Two Mosaic hazards are handled:

* Mosaic algebraically simplifies pure add/sub chains, silently destroying
  two-sum compensation terms — a through-int ``bitcast`` is a free
  optimization barrier (``_opaque``);
* the kernel traces with x64 disabled (global x64 leaks i64 scalars that
  Mosaic cannot legalize).

Error budget per output element: products are Dekker-exact; their error
terms and the sublane tree's compensation accumulate through ``two_sum``
with plain-f32 low parts, giving ~1e-14 relative to the summed-term
magnitudes — the same property (not per-entry relative error under
cancellation) as XLA's float-float arithmetic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 128  # chunk-lanes per grid step; nc_pad is a multiple of this


def _opaque(x):
    return pltpu.bitcast(pltpu.bitcast(x, jnp.int32), jnp.float32)


def _two_sum(a, b):
    s = a + b
    v = _opaque(s) - a
    e = (a - (_opaque(s) - v)) + (b - v)
    return s, e


def _quick_two_sum(a, b):
    s = a + b
    e = b - (_opaque(s) - a)
    return s, e


def _split(a):
    """Dekker split of f32 into 12+12-bit halves (products of halves exact)."""
    c = a * 4097.0
    hi = c - _opaque(c - a)
    lo = a - _opaque(hi)
    return hi, lo


# ---------------------------------------------------------------------------
# v2 kernel: W computed in-kernel from Hpl and inv(Hll)
# ---------------------------------------------------------------------------
#
# (A v1 kernel taking a pre-materialised W existed through round 1; the f64
# materialisation of W = Hpl @ inv(Hll) costs a ~1 GB padded write plus a
# transpose+split fusion per trial, so v2 replaced it and v1 was removed.)
# v2 keeps only Hpl (hi, lo) as kernel input together with the per-landmark
# inv(Hll) (hi, lo), and builds W in VMEM scratch once per chunk tile (at
# pair index 0; Mosaic scratch persists across grid steps and the pair axis
# iterates fastest).


def _make_kernel_v2(d: int, gc: int):
    def kernel(a_lut, b_lut, hh_ref, hl_ref, ih_ref, il_ref, ohi, olo,
               wh_s, wl_s):
        p = pl.program_id(1)

        @pl.when(p == 0)
        def _():
            # W[a][i, k] = sum_m Hpl[a][i, m] * invHll[m, k], double-float
            for a in range(d):
                for i in range(6):
                    for k in range(3):
                        Ph = None
                        for m in range(3):
                            xh = hh_ref[3 * i + m, a]
                            xl = hl_ref[3 * i + m, a]
                            yh = ih_ref[3 * m + k]
                            yl = il_ref[3 * m + k]
                            ph, pe = _df_mul(xh, xl, yh, yl)
                            if Ph is None:
                                Ph, Pl = ph, pe
                            else:
                                Ph, c = _two_sum(Ph, ph)
                                Pl = Pl + (pe + c)
                        h, l = _quick_two_sum(Ph, Pl)
                        wh_s[3 * i + k, a] = h
                        wl_s[3 * i + k, a] = l

        a = a_lut[p]
        b = b_lut[p]
        w_rows = []
        for r in range(18):
            x = wh_s[r, a]
            xh, xl = _split(x)
            w_rows.append((x, xh, xl, wl_s[r, a]))
        h_rows = []
        for r in range(18):
            x = hh_ref[r, b]
            xh, xl = _split(x)
            h_rows.append((x, xh, xl, hl_ref[r, b]))

        for i in range(6):
            for j in range(6):
                P = None
                E = None
                for c in range(3):
                    xa, ah, al, alo = w_rows[3 * i + c]
                    xb, bh, bl, blo = h_rows[3 * j + c]
                    pr = xa * xb
                    e = ((ah * bh - _opaque(pr)) + ah * bl + al * bh) + al * bl
                    e = e + (xa * blo + alo * xb)
                    if P is None:
                        P, E = pr, e
                    else:
                        P, carry = _two_sum(P, pr)
                        E = E + (e + carry)
                sh = gc // 2
                while sh >= 1:
                    rp = pltpu.roll(P, sh, axis=0)
                    re = pltpu.roll(E, sh, axis=0)
                    P, carry = _two_sum(P, rp)
                    E = E + (re + carry)
                    sh //= 2
                hi, lo = _quick_two_sum(P, E)
                ohi[0, 6 * i + j, :] = hi[0, :]
                olo[0, 6 * i + j, :] = lo[0, :]

    return kernel


def _df_mul(ah, al, bh, bl):
    p, e = _two_prod_df(ah, bh)
    e = e + (ah * bl + al * bh)
    return p, e


def _two_prod_df(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - _opaque(p)) + ah * bl + al * bh) + al * bl
    return p, e


@functools.partial(jax.jit, static_argnames=("d", "gc", "interpret"))
def _pairprod_call_v2(hh, hl, ih, il, a_lut, b_lut, d, gc, interpret=False):
    """Hpl splits [18, d, gc, nc_pad] + invHll splits [9, gc, nc_pad] f32;
    outputs ([npairs, 36, nc_pad],) x 2."""
    npairs = a_lut.shape[0]
    nc_pad = hh.shape[-1]
    grid = (nc_pad // TILE_N, npairs)

    def h_map(n, p, al, bl):
        return (0, 0, 0, n)

    def i_map(n, p, al, bl):
        return (0, 0, n)

    def o_map(n, p, al, bl):
        return (p, 0, n)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((18, d, gc, TILE_N), h_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((18, d, gc, TILE_N), h_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((9, gc, TILE_N), i_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((9, gc, TILE_N), i_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 36, TILE_N), o_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 36, TILE_N), o_map, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((18, d, gc, TILE_N), jnp.float32),
            pltpu.VMEM((18, d, gc, TILE_N), jnp.float32),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((npairs, 36, nc_pad), jnp.float32) for _ in range(2)
    ]
    with jax.enable_x64(False):
        return pl.pallas_call(
            _make_kernel_v2(d, gc),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(a_lut, b_lut, hh, hl, ih, il)


def schur_pair_rows_packed(Hpl36, invHll, plan, interpret: bool = False):
    """:func:`schur_pair_rows_v2` taking the float-float PACKED component-major
    Hpl the fused linearisation kernel emits (``[36, e_total]`` f32: hi rows
    0:18 | lo rows 18:36) — skips the transpose + re-split entirely."""
    layout = plan.layout
    dtype = invHll.dtype
    hhi = Hpl36[:18]
    hlo = Hpl36[18:]
    # barrier before the split: see pallas/terms.py split_ff — without it
    # excess-precision fusion de-rounds hi and the kernel loses the lo bits
    IT = jax.lax.optimization_barrier(invHll.T)  # [9, La]
    ihi = IT.astype(jnp.float32)
    ilo = (IT - ihi.astype(dtype)).astype(jnp.float32)
    return _pair_rows_from_splits(hhi, hlo, ihi, ilo, plan, interpret)


def schur_pair_rows_v2(Hpl, invHll, plan, interpret: bool = False):
    """Grouped pair-product rows for all classes, W = Hpl @ inv(Hll) formed
    inside the kernel — no f64 W materialisation, no ib expansion.

    ``Hpl``: [E', 18] f64 per-edge blocks in group-layout order
    (solver/groups.py); ``invHll``: [La, 9] f64 (landmark positions).
    Returns float-float packed ``[n_out, 72]`` f32 rows (hi | lo halves;
    recombine ``rows[:, :36] + rows[:, 36:]`` in f64 for the block values)
    ordered (class, pair, chunk) matching
    ``GroupLayout.out_key``."""
    layout = plan.layout
    dtype = Hpl.dtype
    # barriers before the splits: see pallas/terms.py split_ff — without
    # them excess-precision fusion de-rounds hi and the kernel loses the
    # lo bits (hardware exactness gate regressed 3e-14 -> 8e-8)
    HT = jax.lax.optimization_barrier(
        Hpl[: layout.e_classes].T
    )  # [18, e_classes]
    hhi = HT.astype(jnp.float32)
    hlo = (HT - hhi.astype(dtype)).astype(jnp.float32)
    IT = jax.lax.optimization_barrier(invHll.T)  # [9, La]
    ihi = IT.astype(jnp.float32)
    ilo = (IT - ihi.astype(dtype)).astype(jnp.float32)
    return _pair_rows_from_splits(hhi, hlo, ihi, ilo, plan, interpret)


def _pair_rows_from_splits(hhi, hlo, ihi, ilo, plan, interpret: bool = False):
    layout = plan.layout
    rows = []
    for ci, cm in enumerate(layout.classes):
        span = cm.d * cm.gc * cm.nc_pad
        shape = (18, cm.d, cm.gc, cm.nc_pad)
        ch = jax.lax.slice_in_dim(
            hhi, cm.e_start, cm.e_start + span, axis=1
        ).reshape(shape)
        chl = jax.lax.slice_in_dim(
            hlo, cm.e_start, cm.e_start + span, axis=1
        ).reshape(shape)
        S = cm.gc * cm.nc_pad
        ish = (9, cm.gc, cm.nc_pad)
        cih = jax.lax.slice_in_dim(
            ihi, cm.lm_start, cm.lm_start + S, axis=1
        ).reshape(ish)
        cil = jax.lax.slice_in_dim(
            ilo, cm.lm_start, cm.lm_start + S, axis=1
        ).reshape(ish)
        oh, ol = _pairprod_call_v2(
            ch, chl, cih, cil,
            plan.class_a[ci], plan.class_b[ci],
            cm.d, cm.gc, interpret=interpret,
        )
        # float-float PACKED output [rows, 72] f32 (hi | lo): the downstream
        # Hsc reduce gathers each row once instead of twice (f64 rows are
        # (hi, lo) component pairs on TPU; segments.reduce_rows_ff)
        out = jnp.concatenate([oh, ol], axis=1)  # [npairs, 72, nc_pad]
        rows.append(jnp.transpose(out, (0, 2, 1)).reshape(-1, 72))
    return jnp.concatenate(rows, axis=0)
