"""Exact table expansion (gather) as a windowed one-hot MXU selection.

``out[:, e] = table[:, idx[e]]`` for a ``[K, M]`` table and ``[E]`` indices.
XLA's row-gather costs ~30-80 ns per row on TPU v5e (~25 GB/s effective);
this kernel instead DMA's a contiguous window of the table into VMEM per
chunk of indices and selects columns with an MXU one-hot product built
on-the-fly in VMEM (never written to HBM).  Selection by a 0/1 matrix is
EXACT in f32 — one nonzero product per output — so expanding the hi/lo
halves of an f64 array separately reproduces the f64 gather bit-for-bit.

The f64 table is split into THREE f32 summands (24+24+24 bits > 53), each
selected exactly, so the result is bit-identical to a real-f64 gather on any
platform (on TPU, where f64 is itself a two-f32 emulation, this is overkill
but free).

Indices outside a chunk's window produce an all-zero one-hot column and
hence a ZERO output — callers use index ``M`` (or anything out of range) as
a free zero-row sentinel, matching the segment-reduction conventions.

The window layout requires locality: each chunk of ``C`` consecutive indices
must span at most ``max_window`` distinct table columns.  That holds by
construction for our uses (pose tables are small enough for a full-table
window; landmark accesses are near-sorted after the build-time edge sort).
``build_expand_plan`` measures the true span and returns ``None`` if the
data has no locality, in which case callers keep the XLA gather.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class ExpandPlan(NamedTuple):
    starts: jnp.ndarray  # [nch] int32 window start column per chunk
    idx: jnp.ndarray  # [nch, 8, C//8] int32 (padded with out-of-range sentinel)
    window: int  # static window width (multiple of 128)
    chunk: int  # C
    num_rows: int  # E (true, before padding)
    table_cols: int  # M


# register as a pytree whose integer fields are STATIC aux data (they select
# the compiled kernel; as leaves they would be traced and break jit)
jax.tree_util.register_pytree_node(
    ExpandPlan,
    lambda p: ((p.starts, p.idx), (p.window, p.chunk, p.num_rows, p.table_cols)),
    lambda aux, ch: ExpandPlan(ch[0], ch[1], *aux),
)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("E", "M", "nch", "chunk"))
def _idx_matrix(device_idx, E, M, nch, chunk):
    di = jax.lax.slice_in_dim(device_idx, 0, E, axis=0).astype(jnp.int32)
    pad = nch * chunk - E
    if pad:
        di = jnp.concatenate(
            [di, jnp.full((pad,), M, dtype=jnp.int32)], axis=0
        )
    return di.reshape(nch, 8, chunk // 8)


def build_expand_plan(
    idx: np.ndarray,
    table_cols: int,
    chunk: int = 2048,
    max_window: int = 8192,
    device_idx=None,
) -> Optional[ExpandPlan]:
    """Plan ``expand`` for these indices; ``None`` if windows would exceed
    ``max_window`` (no locality — fall back to an XLA gather).

    ``device_idx``: the same indices already resident on the device (e.g.
    ``PackedEdges.pose_idx``) — the plan's chunk matrix is then a pad+reshape
    of that array instead of a second multi-MB upload (the RPC tunnel moves
    ~40 MB/s; re-uploading what the device already has costs ~100 ms)."""
    idx = np.asarray(idx, dtype=np.int64)
    if chunk % 1024:
        raise ValueError("chunk must be a multiple of 1024")
    E = int(idx.size)
    M = int(table_cols)
    nch = max(1, _ceil_to(E, chunk) // chunk)
    padded = np.full(nch * chunk, M, dtype=np.int64)
    padded[:E] = idx
    by_chunk = padded.reshape(nch, chunk)

    # per-chunk windows: the kernel's MXU work is proportional to the window
    # width, so ALWAYS measure the true per-chunk index span — grouped edge
    # orders (co-visibility layout, near-sorted landmark accesses) have strong
    # locality and a measured window several times narrower than the full
    # table (pose expand at KITTI-00 scale: 1408 full-table vs ~384 measured,
    # ~3x less one-hot matmul work per iteration)
    starts = np.zeros(nch, dtype=np.int64)
    span = 128
    masked = np.where(by_chunk < M, by_chunk, -1)
    hi_c = masked.max(axis=1)  # -1 for all-sentinel chunks
    masked_lo = np.where(masked >= 0, masked, np.int64(M))
    lo_c = masked_lo.min(axis=1)
    live = hi_c >= 0
    starts[live] = (lo_c[live] // 128) * 128  # DMA starts must be lane-aligned
    if np.any(live):
        span = max(span, int(np.max(hi_c[live] - starts[live])) + 1)
    window = _ceil_to(span, 128)
    if window > 1024:
        window = _ceil_to(window, 1024)  # W-tiling granularity
    full = _ceil_to(max(M, 128), 128)  # full-table single window
    # (single-window kernels run one [W, C] tile; no 1024-rounding —
    # rounding 1408 up to 2048 wasted 45% of the MXU work)
    if full <= window:  # no locality advantage: one shared window
        window = full
        starts[:] = 0
    if window > max_window:
        return None
    starts = np.minimum(starts, max(M - 1, 0))

    if device_idx is not None and device_idx.shape[0] >= E:
        # ONE jitted program for the slice+pad+reshape: eager ops here are
        # separate tiny dispatches, each paying tunnel service time
        idx_dev = _idx_matrix(device_idx, E, M, nch, chunk)
    else:
        idx_dev = jnp.asarray(
            by_chunk.reshape(nch, 8, chunk // 8).astype(np.int32)
        )
    return ExpandPlan(
        starts=jnp.asarray(starts.astype(np.int32)),
        idx=idx_dev,
        window=int(window),
        chunk=int(chunk),
        num_rows=E,
        table_cols=M,
    )


def _make_kernel(K: int, W: int, C: int, CSUB: int, nsplit: int):
    def kernel(starts_ref, idx_ref, *refs):
        table_refs = refs[:nsplit]
        out_refs = refs[nsplit:]
        g = pl.program_id(0)
        start = pl.multiple_of(starts_ref[g], 128)

        def body(*scoped):
            wins, sems = scoped[:nsplit], scoped[nsplit:]
            dmas = [
                pltpu.make_async_copy(
                    table_refs[p].at[:, pl.ds(start, W)], wins[p], sems[p]
                )
                for p in range(nsplit)
            ]
            for d in dmas:
                d.start()
            for d in dmas:
                d.wait()

            # onehot tile bounds VMEM at [WT, CSUB]; non-multiples run as
            # one full-width tile (VMEM [2048, 128] f32 = 1 MB is fine)
            WT = W if (W % 1024) or W <= 2048 else 1024
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (WT, CSUB), 0)

            # fori_loops (not unrolled python loops): Mosaic then reuses one
            # onehot buffer instead of allocating every tile at once
            def subtile(t, carry):
                il = idx_ref[0, pl.ds(t, 1), :] - start  # [1, CSUB]

                def wtile(w, accs):
                    onehot = (row_ids + w * WT == il).astype(jnp.float32)
                    # precision=HIGHEST: the default bf16 MXU path would
                    # truncate the table values; the x3-bf16 decomposition
                    # is exact for products against a 0/1 matrix (and the
                    # accumulation over W-tiles adds at most one nonzero)
                    return tuple(
                        accs[p]
                        + jnp.dot(
                            wins[p][:, pl.ds(w * WT, WT)],
                            onehot,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        )
                        for p in range(nsplit)
                    )

                accs = jax.lax.fori_loop(
                    0,
                    W // WT,
                    wtile,
                    tuple(
                        jnp.zeros((wins[0].shape[0], CSUB), jnp.float32)
                        for _ in range(nsplit)
                    ),
                )
                for p in range(nsplit):
                    out_refs[p][:, pl.ds(t * CSUB, CSUB)] = accs[p]
                return carry

            jax.lax.fori_loop(0, C // CSUB, subtile, 0)

        pl.run_scoped(
            body,
            *[pltpu.VMEM((K, W), jnp.float32) for _ in range(nsplit)],
            *[pltpu.SemaphoreType.DMA for _ in range(nsplit)],
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("window", "chunk", "interpret"))
def _expand_call(tables, starts, idx, window, chunk, interpret):
    nsplit = len(tables)
    K = tables[0].shape[0]
    nch, _, csub = idx.shape
    C = 8 * csub
    CSUB = csub
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nch,),
        in_specs=[
            pl.BlockSpec(
                (1, 8, CSUB), lambda g, s: (g, 0, 0), memory_space=pltpu.VMEM
            )
        ]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(nsplit)],
        out_specs=[
            pl.BlockSpec((K, C), lambda g, s: (0, g), memory_space=pltpu.VMEM)
            for _ in range(nsplit)
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((K, nch * C), jnp.float32) for _ in range(nsplit)
    ]
    # trace with x64 disabled: all kernel values are i32/f32, but global
    # x64 mode leaks i64 scalars (program ids, loop offsets) into the Mosaic
    # lowering, which cannot legalize them
    with jax.enable_x64(False):
        return pl.pallas_call(
            _make_kernel(K, window, C, CSUB, nsplit),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(starts, idx, *tables)


def expand(
    table: jnp.ndarray, plan: ExpandPlan, interpret: bool = False
) -> jnp.ndarray:
    """``table [M, K] f64  ->  out [K, E] f64`` with ``out[:, e] = table[idx[e]]``.

    Exact (bit-identical to the XLA gather) via separate hi/lo f32 selection.
    """
    M, K = table.shape
    W = plan.window
    # transpose (tiny table), split f64 into three exact f32 summands, pad
    # columns by one window so any in-range DMA start is safe and the
    # component dim to a sublane multiple (DMA slice alignment).
    # optimization_barrier: under --xla_allow_excess_precision XLA may fuse
    # the table's producer into the split with extra precision, so
    # ``hi = f32(x)`` would not be the exactly-rounded value and the 3-way
    # decomposition would no longer reconstruct x bit-for-bit
    table = jax.lax.optimization_barrier(table)
    tT = jnp.swapaxes(table, 0, 1)  # [K, M]
    # split count: on TPU an f64 value IS a (hi, lo) f32 pair (~49-bit
    # mantissa), so hi = f32(x) and lo = x - hi reproduce it EXACTLY and the
    # third summand is identically zero — two splits are bit-identical to
    # the f64 gather there.  Real-f64 backends (CPU tests/oracles) keep the
    # three-way 24+24+24 > 53-bit decomposition.
    if table.dtype == jnp.float64:
        nsplit = 2 if jax.default_backend() != "cpu" else 3
    else:
        nsplit = 1
    parts = []
    rem = tT
    for _ in range(nsplit):
        p = rem.astype(jnp.float32)
        parts.append(p)
        rem = rem - p.astype(table.dtype)
    # stack the splits as extra ROWS of one table: one DMA + one MXU dot per
    # tile instead of three, and 3x the MXU row utilisation (K is small) —
    # each split's rows stay independent, so the selection remains exact.
    # Parts are stacked UNPADDED (row padding only on the stacked total):
    # at K=12 the old per-split pad-to-16 was 25% pure-zero MXU work
    R = nsplit * K
    stacked = jnp.concatenate(parts, axis=0)
    stacked = jnp.pad(stacked, ((0, _ceil_to(R, 8) - R), (0, W)))
    outs = _expand_call(
        (stacked,), plan.starts, plan.idx, W, plan.chunk, interpret
    )
    out = outs[0][:K].astype(table.dtype)
    for p in range(1, nsplit):
        out = out + outs[0][p * K : (p + 1) * K].astype(table.dtype)
    return out[:, : plan.num_rows]
