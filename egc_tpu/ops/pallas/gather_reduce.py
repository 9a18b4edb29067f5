"""Pallas TPU kernel: fused gather + multi-aggregator segment reduction.

This is the framework's hot op — the TPU-native replacement for the
torch_scatter/torch_sparse CUDA kernels the reference leans on (SURVEY
§2.3). XLA's generic gather/scatter lowers to a row-at-a-time loop
(~34 GB/s effective, measured); this kernel instead:

- walks edges in receiver-sorted (CSR) order, one receiver block per grid
  step, so every aggregator accumulates into a VMEM-resident output block
  (no scatter at all);
- gathers sender rows from HBM with a deep ring of pipelined row DMAs
  (the gather is random-access by nature; pipelining hides latency);
- computes ALL requested primitives (sum / weighted sum / sumsq / max /
  min) in ONE pass over the edges — the paper's "aggregator fusion"
  (arXiv 2104.01481) — so EGC-M costs the same edge traffic as EGC-S.

Derived aggregators (mean, var, std, symnorm self-term) are cheap node-level
XLA ops on the primitive outputs (see egc_tpu.ops.dispatch).

Edge layout prerequisites (host side, see ``csr_rowptr_np``): edges sorted
by receiver; ``block_ptr`` gives the edge range per receiver block. Padded
edges must point at a padding receiver row (they land in masked rows).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -3.0e38


def csr_rowptr_np(receivers_sorted: np.ndarray, num_nodes: int) -> np.ndarray:
    """rowptr[i] = first edge whose receiver >= i (edges receiver-sorted)."""
    return np.searchsorted(receivers_sorted, np.arange(num_nodes + 1)
                           ).astype(np.int32)


def block_ptr_np(rowptr: np.ndarray, num_nodes: int, block_rows: int
                 ) -> np.ndarray:
    """Edge offsets at receiver-block boundaries."""
    bounds = np.arange(0, num_nodes + block_rows, block_rows)
    bounds = np.minimum(bounds, num_nodes)
    return rowptr[bounds].astype(np.int32)


def _kernel(block_ptr_ref,            # scalar prefetch: [num_blocks+1]
            vals_hbm, senders_hbm, receivers_hbm, edge_w_hbm,
            *refs,
            ops: Tuple[str, ...], block_rows: int, chunk: int,
            ring: int, f: int, has_w: bool):
    n_out = len(ops)
    outs = refs[:n_out]
    (sidx, ridx, wbuf, rows, sem_idx, sem_w, sem_rows) = refs[n_out:]

    i = pl.program_id(0)
    start = block_ptr_ref[i]
    end = block_ptr_ref[i + 1]
    row0 = i * block_rows

    # init accumulators
    for op, o in zip(ops, outs):
        if op in ("max",):
            o[:] = jnp.full_like(o, NEG_BIG)
        elif op in ("min",):
            o[:] = jnp.full_like(o, -NEG_BIG)
        else:
            o[:] = jnp.zeros_like(o)

    # Chunk windows are absolute and chunk-aligned (Mosaic requires DMA
    # slice starts divisible by the HBM 1-D tiling); the edge loop covers
    # only [lo, hi) within each window.
    first_chunk = start // chunk
    num_chunks = pl.cdiv(end, chunk) - first_chunk

    def chunk_body(c, _):
        c0 = pl.multiple_of((first_chunk + c) * chunk, chunk)
        lo = jnp.maximum(start - c0, 0)
        n_e = jnp.minimum(end - c0, chunk)

        # indices for this chunk (senders + receivers [+ weights])
        cp_s = pltpu.make_async_copy(
            senders_hbm.at[pl.ds(c0, chunk)], sidx, sem_idx.at[0])
        cp_r = pltpu.make_async_copy(
            receivers_hbm.at[pl.ds(c0, chunk)], ridx, sem_idx.at[1])
        cp_s.start()
        cp_r.start()
        if has_w:
            cp_w = pltpu.make_async_copy(
                edge_w_hbm.at[pl.ds(c0, chunk)], wbuf, sem_w)
            cp_w.start()
            cp_w.wait()
        cp_s.wait()
        cp_r.wait()

        # Phase 1: issue ALL row gathers of this chunk on one shared
        # semaphore, then ONE wait for the whole buffer (per-edge wait
        # overhead dominated the interleaved version). Every slot [0, chunk)
        # is fetched — out-of-range slots gather row sidx[j] (always a valid
        # node id; edge arrays are zero-padded) so the total byte count is
        # exactly the full buffer and a single whole-buffer descriptor can
        # perform the wait.
        def issue(j, _):
            pltpu.make_async_copy(
                vals_hbm.at[pl.ds(sidx[j], 1)], rows.at[pl.ds(j, 1)],
                sem_rows).start()
            return 0

        jax.lax.fori_loop(0, chunk, issue, 0)
        pltpu.make_async_copy(
            vals_hbm.at[pl.ds(0, chunk)], rows, sem_rows).wait()

        # Phase 2: pure-VPU accumulate loop over the gathered chunk buffer.
        def body(j, _):
            row = rows[pl.ds(j, 1), :]             # [1, F]
            r = ridx[j] - row0
            for op, o in zip(ops, outs):
                cur = o[pl.ds(r, 1), :]
                if op == "sum":
                    o[pl.ds(r, 1), :] = cur + row
                elif op == "wsum":
                    o[pl.ds(r, 1), :] = cur + row * wbuf[j]
                elif op == "sumsq":
                    o[pl.ds(r, 1), :] = cur + row * row
                elif op == "max":
                    o[pl.ds(r, 1), :] = jnp.maximum(cur, row)
                elif op == "min":
                    o[pl.ds(r, 1), :] = jnp.minimum(cur, row)
            return 0

        jax.lax.fori_loop(lo, n_e, body, 0)
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)

    # post: neutralize untouched max/min rows to 0 (empty-segment == 0
    # semantics, matching egc_tpu.ops.segment)
    for op, o in zip(ops, outs):
        if op == "max":
            o[:] = jnp.where(o[:] <= NEG_BIG, 0.0, o[:])
        elif op == "min":
            o[:] = jnp.where(o[:] >= -NEG_BIG, 0.0, o[:])


def segment_gather_reduce(
    vals: jnp.ndarray,                 # [N, F] float32, F multiple of 128
    senders: jnp.ndarray,              # [E] int32 (receiver-sorted edges)
    receivers: jnp.ndarray,            # [E] int32 sorted ascending
    block_ptr: jnp.ndarray,            # [num_blocks+1] int32
    *,
    num_out_rows: int,                 # padded N (multiple of block_rows)
    ops: Sequence[str] = ("sum",),
    edge_w: Optional[jnp.ndarray] = None,   # [E] for "wsum"
    block_rows: int = 512,
    chunk: int = 1024,
    ring: int = 16,
):
    """Returns a tuple of [num_out_rows, F] arrays, one per op in ``ops``.

    ops ⊆ {sum, wsum, sumsq, max, min}. Empty segments yield 0.
    """
    ops = tuple(ops)
    n, f = vals.shape
    if f % 128:
        raise ValueError(f"feature dim {f} must be a multiple of 128")
    if num_out_rows % block_rows:
        raise ValueError("num_out_rows must be a multiple of block_rows")
    num_blocks = num_out_rows // block_rows
    if chunk % 1024:
        raise ValueError("chunk must be a multiple of 1024 (HBM 1-D tiling)")
    has_w = edge_w is not None
    if "wsum" in ops and not has_w:
        raise ValueError("wsum requires edge_w")
    if edge_w is None:
        edge_w = jnp.zeros((senders.shape[0],), vals.dtype)

    # Chunked index DMAs read [c0, c0 + chunk) with c0 < E; pad the edge
    # arrays by one chunk so the tail DMA stays in bounds (an out-of-bounds
    # slice start would be clamped, silently shifting the indices).
    e = senders.shape[0]
    pad = (chunk - e % chunk) % chunk + chunk
    senders = jnp.pad(senders, (0, pad))
    receivers = jnp.pad(receivers, (0, pad))
    edge_w = jnp.pad(edge_w, (0, pad))

    kernel = functools.partial(
        _kernel, ops=ops, block_rows=block_rows, chunk=chunk, ring=ring,
        f=f, has_w=has_w)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # vals (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # senders
            pl.BlockSpec(memory_space=pl.ANY),      # receivers
            pl.BlockSpec(memory_space=pl.ANY),      # edge_w
        ],
        out_specs=tuple(
            pl.BlockSpec((block_rows, f), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in ops),
        scratch_shapes=[
            pltpu.SMEM((chunk,), jnp.int32),           # sidx
            pltpu.SMEM((chunk,), jnp.int32),           # ridx
            pltpu.SMEM((chunk,), vals.dtype),          # wbuf
            pltpu.VMEM((chunk, f), vals.dtype),        # chunk gather buffer
            pltpu.SemaphoreType.DMA((2,)),             # idx sems
            pltpu.SemaphoreType.DMA(()),               # w sem
            pltpu.SemaphoreType.DMA(()),               # row gather sem
        ],
    )

    out_shapes = tuple(jax.ShapeDtypeStruct((num_out_rows, f), vals.dtype)
                       for _ in ops)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(has_side_effects=False),
    )(block_ptr, vals, senders, receivers, edge_w)
    return outs if isinstance(outs, tuple) else (outs,)


# ---------------------------------------------------------------------------
# Windowed variant: sender windows streamed through VMEM (no per-edge DMA).
# ---------------------------------------------------------------------------

def make_window_plan_np(
    senders: np.ndarray,
    receivers: np.ndarray,
    num_nodes: int,
    *,
    block_rows: int = 2048,
    window_rows: int = 4096,
    chunk: int = 1024,
    num_out_nodes: Optional[int] = None,
):
    """Host-side edge layout for ``windowed_gather_reduce``.

    Edges are sorted by (receiver_block, sender_window, receiver) so that the
    kernel's grid cell (i, s) owns the contiguous edge range
    ``cell_ptr[i*S+s] : cell_ptr[i*S+s+1]`` and every sender in it lies
    inside window s. Static per graph — compute once per dataset.

    ``num_out_nodes``: BIPARTITE mode (hetero relations, reference
    ``experiments/rmag/models.py:32-148`` per-relation SpMM) — senders
    index a source node space of ``num_nodes`` rows (windows), receivers a
    distinct destination space of ``num_out_nodes`` rows (blocks).

    Returns dict(senders, receivers, perm, cell_ptr, R, S, n_pad,
    n_out_pad).
    """
    def round_up(x, m):
        return ((x + m - 1) // m) * m

    if num_out_nodes is None:
        n_pad = round_up(round_up(num_nodes, block_rows), window_rows)
        n_out_pad = n_pad
    else:
        n_pad = round_up(num_nodes, window_rows)          # sender/window side
        n_out_pad = round_up(num_out_nodes, block_rows)   # receiver/block side
    r_blocks = n_out_pad // block_rows
    s_blocks = n_pad // window_rows
    rb = receivers.astype(np.int64) // block_rows
    sb = senders.astype(np.int64) // window_rows
    key = (rb * s_blocks + sb) * np.int64(n_out_pad) + receivers
    order = np.argsort(key, kind="stable")
    cell = (rb * s_blocks + sb)[order]
    cell_ptr = np.searchsorted(cell, np.arange(r_blocks * s_blocks + 1)
                               ).astype(np.int32)
    return {
        "senders": senders[order].astype(np.int32),
        "receivers": receivers[order].astype(np.int32),
        "perm": order,
        "cell_ptr": cell_ptr,
        "R": r_blocks, "S": s_blocks, "n_pad": n_pad,
        "n_out_pad": n_out_pad,
        "block_rows": block_rows, "window_rows": window_rows,
        "chunk": chunk,
    }


def _chunk_blocking(cell_ptr_ref, chunk, s_blocks, sidx, ridx, wbuf,
                    sem_idx, sem_w, seq_ref, streams, process_chunk):
    """Blocking per-chunk index DMA (the EGC kernels' scheme; slot 0 only).

    Drop-in alternative to ``_chunk_pipeline`` with the same signature.
    The EGC gather-reduce kernels run near their measured per-edge floor
    with this scheme (the chunk DMA round trip overlaps the Pallas window
    streaming and amortizes over the cell) — see ``_chunk_sweep`` for the
    measured scheme comparison."""
    del seq_ref
    senders_hbm, receivers_hbm, edge_w_hbm = streams
    i = pl.program_id(0)
    s = pl.program_id(1)
    g = i * s_blocks + s
    start = cell_ptr_ref[g]
    end = cell_ptr_ref[g + 1]
    first_chunk = start // chunk
    num_chunks = pl.cdiv(end, chunk) - first_chunk

    def chunk_body(c, _):
        c0 = pl.multiple_of((first_chunk + c) * chunk, chunk)
        cp_s = pltpu.make_async_copy(
            senders_hbm.at[pl.ds(c0, chunk)],
            sidx.at[pl.ds(0, chunk)], sem_idx.at[0])
        cp_r = pltpu.make_async_copy(
            receivers_hbm.at[pl.ds(c0, chunk)],
            ridx.at[pl.ds(0, chunk)], sem_idx.at[1])
        cp_s.start()
        cp_r.start()
        if edge_w_hbm is not None:
            cp_w = pltpu.make_async_copy(
                edge_w_hbm.at[pl.ds(c0, chunk)],
                wbuf.at[pl.ds(0, chunk)], sem_w.at[0])
            cp_w.start()
            cp_w.wait()
        cp_s.wait()
        cp_r.wait()
        lo = jnp.maximum(start - c0, 0)
        n_e = jnp.minimum(end - c0, chunk)
        process_chunk(0, lo, n_e)
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)


def _chunk_sweep(cell_ptr_ref, chunk, s_blocks, sidx, ridx, wbuf,
                 sem_idx, sem_w, seq_ref, streams, process_chunk,
                 pipeline: bool = True):
    """Edge-chunk sweep: cross-cell pipeline or blocking per-chunk DMAs.

    The pipeline hides the chunk-DMA round trip that costs ~a microsecond
    per grid cell — a win on THIN-cell grids (attention plans <100
    edges/cell; the wide-mode narrow transpose plan ~170), but measured a
    LOSS on dense grids (~670 edges/cell: headline EGC h128 regressed
    0.232 -> 0.266 s with it), where the round trip amortizes and the
    pipeline's per-chunk branch/bookkeeping dominates — so the EGC
    kernels default ``pipeline=False`` and the attention kernels True
    (both measured; PERFORMANCE.md). EGC_TPU_ATTN_BLOCKING=1 forces
    blocking everywhere for A/B runs on hardware."""
    import os
    impl = (_chunk_blocking
            if (not pipeline
                or os.environ.get("EGC_TPU_ATTN_BLOCKING", "0") == "1")
            else _chunk_pipeline)
    return impl(cell_ptr_ref, chunk, s_blocks, sidx, ridx, wbuf,
                sem_idx, sem_w, seq_ref, streams, process_chunk)


def _chunk_pipeline(cell_ptr_ref, chunk, s_blocks, sidx, ridx, wbuf,
                    sem_idx, sem_w, seq_ref, streams, process_chunk):
    """Cross-cell double-buffered chunk pipeline.

    Edge-index chunk DMAs are issued one chunk AHEAD in a global sequence
    spanning all grid cells (empty cells still occupy one dummy slot so
    the sequence stays deterministic), hiding the DMA wait latency that
    otherwise costs ~a microsecond per cell — ruinous on sparse-cell
    grids (attention plans average <100 edges/cell).

    streams: (senders_hbm, receivers_hbm, edge_w_hbm-or-None).
    process_chunk(slot, lo, n_e): consume chunk data in buffer ``slot``.
    seq_ref: SMEM (1,) persistent global chunk counter.
    """
    senders_hbm, receivers_hbm, edge_w_hbm = streams
    i = pl.program_id(0)
    s = pl.program_id(1)
    g = i * s_blocks + s
    num_cells = pl.num_programs(0) * s_blocks
    start = cell_ptr_ref[g]
    end = cell_ptr_ref[g + 1]
    first_chunk = start // chunk
    num_chunks = jnp.maximum(pl.cdiv(end, chunk) - first_chunk, 1)

    # scratch buffers are FLAT [2*chunk] (Mosaic rejects size-1 leading
    # slices of 2-D SMEM); slot k occupies [k*chunk, (k+1)*chunk)
    def slot_view(buf, slot):
        return buf.at[pl.ds(pl.multiple_of(slot * chunk, chunk), chunk)]

    def issue(c0, slot):
        c0 = pl.multiple_of(c0, chunk)
        pltpu.make_async_copy(
            senders_hbm.at[pl.ds(c0, chunk)], slot_view(sidx, slot),
            sem_idx.at[2 * slot]).start()
        pltpu.make_async_copy(
            receivers_hbm.at[pl.ds(c0, chunk)], slot_view(ridx, slot),
            sem_idx.at[2 * slot + 1]).start()
        if edge_w_hbm is not None:
            pltpu.make_async_copy(
                edge_w_hbm.at[pl.ds(c0, chunk)], slot_view(wbuf, slot),
                sem_w.at[slot]).start()

    def wait(slot):
        # descriptors only carry shape/dst info; safe to re-make for wait
        pltpu.make_async_copy(
            senders_hbm.at[pl.ds(0, chunk)], slot_view(sidx, slot),
            sem_idx.at[2 * slot]).wait()
        pltpu.make_async_copy(
            receivers_hbm.at[pl.ds(0, chunk)], slot_view(ridx, slot),
            sem_idx.at[2 * slot + 1]).wait()
        if edge_w_hbm is not None:
            pltpu.make_async_copy(
                edge_w_hbm.at[pl.ds(0, chunk)], slot_view(wbuf, slot),
                sem_w.at[slot]).wait()

    @pl.when(g == 0)
    def _():
        seq_ref[0] = 0
        issue(first_chunk * chunk, 0)

    seq0 = seq_ref[0]

    def chunk_body(c, _):
        seq = seq0 + c
        # issue the NEXT chunk in the global sequence before consuming
        # this one: own chunk c+1, or the next cell's first chunk
        @pl.when(c + 1 < num_chunks)
        def _():
            issue((first_chunk + c + 1) * chunk, (seq + 1) % 2)

        @pl.when((c + 1 >= num_chunks) & (g + 1 < num_cells))
        def _():
            nxt = cell_ptr_ref[g + 1]
            issue((nxt // chunk) * chunk, (seq + 1) % 2)

        wait(seq % 2)
        c0 = (first_chunk + c) * chunk
        lo = jnp.maximum(start - c0, 0)
        n_e = jnp.minimum(end - c0, chunk)
        process_chunk((seq % 2) * chunk, lo, n_e)
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)
    seq_ref[0] = seq0 + num_chunks


def _windowed_kernel(cell_ptr_ref,
                     vals_win, senders_hbm, receivers_hbm, edge_w_hbm,
                     *refs,
                     ops: Tuple[str, ...], block_rows: int,
                     window_rows: int, chunk: int, f: int, has_w: bool,
                     s_blocks: int, pipeline: bool = False):
    n_out = len(ops)
    outs = refs[:n_out]
    (sidx, ridx, wbuf, sem_idx, sem_w, seq_ref) = refs[n_out:]

    i = pl.program_id(0)
    s = pl.program_id(1)
    row0 = i * block_rows
    col0 = s * window_rows

    @pl.when(s == 0)
    def _():
        for op, o in zip(ops, outs):
            if op == "max":
                o[:] = jnp.full_like(o, NEG_BIG)
            elif op == "min":
                o[:] = jnp.full_like(o, -NEG_BIG)
            else:
                o[:] = jnp.zeros_like(o)

    def process_chunk(base, lo, n_e):
        def body(j, _):
            row = vals_win[pl.ds(sidx[base + j] - col0, 1), :]   # [1, F]
            r = ridx[base + j] - row0
            for op, o in zip(ops, outs):
                cur = o[pl.ds(r, 1), :]
                if op == "sum":
                    o[pl.ds(r, 1), :] = cur + row
                elif op == "wsum":
                    o[pl.ds(r, 1), :] = cur + row * wbuf[base + j]
                elif op == "sumsq":
                    o[pl.ds(r, 1), :] = cur + row * row
                elif op == "max":
                    o[pl.ds(r, 1), :] = jnp.maximum(cur, row)
                elif op == "min":
                    o[pl.ds(r, 1), :] = jnp.minimum(cur, row)
            return 0

        jax.lax.fori_loop(lo, n_e, body, 0)

    _chunk_sweep(cell_ptr_ref, chunk, s_blocks, sidx, ridx, wbuf,
                 sem_idx, sem_w, seq_ref,
                 (senders_hbm, receivers_hbm,
                  edge_w_hbm if has_w else None), process_chunk,
                 pipeline=pipeline)

    @pl.when(s == s_blocks - 1)
    def _():
        for op, o in zip(ops, outs):
            if op == "max":
                o[:] = jnp.where(o[:] <= NEG_BIG, 0.0, o[:])
            elif op == "min":
                o[:] = jnp.where(o[:] >= -NEG_BIG, 0.0, o[:])


def windowed_gather_reduce(
    vals: jnp.ndarray,                 # [n_pad, F] (padded to plan["n_pad"])
    plan_senders: jnp.ndarray,         # [E] cell-sorted (plan["senders"])
    plan_receivers: jnp.ndarray,
    cell_ptr: jnp.ndarray,
    *,
    r_blocks: int, s_blocks: int, block_rows: int, window_rows: int,
    ops: Sequence[str] = ("sum",),
    edge_w: Optional[jnp.ndarray] = None,   # [E] cell-sorted
    chunk: int = 1024,
    scratch_acc: bool = False,
    pipeline: bool = False,
):
    """Fused gather+reduce with VMEM-streamed sender windows.

    ~3x faster than ``segment_gather_reduce`` (no per-edge DMA issue): the
    Pallas pipeline streams ``vals`` windows ahead of compute; the per-edge
    inner loop only touches VMEM. Requires the static edge layout from
    ``make_window_plan_np``.

    ``scratch_acc``: wide-lane mode (F = 256) — accumulate in single-
    buffered VMEM scratch and DMA finished row blocks to HBM outputs (see
    the wide-variant comment above); the caller is responsible for the
    VMEM-fit check (``egc_tpu.ops.dispatch._wide_fits``).
    """
    ops = tuple(ops)
    n, f = vals.shape
    if f % 128:
        raise ValueError("feature dim must be a multiple of 128")
    if n != s_blocks * window_rows:
        raise ValueError("vals rows must equal the padded window-side size")
    # output rows live in the block space — equal to n for homogeneous
    # plans, the destination-type padded size for bipartite plans
    n_out = r_blocks * block_rows
    has_w = edge_w is not None
    if edge_w is None:
        edge_w = jnp.zeros((plan_senders.shape[0],), vals.dtype)

    e = plan_senders.shape[0]
    pad = (chunk - e % chunk) % chunk + chunk
    plan_senders = jnp.pad(plan_senders, (0, pad))
    plan_receivers = jnp.pad(plan_receivers, (0, pad))
    edge_w = jnp.pad(edge_w, (0, pad))

    if scratch_acc:
        kernel = functools.partial(
            _windowed_kernel_wide, ops=ops, block_rows=block_rows,
            window_rows=window_rows, chunk=chunk, f=f, has_w=has_w,
            s_blocks=s_blocks, pipeline=pipeline)
        out_specs = tuple(pl.BlockSpec(memory_space=pl.ANY)
                          for _ in ops)
        scratch = (
            [pltpu.VMEM((block_rows, f), vals.dtype) for _ in ops]
            + [
                pltpu.SMEM((2 * chunk,), jnp.int32),
                pltpu.SMEM((2 * chunk,), jnp.int32),
                pltpu.SMEM((2 * chunk,), vals.dtype),
                pltpu.SemaphoreType.DMA((4,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((len(ops),)),
                pltpu.SMEM((1,), jnp.int32),           # global chunk seq
            ])
    else:
        kernel = functools.partial(
            _windowed_kernel, ops=ops, block_rows=block_rows,
            window_rows=window_rows, chunk=chunk, f=f, has_w=has_w,
            s_blocks=s_blocks, pipeline=pipeline)
        out_specs = tuple(
            pl.BlockSpec((block_rows, f), lambda i, s, *_: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in ops)
        scratch = [
            pltpu.SMEM((2 * chunk,), jnp.int32),       # sidx (2 slots)
            pltpu.SMEM((2 * chunk,), jnp.int32),       # ridx
            pltpu.SMEM((2 * chunk,), vals.dtype),      # wbuf
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),               # global chunk seq
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r_blocks, s_blocks),
        in_specs=[
            pl.BlockSpec((window_rows, f), lambda i, s, *_: (s, 0),
                         memory_space=pltpu.VMEM),   # streamed sender window
            pl.BlockSpec(memory_space=pl.ANY),    # senders
            pl.BlockSpec(memory_space=pl.ANY),    # receivers
            pl.BlockSpec(memory_space=pl.ANY),    # edge_w
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    out_shapes = tuple(jax.ShapeDtypeStruct((n_out, f), vals.dtype)
                       for _ in ops)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
    )(cell_ptr, vals, plan_senders, plan_receivers, edge_w)
    return outs if isinstance(outs, tuple) else (outs,)


# ---------------------------------------------------------------------------
# Wide-lane (F > 128) variant: scratch-held accumulators + manual output DMA.
#
# Pallas's double-buffered VMEM output blocks exceed the 16 MB scoped VMEM
# limit at F >= 256 (arxiv h136 pads its bases to 256 lanes and would need
# ~20 MB at the production geometry). Holding the accumulators in SINGLE-
# buffered VMEM scratch and copying each finished row block to an HBM
# output (out_specs = ANY) with one async copy per block keeps the
# footprint at 2*window + n_ops*block, so the reference's unaligned tuned
# widths (arxiv h136 -> 256, hiv h224 -> 256, mag h352 bases -> 256) run
# as ONE [1, 256] edge sweep instead of two column-split [1, 128] sweeps —
# the loop base (~10.4 cy/edge, PERFORMANCE.md) is paid once, not twice.
# ---------------------------------------------------------------------------


def _windowed_kernel_wide(cell_ptr_ref,
                          vals_win, senders_hbm, receivers_hbm, edge_w_hbm,
                          *refs,
                          ops: Tuple[str, ...], block_rows: int,
                          window_rows: int, chunk: int, f: int, has_w: bool,
                          s_blocks: int, pipeline: bool = False):
    n_out = len(ops)
    outs_hbm = refs[:n_out]
    accs = refs[n_out:2 * n_out]
    (sidx, ridx, wbuf, sem_idx, sem_w, sem_out, seq_ref) = \
        refs[2 * n_out:]

    i = pl.program_id(0)
    s = pl.program_id(1)
    row0 = i * block_rows
    col0 = s * window_rows

    @pl.when(s == 0)
    def _():
        for op, o in zip(ops, accs):
            if op == "max":
                o[:] = jnp.full_like(o, NEG_BIG)
            elif op == "min":
                o[:] = jnp.full_like(o, -NEG_BIG)
            else:
                o[:] = jnp.zeros_like(o)

    def process_chunk(base, lo, n_e):
        def body(j, _):
            row = vals_win[pl.ds(sidx[base + j] - col0, 1), :]   # [1, F]
            r = ridx[base + j] - row0
            for op, o in zip(ops, accs):
                cur = o[pl.ds(r, 1), :]
                if op == "sum":
                    o[pl.ds(r, 1), :] = cur + row
                elif op == "wsum":
                    o[pl.ds(r, 1), :] = cur + row * wbuf[base + j]
                elif op == "sumsq":
                    o[pl.ds(r, 1), :] = cur + row * row
                elif op == "max":
                    o[pl.ds(r, 1), :] = jnp.maximum(cur, row)
                elif op == "min":
                    o[pl.ds(r, 1), :] = jnp.minimum(cur, row)
            return 0

        jax.lax.fori_loop(lo, n_e, body, 0)

    _chunk_sweep(cell_ptr_ref, chunk, s_blocks, sidx, ridx, wbuf,
                 sem_idx, sem_w, seq_ref,
                 (senders_hbm, receivers_hbm,
                  edge_w_hbm if has_w else None), process_chunk,
                 pipeline=pipeline)

    @pl.when(s == s_blocks - 1)
    def _():
        for k, (op, o) in enumerate(zip(ops, accs)):
            if op == "max":
                o[:] = jnp.where(o[:] <= NEG_BIG, 0.0, o[:])
            elif op == "min":
                o[:] = jnp.where(o[:] >= -NEG_BIG, 0.0, o[:])
            pltpu.make_async_copy(
                o, outs_hbm[k].at[pl.ds(row0, block_rows)],
                sem_out.at[k]).start()
        # block until the copies land: the next grid step (row block i+1,
        # s == 0) re-initializes the scratch accumulators in place
        for k, o in enumerate(accs):
            pltpu.make_async_copy(
                o, outs_hbm[k].at[pl.ds(row0, block_rows)],
                sem_out.at[k]).wait()


# ---------------------------------------------------------------------------
# Backward kernel: one windowed pass over the TRANSPOSED graph computes the
# whole multi-aggregator gradient w.r.t. vals.
# ---------------------------------------------------------------------------
#
# For receiver-side cotangents (c_sum, c_wsum, c_sumsq) and forward results
# (mx, mn) with their cotangents (c_max, c_min), the gradient at sender s is
#
#   d_vals[s] = sum over edges (s -> r) of
#       c_sum[r] + w_e * c_wsum[r] + 2 * vals[s] * c_sumsq[r]
#       + (vals[s] == mx[r]) * c_max[r] + (vals[s] == mn[r]) * c_min[r]
#
# The node-level coefficient rows are PACKED side by side ([N, K*F]) and
# streamed through VMEM windows; vals[s] is the stationary per-output-block
# input. Segment order within the packed array (present only if used):
#   c_sum | c_wsum | c_sumsq2 (= 2*c_sumsq) | mx | c_max | mn | c_min


def _windowed_bwd_kernel(cell_ptr_ref,
                         coeff_win, vals_blk, senders_hbm, receivers_hbm,
                         edge_w_hbm, out,
                         sidx, ridx, wbuf, sem_idx, sem_w, seq_ref,
                         *,
                         segs: Tuple[str, ...], block_rows: int,
                         window_rows: int, chunk: int, f: int, has_w: bool,
                         s_blocks: int, pipeline: bool = False):
    i = pl.program_id(0)
    s = pl.program_id(1)
    row0 = i * block_rows
    col0 = s * window_rows
    pos = {name: k for k, name in enumerate(segs)}

    @pl.when(s == 0)
    def _():
        out[:] = jnp.zeros_like(out)

    def process_chunk(base, lo, n_e):
        def body(j, _):
            # coeff row at the (windowed) original receiver
            crow = coeff_win[pl.ds(sidx[base + j] - col0, 1), :]  # [1, K*F]
            r = ridx[base + j] - row0                             # output row
            contrib = jnp.zeros((1, f), crow.dtype)
            if "c_sum" in pos:
                contrib += crow[:, pos["c_sum"] * f:(pos["c_sum"] + 1) * f]
            if "c_wsum" in pos:
                contrib += crow[:, pos["c_wsum"] * f:
                                (pos["c_wsum"] + 1) * f] * wbuf[base + j]
            needs_v = ("c_sumsq2" in pos or "c_max" in pos or "c_min" in pos)
            if needs_v:
                v = vals_blk[pl.ds(r, 1), :]
            if "c_sumsq2" in pos:
                contrib += crow[:, pos["c_sumsq2"] * f:
                                (pos["c_sumsq2"] + 1) * f] * v
            if "c_max" in pos:
                mx = crow[:, pos["mx"] * f:(pos["mx"] + 1) * f]
                cm = crow[:, pos["c_max"] * f:(pos["c_max"] + 1) * f]
                contrib += jnp.where(v >= mx, cm, 0.0)
            if "c_min" in pos:
                mn = crow[:, pos["mn"] * f:(pos["mn"] + 1) * f]
                cm = crow[:, pos["c_min"] * f:(pos["c_min"] + 1) * f]
                contrib += jnp.where(v <= mn, cm, 0.0)
            out[pl.ds(r, 1), :] = out[pl.ds(r, 1), :] + contrib
            return 0

        jax.lax.fori_loop(lo, n_e, body, 0)

    _chunk_sweep(cell_ptr_ref, chunk, s_blocks, sidx, ridx, wbuf,
                 sem_idx, sem_w, seq_ref,
                 (senders_hbm, receivers_hbm,
                  edge_w_hbm if has_w else None), process_chunk,
                 pipeline=pipeline)


def _windowed_bwd_kernel_wide(cell_ptr_ref,
                              coeff_win, vals_hbm, senders_hbm,
                              receivers_hbm, edge_w_hbm, out_hbm,
                              vals_blk, out_acc, sidx, ridx, wbuf,
                              sem_idx, sem_w, sem_v, sem_out, seq_ref,
                              *,
                              segs: Tuple[str, ...], block_rows: int,
                              window_rows: int, chunk: int, f: int,
                              has_w: bool, s_blocks: int,
                              pipeline: bool = False):
    """Wide-lane backward: the [block_rows, F] gradient accumulator and the
    stationary forward-input block both live in single-buffered scratch
    (vals arrives by ONE manual DMA per row block; the gradient leaves the
    same way), so only the K*F-lane coeff window is double-buffered — the
    footprint that kept F = 256 off the fused path."""
    i = pl.program_id(0)
    s = pl.program_id(1)
    row0 = i * block_rows
    col0 = s * window_rows
    pos = {name: k for k, name in enumerate(segs)}
    needs_v = ("c_sumsq2" in pos or "c_max" in pos or "c_min" in pos)

    @pl.when(s == 0)
    def _():
        out_acc[:] = jnp.zeros_like(out_acc)
        if needs_v:
            cp = pltpu.make_async_copy(
                vals_hbm.at[pl.ds(row0, block_rows)], vals_blk, sem_v)
            cp.start()
            cp.wait()

    def process_chunk(base, lo, n_e):
        def body(j, _):
            crow = coeff_win[pl.ds(sidx[base + j] - col0, 1), :]  # [1, K*F]
            r = ridx[base + j] - row0
            contrib = jnp.zeros((1, f), crow.dtype)
            if "c_sum" in pos:
                contrib += crow[:, pos["c_sum"] * f:(pos["c_sum"] + 1) * f]
            if "c_wsum" in pos:
                contrib += crow[:, pos["c_wsum"] * f:
                                (pos["c_wsum"] + 1) * f] * wbuf[base + j]
            if needs_v:
                v = vals_blk[pl.ds(r, 1), :]
            if "c_sumsq2" in pos:
                contrib += crow[:, pos["c_sumsq2"] * f:
                                (pos["c_sumsq2"] + 1) * f] * v
            if "c_max" in pos:
                mx = crow[:, pos["mx"] * f:(pos["mx"] + 1) * f]
                cm = crow[:, pos["c_max"] * f:(pos["c_max"] + 1) * f]
                contrib += jnp.where(v >= mx, cm, 0.0)
            if "c_min" in pos:
                mn = crow[:, pos["mn"] * f:(pos["mn"] + 1) * f]
                cm = crow[:, pos["c_min"] * f:(pos["c_min"] + 1) * f]
                contrib += jnp.where(v <= mn, cm, 0.0)
            out_acc[pl.ds(r, 1), :] = out_acc[pl.ds(r, 1), :] + contrib
            return 0

        jax.lax.fori_loop(lo, n_e, body, 0)

    _chunk_sweep(cell_ptr_ref, chunk, s_blocks, sidx, ridx, wbuf,
                 sem_idx, sem_w, seq_ref,
                 (senders_hbm, receivers_hbm,
                  edge_w_hbm if has_w else None), process_chunk,
                 pipeline=pipeline)

    @pl.when(s == s_blocks - 1)
    def _():
        cp = pltpu.make_async_copy(
            out_acc, out_hbm.at[pl.ds(row0, block_rows)], sem_out)
        cp.start()
        cp.wait()


def windowed_gather_reduce_bwd(
    coeff: jnp.ndarray,                # [n_pad, K*F] packed coefficients
    vals: jnp.ndarray,                 # [n_pad, F] forward input
    t_senders: jnp.ndarray,            # transpose-plan senders (orig recv)
    t_receivers: jnp.ndarray,          # transpose-plan receivers (orig send)
    t_cell_ptr: jnp.ndarray,
    *,
    segs: Sequence[str],
    r_blocks: int, s_blocks: int, block_rows: int, window_rows: int,
    edge_w: Optional[jnp.ndarray] = None,
    chunk: int = 1024,
    scratch_acc: bool = False,
    pipeline: bool = False,
):
    segs = tuple(segs)
    n, f = vals.shape
    k = len(segs)
    # coeff rows live in the WINDOW (original-receiver) space; vals/output
    # rows in the block (original-sender) space — distinct for bipartite
    # (hetero-relation) transpose plans
    if coeff.shape != (s_blocks * window_rows, k * f):
        raise ValueError(
            f"coeff shape {coeff.shape} != {(s_blocks * window_rows, k * f)}")
    if n != r_blocks * block_rows:
        raise ValueError("vals rows must equal the padded block-side size")
    has_w = edge_w is not None
    if edge_w is None:
        edge_w = jnp.zeros((t_senders.shape[0],), vals.dtype)

    e = t_senders.shape[0]
    pad = (chunk - e % chunk) % chunk + chunk
    t_senders = jnp.pad(t_senders, (0, pad))
    t_receivers = jnp.pad(t_receivers, (0, pad))
    edge_w = jnp.pad(edge_w, (0, pad))

    if scratch_acc:
        kernel = functools.partial(
            _windowed_bwd_kernel_wide, segs=segs, block_rows=block_rows,
            window_rows=window_rows, chunk=chunk, f=f, has_w=has_w,
            s_blocks=s_blocks, pipeline=pipeline)
        vals_spec = pl.BlockSpec(memory_space=pl.ANY)
        out_spec = pl.BlockSpec(memory_space=pl.ANY)
        needs_v = bool({"c_sumsq2", "c_max", "c_min"} & set(segs))
        scratch = [
            # stationary vals block — only when a segment consumes the
            # forward input (the no-vals case frees block VMEM for much
            # larger gradient accumulators -> less coeff restreaming)
            pltpu.VMEM((block_rows if needs_v else 8, f), vals.dtype),
            pltpu.VMEM((block_rows, f), vals.dtype),   # gradient accumulator
            pltpu.SMEM((2 * chunk,), jnp.int32),
            pltpu.SMEM((2 * chunk,), jnp.int32),
            pltpu.SMEM((2 * chunk,), vals.dtype),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),               # vals fetch
            pltpu.SemaphoreType.DMA(()),               # out store
            pltpu.SMEM((1,), jnp.int32),               # global chunk seq
        ]
    else:
        kernel = functools.partial(
            _windowed_bwd_kernel, segs=segs, block_rows=block_rows,
            window_rows=window_rows, chunk=chunk, f=f, has_w=has_w,
            s_blocks=s_blocks, pipeline=pipeline)
        vals_spec = pl.BlockSpec((block_rows, f), lambda i, s, *_: (i, 0),
                                 memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((block_rows, f), lambda i, s, *_: (i, 0),
                                memory_space=pltpu.VMEM)
        scratch = [
            pltpu.SMEM((2 * chunk,), jnp.int32),
            pltpu.SMEM((2 * chunk,), jnp.int32),
            pltpu.SMEM((2 * chunk,), vals.dtype),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),               # global chunk seq
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r_blocks, s_blocks),
        in_specs=[
            pl.BlockSpec((window_rows, k * f), lambda i, s, *_: (s, 0),
                         memory_space=pltpu.VMEM),   # coeff window
            vals_spec,                               # stationary vals block
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_spec,
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, f), vals.dtype),
    )(t_cell_ptr, coeff, vals, t_senders, t_receivers, edge_w)
