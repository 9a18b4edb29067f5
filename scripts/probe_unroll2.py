"""2-wide predicated unroll probe for the EGC windowed fwd sweep.

Round-1's unroll experiment hit a scheduling cliff (351 cy/edge); this
retries with the round-2 lessons: full-lane bodies only, no sub-lane ops,
second edge predicated with pl.when (no masked arithmetic).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    scripts/probe_unroll2.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from egc_tpu.data import synthetic
from egc_tpu.ops.dispatch import build_kernel_plan
from egc_tpu.ops.pallas.gather_reduce import (
    NEG_BIG, windowed_gather_reduce,
)

OPS = ("wsum", "sum", "max")
F = 128


def timeit(fn, *args, steps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / steps


def _unrolled_kernel(cell_ptr_ref,
                     vals_win, senders_hbm, receivers_hbm, edge_w_hbm,
                     *refs,
                     ops, block_rows, window_rows, chunk, f, has_w,
                     s_blocks, width):
    n_out = len(ops)
    outs = refs[:n_out]
    (sidx, ridx, wbuf, sem_idx, sem_w) = refs[n_out:]

    i = pl.program_id(0)
    s = pl.program_id(1)
    start = cell_ptr_ref[i * s_blocks + s]
    end = cell_ptr_ref[i * s_blocks + s + 1]
    row0 = i * block_rows
    col0 = s * window_rows

    @pl.when(s == 0)
    def _():
        for op, o in zip(ops, outs):
            if op == "max":
                o[:] = jnp.full_like(o, NEG_BIG)
            else:
                o[:] = jnp.zeros_like(o)

    first_chunk = start // chunk
    num_chunks = pl.cdiv(end, chunk) - first_chunk

    def chunk_body(c, _):
        c0 = pl.multiple_of((first_chunk + c) * chunk, chunk)
        lo = jnp.maximum(start - c0, 0)
        n_e = jnp.minimum(end - c0, chunk)

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

        def one_edge(j):
            row = vals_win[pl.ds(sidx[j] - col0, 1), :]
            r = ridx[j] - row0
            for op, o in zip(ops, outs):
                cur = o[pl.ds(r, 1), :]
                if op == "sum":
                    o[pl.ds(r, 1), :] = cur + row
                elif op == "wsum":
                    o[pl.ds(r, 1), :] = cur + row * wbuf[j]
                elif op == "max":
                    o[pl.ds(r, 1), :] = jnp.maximum(cur, row)

        def body(k, _):
            j = lo + k * width
            one_edge(j)
            for d in range(1, width):
                @pl.when(j + d < n_e)
                def _(d=d):
                    one_edge(j + d)
            return 0

        jax.lax.fori_loop(0, pl.cdiv(n_e - lo, width), body, 0)
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)

    @pl.when(s == s_blocks - 1)
    def _():
        for op, o in zip(ops, outs):
            if op == "max":
                o[:] = jnp.where(o[:] <= NEG_BIG, 0.0, o[:])


def run_unrolled(vals, edge_w, p, width):
    ops = OPS
    chunk = 1024
    e = p.senders.shape[0]
    pad = (chunk - e % chunk) % chunk + chunk
    senders = jnp.pad(p.senders, (0, pad))
    receivers = jnp.pad(p.receivers, (0, pad))
    ew = jnp.pad(edge_w, (0, pad))
    kernel = functools.partial(
        _unrolled_kernel, ops=ops, block_rows=p.block_rows,
        window_rows=p.window_rows, chunk=chunk, f=F, has_w=True,
        s_blocks=p.s_blocks, width=width)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(p.r_blocks, p.s_blocks),
        in_specs=[
            pl.BlockSpec((p.window_rows, F), lambda i, s, *_: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=tuple(
            pl.BlockSpec((p.block_rows, F), lambda i, s, *_: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in ops),
        scratch_shapes=[
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.SMEM((chunk,), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    n_out = p.r_blocks * p.block_rows
    out_shapes = tuple(jax.ShapeDtypeStruct((n_out, F), jnp.float32)
                       for _ in ops)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes,
    )(p.cell_ptr, vals, senders, receivers, ew)


def main():
    raw = synthetic.synthetic_full_graph(
        num_nodes=169_343, avg_degree=14, num_classes=40, num_features=128,
        seed=0)
    senders = np.asarray(raw["senders"])
    receivers = np.asarray(raw["receivers"])
    e = len(senders)
    plan = build_kernel_plan(senders, receivers, 169_343)
    p = plan.fwd
    n = plan.n_pad
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.normal(size=(n, F)).astype(np.float32))
    ew = jnp.asarray(rng.normal(size=(p.senders.shape[0],))
                     .astype(np.float32))

    @jax.jit
    def prod(v, w):
        return windowed_gather_reduce(
            v, p.senders, p.receivers, p.cell_ptr,
            r_blocks=p.r_blocks, s_blocks=p.s_blocks,
            block_rows=p.block_rows, window_rows=p.window_rows,
            ops=OPS, edge_w=w)

    o_ref = prod(vals, ew)
    t = timeit(prod, vals, ew)
    print(f"production fwd (3 ops): {t*1e3:7.1f} ms "
          f"({t/e*0.94e9:5.1f} cy/edge)", flush=True)

    for width in (2, 4):
        @jax.jit
        def unr(v, w, width=width):
            return run_unrolled(v, w, p, width)

        o_u = unr(vals, ew)
        for a, b in zip(o_ref, o_u):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)
        t = timeit(unr, vals, ew)
        print(f"unroll x{width} fwd      : {t*1e3:7.1f} ms "
              f"({t/e*0.94e9:5.1f} cy/edge)", flush=True)


if __name__ == "__main__":
    main()
