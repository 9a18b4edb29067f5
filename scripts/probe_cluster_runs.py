"""Decisive probe for the EGC sweep round-2 redesign candidates:

1. LP cluster-relabel the synthetic arxiv graph host-side; compare
   production fwd/bwd sweep times on original vs clustered node order
   (fewer cells touched -> less per-cell DMA wait).
2. Run-detection fwd body (register-carried partials, flush on receiver
   change) on the clustered order.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    scripts/probe_cluster_runs.py
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
    NEG_BIG, windowed_gather_reduce, windowed_gather_reduce_bwd,
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


def lp_relabel(senders, receivers, n, rounds=8, K=None):
    """Label-propagation clustering -> permutation (cluster-sorted)."""
    t0 = time.time()
    s, r = senders.astype(np.int64), receivers.astype(np.int64)
    rng = np.random.default_rng(0)
    K = K or max(n // 128, 2)
    lab = rng.integers(0, K, n).astype(np.int64)
    for it in range(rounds):
        nodes = np.concatenate([r, s])
        nbr = np.concatenate([lab[s], lab[r]])
        key = nodes * np.int64(K + 1) + nbr
        order = np.argsort(key, kind="stable")
        ks = key[order]
        boundary = np.empty(len(ks), bool)
        boundary[0] = True
        boundary[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(boundary)
        counts = np.diff(np.append(starts, len(ks)))
        run_node = nodes[order][starts]
        run_lab = nbr[order][starts]
        o2 = np.lexsort((-counts, run_node))
        rn, rl = run_node[o2], run_lab[o2]
        first = np.ones(len(rn), bool)
        first[1:] = rn[1:] != rn[:-1]
        new = lab.copy()
        new[rn[first]] = rl[first]
        moved = (new != lab).sum()
        lab = new
        if moved < n // 200:
            break
    perm = np.argsort(lab, kind="stable")      # new order: old id perm[i]
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    print(f"LP: rounds={it+1} t={time.time()-t0:.1f}s "
          f"clusters={len(np.unique(lab))}", flush=True)
    return inv                                  # new_id = inv[old_id]


def cell_stats(p, tag):
    cp = np.asarray(p.cell_ptr)
    sz = np.diff(cp)
    nz = sz[sz > 0]
    e = sz.sum()
    # run stats: receivers within cells are sorted; count runs
    rr = np.asarray(p.receivers)
    runs = 1 + np.sum(rr[1:] != rr[:-1]) if len(rr) else 0
    print(f"{tag}: cells={len(sz)} nonempty={len(nz)} "
          f"mean_e/nonempty={e/max(len(nz),1):.0f} "
          f"mean_run_len={len(rr)/max(runs,1):.2f}", flush=True)


def _rundetect_kernel(cell_ptr_ref,
                      vals_win, senders_hbm, receivers_hbm, edge_w_hbm,
                      *refs,
                      ops, block_rows, window_rows, chunk, f, has_w,
                      s_blocks):
    n_out = len(ops)
    outs = refs[:n_out]
    (run_buf, sidx, ridx, wbuf, sem_idx, sem_w) = refs[n_out:]

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
        cp_w = pltpu.make_async_copy(
            edge_w_hbm.at[pl.ds(c0, chunk)], wbuf, sem_w)
        cp_w.start()
        cp_w.wait()
        cp_s.wait()
        cp_r.wait()

        zero = jnp.zeros((1, f), jnp.float32)
        neg = jnp.full((1, f), NEG_BIG, jnp.float32)

        def flush(r_run):
            outs[0][pl.ds(r_run, 1), :] = \
                outs[0][pl.ds(r_run, 1), :] + run_buf[0:1, :]
            outs[1][pl.ds(r_run, 1), :] = \
                outs[1][pl.ds(r_run, 1), :] + run_buf[1:2, :]
            outs[2][pl.ds(r_run, 1), :] = jnp.maximum(
                outs[2][pl.ds(r_run, 1), :], run_buf[2:3, :])

        def body(j, r_run):
            r = ridx[j] - row0
            row = vals_win[pl.ds(sidx[j] - col0, 1), :]
            changed = r != r_run

            @pl.when(changed)
            def _():
                flush(r_run)
                run_buf[0:1, :] = zero
                run_buf[1:2, :] = zero
                run_buf[2:3, :] = neg

            run_buf[0:1, :] = run_buf[0:1, :] + row * wbuf[j]
            run_buf[1:2, :] = run_buf[1:2, :] + row
            run_buf[2:3, :] = jnp.maximum(run_buf[2:3, :], row)
            return r

        # prime: empty run on the first edge's receiver (neutral partials)
        run_buf[0:1, :] = zero
        run_buf[1:2, :] = zero
        run_buf[2:3, :] = neg
        r0 = ridx[lo] - row0
        r_run = jax.lax.fori_loop(lo, n_e, body, r0)
        flush(r_run)
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)

    @pl.when(s == s_blocks - 1)
    def _():
        for op, o in zip(ops, outs):
            if op == "max":
                o[:] = jnp.where(o[:] <= NEG_BIG, 0.0, o[:])


def run_rundetect(vals, edge_w, p):
    chunk = 1024
    e = p.senders.shape[0]
    pad = (chunk - e % chunk) % chunk + chunk
    senders = jnp.pad(p.senders, (0, pad))
    receivers = jnp.pad(p.receivers, (0, pad))
    ew = jnp.pad(edge_w, (0, pad))
    kernel = functools.partial(
        _rundetect_kernel, ops=OPS, block_rows=p.block_rows,
        window_rows=p.window_rows, chunk=chunk, f=F, has_w=True,
        s_blocks=p.s_blocks)
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
            for _ in OPS),
        scratch_shapes=[
            pltpu.VMEM((8, F), jnp.float32),          # run partials
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.SMEM((chunk,), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    n_out = p.r_blocks * p.block_rows
    out_shapes = tuple(jax.ShapeDtypeStruct((n_out, F), jnp.float32)
                       for _ in OPS)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes,
    )(p.cell_ptr, vals, senders, receivers, ew)


def bench_order(senders, receivers, n, vals_np, tag):
    plan = build_kernel_plan(senders, receivers, n)
    p = plan.fwd
    cell_stats(p, f"{tag} fwd-plan")
    npad = plan.n_pad
    vals = jnp.asarray(
        np.pad(vals_np, ((0, npad - n), (0, 0))).astype(np.float32))
    e = len(senders)
    rng = np.random.default_rng(1)
    ew = jnp.asarray(rng.normal(size=(p.senders.shape[0],))
                     .astype(np.float32))

    @jax.jit
    def fwd(v, w):
        return windowed_gather_reduce(
            v, p.senders, p.receivers, p.cell_ptr,
            r_blocks=p.r_blocks, s_blocks=p.s_blocks,
            block_rows=p.block_rows, window_rows=p.window_rows,
            ops=OPS, edge_w=w)

    o_ref = fwd(vals, ew)
    t = timeit(fwd, vals, ew)
    print(f"{tag} production fwd : {t*1e3:7.1f} ms "
          f"({t/e*0.94e9:5.1f} cy/edge)", flush=True)

    b = plan.bwd
    coeff = jnp.asarray(rng.normal(size=(b.s_blocks * b.window_rows, 4 * F))
                        .astype(np.float32))
    ewb = jnp.asarray(rng.normal(size=(b.senders.shape[0],))
                      .astype(np.float32))

    @jax.jit
    def bwd(cf, v, w):
        return windowed_gather_reduce_bwd(
            cf, v, b.senders, b.receivers, b.cell_ptr,
            segs=("c_sum", "c_wsum", "mx", "c_max"),
            r_blocks=b.r_blocks, s_blocks=b.s_blocks,
            block_rows=b.block_rows, window_rows=b.window_rows, edge_w=w)

    vb = jnp.asarray(np.pad(vals_np, ((0, b.r_blocks * b.block_rows - n),
                                      (0, 0))).astype(np.float32))
    t = timeit(bwd, coeff, vb, ewb)
    print(f"{tag} production bwd : {t*1e3:7.1f} ms "
          f"({t/e*0.94e9:5.1f} cy/edge)", flush=True)

    import sys
    if "--rd" not in sys.argv:
        return

    @jax.jit
    def rd(v, w):
        return run_rundetect(v, w, p)

    o_rd = rd(vals, ew)
    for a, bb in zip(o_ref, o_rd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-5, atol=1e-4)
    t = timeit(rd, vals, ew)
    print(f"{tag} run-detect fwd : {t*1e3:7.1f} ms "
          f"({t/e*0.94e9:5.1f} cy/edge)", flush=True)


def main():
    raw = synthetic.synthetic_full_graph(
        num_nodes=169_343, avg_degree=14, num_classes=40, num_features=128,
        seed=0)
    senders = np.asarray(raw["senders"])
    receivers = np.asarray(raw["receivers"])
    n = 169_343
    rng = np.random.default_rng(0)
    vals_np = rng.normal(size=(n, F)).astype(np.float32)

    bench_order(senders, receivers, n, vals_np, "orig     ")

    inv = lp_relabel(senders, receivers, n)
    s2 = inv[senders].astype(np.int32)
    r2 = inv[receivers].astype(np.int32)
    perm = np.argsort(inv)            # vals_new[i] = vals_old[perm[i]]
    bench_order(s2, r2, n, vals_np[perm], "clustered")


if __name__ == "__main__":
    main()
