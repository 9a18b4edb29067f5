"""Two-phase (staged-MXU) GATv2 fwd body probe vs the production dotfold.

The production _v2_fwd_kernel pays an in-loop [1,hcp] @ [hcp,hcp] MXU dot
per edge (~80 of its ~113 cy/edge: serialized matmul latency). Two-phase
instead, per tile of T edges within a cell fragment:

  phase A: per-edge stage rows  t_k = lrelu(wl+wr) * att  -> stage[k]
  fold   : ONE [T,hcp] @ [hcp,hcp] MXU matmul for the whole tile
  phase B: per-edge online-softmax accumulate from the staged logits

Tiles need enough edges per grid cell to amortize: the production
attention plan averages <100 edges/cell (block 1024), so the probe also
measures a BIG-CELL plan (block 2048 x window 4096 -> ~670 edges/cell).

variants:
  current    production gatv2_attention fwd (default plan, in-loop dot)
  dotfold@big  production body on the big-cell plan (cell-size control)
  twophase@big two-phase body on the big-cell plan, T=256

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    scripts/probe_v2_twophase.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from egc_tpu.data import synthetic
from egc_tpu.ops.dispatch import build_kernel_plan, WindowPlanDev
from egc_tpu.ops.pallas.gather_reduce import make_window_plan_np
import egc_tpu.ops.pallas.attention as attn
from scripts.probe_v2_body import run_dotfold

H, CP = 8, 16          # GATv2 arxiv h112 H8 -> C=14, cp=16
HCP = H * CP
NEG_BIG = attn.NEG_BIG
T = 256


def timeit(fn, *args, steps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / steps


def twophase_kernel(cell_ptr_ref,
                    src_win, dst_blk, att_in, fold_in,
                    senders_hbm, receivers_hbm,
                    o_out, m_out,
                    o_acc, m_acc, stage, estage, sidx, ridx, sem_idx,
                    sem_w, seq_ref, *,
                    heads, cp, slope, block_rows, window_rows, chunk,
                    s_blocks, tile_=256):
    from egc_tpu.ops.pallas.gather_reduce import _chunk_sweep

    hcp = heads * cp
    i = pl.program_id(0)
    s = pl.program_id(1)
    row0 = i * block_rows
    col0 = s * window_rows
    attv = att_in[0:1, :]
    fold = fold_in[:, :]

    @pl.when(s == 0)
    def _():
        o_acc[:] = jnp.zeros_like(o_acc)
        m_acc[:] = jnp.full_like(m_acc, NEG_BIG)

    def accumulate(j, e_e):
        wl = src_win[pl.ds(sidx[j] - col0, 1), :]
        r = ridx[j] - row0
        m_old = m_acc[pl.ds(r, 1), :]
        m_new = jnp.maximum(m_old, e_e)
        corr = jnp.exp(m_old - m_new)
        p = jnp.exp(e_e - m_new)
        o_acc[pl.ds(r, 1), :] = o_acc[pl.ds(r, 1), :] * corr + p * wl
        m_acc[pl.ds(r, 1), :] = m_new

    def process_chunk(base, lo, n_e):
        n_full = (n_e - lo) // tile_

        def tile_body(t, _):
            t0 = base + lo + t * tile_

            def stage_body(k, _):
                wl = src_win[pl.ds(sidx[t0 + k] - col0, 1), :]
                wr = dst_blk[pl.ds(ridx[t0 + k] - row0, 1), :]
                z = wl + wr
                lr = jnp.where(z >= 0, z, slope * z)
                stage[pl.ds(k, 1), :] = lr * attv
                return 0

            jax.lax.fori_loop(0, tile_, stage_body, 0)
            estage[:] = jax.lax.dot_general(
                stage[:], fold, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            def acc_body(k, _):
                accumulate(t0 + k, estage[pl.ds(k, 1), :])
                return 0

            jax.lax.fori_loop(0, tile_, acc_body, 0)
            return 0

        jax.lax.fori_loop(0, n_full, tile_body, 0)

        def tail_body(j, _):
            wl = src_win[pl.ds(sidx[base + j] - col0, 1), :]
            wr = dst_blk[pl.ds(ridx[base + j] - row0, 1), :]
            z = wl + wr
            lr = jnp.where(z >= 0, z, slope * z)
            e_e = jax.lax.dot_general(
                lr * attv, fold, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            accumulate(base + j, e_e)
            return 0

        jax.lax.fori_loop(lo + n_full * tile_, n_e, tail_body, 0)

    _chunk_sweep(cell_ptr_ref, chunk, s_blocks, sidx, ridx, None,
                 sem_idx, sem_w, seq_ref,
                 (senders_hbm, receivers_hbm, None), process_chunk)

    @pl.when(s == s_blocks - 1)
    def _():
        o_out[:] = o_acc[:]
        m_out[:] = m_acc[:]


def run_twophase(whl, whr, att_rep, fold, f, chunk=1024, tile=None):
    global T
    if tile is not None:
        T = tile
    n = whl.shape[0]
    e = f.senders.shape[0]
    pad = (chunk - e % chunk) % chunk + chunk
    senders = jnp.pad(f.senders, (0, pad))
    receivers = jnp.pad(f.receivers, (0, pad))
    kernel = functools.partial(
        twophase_kernel, heads=H, cp=CP, slope=0.2,
        block_rows=f.block_rows, window_rows=f.window_rows,
        chunk=chunk, s_blocks=f.s_blocks, tile_=T)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(f.r_blocks, f.s_blocks),
        in_specs=[
            pl.BlockSpec((f.window_rows, HCP), lambda i, s, *_: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f.block_rows, HCP), lambda i, s, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((f.block_rows, HCP), lambda i, s, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f.block_rows, HCP), lambda i, s, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((f.block_rows, HCP), whl.dtype),
            pltpu.VMEM((f.block_rows, HCP), whl.dtype),
            pltpu.VMEM((T, HCP), whl.dtype),
            pltpu.VMEM((T, HCP), whl.dtype),
            pltpu.SMEM((2 * chunk,), jnp.int32),
            pltpu.SMEM((2 * chunk,), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n, HCP), whl.dtype),
                   jax.ShapeDtypeStruct((n, HCP), whl.dtype)),
    )(f.cell_ptr, whl, whr, att_rep, fold, senders, receivers)


def big_cell_plan(senders, receivers, num_nodes,
                  block_rows=2048, window_rows=4096):
    p = make_window_plan_np(senders, receivers, num_nodes,
                            block_rows=block_rows, window_rows=window_rows)
    return WindowPlanDev(
        senders=jnp.asarray(p["senders"]),
        receivers=jnp.asarray(p["receivers"]),
        cell_ptr=jnp.asarray(p["cell_ptr"]),
        edge_perm=jnp.asarray(p["perm"].astype(np.int32)),
        r_blocks=p["R"], s_blocks=p["S"],
        block_rows=p["block_rows"], window_rows=p["window_rows"]), p["n_pad"]


def main():
    raw = synthetic.synthetic_full_graph(
        num_nodes=169_343, avg_degree=14, num_classes=40, num_features=128,
        seed=0)
    senders = np.asarray(raw["senders"])
    receivers = np.asarray(raw["receivers"])
    e = len(senders)
    plan = build_kernel_plan(senders, receivers, 169_343)
    big, n_big = big_cell_plan(senders, receivers, plan.n_pad)
    assert n_big == plan.n_pad
    n = plan.n_pad
    rng = np.random.default_rng(0)
    whl = jnp.asarray(rng.normal(size=(n, HCP)).astype(np.float32))
    whr = jnp.asarray(rng.normal(size=(n, HCP)).astype(np.float32))
    att_rep = jnp.asarray(rng.normal(size=(8, HCP)).astype(np.float32))
    idx = np.arange(HCP)
    fold = jnp.asarray(
        (idx[:, None] % H == idx[None, :] % H).astype(np.float32))

    @jax.jit
    def dotfold_default(wl, wr, ar, fo):
        return run_dotfold(wl, wr, ar, fo, plan.fwd_attn)

    variants = [("dotfold@default", dotfold_default)]
    for chunk, tile in ((1024, 128), (1024, 256), (2048, 128),
                        (4096, 128), (4096, 256)):
        def mk(chunk=chunk, tile=tile, f=big):
            @jax.jit
            def fn(wl, wr, ar, fo):
                return run_twophase(wl, wr, ar, fo, f, chunk=chunk,
                                    tile=tile)
            return fn
        variants.append((f"twophase c{chunk} T{tile}   ", mk()))
    try:
        big8, n8 = big_cell_plan(senders, receivers, plan.n_pad,
                                 block_rows=2048, window_rows=8192)
        assert n8 == plan.n_pad
        def mk8():
            @jax.jit
            def fn(wl, wr, ar, fo):
                return run_twophase(wl, wr, ar, fo, big8, chunk=4096,
                                    tile=128)
            return fn
        variants.append(("twophase w8192 c4096 T128", mk8()))
    except Exception as exc:
        print(f"w8192 plan build failed: {exc}", flush=True)

    ref = None
    for name, fn in variants:
        try:
            out = fn(whl, whr, att_rep, fold)
            o = np.asarray(out[0])
        except Exception as exc:
            print(f"{name}: FAILED ({type(exc).__name__}: "
                  f"{str(exc)[:90]})", flush=True)
            continue
        if ref is None:
            ref = o
        else:
            err = np.max(np.abs(o - ref) / (np.abs(ref) + 1e-6))
            print(f"  {name} max rel err vs default: {err:.2e}", flush=True)
        t = timeit(fn, whl, whr, att_rep, fold)
        print(f"{name}: {t*1e3:7.1f} ms ({t/e*0.94e9:6.1f} cy/edge)",
              flush=True)


if __name__ == "__main__":
    main()
