"""Per-edge cost probe for GATv2 fwd body redesigns (arxiv-scale plan).

variants:
  current   production _v2_fwd_kernel body (head_reduce folds + repeats)
  dotfold   full-lane online softmax; per-head fold + copy-broadcast as ONE
            [1,hcp] @ [hcp,hcp] MXU matmul against a 0/1 FOLD matrix;
            denominator rides a ones channel of wl; m kept expanded in a
            second scratch accumulator (2 RMWs total)

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    scripts/probe_v2_body.py
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
import egc_tpu.ops.pallas.attention as attn

H, CP = 8, 16          # GATv2 arxiv h112 H8 -> C=14, cp=16
HCP = H * CP
NEG_BIG = attn.NEG_BIG


def timeit(fn, *args, steps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / steps


def dotfold_kernel(cell_ptr_ref,
                   src_win, dst_blk, att_in, fold_in,
                   senders_hbm, receivers_hbm,
                   o_out, m_out,
                   o_acc, m_acc, sidx, ridx, sem_idx, sem_w, seq_ref, *,
                   heads, cp, slope, block_rows, window_rows, chunk,
                   s_blocks):
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

    def process_chunk(base, lo, n_e):
        def body(j, _):
            wl = src_win[pl.ds(sidx[base + j] - col0, 1), :]   # [1, hcp]
            r = ridx[base + j] - row0
            wr = dst_blk[pl.ds(r, 1), :]
            z = wl + wr
            lr = jnp.where(z >= 0, z, slope * z)
            t = lr * attv
            e_e = jax.lax.dot_general(
                t, fold, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # [1, hcp]
            m_old = m_acc[pl.ds(r, 1), :]
            m_new = jnp.maximum(m_old, e_e)
            corr = jnp.exp(m_old - m_new)
            p = jnp.exp(e_e - m_new)
            o_acc[pl.ds(r, 1), :] = o_acc[pl.ds(r, 1), :] * corr + p * wl
            m_acc[pl.ds(r, 1), :] = m_new
            return 0

        jax.lax.fori_loop(lo, n_e, body, 0)

    _chunk_sweep(cell_ptr_ref, chunk, s_blocks, sidx, ridx, None,
                 sem_idx, sem_w, seq_ref,
                 (senders_hbm, receivers_hbm, None), process_chunk)

    @pl.when(s == s_blocks - 1)
    def _():
        o_out[:] = o_acc[:]
        m_out[:] = m_acc[:]


def run_dotfold(whl, whr, att_rep, fold, f):
    n = whl.shape[0]
    e = f.senders.shape[0]
    pad = (1024 - e % 1024) % 1024 + 1024
    senders = jnp.pad(f.senders, (0, pad))
    receivers = jnp.pad(f.receivers, (0, pad))
    kernel = functools.partial(
        dotfold_kernel, heads=H, cp=CP, slope=0.2,
        block_rows=f.block_rows, window_rows=f.window_rows,
        chunk=1024, s_blocks=f.s_blocks)
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
            pltpu.SMEM((2 * 1024,), jnp.int32),
            pltpu.SMEM((2 * 1024,), jnp.int32),
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


def main():
    raw = synthetic.synthetic_full_graph(
        num_nodes=169_343, avg_degree=14, num_classes=40, num_features=128,
        seed=0)
    senders = np.asarray(raw["senders"])
    receivers = np.asarray(raw["receivers"])
    e = len(senders)
    plan = build_kernel_plan(senders, receivers, 169_343)
    n = plan.n_pad
    rng = np.random.default_rng(0)
    whl = jnp.asarray(rng.normal(size=(n, HCP)).astype(np.float32))
    whr = jnp.asarray(rng.normal(size=(n, HCP)).astype(np.float32))
    att_rep = jnp.asarray(rng.normal(size=(8, HCP)).astype(np.float32))

    # FOLD[c*H+h, c'*H+h'] = 1 iff h == h'
    idx = np.arange(HCP)
    fold_np = (idx[:, None] % H == idx[None, :] % H).astype(np.float32)
    fold = jnp.asarray(fold_np)
    f = plan.fwd_attn

    @jax.jit
    def current(wl, wr, ar):
        return attn.gatv2_attention(wl, wr, ar, plan, heads=H, cp=CP)

    t = timeit(current, whl, whr, att_rep)
    print(f"v2 current fwd : {t*1e3:7.1f} ms ({t/e*0.94e9:6.1f} cy/edge)",
          flush=True)

    @jax.jit
    def dotfold(wl, wr, ar, fo):
        return run_dotfold(wl, wr, ar, fo, f)

    t = timeit(dotfold, whl, whr, att_rep, fold)
    print(f"v2 dotfold fwd : {t*1e3:7.1f} ms ({t/e*0.94e9:6.1f} cy/edge)",
          flush=True)


if __name__ == "__main__":
    main()
