"""Per-edge body cost breakdown for the fused GAT attention forward.

The production gat_fwd measures ~150 cy/edge while the EGC gather-reduce
body runs at ~13 cy/edge with the same loop/chunk machinery. Suspects:
the per-edge ``pltpu.repeat`` lane-tilings (head expansion) and the
lane-slice/concat ops on the packed [m | d] accumulator. Each variant
removes or replaces one piece; deltas localize the cost:

  full          current production body (packed md, 2x pltpu.repeat)
  norepeat      md math kept; head expansion + its muls dropped
  mdsplit       md as TWO full-lane scratches (no lane slicing/concat)
  mdsplit_mxu   mdsplit + head expansion via [1,128]x[128,hcp] MXU matmul
  phaseb_mxu    two-phase design phase B: stationary m (no md updates),
                exp + MXU expand + o RMW only
  minimal       o_acc[r] += wh (floor of loop + read + RMW)

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    scripts/probe_attn_body.py
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from egc_tpu.ops.pallas.gather_reduce import _chunk_pipeline

H, CP = 8, 32
HCP = H * CP
BR, WR = 2048, 1024
NTOT = 172032
CHUNK = 1024


def timeit(fn, *args, steps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / steps


def make_kernel(variant: str, s_blocks: int):
    def kernel(cell_ptr_ref, src_win, adst_blk, ex_in, senders_hbm,
               receivers_hbm, o_out, md_out,
               o_acc, m_acc, d_acc, sidx, ridx, sem_idx, sem_w, seq_ref):
        s = pl.program_id(1)
        i = pl.program_id(0)
        row0 = i * BR
        col0 = s * WR

        @pl.when(s == 0)
        def _():
            o_acc[:] = jnp.zeros_like(o_acc)
            m_acc[:] = jnp.full_like(m_acc, -3e38)
            d_acc[:] = jnp.zeros_like(d_acc)

        def process_chunk(base, lo, n_e):
            def body(j, _):
                row = src_win[pl.ds(sidx[base + j] - col0, 1), :]
                wh = row[:, :HCP]
                r = ridx[base + j] - row0
                if variant == "minimal":
                    o_acc[pl.ds(r, 1), :] = o_acc[pl.ds(r, 1), :] + wh
                    return 0
                if variant in ("full", "norepeat"):
                    # packed-md production body (m cols 0:64, d cols 64:128)
                    asrc = row[:, HCP:HCP + 64]
                    z = asrc + adst_blk[pl.ds(r, 1), 0:64]
                    e = jnp.where(z >= 0, z, 0.2 * z)
                    cur = m_acc[pl.ds(r, 1), :]
                    m_old = cur[:, 0:64]
                    d_old = cur[:, 64:128]
                    m_new = jnp.maximum(m_old, e)
                    corr = jnp.exp(m_old - m_new)
                    p = jnp.exp(e - m_new)
                    m_acc[pl.ds(r, 1), :] = jnp.concatenate(
                        [m_new, d_old * corr + p], axis=1)
                    if variant == "full":
                        corr_e = pltpu.repeat(corr[:, :H], CP, axis=1)
                        p_e = pltpu.repeat(p[:, :H], CP, axis=1)
                        o_acc[pl.ds(r, 1), :] = (
                            o_acc[pl.ds(r, 1), :] * corr_e + p_e * wh)
                    else:
                        o_acc[pl.ds(r, 1), :] = o_acc[pl.ds(r, 1), :] + wh
                    return 0
                # full-lane variants
                asrc = row[:, HCP:HCP + 128]
                z = asrc + adst_blk[pl.ds(r, 1), :]
                e = jnp.where(z >= 0, z, 0.2 * z)
                if variant == "phaseb_mxu":
                    p = jnp.exp(e - adst_blk[pl.ds(r, 1), :])  # stationary m
                    p_e = jax.lax.dot_general(
                        p, ex_in[...], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    o_acc[pl.ds(r, 1), :] = (o_acc[pl.ds(r, 1), :]
                                             + p_e * wh)
                    return 0
                m_old = m_acc[pl.ds(r, 1), :]
                d_old = d_acc[pl.ds(r, 1), :]
                m_new = jnp.maximum(m_old, e)
                corr = jnp.exp(m_old - m_new)
                p = jnp.exp(e - m_new)
                m_acc[pl.ds(r, 1), :] = m_new
                d_acc[pl.ds(r, 1), :] = d_old * corr + p
                if variant == "mdsplit":
                    corr_e = pltpu.repeat(corr[:, :H], CP, axis=1)
                    p_e = pltpu.repeat(p[:, :H], CP, axis=1)
                else:                         # mdsplit_mxu
                    corr_e = jax.lax.dot_general(
                        corr, ex_in[...], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    p_e = jax.lax.dot_general(
                        p, ex_in[...], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                o_acc[pl.ds(r, 1), :] = (o_acc[pl.ds(r, 1), :] * corr_e
                                         + p_e * wh)
                return 0

            jax.lax.fori_loop(lo, n_e, body, 0)

        _chunk_pipeline(cell_ptr_ref, CHUNK, s_blocks, sidx, ridx, None,
                        sem_idx, sem_w, seq_ref,
                        (senders_hbm, receivers_hbm, None), process_chunk)

        @pl.when(s == s_blocks - 1)
        def _():
            o_out[:] = o_acc[:]
            md_out[:] = m_acc[:]

    return kernel


def run(variant: str):
    rng = np.random.default_rng(0)
    R, S = NTOT // BR, NTOT // WR
    n = NTOT
    epc = max(2368458 // (R * S), 1)
    e = R * S * epc
    cell_ptr = (np.arange(R * S + 1) * epc).astype(np.int32)
    # GLOBAL node ids consistent with each edge's (block, window) cell —
    # the kernel subtracts row0/col0 like the production plans
    cells = np.arange(R * S)
    i_of = np.repeat(cells // S, epc)
    s_of = np.repeat(cells % S, epc)
    sidx_h = np.concatenate([
        s_of * WR + rng.integers(0, WR, e),
        np.zeros(2 * CHUNK, np.int64)]).astype(np.int32)
    ridx_h = np.concatenate([
        i_of * BR + rng.integers(0, BR, e),
        np.zeros(2 * CHUNK, np.int64)]).astype(np.int32)
    src = rng.normal(size=(n, HCP + 128)).astype(np.float32)
    adst = rng.normal(size=(n, 128)).astype(np.float32)
    ex = np.zeros((128, HCP), np.float32)
    for h in range(H):
        for c in range(CP):
            ex[h, c * H + h] = 1.0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R, S),
        in_specs=[
            pl.BlockSpec((WR, HCP + 128), lambda i, s, *_: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, 128), lambda i, s, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),     # EX (replicated)
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((BR, HCP), lambda i, s, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, 128), lambda i, s, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((BR, HCP), jnp.float32),
            pltpu.VMEM((BR, 128), jnp.float32),
            pltpu.VMEM((BR, 128), jnp.float32),
            pltpu.SMEM((2 * CHUNK,), jnp.int32),
            pltpu.SMEM((2 * CHUNK,), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = make_kernel(variant, S)

    @jax.jit
    def f(src, adst, ex, sidx, ridx):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((n, HCP), jnp.float32),
                       jax.ShapeDtypeStruct((n, 128), jnp.float32)),
        )(cell_ptr, src, adst, ex, sidx, ridx)

    t = timeit(f, src, adst, ex, sidx_h, ridx_h)
    print(f"attn-body {variant:13s}: {t*1e3:7.1f} ms "
          f"-> {t/e*0.94e9:6.1f} cy/edge ({t/(R*S)*1e6:5.1f} us/cell)",
          flush=True)


if __name__ == "__main__":
    variants = sys.argv[1:] or ("minimal", "norepeat", "full", "mdsplit",
                                "mdsplit_mxu", "phaseb_mxu")
    for v in variants:
        try:
            run(v)
        except Exception as ex:  # noqa
            print(f"attn-body {v} failed: {type(ex).__name__}: "
                  f"{str(ex)[:200]}", flush=True)
