"""Feasibility probes for the chunk-grid edge-sweep kernel redesign.

Tests on the real TPU:
1. index_map driven by a scalar-prefetch ref (block-sparse window streaming)
2. SMEM BlockSpec streaming of per-chunk index rows
3. packed additive RMW ([1, 2F] concat) vs separate RMWs
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, steps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / steps


C = 1024
WR = 1024
BR = 4096
F = 128


def probe1_kernel(meta_ref, win_ref, sidx_ref, ridx_ref, out_ref):
    c = pl.program_id(0)

    @pl.when(meta_ref[c, 2] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(j, _):
        s = sidx_ref[0, j]

        @pl.when(s >= 0)
        def _():
            row = win_ref[pl.ds(s, 1), :]
            r = ridx_ref[0, j]
            out_ref[pl.ds(r, 1), :] += row
        return 0

    jax.lax.fori_loop(0, C, body, 0, unroll=False)


def run_probe(smem_idx: bool, packed: int = 0):
    """packed=0: probe1 (1 RMW). packed=2: concat 2F RMW. packed=-2: two
    separate RMWs."""
    rng = np.random.default_rng(0)
    n = BR * 2
    nc = 512                      # chunks
    e = nc * C
    meta = np.zeros((nc, 4), np.int32)
    meta[:, 0] = rng.integers(0, n // WR, nc)      # window id
    meta[:, 1] = np.sort(rng.integers(0, n // BR, nc))
    first = np.ones(nc, np.int32)
    first[1:] = meta[1:, 1] != meta[:-1, 1]
    meta[:, 2] = first
    sidx = rng.integers(0, WR, (nc, C)).astype(np.int32)
    ridx = rng.integers(0, BR, (nc, C)).astype(np.int32)
    w = rng.normal(size=(nc, C)).astype(np.float32)
    vals = rng.normal(size=(n, F)).astype(np.float32)

    idx_space = pltpu.SMEM if smem_idx else pltpu.VMEM

    if packed == 0:
        kernel = probe1_kernel
        out_shape = jax.ShapeDtypeStruct((n, F), jnp.float32)
        out_spec = pl.BlockSpec((BR, F), lambda c, m: (m[c, 1], 0),
                                memory_space=pltpu.VMEM)
        extra_in = []
        extra_specs = []
    else:
        def kernel(meta_ref, win_ref, sidx_ref, ridx_ref, w_ref, out_ref):
            c = pl.program_id(0)

            @pl.when(meta_ref[c, 2] == 1)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            def body(j, _):
                s = sidx_ref[0, j]

                @pl.when(s >= 0)
                def _():
                    row = win_ref[pl.ds(s, 1), :]
                    r = ridx_ref[0, j]
                    wv = w_ref[0, j]
                    if packed > 0:
                        pk = jnp.concatenate([row, row * wv], axis=1)
                        out_ref[pl.ds(r, 1), :] += pk
                    else:
                        out_ref[pl.ds(r, 1), 0:F] += row
                        out_ref[pl.ds(r, 1), F:2 * F] += row * wv
                return 0

            jax.lax.fori_loop(0, C, body, 0, unroll=False)

        out_shape = jax.ShapeDtypeStruct((n, 2 * F), jnp.float32)
        out_spec = pl.BlockSpec((BR, 2 * F), lambda c, m: (m[c, 1], 0),
                                memory_space=pltpu.VMEM)
        extra_in = [w]
        extra_specs = [pl.BlockSpec((1, C), lambda c, m: (c, 0),
                                    memory_space=idx_space)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((WR, F), lambda c, m: (m[c, 0], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda c, m: (c, 0),
                         memory_space=idx_space),
            pl.BlockSpec((1, C), lambda c, m: (c, 0),
                         memory_space=idx_space),
        ] + extra_specs,
        out_specs=out_spec,
    )

    @jax.jit
    def f(vals, sidx, ridx, *extra):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
        )(meta, vals, sidx, ridx, *extra)

    t = timeit(f, vals, sidx, ridx, *[jnp.asarray(x) for x in extra_in])
    cy = t / e * 0.94e9
    name = f"smem={smem_idx} packed={packed}"
    print(f"{name}: {t*1e3:.2f} ms for {e} edges -> {cy:.1f} cy/edge",
          flush=True)
    return f(vals, sidx, ridx, *[jnp.asarray(x) for x in extra_in])


import sys
if __name__ == "__main__" and "unroll" not in sys.argv:
    print("# probe 1: scalar-ref index_map + idx streaming", flush=True)
    out_v = run_probe(smem_idx=False)
    try:
        out_s = run_probe(smem_idx=True)
        np.testing.assert_allclose(np.asarray(out_v), np.asarray(out_s),
                                   rtol=1e-5)
        print("smem/vmem outputs match", flush=True)
    except Exception as ex:  # noqa
        print(f"SMEM streaming failed: {type(ex).__name__}: {ex}",
              flush=True)
    print("# probe 2: packed vs separate RMW", flush=True)
    for p in (2, -2):
        for sm in (True, False):
            try:
                run_probe(smem_idx=sm, packed=p)
            except Exception as ex:  # noqa
                print(f"packed={p} smem={sm} failed: "
                      f"{type(ex).__name__}: {ex}", flush=True)


def probe_unroll(unroll: int, bf16: bool = False):
    """Accumulate loop with manual SMEM idx DMA (like the real kernel),
    manually unrolled WITHOUT predication — measures whether Mosaic
    overlaps independent dynamic VMEM ops."""
    rng = np.random.default_rng(0)
    n = BR * 2
    nc = 512
    e = nc * C
    meta = np.zeros((nc, 4), np.int32)
    meta[:, 0] = rng.integers(0, n // WR, nc)
    meta[:, 1] = np.sort(rng.integers(0, n // BR, nc))
    first = np.ones(nc, np.int32)
    first[1:] = meta[1:, 1] != meta[:-1, 1]
    meta[:, 2] = first
    sidx = rng.integers(0, WR, nc * C).astype(np.int32)
    ridx = rng.integers(0, BR, nc * C).astype(np.int32)
    w = (rng.normal(size=nc * C) + 3.0).astype(np.float32)
    dt = jnp.bfloat16 if bf16 else jnp.float32
    vals = rng.normal(size=(n, F)).astype(np.float32)

    def kernel(meta_ref, win_ref, sidx_hbm, ridx_hbm, w_hbm, out_ref,
               sidx, ridx, wbuf, sems):
        c = pl.program_id(0)

        @pl.when(meta_ref[c, 2] == 1)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        c0 = pl.multiple_of(c * C, C)
        cp_s = pltpu.make_async_copy(sidx_hbm.at[pl.ds(c0, C)], sidx,
                                     sems.at[0])
        cp_r = pltpu.make_async_copy(ridx_hbm.at[pl.ds(c0, C)], ridx,
                                     sems.at[1])
        cp_w = pltpu.make_async_copy(w_hbm.at[pl.ds(c0, C)], wbuf,
                                     sems.at[2])
        cp_s.start(); cp_r.start(); cp_w.start()
        cp_s.wait(); cp_r.wait(); cp_w.wait()

        def body(jg, _):
            j0 = jg * unroll
            for u in range(unroll):
                j = j0 + u
                s = sidx[j]
                valid = (wbuf[j] != 0.0).astype(jnp.float32)
                row = win_ref[pl.ds(s, 1), :].astype(jnp.float32) * valid
                r = ridx[j]
                out_ref[pl.ds(r, 1), :] += row
            return 0

        jax.lax.fori_loop(0, C // unroll, body, 0, unroll=False)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((WR, F), lambda c, m: (m[c, 0], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((BR, F), lambda c, m: (m[c, 1], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((C,), jnp.int32),
            pltpu.SMEM((C,), jnp.int32),
            pltpu.SMEM((C,), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )

    @jax.jit
    def f(vals, sidx, ridx, w):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n, F), jnp.float32),
        )(meta, vals.astype(dt), sidx, ridx, w)

    t = timeit(f, vals, sidx, ridx, w)
    cy = t / e * 0.94e9
    print(f"unroll={unroll} bf16={bf16}: {t*1e3:.2f} ms -> {cy:.1f} cy/edge",
          flush=True)
    return np.asarray(f(vals, sidx, ridx, w))


def main_unroll():
    ref = None
    for u in (1, 2, 4, 8):
        try:
            out = probe_unroll(u)
            if ref is None:
                ref = out
            else:
                np.testing.assert_allclose(out, ref, rtol=1e-5)
        except Exception as ex:  # noqa
            print(f"unroll={u} failed: {type(ex).__name__}: {str(ex)[:150]}",
                  flush=True)
    try:
        probe_unroll(4, bf16=True)
    except Exception as ex:  # noqa
        print(f"bf16 failed: {type(ex).__name__}: {str(ex)[:150]}",
              flush=True)


if __name__ == "__main__" and "unroll" in sys.argv:
    main_unroll()
