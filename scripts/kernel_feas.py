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


C = 512
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


if __name__ == "__main__":
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
