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
if __name__ == "__main__" and len(sys.argv) == 1:
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
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
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


def probe_pack(packed: bool):
    """unroll=1 loop body, two add-prims: packed [1,2F] RMW vs 2 RMWs."""
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

        def body(j, _):
            s = sidx[j]
            row = win_ref[pl.ds(s, 1), :]
            r = ridx[j]
            wv = wbuf[j]
            if packed:
                pk = jnp.concatenate([row, row * wv], axis=1)
                out_ref[pl.ds(r, 1), :] += pk
            else:
                out_ref[pl.ds(r, 1), 0:F] += row
                out_ref[pl.ds(r, 1), F:2 * F] += row * wv
            return 0

        jax.lax.fori_loop(0, C, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((WR, F), lambda c, m: (m[c, 0], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((BR, 2 * F), lambda c, m: (m[c, 1], 0),
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
            out_shape=jax.ShapeDtypeStruct((n, 2 * F), jnp.float32),
        )(meta, vals, sidx, ridx, w)

    t = timeit(f, vals, sidx, ridx, w)
    cy = t / e * 0.94e9
    print(f"pack={packed}: {t*1e3:.2f} ms -> {cy:.1f} cy/edge", flush=True)
    return np.asarray(f(vals, sidx, ridx, w))


if __name__ == "__main__" and "pack" in sys.argv:
    a = probe_pack(True)
    b = probe_pack(False)
    np.testing.assert_allclose(a, b, rtol=1e-5)
    print("pack outputs match", flush=True)


def probe_attn(variant: str):
    """Attention-fwd-like loop variants to find the 350 cy/edge hot op.

    variant: full | norepeat | noconcat | minimal
    """
    rng = np.random.default_rng(0)
    H, cp = 8, 32
    hcp = H * cp
    BRA, WRA = 1024, 1024
    n = 4096
    nc = 512
    e = nc * C
    meta = np.zeros((nc, 4), np.int32)
    meta[:, 0] = rng.integers(0, n // WRA, nc)
    meta[:, 1] = np.sort(rng.integers(0, n // BRA, nc))
    first = np.ones(nc, np.int32)
    first[1:] = meta[1:, 1] != meta[:-1, 1]
    meta[:, 2] = first
    sidx = rng.integers(0, WRA, nc * C).astype(np.int32)
    ridx = rng.integers(0, BRA, nc * C).astype(np.int32)
    src = rng.normal(size=(n, hcp + 128)).astype(np.float32)
    adst = rng.normal(size=(n, 128)).astype(np.float32)

    def kernel(meta_ref, win_ref, adst_ref, sidx_hbm, ridx_hbm,
               o_out, md_out, sidx, ridx, sems):
        c = pl.program_id(0)

        @pl.when(meta_ref[c, 2] == 1)
        def _():
            o_out[:] = jnp.zeros_like(o_out)
            md_out[:] = jnp.zeros_like(md_out)

        c0 = pl.multiple_of(c * C, C)
        cp_s = pltpu.make_async_copy(sidx_hbm.at[pl.ds(c0, C)], sidx,
                                     sems.at[0])
        cp_r = pltpu.make_async_copy(ridx_hbm.at[pl.ds(c0, C)], ridx,
                                     sems.at[1])
        cp_s.start(); cp_r.start(); cp_s.wait(); cp_r.wait()

        def body(j, _):
            s = sidx[j]
            row = win_ref[pl.ds(s, 1), :]
            wh = row[:, :hcp]
            r = ridx[j]
            if variant == "minimal":
                o_out[pl.ds(r, 1), :] += wh
                return 0
            asrc = row[:, hcp:hcp + 64]
            z = asrc + adst_ref[pl.ds(r, 1), 0:64]
            ee = jnp.where(z >= 0, z, 0.2 * z)
            cur = md_out[pl.ds(r, 1), :]
            m_old = cur[:, 0:64]
            d_old = cur[:, 64:128]
            m_new = jnp.maximum(m_old, ee)
            corr = jnp.exp(m_old - m_new)
            p = jnp.exp(ee - m_new)
            d_new = d_old * corr + p
            if variant == "noconcat":
                md_out[pl.ds(r, 1), 0:64] = m_new
                md_out[pl.ds(r, 1), 64:128] = d_new
            else:
                md_out[pl.ds(r, 1), :] = jnp.concatenate([m_new, d_new],
                                                         axis=1)
            if variant == "norepeat":
                o_out[pl.ds(r, 1), :] = o_out[pl.ds(r, 1), :] * 0.5 + wh
            else:
                corr_e = pltpu.repeat(corr[:, :H], cp, axis=1)
                p_e = pltpu.repeat(p[:, :H], cp, axis=1)
                o_out[pl.ds(r, 1), :] = (o_out[pl.ds(r, 1), :] * corr_e
                                         + p_e * wh)
            return 0

        jax.lax.fori_loop(0, C, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((WRA, hcp + 128), lambda c, m: (m[c, 0], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BRA, 128), lambda c, m: (m[c, 1], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((BRA, hcp), lambda c, m: (m[c, 1], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BRA, 128), lambda c, m: (m[c, 1], 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((C,), jnp.int32),
            pltpu.SMEM((C,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    @jax.jit
    def f(src, adst, sidx, ridx):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((n, hcp), jnp.float32),
                       jax.ShapeDtypeStruct((n, 128), jnp.float32)),
        )(meta, src, adst, sidx, ridx)

    t = timeit(f, src, adst, sidx, ridx)
    cy = t / e * 0.94e9
    print(f"attn {variant}: {t*1e3:.2f} ms -> {cy:.1f} cy/edge", flush=True)


if __name__ == "__main__" and "attn" in sys.argv:
    for v in ("minimal", "norepeat", "noconcat", "full"):
        try:
            probe_attn(v)
        except Exception as ex:  # noqa
            print(f"attn {v} failed: {type(ex).__name__}: {str(ex)[:150]}",
                  flush=True)


def probe_bwd(variant: str):
    """Attention-bwd-like loop: the per-head dot q = sum_c g.wh per edge.

    variant: fold (slice-halving chain) | roll (circular log-doubling,
    replicated result) | matmul (block-diag const) | noq (skip q)
    """
    rng = np.random.default_rng(0)
    H, cp = 8, 32
    hcp = H * cp
    BRA, WRA = 1024, 512
    n = 4096
    nc = 512
    e = nc * C
    meta = np.zeros((nc, 4), np.int32)
    meta[:, 0] = rng.integers(0, n // WRA, nc)
    meta[:, 1] = np.sort(rng.integers(0, n // BRA, nc))
    first = np.ones(nc, np.int32)
    first[1:] = meta[1:, 1] != meta[:-1, 1]
    meta[:, 2] = first
    sidx = rng.integers(0, WRA, nc * C).astype(np.int32)
    ridx = rng.integers(0, BRA, nc * C).astype(np.int32)
    cof = rng.normal(size=(n, hcp + 128)).astype(np.float32)
    blk = rng.normal(size=(n, hcp + 128)).astype(np.float32)
    summat = np.kron(np.eye(H, dtype=np.float32),
                     np.ones((cp, cp), np.float32))     # [hcp, hcp]

    def kernel(meta_ref, cof_win, src_blk, summat_ref, sidx_hbm, ridx_hbm,
               out, sidx, ridx, sems):
        c = pl.program_id(0)

        @pl.when(meta_ref[c, 2] == 1)
        def _():
            out[:] = jnp.zeros_like(out)

        c0 = pl.multiple_of(c * C, C)
        cp_s = pltpu.make_async_copy(sidx_hbm.at[pl.ds(c0, C)], sidx,
                                     sems.at[0])
        cp_r = pltpu.make_async_copy(ridx_hbm.at[pl.ds(c0, C)], ridx,
                                     sems.at[1])
        cp_s.start(); cp_r.start(); cp_s.wait(); cp_r.wait()

        def body(j, _):
            s = sidx[j]
            row_cof = cof_win[pl.ds(s, 1), :]
            r = ridx[j]
            row_src = src_blk[pl.ds(r, 1), :]
            g_o = row_cof[:, :hcp]
            wh = row_src[:, :hcp]
            t = g_o * wh
            if variant == "noq":
                q_rep = t
            elif variant == "fold":
                width = hcp
                while width > H:
                    width //= 2
                    t = t[:, :width] + t[:, width:2 * width]
                q_rep = pltpu.repeat(t, cp, axis=1)
            elif variant == "roll":
                s_ = H
                while s_ < hcp:
                    t = t + pltpu.roll(t, s_, axis=1)
                    s_ *= 2
                q_rep = t
            elif variant == "matmul":
                q_rep = jnp.dot(t, summat_ref[:, :],
                                preferred_element_type=jnp.float32)
            ah = jnp.exp(row_cof[:, hcp:hcp + 64] -
                         row_src[:, hcp:hcp + 64])
            ah_e = pltpu.repeat(ah[:, :H], cp, axis=1)
            out[pl.ds(r, 1), :hcp] += ah_e * g_o + q_rep
            return 0

        jax.lax.fori_loop(0, C, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((WRA, hcp + 128), lambda c, m: (m[c, 0], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BRA, hcp + 128), lambda c, m: (m[c, 1], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),    # summat
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((BRA, hcp + 128), lambda c, m: (m[c, 1], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((C,), jnp.int32),
            pltpu.SMEM((C,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    @jax.jit
    def f(cof, blk, sidx, ridx):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n, hcp + 128), jnp.float32),
        )(meta, cof, blk, jnp.asarray(summat), sidx, ridx)

    t = timeit(f, cof, blk, sidx, ridx)
    cy = t / e * 0.94e9
    print(f"bwd {variant}: {t*1e3:.2f} ms -> {cy:.1f} cy/edge", flush=True)


if __name__ == "__main__" and "bwdq" in sys.argv:
    for v in ("noq", "roll", "fold", "matmul"):
        try:
            probe_bwd(v)
        except Exception as ex:  # noqa
            print(f"bwd {v} failed: {type(ex).__name__}: {str(ex)[:150]}",
                  flush=True)


def probe_cellgrid(variant: str, BRA: int = 1024, WRA: int = 1024):
    """Replicates the attention fwd grid (arxiv-scale) to localize the
    per-step overhead. variant: noop | dmaonly | loop | full"""
    rng = np.random.default_rng(0)
    H, cp2 = 8, 32
    hcp = H * cp2
    ntot = 172032
    R, S = ntot // BRA, ntot // WRA
    n = R * BRA
    epc = max(2368458 // (R * S), 1)
    e = R * S * epc
    cell_ptr = (np.arange(R * S + 1) * epc).astype(np.int32)
    sidx_h = rng.integers(0, WRA, e + 2048).astype(np.int32)
    ridx_h = rng.integers(0, BRA, e + 2048).astype(np.int32)
    src = rng.normal(size=(n, hcp + 128)).astype(np.float32)
    adst = rng.normal(size=(n, 128)).astype(np.float32)
    chunk = 1024

    def kernel(cp_ref, win_ref, adst_ref, sidx_hbm, ridx_hbm,
               o_out, md_out, sidx, ridx, sems):
        i = pl.program_id(0)
        s = pl.program_id(1)
        g = i * S + s

        @pl.when(s == 0)
        def _():
            o_out[:] = jnp.zeros_like(o_out)
            md_out[:] = jnp.zeros_like(md_out)

        if variant == "noop":
            return
        start = cp_ref[g]
        end = cp_ref[g + 1]
        c0 = pl.multiple_of((start // chunk) * chunk, chunk)
        cp_s = pltpu.make_async_copy(sidx_hbm.at[pl.ds(c0, chunk)], sidx,
                                     sems.at[0])
        cp_r = pltpu.make_async_copy(ridx_hbm.at[pl.ds(c0, chunk)], ridx,
                                     sems.at[1])
        cp_s.start(); cp_r.start(); cp_s.wait(); cp_r.wait()
        if variant == "dmaonly":
            return
        lo = start - c0
        n_e = end - c0

        def body(j, _):
            row = win_ref[pl.ds(sidx[j], 1), :]
            wh = row[:, :hcp]
            r = ridx[j]
            if variant == "loop":
                o_out[pl.ds(r, 1), :] += wh
                return 0
            asrc = row[:, hcp:hcp + 64]
            z = asrc + adst_ref[pl.ds(r, 1), 0:64]
            ee = jnp.where(z >= 0, z, 0.2 * z)
            cur = md_out[pl.ds(r, 1), :]
            m_old = cur[:, 0:64]
            d_old = cur[:, 64:128]
            m_new = jnp.maximum(m_old, ee)
            corr = jnp.exp(m_old - m_new)
            p = jnp.exp(ee - m_new)
            md_out[pl.ds(r, 1), :] = jnp.concatenate(
                [m_new, d_old * corr + p], axis=1)
            corr_e = pltpu.repeat(corr[:, :H], cp2, axis=1)
            p_e = pltpu.repeat(p[:, :H], cp2, axis=1)
            o_out[pl.ds(r, 1), :] = (o_out[pl.ds(r, 1), :] * corr_e
                                     + p_e * wh)
            return 0

        jax.lax.fori_loop(lo, n_e, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R, S),
        in_specs=[
            pl.BlockSpec((WRA, hcp + 128), lambda i, s, *_: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BRA, 128), lambda i, s, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((BRA, hcp), lambda i, s, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BRA, 128), lambda i, s, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    @jax.jit
    def f(src, adst, sidx, ridx):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((n, hcp), jnp.float32),
                       jax.ShapeDtypeStruct((n, 128), jnp.float32)),
        )(cell_ptr, src, adst, sidx, ridx)

    t = timeit(f, src, adst, sidx_h, ridx_h, steps=5)
    us = t / (R * S) * 1e6
    print(f"cellgrid {variant} BR={BRA} WR={WRA} (R={R} S={S} epc={epc}): "
          f"{t*1e3:.1f} ms -> {us:.2f} us/cell "
          f"({t/e*0.94e9:.1f} cy/edge)", flush=True)


if __name__ == "__main__" and "cellgrid" in sys.argv:
    for v in ("noop", "dmaonly", "loop", "full"):
        try:
            probe_cellgrid(v)
        except Exception as ex:  # noqa
            print(f"cellgrid {v} failed: {type(ex).__name__}: "
                  f"{str(ex)[:150]}", flush=True)


if __name__ == "__main__" and "cellsweep" in sys.argv:
    for (br, wr) in ((2048, 1024), (2048, 2048), (1024, 2048),
                     (2048, 4096)):
        for v in ("noop", "full"):
            try:
                probe_cellgrid(v, br, wr)
            except Exception as ex:  # noqa
                print(f"cellgrid {v} {br}x{wr} failed: "
                      f"{type(ex).__name__}: {str(ex)[:120]}", flush=True)


def probe_scratch_acc(BRA=2048, WRA=1024):
    """Attention fwd with SCRATCH accumulators, outputs written once per
    row-block — kills the per-step output writeback (S x N x width)."""
    rng = np.random.default_rng(0)
    H, cp2 = 8, 32
    hcp = H * cp2
    ntot = 172032
    R, S = ntot // BRA, ntot // WRA
    n = ntot
    epc = max(2368458 // (R * S), 1)
    e = R * S * epc
    chunk = 1024
    cell_ptr = (np.arange(R * S + 1) * epc).astype(np.int32)
    sidx_h = rng.integers(0, WRA, e + 2048).astype(np.int32)
    ridx_h = rng.integers(0, BRA, e + 2048).astype(np.int32)
    src = rng.normal(size=(n, hcp + 128)).astype(np.float32)
    adst = rng.normal(size=(n, 128)).astype(np.float32)

    def kernel(cp_ref, win_ref, adst_ref, sidx_hbm, ridx_hbm,
               o_out, md_out, o_acc, md_acc, sidx, ridx, sems):
        i = pl.program_id(0)
        s = pl.program_id(1)
        g = i * S + s

        @pl.when(s == 0)
        def _():
            o_acc[:] = jnp.zeros_like(o_acc)
            md_acc[:] = jnp.zeros_like(md_acc)

        start = cp_ref[g]
        end = cp_ref[g + 1]
        c0 = pl.multiple_of((start // chunk) * chunk, chunk)
        cp_s = pltpu.make_async_copy(sidx_hbm.at[pl.ds(c0, chunk)], sidx,
                                     sems.at[0])
        cp_r = pltpu.make_async_copy(ridx_hbm.at[pl.ds(c0, chunk)], ridx,
                                     sems.at[1])
        cp_s.start(); cp_r.start(); cp_s.wait(); cp_r.wait()
        lo = start - c0
        n_e = end - c0

        def body(j, _):
            row = win_ref[pl.ds(sidx[j], 1), :]
            wh = row[:, :hcp]
            r = ridx[j]
            asrc = row[:, hcp:hcp + 64]
            z = asrc + adst_ref[pl.ds(r, 1), 0:64]
            ee = jnp.where(z >= 0, z, 0.2 * z)
            cur = md_acc[pl.ds(r, 1), :]
            m_old = cur[:, 0:64]
            d_old = cur[:, 64:128]
            m_new = jnp.maximum(m_old, ee)
            corr = jnp.exp(m_old - m_new)
            p = jnp.exp(ee - m_new)
            md_acc[pl.ds(r, 1), :] = jnp.concatenate(
                [m_new, d_old * corr + p], axis=1)
            corr_e = pltpu.repeat(corr[:, :H], cp2, axis=1)
            p_e = pltpu.repeat(p[:, :H], cp2, axis=1)
            o_acc[pl.ds(r, 1), :] = (o_acc[pl.ds(r, 1), :] * corr_e
                                     + p_e * wh)
            return 0

        jax.lax.fori_loop(lo, n_e, body, 0)

        @pl.when(s == S - 1)
        def _():
            o_out[:] = o_acc[:]
            md_out[:] = md_acc[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R, S),
        in_specs=[
            pl.BlockSpec((WRA, hcp + 128), lambda i, s, *_: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BRA, 128), lambda i, s, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((BRA, hcp), lambda i, s, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BRA, 128), lambda i, s, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((BRA, hcp), jnp.float32),
            pltpu.VMEM((BRA, 128), jnp.float32),
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    @jax.jit
    def f(src, adst, sidx, ridx):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((n, hcp), jnp.float32),
                       jax.ShapeDtypeStruct((n, 128), jnp.float32)),
        )(cell_ptr, src, adst, sidx, ridx)

    t = timeit(f, src, adst, sidx_h, ridx_h, steps=5)
    print(f"scratch-acc BR={BRA} WR={WRA} (R={R} S={S} epc={epc}): "
          f"{t*1e3:.1f} ms ({t/e*0.94e9:.1f} cy/edge)", flush=True)


if __name__ == "__main__" and "scratchacc" in sys.argv:
    for (br, wr) in ((2048, 1024), (1024, 1024), (4096, 1024)):
        try:
            probe_scratch_acc(br, wr)
        except Exception as ex:  # noqa
            print(f"scratch {br}x{wr} failed: {type(ex).__name__}: "
                  f"{str(ex)[:150]}", flush=True)
