"""Pallas TPU kernels: fused segment-softmax attention (GAT).

The reference's attention baselines ride torch_scatter's CUDA
scatter-softmax (reference ``experiments/arxiv/norm_models.py:77-91``,
``experiments/zinc/models.py:81-89``); the XLA fallback path in
``egc_tpu.nn.conv.attention`` needs multiple row-at-a-time gathers and
scatters per edge. This kernel computes the whole per-receiver softmax
weighted sum in ONE windowed pass using flash-attention-style online
normalization (running max ``m``, running denominator ``d``, unnormalized
accumulator ``o``), so each edge costs one window-row read plus two
accumulator updates.

GAT(v1) structure: the edge logit is ``leaky_relu(a_src[s] + a_dst[r])`` —
node-level per-head scalars — so the kernel streams packed sender rows
``[Wh | a_src]`` and keeps the receiver block's ``a_dst`` stationary.
(GATv2 needs a per-edge D-dimensional dot inside the nonlinearity and
stays on the XLA path for now.)

Packing/layout (H = heads, Cp = per-head channel count padded so that
H*Cp is a lane multiple). Head-INTERLEAVED columns: value col ``c*H + h``
holds Wh[h, c] — so the per-edge head expansion of the [H] softmax
scalars is a plain lane-tile (``pltpu.repeat`` tiles the whole pattern,
which matches this layout exactly).
- ``src_pack``  [n_pad, H*Cp + 128]: cols [:H*Cp] = interleaved Wh;
  last 128 cols: [0:H] = a_src (rest zero).
- ``adst``      [n_pad, 128]: cols [0:H] = a_dst.
- outputs: ``o`` [n_pad, H*Cp] (unnormalized), ``md`` [n_pad, 128]
  (cols [0:64] running max, cols [64:128] running denominator; H <= 64).

Self-loop and empty-receiver handling, normalization, and the final
``o / d`` happen in XLA on node-level arrays (exact online-softmax
combination) — see ``egc_tpu.nn.conv.attention``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -3.0e38


def _fwd_kernel(cell_ptr_ref,
                src_win, adst_blk, senders_hbm, receivers_hbm,
                o_out, md_out,
                sidx, ridx, sem_idx,
                *,
                heads: int, cp: int, slope: float,
                block_rows: int, window_rows: int, chunk: int,
                s_blocks: int):
    hcp = heads * cp
    i = pl.program_id(0)
    s = pl.program_id(1)
    start = cell_ptr_ref[i * s_blocks + s]
    end = cell_ptr_ref[i * s_blocks + s + 1]
    row0 = i * block_rows
    col0 = s * window_rows

    @pl.when(s == 0)
    def _():
        o_out[:] = jnp.zeros_like(o_out)
        md_out[:, 0:64] = jnp.full((block_rows, 64), NEG_BIG,
                                   md_out.dtype)
        md_out[:, 64:128] = jnp.zeros((block_rows, 64), md_out.dtype)

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
        cp_s.wait()
        cp_r.wait()

        def body(j, _):
            row = src_win[pl.ds(sidx[j] - col0, 1), :]     # [1, hcp+128]
            wh = row[:, :hcp]
            asrc = row[:, hcp:hcp + 64]                    # a_src cols
            r = ridx[j] - row0
            z = asrc + adst_blk[pl.ds(r, 1), 0:64]
            e = jnp.where(z >= 0, z, slope * z)            # leaky_relu
            cur = md_out[pl.ds(r, 1), :]
            m_old = cur[:, 0:64]
            d_old = cur[:, 64:128]
            m_new = jnp.maximum(m_old, e)
            corr = jnp.exp(m_old - m_new)
            p = jnp.exp(e - m_new)
            d_new = d_old * corr + p
            md_out[pl.ds(r, 1), :] = jnp.concatenate([m_new, d_new], axis=1)
            # per-head expansion: repeat each head scalar over its Cp lanes
            corr_e = pltpu.repeat(corr[:, :heads], cp, axis=1)
            p_e = pltpu.repeat(p[:, :heads], cp, axis=1)
            o_out[pl.ds(r, 1), :] = (o_out[pl.ds(r, 1), :] * corr_e
                                     + p_e * wh)
            return 0

        jax.lax.fori_loop(lo, n_e, body, 0)
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)


def gat_fwd(
    src_pack: jnp.ndarray,          # [n_pad, H*Cp + 128]
    adst: jnp.ndarray,              # [n_pad, 128]
    plan_senders: jnp.ndarray,
    plan_receivers: jnp.ndarray,
    cell_ptr: jnp.ndarray,
    *,
    heads: int, cp: int,
    r_blocks: int, s_blocks: int, block_rows: int, window_rows: int,
    slope: float = 0.2,
    chunk: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One fused pass -> (o [n_pad, H*Cp] unnormalized, md [n_pad, 128])."""
    n, fp = src_pack.shape
    hcp = heads * cp
    if fp != hcp + 128:
        raise ValueError(f"src_pack width {fp} != H*Cp+128 = {hcp + 128}")
    if heads > 64:
        raise ValueError("heads must be <= 64")
    if hcp % 128:
        raise ValueError("H*Cp must be a lane multiple")

    e = plan_senders.shape[0]
    pad = (chunk - e % chunk) % chunk + chunk
    plan_senders = jnp.pad(plan_senders, (0, pad))
    plan_receivers = jnp.pad(plan_receivers, (0, pad))

    kernel = functools.partial(
        _fwd_kernel, heads=heads, cp=cp, slope=slope,
        block_rows=block_rows, window_rows=window_rows, chunk=chunk,
        s_blocks=s_blocks)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r_blocks, s_blocks),
        in_specs=[
            pl.BlockSpec((window_rows, hcp + 128), lambda i, s, *_: (s, 0),
                         memory_space=pltpu.VMEM),    # streamed src rows
            pl.BlockSpec((block_rows, 128), lambda i, s, *_: (i, 0),
                         memory_space=pltpu.VMEM),    # stationary a_dst
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((block_rows, hcp), lambda i, s, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 128), lambda i, s, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n, hcp), src_pack.dtype),
                   jax.ShapeDtypeStruct((n, 128), src_pack.dtype)),
    )(cell_ptr, src_pack, adst, plan_senders, plan_receivers)


# ---------------------------------------------------------------------------
# Backward. For o_r = sum_s exp(e_sr - m_r) wh_s, d_r = sum_s exp(e_sr - m_r),
# m_r = max_s e_sr, with e_sr = leaky_relu(z_sr), z_sr = a_src[s] + a_dst[r]:
#
#   de_sr   = exp(e-m) (q_sr + G2_r) + 1[e_sr = m_r] * G3_r
#   q_sr    = sum_c g_o[r,h,c] wh[s,h,c]          (per-head dot)
#   G2_r    = g_d[r]
#   G3_r    = g_m[r] - sum_c o g_o (per head) - d_r g_d[r]
#   d_wh[s]   += exp(e-m) g_o[r]                  (head-expanded)
#   d_asrc[s] += de * lrelu'(z);  d_adst[r] += de * lrelu'(z)
#
# Pass T (transpose plan, out rows = senders) accumulates d_wh/d_asrc;
# pass F (forward plan, out rows = receivers) accumulates d_adst. Both
# recompute z/e/alpha from the packed node rows (flash-style recompute).
#
# coeff_pack [n_pad, H*Cp + 128]: cols [:H*Cp] = g_o (interleaved);
# trailing 128: [0:32]=a_dst, [32:64]=m, [64:96]=G2, [96:128]=G3 (H <= 32).
# Pad lanes must be packed ZERO (then alpha-hat=1, q=0, de=0: no NaNs).


def _head_reduce(t, heads: int, hcp: int):
    """Fold interleaved [1, H*Cp] -> per-head sums in cols [0:heads].

    Cp is a power of two; each fold halves the active width."""
    width = hcp
    while width > heads:
        width //= 2
        t = t[:, :width] + t[:, width:2 * width]
    return t                      # [1, heads]


def _edge_grad(row_src, row_cof, heads, hcp, slope):
    """Shared per-edge backward math. Returns (d_wh, dz128, q_dbg).

    row_src: [1, hcp+128] sender pack (wh | a_src);
    row_cof: [1, hcp+128] receiver coeff pack.
    dz128: [1, 128] with de*lrelu'(z) in cols [0:32] layout (H<=32).
    """
    wh = row_src[:, :hcp]
    asrc = row_src[:, hcp:hcp + 32]
    g_o = row_cof[:, :hcp]
    fld = row_cof[:, hcp:hcp + 128]
    adst = fld[:, 0:32]
    m = fld[:, 32:64]
    g2 = fld[:, 64:96]
    g3 = fld[:, 96:128]
    z = asrc + adst
    e = jnp.where(z >= 0, z, slope * z)
    ah = jnp.exp(e - m)                              # alpha-hat [1, 32]
    q = _head_reduce(g_o * wh, heads, hcp)           # [1, heads]
    q32 = jnp.concatenate([q, jnp.zeros((1, 32 - heads), wh.dtype)], axis=1)
    de = ah * (q32 + g2) + jnp.where(e >= m, g3, 0.0)
    dz = de * jnp.where(z >= 0, 1.0, slope)
    ah_e = pltpu.repeat(ah[:, :heads], hcp // heads, axis=1)
    d_wh = ah_e * g_o
    dz128 = jnp.concatenate([dz, jnp.zeros((1, 96), wh.dtype)], axis=1)
    return d_wh, dz128


def _bwd_t_kernel(cell_ptr_ref,
                  cof_win, src_blk, senders_hbm, receivers_hbm,
                  out,
                  sidx, ridx, sem_idx,
                  *,
                  heads: int, cp: int, slope: float,
                  block_rows: int, window_rows: int, chunk: int,
                  s_blocks: int):
    hcp = heads * cp
    i = pl.program_id(0)
    s = pl.program_id(1)
    start = cell_ptr_ref[i * s_blocks + s]
    end = cell_ptr_ref[i * s_blocks + s + 1]
    row0 = i * block_rows
    col0 = s * window_rows

    @pl.when(s == 0)
    def _():
        out[:] = jnp.zeros_like(out)

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
        cp_s.start(); cp_r.start(); cp_s.wait(); cp_r.wait()

        def body(j, _):
            # transpose plan: window = ORIGINAL receivers, block = senders
            row_cof = cof_win[pl.ds(sidx[j] - col0, 1), :]
            r = ridx[j] - row0
            row_src = src_blk[pl.ds(r, 1), :]
            d_wh, dz128 = _edge_grad(row_src, row_cof, heads, hcp, slope)
            out[pl.ds(r, 1), :] = out[pl.ds(r, 1), :] + \
                jnp.concatenate([d_wh, dz128], axis=1)
            return 0

        jax.lax.fori_loop(lo, n_e, body, 0)
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)


def _bwd_f_kernel(cell_ptr_ref,
                  src_win, cof_blk, senders_hbm, receivers_hbm,
                  out,
                  sidx, ridx, sem_idx,
                  *,
                  heads: int, cp: int, slope: float,
                  block_rows: int, window_rows: int, chunk: int,
                  s_blocks: int):
    hcp = heads * cp
    i = pl.program_id(0)
    s = pl.program_id(1)
    start = cell_ptr_ref[i * s_blocks + s]
    end = cell_ptr_ref[i * s_blocks + s + 1]
    row0 = i * block_rows
    col0 = s * window_rows

    @pl.when(s == 0)
    def _():
        out[:] = jnp.zeros_like(out)

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
        cp_s.start(); cp_r.start(); cp_s.wait(); cp_r.wait()

        def body(j, _):
            row_src = src_win[pl.ds(sidx[j] - col0, 1), :]
            r = ridx[j] - row0
            row_cof = cof_blk[pl.ds(r, 1), :]
            _d_wh, dz128 = _edge_grad(row_src, row_cof, heads, hcp, slope)
            out[pl.ds(r, 1), :] = out[pl.ds(r, 1), :] + dz128
            return 0

        jax.lax.fori_loop(lo, n_e, body, 0)
        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)


def _edge_pass(kernel_fn, win_arr, blk_arr, plan_dev, out_width, *,
               heads, cp, slope, chunk=1024):
    """Shared pallas_call wrapper for the two backward passes."""
    n = win_arr.shape[0]
    hcp = heads * cp
    senders = plan_dev.senders
    receivers = plan_dev.receivers
    e = senders.shape[0]
    pad = (chunk - e % chunk) % chunk + chunk
    senders = jnp.pad(senders, (0, pad))
    receivers = jnp.pad(receivers, (0, pad))
    kernel = functools.partial(
        kernel_fn, heads=heads, cp=cp, slope=slope,
        block_rows=plan_dev.block_rows, window_rows=plan_dev.window_rows,
        chunk=chunk, s_blocks=plan_dev.s_blocks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(plan_dev.r_blocks, plan_dev.s_blocks),
        in_specs=[
            pl.BlockSpec((plan_dev.window_rows, win_arr.shape[1]),
                         lambda i, s, *_: (s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((plan_dev.block_rows, blk_arr.shape[1]),
                         lambda i, s, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((plan_dev.block_rows, out_width),
                               lambda i, s, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, out_width), win_arr.dtype),
    )(plan_dev.cell_ptr, win_arr, blk_arr, senders, receivers)


def gat_attention(src_pack, adst, plan, *, heads: int, cp: int,
                  slope: float = 0.2):
    """Differentiable fused GAT edge-softmax primitive.

    Returns (o, md) as in ``gat_fwd``; the custom VJP runs the two
    backward passes above. ``plan`` is a GraphKernelPlan (fwd + bwd
    transpose layouts).
    """
    return _gat_attention_cached(heads, cp, slope)(src_pack, adst, plan)


@functools.lru_cache(maxsize=None)
def _gat_attention_cached(heads: int, cp: int, slope: float):
    hcp = heads * cp

    def impl(src_pack, adst, plan):
        f = plan.fwd_attn
        return gat_fwd(src_pack, adst, f.senders, f.receivers, f.cell_ptr,
                       heads=heads, cp=cp, r_blocks=f.r_blocks,
                       s_blocks=f.s_blocks, block_rows=f.block_rows,
                       window_rows=f.window_rows, slope=slope)

    @jax.custom_vjp
    def f(src_pack, adst, plan):
        return impl(src_pack, adst, plan)

    def f_fwd(src_pack, adst, plan):
        o, md = impl(src_pack, adst, plan)
        return (o, md), (src_pack, adst, plan, o, md)

    def f_bwd(residual, cts):
        import numpy as _np
        src_pack, adst, plan, o, md = residual
        g_o, g_md = cts
        m = md[:, 0:32]
        d = md[:, 64:96]
        g_m = g_md[:, 0:32]
        g_d = g_md[:, 64:96]
        # G3 = g_m - sum_c o*g_o (per head) - d*g_d   [n, 32]
        og = o * g_o
        n = o.shape[0]
        og_h = jnp.sum(og.reshape(n, cp, heads), axis=1)     # [n, heads]
        pad32 = jnp.zeros((n, 32 - heads), o.dtype)
        g3 = g_m - jnp.concatenate([og_h, pad32], axis=1) - d * g_d
        coeff = jnp.concatenate([
            g_o,
            adst[:, 0:32], m, g_d, g3,
        ], axis=1)                                           # [n, hcp+128]
        d_src = _edge_pass(_bwd_t_kernel, coeff, src_pack, plan.bwd_attn,
                           hcp + 128, heads=heads, cp=cp, slope=slope)
        d_adst128 = _edge_pass(_bwd_f_kernel, src_pack, coeff,
                               plan.fwd_attn,
                               128, heads=heads, cp=cp, slope=slope)
        # trailing 96 columns of d_src / cols >= 32 of d_adst are scratch
        d_src = jnp.concatenate(
            [d_src[:, :hcp + 32], jnp.zeros((n, 96), d_src.dtype)], axis=1)
        d_adst = jnp.concatenate(
            [d_adst128[:, :32], jnp.zeros((n, 96), d_src.dtype)], axis=1)

        def zero_ct(x):
            if x is None:
                return None
            if jnp.issubdtype(x.dtype, jnp.floating):
                return jnp.zeros_like(x)
            return _np.zeros(x.shape, jax.dtypes.float0)

        return d_src, d_adst, jax.tree.map(zero_ct, plan)

    f.defvjp(f_fwd, f_bwd)
    return f
