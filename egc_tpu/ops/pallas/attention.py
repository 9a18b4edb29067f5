"""Pallas TPU kernels: fused segment-softmax attention (GAT).

The reference's attention baselines ride torch_scatter's CUDA
scatter-softmax (reference ``experiments/arxiv/norm_models.py:77-91``,
``experiments/zinc/models.py:81-89``); the XLA fallback path in
``egc_tpu.nn.conv.attention`` needs multiple row-at-a-time gathers and
scatters per edge. This kernel computes the whole per-receiver softmax
weighted sum in TWO windowed passes: a cheap 128-lane max sweep (the EGC
gather-reduce machinery) that exploits GAT(v1)'s max factorization
``m_r = leaky(max_s a_src + a_dst[r])``, then a STATIONARY-m attention
sweep (denominator ``d`` and unnormalized accumulator ``o`` only — no
online rescaling in the per-edge body).

GAT(v1) structure: the edge logit is ``leaky_relu(a_src[s] + a_dst[r])`` —
node-level per-head scalars — so the kernel streams packed sender rows
and keeps the receiver block's fields stationary.

FULL-LANE LAYOUT (the round-2 design rule): hardware probes measured
~24 cy/edge for every sub-128-lane vector op and ~70 cy/edge for every
``pltpu.repeat`` lane-tile inside the per-edge loop, vs ~2 cy for a full
[1, H*Cp] op — so ALL per-head scalars are pre-expanded (node-level, in
XLA, once) to the head-interleaved value layout (col ``c*H + h``), and
both the forward body and the backward recompute are pure full-lane
elementwise chains. H = heads; Cp = per-head channel count padded so
H*Cp is a lane multiple AND > C (one zero pad channel is packed as
CONSTANT 1 — the softmax denominator accumulates there inside the single
``o += p * wh`` RMW, and its cotangent folds back through the same
channel).
- ``src_pack``  [n_pad, 2*H*Cp]: [interleaved Wh (+ ones channel) |
  a_src tiled to the same layout].
- ``stat``      [n_pad, 2*H*Cp]: [a_dst tiled | m tiled] (m = the
  precomputed stationary per-receiver max).
- outputs: ``o`` [n_pad, H*Cp] (unnormalized; denominator in the ones
  channel); the ``gat_attention`` wrapper re-exposes the old
  ``md`` [n_pad, 128] contract ([0:64] max, [64:128] denominator).

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
                src_win, stat_blk, senders_hbm, receivers_hbm,
                o_out,
                o_acc, sidx, ridx, sem_idx, sem_w, seq_ref,
                *,
                heads: int, cp: int, slope: float,
                block_rows: int, window_rows: int, chunk: int,
                s_blocks: int):
    _fwd_body(cell_ptr_ref, src_win, stat_blk, senders_hbm, receivers_hbm,
              o_out, None, o_acc, None, sidx, ridx, sem_idx, sem_w, seq_ref,
              heads=heads, cp=cp, slope=slope, block_rows=block_rows,
              window_rows=window_rows, chunk=chunk, s_blocks=s_blocks)


def _fwd_dacc_kernel(cell_ptr_ref,
                     src_win, stat_blk, senders_hbm, receivers_hbm,
                     o_out, d_out,
                     o_acc, d_acc, sidx, ridx, sem_idx, sem_w, seq_ref,
                     *,
                     heads: int, cp: int, slope: float,
                     block_rows: int, window_rows: int, chunk: int,
                     s_blocks: int):
    """Forward variant for cp == C (no free value channel to carry the
    denominator): a second narrow RMW accumulates ``d_acc[r] += p[:, :128]``
    — the first 128 lanes of the full-lane ``p`` carry the per-head exp at
    lane ``c*H + h``, so lane ``h`` (the c=0 copy) is the denominator."""
    _fwd_body(cell_ptr_ref, src_win, stat_blk, senders_hbm, receivers_hbm,
              o_out, d_out, o_acc, d_acc, sidx, ridx, sem_idx, sem_w,
              seq_ref, heads=heads, cp=cp, slope=slope,
              block_rows=block_rows, window_rows=window_rows, chunk=chunk,
              s_blocks=s_blocks)


def _fwd_body(cell_ptr_ref,
              src_win, stat_blk, senders_hbm, receivers_hbm,
              o_out, d_out,
              o_acc, d_acc, sidx, ridx, sem_idx, sem_w, seq_ref,
              *,
              heads: int, cp: int, slope: float,
              block_rows: int, window_rows: int, chunk: int,
              s_blocks: int):
    """STATIONARY-m, FULL-LANE softmax sweep. GAT(v1)'s logit is monotone
    in the node-level a_src (leaky_relu is increasing, a_dst[r] constant
    per receiver), so the per-receiver max factorizes:

        m_r = max_s leaky(a_src[s] + a_dst[r]) = leaky(max_s a_src + a_dst)

    and is PRECOMPUTED with one cheap windowed max pass (the EGC
    gather-reduce machinery) before this kernel.

    All per-head scalars arrive PRE-EXPANDED to the interleaved value
    layout (col c*H + h), so the body has NO lane shuffles (pltpu.repeat
    of a [1, heads] slice measured ~+25 cy/edge) and NO sub-128-lane
    arithmetic — every op is a full [1, hcp] vector op:
    - ``src_win``  [n, 2*hcp]: [wh | a_src expanded]
    - ``stat_blk`` [n, 2*hcp]: [a_dst expanded | m expanded]
    The denominator rides a CONSTANT-1 value channel of ``wh``
    (``cp > C`` required), so the body is: 2 dynamic reads, z = add,
    leaky, one exp, one fma-RMW."""
    from egc_tpu.ops.pallas.gather_reduce import _chunk_sweep

    hcp = heads * cp
    i = pl.program_id(0)
    s = pl.program_id(1)
    row0 = i * block_rows
    col0 = s * window_rows

    # accumulate in SCRATCH; write the output block once per row block.
    # Pallas writes output buffers back to HBM on every grid step, which
    # costs S * N * width of silent writeback traffic (measured ~9 us/step
    # at arxiv scale) if the accumulators live in the output refs.
    @pl.when(s == 0)
    def _():
        o_acc[:] = jnp.zeros_like(o_acc)
        if d_acc is not None:
            d_acc[:] = jnp.zeros_like(d_acc)

    def process_chunk(base, lo, n_e):
        def body(j, _):
            row = src_win[pl.ds(sidx[base + j] - col0, 1), :]  # [1, 2*hcp]
            wh = row[:, :hcp]
            asrc_e = row[:, hcp:]
            r = ridx[base + j] - row0
            stat = stat_blk[pl.ds(r, 1), :]
            z = asrc_e + stat[:, :hcp]
            e = jnp.where(z >= 0, z, slope * z)            # leaky_relu
            p = jnp.exp(e - stat[:, hcp:])                 # <= 1 by constr.
            o_acc[pl.ds(r, 1), :] = o_acc[pl.ds(r, 1), :] + p * wh
            if d_acc is not None:
                d_acc[pl.ds(r, 1), :] = d_acc[pl.ds(r, 1), :] + p[:, :128]
            return 0

        jax.lax.fori_loop(lo, n_e, body, 0)

    _chunk_sweep(cell_ptr_ref, chunk, s_blocks, sidx, ridx, None,
                    sem_idx, sem_w, seq_ref,
                    (senders_hbm, receivers_hbm, None), process_chunk)

    @pl.when(s == s_blocks - 1)
    def _():
        o_out[:] = o_acc[:]
        if d_out is not None:
            d_out[:] = d_acc[:]


def gat_fwd(
    src_pack: jnp.ndarray,          # [n_pad, H*Cp + 128]
    stat: jnp.ndarray,              # [n_pad, 128]: [a_dst | m] (see kernel)
    plan_senders: jnp.ndarray,
    plan_receivers: jnp.ndarray,
    cell_ptr: jnp.ndarray,
    *,
    heads: int, cp: int,
    r_blocks: int, s_blocks: int, block_rows: int, window_rows: int,
    slope: float = 0.2,
    chunk: int = 1024,
    with_dacc: bool = False,
):
    """One fused pass -> o [n_pad, H*Cp] (unnormalized weighted sums; the
    denominator rides in whatever channel the caller packed as ones).
    With ``with_dacc`` (cp == C: no free ones channel) returns
    ``(o, d128)`` where ``d128[:, h]`` is head h's denominator.

    ``src_pack`` [n, 2*hcp] = [wh | a_src expanded]; ``stat`` [n, 2*hcp]
    = [a_dst expanded | m expanded] (m = the precomputed per-receiver
    max; NEG_BIG rows for empty receivers are never touched by an
    edge)."""
    n, fp = src_pack.shape
    hcp = heads * cp
    if fp != 2 * hcp:
        raise ValueError(f"src_pack width {fp} != 2*H*Cp = {2 * hcp}")
    if stat.shape != (n, 2 * hcp):
        raise ValueError(f"stat shape {stat.shape} != {(n, 2 * hcp)}")
    if heads > 64:
        raise ValueError("heads must be <= 64")
    if hcp % 128:
        raise ValueError("H*Cp must be a lane multiple")

    e = plan_senders.shape[0]
    pad = (chunk - e % chunk) % chunk + chunk
    plan_senders = jnp.pad(plan_senders, (0, pad))
    plan_receivers = jnp.pad(plan_receivers, (0, pad))

    kernel = functools.partial(
        _fwd_dacc_kernel if with_dacc else _fwd_kernel,
        heads=heads, cp=cp, slope=slope,
        block_rows=block_rows, window_rows=window_rows, chunk=chunk,
        s_blocks=s_blocks)

    o_spec = pl.BlockSpec((block_rows, hcp), lambda i, s, *_: (i, 0),
                          memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec((block_rows, 128), lambda i, s, *_: (i, 0),
                          memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((block_rows, hcp), src_pack.dtype),
    ]
    if with_dacc:
        scratch.append(pltpu.VMEM((block_rows, 128), src_pack.dtype))
    scratch += [
        pltpu.SMEM((2 * chunk,), jnp.int32),
        pltpu.SMEM((2 * chunk,), jnp.int32),
        pltpu.SemaphoreType.DMA((4,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SMEM((1,), jnp.int32),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r_blocks, s_blocks),
        in_specs=[
            pl.BlockSpec((window_rows, 2 * hcp), lambda i, s, *_: (s, 0),
                         memory_space=pltpu.VMEM),    # streamed src rows
            pl.BlockSpec((block_rows, 2 * hcp), lambda i, s, *_: (i, 0),
                         memory_space=pltpu.VMEM),    # stationary [adst|m]
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(o_spec, d_spec) if with_dacc else o_spec,
        scratch_shapes=scratch,
    )
    out_shape = jax.ShapeDtypeStruct((n, hcp), src_pack.dtype)
    if with_dacc:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((n, 128), src_pack.dtype))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
    )(cell_ptr, src_pack, stat, plan_senders, plan_receivers)


# ---------------------------------------------------------------------------
# Backward. For o_r = sum_s exp(e_sr - m_r) wh_s, d_r = sum_s exp(e_sr - m_r),
# m_r = max_s e_sr, with e_sr = leaky_relu(z_sr), z_sr = a_src[s] + a_dst[r].
#
# The max m is NON-DIFFERENTIABLE by design (flash-attention convention):
# every downstream use of (o, d, m) — normalization o/d and the exact
# online-softmax self-loop merge — is analytically invariant to the value
# of m, so consumers stop_gradient it (see nn.conv.attention) and the
# backward treats m as a constant stabilizer. That removes the max-tie
# indicator term entirely (no 1[e = m] * G3), which both shaves per-edge
# work and makes the VJP insensitive to tie-detection rounding:
#
#   de_sr   = exp(e-m) (q_sr + G2_r)
#   q_sr    = sum_c g_o[r,h,c] wh[s,h,c]          (per-head dot)
#   G2_r    = g_d[r]
#   d_wh[s]   += exp(e-m) g_o[r]                  (head-expanded)
#   d_asrc[s] += de * lrelu'(z);  d_adst[r] += de * lrelu'(z)
#
# Pass T (transpose plan, out rows = senders) accumulates d_wh/d_asrc;
# pass F (forward plan, out rows = receivers) accumulates d_adst. Both
# recompute z/e/alpha from the packed node rows (flash-style recompute).
#
# coeff_pack [n_pad, H*Cp + 128]: cols [:H*Cp] = g_o (interleaved);
# trailing 128: [0:32]=a_dst, [32:64]=m, [64:96]=G2 (H <= 32).
# Pad lanes must be packed ZERO (then alpha-hat=1, q=0, de=0: no NaNs).


def _edge_grad(row_src, row_cof, heads, hcp, slope):
    """PURE FULL-LANE per-edge backward. With the per-head scalars
    pre-expanded to the interleaved value layout (see _fwd_kernel), every
    z copy-lane is an independent forward variable, so its cotangent is
    the plain per-lane partial

        d_wh    = ah * g_o
        dz_lane = ah * g_o * wh * lrelu'(z)     (= d_wh * wh * lrelu')

    and the per-head sum over copies (the old in-kernel q fold + repeat,
    measured ~+95 cy/edge together) happens for FREE in the consumer's
    ``tile(a_src, cp)`` VJP. The denominator's cotangent is either folded
    into ``g_o``'s constant-1 channel (dchan mode, 3-field coeff) or rides
    a 4th pre-scaled field ``g2_e = tile(g_d/cp)`` whose per-lane term
    ``ah * g2_e`` copy-sums back to exactly ``ah * g_d`` (dacc mode).
    No sub-128-lane ops (~24 cy each), no repeats (~70 cy).

    row_src [1, 2*hcp] = [wh | a_src expanded];
    row_cof [1, 3*hcp or 4*hcp] = [g_o | a_dst expanded | m expanded
    (| g_d/cp expanded)].
    Returns (d_wh [1, hcp], dz [1, hcp]).
    """
    wh = row_src[:, :hcp]
    asrc_e = row_src[:, hcp:]
    g_o = row_cof[:, :hcp]
    adst_e = row_cof[:, hcp:2 * hcp]
    m_e = row_cof[:, 2 * hcp:3 * hcp]
    z = asrc_e + adst_e
    e = jnp.where(z >= 0, z, slope * z)
    ah = jnp.exp(e - m_e)                            # alpha-hat [1, hcp]
    d_wh = ah * g_o
    de = d_wh * wh
    if row_cof.shape[1] == 4 * hcp:                  # dacc mode: g2 field
        de = de + ah * row_cof[:, 3 * hcp:]
    dz = de * jnp.where(z >= 0, 1.0, slope)
    return d_wh, dz


def _bwd_t_kernel(cell_ptr_ref,
                  cof_win, src_blk, senders_hbm, receivers_hbm,
                  out,
                  acc, sidx, ridx, sem_idx, sem_w, seq_ref,
                  *,
                  heads: int, cp: int, slope: float,
                  block_rows: int, window_rows: int, chunk: int,
                  s_blocks: int):
    from egc_tpu.ops.pallas.gather_reduce import _chunk_sweep

    hcp = heads * cp
    i = pl.program_id(0)
    s = pl.program_id(1)
    row0 = i * block_rows
    col0 = s * window_rows

    @pl.when(s == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    def process_chunk(base, lo, n_e):
        def body(j, _):
            # transpose plan: window = ORIGINAL receivers, block = senders
            row_cof = cof_win[pl.ds(sidx[base + j] - col0, 1), :]
            r = ridx[base + j] - row0
            row_src = src_blk[pl.ds(r, 1), :]
            d_wh, dz = _edge_grad(row_src, row_cof, heads, hcp, slope)
            acc[pl.ds(r, 1), :] = acc[pl.ds(r, 1), :] + \
                jnp.concatenate([d_wh, dz], axis=1)
            return 0

        jax.lax.fori_loop(lo, n_e, body, 0)

    _chunk_sweep(cell_ptr_ref, chunk, s_blocks, sidx, ridx, None,
                    sem_idx, sem_w, seq_ref,
                    (senders_hbm, receivers_hbm, None), process_chunk)

    @pl.when(s == s_blocks - 1)
    def _():
        out[:] = acc[:]


def _bwd_f_kernel(cell_ptr_ref,
                  src_win, cof_blk, senders_hbm, receivers_hbm,
                  out,
                  acc, sidx, ridx, sem_idx, sem_w, seq_ref,
                  *,
                  heads: int, cp: int, slope: float,
                  block_rows: int, window_rows: int, chunk: int,
                  s_blocks: int):
    from egc_tpu.ops.pallas.gather_reduce import _chunk_sweep

    hcp = heads * cp
    i = pl.program_id(0)
    s = pl.program_id(1)
    row0 = i * block_rows
    col0 = s * window_rows

    @pl.when(s == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    def process_chunk(base, lo, n_e):
        def body(j, _):
            row_src = src_win[pl.ds(sidx[base + j] - col0, 1), :]
            r = ridx[base + j] - row0
            row_cof = cof_blk[pl.ds(r, 1), :]
            _d_wh, dz = _edge_grad(row_src, row_cof, heads, hcp, slope)
            acc[pl.ds(r, 1), :] = acc[pl.ds(r, 1), :] + dz
            return 0

        jax.lax.fori_loop(lo, n_e, body, 0)

    _chunk_sweep(cell_ptr_ref, chunk, s_blocks, sidx, ridx, None,
                    sem_idx, sem_w, seq_ref,
                    (senders_hbm, receivers_hbm, None), process_chunk)

    @pl.when(s == s_blocks - 1)
    def _():
        out[:] = acc[:]


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
            pltpu.VMEM((plan_dev.block_rows, out_width), win_arr.dtype),
            pltpu.SMEM((2 * chunk,), jnp.int32),
            pltpu.SMEM((2 * chunk,), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, out_width), win_arr.dtype),
    )(plan_dev.cell_ptr, win_arr, blk_arr, senders, receivers)


def gat_attention(src_pack, adst, plan, *, heads: int, cp: int,
                  dchan, slope: float = 0.2):
    """Differentiable fused GAT edge-softmax primitive.

    ``dchan``: the per-head channel index the caller packed as CONSTANT 1
    in ``src_pack``'s interleaved values (a zero pad channel, so
    ``C <= dchan < cp``). The kernel's single RMW then accumulates the
    softmax denominator there; this wrapper returns it as
    ``md[:, 64:64+heads]`` alongside the stationary max (``md[:, :heads]``)
    — same (o, md) contract as before. The denominator cotangent merges
    into ``g_o``'s dchan columns in the backward.

    ``dchan=None`` (cp == C — no free pad channel, e.g. the h128/4-head
    arxiv config): the forward adds a second narrow RMW into a separate
    [n, 128] denominator accumulator, and the backward carries the
    denominator cotangent as a 4th pre-scaled coeff field (see
    ``_edge_grad``). Same (o, md) contract either way.
    """
    if dchan is not None and not (0 < dchan < cp):
        raise ValueError(f"dchan {dchan} must lie in a pad channel < cp "
                         f"{cp}")
    return _gat_attention_cached(heads, cp, dchan, slope)(src_pack, adst,
                                                          plan)


@functools.lru_cache(maxsize=None)
def _gat_attention_cached(heads: int, cp: int, dchan, slope: float):
    hcp = heads * cp
    use_dacc = dchan is None
    if not use_dacc:
        dlo, dhi = dchan * heads, (dchan + 1) * heads

    def impl(src_pack, adst, plan):
        from egc_tpu.ops.pallas.gather_reduce import windowed_gather_reduce

        # stationary m (see _fwd_kernel): leaky_relu is monotone and a_dst
        # is receiver-constant, so m_r = leaky(max_s a_src + a_dst) — one
        # cheap 128-lane windowed max over the EGC-geometry plan. The
        # first 128 lanes of the expanded a_src block carry the per-head
        # values at lanes [0:heads] (the c=0 copies).
        p = plan.fwd
        (smax,) = windowed_gather_reduce(
            src_pack[:, hcp:hcp + 128], p.senders, p.receivers, p.cell_ptr,
            r_blocks=p.r_blocks, s_blocks=p.s_blocks,
            block_rows=p.block_rows, window_rows=p.window_rows,
            ops=("max",))
        zh = adst[:, :heads] + smax[:, :heads]
        mh = jnp.where(zh >= 0, zh, slope * zh)
        # empty receivers: NEG_BIG (never touched by an edge)
        mh = jnp.where((plan.deg > 0)[:, None], mh, NEG_BIG)
        stat = jnp.concatenate(
            [jnp.tile(adst[:, :heads], (1, cp)),      # interleaved expand
             jnp.tile(mh, (1, cp))], axis=1)
        f = plan.fwd_attn
        res = gat_fwd(src_pack, stat, f.senders, f.receivers, f.cell_ptr,
                      heads=heads, cp=cp, r_blocks=f.r_blocks,
                      s_blocks=f.s_blocks, block_rows=f.block_rows,
                      window_rows=f.window_rows, slope=slope,
                      with_dacc=use_dacc)
        if use_dacc:
            o, d128 = res
            d = d128[:, :heads]
        else:
            o = res
            d = o[:, dlo:dhi]                   # the ones-channel sums
        md = jnp.concatenate(
            [jnp.pad(mh, ((0, 0), (0, 64 - heads))),
             jnp.pad(d, ((0, 0), (0, 64 - heads)))], axis=1)
        return o, md

    @jax.custom_vjp
    def f(src_pack, adst, plan):
        return impl(src_pack, adst, plan)

    def f_fwd(src_pack, adst, plan):
        o, md = impl(src_pack, adst, plan)
        return (o, md), (src_pack, adst, plan, md)

    def f_bwd(residual, cts):
        import numpy as _np
        src_pack, adst, plan, md = residual
        g_o, g_md = cts
        g_d = g_md[:, 64:64 + heads]  # m is non-differentiable (mod. note)
        n = md.shape[0]
        fields = [None, jnp.tile(adst[:, :heads], (1, cp)),
                  jnp.tile(md[:, :heads], (1, cp))]
        if use_dacc:
            # 4th field: g_d pre-scaled by 1/cp — each copy lane adds
            # ah*g_d/cp to dz, and the consumer's copy-sum restores ah*g_d
            fields.append(jnp.tile(g_d / cp, (1, cp)))
        else:
            # fold the denominator cotangent into the constant-1 channel:
            # the per-lane dz partials then carry the old G2 term exactly
            g_o = g_o.at[:, dlo:dhi].add(g_d)
        fields[0] = g_o
        coeff = jnp.concatenate(fields, axis=1)       # [n, 3*hcp or 4*hcp]
        # pass T output IS the [wh | a_src expanded] cotangent (per-copy
        # dz lanes; the consumer's tile VJP sums copies)
        d_src = _edge_pass(_bwd_t_kernel, coeff, src_pack, plan.bwd_attn,
                           2 * hcp, heads=heads, cp=cp, slope=slope)
        dz_r = _edge_pass(_bwd_f_kernel, src_pack, coeff,
                          plan.fwd_attn,
                          hcp, heads=heads, cp=cp, slope=slope)
        # a_dst cotangent: per-head fold of the copy lanes (col c*H + h)
        d_adst_h = jnp.sum(dz_r.reshape(n, cp, heads), axis=1)
        d_adst = jnp.pad(d_adst_h, ((0, 0), (0, 128 - heads)))

        def zero_ct(x):
            if x is None:
                return None
            if jnp.issubdtype(x.dtype, jnp.floating):
                return jnp.zeros_like(x)
            return _np.zeros(x.shape, jax.dtypes.float0)

        return d_src, d_adst, jax.tree.map(zero_ct, plan)

    f.defvjp(f_fwd, f_bwd)
    return f


# ---------------------------------------------------------------------------
# GATv2: e_sr = sum_c att[h,c] * leaky_relu(whl[s,h,c] + whr[r,h,c])
# (PyG GATv2Conv). Unlike GAT(v1), the logit needs a per-edge per-head
# reduction over channels, so the stationary-m factorization does not
# apply — the sweep keeps an ONLINE max/rescale. FULL-LANE design: the
# per-head fold AND its broadcast back to the interleaved copy layout run
# as ONE small MXU matmul against a constant 0/1 FOLD matrix
# (``FOLD[c*H+h, c'*H+h'] = [h == h']``):
#
#     e_expanded = (lrelu(wl + wr) * att) @ FOLD        # [1, hcp]
#
# (the in-register log2 head-fold + two ``pltpu.repeat``s it replaces
# measured ~435 cy/edge; the dotfold body runs at ~113 — see
# scripts/probe_v2_body.py). The running max ``m`` lives expanded in a
# second [block, hcp] scratch; the denominator rides a CONSTANT-1 value
# channel of ``whl`` (cp > C required — att's pad channels are zero, so
# the ones channel never perturbs the logits).
#
# Backward (same flash-recompute scheme as GAT; m non-differentiable,
# so no max-tie term — see the GAT backward note above). Per-lane, with
# everything head-expanded:
#   q_e  = (g_o . wl) @ FOLD      (includes the ones channel: the wrapper
#                                  folds g_d into g_o's dchan columns, and
#                                  wl's ones channel routes it into q)
#   de   = alpha-hat * q_e
#   d_wl = alpha-hat * g_o + de * att * lrelu'(z)
#   d_wr = de * att * lrelu'(z)   (accumulated per-receiver)
#   d_att= de * lrelu(z)          (accumulated per-receiver, reduced XLA)
# coeff_pack [n, 3*H*Cp]: [g_o | whr | m expanded].


def _v2_fwd_kernel(cell_ptr_ref,
                   src_win, dst_blk, att_in, fold_in,
                   senders_hbm, receivers_hbm,
                   o_out, m_out,
                   o_acc, m_acc, sidx, ridx, sem_idx, sem_w, seq_ref,
                   *,
                   heads: int, cp: int, slope: float,
                   block_rows: int, window_rows: int, chunk: int,
                   s_blocks: int):
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
            e = jax.lax.dot_general(
                lr * attv, fold, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # [1, hcp] expanded
            m_old = m_acc[pl.ds(r, 1), :]
            m_new = jnp.maximum(m_old, e)
            corr = jnp.exp(m_old - m_new)
            p = jnp.exp(e - m_new)
            # ones channel of wl accumulates the denominator inside o
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


def _v2_edge_grad(wl, row_cof, attv, fold, heads, hcp, slope):
    g_o = row_cof[:, :hcp]
    wr = row_cof[:, hcp:2 * hcp]
    m_e = row_cof[:, 2 * hcp:3 * hcp]
    z = wl + wr
    lr = jnp.where(z >= 0, z, slope * z)
    e = jax.lax.dot_general(
        lr * attv, fold, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    ah = jnp.exp(e - m_e)                            # alpha-hat expanded
    q = jax.lax.dot_general(
        g_o * wl, fold, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # incl. g_d via ones ch.
    de = ah * q                                      # m non-differentiable
    lrp = jnp.where(z >= 0, 1.0, slope)
    dz_term = de * attv * lrp
    d_wl = ah * g_o + dz_term
    datt = de * lr
    return d_wl, dz_term, datt


def _v2_bwd_t_kernel(cell_ptr_ref,
                     cof_win, src_blk, att_in, fold_in,
                     senders_hbm, receivers_hbm,
                     out,
                     acc, sidx, ridx, sem_idx, sem_w, seq_ref,
                     *,
                     heads: int, cp: int, slope: float,
                     block_rows: int, window_rows: int, chunk: int,
                     s_blocks: int):
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
        acc[:] = jnp.zeros_like(acc)

    def process_chunk(base, lo, n_e):
        def body(j, _):
            row_cof = cof_win[pl.ds(sidx[base + j] - col0, 1), :]
            r = ridx[base + j] - row0
            wl = src_blk[pl.ds(r, 1), :]
            d_wl, _dz, _da = _v2_edge_grad(wl, row_cof, attv, fold, heads,
                                           hcp, slope)
            acc[pl.ds(r, 1), :] = acc[pl.ds(r, 1), :] + d_wl
            return 0

        jax.lax.fori_loop(lo, n_e, body, 0)

    _chunk_sweep(cell_ptr_ref, chunk, s_blocks, sidx, ridx, None,
                    sem_idx, sem_w, seq_ref,
                    (senders_hbm, receivers_hbm, None), process_chunk)

    @pl.when(s == s_blocks - 1)
    def _():
        out[:] = acc[:]


def _v2_bwd_f_kernel(cell_ptr_ref,
                     src_win, cof_blk, att_in, fold_in,
                     senders_hbm, receivers_hbm,
                     out,
                     acc, sidx, ridx, sem_idx, sem_w, seq_ref,
                     *,
                     heads: int, cp: int, slope: float,
                     block_rows: int, window_rows: int, chunk: int,
                     s_blocks: int):
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
        acc[:] = jnp.zeros_like(acc)

    def process_chunk(base, lo, n_e):
        def body(j, _):
            wl = src_win[pl.ds(sidx[base + j] - col0, 1), :]
            r = ridx[base + j] - row0
            row_cof = cof_blk[pl.ds(r, 1), :]
            _dwl, dz_term, datt = _v2_edge_grad(wl, row_cof, attv, fold,
                                                heads, hcp, slope)
            acc[pl.ds(r, 1), :] = acc[pl.ds(r, 1), :] + \
                jnp.concatenate([dz_term, datt], axis=1)
            return 0

        jax.lax.fori_loop(lo, n_e, body, 0)

    _chunk_sweep(cell_ptr_ref, chunk, s_blocks, sidx, ridx, None,
                    sem_idx, sem_w, seq_ref,
                    (senders_hbm, receivers_hbm, None), process_chunk)

    @pl.when(s == s_blocks - 1)
    def _():
        out[:] = acc[:]


def _v2_edge_pass(kernel_fn, win_arr, blk_arr, att_rep, fold, plan_dev,
                  out_width, *, heads, cp, slope, chunk=1024):
    n = win_arr.shape[0]
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
            pl.BlockSpec(memory_space=pltpu.VMEM),    # att (replicated)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # FOLD matrix
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((plan_dev.block_rows, out_width),
                               lambda i, s, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((plan_dev.block_rows, out_width), win_arr.dtype),
            pltpu.SMEM((2 * chunk,), jnp.int32),
            pltpu.SMEM((2 * chunk,), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, out_width), win_arr.dtype),
    )(plan_dev.cell_ptr, win_arr, blk_arr, att_rep, fold, senders,
      receivers)


# ---------------------------------------------------------------------------
# Two-phase (staged-MXU) GATv2 kernels.
#
# The dotfold bodies above pay an in-loop [1, hcp] @ [hcp, hcp] MXU dot per
# edge — ~80 of the fwd's ~113 cy/edge is serialized matmul latency
# (scripts/probe_v2_body.py). Two-phase amortizes it: per tile of T edges
# within a cell fragment,
#
#   phase A: per-edge stage rows (lrelu(wl+wr) * att, and g_o*wl in the
#            backward) into [T, hcp] scratch;
#   fold:    ONE [T, hcp] @ [hcp, hcp] MXU matmul for the whole tile;
#   phase B: per-edge accumulate from the staged folded logits.
#
# Semantics are IDENTICAL to the dotfold bodies (same per-edge order, same
# online max) — only the dot is batched. Tiles need enough edges per grid
# cell to amortize, so these kernels run on the big-cell fwd_v2/bwd_v2
# plan layouts (~670 edges/cell vs <100 on fwd_attn); sub-tile remainders
# take the original per-edge dot body. Measured fwd sweep on the arxiv
# GATv2 probe: 113 -> 56 cy/edge, bit-exact (scripts/probe_v2_twophase.py).
# Outputs live in ANY (HBM) with single-buffered scratch accumulators and
# one manual DMA per row block — the coeff streams are 3*hcp lanes wide
# and the VMEM saved by not double-buffering outputs pays for the stages.
# Gated at hcp <= 128 (VMEM fit at the fixed plan geometry).
# ---------------------------------------------------------------------------

V2_TILE = 128
# edge-chunk size for the two-phase sweeps: bigger chunks split fewer
# cells across chunk boundaries, so fewer sub-tile tail fragments take
# the per-edge-dot path. Measured fwd sweep (scripts/probe_v2_twophase):
# c1024 42.4 -> c2048 39.8 -> c4096 38.5 cy/edge; T256 loses to T128 at
# every chunk size. SMEM cost is 2 x [2*chunk] int32 = 64 KB at 4096.
V2_CHUNK = 4096


def _v2_fwd_kernel_tp(cell_ptr_ref,
                      src_win, dst_blk, att_in, fold_in,
                      senders_hbm, receivers_hbm,
                      o_out, m_out,
                      o_acc, m_acc, stage, estage, sidx, ridx, sem_idx,
                      sem_w, seq_ref, sem_out,
                      *,
                      heads: int, cp: int, slope: float,
                      block_rows: int, window_rows: int, chunk: int,
                      s_blocks: int):
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
        n_full = (n_e - lo) // V2_TILE

        def tile_body(t, _):
            t0 = base + lo + t * V2_TILE

            def stage_body(k, _):
                wl = src_win[pl.ds(sidx[t0 + k] - col0, 1), :]
                wr = dst_blk[pl.ds(ridx[t0 + k] - row0, 1), :]
                z = wl + wr
                lr = jnp.where(z >= 0, z, slope * z)
                stage[pl.ds(k, 1), :] = lr * attv
                return 0

            jax.lax.fori_loop(0, V2_TILE, stage_body, 0)
            estage[:] = jax.lax.dot_general(
                stage[:], fold, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            def acc_body(k, _):
                accumulate(t0 + k, estage[pl.ds(k, 1), :])
                return 0

            jax.lax.fori_loop(0, V2_TILE, acc_body, 0)
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

        jax.lax.fori_loop(lo + n_full * V2_TILE, n_e, tail_body, 0)

    _chunk_sweep(cell_ptr_ref, chunk, s_blocks, sidx, ridx, None,
                 sem_idx, sem_w, seq_ref,
                 (senders_hbm, receivers_hbm, None), process_chunk)

    @pl.when(s == s_blocks - 1)
    def _():
        cp_o = pltpu.make_async_copy(
            o_acc, o_out.at[pl.ds(row0, block_rows)], sem_out.at[0])
        cp_m = pltpu.make_async_copy(
            m_acc, m_out.at[pl.ds(row0, block_rows)], sem_out.at[1])
        cp_o.start()
        cp_m.start()
        cp_o.wait()
        cp_m.wait()


def _v2_bwd_t_kernel_tp(cell_ptr_ref,
                        cof_win, src_blk, att_in, fold_in,
                        senders_hbm, receivers_hbm,
                        out_hbm,
                        acc, stage1, stage2, s_me, s_go, s_alrp,
                        estage1, estage2,
                        sidx, ridx, sem_idx, sem_w, seq_ref, sem_out,
                        *,
                        heads: int, cp: int, slope: float,
                        block_rows: int, window_rows: int, chunk: int,
                        s_blocks: int):
    """Transpose pass: d_whl per ORIGINAL SENDER (= this plan's receiver).

    FULLY-STAGED tiles (round 3): the stage loop copies every per-edge
    input the gradient needs (lr*att, g_o*wl, m, g_o, att*lrelu') into
    [T, hcp] scratch, the fold AND the whole gradient formula run as
    batched tile-level ops (2 MXU matmuls + 4 vector ops), and the
    accumulate loop shrinks to one static read + one RMW — the acc phase
    previously re-read the 3*hcp coeff row and wl per edge and recomputed
    exp/multiplies at [1, hcp] (~48 cy/edge measured for the pass;
    VERDICT r2 item 4)."""
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
        acc[:] = jnp.zeros_like(acc)

    def process_chunk(base, lo, n_e):
        n_full = (n_e - lo) // V2_TILE

        def tile_body(t, _):
            t0 = base + lo + t * V2_TILE

            def stage_body(k, _):
                row_cof = cof_win[pl.ds(sidx[t0 + k] - col0, 1), :]
                wl = src_blk[pl.ds(ridx[t0 + k] - row0, 1), :]
                g_o = row_cof[:, :hcp]
                wr = row_cof[:, hcp:2 * hcp]
                z = wl + wr
                lr = jnp.where(z >= 0, z, slope * z)
                stage1[pl.ds(k, 1), :] = lr * attv
                stage2[pl.ds(k, 1), :] = g_o * wl
                s_me[pl.ds(k, 1), :] = row_cof[:, 2 * hcp:3 * hcp]
                s_go[pl.ds(k, 1), :] = g_o
                s_alrp[pl.ds(k, 1), :] = attv * \
                    jnp.where(z >= 0, 1.0, slope)
                return 0

            jax.lax.fori_loop(0, V2_TILE, stage_body, 0)
            estage1[:] = jax.lax.dot_general(
                stage1[:], fold, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            estage2[:] = jax.lax.dot_general(
                stage2[:], fold, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # whole-tile gradient: d_wl = ah*g_o + (ah*e2)*att*lrelu'
            ah = jnp.exp(estage1[:] - s_me[:])
            estage1[:] = ah * s_go[:] + (ah * estage2[:]) * s_alrp[:]

            def acc_body(k, _):
                r = ridx[t0 + k] - row0
                acc[pl.ds(r, 1), :] = acc[pl.ds(r, 1), :] + \
                    estage1[pl.ds(k, 1), :]
                return 0

            jax.lax.fori_loop(0, V2_TILE, acc_body, 0)
            return 0

        jax.lax.fori_loop(0, n_full, tile_body, 0)

        def tail_body(j, _):
            row_cof = cof_win[pl.ds(sidx[base + j] - col0, 1), :]
            r = ridx[base + j] - row0
            wl = src_blk[pl.ds(r, 1), :]
            d_wl, _dz, _da = _v2_edge_grad(wl, row_cof, attv, fold, heads,
                                           hcp, slope)
            acc[pl.ds(r, 1), :] = acc[pl.ds(r, 1), :] + d_wl
            return 0

        jax.lax.fori_loop(lo + n_full * V2_TILE, n_e, tail_body, 0)

    _chunk_sweep(cell_ptr_ref, chunk, s_blocks, sidx, ridx, None,
                 sem_idx, sem_w, seq_ref,
                 (senders_hbm, receivers_hbm, None), process_chunk)

    @pl.when(s == s_blocks - 1)
    def _():
        cp_o = pltpu.make_async_copy(
            acc, out_hbm.at[pl.ds(row0, block_rows)], sem_out.at[0])
        cp_o.start()
        cp_o.wait()


def _v2_bwd_f_kernel_tp(cell_ptr_ref,
                        src_win, cof_blk, att_in, fold_in,
                        senders_hbm, receivers_hbm,
                        out_hbm, datt_hbm,
                        acc, datt_acc, stage1, stage2, s_me, s_alrp, s_lr,
                        estage1, estage2,
                        sidx, ridx, sem_idx, sem_w, seq_ref, sem_out,
                        *,
                        heads: int, cp: int, slope: float,
                        block_rows: int, window_rows: int, chunk: int,
                        s_blocks: int):
    """Forward-direction pass: per-RECEIVER d_whr (dz_term) accumulation
    plus the attention-vector gradient.

    FULLY-STAGED tiles (round 3, see _v2_bwd_t_kernel_tp): dz_term is
    computed for the whole tile as vector ops and the acc loop is one
    static read + one hcp-wide RMW. The att gradient no longer rides a
    per-receiver 2*hcp accumulation at all: datt = de * lrelu(z) only
    ever gets REDUCED (sum over all edges), so each tile folds it with
    one [T, hcp] -> [1, hcp] sum into a single accumulator row, emitted
    per row block (datt_hbm [r_blocks*8, hcp]; the wrapper sums rows) —
    halving the RMW width and dropping the per-edge concatenate."""
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
        acc[:] = jnp.zeros_like(acc)
        datt_acc[:] = jnp.zeros_like(datt_acc)

    def process_chunk(base, lo, n_e):
        n_full = (n_e - lo) // V2_TILE

        def tile_body(t, _):
            t0 = base + lo + t * V2_TILE

            def stage_body(k, _):
                wl = src_win[pl.ds(sidx[t0 + k] - col0, 1), :]
                row_cof = cof_blk[pl.ds(ridx[t0 + k] - row0, 1), :]
                g_o = row_cof[:, :hcp]
                wr = row_cof[:, hcp:2 * hcp]
                z = wl + wr
                lr = jnp.where(z >= 0, z, slope * z)
                stage1[pl.ds(k, 1), :] = lr * attv
                stage2[pl.ds(k, 1), :] = g_o * wl
                s_me[pl.ds(k, 1), :] = row_cof[:, 2 * hcp:3 * hcp]
                s_alrp[pl.ds(k, 1), :] = attv * \
                    jnp.where(z >= 0, 1.0, slope)
                s_lr[pl.ds(k, 1), :] = lr
                return 0

            jax.lax.fori_loop(0, V2_TILE, stage_body, 0)
            estage1[:] = jax.lax.dot_general(
                stage1[:], fold, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            estage2[:] = jax.lax.dot_general(
                stage2[:], fold, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # whole-tile: de = ah*e2; dz = de*att*lrelu'; datt = de*lr
            de = jnp.exp(estage1[:] - s_me[:]) * estage2[:]
            estage1[:] = de * s_alrp[:]
            datt_acc[0:1, :] = datt_acc[0:1, :] + jnp.sum(
                de * s_lr[:], axis=0, keepdims=True)

            def acc_body(k, _):
                r = ridx[t0 + k] - row0
                acc[pl.ds(r, 1), :] = acc[pl.ds(r, 1), :] + \
                    estage1[pl.ds(k, 1), :]
                return 0

            jax.lax.fori_loop(0, V2_TILE, acc_body, 0)
            return 0

        jax.lax.fori_loop(0, n_full, tile_body, 0)

        def tail_body(j, _):
            wl = src_win[pl.ds(sidx[base + j] - col0, 1), :]
            r = ridx[base + j] - row0
            row_cof = cof_blk[pl.ds(r, 1), :]
            _dwl, dz_term, datt = _v2_edge_grad(wl, row_cof, attv, fold,
                                                heads, hcp, slope)
            acc[pl.ds(r, 1), :] = acc[pl.ds(r, 1), :] + dz_term
            datt_acc[0:1, :] = datt_acc[0:1, :] + datt
            return 0

        jax.lax.fori_loop(lo + n_full * V2_TILE, n_e, tail_body, 0)

    _chunk_sweep(cell_ptr_ref, chunk, s_blocks, sidx, ridx, None,
                 sem_idx, sem_w, seq_ref,
                 (senders_hbm, receivers_hbm, None), process_chunk)

    @pl.when(s == s_blocks - 1)
    def _():
        cp_o = pltpu.make_async_copy(
            acc, out_hbm.at[pl.ds(row0, block_rows)], sem_out.at[0])
        cp_d = pltpu.make_async_copy(
            datt_acc, datt_hbm.at[pl.ds(i * 8, 8)], sem_out.at[1])
        cp_o.start()
        cp_d.start()
        cp_o.wait()
        cp_d.wait()


def _v2_pass_grid(plan_dev, win_arr, blk_arr, chunk):
    senders = plan_dev.senders
    receivers = plan_dev.receivers
    e = senders.shape[0]
    pad = (chunk - e % chunk) % chunk + chunk
    senders = jnp.pad(senders, (0, pad))
    receivers = jnp.pad(receivers, (0, pad))
    in_specs = [
        pl.BlockSpec((plan_dev.window_rows, win_arr.shape[1]),
                     lambda i, s, *_: (s, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((plan_dev.block_rows, blk_arr.shape[1]),
                     lambda i, s, *_: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),    # att (replicated)
        pl.BlockSpec(memory_space=pltpu.VMEM),    # FOLD matrix
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    return senders, receivers, in_specs


def _v2_edge_pass_tp(kernel_fn, win_arr, blk_arr, att_rep, fold, plan_dev,
                     out_width, *, heads, cp, slope, chunk=V2_CHUNK):
    """pallas_call wrapper for the two-phase TRANSPOSE backward pass
    (d_whl): output in ANY, single-buffered accumulator + fully-staged
    [T, hcp] tile scratch (stage1/stage2/m/g_o/att*lrelu' + 2 folds)."""
    hcp = heads * cp
    senders, receivers, in_specs = _v2_pass_grid(plan_dev, win_arr,
                                                 blk_arr, chunk)
    kernel = functools.partial(
        kernel_fn, heads=heads, cp=cp, slope=slope,
        block_rows=plan_dev.block_rows, window_rows=plan_dev.window_rows,
        chunk=chunk, s_blocks=plan_dev.s_blocks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(plan_dev.r_blocks, plan_dev.s_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((plan_dev.block_rows, out_width), win_arr.dtype),
        ] + [pltpu.VMEM((V2_TILE, hcp), win_arr.dtype) for _ in range(7)]
        + [
            pltpu.SMEM((2 * chunk,), jnp.int32),
            pltpu.SMEM((2 * chunk,), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    n_out = plan_dev.r_blocks * plan_dev.block_rows
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, out_width), win_arr.dtype),
    )(plan_dev.cell_ptr, win_arr, blk_arr, att_rep, fold, senders,
      receivers)


def _v2_edge_pass_tp_f(kernel_fn, win_arr, blk_arr, att_rep, fold,
                       plan_dev, *, heads, cp, slope, chunk=V2_CHUNK):
    """Two-phase FORWARD-direction backward pass: returns
    (d_whr [n, hcp], datt_rows [r_blocks*8, hcp]) — see
    _v2_bwd_f_kernel_tp."""
    hcp = heads * cp
    senders, receivers, in_specs = _v2_pass_grid(plan_dev, win_arr,
                                                 blk_arr, chunk)
    kernel = functools.partial(
        kernel_fn, heads=heads, cp=cp, slope=slope,
        block_rows=plan_dev.block_rows, window_rows=plan_dev.window_rows,
        chunk=chunk, s_blocks=plan_dev.s_blocks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(plan_dev.r_blocks, plan_dev.s_blocks),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((plan_dev.block_rows, hcp), win_arr.dtype),
            pltpu.VMEM((8, hcp), win_arr.dtype),       # datt accumulator
        ] + [pltpu.VMEM((V2_TILE, hcp), win_arr.dtype) for _ in range(7)]
        + [
            pltpu.SMEM((2 * chunk,), jnp.int32),
            pltpu.SMEM((2 * chunk,), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    n_out = plan_dev.r_blocks * plan_dev.block_rows
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_out, hcp), win_arr.dtype),
                   jax.ShapeDtypeStruct((plan_dev.r_blocks * 8, hcp),
                                        win_arr.dtype)),
    )(plan_dev.cell_ptr, win_arr, blk_arr, att_rep, fold, senders,
      receivers)


def _fold_matrix(heads: int, hcp: int):
    """[hcp, hcp] 0/1 matrix: (t @ FOLD)[c'*H+h] = sum_c t[c*H+h]."""
    idx = jnp.arange(hcp)
    return (idx[:, None] % heads == idx[None, :] % heads).astype(
        jnp.float32)


def gatv2_attention(whl, whr, att_rep, plan, *, heads: int, cp: int,
                    dchan: int, slope: float = 0.2):
    """Differentiable fused GATv2 edge-softmax primitive.

    whl/whr: [n_pad, H*Cp] head-interleaved; att_rep: [8, H*Cp]
    (row-replicated interleaved attention vector, ZERO in pad channels).
    ``dchan``: the pad channel of whl packed as CONSTANT 1 (C <= dchan <
    cp, required) — the denominator accumulates there. Returns (o, md)
    like ``gat_fwd``; gradients flow to whl, whr AND att.
    """
    if not (0 < dchan < cp):
        raise ValueError(f"dchan {dchan} must lie in a pad channel < cp "
                         f"{cp} (GATv2 fused path needs cp > C)")
    return _gatv2_attention_cached(heads, cp, dchan, slope)(whl, whr,
                                                            att_rep, plan)


@functools.lru_cache(maxsize=None)
def _gatv2_attention_cached(heads: int, cp: int, dchan: int, slope: float):
    hcp = heads * cp
    dlo, dhi = dchan * heads, (dchan + 1) * heads

    def _two_phase(plan):
        """Two-phase kernels need the big-cell layouts and hcp <= 128
        (VMEM fit at their fixed geometry — see the two-phase comment)."""
        return (plan.fwd_v2 is not None and plan.bwd_v2 is not None
                and hcp <= 128)

    def impl(whl, whr, att_rep, plan):
        two_phase = _two_phase(plan)
        f = plan.fwd_v2 if two_phase else plan.fwd_attn
        n = whl.shape[0]
        e = f.senders.shape[0]
        chunk = V2_CHUNK if two_phase else 1024
        pad = (chunk - e % chunk) % chunk + chunk
        senders = jnp.pad(f.senders, (0, pad))
        receivers = jnp.pad(f.receivers, (0, pad))
        fold = _fold_matrix(heads, hcp)
        if two_phase:
            kernel = functools.partial(
                _v2_fwd_kernel_tp, heads=heads, cp=cp, slope=slope,
                block_rows=f.block_rows, window_rows=f.window_rows,
                chunk=chunk, s_blocks=f.s_blocks)
            out_specs = (pl.BlockSpec(memory_space=pl.ANY),
                         pl.BlockSpec(memory_space=pl.ANY))
            scratch = [
                pltpu.VMEM((f.block_rows, hcp), whl.dtype),
                pltpu.VMEM((f.block_rows, hcp), whl.dtype),
                pltpu.VMEM((V2_TILE, hcp), whl.dtype),
                pltpu.VMEM((V2_TILE, hcp), whl.dtype),
                pltpu.SMEM((2 * chunk,), jnp.int32),
                pltpu.SMEM((2 * chunk,), jnp.int32),
                pltpu.SemaphoreType.DMA((4,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        else:
            kernel = functools.partial(
                _v2_fwd_kernel, heads=heads, cp=cp, slope=slope,
                block_rows=f.block_rows, window_rows=f.window_rows,
                chunk=1024, s_blocks=f.s_blocks)
            out_specs = (
                pl.BlockSpec((f.block_rows, hcp), lambda i, s, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((f.block_rows, hcp), lambda i, s, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            )
            scratch = [
                pltpu.VMEM((f.block_rows, hcp), whl.dtype),
                pltpu.VMEM((f.block_rows, hcp), whl.dtype),
                pltpu.SMEM((2 * 1024,), jnp.int32),
                pltpu.SMEM((2 * 1024,), jnp.int32),
                pltpu.SemaphoreType.DMA((4,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SMEM((1,), jnp.int32),
            ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(f.r_blocks, f.s_blocks),
            in_specs=[
                pl.BlockSpec((f.window_rows, hcp), lambda i, s, *_: (s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((f.block_rows, hcp), lambda i, s, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),   # att (replicated)
                pl.BlockSpec(memory_space=pltpu.VMEM),   # FOLD matrix
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=out_specs,
            scratch_shapes=scratch,
        )
        o, m_exp = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((n, hcp), whl.dtype),
                       jax.ShapeDtypeStruct((n, hcp), whl.dtype)),
        )(f.cell_ptr, whl, whr, att_rep, fold, senders, receivers)
        md = jnp.concatenate(
            [jnp.pad(m_exp[:, :heads], ((0, 0), (0, 64 - heads))),
             jnp.pad(o[:, dlo:dhi], ((0, 0), (0, 64 - heads)))], axis=1)
        return o, md

    @jax.custom_vjp
    def f(whl, whr, att_rep, plan):
        return impl(whl, whr, att_rep, plan)

    def f_fwd(whl, whr, att_rep, plan):
        o, md = impl(whl, whr, att_rep, plan)
        return (o, md), (whl, whr, att_rep, plan, md)

    def f_bwd(residual, cts):
        import numpy as _np
        whl, whr, att_rep, plan, md = residual
        g_o, g_md = cts
        g_d = g_md[:, 64:64 + heads]  # m non-differentiable (module note)
        # fold the denominator cotangent into the constant-1 channel of
        # whl: the backward's q fold picks it up through that channel
        g_o = g_o.at[:, dlo:dhi].add(g_d)
        m_exp = jnp.tile(md[:, :heads], (1, cp))
        fold = _fold_matrix(heads, hcp)
        coeff = jnp.concatenate([g_o, whr, m_exp], axis=1)   # [n, 3*hcp]
        if _two_phase(plan):
            d_whl = _v2_edge_pass_tp(
                _v2_bwd_t_kernel_tp, coeff, whl, att_rep, fold,
                plan.bwd_v2, hcp, heads=heads, cp=cp, slope=slope)
            d_whr, d_att_rows = _v2_edge_pass_tp_f(
                _v2_bwd_f_kernel_tp, whl, coeff, att_rep, fold,
                plan.fwd_v2, heads=heads, cp=cp, slope=slope)
        else:
            d_whl = _v2_edge_pass(_v2_bwd_t_kernel, coeff, whl, att_rep,
                                  fold, plan.bwd_attn, hcp, heads=heads,
                                  cp=cp, slope=slope)
            fpass = _v2_edge_pass(_v2_bwd_f_kernel, whl, coeff, att_rep,
                                  fold, plan.fwd_attn, 2 * hcp,
                                  heads=heads, cp=cp, slope=slope)
            d_whr = fpass[:, :hcp]
            d_att_rows = fpass[:, hcp:]
        d_att = jnp.sum(d_att_rows, axis=0, keepdims=True)
        d_att_rep = jnp.broadcast_to(d_att, att_rep.shape) / att_rep.shape[0]
        # att_rep rows are replicas of one vector: route the full cotangent
        # through each replica equally (caller sums rows -> exact)

        def zero_ct(x):
            if x is None:
                return None
            if jnp.issubdtype(x.dtype, jnp.floating):
                return jnp.zeros_like(x)
            return _np.zeros(x.shape, jax.dtypes.float0)

        return d_whl, d_whr, d_att_rep, jax.tree.map(zero_ct, plan)

    f.defvjp(f_fwd, f_bwd)
    return f
