"""Pallas TPU kernel: EGC head mixing in a transposed (node-in-lane) layout.

    z[n, h*L + l] = sum_{b,a} w2d[n, h*B*A + b*A + a] * ys[a][n, b*L + l]

This is the EGC head-mix contraction (reference ``experiments/layers.py:
131-135`` paper form / ``optimized_layers.py:195-206`` batched-matmul form)
consumed directly from the per-aggregator arrays the fused gather-reduce
kernels produce — no [n, A, F] stack, no [n, H, A*B, L] broadcast
intermediate.

Why a kernel: every XLA formulation measured (broadcast-reduce, batched
dot_general, unrolled fused broadcasts, 64-lane-padded variants —
``scripts/probe_headmix.py``) materializes an [n, H, A*B, L]-class
intermediate through HBM or loses to lane-relayouts, because L (44 at mag
h352, 32/34 at arxiv) occupies a fraction of a 128-lane register and the
(h, b) slices never land on lane boundaries. A straight Pallas port (v5)
pays a lane-rotate per (h,b,a) term and measures SLOWER than XLA.

The trick here: transpose each [R, _] block ONCE inside VMEM (nodes move
into lanes), after which every per-(h,b,a) slice is a SUBLANE (row) range
and the per-term scalar broadcast is a sublane broadcast — both free-ish
register ops. Measured (probe_headmix, v5e): mag h352 36.3 -> 23.5
ms/layer fwd+bwd vs the XLA broadcast-reduce; arxiv h128 4.4 -> 2.1.

Block size is chosen from a VMEM model with lanes rounded up to the
128-lane register width (the h136 shape OOMs the 16 MB scoped VMEM at
R = 1024 precisely because 136-lane buffers round to 256).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _lanes128(c: int) -> int:
    return ((c + 127) // 128) * 128


def headmix_block_rows(H: int, B: int, A: int, L: int,
                       budget_bytes: int = 12 << 20) -> int:
    """Largest power-of-two row block whose double-buffered in/out blocks
    (lane-padded to 128) fit the scoped-VMEM budget for BOTH passes.

    Returns 0 when even the R=128 configuration exceeds the budget (an
    extreme H*B*A shape) — callers must fall back to the XLA head mix."""
    F, O, W = B * L, H * L, H * B * A
    fwd_lanes = _lanes128(W) + A * _lanes128(F) + _lanes128(O)
    bwd_lanes = fwd_lanes + _lanes128(W) + A * _lanes128(F)
    r = 1024
    while r > 128 and bwd_lanes * r * 4 * 2 > budget_bytes:
        r //= 2
    if bwd_lanes * r * 4 * 2 > budget_bytes:
        return 0
    return r


@functools.lru_cache(maxsize=None)
def _make_headmix(n: int, H: int, B: int, A: int, L: int, R: int,
                  YW: int, with_bias: bool = False):
    """custom_vjp head-mix for fixed shapes; n must be a multiple of R.

    ``YW >= B*L``: per-aggregator input width — callers may pass ys at
    the 128-lane-padded width the fused aggregation kernels produce
    (tail columns ignored; dy tails written as zeros), eliminating the
    [n, F] pad/slice round trips at mag scale (~10 ms/step profiled)."""
    O, F = H * L, B * L
    BA = B * A
    Lp = ((L + 7) // 8) * 8
    assert n % R == 0 and YW >= F
    nb = n // R

    def col(h, b, a):
        return h * BA + b * A + a

    def yt_slabs(y):
        """[R, F] -> [B*Lp, R]: transpose with per-base slabs padded to a
        sublane multiple so row slices are 8-aligned."""
        if Lp == L:
            return jnp.swapaxes(y, 0, 1)
        slabs = [jnp.pad(y[:, b * L:(b + 1) * L], ((0, 0), (0, Lp - L)))
                 for b in range(B)]
        return jnp.swapaxes(jnp.concatenate(slabs, axis=1), 0, 1)

    def fwd_kernel(w_ref, *rest):
        y_refs = rest[:A]
        b_ref = rest[A] if with_bias else None
        out_ref = rest[A + 1 if with_bias else A]
        wT = jnp.swapaxes(w_ref[...], 0, 1)          # [HBA, R]
        yTs = [yt_slabs(r[...]) for r in y_refs]     # A x [B*Lp, R]
        outs = []
        for h in range(H):
            acc = None
            for b in range(B):
                for a in range(A):
                    t = (wT[col(h, b, a):col(h, b, a) + 1, :]
                         * yTs[a][b * Lp:b * Lp + L, :])
                    acc = t if acc is None else acc + t
            outs.append(acc)                          # [L, R]
        zT = jnp.concatenate(outs, axis=0)            # [O, R]
        if with_bias:
            # bias in the transposed layout is a sublane (column) vector
            # broadcast over lanes — the epilogue fold saves the [n, O]
            # add stream (~4.5 ms/layer at mag h352)
            zT = zT + jnp.swapaxes(b_ref[...], 0, 1)  # [O, 1] broadcast
        out_ref[...] = jnp.swapaxes(zT, 0, 1)

    def bwd_kernel(w_ref, *rest):
        y_refs, dz_ref = rest[:A], rest[A]
        dw_ref, dy_refs = rest[A + 1], rest[A + 2:]
        wT = jnp.swapaxes(w_ref[...], 0, 1)
        yTs = [yt_slabs(r[...]) for r in y_refs]
        dzT = jnp.swapaxes(dz_ref[...], 0, 1)         # [O, R], h-major rows
        # dy[a][:, b*L+l] = sum_h w[:, col] * dz[:, h*L+l]
        for a in range(A):
            slabs = []
            for b in range(B):
                acc = None
                for h in range(H):
                    t = (wT[col(h, b, a):col(h, b, a) + 1, :]
                         * dzT[h * L:(h + 1) * L, :])
                    acc = t if acc is None else acc + t
                slabs.append(acc)                     # [L, R]
            dyT = jnp.concatenate(slabs, axis=0)      # [F, R]
            if YW != F:                               # zero the pad tail
                dyT = jnp.pad(dyT, ((0, YW - F), (0, 0)))
            dy_refs[a][...] = jnp.swapaxes(dyT, 0, 1)
        # dw[:, col] = sum_l dz[:, h*L+l] * y[a][:, b*L+l]
        cols = []
        for h in range(H):
            for b in range(B):
                for a in range(A):
                    prod = (dzT[h * L:(h + 1) * L, :]
                            * yTs[a][b * Lp:b * Lp + L, :])
                    cols.append(jnp.sum(prod, axis=0, keepdims=True))
        dwT = jnp.concatenate(cols, axis=0)           # [HBA, R]
        dw_ref[...] = jnp.swapaxes(dwT, 0, 1)

    def row_spec(width):
        return pl.BlockSpec((R, width), lambda i: (i, 0))

    def run_fwd(w2d, ys, bias=None):
        in_specs = [row_spec(H * BA)] + [row_spec(YW)] * A
        args = (w2d, *ys)
        if with_bias:
            in_specs.append(pl.BlockSpec((1, O), lambda i: (0, 0)))
            args = args + (bias.reshape(1, O),)
        return pl.pallas_call(
            fwd_kernel,
            grid=(nb,),
            in_specs=in_specs,
            out_specs=row_spec(O),
            out_shape=jax.ShapeDtypeStruct((n, O), jnp.float32),
        )(*args)

    def run_bwd(w2d, ys, dz):
        return pl.pallas_call(
            bwd_kernel,
            grid=(nb,),
            in_specs=[row_spec(H * BA)] + [row_spec(YW)] * A +
                     [row_spec(O)],
            out_specs=[row_spec(H * BA)] + [row_spec(YW)] * A,
            out_shape=[jax.ShapeDtypeStruct((n, H * BA), jnp.float32)] +
                      [jax.ShapeDtypeStruct((n, YW), jnp.float32)] * A,
        )(w2d, *ys, dz)

    if with_bias:
        @jax.custom_vjp
        def f(w2d, ys, bias):
            return run_fwd(w2d, ys, bias)

        def fwd_rule(w2d, ys, bias):
            return run_fwd(w2d, ys, bias), (w2d, ys)

        def bwd_rule(res, dz):
            w2d, ys = res
            outs = run_bwd(w2d, ys, dz)
            return outs[0], tuple(outs[1:]), jnp.sum(dz, axis=0)

        f.defvjp(fwd_rule, bwd_rule)
        return f

    @jax.custom_vjp
    def f(w2d, ys):
        return run_fwd(w2d, ys)

    def fwd_rule(w2d, ys):
        return run_fwd(w2d, ys), (w2d, ys)

    def bwd_rule(res, dz):
        w2d, ys = res
        outs = run_bwd(w2d, ys, dz)
        return outs[0], tuple(outs[1:])

    f.defvjp(fwd_rule, bwd_rule)
    return f


def _head_mix_xla(w2d, ys, H, B, A, L):
    """XLA broadcast-reduce head mix (same contraction, used when the
    kernel's VMEM model rejects the shape)."""
    n = w2d.shape[0]
    y = jnp.stack(ys, axis=1).reshape(n, A * B, L)              # k = a*B+b
    w = w2d.reshape(n, H, B, A).transpose(0, 1, 3, 2).reshape(n, H, A * B)
    return jnp.sum(w[..., None] * y[:, None], axis=2).reshape(n, H * L)


def head_mix_fused(w2d: jnp.ndarray, ys, *, H: int, B: int, A: int,
                   L: int, y_width: int = 0,
                   bias: jnp.ndarray = None) -> jnp.ndarray:
    """Fused head mix: w2d [n, H*B*A] (h-major, then b, then a — the
    ``comb`` Dense layout) x per-aggregator ys (A arrays [n, y_width],
    first B*L columns meaningful) -> [n, H*L]. Rows are padded to the
    block size and sliced back. ``y_width`` (default B*L) lets callers
    pass the 128-lane-padded arrays the fused aggregation kernels emit
    (tails ignored; dy tails zero).

    float32 only (the kernel math and its VMEM model assume 4-byte lanes);
    non-f32 inputs raise rather than mis-typing inside the kernel."""
    ys = tuple(ys)
    n = w2d.shape[0]
    y_width = y_width or B * L
    if y_width < B * L:
        raise ValueError("y_width must be >= B*L")
    if w2d.shape[1] != H * B * A \
            or any(y.shape != (n, y_width) for y in ys) or len(ys) != A:
        raise ValueError("head_mix_fused: inconsistent shapes")
    if w2d.dtype != jnp.float32 or any(y.dtype != jnp.float32 for y in ys) \
            or (bias is not None and bias.dtype != jnp.float32):
        raise TypeError(
            f"head_mix_fused is float32-only (got w2d {w2d.dtype}, ys "
            f"{[str(y.dtype) for y in ys]}); cast or use the XLA head mix")
    if bias is not None and bias.shape != (H * L,):
        raise ValueError("bias must be [H*L]")
    R = headmix_block_rows(H, B, A, L)
    if R == 0:   # shape exceeds scoped VMEM even at R=128 — XLA fallback
        out = _head_mix_xla(w2d, tuple(y[:, :B * L] for y in ys),
                            H, B, A, L)
        return out if bias is None else out + bias
    n_pad = ((n + R - 1) // R) * R
    if n_pad != n:
        w2d = jnp.pad(w2d, ((0, n_pad - n), (0, 0)))
        ys = tuple(jnp.pad(y, ((0, n_pad - n), (0, 0))) for y in ys)
    fn = _make_headmix(n_pad, H, B, A, L, R, y_width, bias is not None)
    out = fn(w2d, ys) if bias is None else fn(w2d, ys, bias)
    return out[:n] if n_pad != n else out


def headmix_enabled() -> bool:
    return os.environ.get("EGC_TPU_FUSED_HEADMIX", "1") != "0"


def headmix_min_rows() -> int:
    """Below this row count the XLA broadcast-reduce is fine and the
    kernel's fixed dispatch/padding overhead isn't worth it (batched tasks
    with small node budgets). Overridable for interpret-mode tests."""
    return int(os.environ.get("EGC_TPU_HEADMIX_MIN_ROWS", "4096"))
