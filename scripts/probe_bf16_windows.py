"""Measure bf16 sender/coeff windows in the fused gather-reduce kernels.

PERFORMANCE.md next-step #2: streaming the gathered rows in bfloat16
halves window DMA bytes (and the VMEM window footprint). This probe
answers whether that translates to per-edge time on the real chip, for
the headline geometry (F=128 narrow kernels) and the wide single-sweep
geometry (F=256: arxiv h136 / hiv h224 / mag h352 bases).

Accumulation stays float32 (the kernels upcast each gathered row); the
probe also reports the bf16-vs-f32 output error so the tolerance cost is
on record next to the timing.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    scripts/probe_bf16_windows.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from egc_tpu.data import synthetic
from egc_tpu.ops.dispatch import build_kernel_plan
from egc_tpu.ops.pallas.gather_reduce import (
    windowed_gather_reduce, windowed_gather_reduce_bwd,
)

OPS = ("wsum", "sum", "max")
SEGS = ("c_sum", "c_wsum", "mx", "c_max")


def timeit(fn, *args, steps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / steps


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)


def bench(f: int, wide: bool):
    raw = synthetic.synthetic_full_graph(
        num_nodes=169_343, avg_degree=14, num_classes=40, num_features=128,
        seed=0)
    senders = np.asarray(raw["senders"])
    receivers = np.asarray(raw["receivers"])
    n = 169_343
    e = len(senders)
    plan = build_kernel_plan(senders, receivers, n)
    p = plan.fwd
    b = plan.bwd_narrow if wide else plan.bwd
    rng = np.random.default_rng(0)

    vals = jnp.asarray(rng.normal(size=(p.s_blocks * p.window_rows, f))
                       .astype(np.float32))
    ew = jnp.asarray(rng.normal(size=(p.senders.shape[0],))
                     .astype(np.float32))

    def fwd(v, w):
        return windowed_gather_reduce(
            v, p.senders, p.receivers, p.cell_ptr,
            r_blocks=p.r_blocks, s_blocks=p.s_blocks,
            block_rows=p.block_rows, window_rows=p.window_rows,
            ops=OPS, edge_w=w, scratch_acc=wide)

    fwd32 = jax.jit(fwd)
    fwd16 = jax.jit(lambda v, w: fwd(v.astype(jnp.bfloat16), w))

    o32 = fwd32(vals, ew)
    o16 = fwd16(vals, ew)
    errs = [rel_err(a, bb) for a, bb in zip(o16, o32)]
    t32 = timeit(fwd32, vals, ew)
    t16 = timeit(fwd16, vals, ew)
    tag = f"F={f} {'wide' if wide else 'narrow'}"
    print(f"{tag} fwd  f32: {t32*1e3:7.1f} ms ({t32/e*0.94e9:5.1f} cy/e)  "
          f"bf16: {t16*1e3:7.1f} ms ({t16/e*0.94e9:5.1f} cy/e)  "
          f"[{t32/t16:.2f}x, rel_err {max(errs):.1e}]", flush=True)

    k = len(SEGS)
    coeff = jnp.asarray(
        rng.normal(size=(b.s_blocks * b.window_rows, k * f))
        .astype(np.float32))
    vb = jnp.asarray(rng.normal(size=(b.r_blocks * b.block_rows, f))
                     .astype(np.float32))
    ewb = jnp.asarray(rng.normal(size=(b.senders.shape[0],))
                      .astype(np.float32))

    def bwd(cf, v, w):
        return windowed_gather_reduce_bwd(
            cf, v, b.senders, b.receivers, b.cell_ptr, segs=SEGS,
            r_blocks=b.r_blocks, s_blocks=b.s_blocks,
            block_rows=b.block_rows, window_rows=b.window_rows,
            edge_w=w, scratch_acc=wide)

    bwd32 = jax.jit(bwd)
    bwd16 = jax.jit(lambda cf, v, w: bwd(cf.astype(jnp.bfloat16), v, w))
    g32 = bwd32(coeff, vb, ewb)
    g16 = bwd16(coeff, vb, ewb)
    t32 = timeit(bwd32, coeff, vb, ewb)
    t16 = timeit(bwd16, coeff, vb, ewb)
    print(f"{tag} bwd  f32: {t32*1e3:7.1f} ms ({t32/e*0.94e9:5.1f} cy/e)  "
          f"bf16: {t16*1e3:7.1f} ms ({t16/e*0.94e9:5.1f} cy/e)  "
          f"[{t32/t16:.2f}x, rel_err {rel_err(g16, g32):.1e}]", flush=True)


def main():
    bench(128, wide=False)
    bench(256, wide=True)


if __name__ == "__main__":
    main()
