"""Per-edge body cost isolation for the production GAT fwd sweep.

Monkeypatches attention._fwd_kernel with stripped variants and times each
through the PRODUCTION gat_fwd wrapper on the real arxiv-scale plan
(the retired probe_attn_body used a synthetic uniform plan whose numbers
contradicted production — this one keeps everything else identical).

variants:
  minimal   row read + o RMW (+= wh)
  noexp     + stat read + sub + coarse repeat(x4) + mul
  exp       noexp + exp
  prod      production body (exp + fine repeat(p[:, :H], cp))

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    scripts/probe_fwd_variants.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from egc_tpu.data import synthetic
from egc_tpu.ops.dispatch import build_kernel_plan
import egc_tpu.ops.pallas.attention as attn

H, CP = 8, 32
HCP = H * CP


def make_fwd_kernel(variant):
    def _k(cell_ptr_ref, src_win, stat_blk, senders_hbm, receivers_hbm,
           o_out, o_acc, sidx, ridx, sem_idx, sem_w, seq_ref, *,
           heads, cp, slope, block_rows, window_rows, chunk, s_blocks):
        from egc_tpu.ops.pallas.gather_reduce import _chunk_sweep

        hcp = heads * cp
        i = pl.program_id(0)
        s = pl.program_id(1)
        row0 = i * block_rows
        col0 = s * window_rows

        @pl.when(s == 0)
        def _():
            o_acc[:] = jnp.zeros_like(o_acc)

        def process_chunk(base, lo, n_e):
            def body(j, _):
                row = src_win[pl.ds(sidx[base + j] - col0, 1), :]
                wh = row[:, :hcp]
                r = ridx[base + j] - row0
                if variant == "minimal":
                    o_acc[pl.ds(r, 1), :] = o_acc[pl.ds(r, 1), :] + wh
                    return 0
                if variant == "rowrep":
                    # repeat+mul from the ALREADY-LOADED row (no stat read)
                    p_e = pltpu.repeat(row[:, hcp:hcp + 64],
                                       hcp // 64, axis=1)
                    o_acc[pl.ds(r, 1), :] = (o_acc[pl.ds(r, 1), :]
                                             + p_e * wh)
                    return 0
                stat = stat_blk[pl.ds(r, 1), :]
                if variant == "statrep":
                    # adds the stationary-row dynamic read
                    p_e = pltpu.repeat(stat[:, 0:64], hcp // 64, axis=1)
                    o_acc[pl.ds(r, 1), :] = (o_acc[pl.ds(r, 1), :]
                                             + p_e * wh)
                    return 0
                asrc = row[:, hcp:hcp + 64]
                z = asrc + stat[:, 0:64]
                e = jnp.where(z >= 0, z, slope * z)
                if variant == "noexp":
                    p = e - stat[:, 64:128]
                else:
                    p = jnp.exp(e - stat[:, 64:128])
                if variant == "prod":
                    p_e = pltpu.repeat(p[:, :heads], cp, axis=1)
                else:
                    p_e = pltpu.repeat(p, hcp // 64, axis=1)
                o_acc[pl.ds(r, 1), :] = o_acc[pl.ds(r, 1), :] + p_e * wh
                return 0

            jax.lax.fori_loop(lo, n_e, body, 0)

        _chunk_sweep(cell_ptr_ref, chunk, s_blocks, sidx, ridx, None,
                     sem_idx, sem_w, seq_ref,
                     (senders_hbm, receivers_hbm, None), process_chunk)

        @pl.when(s == s_blocks - 1)
        def _():
            o_out[:] = o_acc[:]

    return _k


def timeit(fn, *args, steps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / steps


def main():
    raw = synthetic.synthetic_full_graph(
        num_nodes=169_343, avg_degree=14, num_classes=40, num_features=128,
        seed=0)
    plan = build_kernel_plan(np.asarray(raw["senders"]),
                             np.asarray(raw["receivers"]), 169_343)
    e = len(raw["senders"])
    fa = plan.fwd_attn
    n = plan.n_pad
    rng = np.random.default_rng(0)
    src_pack = jnp.asarray(rng.normal(size=(n, 2 * HCP))
                           .astype(np.float32))
    stat = jnp.asarray(rng.normal(size=(n, 2 * HCP))
                       .astype(np.float32))

    import sys
    variants = sys.argv[1:] or ("minimal", "noexp", "exp", "prod")
    orig = attn._fwd_kernel
    for variant in variants:
        attn._fwd_kernel = make_fwd_kernel(variant)

        @jax.jit
        def fwd(sp, st):
            return attn.gat_fwd(sp, st, fa.senders, fa.receivers,
                                fa.cell_ptr, heads=H, cp=CP,
                                r_blocks=fa.r_blocks, s_blocks=fa.s_blocks,
                                block_rows=fa.block_rows,
                                window_rows=fa.window_rows)

        try:
            t = timeit(fwd, src_pack, stat)
            print(f"{variant:8s}: {t*1e3:7.1f} ms ({t/e*0.94e9:6.1f} "
                  f"cy/edge)", flush=True)
        except Exception as ex:  # noqa
            print(f"{variant:8s}: FAILED {type(ex).__name__}: "
                  f"{str(ex)[:150]}", flush=True)
    attn._fwd_kernel = orig


if __name__ == "__main__":
    main()
