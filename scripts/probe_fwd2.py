"""Decompose the stationary-m GAT forward: max pass alone, attention
sweep alone, and the composed production fwd; plus the fwd+bwd primitive
(with the split-accumulator backward).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    scripts/probe_fwd2.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from egc_tpu.data import synthetic
from egc_tpu.ops.dispatch import build_kernel_plan
from egc_tpu.ops.pallas.attention import NEG_BIG, gat_attention, gat_fwd
from egc_tpu.ops.pallas.gather_reduce import windowed_gather_reduce

H, CP = 8, 32
HCP = H * CP


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
    senders = np.asarray(raw["senders"])
    receivers = np.asarray(raw["receivers"])
    e = len(senders)
    plan = build_kernel_plan(senders, receivers, 169_343)
    n = plan.n_pad
    rng = np.random.default_rng(0)
    src_pack = jnp.asarray(rng.normal(size=(n, 2 * HCP))
                           .astype(np.float32))
    adst = jnp.asarray(rng.normal(size=(n, 128)).astype(np.float32))

    p = plan.fwd

    @jax.jit
    def maxpass(sp):
        (smax,) = windowed_gather_reduce(
            sp[:, HCP:HCP + 128], p.senders, p.receivers, p.cell_ptr,
            r_blocks=p.r_blocks, s_blocks=p.s_blocks,
            block_rows=p.block_rows, window_rows=p.window_rows,
            ops=("max",))
        return smax

    t = timeit(maxpass, src_pack)
    print(f"max pass alone      : {t*1e3:7.1f} ms ({t/e*0.94e9:6.1f} "
          f"cy/edge)", flush=True)

    smax = maxpass(src_pack)
    zh = adst[:, :H] + smax[:, :H]
    mh = jnp.where(zh >= 0, zh, 0.2 * zh)
    mh = jnp.where((plan.deg > 0)[:, None], mh, NEG_BIG)
    stat = jnp.concatenate(
        [jnp.tile(adst[:, :H], (1, CP)), jnp.tile(mh, (1, CP))], axis=1)
    fa = plan.fwd_attn

    @jax.jit
    def sweep(sp, st):
        return gat_fwd(sp, st, fa.senders, fa.receivers, fa.cell_ptr,
                       heads=H, cp=CP, r_blocks=fa.r_blocks,
                       s_blocks=fa.s_blocks, block_rows=fa.block_rows,
                       window_rows=fa.window_rows)

    t = timeit(sweep, src_pack, stat)
    print(f"attention sweep only: {t*1e3:7.1f} ms ({t/e*0.94e9:6.1f} "
          f"cy/edge)", flush=True)

    @jax.jit
    def fwd(sp, ad):
        return gat_attention(sp, ad, plan, heads=H, cp=CP, dchan=CP - 1)

    t = timeit(fwd, src_pack, adst)
    print(f"composed fwd        : {t*1e3:7.1f} ms ({t/e*0.94e9:6.1f} "
          f"cy/edge)", flush=True)

    @jax.jit
    def fb(sp, ad):
        def loss(sp, ad):
            o, md = gat_attention(sp, ad, plan, heads=H, cp=CP,
                                  dchan=CP - 1)
            return jnp.sum(o) + jnp.sum(md[:, 64:96])
        return jax.grad(loss, argnums=(0, 1))(sp, ad)[0]

    t2 = timeit(fb, src_pack, adst)
    print(f"fwd+bwd             : {t2*1e3:7.1f} ms (bwd ~"
          f"{(t2-t)/e*0.94e9/2:6.1f} cy/edge/pass)", flush=True)

    # individual backward passes (full-lane layout: coeff [n, 3*hcp])
    from egc_tpu.ops.pallas.attention import (
        _bwd_f_kernel, _bwd_t_kernel, _edge_pass,
    )
    coeff = jnp.asarray(rng.normal(size=(n, 3 * HCP)).astype(np.float32))

    @jax.jit
    def bt(cf, sp):
        return _edge_pass(_bwd_t_kernel, cf, sp, plan.bwd_attn, 2 * HCP,
                          heads=H, cp=CP, slope=0.2)

    tbt = timeit(bt, coeff, src_pack)
    print(f"bwd_t pass          : {tbt*1e3:7.1f} ms ({tbt/e*0.94e9:6.1f} "
          f"cy/edge)", flush=True)

    @jax.jit
    def bf(sp, cf):
        return _edge_pass(_bwd_f_kernel, sp, cf, plan.fwd_attn, HCP,
                          heads=H, cp=CP, slope=0.2)

    tbf = timeit(bf, src_pack, coeff)
    print(f"bwd_f pass          : {tbf*1e3:7.1f} ms ({tbf/e*0.94e9:6.1f} "
          f"cy/edge)", flush=True)


if __name__ == "__main__":
    main()
