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
    src_pack = jnp.asarray(rng.normal(size=(n, HCP + 128))
                           .astype(np.float32))
    adst = jnp.asarray(rng.normal(size=(n, 128)).astype(np.float32))

    p = plan.fwd

    @jax.jit
    def maxpass(sp):
        (smax,) = windowed_gather_reduce(
            sp[:, HCP:], p.senders, p.receivers, p.cell_ptr,
            r_blocks=p.r_blocks, s_blocks=p.s_blocks,
            block_rows=p.block_rows, window_rows=p.window_rows,
            ops=("max",))
        return smax

    t = timeit(maxpass, src_pack)
    print(f"max pass alone      : {t*1e3:7.1f} ms ({t/e*0.94e9:6.1f} "
          f"cy/edge)", flush=True)

    smax = maxpass(src_pack)
    z = adst[:, 0:64] + smax[:, 0:64]
    m = jnp.where(z >= 0, z, 0.2 * z)
    m = jnp.where((plan.deg > 0)[:, None], m, NEG_BIG)
    stat = jnp.concatenate([adst[:, 0:64], m], axis=1)
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


if __name__ == "__main__":
    main()
