"""Fused GAT attention pass matrix at arxiv scale: geometry x DMA scheme.

Measures the PRODUCTION gat_fwd kernel (and optionally the full
fwd+bwd primitive) across attention plan geometries
(EGC_TPU_ATTN_GEOM) and chunk-DMA schemes (EGC_TPU_ATTN_BLOCKING) to
pick the shipping configuration. Every row is a fresh plan + jit.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    scripts/profile_gat.py [full]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from egc_tpu.data import synthetic
from egc_tpu.ops.dispatch import build_kernel_plan
from egc_tpu.ops.pallas.attention import gat_fwd, gat_attention

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
    nn_ = 169_343
    e = len(senders)
    rng = np.random.default_rng(0)

    full_mode = "full" in sys.argv[1:]
    top = [int(a[4:]) for a in sys.argv[1:] if a.startswith("top=")]
    configs = [
        ("pipe", "1024x4096,1024x1024"),     # tall windows: 4x fewer cells
        ("pipe", "2048x2048,1024x1024"),     # 2x fewer cells
        ("pipe", "2048x1024,1024x1024"),     # shipping config (round 2)
        ("blk", "2048x1024,1024x1024"),
        ("blk", "1024x1024"),
        ("pipe", "1024x1024"),
        ("blk", "1024x2048"),
        ("blk", "2048x512"),
        ("blk", "512x2048"),
    ]
    if top:
        configs = configs[:top[0]]
    for mode, geom in configs:
        os.environ["EGC_TPU_ATTN_BLOCKING"] = "1" if mode == "blk" else "0"
        os.environ["EGC_TPU_ATTN_GEOM"] = geom
        try:
            plan = build_kernel_plan(senders, receivers, nn_)
            n = plan.n_pad
            src_pack = jnp.asarray(
                rng.normal(size=(n, 2 * HCP)).astype(np.float32))
            adst = jnp.asarray(rng.normal(size=(n, 128)).astype(np.float32))

            @jax.jit
            def fwd(sp, ad, plan=plan):
                # production fwd: stationary-m max pass + attention sweep
                return gat_attention(sp, ad, plan, heads=H, cp=CP,
                                     dchan=CP - 1)

            t = timeit(fwd, src_pack, adst)
            line = (f"{mode:4s} {geom:22s} fwd {t*1e3:7.1f} ms "
                    f"({t/e*0.94e9:6.1f} cy/edge)")
            if full_mode:
                @jax.jit
                def fb(sp, ad, plan=plan):
                    def loss(sp, ad):
                        o, md = gat_attention(sp, ad, plan, heads=H, cp=CP,
                                              dchan=CP - 1)
                        return jnp.sum(o) + jnp.sum(md[:, 64:96])
                    return jax.grad(loss, argnums=(0, 1))(sp, ad)[0]

                t2 = timeit(fb, src_pack, adst)
                line += (f" | fwd+bwd {t2*1e3:7.1f} ms "
                         f"(bwd ~{(t2-t)/e*0.94e9/2:6.1f} cy/edge/pass)")
            print(line, flush=True)
        except Exception as ex:  # noqa
            print(f"{mode:4s} {geom:22s} FAILED {type(ex).__name__}: "
                  f"{str(ex)[:120]}", flush=True)


if __name__ == "__main__":
    main()
