"""Isolate the fused GAT passes at arxiv scale.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_gat.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from egc_tpu.data import synthetic
from egc_tpu.exp.fullgraph import full_graph_to_device_dict
from egc_tpu.ops.pallas.attention import gat_fwd, gat_attention


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
    d = full_graph_to_device_dict(raw)
    plan = d["graph"].kernel_plan
    n = plan.n_pad
    e = len(raw["senders"])
    H, cp = 8, 32
    hcp = H * cp
    rng = np.random.default_rng(0)
    src_pack = jnp.asarray(rng.normal(size=(n, hcp + 128))
                           .astype(np.float32))
    adst = jnp.asarray(rng.normal(size=(n, 128)).astype(np.float32))

    fa = plan.fwd_attn
    print(f"# fwd_attn R={fa.r_blocks} S={fa.s_blocks}; "
          f"bwd_attn R={plan.bwd_attn.r_blocks} S={plan.bwd_attn.s_blocks}",
          flush=True)

    @jax.jit
    def fwd(src_pack, adst):
        return gat_fwd(src_pack, adst, fa.senders, fa.receivers, fa.cell_ptr,
                       heads=H, cp=cp, r_blocks=fa.r_blocks,
                       s_blocks=fa.s_blocks, block_rows=fa.block_rows,
                       window_rows=fa.window_rows)

    t = timeit(fwd, src_pack, adst)
    print(f"gat_fwd pass: {t*1e3:.1f} ms ({t/e*0.94e9:.1f} cy/edge)",
          flush=True)

    @jax.jit
    def full(src_pack, adst):
        def loss(sp, ad):
            o, md = gat_attention(sp, ad, plan, heads=H, cp=cp)
            return jnp.sum(o) + jnp.sum(md[:, 64:96])
        v, g = jax.value_and_grad(loss, argnums=(0, 1))(src_pack, adst)
        return g[0]

    t2 = timeit(full, src_pack, adst)
    print(f"fwd+bwd(2 passes): {t2*1e3:.1f} ms; bwd alone ~"
          f"{(t2-t)*1e3:.1f} ms ({(t2-t)/e*0.94e9/2:.1f} cy/edge/pass)",
          flush=True)


if __name__ == "__main__":
    main()
