"""Block-size sweep for the windowed kernels + glue breakdown.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_step2.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from egc_tpu.data import synthetic
from egc_tpu.ops.dispatch import build_kernel_plan, fused_multi_aggregate


def timeit(fn, *args, steps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / steps


def main():
    n_nodes, avg_deg = 169_343, 14
    raw = synthetic.synthetic_full_graph(
        num_nodes=n_nodes, avg_degree=avg_deg, num_classes=40,
        num_features=128, seed=0)
    s, r = raw["senders"], raw["receivers"]
    e = len(s)
    from egc_tpu.graph.transforms import symnorm_weight
    ew_full, sw_full = symnorm_weight(jnp.asarray(s), jnp.asarray(r), n_nodes)
    aggrs = ("symnorm", "max", "mean")

    cfgs = [
        # (fwd_br, fwd_wr, bwd_br, bwd_wr)  — current defaults first
        (2048, 4096, 4096, 512),
        (2048, 4096, 2048, 2048),
        (2048, 8192, 2048, 2048),
        (1024, 8192, 2048, 4096),
        (4096, 4096, 4096, 2048),
    ]
    for (fbr, fwr, bbr, bwr) in cfgs:
        try:
            plan = build_kernel_plan(s, r, n_nodes, fwd_block_rows=fbr,
                                     fwd_window_rows=fwr, bwd_block_rows=bbr,
                                     bwd_window_rows=bwr)
            n_pad = plan.n_pad
            x = jnp.asarray(np.random.default_rng(0).normal(
                size=(n_pad, 128)).astype(np.float32))
            sw = jnp.zeros(n_pad).at[:n_nodes].set(sw_full)

            @jax.jit
            def fwd(x, _p=plan, _sw=sw):
                return fused_multi_aggregate(x, _p, aggrs,
                                             symnorm_edge_w=ew_full,
                                             symnorm_self_w=_sw)

            @jax.jit
            def fwdbwd(x, ct, _p=plan, _sw=sw):
                out, vjp = jax.vjp(lambda v: fused_multi_aggregate(
                    v, _p, aggrs, symnorm_edge_w=ew_full,
                    symnorm_self_w=_sw), x)
                return vjp(ct)[0]

            ct = jnp.ones((n_pad, 3, 128), jnp.float32)
            t_f = timeit(fwd, x)
            t_fb = timeit(fwdbwd, x, ct)
            print(f"f({fbr},{fwr}) b({bbr},{bwr}): fwd {t_f*1e3:.1f} ms "
                  f"({t_f/e*0.94e9:.1f} cy/e)  bwd {(t_fb-t_f)*1e3:.1f} ms "
                  f"({(t_fb-t_f)/e*0.94e9:.1f} cy/e)", flush=True)
        except Exception as ex:  # noqa
            print(f"f({fbr},{fwr}) b({bbr},{bwr}): FAILED "
                  f"{type(ex).__name__}: {str(ex)[:200]}", flush=True)


if __name__ == "__main__":
    main()
