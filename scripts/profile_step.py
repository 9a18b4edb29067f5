"""Break down the bench step: isolated fwd/bwd kernel passes vs XLA glue.

Run on the real TPU:
  env PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_step.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from egc_tpu.data import synthetic
from egc_tpu.exp.fullgraph import full_graph_to_device_dict
from egc_tpu.ops.dispatch import fused_multi_aggregate


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
    d = full_graph_to_device_dict(raw)
    g = d["graph"]
    plan = g.kernel_plan
    num_edges = int(np.asarray(g.edge_mask).sum())
    n_pad = plan.n_pad
    print(f"# edges={num_edges} n_pad={n_pad} "
          f"fwd R={plan.fwd.r_blocks} S={plan.fwd.s_blocks} "
          f"bwd R={plan.bwd.r_blocks} S={plan.bwd.s_blocks}", flush=True)

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(n_pad, 128)).astype(np.float32))
    aggrs = ("symnorm", "max", "mean")
    ew = g.edge_weight
    sw = g.self_weight

    @jax.jit
    def fwd(x):
        return fused_multi_aggregate(x, plan, aggrs, symnorm_edge_w=ew,
                                     symnorm_self_w=sw)

    @jax.jit
    def fwdbwd(x, ct):
        out, vjp = jax.vjp(lambda v: fused_multi_aggregate(
            v, plan, aggrs, symnorm_edge_w=ew, symnorm_self_w=sw), x)
        return vjp(ct)[0]

    t_fwd = timeit(fwd, x)
    print(f"fwd pass (3 prims): {t_fwd*1e3:.1f} ms  "
          f"{t_fwd/num_edges*0.94e9:.1f} cy/edge", flush=True)

    ct = jnp.ones((n_pad, 3, 128), jnp.float32)
    t_fb = timeit(fwdbwd, x, ct)
    print(f"fwd+bwd pass: {t_fb*1e3:.1f} ms; bwd alone ~"
          f"{(t_fb-t_fwd)*1e3:.1f} ms "
          f"{(t_fb-t_fwd)/num_edges*0.94e9:.1f} cy/edge", flush=True)

    # single-primitive costs
    for aset in (("sum",), ("symnorm",), ("sum", "symnorm"),
                 ("max",), ("sum", "symnorm", "sumsq" if False else "max")):
        @jax.jit
        def f1(x, _a=tuple(aset)):
            return fused_multi_aggregate(x, plan, _a, symnorm_edge_w=ew,
                                         symnorm_self_w=sw)
        t = timeit(f1, x)
        print(f"fwd {aset}: {t*1e3:.1f} ms "
              f"{t/num_edges*0.94e9:.1f} cy/edge", flush=True)


if __name__ == "__main__":
    main()
