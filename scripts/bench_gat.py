"""GAT arxiv-scale training-step benchmark: fused Pallas attention vs XLA.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_gat.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from egc_tpu.data import synthetic
from egc_tpu.exp.fullgraph import full_graph_to_device_dict
from egc_tpu.models.nets import ConvSpec, ArxivNet
from egc_tpu.train.optim import make_optimizer
from egc_tpu.train.state import TrainState


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
    g = d["graph"]
    e = int(np.asarray(g.edge_mask).sum())
    y, tmask = d["y"], d["masks"]["train"]

    import sys
    want = sys.argv[1:] or ["gat", "gatv2"]
    # reference tuned arxiv configs: GAT h152 / GATv2 h112, 8 heads
    for kind, hidden in (("gat", 152), ("gatv2", 112)):
        if kind not in want:
            continue
        conv = ConvSpec(kind=kind, heads=8)
        net = ArxivNet(conv=conv, hidden_dim=hidden, num_layers=3,
                       dropout=0.0, residual=True, num_features=128,
                       num_classes=40)
        variables = jax.jit(net.init, static_argnames=("train",))(
            jax.random.key(0), g, train=False)
        state = TrainState.create(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            tx=make_optimizer(1e-2, 0.0))

        def make_step(graph, net=net):
            def loss_fn(params, bs, rng):
                out, mutated = net.apply(
                    {"params": params, "batch_stats": bs}, graph,
                    train=True, rngs={"dropout": rng},
                    mutable=["batch_stats"])
                nll = -jnp.take_along_axis(out, y[:, None],
                                           axis=1).reshape(-1)
                m = tmask.astype(out.dtype)
                return jnp.sum(nll * m) / jnp.sum(m), mutated["batch_stats"]

            @jax.jit
            def step(state, rng):
                (loss, bs), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params, state.batch_stats,
                                           rng)
                return state.apply_gradients(grads, new_batch_stats=bs), loss

            return step

        rng = jax.random.key(1)
        tag = f"{kind.upper()} h{hidden} H8"
        step_fused = make_step(g)
        t_fused = timeit(lambda s: step_fused(s, rng)[1], state)
        print(f"{tag} fused step: {t_fused*1e3:.1f} ms "
              f"({e/t_fused/1e6:.2f} M edges/s)", flush=True)

        if "profile" in want:
            # per-op accounting (VERDICT r4 item 4: GAT v1 step vs
            # kernel-level probe gap)
            from egc_tpu.utils.profiling import print_op_table
            with jax.profiler.trace("/tmp/gattrace"):
                s2, _ = step_fused(state, rng)
                jax.block_until_ready(s2)
            print_op_table("/tmp/gattrace")

        g_xla = g.replace(kernel_plan=None)
        step_xla = make_step(g_xla)
        try:
            t_xla = timeit(lambda s: step_xla(s, rng)[1], state)
            print(f"{tag} XLA step:   {t_xla*1e3:.1f} ms "
                  f"({e/t_xla/1e6:.2f} M edges/s)  speedup "
                  f"{t_xla/t_fused:.2f}x", flush=True)
        except Exception as exc:  # XLA GATv2 at arxiv scale OOMs (16G HBM)
            print(f"{tag} XLA step:   FAILED ({type(exc).__name__}: "
                  f"{str(exc)[:120]})", flush=True)


if __name__ == "__main__":
    main()
