"""ogbn-mag-homogeneous-scale full-graph training step on one chip.

The reference's largest tuned config (h352 H8 B4 symnorm, reference
hyperparameters.md:139-151; trained full-graph on one GPU with cached
SpMM, mag/configs.py:28-39): 736k paper nodes, ~10.6M directed cite
edges. Measures the fused (wide-lane column-group) step vs XLA.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    scripts/bench_mag_full.py [xla]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from egc_tpu.data import synthetic
from egc_tpu.exp.fullgraph import full_graph_to_device_dict
from egc_tpu.models.nets import MagNet
from egc_tpu.train.optim import make_optimizer
from egc_tpu.train.state import TrainState


def main():
    raw = synthetic.synthetic_full_graph(
        num_nodes=736_389, avg_degree=14, num_classes=349,
        num_features=128, seed=0)
    d = full_graph_to_device_dict(raw)
    g = d["graph"]
    e = int(np.asarray(g.edge_mask).sum())
    y, tmask = d["y"], d["masks"]["train"]
    print(f"nodes={g.nodes.shape[0]} edges={e}", flush=True)

    net = MagNet(hidden_dim=352, num_layers=2, dropout=0.5, heads=8,
                 bases=4, aggrs=("symnorm",))
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.key(0), g, train=False)
    state = TrainState.create(params=variables["params"],
                              batch_stats=variables.get("batch_stats", {}),
                              tx=make_optimizer(1e-2, 0.0))
    y1h = jax.nn.one_hot(y, 349)

    def make_step(graph):
        @jax.jit
        def step(state, rng):
            def loss_fn(params):
                out = net.apply({"params": params}, graph, train=True,
                                rngs={"dropout": rng})
                nll = -jnp.sum(out * y1h, axis=1)
                m = tmask.astype(out.dtype)
                return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return state.apply_gradients(grads), loss

        return step

    rng = jax.random.key(1)
    variants = [("fused", g)]
    if "xla" in sys.argv:
        variants.append(("XLA  ", g.replace(kernel_plan=None)))
    for tag, graph in variants:
        try:
            step = make_step(graph)
            s2, _ = step(state, rng)
            jax.block_until_ready(s2)
            t0 = time.time()
            for _ in range(5):
                s2, loss = step(s2, rng)
            jax.block_until_ready(s2)
            dt = (time.time() - t0) / 5
            print(f"mag h352 EGC-S full-graph step ({tag}): {dt*1e3:.0f} ms"
                  f" ({e/dt/1e6:.2f} M edges/s) loss={float(loss):.3f}",
                  flush=True)
        except Exception as exc:
            print(f"mag h352 step ({tag}): FAILED ({type(exc).__name__}: "
                  f"{str(exc)[:110]})", flush=True)


if __name__ == "__main__":
    main()
