"""code2-scale batched training-step benchmark (fused vs XLA).

CodeNet at the reference's tuned EGC-M width (h300 — reference
train_main_table.sh code2 line): batch of 128 real-size ASTs (~125 avg
nodes, 5000+2 vocab, 5 heads). Measures the jitted step alone (warm
batch resident on device — the input-pipeline story is
bench_batched_epoch.py).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    scripts/bench_code2_step.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from egc_tpu.data import synthetic
from egc_tpu.data.loaders import GraphLoader, padding_budget
from egc_tpu.models.nets import ConvSpec, CodeNet
from egc_tpu.train.optim import make_optimizer
from egc_tpu.train.state import TrainState


def main():
    splits = synthetic.synthetic_code(num_graphs=512, vocab_size=5000)
    graphs = splits["train"]
    bs = 128
    budget = padding_budget(graphs, bs,
                            node_multiple=GraphLoader.PLAN_BLOCK)
    net = CodeNet(conv=ConvSpec(kind="egc", heads=4, bases=4,
                                aggrs=("symnorm", "min", "max")),
                  hidden_dim=300, num_layers=4, vocab_size=5000)

    def make(loader_plans):
        loader = GraphLoader(graphs, bs, shuffle=False, budget=budget,
                             kernel_plans=loader_plans, seed=0)
        g0, y0 = next(iter(loader))
        g0j = jax.tree.map(jnp.asarray, g0)
        y0j = jnp.asarray(y0)
        variables = jax.jit(net.init, static_argnames=("train",))(
            jax.random.key(0), g0j, train=False)
        state = TrainState.create(params=variables["params"],
                                  batch_stats=variables["batch_stats"],
                                  tx=make_optimizer(1e-3, 0.0))

        @jax.jit
        def step(state, g, y, rng):
            def loss_fn(params, bs_):
                out, mut = net.apply(
                    {"params": params, "batch_stats": bs_}, g, train=True,
                    rngs={"dropout": rng}, mutable=["batch_stats"])
                tgt = jax.nn.one_hot(y, out.shape[-1])
                ce = -jnp.sum(jax.nn.log_softmax(out) * tgt, axis=-1)
                m = g.graph_mask.astype(out.dtype)[:, None]
                return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m) * 5, 1.0), \
                    mut["batch_stats"]

            (loss, bs_), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.batch_stats)
            return state.apply_gradients(grads, new_batch_stats=bs_), loss

        return state, g0j, y0j, step

    e = int(np.asarray(next(iter(GraphLoader(graphs, bs, budget=budget,
                                             seed=0)))[0].edge_mask).sum())
    for plans, tag in ((True, "fused"), (False, "XLA  ")):
        state, g, y, step = make(plans)
        s2, _ = step(state, g, y, jax.random.key(1))
        jax.block_until_ready(s2)
        t0 = time.time()
        for i in range(20):
            state, loss = step(state, g, y, jax.random.key(i))
        jax.block_until_ready(state)
        dt = (time.time() - t0) / 20
        print(f"code2 h300 EGC-M step ({tag}): {dt*1e3:.2f} ms "
              f"({e/dt/1e6:.2f} M edges/s) loss={float(loss):.3f}",
              flush=True)


if __name__ == "__main__":
    main()
