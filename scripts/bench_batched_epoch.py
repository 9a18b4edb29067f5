"""Batched-task (zinc-shape) training-epoch pipeline benchmark.

Molecule batches are tiny on-device (~3-5 ms/step), so the epoch is
host-bound: batch_np padding + per-batch kernel-plan build. Measures the
epoch with and without prefetch threads (and with device-synced losses
for reference — the round-1 behavior).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    scripts/bench_batched_epoch.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from egc_tpu.data import synthetic
from egc_tpu.data.loaders import GraphLoader, padding_budget
from egc_tpu.models.nets import ConvSpec, ZincNet
from egc_tpu.train.loop import make_train_step, train_epoch
from egc_tpu.train.optim import make_optimizer
from egc_tpu.train.state import TrainState


def main():
    splits = synthetic.synthetic_zinc(num_graphs=4096)
    graphs = splits["train"]
    bs = 128
    budget = padding_budget(graphs, bs,
                            node_multiple=GraphLoader.PLAN_BLOCK)

    net = ZincNet(conv=ConvSpec(kind="egc", heads=8, bases=4,
                                aggrs=("symnorm",), softmax=True),
                  hidden_dim=168, num_layers=4, residual=True)

    def loss_fn(out, y, graph):
        err = jnp.abs(out.reshape(-1) - y.reshape(-1).astype(out.dtype))
        m = graph.graph_mask.astype(out.dtype)
        return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)

    loader0 = GraphLoader(graphs, bs, shuffle=True, budget=budget,
                          kernel_plans=True, seed=0)
    g0, y0 = next(iter(loader0))
    g0j = jax.tree.map(jnp.asarray, g0)
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.key(0), g0j, train=False)
    state0 = TrainState.create(params=variables["params"],
                               batch_stats=variables["batch_stats"],
                               tx=make_optimizer(1e-3, 0.0))
    step = make_train_step(net, loss_fn)
    # warm the jit
    s, _ = step(state0, g0j, jnp.asarray(y0), jax.random.key(1))
    jax.block_until_ready(s)

    for prefetch, tag in ((4, "pre4   "), (0, "sync   "), (4, "pre4b  ")):
        loader = GraphLoader(graphs, bs, shuffle=True, budget=budget,
                             kernel_plans=True, prefetch=prefetch, seed=0)
        state = state0
        t0 = time.time()
        state, loss = train_epoch(step, state, loader, jax.random.key(2))
        jax.block_until_ready(state)
        dt = time.time() - t0
        nb = len(loader)
        print(f"zinc epoch {tag}: {dt:.2f}s ({dt/nb*1e3:.1f} ms/batch, "
              f"{nb} batches) loss={loss:.3f}", flush=True)


if __name__ == "__main__":
    main()
