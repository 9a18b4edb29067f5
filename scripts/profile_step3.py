"""Glue breakdown: net fwd vs grads vs Adam, plus head-mix einsum cost.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_step3.py
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
    conv = ConvSpec(kind="egc", heads=4, bases=4,
                    aggrs=("symnorm", "max", "mean"))
    net = ArxivNet(conv=conv, hidden_dim=128, num_layers=3, dropout=0.0,
                   residual=True, num_features=128, num_classes=40)
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.key(0), g, train=False)
    state = TrainState.create(params=variables["params"],
                              batch_stats=variables.get("batch_stats", {}),
                              tx=make_optimizer(1e-2, 0.0))
    y, tmask = d["y"], d["masks"]["train"]

    @jax.jit
    def fwd_train(params, bs, graph, rng):
        out, _m = net.apply({"params": params, "batch_stats": bs}, graph,
                            train=True, rngs={"dropout": rng},
                            mutable=["batch_stats"])
        return out.sum()

    def loss_fn(params, bs, graph, rng):
        out, mutated = net.apply({"params": params, "batch_stats": bs},
                                 graph, train=True, rngs={"dropout": rng},
                                 mutable=["batch_stats"])
        nll = -jnp.take_along_axis(out, y[:, None], axis=1).reshape(-1)
        m = tmask.astype(out.dtype)
        return jnp.sum(nll * m) / jnp.sum(m), mutated["batch_stats"]

    @jax.jit
    def grads_only(params, bs, graph, rng):
        (_l, _b), gr = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bs, graph, rng)
        return gr

    @jax.jit
    def full_step(state, graph, rng):
        (loss, bs), gr = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, graph, rng)
        return state.apply_gradients(gr, new_batch_stats=bs), loss

    rng = jax.random.key(1)
    t1 = timeit(fwd_train, state.params, state.batch_stats, g, rng)
    print(f"net fwd (train mode): {t1*1e3:.1f} ms", flush=True)
    t2 = timeit(grads_only, state.params, state.batch_stats, g, rng)
    print(f"value_and_grad: {t2*1e3:.1f} ms", flush=True)
    t3 = timeit(full_step, state, g, rng)
    print(f"full step (+Adam): {t3*1e3:.1f} ms", flush=True)

    # head-mix einsum in isolation
    n = g.nodes.shape[0]
    w = jnp.asarray(np.random.default_rng(1).normal(
        size=(n, 4, 4, 3)).astype(np.float32))
    yv = jnp.asarray(np.random.default_rng(2).normal(
        size=(n, 3, 4, 32)).astype(np.float32))

    @jax.jit
    def headmix(w, yv):
        return jnp.einsum("nhba,nabl->nhl", w, yv)

    @jax.jit
    def headmix_vjp(w, yv):
        out, vjp = jax.vjp(headmix, w, yv)
        return vjp(out)

    t4 = timeit(headmix, w, yv)
    t5 = timeit(headmix_vjp, w, yv)
    print(f"head-mix einsum fwd: {t4*1e3:.2f} ms; fwd+bwd {t5*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
