"""PNA arxiv-scale training-step benchmark.

Compares three paths on the reference's tuned arxiv PNA config (h76,
towers=4, aggregators mean/min/max/std, scalers id/amp/att — reference
``experiments/arxiv/configs.py:373-398``):

  factorized + fused Pallas kernels  (production path)
  factorized + XLA segment ops       (plan-free fallback)
  edge-level (reference formulation: [E, T, 2f] gather + per-edge matmul)

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_pna.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from egc_tpu.data import synthetic
from egc_tpu.exp.fullgraph import full_graph_to_device_dict
from egc_tpu.models.nets import ConvSpec, ArxivNet
from egc_tpu.train.optim import make_optimizer
from egc_tpu.train.state import TrainState


class EdgeLevelPNA(nn.Module):
    """The reference's edge-level PNA formulation (pre-factorization), kept
    here only for benchmarking the design delta."""

    out_channels: int
    avg_log_deg: float
    towers: int = 4

    @nn.compact
    def __call__(self, g, x, *, train: bool = False):
        from egc_tpu.graph.transforms import in_degree
        from egc_tpu.nn import init as einit
        from egc_tpu.ops import segment_mean, segment_max, segment_min
        from egc_tpu.ops.segment import segment_std

        n, T = x.shape[0], self.towers
        f_in = x.shape[-1] // T
        f_out = self.out_channels // T
        xt = x.reshape(n, T, f_in)
        h = jnp.concatenate([jnp.take(xt, g.receivers, axis=0),
                             jnp.take(xt, g.senders, axis=0)], axis=-1)
        wpre = self.param("pre_kernel", einit.torch_linear_kernel,
                          (T, 2 * f_in, f_in))
        bpre = self.param("pre_bias", einit.torch_linear_bias(2 * f_in),
                          (T, f_in))
        msg = jnp.einsum("etf,tfo->eto", h, wpre) + bpre
        aggs = [segment_mean(msg, g.receivers, n, mask=g.edge_mask,
                             indices_are_sorted=True),
                segment_min(msg, g.receivers, n, mask=g.edge_mask,
                            indices_are_sorted=True),
                segment_max(msg, g.receivers, n, mask=g.edge_mask,
                            indices_are_sorted=True),
                segment_std(msg, g.receivers, n, mask=g.edge_mask,
                            indices_are_sorted=True)]
        agg = jnp.concatenate(aggs, axis=-1)
        deg = jnp.maximum(
            in_degree(g.receivers, n, g.edge_mask, dtype=agg.dtype), 1.0)
        log_deg = jnp.log(deg + 1.0)[:, None, None]
        agg = jnp.concatenate(
            [agg, agg * (log_deg / self.avg_log_deg),
             agg * (self.avg_log_deg / log_deg)], axis=-1)
        post_in = jnp.concatenate([xt, agg], axis=-1)
        pin = f_in * 13
        wpost = self.param("post_kernel", einit.torch_linear_kernel,
                           (T, pin, f_out))
        bpost = self.param("post_bias", einit.torch_linear_bias(pin),
                           (T, f_out))
        out = jnp.einsum("ntf,tfo->nto", post_in, wpost) + bpost
        return nn.Dense(self.out_channels,
                        kernel_init=einit.torch_linear_kernel,
                        bias_init=einit.torch_linear_bias(self.out_channels),
                        name="lin")(out.reshape(n, self.out_channels))


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
    # production PNA geometry (FullGraphConfig.data): 1024-row narrow
    # transpose windows for the 6-segment backward
    d = full_graph_to_device_dict(
        raw, plan_kwargs={"bwd_narrow_window_rows": 1024})
    g = d["graph"]
    e = int(np.asarray(g.edge_mask).sum())
    y, tmask = d["y"], d["masks"]["train"]
    hidden = 76

    def make_step(graph, net):
        y1h = jax.nn.one_hot(y, 40)

        def loss_fn(params, bs, rng):
            out, mutated = net.apply(
                {"params": params, "batch_stats": bs}, graph,
                train=True, rngs={"dropout": rng}, mutable=["batch_stats"])
            nll = -jnp.sum(out * y1h, axis=1)
            m = tmask.astype(out.dtype)
            return jnp.sum(nll * m) / jnp.sum(m), mutated["batch_stats"]

        @jax.jit
        def step(state, rng):
            (loss, bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.batch_stats, rng)
            return state.apply_gradients(grads, new_batch_stats=bs), loss

        return step

    conv = ConvSpec(kind="pna", avg_log_deg=2.43)
    net = ArxivNet(conv=conv, hidden_dim=hidden, num_layers=3, dropout=0.0,
                   residual=True, num_features=128, num_classes=40)
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.key(0), g, train=False)
    state = TrainState.create(params=variables["params"],
                              batch_stats=variables.get("batch_stats", {}),
                              tx=make_optimizer(1e-2, 0.0))
    rng = jax.random.key(1)

    step_fused = make_step(g, net)
    t = timeit(lambda s: step_fused(s, rng)[1], state)
    print(f"PNA h{hidden} factorized+fused step: {t*1e3:.1f} ms "
          f"({e/t/1e6:.2f} M edges/s)", flush=True)

    g_xla = g.replace(kernel_plan=None)
    step_xla = make_step(g_xla, net)
    t = timeit(lambda s: step_xla(s, rng)[1], state)
    print(f"PNA h{hidden} factorized+XLA step:   {t*1e3:.1f} ms "
          f"({e/t/1e6:.2f} M edges/s)", flush=True)

    # edge-level reference formulation (swap the conv layer class)
    import egc_tpu.models.nets as nets_mod
    orig = nets_mod.PNAConv
    try:
        nets_mod.PNAConv = (
            lambda out, avg_log_deg, **kw: EdgeLevelPNA(out, avg_log_deg))
        net_e = ArxivNet(conv=conv, hidden_dim=hidden, num_layers=3,
                         dropout=0.0, residual=True, num_features=128,
                         num_classes=40)
        variables_e = jax.jit(net_e.init, static_argnames=("train",))(
            jax.random.key(0), g_xla, train=False)
        state_e = TrainState.create(
            params=variables_e["params"],
            batch_stats=variables_e.get("batch_stats", {}),
            tx=make_optimizer(1e-2, 0.0))
        step_e = make_step(g_xla, net_e)
        t = timeit(lambda s: step_e(s, rng)[1], state_e)
        print(f"PNA h{hidden} edge-level XLA step:   {t*1e3:.1f} ms "
              f"({e/t/1e6:.2f} M edges/s)", flush=True)
    except Exception as exc:
        print(f"PNA h{hidden} edge-level XLA step:   FAILED "
              f"({type(exc).__name__}: {str(exc)[:120]})", flush=True)
    finally:
        nets_mod.PNAConv = orig


if __name__ == "__main__":
    main()
