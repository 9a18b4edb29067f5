"""Probe backward narrow-window geometry for many-segment aggregator sets.

PNA's {mean,min,max,std} set needs 6 backward coeff segments, which
dispatches to the bwd_narrow transpose plan (512-row windows — the only
width that fit VMEM with the default 4096-row blocks). The narrow grid has
4x the cells of the regular plan and the bwd sweep measures 19.6 cy/edge
vs a ~16.4 cy access floor. Hypothesis: 1024-row windows with 2048-row
blocks (coeff stream 6.3 MB + 2 MB vals + 2 MB out double-buffered) fit
VMEM and halve the cell count.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    scripts/probe_pna_geom.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from egc_tpu.data import synthetic
from egc_tpu.graph.structure import Graph, pad_graph
from egc_tpu.graph.transforms import symnorm_weight
from egc_tpu.models.nets import ConvSpec, ArxivNet
from egc_tpu.ops.dispatch import build_kernel_plan
from egc_tpu.train.optim import make_optimizer
from egc_tpu.train.state import TrainState

GEOMS = {
    # label: (bwd_block_rows, bwd_narrow_window_rows)
    "nb4096_nw512 (current)": dict(),
    "nb4096_nw1024": dict(bwd_narrow_window_rows=1024),
    "nb2048_nw1024": dict(bwd_block_rows=2048, bwd_narrow_window_rows=1024),
}


def main():
    raw = synthetic.synthetic_full_graph(
        num_nodes=169_343, avg_degree=14, num_classes=40, num_features=128,
        seed=0)
    n = raw["x"].shape[0]
    deg = np.zeros(n, np.int64)
    np.add.at(deg, np.asarray(raw["receivers"]), 1)
    conv = ConvSpec(kind="pna", avg_log_deg=float(np.log(deg + 1).mean()))
    ew, sw = symnorm_weight(jnp.asarray(raw["senders"]),
                            jnp.asarray(raw["receivers"]), n)

    for label, geo in GEOMS.items():
        t0 = time.time()
        plan = build_kernel_plan(raw["senders"], raw["receivers"], n,
                                 edge_weight=np.asarray(ew),
                                 attention=False, **geo)
        g = Graph.from_coo(raw["x"], raw["senders"], raw["receivers"])
        g = g.replace(edge_weight=np.asarray(ew), self_weight=np.asarray(sw))
        g = pad_graph(g, num_nodes=plan.n_pad,
                      num_edges=len(raw["senders"]))
        g = jax.tree.map(jnp.asarray, g.replace(kernel_plan=plan))
        e = int(np.asarray(g.edge_mask).sum())
        y = jnp.asarray(np.pad(raw["y"], (0, plan.n_pad - n)))
        tm = np.zeros(plan.n_pad, bool)
        tm[raw["train_idx"]] = True
        tmask = jnp.asarray(tm)

        net = ArxivNet(conv=conv, hidden_dim=76, num_layers=3, dropout=0.0,
                       residual=True, num_features=128, num_classes=40)
        variables = jax.jit(net.init, static_argnames=("train",))(
            jax.random.key(0), g, train=False)
        state = TrainState.create(params=variables["params"],
                                  batch_stats=variables.get("batch_stats",
                                                            {}),
                                  tx=make_optimizer(1e-2, 0.0))

        @jax.jit
        def step(state, graph, y, tmask, rng):
            def loss_fn(params, bs):
                out, mut = net.apply(
                    {"params": params, "batch_stats": bs}, graph,
                    train=True, rngs={"dropout": rng},
                    mutable=["batch_stats"])
                nll = -jnp.sum(out * jax.nn.one_hot(y, 40), axis=1)
                m = tmask.astype(out.dtype)
                return jnp.sum(nll * m) / jnp.sum(m), mut["batch_stats"]

            (loss, bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.batch_stats)
            return state.apply_gradients(grads, new_batch_stats=bs), loss

        rng = jax.random.key(1)
        try:
            s2, loss = step(state, g, y, tmask, rng)
            jax.block_until_ready(s2)
            t0 = time.time()
            for _ in range(5):
                s2, loss = step(s2, g, y, tmask, rng)
            jax.block_until_ready(s2)
            dt = (time.time() - t0) / 5
            print(f"{label}: {dt*1e3:.1f} ms ({e/dt/1e6:.2f} M edges/s) "
                  f"loss={float(loss):.4f}", flush=True)
        except Exception as exc:
            print(f"{label}: FAILED ({type(exc).__name__}: "
                  f"{str(exc)[:120]})", flush=True)


if __name__ == "__main__":
    main()
