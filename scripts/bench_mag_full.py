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
    T0 = time.time()
    n_target = 368_000 if "half" in sys.argv else 736_389
    raw = synthetic.synthetic_full_graph(
        num_nodes=n_target, avg_degree=14, num_classes=349,
        num_features=128, seed=0)
    # lean manual setup (vs full_graph_to_device_dict): symnorm-only EGC
    # needs just the fwd/bwd layouts — the default builds 6 (narrow bwd +
    # attention + v2), tripling the tunnel transfer at 10.6M edges
    from egc_tpu.graph.structure import Graph, pad_graph
    from egc_tpu.graph.transforms import symnorm_weight
    from egc_tpu.ops.dispatch import build_kernel_plan
    n = raw["x"].shape[0]
    ew, sw = symnorm_weight(jnp.asarray(raw["senders"]),
                            jnp.asarray(raw["receivers"]), n)
    from egc_tpu.ops.dispatch import wide_plan_geometry
    geo = wide_plan_geometry(("symnorm",))   # 8192-row blocks: 4x less
    # window/coeff restreaming (the profiled bandwidth wall at 737k rows)
    plan = build_kernel_plan(raw["senders"], raw["receivers"], n,
                             edge_weight=np.asarray(ew),
                             attention=False, **geo)
    g = Graph.from_coo(raw["x"], raw["senders"], raw["receivers"])
    # edge_weight must ride the Graph: without it EGConv recomputes
    # gcn_norm IN-GRAPH each step (a 90 ms scatter-add at 10.3M edges,
    # profiled) and then the fused path ignores it for the plan's
    # pre-permuted weights anyway
    g = g.replace(edge_weight=np.asarray(ew), self_weight=np.asarray(sw))
    g = pad_graph(g, num_nodes=plan.n_pad, num_edges=len(raw["senders"]))
    g = g.replace(kernel_plan=plan)
    g = jax.tree.map(jnp.asarray, g)
    e = int(np.asarray(g.edge_mask).sum())
    y = jnp.asarray(np.pad(raw["y"], (0, plan.n_pad - n)))
    tm = np.zeros(plan.n_pad, bool)
    tm[raw["train_idx"]] = True
    tmask = jnp.asarray(tm)
    print(f"nodes={g.nodes.shape[0]} edges={e} t={time.time()-T0:.0f}s",
          flush=True)

    net = MagNet(hidden_dim=352, num_layers=2, dropout=0.5, heads=8,
                 bases=4, aggrs=("symnorm",), log_probs=False)
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.key(0), g, train=False)
    jax.block_until_ready(variables)
    print(f"init done t={time.time()-T0:.0f}s", flush=True)
    state = TrainState.create(params=variables["params"],
                              batch_stats=variables.get("batch_stats", {}),
                              tx=make_optimizer(1e-2, 0.0))

    def make_step():
        # NB: graph/labels as ARGUMENTS, not closure constants — jit
        # constants are shipped inside the remote-compile request body and
        # a mag-scale one-hot matrix (737k x 349 = 1 GB) blows its length
        # limit (HTTP 413); one_hot happens in-jit where it fuses away
        @jax.jit
        def step(state, graph, y, tmask, rng):
            def loss_fn(params):
                out = net.apply({"params": params}, graph, train=True,
                                rngs={"dropout": rng})
                from egc_tpu.train.losses import nll_scores
                nll = nll_scores(out, y, log_probs=False)
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
            step = make_step()
            s2, _ = step(state, graph, y, tmask, rng)
            jax.block_until_ready(s2)
            print(f"step compiled t={time.time()-T0:.0f}s", flush=True)
            t0 = time.time()
            for _ in range(5):
                s2, loss = step(s2, graph, y, tmask, rng)
            jax.block_until_ready(s2)
            dt = (time.time() - t0) / 5
            print(f"mag h352 EGC-S full-graph step ({tag}): {dt*1e3:.0f} ms"
                  f" ({e/dt/1e6:.2f} M edges/s) loss={float(loss):.3f}",
                  flush=True)
            if "profile" in sys.argv and tag == "fused":
                import glob
                import json
                import os

                with jax.profiler.trace("/tmp/magtrace"):
                    s2, loss = step(s2, graph, y, tmask, rng)
                    jax.block_until_ready(s2)
                os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = \
                    "python"
                from xprof.convert import raw_to_tool_data as rtd
                xp = sorted(glob.glob("/tmp/magtrace/**/*.xplane.pb",
                                      recursive=True),
                            key=os.path.getmtime)
                data, _ = rtd.xspace_to_tool_data(
                    [xp[-1]], "framework_op_stats", {"tqx": "out:json"})
                tables = json.loads(bytes(data))
                tt = tables[0] if isinstance(tables, list) else \
                    tables["tables"][0]
                dev = [(c[3], float(c[7] or 0.0))
                       for c in ([x.get("v") for x in r["c"]]
                                 for r in tt["rows"]) if c[1] == "Device"]
                dev.sort(key=lambda kv: -kv[1])
                total = sum(v for _, v in dev)
                print(f"total device self-time: {total/1e3:.1f} ms")
                for name, v in dev[:25]:
                    print(f"  {v/1e3:8.1f} ms {100*v/total:5.1f}%  "
                          f"{name[:84]}")
        except Exception as exc:
            print(f"mag h352 step ({tag}): FAILED ({type(exc).__name__}: "
                  f"{str(exc)[:110]})", flush=True)


if __name__ == "__main__":
    main()
