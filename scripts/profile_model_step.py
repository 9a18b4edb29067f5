"""Per-op device-time breakdown of any arxiv-scale model's training step.

Generalizes profile_egc_step.py to the whole model zoo (the per-surface
benches measure step time; this attributes it per op).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    scripts/profile_model_step.py <kind> [hidden] [aggrs-csv]
e.g. profile_model_step.py pna 76 / profile_model_step.py egc 128 symnorm,max,mean
"""

import glob
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from egc_tpu.data import synthetic
from egc_tpu.exp.fullgraph import full_graph_to_device_dict
from egc_tpu.models.nets import ConvSpec, ArxivNet
from egc_tpu.train.optim import make_optimizer
from egc_tpu.train.state import TrainState

TRACE_DIR = "/tmp/modeltrace"


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "pna"
    hidden = int(sys.argv[2]) if len(sys.argv) > 2 else 76
    aggrs = tuple((sys.argv[3] if len(sys.argv) > 3
                   else "symnorm,max,mean").split(","))
    raw = synthetic.synthetic_full_graph(
        num_nodes=169_343, avg_degree=14, num_classes=40, num_features=128,
        seed=0)
    d = full_graph_to_device_dict(raw)
    g = d["graph"]
    y, tmask = d["y"], d["masks"]["train"]

    kw = {}
    if kind == "egc":
        kw = dict(heads=4, bases=4, aggrs=aggrs)
    elif kind == "pna":
        deg = np.zeros(raw["x"].shape[0], np.int64)
        np.add.at(deg, np.asarray(raw["receivers"]), 1)
        kw = dict(avg_log_deg=float(np.log(deg + 1).mean()))
    net = ArxivNet(conv=ConvSpec(kind=kind, **kw),
                   hidden_dim=hidden, num_layers=3, dropout=0.0,
                   residual=True, num_features=128, num_classes=40)
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.key(0), g, train=False)
    state = TrainState.create(params=variables["params"],
                              batch_stats=variables.get("batch_stats", {}),
                              tx=make_optimizer(1e-2, 0.0))
    y1h = jax.nn.one_hot(y, 40)

    def loss_fn(params, bs, rng):
        out, mutated = net.apply(
            {"params": params, "batch_stats": bs}, g,
            train=True, rngs={"dropout": rng}, mutable=["batch_stats"])
        nll = -jnp.sum(out * y1h, axis=1)
        m = tmask.astype(out.dtype)
        return jnp.sum(nll * m) / jnp.sum(m), mutated["batch_stats"]

    @jax.jit
    def step(state, rng):
        (loss, bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, rng)
        return state.apply_gradients(grads, new_batch_stats=bs), loss

    rng = jax.random.key(1)
    state, _ = step(state, rng)
    jax.block_until_ready(state)
    t0 = time.time()
    for _ in range(5):
        state, loss = step(state, rng)
    jax.block_until_ready(state)
    print(f"steady step: {(time.time()-t0)/5:.4f}s  kind={kind} h={hidden}",
          flush=True)

    with jax.profiler.trace(TRACE_DIR):
        state, loss = step(state, rng)
        jax.block_until_ready(state)

    os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
    from xprof.convert import raw_to_tool_data as rtd
    xp = sorted(glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True),
                key=os.path.getmtime)
    data, _ = rtd.xspace_to_tool_data(
        [xp[-1]], "framework_op_stats", {"tqx": "out:json"})
    tables = json.loads(bytes(data))
    tt = tables[0] if isinstance(tables, list) else tables["tables"][0]
    dev = [(c[3], float(c[7] or 0.0))
           for c in ([x.get("v") for x in r["c"]] for r in tt["rows"])
           if c[1] == "Device"]
    dev.sort(key=lambda kv: -kv[1])
    total = sum(v for _, v in dev)
    print(f"total device self-time: {total/1e3:.1f} ms")
    for name, v in dev[:30]:
        print(f"  {v/1e3:8.1f} ms {100*v/total:5.1f}%  {name[:90]}")


if __name__ == "__main__":
    main()
