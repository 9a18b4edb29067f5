"""Per-op device-time breakdown of a fused EGC arxiv training step.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    scripts/profile_egc_step.py [hidden] [aggrs-csv]

(profile_v2_step.py's attention twin; used for the wide-lane h136 and
6-aggregator floor-gap work, VERDICT r2 item 3.)
"""

import glob
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from egc_tpu.data import synthetic
from egc_tpu.exp.fullgraph import full_graph_to_device_dict
from egc_tpu.models.nets import ConvSpec, ArxivNet
from egc_tpu.train.optim import make_optimizer
from egc_tpu.train.state import TrainState

TRACE_DIR = "/tmp/egctrace"


def main():
    hidden = int(sys.argv[1]) if len(sys.argv) > 1 else 136
    aggrs = tuple((sys.argv[2] if len(sys.argv) > 2
                   else "symnorm,max,mean").split(","))
    raw = synthetic.synthetic_full_graph(
        num_nodes=169_343, avg_degree=14, num_classes=40, num_features=128,
        seed=0)
    d = full_graph_to_device_dict(raw)
    g = d["graph"]
    y, tmask = d["y"], d["masks"]["train"]

    net = ArxivNet(conv=ConvSpec(kind="egc", heads=4, bases=4, aggrs=aggrs),
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
    s2, _ = step(state, rng)
    jax.block_until_ready(s2)
    t0 = time.time()
    for _ in range(5):
        s2, loss = step(state, rng)
    jax.block_until_ready(s2)
    print(f"steady step: {(time.time()-t0)/5:.4f}s  h={hidden} "
          f"aggrs={aggrs}", flush=True)
    with jax.profiler.trace(TRACE_DIR):
        s2, loss = step(state, rng)
        jax.block_until_ready(s2)

    os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
    from xprof.convert import raw_to_tool_data as rtd
    xplanes = sorted(glob.glob(TRACE_DIR + "/**/*.xplane.pb", recursive=True),
                     key=os.path.getmtime)
    data, _ = rtd.xspace_to_tool_data(
        [xplanes[-1]], "framework_op_stats", {"tqx": "out:json"})
    tables = json.loads(bytes(data))
    t0 = tables[0] if isinstance(tables, list) else tables["tables"][0]
    dev = []
    for r in t0["rows"]:
        c = [x.get("v") for x in r["c"]]
        if c[1] == "Device":
            dev.append((c[3], float(c[7] or 0.0)))
    dev.sort(key=lambda kv: -kv[1])
    total = sum(v for _, v in dev)
    print(f"total device self-time: {total/1e3:.1f} ms")
    for name, v in dev[:20]:
        print(f"  {v/1e3:8.1f} ms  {100*v/total:5.1f}%  {name[:90]}")


if __name__ == "__main__":
    main()
