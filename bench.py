"""Benchmark: EGC-M fwd+bwd training step throughput (edges/s/chip).

The BASELINE.json headline metric: "edges/s/chip fwd+bwd (EGC-M,
ogbn-arxiv)". Runs the flagship EGC-M ArxivNet (h128 H4 B4,
aggrs symnorm/max/mean — the reference's best arxiv aggregator set at a
lane-aligned width so the fused Pallas path engages) full-graph training
step on an ogbn-arxiv-shaped synthetic graph (169,343 nodes / ~2.37M
directed edges) on one chip, and reports edges/s.

``vs_baseline`` is the fraction of the per-edge loop-floor speed-of-light
(see the model below; the reference publishes no throughput numbers —
BASELINE.json.published is empty — so the floor is the comparison point).

Usage: python bench.py [--small] [--steps N]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes for a quick smoke run")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--aggrs", type=str, default="symnorm,max,mean")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from egc_tpu.data import synthetic
    from egc_tpu.exp.fullgraph import full_graph_to_device_dict
    from egc_tpu.models.nets import ConvSpec, ArxivNet
    from egc_tpu.train.optim import make_optimizer
    from egc_tpu.train.state import TrainState

    if args.small:
        n_nodes, avg_deg = 4096, 8
    else:
        n_nodes, avg_deg = 169_343, 14   # ~2.37M directed edges (arxiv-like)

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}, nodes={n_nodes}", flush=True)

    raw = synthetic.synthetic_full_graph(
        num_nodes=n_nodes, avg_degree=avg_deg, num_classes=40,
        num_features=128, seed=0)
    wide_bl = 4 * (args.hidden // 4)   # bases * (hidden // heads), H=B=4
    d = full_graph_to_device_dict(
        raw, wide_aggrs=(tuple(args.aggrs.split(","))
                         if wide_bl > 128 else None))
    num_edges = int(np.asarray(d["graph"].edge_mask).sum())
    print(f"# edges={num_edges}", flush=True)

    hidden, heads, bases = args.hidden, 4, 4
    num_layers = 3
    conv = ConvSpec(kind="egc", heads=heads, bases=bases,
                    aggrs=tuple(args.aggrs.split(",")))
    net = ArxivNet(conv=conv, hidden_dim=hidden, num_layers=num_layers,
                   dropout=0.0, residual=True, num_features=128,
                   num_classes=40, remat=args.remat)
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.key(0), d["graph"], train=False)
    state = TrainState.create(params=variables["params"],
                              batch_stats=variables.get("batch_stats", {}),
                              tx=make_optimizer(1e-2, 0.0))

    y = d["y"]
    tmask = d["masks"]["train"]

    def loss_fn(params, batch_stats, graph, rng):
        out, mutated = net.apply(
            {"params": params, "batch_stats": batch_stats}, graph,
            train=True, rngs={"dropout": rng}, mutable=["batch_stats"])
        from egc_tpu.train.losses import gather_label_scores
        nll = -gather_label_scores(out, y)
        m = tmask.astype(out.dtype)
        return jnp.sum(nll * m) / jnp.sum(m), mutated["batch_stats"]

    @jax.jit
    def step(state, graph, rng):
        (loss, bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, graph,
                                   rng)
        return state.apply_gradients(grads, new_batch_stats=bs), loss

    rng = jax.random.key(1)
    # warmup / compile
    t0 = time.time()
    state, loss = step(state, d["graph"], rng)
    jax.block_until_ready(loss)
    print(f"# compile+first step: {time.time() - t0:.1f}s loss={float(loss):.4f}",
          flush=True)
    state, loss = step(state, d["graph"], rng)
    jax.block_until_ready(loss)

    t0 = time.time()
    for i in range(args.steps):
        state, loss = step(state, d["graph"], rng)
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / args.steps
    edges_per_s = num_edges / dt

    # Speed-of-light model: random-row gather/scatter over a graph is
    # LOOP-bound on TPU, not bandwidth-bound — each edge needs a dynamic
    # [1, F] VMEM read + accumulate (~8 cycles steady-state in the fused
    # Pallas kernel). Per training step the edge sweep runs once forward
    # and once backward per conv layer. The bandwidth roofline
    # (bytes-per-edge at full HBM speed) is reported alongside for context.
    kind = dev.device_kind.lower()
    clock_ghz = 0.94 if ("v5 lite" in kind or "v5e" in kind) else 1.05
    hbm_gbps = 819.0 if ("v5 lite" in kind or "v5e" in kind) else \
        1640.0 if "v4" in kind else 2765.0 if "v5p" in kind else 819.0
    cycles_per_edge_pass = 8.0
    passes = 2 * num_layers            # fwd + bwd edge sweep per layer
    sol_edges_per_s = clock_ghz * 1e9 / (cycles_per_edge_pass * passes)
    bl = bases * (hidden // heads)
    bw_sol_edges_per_s = hbm_gbps * 1e9 / (num_layers * bl * 4 * 3)
    vs = edges_per_s / sol_edges_per_s
    # measured floor (round 2, scripts/kernel_feas.py): the minimal
    # dynamic-row loop runs at 10.4 cy/edge fwd / ~13 cy/edge bwd on v5e —
    # the 8-cy model above predates those microbenchmarks and is kept as
    # the primary denominator for cross-round continuity.
    floor_cy = (10.4 + 13.0) / 2.0
    sol_measured = clock_ghz * 1e9 / (floor_cy * passes)
    vs_measured = edges_per_s / sol_measured

    # Config-aware access floor (round 3): the sweeps are bound by the
    # 10.4 cy loop base plus ~0.85 cy per [1,128]-register access beyond
    # the first read (anchored on measured sweeps: h128 3-prim fwd
    # 12.8 cy / bwd 14.9; h136 wide fwd 14.3 / bwd 19.8). Accesses per
    # edge: fwd = value read (F/128 regs) + one RMW per primitive;
    # bwd = packed-coeff read (K*F/128) + value read + RMW.
    from egc_tpu.ops.dispatch import _plan_prims
    from egc_tpu.ops.segment import canonical_aggr
    aggrs_canon = tuple(canonical_aggr(a) for a in args.aggrs.split(","))
    prims, nsegs = _plan_prims(aggrs_canon)
    f_regs = max(1, -(-bl // 128))               # value width in registers
    fwd_units = f_regs + len(prims) * f_regs - 1
    needs_v = bool({"sumsq", "max", "min"} & set(prims))
    bwd_units = nsegs * f_regs + needs_v * f_regs + f_regs - 1
    cfg_floor_cy = (10.4 + 0.85 * fwd_units) + (10.4 + 0.85 * bwd_units)
    sol_config = clock_ghz * 1e9 / (cfg_floor_cy * num_layers)
    vs_config = edges_per_s / sol_config

    print(json.dumps({
        "metric": "egc_m_arxiv_train_edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(vs, 4),
        "step_time_s": round(dt, 4),
        "num_edges": num_edges,
        "device": dev.device_kind,
        "sol_edges_per_s": round(sol_edges_per_s, 1),
        "vs_measured_floor": round(vs_measured, 4),
        "measured_floor_edges_per_s": round(sol_measured, 1),
        "vs_config_floor": round(vs_config, 4),
        "config_floor_edges_per_s": round(sol_config, 1),
        "bandwidth_sol_edges_per_s": round(bw_sol_edges_per_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
