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

Default prints ONE JSON line (the headline row, driver contract).
``--grid`` re-measures every config with a claimed PERFORMANCE.md number
(h128 EGC-M, EGC-S, 6-aggr, h136 wide, GAT h152 H8) and prints one JSON
line per row — the per-round regression net for silent fallbacks (the
round-2 h136 column-split bug class); results are committed as
BENCH_GRID_r{N}.json.

Usage: python bench.py [--small] [--steps N] [--grid]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _floor_fields(dev, kind_model, hidden, heads, bases, aggrs, num_layers,
                  edges_per_s):
    """Speed-of-light / floor models (see PERFORMANCE.md).

    - 8-cy model (round-1, kept for cross-round continuity of vs_baseline)
    - measured loop floor (round-2 microbenchmarks: 10.4 cy fwd / 13 bwd)
    - config-aware access floor (round 3; EGC kinds only): 10.4 cy base +
      0.85 cy per [1,128]-register access per edge.
    """
    kind = dev.device_kind.lower()
    clock_ghz = 0.94 if ("v5 lite" in kind or "v5e" in kind) else 1.05
    hbm_gbps = 819.0 if ("v5 lite" in kind or "v5e" in kind) else \
        1640.0 if "v4" in kind else 2765.0 if "v5p" in kind else 819.0
    passes = 2 * num_layers            # fwd + bwd edge sweep per layer
    sol_edges_per_s = clock_ghz * 1e9 / (8.0 * passes)
    floor_cy = (10.4 + 13.0) / 2.0
    sol_measured = clock_ghz * 1e9 / (floor_cy * passes)
    out = {
        "sol_edges_per_s": round(sol_edges_per_s, 1),
        "vs_baseline": round(edges_per_s / sol_edges_per_s, 4),
        "vs_measured_floor": round(edges_per_s / sol_measured, 4),
        "measured_floor_edges_per_s": round(sol_measured, 1),
    }
    if kind_model == "egc":
        from egc_tpu.ops.dispatch import _plan_prims
        from egc_tpu.ops.segment import canonical_aggr
        bl = bases * (hidden // heads)
        aggrs_canon = tuple(canonical_aggr(a) for a in aggrs)
        prims, nsegs = _plan_prims(aggrs_canon)
        f_regs = max(1, -(-bl // 128))           # value width in registers
        fwd_units = f_regs + len(prims) * f_regs - 1
        needs_v = bool({"sumsq", "max", "min"} & set(prims))
        bwd_units = nsegs * f_regs + needs_v * f_regs + f_regs - 1
        cfg_cy = (10.4 + 0.85 * fwd_units) + (10.4 + 0.85 * bwd_units)
        sol_config = clock_ghz * 1e9 / (cfg_cy * num_layers)
        out["vs_config_floor"] = round(edges_per_s / sol_config, 4)
        out["config_floor_edges_per_s"] = round(sol_config, 1)
        out["bandwidth_sol_edges_per_s"] = round(
            hbm_gbps * 1e9 / (num_layers * bl * 4 * 3), 1)
    return out


def build_data(raw, *, hidden, heads, bases, aggrs):
    """Device dict with the plan geometry the model's width wants."""
    from egc_tpu.exp.fullgraph import full_graph_to_device_dict
    wide_bl = bases * (hidden // heads)
    return full_graph_to_device_dict(
        raw, wide_aggrs=(tuple(aggrs) if wide_bl > 128 else None))


def run_config(d, *, metric, kind, hidden, aggrs=None, heads=4,
               bases=4, steps=10, num_layers=3, remat=False):
    """Measure one full-graph arxiv-shaped training-step config."""
    import jax
    import jax.numpy as jnp
    from egc_tpu.models.nets import ConvSpec, ArxivNet
    from egc_tpu.train.optim import make_optimizer
    from egc_tpu.train.state import TrainState

    dev = jax.devices()[0]
    num_edges = int(np.asarray(d["graph"].edge_mask).sum())
    conv = (ConvSpec(kind="egc", heads=heads, bases=bases,
                     aggrs=tuple(aggrs)) if kind == "egc"
            else ConvSpec(kind=kind, heads=heads))
    net = ArxivNet(conv=conv, hidden_dim=hidden, num_layers=num_layers,
                   dropout=0.0, residual=True, num_features=128,
                   num_classes=40, log_probs=False, remat=remat)
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
        from egc_tpu.train.losses import nll_scores
        nll = nll_scores(out, y, log_probs=False)
        m = tmask.astype(out.dtype)
        return jnp.sum(nll * m) / jnp.sum(m), mutated["batch_stats"]

    @jax.jit
    def step(state, graph, rng):
        (loss, bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, graph,
                                   rng)
        return state.apply_gradients(grads, new_batch_stats=bs), loss

    rng = jax.random.key(1)
    t0 = time.time()
    state, loss = step(state, d["graph"], rng)
    jax.block_until_ready(loss)
    print(f"# [{metric}] compile+first step: {time.time() - t0:.1f}s "
          f"loss={float(loss):.4f}", flush=True)
    state, loss = step(state, d["graph"], rng)
    jax.block_until_ready(loss)

    t0 = time.time()
    for _ in range(steps):
        state, loss = step(state, d["graph"], rng)
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / steps
    edges_per_s = num_edges / dt

    row = {
        "metric": metric,
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "step_time_s": round(dt, 4),
        "num_edges": num_edges,
        "device": dev.device_kind,
    }
    row.update(_floor_fields(dev, kind, hidden, heads, bases, aggrs or (),
                             num_layers, edges_per_s))
    # driver-contract ordering: vs_baseline right after unit
    ordered = {k: row[k] for k in
               ("metric", "value", "unit", "vs_baseline") if k in row}
    ordered.update({k: v for k, v in row.items() if k not in ordered})
    return ordered


GRID = [
    # (metric, kind, hidden, aggrs, heads)
    ("egc_m_arxiv_train_edges_per_s_per_chip", "egc", 128,
     ("symnorm", "max", "mean"), 4),
    ("egc_s_arxiv_train_edges_per_s_per_chip", "egc", 128,
     ("symnorm",), 4),
    ("egc_m6_arxiv_train_edges_per_s_per_chip", "egc", 128,
     ("sum", "mean", "max", "min", "std", "symnorm"), 4),
    ("egc_m_h136_arxiv_train_edges_per_s_per_chip", "egc", 136,
     ("symnorm", "max", "mean"), 4),
    ("gat_h152_arxiv_train_edges_per_s_per_chip", "gat", 152,
     None, 8),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes for a quick smoke run")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize conv blocks (activation memory)")
    ap.add_argument("--aggrs", type=str, default="symnorm,max,mean")
    ap.add_argument("--grid", action="store_true",
                    help="one JSON line per PERFORMANCE.md config")
    args = ap.parse_args()

    import jax
    from egc_tpu.data import synthetic

    if args.small:
        n_nodes, avg_deg = 4096, 8
    else:
        n_nodes, avg_deg = 169_343, 14   # ~2.37M directed edges (arxiv-like)

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}, nodes={n_nodes}", flush=True)
    raw = synthetic.synthetic_full_graph(
        num_nodes=n_nodes, avg_degree=avg_deg, num_classes=40,
        num_features=128, seed=0)

    if args.grid:
        # narrow-plan graph shared by every <=128-lane config (one build,
        # one tunnel transfer); wide configs (h136) build their own
        d_narrow = build_data(raw, hidden=128, heads=4, bases=4, aggrs=())
        for metric, kind, hidden, aggrs, heads in GRID:
            wide = kind == "egc" and 4 * (hidden // heads) > 128
            d = build_data(raw, hidden=hidden, heads=heads, bases=4,
                           aggrs=aggrs) if wide else d_narrow
            row = run_config(d, metric=metric, kind=kind,
                             hidden=hidden, aggrs=aggrs, heads=heads,
                             steps=args.steps)
            print(json.dumps(row), flush=True)
        return

    aggrs = tuple(args.aggrs.split(","))
    d = build_data(raw, hidden=args.hidden, heads=4, bases=4, aggrs=aggrs)
    row = run_config(d, metric="egc_m_arxiv_train_edges_per_s_per_chip",
                     kind="egc", hidden=args.hidden, aggrs=aggrs,
                     steps=args.steps, remat=args.remat)
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
