"""Partition quality + analytic scaling report.

Real multi-chip hardware is unavailable in this environment (single v5e
behind a tunnel), so the BASELINE scaling target (>=80% edges/s efficiency
1 -> N) is tracked analytically: partition the benchmark graph for several
device counts and report edge balance, halo (communication) volume, and the
modeled efficiency  compute/(compute + comm)  with measured per-edge compute
cost and ICI bandwidth.

    python scripts/partition_report.py [--nodes 169343] [--avg-deg 14]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from egc_tpu.data import synthetic  # noqa: E402
from egc_tpu.parallel.partition import partition_graph  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=169_343)
    ap.add_argument("--avg-deg", type=int, default=14)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--edges-per-s", type=float, default=7.5e6,
                    help="measured single-chip edges/s (bench.py)")
    ap.add_argument("--ici-gbps", type=float, default=186.0,
                    help="per-link ICI bandwidth (v5e ~186GB/s/direction)")
    args = ap.parse_args()

    raw = synthetic.synthetic_full_graph(
        num_nodes=args.nodes, avg_degree=args.avg_deg, num_classes=40,
        num_features=args.hidden, seed=0)
    e = len(raw["senders"])
    print(f"# graph: {args.nodes} nodes, {e} edges")
    rows = []
    for parts in (2, 4, 8):
        plan = partition_graph(raw["senders"], raw["receivers"],
                               args.nodes, parts, method="bfs")
        edge_counts = plan.edge_mask.sum(axis=1)
        halo_counts = plan.send_mask.sum(axis=(1, 2))
        balance = float(edge_counts.max() / max(edge_counts.mean(), 1))
        cut_frac = float(halo_counts.sum()) / e
        # per step: fwd+bwd halo exchange per layer of [halo, hidden] f32
        comm_bytes = float(halo_counts.max()) * args.hidden * 4 * 2 * \
            args.layers
        comm_s = comm_bytes / (args.ici_gbps * 1e9)
        compute_s = float(edge_counts.max()) / args.edges_per_s
        eff = compute_s / (compute_s + comm_s) / balance
        rows.append({
            "parts": parts,
            "edge_balance(max/mean)": round(balance, 3),
            "halo_nodes_frac": round(cut_frac, 3),
            "comm_ms_per_step": round(comm_s * 1e3, 2),
            "compute_ms_per_step": round(compute_s * 1e3, 2),
            "modeled_scaling_efficiency": round(eff, 3),
        })
        print(json.dumps(rows[-1]))
    return rows


if __name__ == "__main__":
    main()
