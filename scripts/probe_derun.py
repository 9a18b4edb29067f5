"""Probe: de-interleave same-receiver runs within window-plan cells.

probe_cluster_runs.py showed consecutive same-receiver edges SERIALIZE
the accumulator read-modify-write chain (clustering that doubled run
length made the sweep slower). The production plan sorts edges by
receiver within each cell (CSR habit), leaving mean run length ~1.18 at
arxiv sparsity — i.e. ~15% of edges immediately follow an edge with the
same receiver. This probe reorders edges within each cell by
(occurrence-within-receiver, receiver), which spreads every receiver's
edges as far apart as possible (run length exactly 1.0), and measures
the production fwd/bwd sweeps on both orders.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    scripts/probe_derun.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from egc_tpu.data import synthetic
from egc_tpu.ops.pallas.gather_reduce import (
    make_window_plan_np, windowed_gather_reduce, windowed_gather_reduce_bwd,
)

OPS = ("wsum", "sum", "max")
SEGS = ("c_sum", "c_wsum", "mx", "c_max")
F = 128


def timeit(fn, *args, steps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / steps


def derun(plan):
    """Reorder edges within each cell: (occurrence index within the
    cell's receiver group, receiver) — maximal spacing of repeats."""
    s = plan["senders"].astype(np.int64)
    r = plan["receivers"].astype(np.int64)
    cp = plan["cell_ptr"].astype(np.int64)
    e = len(s)
    cell = np.repeat(np.arange(len(cp) - 1), np.diff(cp))
    # occurrence index within (cell, receiver): edges are receiver-sorted
    # within cells, so group starts are where (cell, receiver) changes
    key_cr = cell * (r.max() + 1) + r
    new_group = np.ones(e, bool)
    new_group[1:] = key_cr[1:] != key_cr[:-1]
    gid = np.cumsum(new_group) - 1
    first = np.flatnonzero(new_group)
    occ = np.arange(e) - first[gid]
    order = np.lexsort((r, occ, cell))
    out = dict(plan)
    out["senders"] = plan["senders"][order]
    out["receivers"] = plan["receivers"][order]
    out["perm"] = plan["perm"][order]
    return out


def run_stats(plan, tag):
    r = plan["receivers"]
    runs = 1 + int(np.sum(r[1:] != r[:-1]))
    print(f"{tag}: mean run length {len(r)/runs:.3f}", flush=True)


def bench_fwd(plan, vals, ew_full, tag):
    e = len(plan["senders"])
    sen = jnp.asarray(plan["senders"])
    rec = jnp.asarray(plan["receivers"])
    cpx = jnp.asarray(plan["cell_ptr"])
    ew = jnp.asarray(ew_full[plan["perm"]])

    @jax.jit
    def fwd(v, w):
        return windowed_gather_reduce(
            v, sen, rec, cpx,
            r_blocks=plan["R"], s_blocks=plan["S"],
            block_rows=plan["block_rows"], window_rows=plan["window_rows"],
            ops=OPS, edge_w=w)

    o = fwd(vals, ew)
    t = timeit(fwd, vals, ew)
    print(f"{tag} fwd: {t*1e3:7.1f} ms ({t/e*0.94e9:5.1f} cy/edge)",
          flush=True)
    return o


def bench_bwd(plan, coeff, vb, ew_full, tag):
    e = len(plan["senders"])
    sen = jnp.asarray(plan["senders"])
    rec = jnp.asarray(plan["receivers"])
    cpx = jnp.asarray(plan["cell_ptr"])
    ew = jnp.asarray(ew_full[plan["perm"]])

    @jax.jit
    def bwd(cf, v, w):
        return windowed_gather_reduce_bwd(
            cf, v, sen, rec, cpx, segs=SEGS,
            r_blocks=plan["R"], s_blocks=plan["S"],
            block_rows=plan["block_rows"], window_rows=plan["window_rows"],
            edge_w=w)

    g = bwd(coeff, vb, ew)
    t = timeit(bwd, coeff, vb, ew)
    print(f"{tag} bwd: {t*1e3:7.1f} ms ({t/e*0.94e9:5.1f} cy/edge)",
          flush=True)
    return g


def main():
    raw = synthetic.synthetic_full_graph(
        num_nodes=169_343, avg_degree=14, num_classes=40, num_features=128,
        seed=0)
    senders = np.asarray(raw["senders"])
    receivers = np.asarray(raw["receivers"])
    n = 169_343
    rng = np.random.default_rng(0)
    ew_full = rng.normal(size=len(senders)).astype(np.float32)

    # fwd-geometry plan (2048 blocks x 4096 windows)
    pf = make_window_plan_np(senders, receivers, n)
    pf2 = derun(pf)
    run_stats(pf, "fwd  orig ")
    run_stats(pf2, "fwd  derun")
    vals = jnp.asarray(rng.normal(
        size=(pf["S"] * pf["window_rows"], F)).astype(np.float32))
    o1 = bench_fwd(pf, vals, ew_full, "orig ")
    o2 = bench_fwd(pf2, vals, ew_full, "derun")
    for a, b in zip(o1, o2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    # bwd: transpose plan at the production dual geometry (4096 blocks x
    # 2048-row coeff windows, <=4 segs)
    pb = make_window_plan_np(receivers, senders, n,
                             block_rows=4096, window_rows=2048)
    pb2 = derun(pb)
    run_stats(pb, "bwd  orig ")
    run_stats(pb2, "bwd  derun")
    coeff = jnp.asarray(rng.normal(
        size=(pb["S"] * pb["window_rows"], len(SEGS) * F))
        .astype(np.float32))
    vb = jnp.asarray(rng.normal(
        size=(pb["R"] * pb["block_rows"], F)).astype(np.float32))
    g1 = bench_bwd(pb, coeff, vb, ew_full, "orig ")
    g2 = bench_bwd(pb2, coeff, vb, ew_full, "derun")
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)
    print("parity ok (orders agree to fp tolerance)", flush=True)


if __name__ == "__main__":
    main()
