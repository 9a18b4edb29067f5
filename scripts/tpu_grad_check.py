"""TPU gradient sanity check against float64 ground truth.

The CPU-forced CI suite cannot catch XLA:TPU-specific miscompilations.
Two were found on real hardware (round 2) in the std-aggregator backward:

1. XLA:TPU rematerializes ``var = E[x^2] - E[x]^2`` per fusion with
   different FMA contraction; at var ~ 0 the copies can round to opposite
   signs, the relu' gate of one autodiff branch closes while its
   cancelling partner stays open, and the unopposed ~1/sqrt(eps) branch
   inflates gradients ~3000x (fixed: stable custom VJP,
   ``egc_tpu/ops/segment.py::_make_varstd_edges``).
2. Two gathers sharing one index vector inside that custom backward get
   mis-merged by XLA:TPU fusion — the ``(x - m)`` operand read the coeff
   buffer, squaring the amplification (fixed: pack both operands and
   gather ONCE).

Run on the real chip after touching segment/dispatch/kernel code:

    env PYTHONPATH=/root/repo:/root/.axon_site python -u \
        scripts/tpu_grad_check.py

Computes float64 truth with numpy on host, then checks the XLA path and
the fused kernel path (value + grad) on whatever backend jax selects.
Exits nonzero on failure.
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

from egc_tpu.data.loaders import GraphLoader, padding_budget
from egc_tpu.data import synthetic
from egc_tpu.ops import dispatch as dsp
from egc_tpu.ops.segment import multi_aggregate

AGGRS = ("sum", "mean", "max", "min", "var", "std")
TOL = 0.5          # absolute; covers legitimate relu-gate subgradient
                   # flips at var ~ 0 (bounded ~ |x-m|/sqrt(eps))


def f64_truth(xs, send, recv, em, n, aggrs, proj, nm):
    """Gradient of sum(multi_aggregate * proj * node_mask) in float64."""
    xs = xs.astype(np.float64)
    proj = proj.astype(np.float64)
    cnt = np.zeros(n)
    np.add.at(cnt, recv[em], 1.0)
    denom = np.maximum(cnt, 1.0)[:, None]
    s = np.zeros((n, xs.shape[1]))
    sq = np.zeros((n, xs.shape[1]))
    np.add.at(s, recv[em], xs[send[em]])
    np.add.at(sq, recv[em], xs[send[em]] ** 2)
    m = s / denom
    msq = sq / denom
    var = msq - m * m
    std = np.sqrt(np.maximum(var, 0) + 1e-5)

    grad = np.zeros_like(xs)
    for k, a in enumerate(aggrs):
        ct = proj[:, k] * nm[:, None]
        if a == "sum":
            ge = ct[recv[em]]
        elif a == "mean":
            ge = (ct / denom)[recv[em]]
        elif a in ("max", "min"):
            agg = np.full((n, xs.shape[1]),
                          -np.inf if a == "max" else np.inf)
            ufn = np.maximum if a == "max" else np.minimum
            ufn.at(agg, recv[em], xs[send[em]])
            # ties: XLA splits the cotangent equally among argmax entries
            is_arg = (xs[send[em]] == agg[recv[em]])
            nt = np.zeros((n, xs.shape[1]))
            np.add.at(nt, recv[em], is_arg.astype(np.float64))
            ge = ct[recv[em]] * is_arg / np.maximum(nt[recv[em]], 1.0)
        elif a in ("var", "std"):
            dvar = ct.copy()
            if a == "std":
                dvar *= (var > 0) * 0.5 / std
            ge = (2.0 * dvar / denom)[recv[em]] * \
                (xs[send[em]] - m[recv[em]])
        np.add.at(grad, send[em], ge)
    return grad


def main():
    splits = synthetic.synthetic_zinc(num_graphs=200)
    graphs = splits["train"]
    budget = padding_budget(graphs, 64, node_multiple=GraphLoader.PLAN_BLOCK)
    loader = GraphLoader(graphs, 64, shuffle=False, budget=budget,
                         kernel_plans=True)
    g, _y = next(iter(loader))
    n = g.num_nodes
    nm = np.asarray(g.node_mask)
    send = np.asarray(g.senders)
    recv = np.asarray(g.receivers)
    em = np.asarray(g.edge_mask)

    rng = np.random.default_rng(0)
    xs = rng.normal(size=(n, 128)).astype(np.float32)
    proj = np.random.default_rng(1).normal(
        size=(n, len(AGGRS), 128)).astype(np.float32)

    truth = f64_truth(xs, send, recv, em, n, AGGRS, proj, nm)

    gj = jax.tree.map(jnp.asarray, g)
    x = jnp.asarray(xs)
    pj = jnp.asarray(proj)
    nmf = jnp.asarray(nm.astype(np.float32))

    failed = False
    for name, fn in (
        ("xla  ", lambda v: multi_aggregate(
            v, gj.senders, gj.receivers, AGGRS, edge_mask=gj.edge_mask,
            indices_are_sorted=True)),
        ("fused", lambda v: dsp.conv_aggregate(gj, v, AGGRS)),
    ):
        loss = lambda v, f=fn: jnp.sum(f(v) * pj * nmf[:, None, None])
        grad = np.asarray(jax.jit(jax.grad(loss))(x))
        err = np.abs(grad - truth).max()
        ok = err < TOL and np.isfinite(grad).all()
        failed |= not ok
        print(f"{name} grad max err vs float64: {err:.4f} "
              f"({'ok' if ok else 'FAIL'})", flush=True)
    print("backend:", jax.default_backend())
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
