"""6-aggregator backward: packed single sweep vs split passes (r4 item 5).

The 6-aggr config (sum, mean, max, min, std, symnorm -> 7 coeff fields)
sits at 0.78 of its own access wall; the stated cost is the 7x128-lane
packed-coeff row each edge gathers, which also forces the NARROW 512-row
window layout (wide 2048-row windows at K=7 exceed VMEM). This probes the
one alternative with a plausible upside: SPLITTING the backward into two
sweeps with 3/4 fields each — both halves then fit the wide window
layout (4x fewer, fatter cells), at the cost of paying the ~10.4 cy/edge
loop base twice. The access-floor model predicts the split loses
(2 x (10.4 + ~3.4) vs 10.4 + 6.8 cy/edge); this measures it.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    scripts/probe_bwd_split.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from egc_tpu.data import synthetic
from egc_tpu.ops.dispatch import build_kernel_plan
from egc_tpu.ops.pallas.gather_reduce import windowed_gather_reduce_bwd

SEGS7 = ("c_sum", "c_wsum", "c_sumsq2", "mx", "c_max", "mn", "c_min")
SPLIT = (("c_sum", "c_wsum", "c_sumsq2"), ("mx", "c_max", "mn", "c_min"))


def timeit(fn, *args, steps=10):
    # args as ARGUMENTS, never closure constants: a closed-over coeff
    # array ships inside the remote-compile request (CLAUDE.md tunnel
    # caveat 2) and stalls the upload for 25+ min at this size
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / steps


def run_bwd(bw, coeff, vals, segs, ew):
    return windowed_gather_reduce_bwd(
        coeff, vals, bw.senders, bw.receivers, bw.cell_ptr,
        segs=segs, r_blocks=bw.r_blocks, s_blocks=bw.s_blocks,
        block_rows=bw.block_rows, window_rows=bw.window_rows,
        edge_w=ew if "c_wsum" in segs else None)


def main():
    f = 128
    raw = synthetic.synthetic_full_graph(
        num_nodes=169_343, avg_degree=14, num_classes=40,
        num_features=f, seed=0)
    n = raw["x"].shape[0]
    plan = build_kernel_plan(raw["senders"], raw["receivers"], n,
                             attention=False)
    e = len(raw["senders"])
    rng = np.random.default_rng(0)

    for name, bw in (("narrow", plan.bwd_narrow), ("wide", plan.bwd)):
        if bw is None:
            print(f"{name}: no layout in plan")
            continue
        n_win = bw.s_blocks * bw.window_rows
        n_blk = bw.r_blocks * bw.block_rows
        vals = jnp.asarray(rng.normal(size=(n_blk, f)).astype(np.float32))
        ew = jnp.asarray(rng.random(bw.senders.shape[0]).astype(np.float32))
        coeff7 = jnp.asarray(
            rng.normal(size=(n_win, 7 * f)).astype(np.float32))

        try:
            single = jax.jit(lambda c, v, w: run_bwd(bw, c, v, SEGS7, w))
            t_single = timeit(single, coeff7, vals, ew)
            print(f"{name:6s} single 7-seg sweep: {t_single*1e3:7.1f} ms "
                  f"({t_single*0.94e9/e:.1f} cy/edge)", flush=True)
        except Exception as exc:
            print(f"{name:6s} single 7-seg sweep: FAILED "
                  f"({type(exc).__name__}: {str(exc)[:100]})", flush=True)

        try:
            def split_fn(cA, cB, v, w):
                a = run_bwd(bw, cA, v, SPLIT[0], w)
                b = run_bwd(bw, cB, v, SPLIT[1], w)
                return a + b

            t_split = timeit(jax.jit(split_fn), coeff7[:, :3 * f],
                             coeff7[:, 3 * f:], vals, ew)
            print(f"{name:6s} split 3+4 sweeps:   {t_split*1e3:7.1f} ms "
                  f"({t_split*0.94e9/e:.1f} cy/edge)", flush=True)
        except Exception as exc:
            print(f"{name:6s} split 3+4 sweeps:   FAILED "
                  f"({type(exc).__name__}: {str(exc)[:100]})", flush=True)


if __name__ == "__main__":
    main()
