"""On-chip head-mix kernel parity vs the XLA formulation.

The CPU suite gates the kernel in INTERPRET mode; this probes the
Mosaic-COMPILED kernel (values + both gradients) across every production
shape, including the hetero REGConv mixes (root K=B, relation K=A*B)
whose full-scale grad check regressed on chip (round 5).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    scripts/probe_headmix_parity.py
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

from egc_tpu.ops.pallas.headmix import _head_mix_xla, head_mix_fused

SHAPES = [
    # (H, B, A, L, n, label)
    (8, 4, 1, 44, 8192, "mag h352 symnorm"),
    (4, 4, 3, 32, 8192, "arxiv h128 EGC-M"),
    (4, 4, 3, 34, 8192, "arxiv h136"),
    (8, 4, 1, 21, 8192, "zinc h168 EGC-S"),
    (4, 4, 1, 16, 8192, "hetero ROOT mix h64 (K=B=4)"),
    (4, 8, 1, 16, 8192, "hetero REL mix h64 (K=A*B=8)"),
    (4, 8, 1, 16, 30000, "hetero REL mix, non-multiple rows"),
]


# the production R==0 fallback IS the reference formulation — sharing it
# keeps the probe honest when that code moves (the kernel path under test
# is separate code)
xla_mix = _head_mix_xla


def relerr(a, b):
    return float(jnp.max(jnp.abs(a - b)) / (1e-6 + jnp.max(jnp.abs(b))))


def main():
    bad = 0
    for H, B, A, L, n, label in SHAPES:
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(n, H * B * A)).astype(np.float32))
        ys = tuple(jnp.asarray(
            rng.normal(size=(n, B * L)).astype(np.float32))
            for _ in range(A))
        dz = jnp.asarray(
            rng.normal(size=(n, H * L)).astype(np.float32))

        f_fused = jax.jit(lambda w, ys: head_mix_fused(
            w, ys, H=H, B=B, A=A, L=L))
        f_xla = jax.jit(lambda w, ys: xla_mix(w, ys, H, B, A, L))

        out_f, vjp_f = jax.vjp(f_fused, w, ys)
        out_x, vjp_x = jax.vjp(f_xla, w, ys)
        (dw_f, dys_f), (dw_x, dys_x) = vjp_f(dz), vjp_x(dz)
        errs = [relerr(out_f, out_x), relerr(dw_f, dw_x)] + \
            [relerr(a, b) for a, b in zip(dys_f, dys_x)]
        worst = max(errs)
        status = "ok" if worst < 1e-4 else "FAIL"
        bad += status == "FAIL"
        print(f"{status}  H{H} B{B} A{A} L{L} n{n}  out={errs[0]:.2e} "
              f"dw={errs[1]:.2e} dy={max(errs[2:]):.2e}  [{label}]",
              flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
