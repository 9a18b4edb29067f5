"""Probe alternative EGC head-mix formulations at full-graph scale.

The profiled mag h352 step spends a large slice of its 146 ms node-level
glue in head_mix + aggregate packing. Hypothesis: the 4D broadcast-reduce
form materializes [n, H, A*B, L] intermediates whose minor dim L (44 at
mag, 32 at arxiv h128) uses a third of each 128-lane register row and
whose A*B sublane dim wastes the 8-row tile.

All variants consume what the model actually produces: per-aggregator
arrays ys = A x [n, F] (the fused kernels' outputs) and flat comb weights
w2d [n, H*B*A]; packing into [n, A, F] is charged to the variant that
needs it. Math: z[n, h*L+l] = sum_{a,b} w2d[n, h*BA+b*A+a] * ys[a][n,b*L+l].

  v0_current  stack -> 4D broadcast-multiply + reduce (egc.head_mix today)
  v4_swapped  stack -> 4D with H in the sublane dim ([n,AB,H,L] inter)
  v5_pallas   block Pallas kernel, custom VJP; consumes ys directly
              (no packing), per-head lane-broadcast FMAs

Timing chains each step through the previous output (w += 1e-30*d) so the
remote runtime cannot content-cache repeated identical executions; y / dz
ride as jit ARGUMENTS (closure constants ship inside the remote-compile
request body and 1 GB breaks the tunnel).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    scripts/probe_headmix.py [mag|arxiv|h136|all] [R]
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from egc_tpu.nn.conv.egc import head_mix


# ---------------------------------------------------------------- variants

def v0_current(w2d, ys, n, H, B, A, L):
    y = jnp.stack(ys, axis=1)                           # [n, A, F] packing
    w = w2d.reshape(n, H, B, A)
    return head_mix(w, y.reshape(n, A, B, L), n, H, B, A, L).reshape(
        n, H * L)


def v4_swapped(w2d, ys, n, H, B, A, L):
    """H in the sublane dim: intermediate [n, A*B, H, L] (a-major ab)."""
    y = jnp.stack(ys, axis=1)                           # [n, A, F]
    w4 = w2d.reshape(n, H, B, A).transpose(0, 3, 2, 1)  # [n, A, B, H]
    w4 = w4.reshape(n, A * B, H, 1)
    y4 = y.reshape(n, A * B, 1, L)
    return jnp.sum(w4 * y4, axis=1).reshape(n, H * L)


def v1_dot(w2d, ys, n, H, B, A, L):
    """Batched tiny matmul: [n,H,BA] @ [n,BA,L] (contracting over b,a)."""
    y = jnp.stack(ys, axis=1)                           # [n, A, F]
    w = w2d.reshape(n, H, B, A).transpose(0, 1, 3, 2).reshape(n, H, A * B)
    y3 = y.reshape(n, A * B, L)
    return jax.lax.dot_general(
        w, y3, (((2,), (1,)), ((0,), (0,)))).reshape(n, H * L)


def v3_bcast(w2d, ys, n, H, B, A, L):
    """Unrolled sum over (a,b) of fused broadcast terms, no 4-D transpose:
    out[n, h*L+l] = sum_ab w[n, h*BA + b*A + a] * ys[a][n, b*L:(b+1)*L].
    Each term is (w col -> [n,H,1] bcast) * (y slice -> [n,1,L] bcast),
    accumulated in [n, H, L] and reshaped once."""
    BA = B * A
    w3 = w2d.reshape(n, H, BA)
    acc = None
    for a in range(A):
        for b in range(B):
            t = (w3[:, :, b * A + a][:, :, None]
                 * ys[a][:, None, b * L:(b + 1) * L])
            acc = t if acc is None else acc + t
    return acc.reshape(n, H * L)


def v9_pad64(w2d, ys, n, H, B, A, L):
    """v3 on 64-lane-aligned slices: pad each y base block L -> Lp=64 and
    compute the padded [n, H, Lp] result, slicing back at the end. All
    lane slices land on 64-aligned offsets."""
    Lp = 64 if L <= 64 else 128
    BA = B * A
    w3 = w2d.reshape(n, H, BA)
    ysp = [jnp.pad(y.reshape(n, B, L), ((0, 0), (0, 0), (0, Lp - L)))
           for y in ys]                                  # [n, B, Lp]
    acc = None
    for a in range(A):
        for b in range(B):
            t = (w3[:, :, b * A + a][:, :, None]
                 * ysp[a][:, None, b])
            acc = t if acc is None else acc + t
    return acc[:, :, :L].reshape(n, H * L)


def make_v5(n, H, B, A, L, R=4096):
    O, F = H * L, B * L
    BA = B * A
    nb = n // R
    assert n % R == 0

    def fwd_kernel(w_ref, *rest):
        y_refs, out_ref = rest[:A], rest[A]
        w = w_ref[...]
        ys = [r[...] for r in y_refs]
        for h in range(H):
            acc = None
            for a in range(A):
                for b in range(B):
                    col = h * BA + b * A + a
                    t = w[:, col:col + 1] * ys[a][:, b * L:(b + 1) * L]
                    acc = t if acc is None else acc + t
            out_ref[:, h * L:(h + 1) * L] = acc

    def bwd_kernel(w_ref, *rest):
        y_refs, dz_ref = rest[:A], rest[A]
        dw_ref, dy_refs = rest[A + 1], rest[A + 2:]
        w = w_ref[...]
        dz = dz_ref[...]
        ys = [r[...] for r in y_refs]
        for a in range(A):
            parts = []
            for b in range(B):
                accb = None
                for h in range(H):
                    col = h * BA + b * A + a
                    t = w[:, col:col + 1] * dz[:, h * L:(h + 1) * L]
                    accb = t if accb is None else accb + t
                parts.append(accb)
            dy_refs[a][...] = jnp.concatenate(parts, axis=1)
        # dw columns as 1D sums (keepdims [R,1] values pad to 128 lanes
        # each — 32 of them blow the 16M scoped-vmem stack), stacked once
        cols = []
        for h in range(H):
            dzh = dz[:, h * L:(h + 1) * L]
            for b in range(B):
                for a in range(A):
                    cols.append(jnp.sum(
                        dzh * ys[a][:, b * L:(b + 1) * L], axis=1))
        dw_ref[...] = jnp.stack(cols, axis=1)

    row_spec = lambda width: pl.BlockSpec((R, width), lambda i: (i, 0))

    def run_fwd(w2d, ys):
        return pl.pallas_call(
            fwd_kernel,
            grid=(nb,),
            in_specs=[row_spec(H * BA)] + [row_spec(F)] * A,
            out_specs=row_spec(O),
            out_shape=jax.ShapeDtypeStruct((n, O), jnp.float32),
        )(w2d, *ys)

    Rb = min(R, 512)                      # bwd holds more live blocks
    nbb = n // Rb
    row_spec_b = lambda width: pl.BlockSpec((Rb, width), lambda i: (i, 0))

    def run_bwd(w2d, ys, dz):
        return pl.pallas_call(
            bwd_kernel,
            grid=(nbb,),
            in_specs=[row_spec_b(H * BA)] + [row_spec_b(F)] * A +
                     [row_spec_b(O)],
            out_specs=[row_spec_b(H * BA)] + [row_spec_b(F)] * A,
            out_shape=[jax.ShapeDtypeStruct((n, H * BA), jnp.float32)] +
                      [jax.ShapeDtypeStruct((n, F), jnp.float32)] * A,
        )(w2d, *ys, dz)

    @jax.custom_vjp
    def f(w2d, ys):
        return run_fwd(w2d, ys)

    def fwd_rule(w2d, ys):
        return run_fwd(w2d, ys), (w2d, ys)

    def bwd_rule(res, dz):
        w2d, ys = res
        outs = run_bwd(w2d, ys, dz)
        return outs[0], tuple(outs[1:])

    f.defvjp(fwd_rule, bwd_rule)
    return f


def make_v6(n, H, B, A, L, R=1024):
    """Transposed-layout Pallas kernel: per-block, transpose y/w/dz so the
    per-(h,b,a) slices land on SUBLANE boundaries (rows, 8-aligned via
    Lp = round_up(L, 8)) instead of non-128-aligned lane offsets, and the
    per-term w broadcast is a sublane broadcast. Hypothesis: v5's cost is
    lane-rotate relayouts on every 44-lane slice; rows are free."""
    O, F = H * L, B * L
    BA = B * A
    Lp = ((L + 7) // 8) * 8
    nb = n // R
    assert n % R == 0

    def col(h, b, a):
        return h * BA + b * A + a

    def yt_slabs(y):
        """[R, F] -> [B*Lp, R] with per-base row slabs."""
        if Lp == L:
            return jnp.swapaxes(y, 0, 1)
        slabs = [jnp.pad(y[:, b * L:(b + 1) * L], ((0, 0), (0, Lp - L)))
                 for b in range(B)]
        return jnp.swapaxes(jnp.concatenate(slabs, axis=1), 0, 1)

    def fwd_kernel(w_ref, *rest):
        y_refs, out_ref = rest[:A], rest[A]
        wT = jnp.swapaxes(w_ref[...], 0, 1)          # [HBA, R]
        yTs = [yt_slabs(r[...]) for r in y_refs]     # A x [B*Lp, R]
        outs = []
        for h in range(H):
            acc = None
            for b in range(B):
                for a in range(A):
                    t = (wT[col(h, b, a):col(h, b, a) + 1, :]
                         * yTs[a][b * Lp:b * Lp + L, :])
                    acc = t if acc is None else acc + t
            outs.append(acc)                          # [L, R]
        zT = jnp.concatenate(outs, axis=0)            # [O, R]
        out_ref[...] = jnp.swapaxes(zT, 0, 1)

    def bwd_kernel(w_ref, *rest):
        y_refs, dz_ref = rest[:A], rest[A]
        dw_ref, dy_refs = rest[A + 1], rest[A + 2:]
        wT = jnp.swapaxes(w_ref[...], 0, 1)
        yTs = [yt_slabs(r[...]) for r in y_refs]
        dz = dz_ref[...]                              # [R, O]
        dzT = jnp.swapaxes(dz, 0, 1)                  # [O, R] (h-major rows)
        # dy[a][:, b*L+l] = sum_h w[:, col] * dz[:, h*L+l]
        for a in range(A):
            slabs = []
            for b in range(B):
                acc = None
                for h in range(H):
                    t = (wT[col(h, b, a):col(h, b, a) + 1, :]
                         * dzT[h * L:(h + 1) * L, :])
                    acc = t if acc is None else acc + t
                slabs.append(acc)                     # [L, R]
            dyT = jnp.concatenate(slabs, axis=0)      # [F, R]
            dy_refs[a][...] = jnp.swapaxes(dyT, 0, 1)
        # dw[:, col] = sum_l dz[:, h*L+l] * y[a][:, b*L+l]
        cols = []
        for h in range(H):
            for b in range(B):
                for a in range(A):
                    prod = (dzT[h * L:(h + 1) * L, :]
                            * yTs[a][b * Lp:b * Lp + L, :])
                    cols.append(jnp.sum(prod, axis=0, keepdims=True))
        dwT = jnp.concatenate(cols, axis=0)           # [HBA, R]
        dw_ref[...] = jnp.swapaxes(dwT, 0, 1)

    row_spec = lambda width: pl.BlockSpec((R, width), lambda i: (i, 0))

    def run_fwd(w2d, ys):
        return pl.pallas_call(
            fwd_kernel,
            grid=(nb,),
            in_specs=[row_spec(H * BA)] + [row_spec(F)] * A,
            out_specs=row_spec(O),
            out_shape=jax.ShapeDtypeStruct((n, O), jnp.float32),
        )(w2d, *ys)

    def run_bwd(w2d, ys, dz):
        return pl.pallas_call(
            bwd_kernel,
            grid=(nb,),
            in_specs=[row_spec(H * BA)] + [row_spec(F)] * A +
                     [row_spec(O)],
            out_specs=[row_spec(H * BA)] + [row_spec(F)] * A,
            out_shape=[jax.ShapeDtypeStruct((n, H * BA), jnp.float32)] +
                      [jax.ShapeDtypeStruct((n, F), jnp.float32)] * A,
        )(w2d, *ys, dz)

    @jax.custom_vjp
    def f(w2d, ys):
        return run_fwd(w2d, ys)

    def fwd_rule(w2d, ys):
        return run_fwd(w2d, ys), (w2d, ys)

    def bwd_rule(res, dz):
        w2d, ys = res
        outs = run_bwd(w2d, ys, dz)
        return outs[0], tuple(outs[1:])

    f.defvjp(fwd_rule, bwd_rule)
    return f


CASES = {
    # name: (n, H, B, A, L)  — n matches the padded plan row counts
    "mag": (737_280, 8, 4, 1, 44),
    "arxiv": (172_032, 4, 4, 3, 32),
    "h136": (172_032, 4, 4, 3, 34),
}


def time_chained(step, w0, steps=20):
    """step(w) -> w' with a real data dependency; returns s/step."""
    w = step(w0)
    jax.block_until_ready(w)
    t0 = time.time()
    for _ in range(steps):
        w = step(w)
    jax.block_until_ready(w)
    return (time.time() - t0) / steps


def run_case(name, R=4096):
    n, H, B, A, L = CASES[name]
    O, F = H * L, B * L
    key = jax.random.key(0)
    kw, ky, kz = jax.random.split(key, 3)
    w2d = jax.random.normal(kw, (n, H * B * A), jnp.float32)
    ys = tuple(jax.random.normal(jax.random.fold_in(ky, a), (n, F),
                                 jnp.float32) for a in range(A))
    dz = jax.random.normal(kz, (n, O), jnp.float32)

    variants = {
        "v0_current": functools.partial(v0_current, n=n, H=H, B=B, A=A, L=L),
        "v4_swapped": functools.partial(v4_swapped, n=n, H=H, B=B, A=A, L=L),
        "v1_dot": functools.partial(v1_dot, n=n, H=H, B=B, A=A, L=L),
        "v3_bcast": functools.partial(v3_bcast, n=n, H=H, B=B, A=A, L=L),
        "v9_pad64": functools.partial(v9_pad64, n=n, H=H, B=B, A=A, L=L),
        "v5_pallas": make_v5(n, H, B, A, L, R=R),
        "v6_pallas_t": make_v6(n, H, B, A, L, R=R),
    }

    print(f"\n== {name}: n={n} H={H} B={B} A={A} L={L} (O={O}, F={F}, "
          f"R={R}) ==", flush=True)

    @jax.jit
    def null_step(w):
        return w + 1e-30 * w
    t_null = time_chained(null_step, w2d)
    print(f"  (chain overhead: {t_null*1e3:.2f} ms)", flush=True)

    checks = None
    for vname, fn in variants.items():
        try:
            @jax.jit
            def proj(w2d_, ys_, dz_, fn=fn):
                z, vjp = jax.vjp(fn, w2d_, ys_)
                dw, dys = vjp(dz_)
                return (jnp.vdot(z, dz_), jnp.vdot(dw, w2d_),
                        sum(jnp.vdot(d, y) for d, y in zip(dys, ys_)))
            got = [float(v) for v in proj(w2d, ys, dz)]
            if checks is None:
                checks = got
            else:
                # MXU variants (v1_dot) run bf16-input matmuls under the
                # default precision — allow 3e-2 relative there
                tol = 3e-2 if "dot" in vname else 1e-4
                for g, r, tag in zip(got, checks, ("z", "dw", "dy")):
                    err = abs(g - r) / (abs(r) + 1e-30)
                    assert err < tol, \
                        f"{vname} {tag} mismatch {err} ({g} vs {r})"

            # Consume EVERY output element via vdot: a column-slice
            # consumer lets XLA dead-code-eliminate unused out columns for
            # column-independent variants (measured: h136 v3 fwd "-0.2 ms").
            # The scalar reduce can fuse away the out WRITE, but that cost
            # is identical across variants.
            @jax.jit
            def fwd_step(w, ys_, dz_, fn=fn):
                z = fn(w, ys_)
                return w + 1e-30 * jnp.vdot(z, dz_)

            @jax.jit
            def fb_step(w, ys_, dz_, fn=fn):
                z, vjp = jax.vjp(fn, w, ys_)
                dw, dys = vjp(dz_)
                out = w + 1e-30 * jnp.vdot(z, dz_) + 1e-30 * dw
                for d, y in zip(dys, ys_):
                    out = out + 1e-30 * jnp.vdot(d, y)
                return out

            t_f = time_chained(lambda w: fwd_step(w, ys, dz), w2d) - t_null
            t_fb = time_chained(lambda w: fb_step(w, ys, dz), w2d) - t_null
            print(f"  {vname:11s} fwd {t_f*1e3:7.2f} ms   fwd+bwd "
                  f"{t_fb*1e3:7.2f} ms", flush=True)
        except Exception as exc:
            print(f"  {vname:11s} FAILED ({type(exc).__name__}: "
                  f"{str(exc)[:90]})", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    names = CASES.keys() if which == "all" else [which]
    for name in names:
        run_case(name, R=R)


if __name__ == "__main__":
    main()
