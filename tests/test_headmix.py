"""Fused head-mix kernel parity (interpret mode on CPU).

Gates: ops/pallas/headmix.head_mix_fused must match the XLA broadcast-
reduce head mix (egc.head_mix) for values AND gradients across the
reference's tuned shapes, and the EGC layer must produce identical outputs
whichever head-mix path the dispatch gate picks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import jax.experimental.pallas as pl
import egc_tpu.ops.pallas.headmix as hm
from egc_tpu.nn.conv.egc import head_mix


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(hm.pl, "pallas_call", patched)


def xla_head_mix(w2d, ys, n, H, B, A, L):
    y = jnp.stack(ys, axis=1).reshape(n, A, B, L)
    w = w2d.reshape(n, H, B, A)
    return head_mix(w, y, n, H, B, A, L).reshape(n, H * L)


@pytest.mark.parametrize("H,B,A,L", [
    (8, 4, 1, 44),     # mag h352 symnorm
    (4, 4, 3, 32),     # arxiv h128 EGC-M
    (4, 4, 3, 34),     # arxiv h136 (reference tuned width)
    (8, 4, 1, 21),     # zinc-like EGC-S h168
    (2, 3, 2, 5),      # odd small shape
])
def test_headmix_kernel_matches_xla(H, B, A, L):
    n = 100                                # exercises row padding
    rng = np.random.default_rng(0)
    w2d = jnp.asarray(rng.normal(size=(n, H * B * A)).astype(np.float32))
    ys = tuple(jnp.asarray(rng.normal(size=(n, B * L)).astype(np.float32))
               for _ in range(A))
    dz = jnp.asarray(rng.normal(size=(n, H * L)).astype(np.float32))

    ref, vjp_ref = jax.vjp(
        lambda w, y: xla_head_mix(w, y, n, H, B, A, L), w2d, ys)
    got, vjp_got = jax.vjp(
        lambda w, y: hm.head_mix_fused(w, y, H=H, B=B, A=A, L=L), w2d, ys)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    (dw_ref, dys_ref), (dw_got, dys_got) = vjp_ref(dz), vjp_got(dz)
    np.testing.assert_allclose(np.asarray(dw_got), np.asarray(dw_ref),
                               rtol=1e-4, atol=1e-4)
    for a, (dr, dg) in enumerate(zip(dys_ref, dys_got)):
        np.testing.assert_allclose(np.asarray(dg), np.asarray(dr),
                                   rtol=1e-4, atol=1e-4, err_msg=f"dy[{a}]")


def test_headmix_kernel_bias_epilogue():
    """bias=: the kernel epilogue fold must equal mix + bias, with
    dbias = column sums of dz."""
    H, B, A, L, n = 4, 4, 3, 32, 100
    rng = np.random.default_rng(4)
    w2d = jnp.asarray(rng.normal(size=(n, H * B * A)).astype(np.float32))
    ys = tuple(jnp.asarray(rng.normal(size=(n, B * L)).astype(np.float32))
               for _ in range(A))
    bias = jnp.asarray(rng.normal(size=(H * L,)).astype(np.float32))
    dz = jnp.asarray(rng.normal(size=(n, H * L)).astype(np.float32))

    ref, vjp_ref = jax.vjp(
        lambda w, y, b: hm.head_mix_fused(w, y, H=H, B=B, A=A, L=L) + b,
        w2d, ys, bias)
    got, vjp_got = jax.vjp(
        lambda w, y, b: hm.head_mix_fused(w, y, H=H, B=B, A=A, L=L,
                                          bias=b), w2d, ys, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(vjp_ref(dz), vjp_got(dz)):
        jax.tree.map(lambda u, v: np.testing.assert_allclose(
            np.asarray(v), np.asarray(u), rtol=1e-4, atol=1e-4), a, b)


@pytest.mark.parametrize("H,B,A,L,yw", [
    (4, 4, 3, 32, 256),    # padded wider than B*L=128
    (4, 4, 1, 4, 128),     # tiny F=16 padded to a full register
    (8, 4, 1, 44, 256),    # mag shape at the wide sweep width
])
def test_headmix_kernel_y_width(H, B, A, L, yw):
    """y_width > B*L (lane-padded inputs from the fused sweeps): values
    and grads must match slicing to B*L, and dy tails must be ZERO (they
    feed the aggregation backward's padded lanes)."""
    n = 100
    rng = np.random.default_rng(3)
    F = B * L
    w2d = jnp.asarray(rng.normal(size=(n, H * B * A)).astype(np.float32))
    ys = tuple(jnp.asarray(rng.normal(size=(n, yw)).astype(np.float32))
               for _ in range(A))
    dz = jnp.asarray(rng.normal(size=(n, H * L)).astype(np.float32))

    ref, vjp_ref = jax.vjp(
        lambda w, y: hm.head_mix_fused(
            w, tuple(t[:, :F] for t in y), H=H, B=B, A=A, L=L), w2d, ys)
    got, vjp_got = jax.vjp(
        lambda w, y: hm.head_mix_fused(w, y, H=H, B=B, A=A, L=L,
                                       y_width=yw), w2d, ys)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    (dw_r, dys_r), (dw_g, dys_g) = vjp_ref(dz), vjp_got(dz)
    np.testing.assert_allclose(np.asarray(dw_g), np.asarray(dw_r),
                               rtol=1e-4, atol=1e-4)
    for a, (dr, dg) in enumerate(zip(dys_r, dys_g)):
        np.testing.assert_allclose(np.asarray(dg), np.asarray(dr),
                                   rtol=1e-4, atol=1e-4, err_msg=f"dy[{a}]")
        assert not np.asarray(dg)[:, F:].any(), "dy pad tail must be zero"


def test_headmix_block_rows_vmem_model():
    # mag / arxiv shapes afford 1024-row blocks; the h136 transpose pass
    # (136-lane buffers round to 256) must drop to 512 (measured OOM at
    # 1024 on v5e — scripts/probe_headmix.py)
    assert hm.headmix_block_rows(8, 4, 1, 44) == 1024
    assert hm.headmix_block_rows(4, 4, 3, 32) == 1024
    assert hm.headmix_block_rows(4, 4, 3, 34) == 512


def test_regconv_same_output_either_headmix_path(monkeypatch, rng):
    """Hetero REGConv output identical whichever head-mix path the gate
    picks — covers BOTH the root (K=B) and relation (K=A*B, a-major)
    mixes (VERDICT r4 item 2; reference rmag/models.py:116-143)."""
    from egc_tpu.graph.hetero import (
        attach_hetero_kernel_plans, hetero_from_numpy, rel_key,
    )
    from egc_tpu.nn.conv.hetero import REGConv
    import egc_tpu.ops.pallas.gather_reduce as gr

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(gr.pl, "pallas_call", patched)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("EGC_TPU_HEADMIX_MIN_ROWS", "0")

    nodes = {
        "p": rng.normal(size=(60, 16)).astype(np.float32),
        "q": rng.normal(size=(45, 16)).astype(np.float32),
    }
    edges = {}
    for key, (ns, nd) in ((rel_key("p", "to", "q"), (60, 45)),
                          (rel_key("q", "back", "p"), (45, 60)),
                          (rel_key("p", "cites", "p"), (60, 60))):
        s = rng.integers(0, ns, 200).astype(np.int32)
        r = rng.integers(0, nd, 200).astype(np.int32)
        edges[key] = (s, r)
    geom = dict(fwd_block_rows=128, fwd_window_rows=256,
                bwd_block_rows=256, bwd_window_rows=128)
    hg = jax.tree.map(jnp.asarray, attach_hetero_kernel_plans(
        hetero_from_numpy(nodes, edges), **geom))

    conv = REGConv(16, num_heads=4, num_bases=4)   # root K=4, rel K=8
    x_dict = {t: hg.nodes[t] for t in hg.node_types}
    params = conv.init(jax.random.key(0), hg, x_dict)["params"]

    def run(xd):
        return conv.apply({"params": params}, hg, xd)

    def flat(out):
        return jnp.concatenate([out[t] for t in sorted(out)], axis=0)

    out_fused, vjp_f = jax.vjp(lambda xd: flat(run(xd)), x_dict)
    monkeypatch.setenv("EGC_TPU_FUSED_HEADMIX", "0")
    out_xla, vjp_x = jax.vjp(lambda xd: flat(run(xd)), x_dict)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_xla),
                               rtol=1e-5, atol=1e-5)
    dz = jnp.asarray(rng.normal(size=out_xla.shape).astype(np.float32))
    gf, gx = vjp_f(dz)[0], vjp_x(dz)[0]
    for t in sorted(gf):
        np.testing.assert_allclose(np.asarray(gf[t]), np.asarray(gx[t]),
                                   rtol=1e-4, atol=1e-4, err_msg=t)


def test_regconv_partial_plans_stays_on_xla(monkeypatch, rng):
    """A hetero graph carrying plans for only SOME relations must not
    engage the fused head mix (ADVICE r4: partial dicts mean mixed
    aggregation dispatch; the mix then stays on XLA too)."""
    from egc_tpu.graph.hetero import (
        attach_hetero_kernel_plans, hetero_from_numpy, rel_key,
    )
    from egc_tpu.nn.conv.hetero import REGConv
    import egc_tpu.ops.pallas.headmix as hmod

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("EGC_TPU_HEADMIX_MIN_ROWS", "0")

    nodes = {"p": rng.normal(size=(40, 8)).astype(np.float32)}
    k1, k2 = rel_key("p", "a", "p"), rel_key("p", "b", "p")
    edges = {k1: (rng.integers(0, 40, 60).astype(np.int32),
                  rng.integers(0, 40, 60).astype(np.int32)),
             k2: (rng.integers(0, 40, 60).astype(np.int32),
                  rng.integers(0, 40, 60).astype(np.int32))}
    geom = dict(fwd_block_rows=128, fwd_window_rows=256,
                bwd_block_rows=256, bwd_window_rows=128)
    hg = attach_hetero_kernel_plans(hetero_from_numpy(nodes, edges), **geom)
    hg = hg.replace(kernel_plans={k1: hg.kernel_plans[k1]})  # partial
    hg = jax.tree.map(jnp.asarray, hg)

    called = []
    monkeypatch.setattr(
        hmod, "head_mix_fused",
        lambda *a, **k: called.append(1) or (_ for _ in ()).throw(
            AssertionError("fused head mix engaged with partial plans")))
    # gather_reduce would also need interpret patching if it engaged; the
    # XLA mix path must trace without it for the planless relation
    import egc_tpu.ops.pallas.gather_reduce as gr
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(gr.pl, "pallas_call", patched)
    conv = REGConv(8, num_heads=2, num_bases=2)
    x_dict = {t: hg.nodes[t] for t in hg.node_types}
    params = conv.init(jax.random.key(0), hg, x_dict)["params"]
    conv.apply({"params": params}, hg, x_dict)
    assert not called


def test_headmix_rejects_non_f32():
    with pytest.raises(TypeError, match="float32-only"):
        hm.head_mix_fused(jnp.zeros((8, 16), jnp.bfloat16),
                          (jnp.zeros((8, 8), jnp.bfloat16),),
                          H=4, B=4, A=1, L=2)


def test_headmix_vmem_overflow_falls_back_to_xla():
    """A shape whose R=128 blocks exceed the VMEM budget returns 0 from the
    block model and head_mix_fused silently takes the XLA formulation."""
    H, B, A, L = 64, 64, 4, 128    # W = 16384 cols — far past the budget
    assert hm.headmix_block_rows(H, B, A, L) == 0
    n = 4
    rng = np.random.default_rng(0)
    w2d = jnp.asarray(rng.normal(size=(n, H * B * A)).astype(np.float32))
    ys = tuple(jnp.asarray(rng.normal(size=(n, B * L)).astype(np.float32))
               for _ in range(A))
    got = hm.head_mix_fused(w2d, ys, H=H, B=B, A=A, L=L)
    ref = xla_head_mix(w2d, ys, n, H, B, A, L)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_egc_layer_same_output_either_headmix_path(monkeypatch):
    """EGC layer output identical whether the dispatch gate picks the fused
    head mix (TPU + plan + min-rows) or the XLA path."""
    from egc_tpu.graph.structure import Graph
    from egc_tpu.nn.conv.egc import EGConv
    from egc_tpu.ops.dispatch import build_kernel_plan
    import egc_tpu.ops.pallas.gather_reduce as gr

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(gr.pl, "pallas_call", patched)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    rng = np.random.default_rng(1)
    n, e, f = 300, 1200, 16
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    from egc_tpu.graph.transforms import coalesce_np
    senders, receivers, _ = coalesce_np(senders, receivers, n)
    x = rng.normal(size=(n, f)).astype(np.float32)
    plan = build_kernel_plan(senders, receivers, n,
                             fwd_block_rows=128, fwd_window_rows=256,
                             bwd_block_rows=256, bwd_window_rows=128)
    g = Graph.from_coo(x, senders, receivers).replace(kernel_plan=plan)

    conv = EGConv(out_channels=16, num_heads=4, num_bases=4,
                  aggrs=("symnorm", "max", "mean"), self_loop_mode="paper")
    params = conv.init(jax.random.key(0), g, g.nodes)["params"]

    def run(v):
        return conv.apply({"params": params}, g, v)

    monkeypatch.setenv("EGC_TPU_HEADMIX_MIN_ROWS", "0")
    xv = jnp.asarray(x)
    out_fused, vjp_f = jax.vjp(run, xv)
    monkeypatch.setenv("EGC_TPU_FUSED_HEADMIX", "0")
    out_xla, vjp_x = jax.vjp(run, xv)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_xla),
                               rtol=1e-5, atol=1e-5)
    dz = jnp.asarray(rng.normal(size=out_xla.shape).astype(np.float32))
    np.testing.assert_allclose(np.asarray(vjp_f(dz)[0]),
                               np.asarray(vjp_x(dz)[0]),
                               rtol=1e-4, atol=1e-4)
