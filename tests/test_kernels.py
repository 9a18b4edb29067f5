"""Pallas kernel parity tests (interpret mode on CPU).

Gates: the fused windowed kernels must match the XLA segment path for
values AND gradients (custom VJP) across aggregator sets.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import jax.experimental.pallas as pl
import egc_tpu.ops.pallas.gather_reduce as gr
from egc_tpu.ops.segment import multi_aggregate
from egc_tpu.ops.dispatch import build_kernel_plan, fused_multi_aggregate
from egc_tpu.graph.transforms import symnorm_weight


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(gr.pl, "pallas_call", patched)


def small_graph(seed=0, n=300, e=1500, f=128):
    rng = np.random.default_rng(seed)
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    # deduplicate: on multigraphs the kernel's max/min VJP routes the full
    # cotangent to every duplicate achieving edge while JAX splits it; all
    # real datasets are coalesced (see dispatch.py docstring)
    from egc_tpu.graph.transforms import coalesce_np
    senders, receivers, _ = coalesce_np(senders, receivers, n)
    vals = rng.normal(size=(n, f)).astype(np.float32)
    return vals, senders, receivers


def plan_small(senders, receivers, n):
    return build_kernel_plan(
        senders, receivers, n,
        fwd_block_rows=128, fwd_window_rows=256,
        bwd_block_rows=256, bwd_window_rows=128)


@pytest.mark.parametrize("aggrs,include_self", [
    (("sum", "mean", "max", "min"), False),
    (("sum", "mean", "max", "min", "var", "std"), True),
    (("symnorm", "max", "mean"), False),
])
def test_fused_matches_xla_values_and_grads(aggrs, include_self):
    vals, senders, receivers = small_graph()
    n = vals.shape[0]
    plan = plan_small(senders, receivers, n)
    vpad = np.zeros((plan.n_pad, vals.shape[1]), np.float32)
    vpad[:n] = vals

    ew = sw = None
    ew_pad = sw_pad = None
    if "symnorm" in aggrs:
        ew, sw = symnorm_weight(jnp.asarray(senders), jnp.asarray(receivers),
                                n)
        sw_pad = jnp.zeros(plan.n_pad).at[:n].set(sw)
        ew_pad = ew

    def xla_fn(v):
        out = multi_aggregate(v[:n], jnp.asarray(senders),
                              jnp.asarray(receivers), aggrs,
                              include_self=include_self,
                              symnorm_edge_w=ew, symnorm_self_w=sw)
        return out

    def fused_fn(v):
        return fused_multi_aggregate(v, plan, aggrs,
                                     include_self=include_self,
                                     symnorm_edge_w=ew_pad,
                                     symnorm_self_w=sw_pad)

    vj = jnp.asarray(vpad)
    ref = np.asarray(xla_fn(vj))
    got = np.asarray(fused_fn(vj))[:n]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    # gradient parity through a random projection loss
    rng = np.random.default_rng(1)
    proj = jnp.asarray(rng.normal(size=ref.shape).astype(np.float32))

    g_ref = jax.grad(lambda v: jnp.sum(xla_fn(v) * proj))(vj)
    g_got = jax.grad(
        lambda v: jnp.sum(fused_fn(v)[:n] * proj))(vj)
    np.testing.assert_allclose(np.asarray(g_got)[:n], np.asarray(g_ref)[:n],
                               rtol=1e-3, atol=1e-3)
    # padding rows get no gradient
    assert np.abs(np.asarray(g_got)[n:]).max() == 0.0


def test_plan_respects_edge_mask():
    vals, senders, receivers = small_graph(seed=2, n=200, e=800)
    n = vals.shape[0]
    mask = np.random.default_rng(3).random(len(senders)) > 0.3
    plan = build_kernel_plan(senders, receivers, n, edge_mask=mask,
                            fwd_block_rows=128, fwd_window_rows=256,
                            bwd_block_rows=256, bwd_window_rows=128)
    vpad = jnp.zeros((plan.n_pad, vals.shape[1])).at[:n].set(vals)
    got = np.asarray(fused_multi_aggregate(vpad, plan, ("sum",)))[:n, 0]
    ref = np.asarray(multi_aggregate(
        jnp.asarray(vals), jnp.asarray(senders), jnp.asarray(receivers),
        ["sum"], edge_mask=jnp.asarray(mask)))[:, 0]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_unaligned_width_pads_through_kernel(monkeypatch):
    """conv_aggregate routes unaligned feature widths (the reference's tuned
    configs: h136/h168/...) onto the fused path by zero-padding columns."""
    from egc_tpu.graph.structure import Graph, pad_graph
    from egc_tpu.ops import dispatch as dsp
    from egc_tpu.ops.segment import multi_aggregate

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    vals, senders, receivers = small_graph(seed=5, n=200, e=900, f=128)
    f = 72                                # not a lane multiple
    vals = vals[:, :f].copy()
    n = vals.shape[0]
    plan = plan_small(senders, receivers, n)
    g = Graph.from_coo(np.zeros((n, 1), np.float32), senders, receivers)
    g = pad_graph(g, num_nodes=plan.n_pad, num_edges=len(senders))
    g = g.replace(kernel_plan=plan)
    vpad = jnp.zeros((plan.n_pad, f)).at[:n].set(vals)

    got = dsp.conv_aggregate(g, vpad, ("sum", "max", "mean"))
    assert got.shape == (plan.n_pad, 3, f)
    ref = multi_aggregate(jnp.asarray(vals), jnp.asarray(senders),
                          jnp.asarray(receivers), ("sum", "max", "mean"))
    np.testing.assert_allclose(np.asarray(got)[:n], np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_loader_emits_static_kernel_plans():
    """GraphLoader(kernel_plans=True) must give every batch a plan whose
    array shapes are budget-static (one jit compilation)."""
    from egc_tpu.data.loaders import GraphLoader, padding_budget
    from egc_tpu.data import synthetic

    splits = synthetic.synthetic_zinc(num_graphs=40)
    graphs = splits["train"]
    budget = padding_budget(graphs, 8,
                            node_multiple=GraphLoader.PLAN_BLOCK)
    loader = GraphLoader(graphs, 8, shuffle=True, budget=budget,
                         kernel_plans=True, seed=0)
    shapes = set()
    for g, _y in loader:
        plan = g.kernel_plan
        assert plan is not None
        # one shadow block beyond the budget holds the redirected pad edges
        assert plan.n_pad == budget[0] + GraphLoader.PLAN_BLOCK
        shapes.add((plan.fwd.senders.shape, plan.fwd.cell_ptr.shape,
                    plan.bwd.senders.shape, plan.deg.shape))
    assert len(shapes) == 1


def test_wide_width_column_split(monkeypatch):
    """Widths >128 route through per-128-lane column groups (VMEM-safe
    path for the reference's wide tuned configs, e.g. arxiv h136)."""
    from egc_tpu.graph.structure import Graph, pad_graph
    from egc_tpu.ops import dispatch as dsp
    from egc_tpu.ops.segment import multi_aggregate

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    vals, senders, receivers = small_graph(seed=11, n=180, e=800, f=128)
    rng = np.random.default_rng(12)
    f = 200                               # pads to 256 -> 2 column groups
    vals = np.concatenate(
        [vals, rng.normal(size=(vals.shape[0], f - 128)).astype(np.float32)],
        axis=1)
    n = vals.shape[0]
    plan = plan_small(senders, receivers, n)
    g = Graph.from_coo(np.zeros((n, 1), np.float32), senders, receivers)
    g = pad_graph(g, num_nodes=plan.n_pad, num_edges=len(senders))
    g = g.replace(kernel_plan=plan)
    vpad = jnp.zeros((plan.n_pad, f)).at[:n].set(vals)

    def loss(v):
        return jnp.sum(dsp.conv_aggregate(g, v, ("sum", "max", "mean")))

    got, grad = jax.value_and_grad(loss)(vpad)
    ref_out = multi_aggregate(jnp.asarray(vals), jnp.asarray(senders),
                              jnp.asarray(receivers), ("sum", "max", "mean"))
    ref_loss, ref_grad = jax.value_and_grad(
        lambda v: jnp.sum(multi_aggregate(
            v, jnp.asarray(senders), jnp.asarray(receivers),
            ("sum", "max", "mean"))))(jnp.asarray(vals))
    np.testing.assert_allclose(float(got), float(ref_loss), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(grad)[:n], np.asarray(ref_grad),
                               rtol=1e-3, atol=1e-4)
    del ref_out


def test_wide_gate_production_geometry():
    """At the production plan geometry (block 2048 / window 4096), the
    VMEM gate admits the flagship 3-primitive sets and rejects the
    5-primitive 6-aggregator set (fwd would need 18 MB > 16 MB VMEM)."""
    from egc_tpu.ops import dispatch as dsp

    rng = np.random.default_rng(3)
    senders = rng.integers(0, 5000, 20000).astype(np.int32)
    receivers = rng.integers(0, 5000, 20000).astype(np.int32)
    plan = dsp.build_kernel_plan(senders, receivers, 5000, attention=False)
    assert dsp._wide_fits(plan, ("symnorm", "max", "mean"))
    assert dsp._wide_fits(plan, ("symnorm",))
    assert not dsp._wide_fits(plan,
                              ("sum", "mean", "max", "min", "var", "std"))


@pytest.mark.parametrize("aggrs,expect_wide", [
    (("symnorm", "max", "mean"), True),    # flagship set: prims=3, nsegs=4
    (("sum", "mean", "max", "min", "var", "std"), True),  # 5-prim wide (the
    # tiny test-plan geometry fits VMEM, so this exercises the full
    # primitive set through the wide kernels too)
])
def test_wide_single_sweep_parity(monkeypatch, aggrs, expect_wide):
    """F=256 wide mode (scratch-accumulator kernels, single edge sweep):
    value+grad parity with the XLA path."""
    from egc_tpu.graph.structure import Graph, pad_graph
    from egc_tpu.ops import dispatch as dsp
    from egc_tpu.ops.segment import multi_aggregate

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    vals, senders, receivers = small_graph(seed=21, n=180, e=800, f=128)
    rng = np.random.default_rng(22)
    vals = np.concatenate(
        [vals, rng.normal(size=(vals.shape[0], 128)).astype(np.float32)],
        axis=1)                            # f = 256 exactly
    n = vals.shape[0]
    plan = plan_small(senders, receivers, n)
    assert dsp._wide_fits(plan, aggrs) == expect_wide

    ew = sw = None
    if "symnorm" in aggrs:
        ew, sw = symnorm_weight(jnp.asarray(senders),
                                jnp.asarray(receivers), n)
    g = Graph.from_coo(np.zeros((n, 1), np.float32), senders, receivers)
    g = pad_graph(g, num_nodes=plan.n_pad, num_edges=len(senders))
    g = g.replace(kernel_plan=plan)
    vpad = jnp.zeros((plan.n_pad, 256)).at[:n].set(vals)
    sw_pad = None if sw is None else jnp.zeros(plan.n_pad).at[:n].set(sw)

    def loss(v):
        out = dsp.conv_aggregate(g, v, aggrs, symnorm_edge_w=ew,
                                 symnorm_self_w=sw_pad)
        # sum only the valid rows: empty PAD segments legitimately yield
        # std = sqrt(1e-5) != 0 in every path, and the XLA reference below
        # has no pad rows to compare them against
        return jnp.sum(jnp.sin(out[:n]))

    got, grad = jax.value_and_grad(loss)(vpad)
    ref_loss, ref_grad = jax.value_and_grad(
        lambda v: jnp.sum(jnp.sin(multi_aggregate(
            v, jnp.asarray(senders), jnp.asarray(receivers), aggrs,
            symnorm_edge_w=ew, symnorm_self_w=sw))))(jnp.asarray(vals))
    np.testing.assert_allclose(float(got), float(ref_loss), rtol=1e-4)
    # atol 2e-3: var/std grads subtract E[x^2] and E[x]^2 terms whose
    # accumulation order differs between the kernel sweep and XLA
    np.testing.assert_allclose(np.asarray(grad)[:n], np.asarray(ref_grad),
                               rtol=1e-3, atol=2e-3)


def test_padded_batch_pad_rows_match_xla(monkeypatch):
    """Loader-plan batches: padded edges must contribute NOTHING to any
    model row in either pass, INCLUDING the padding rows themselves.

    Regression: pointing pad edges at an in-range padding row inflated the
    pad row's forward aggregates by the duplicate count and, through the
    max-tie VJP, amplified any nonzero pad-row cotangent (e.g. via an
    unmasked op) ~1000x per layer — exploding real zinc training to NaN.
    The loss here deliberately does NOT mask pad rows to catch exactly
    that coupling.
    """
    from egc_tpu.data.loaders import GraphLoader, padding_budget
    from egc_tpu.data import synthetic
    from egc_tpu.ops import dispatch as dsp

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    splits = synthetic.synthetic_zinc(num_graphs=30)
    graphs = splits["train"]
    budget = padding_budget(graphs, 16, node_multiple=GraphLoader.PLAN_BLOCK)
    loader = GraphLoader(graphs, 16, shuffle=False, budget=budget,
                         kernel_plans=True)
    g, _y = next(iter(loader))
    g = jax.tree.map(jnp.asarray, g)
    n = g.num_nodes
    assert int(np.asarray(g.edge_mask).sum()) < g.num_edges  # has pad edges

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(n, 128)).astype(np.float32))

    def vg(aggrs, fused):
        proj = jnp.asarray(
            np.random.default_rng(9).normal(size=(n, len(aggrs), 128))
            .astype(np.float32))

        def loss(v):
            if fused:
                out = dsp.conv_aggregate(g, v, aggrs)
            else:
                out = multi_aggregate(v, g.senders, g.receivers, aggrs,
                                      edge_mask=g.edge_mask,
                                      indices_are_sorted=True)
            return jnp.sum(out * proj)

        return jax.value_and_grad(loss)(x)

    aggrs = ("sum", "mean", "max", "min")
    vf, gf = vg(aggrs, True)
    vx, gx = vg(aggrs, False)
    np.testing.assert_allclose(float(vf), float(vx), rtol=1e-4)
    # every row — pad rows included — must match the masked XLA path
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               rtol=1e-3, atol=1e-3)

    # std: the sqrt(relu(var)+1e-5) gate flips on last-ulp fp-order
    # differences when var ~ 0 (both flips are valid subgradients; the
    # 0.5/sqrt(1e-5) factor amplifies them) — compare grads away from the
    # ill-conditioned positions only
    vf, gf = vg(("std",), True)
    vx, gx = vg(("std",), False)
    np.testing.assert_allclose(float(vf), float(vx), rtol=1e-4)
    var = np.asarray(multi_aggregate(x, g.senders, g.receivers, ("var",),
                                     edge_mask=g.edge_mask,
                                     indices_are_sorted=True))[:, 0]
    send = np.asarray(g.senders)[np.asarray(g.edge_mask)]
    recv = np.asarray(g.receivers)[np.asarray(g.edge_mask)]
    ill = np.abs(var) < 1e-4                      # [n, 128] receiver-side
    well = np.ones((n, 128), bool)                # sender-side
    np.logical_and.at(well, send, ~ill[recv])
    d = np.abs(np.asarray(gf) - np.asarray(gx))
    assert d[well].max() < 1e-3


def test_pnaconv_fused_branch_matches_xla(monkeypatch):
    """PNAConv's factorized aggregation rides the fused kernel path when a
    plan is attached (value + grad parity vs the plan-free XLA path)."""
    from egc_tpu.graph.structure import Graph, pad_graph
    from egc_tpu.nn.conv.pna import PNAConv

    vals, senders, receivers = small_graph(seed=11, n=200, e=900, f=24)
    n = vals.shape[0]
    plan = plan_small(senders, receivers, n)
    g = Graph.from_coo(vals, senders, receivers)
    g = pad_graph(g, num_nodes=plan.n_pad, num_edges=len(senders))
    gk = g.replace(kernel_plan=plan)

    conv = PNAConv(8, avg_log_deg=1.2, towers=2)
    params = conv.init(jax.random.key(0), g, g.nodes)["params"]

    def loss(p, graph):
        out = conv.apply({"params": p}, graph, graph.nodes)
        return jnp.sum(out[:n] ** 2)

    ref, gref = jax.value_and_grad(loss)(params, g)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got, ggot = jax.value_and_grad(loss)(params, gk)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-4)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(gref),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(ggot),
                   key=lambda kv: str(kv[0]))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-4, err_msg=str(ka))


def test_wide_without_narrow_plan_symnorm(monkeypatch):
    """The mag h352 setup: plan built WITHOUT a narrow transpose layout
    (bwd_narrow_window_rows=None, bench_mag_full.py) + symnorm-only. The
    wide gate must admit it on the REGULAR transpose plan (K=1 coeff
    stream fits the 2048-row windows) and value+grad must match XLA —
    round 3: this previously fell back to 2x column-split sweeps."""
    from egc_tpu.graph.structure import Graph, pad_graph
    from egc_tpu.ops import dispatch as dsp
    from egc_tpu.ops.segment import multi_aggregate

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    vals, senders, receivers = small_graph(seed=31, n=150, e=700, f=128)
    rng = np.random.default_rng(32)
    vals = np.concatenate(
        [vals, rng.normal(size=(vals.shape[0], 128)).astype(np.float32)],
        axis=1)
    n = vals.shape[0]
    ew, sw = symnorm_weight(jnp.asarray(senders), jnp.asarray(receivers), n)
    plan = dsp.build_kernel_plan(
        senders, receivers, n, fwd_block_rows=64, fwd_window_rows=128,
        bwd_block_rows=128, bwd_window_rows=64,
        bwd_narrow_window_rows=None, attention=False,
        edge_weight=np.asarray(ew))
    assert plan.bwd_narrow is None
    assert dsp._wide_fits(plan, ("symnorm",))
    assert dsp._wide_bwd_plan(plan, 1) is plan.bwd

    g = Graph.from_coo(np.zeros((n, 1), np.float32), senders, receivers)
    g = pad_graph(g, num_nodes=plan.n_pad, num_edges=len(senders))
    g = g.replace(kernel_plan=plan)
    vpad = jnp.zeros((plan.n_pad, 256)).at[:n].set(vals)
    sw_pad = jnp.zeros(plan.n_pad).at[:n].set(sw)

    def loss(v):
        out = dsp.conv_aggregate(g, v, ("symnorm",), symnorm_self_w=sw_pad)
        return jnp.sum(jnp.sin(out[:n]))

    got, grad = jax.value_and_grad(loss)(vpad)
    ref_loss, ref_grad = jax.value_and_grad(
        lambda v: jnp.sum(jnp.sin(multi_aggregate(
            v, jnp.asarray(senders), jnp.asarray(receivers), ("symnorm",),
            symnorm_edge_w=ew, symnorm_self_w=sw))))(jnp.asarray(vals))
    np.testing.assert_allclose(float(got), float(ref_loss), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(grad)[:n], np.asarray(ref_grad),
                               rtol=1e-3, atol=1e-4)
