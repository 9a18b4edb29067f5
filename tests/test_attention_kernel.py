"""GAT fused attention kernel parity tests (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import jax.experimental.pallas as pl
import egc_tpu.ops.pallas.attention as attn
from egc_tpu.ops.dispatch import build_kernel_plan


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    import egc_tpu.ops.pallas.gather_reduce as gr

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(attn.pl, "pallas_call", patched)
    # gat_attention's stationary-m max pass rides the gather-reduce kernels
    monkeypatch.setattr(gr.pl, "pallas_call", patched)


def test_gat_fwd_matches_xla_softmax_sum():
    rng = np.random.default_rng(0)
    n, e, H, C = 200, 900, 4, 16
    cp = 32                              # H*cp = 128
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    from egc_tpu.graph.transforms import coalesce_np
    senders, receivers, _ = coalesce_np(senders, receivers, n)

    plan = build_kernel_plan(senders, receivers, n,
                             fwd_block_rows=128, fwd_window_rows=256,
                             bwd_block_rows=256, bwd_window_rows=128,
                             bwd_narrow_window_rows=None)
    npad = plan.n_pad

    wh = rng.normal(size=(n, H, C)).astype(np.float32)
    a_src = rng.normal(size=(n, H)).astype(np.float32)
    a_dst = rng.normal(size=(n, H)).astype(np.float32)

    # pack: head-interleaved wh (col c*H+h) + a_src EXPANDED to the same
    # layout; channel C is the CONSTANT-1 denominator channel
    hcp = H * cp
    src_pack = np.zeros((npad, 2 * hcp), np.float32)
    for h in range(H):
        for c in range(C):
            src_pack[:n, c * H + h] = wh[:, h, c]
        src_pack[:, C * H + h] = 1.0
        for c in range(cp):
            src_pack[:n, hcp + c * H + h] = a_src[:, h]

    # numpy reference max (the kernel takes the stationary m as input)
    z = a_src[senders] + a_dst[receivers]                  # [E, H]
    logit = np.where(z >= 0, z, 0.2 * z)
    m_ref = np.full((n, H), -np.inf)
    np.maximum.at(m_ref, receivers, logit)
    has = np.isfinite(m_ref)
    m_in = np.where(has, m_ref, attn.NEG_BIG)

    stat = np.zeros((npad, 2 * hcp), np.float32)
    for h in range(H):
        for c in range(cp):
            stat[:n, c * H + h] = a_dst[:, h]
            stat[:n, hcp + c * H + h] = m_in[:, h]

    o = attn.gat_fwd(
        jnp.asarray(src_pack), jnp.asarray(stat),
        plan.fwd.senders, plan.fwd.receivers, plan.fwd.cell_ptr,
        heads=H, cp=cp,
        r_blocks=plan.fwd.r_blocks, s_blocks=plan.fwd.s_blocks,
        block_rows=plan.fwd.block_rows, window_rows=plan.fwd.window_rows)
    o = np.asarray(o)[:n]
    d = o[:, C * H:(C + 1) * H]           # ones-channel denominator

    # XLA reference: per-receiver softmax-weighted sum (no self term)
    ref = np.zeros((n, H, C))
    p = np.exp(logit - np.where(has, m_ref, 0.0)[receivers])
    d_ref = np.zeros((n, H))
    np.add.at(d_ref, receivers, p)
    np.add.at(ref, receivers, p[:, :, None] * wh[senders])

    # kernel o is unnormalized with max m; compare normalized sums
    got = np.zeros((n, H, C))
    for h in range(H):
        for c in range(C):
            got[:, h, c] = o[:, c * H + h]
    with np.errstate(invalid="ignore"):
        norm_got = got / np.maximum(d, 1e-30)[:, :, None]
        norm_ref = ref / np.maximum(d_ref, 1e-30)[:, :, None]
    mask = has
    np.testing.assert_allclose(norm_got[mask], norm_ref[mask],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(d[mask], d_ref[mask], rtol=1e-5, atol=1e-6)


def _mini_plan(senders, receivers, n, v2=False):
    """GraphKernelPlan with small attention layouts for interpret tests.

    ``v2``: also attach big-cell two-phase layouts (same small geometry —
    the tiny graphs are dense relative to it, so cells hold >V2_TILE edges
    and the staged-MXU tile path is exercised, not just its tail)."""
    import jax.numpy as jnp
    from egc_tpu.ops.pallas.gather_reduce import make_window_plan_np
    from egc_tpu.ops.dispatch import WindowPlanDev, GraphKernelPlan

    align = 256
    npad = ((n + align) // align) * align

    def dev(p):
        return WindowPlanDev(
            senders=jnp.asarray(p["senders"]),
            receivers=jnp.asarray(p["receivers"]),
            cell_ptr=jnp.asarray(p["cell_ptr"]),
            edge_perm=jnp.asarray(p["perm"].astype(np.int32)),
            r_blocks=p["R"], s_blocks=p["S"],
            block_rows=p["block_rows"], window_rows=p["window_rows"])

    f = make_window_plan_np(senders, receivers, npad, block_rows=128,
                            window_rows=256)
    b = make_window_plan_np(receivers, senders, npad, block_rows=256,
                            window_rows=128)
    deg = np.zeros(npad, np.float32)
    np.add.at(deg, receivers, 1.0)
    return GraphKernelPlan(fwd=dev(f), bwd=dev(b), fwd_attn=dev(f),
                           bwd_attn=dev(b),
                           fwd_v2=dev(f) if v2 else None,
                           bwd_v2=dev(b) if v2 else None,
                           deg=jnp.asarray(deg),
                           n_pad=npad)


@pytest.mark.parametrize("C,cp", [(16, 32), (32, 32)])
def test_gat_attention_value_and_grad_parity(C, cp):
    """Fused flash-softmax attention (fwd + 2-pass bwd) must match the XLA
    segment-softmax path for values AND gradients — in both denominator
    modes: free ones channel (cp > C) and separate accumulator (cp == C,
    dchan=None)."""
    from egc_tpu.ops.pallas.attention import gat_attention
    from egc_tpu.nn.conv.attention import _attention_alphas
    from egc_tpu.graph.transforms import coalesce_np

    rng = np.random.default_rng(3)
    n, e, H = 180, 800, 4
    hcp = H * cp
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    senders, receivers, _ = coalesce_np(senders, receivers, n)
    plan = _mini_plan(senders, receivers, n)
    npad = plan.n_pad

    wh = rng.normal(size=(npad, H, C)).astype(np.float32)
    wh[n:] = 0.0
    a_src = np.zeros((npad, H), np.float32)
    a_src[:n] = rng.normal(size=(n, H))
    a_dst = np.zeros((npad, H), np.float32)
    a_dst[:n] = rng.normal(size=(n, H))
    proj = rng.normal(size=(npad, H, C)).astype(np.float32)
    proj[n:] = 0.0
    proj = jnp.asarray(proj)
    deg_pos = np.asarray(plan.deg) > 0

    sj, rj = jnp.asarray(senders), jnp.asarray(receivers)

    def fused_loss(wh, a_src, a_dst):
        if cp > C:
            wh_int = jnp.concatenate(
                [wh.transpose(0, 2, 1), jnp.ones((npad, 1, H), wh.dtype),
                 jnp.zeros((npad, cp - C - 1, H), wh.dtype)],
                axis=1).reshape(npad, hcp)
            dchan = C
        else:
            wh_int = wh.transpose(0, 2, 1).reshape(npad, hcp)
            dchan = None
        src_pack = jnp.concatenate(
            [wh_int, jnp.tile(a_src, (1, cp))], axis=1)
        adst = jnp.pad(a_dst, ((0, 0), (0, 128 - H)))
        o, md = gat_attention(src_pack, adst, plan, heads=H, cp=cp,
                              dchan=dchan)
        d_e = md[:, 64:64 + H]
        o = o.reshape(npad, cp, H).transpose(0, 2, 1)[:, :, :C]
        has = jnp.asarray(deg_pos)[:, None, None]
        out = jnp.where(has, o / jnp.maximum(d_e, 1e-16)[:, :, None], 0.0)
        return jnp.sum(out * proj)

    def xla_loss(wh, a_src, a_dst):
        z = jnp.take(a_src, sj, axis=0) + jnp.take(a_dst, rj, axis=0)
        logits = jnp.where(z >= 0, z, 0.2 * z)
        alpha_e, _ = _attention_alphas(logits, None, rj, npad, None, False)
        out = jax.ops.segment_sum(
            alpha_e[:, :, None] * jnp.take(wh, sj, axis=0), rj,
            num_segments=npad)
        return jnp.sum(out * proj)

    args = (jnp.asarray(wh), jnp.asarray(a_src), jnp.asarray(a_dst))
    v_f, g_f = jax.value_and_grad(fused_loss, argnums=(0, 1, 2))(*args)
    v_x, g_x = jax.value_and_grad(xla_loss, argnums=(0, 1, 2))(*args)
    np.testing.assert_allclose(float(v_f), float(v_x), rtol=1e-4)
    for a, b, name in zip(g_f, g_x, ("wh", "a_src", "a_dst")):
        np.testing.assert_allclose(np.asarray(a)[:n], np.asarray(b)[:n],
                                   rtol=2e-3, atol=2e-4, err_msg=name)


@pytest.mark.parametrize("C", [16, 32])
def test_gatconv_fused_branch_matches_xla(monkeypatch, C):
    """GATConv with a kernel-plan graph on 'TPU' (interpret) must match its
    own XLA path, including virtual self-loops. C=16 exercises the free
    ones-channel mode; C=32 the separate-denominator (dchan=None) mode."""
    from egc_tpu.graph.structure import Graph, pad_graph
    from egc_tpu.nn.conv.attention import GATConv
    from egc_tpu.graph.transforms import coalesce_np

    rng = np.random.default_rng(7)
    n, e, H = 150, 700, 4
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    senders, receivers, _ = coalesce_np(senders, receivers, n)
    plan = _mini_plan(senders, receivers, n)
    npad = plan.n_pad

    x = np.zeros((npad, 24), np.float32)
    x[:n] = rng.normal(size=(n, 24))
    g = Graph.from_coo(np.zeros((n, 1), np.float32), senders, receivers)
    g = pad_graph(g, num_nodes=npad, num_edges=len(senders))

    conv = GATConv(out_channels=C, heads=H)
    variables = conv.init(jax.random.key(0), g, jnp.asarray(x))
    ref = np.asarray(conv.apply(variables, g, jnp.asarray(x)))

    gk = g.replace(kernel_plan=plan)
    monkeypatch.setenv("EGC_TPU_FUSED_ATTENTION", "1")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got = np.asarray(conv.apply(variables, gk, jnp.asarray(x)))
    np.testing.assert_allclose(got[:n], ref[:n], rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("two_phase", [False, True])
def test_gatv2_attention_value_and_grad_parity(two_phase):
    """Fused GATv2 edge-softmax (fwd + 2-pass bwd) vs XLA, incl. d_att —
    both kernel generations (per-edge dotfold and staged-MXU two-phase)."""
    from egc_tpu.ops.pallas.attention import gatv2_attention
    from egc_tpu.nn.conv.attention import _attention_alphas
    from egc_tpu.graph.transforms import coalesce_np

    rng = np.random.default_rng(5)
    n, e, H, C, cp = 160, 700, 4, 16, 32
    hcp = H * cp
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    senders, receivers, _ = coalesce_np(senders, receivers, n)
    plan = _mini_plan(senders, receivers, n, v2=two_phase)
    npad = plan.n_pad

    def mk(shape):
        a = np.zeros((npad,) + shape[1:], np.float32)
        a[:n] = rng.normal(size=(n,) + shape[1:])
        return a

    hl = mk((n, H, C))
    hr = mk((n, H, C))
    att = rng.normal(size=(H, C)).astype(np.float32)
    proj = jnp.asarray(mk((n, H, C)))
    deg_pos = np.asarray(plan.deg) > 0
    sj, rj = jnp.asarray(senders), jnp.asarray(receivers)

    def interleave(x, ones_chan=False):
        xt = x.transpose(0, 2, 1)
        if ones_chan:
            xt = jnp.concatenate(
                [xt, jnp.ones((npad, 1, H), x.dtype),
                 jnp.zeros((npad, cp - C - 1, H), x.dtype)], axis=1)
        else:
            xt = jnp.pad(xt, ((0, 0), (0, cp - C), (0, 0)))
        return xt.reshape(npad, hcp)

    def fused_loss(hl, hr, att):
        att_i = jnp.pad(att.T, ((0, cp - C), (0, 0))).reshape(1, hcp)
        att_rep = jnp.broadcast_to(att_i, (8, hcp))
        o, md = gatv2_attention(interleave(hl, ones_chan=True),
                                interleave(hr), att_rep,
                                plan, heads=H, cp=cp, dchan=C)
        d_e = md[:, 64:64 + H]
        o = o.reshape(npad, cp, H).transpose(0, 2, 1)[:, :, :C]
        has = jnp.asarray(deg_pos)[:, None, None]
        out = jnp.where(has, o / jnp.maximum(d_e, 1e-16)[:, :, None], 0.0)
        return jnp.sum(out * proj)

    def xla_loss(hl, hr, att):
        z = jnp.take(hl, sj, axis=0) + jnp.take(hr, rj, axis=0)
        z = jnp.where(z >= 0, z, 0.2 * z)
        logits = jnp.einsum("ehc,hc->eh", z, att)
        alpha_e, _ = _attention_alphas(logits, None, rj, npad, None, False)
        out = jax.ops.segment_sum(
            alpha_e[:, :, None] * jnp.take(hl, sj, axis=0), rj,
            num_segments=npad)
        return jnp.sum(out * proj)

    args = (jnp.asarray(hl), jnp.asarray(hr), jnp.asarray(att))
    v_f, g_f = jax.value_and_grad(fused_loss, argnums=(0, 1, 2))(*args)
    v_x, g_x = jax.value_and_grad(xla_loss, argnums=(0, 1, 2))(*args)
    np.testing.assert_allclose(float(v_f), float(v_x), rtol=1e-4)
    for a, b, name in zip(g_f, g_x, ("hl", "hr", "att")):
        aa, bb = np.asarray(a), np.asarray(b)
        if name != "att":
            aa, bb = aa[:n], bb[:n]
        np.testing.assert_allclose(aa, bb, rtol=2e-3, atol=3e-4,
                                   err_msg=name)


@pytest.mark.parametrize("two_phase", [False, True])
def test_gatv2conv_fused_branch_matches_xla(monkeypatch, two_phase):
    from egc_tpu.graph.structure import Graph, pad_graph
    from egc_tpu.nn.conv.attention import GATv2Conv
    from egc_tpu.graph.transforms import coalesce_np

    rng = np.random.default_rng(9)
    n, e, H, C = 140, 650, 4, 16
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    senders, receivers, _ = coalesce_np(senders, receivers, n)
    plan = _mini_plan(senders, receivers, n, v2=two_phase)
    npad = plan.n_pad

    x = np.zeros((npad, 24), np.float32)
    x[:n] = rng.normal(size=(n, 24))
    g = Graph.from_coo(np.zeros((n, 1), np.float32), senders, receivers)
    g = pad_graph(g, num_nodes=npad, num_edges=len(senders))

    conv = GATv2Conv(out_channels=C, heads=H)
    variables = conv.init(jax.random.key(0), g, jnp.asarray(x))
    ref = np.asarray(conv.apply(variables, g, jnp.asarray(x)))

    gk = g.replace(kernel_plan=plan)
    monkeypatch.setenv("EGC_TPU_FUSED_ATTENTION", "1")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got = np.asarray(conv.apply(variables, gk, jnp.asarray(x)))
    np.testing.assert_allclose(got[:n], ref[:n], rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("kind", ["gat", "gatv2"])
def test_attention_fused_short_rows_matches_xla(monkeypatch, kind):
    """n < plan.n_pad (partitioned extended graphs / loader shadow rows):
    the fused helpers zero-row-pad to the plan size and slice back."""
    from egc_tpu.graph.structure import Graph, pad_graph
    from egc_tpu.nn.conv.attention import GATConv, GATv2Conv
    from egc_tpu.graph.transforms import coalesce_np

    rng = np.random.default_rng(13)
    n, e, H = 140, 650, 4
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    senders, receivers, _ = coalesce_np(senders, receivers, n)
    plan = _mini_plan(senders, receivers, n, v2=(kind == "gatv2"))
    n_short = plan.n_pad - 8          # fewer rows than the plan

    x = np.zeros((n_short, 24), np.float32)
    x[:n] = rng.normal(size=(n, 24))
    g = Graph.from_coo(np.zeros((n, 1), np.float32), senders, receivers)
    g = pad_graph(g, num_nodes=n_short, num_edges=len(senders))

    conv = (GATConv(out_channels=16, heads=H) if kind == "gat"
            else GATv2Conv(out_channels=12, heads=H))
    variables = conv.init(jax.random.key(0), g, jnp.asarray(x))
    ref = np.asarray(conv.apply(variables, g, jnp.asarray(x)))

    gk = g.replace(kernel_plan=plan)
    monkeypatch.setenv("EGC_TPU_FUSED_ATTENTION", "1")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got = np.asarray(conv.apply(variables, gk, jnp.asarray(x)))
    np.testing.assert_allclose(got[:n], ref[:n], rtol=2e-4, atol=2e-5)
