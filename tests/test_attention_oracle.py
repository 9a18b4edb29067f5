"""Independent numpy oracles for the FULL GAT/GATv2 layers.

PyG-parity gates beyond the XLA-vs-kernel self-consistency tests: the
oracle materializes self-loop edges and computes the per-receiver softmax
explicitly, mirroring PyG ``GATConv``/``GATv2Conv`` semantics (reference
usage: ``experiments/zinc/models.py:81-89``, ``arxiv/norm_models.py:77-91``):

- logits: v1 ``LeakyReLU(a_src.Wx_j + a_dst.Wx_i)``; v2
  ``a . LeakyReLU(W_l x_j + W_r x_i)`` (+ ``share_weights``)
- softmax over {incoming edges} union {self} (add_self_loops=True)
- bias added AFTER head concat
- attention dropout applies to the normalized alphas in training
  (PyG ``F.dropout(alpha)``) — checked statistically via the inverted-
  dropout expectation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from egc_tpu.graph.structure import Graph
from egc_tpu.nn.conv.attention import GATConv, GATv2Conv


def leaky(x, s=0.2):
    return np.where(x >= 0, x, s * x)


def softmax_weighted(logits, vals, senders, receivers, n):
    """Per-receiver softmax over materialized edges -> [n, H, C]."""
    H = logits.shape[1]
    out = np.zeros((n, H) + vals.shape[2:], np.float64)
    for r in range(n):
        sel = np.where(receivers == r)[0]
        if not len(sel):
            continue
        lg = logits[sel].astype(np.float64)             # [k, H]
        a = np.exp(lg - lg.max(axis=0, keepdims=True))
        a = a / a.sum(axis=0, keepdims=True)
        out[r] = np.einsum("kh,khc->hc", a, vals[sel].astype(np.float64))
    return out


def small_graph(rng, n=40, e=150):
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = rng.integers(0, n, e).astype(np.int32)
    from egc_tpu.graph.transforms import coalesce_np
    senders, receivers, _ = coalesce_np(senders, receivers, n)
    x = rng.normal(size=(n, 12)).astype(np.float32)
    g = Graph.from_coo(np.zeros((n, 1), np.float32), senders, receivers)
    return g, x, senders, receivers


def with_self_loops(senders, receivers, n):
    return (np.concatenate([senders, np.arange(n, dtype=np.int32)]),
            np.concatenate([receivers, np.arange(n, dtype=np.int32)]))


def test_gatconv_matches_numpy_oracle(rng):
    n = 40
    g, x, senders, receivers = small_graph(rng)
    H, C = 3, 8
    conv = GATConv(out_channels=C, heads=H)
    variables = conv.init(jax.random.key(1), g, jnp.asarray(x))
    got = np.asarray(conv.apply(variables, g, jnp.asarray(x)))

    p = variables["params"]
    W = np.asarray(p["lin"]["kernel"])                    # [F, H*C]
    att_src = np.asarray(p["att_src"])                    # [H, C]
    att_dst = np.asarray(p["att_dst"])
    bias = np.asarray(p["bias"])
    h = (x @ W).reshape(n, H, C)
    a_src = np.einsum("nhc,hc->nh", h, att_src)
    a_dst = np.einsum("nhc,hc->nh", h, att_dst)
    s2, r2 = with_self_loops(senders, receivers, n)       # PyG add_self_loops
    logits = leaky(a_src[s2] + a_dst[r2])
    out = softmax_weighted(logits, h[s2], s2, r2, n)
    ref = out.reshape(n, H * C) + bias
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("share_weights", [False, True])
def test_gatv2conv_matches_numpy_oracle(rng, share_weights):
    n = 40
    g, x, senders, receivers = small_graph(rng)
    H, C = 3, 8
    conv = GATv2Conv(out_channels=C, heads=H, share_weights=share_weights)
    variables = conv.init(jax.random.key(2), g, jnp.asarray(x))
    got = np.asarray(conv.apply(variables, g, jnp.asarray(x)))

    p = variables["params"]
    Wl = np.asarray(p["lin_l"]["kernel"])
    bl = np.asarray(p["lin_l"]["bias"])
    if share_weights:
        Wr, br = Wl, bl
    else:
        Wr = np.asarray(p["lin_r"]["kernel"])
        br = np.asarray(p["lin_r"]["bias"])
    att = np.asarray(p["att"])                            # [H, C]
    bias = np.asarray(p["bias"])
    hl = (x @ Wl + bl).reshape(n, H, C)
    hr = (x @ Wr + br).reshape(n, H, C)
    s2, r2 = with_self_loops(senders, receivers, n)
    z = leaky(hl[s2] + hr[r2])                            # [E2, H, C]
    logits = np.einsum("ehc,hc->eh", z, att)
    out = softmax_weighted(logits, hl[s2], s2, r2, n)     # PyG: x_j = lin_l
    ref = out.reshape(n, H * C) + bias
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_attention_dropout_semantics(rng):
    """PyG applies dropout to the NORMALIZED alphas (after softmax) with
    inverted scaling, so E_train[out] = out_eval. Also: eval ignores
    dropout entirely."""
    g, x, senders, receivers = small_graph(rng)
    H, C = 2, 6
    conv = GATConv(out_channels=C, heads=H, dropout=0.4)
    variables = conv.init(jax.random.key(3), g, jnp.asarray(x))

    out_eval = np.asarray(conv.apply(variables, g, jnp.asarray(x),
                                     train=False))
    # train=False must be deterministic and dropout-free
    out_eval2 = np.asarray(conv.apply(variables, g, jnp.asarray(x),
                                      train=False))
    np.testing.assert_array_equal(out_eval, out_eval2)

    draws = []
    for i in range(400):
        out_t = conv.apply(variables, g, jnp.asarray(x), train=True,
                           rngs={"dropout": jax.random.key(i)})
        draws.append(np.asarray(out_t))
    mean_train = np.mean(draws, axis=0)
    # inverted-dropout expectation (statistical, 400 draws)
    np.testing.assert_allclose(mean_train, out_eval, rtol=0.25, atol=0.12)
    # and individual draws differ from eval (dropout is actually applied)
    assert np.abs(draws[0] - out_eval).max() > 1e-4
