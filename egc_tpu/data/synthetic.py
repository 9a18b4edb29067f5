"""Synthetic datasets mirroring the shapes/statistics of the real tasks.

The build environment has no network egress, so the real datasets (ZINC, OGB)
cannot be downloaded here. These generators produce structurally faithful
stand-ins with *learnable* targets (deterministic functions of the graph), so
end-to-end training, evaluation, search, and benchmarking can be exercised
and regression-gated. When real data is mounted under ``DATASET_LOC``, the
on-disk readers (egc_tpu.data.ondisk) take precedence.

Shapes mirrored from the reference:
- zinc:  ~23-node molecules, 28 atom types, scalar regression target
  (ZINC subset; reference ``experiments/zinc/configs.py:36-45``).
- cifar: ~117-node superpixel graphs, 5 features (3 color + 2 pos, the
  reference concatenates pos, ``experiments/cifar/configs.py:37-39``),
  10 classes, 8-NN-ish connectivity.
- molhiv: ~26-node molecules, 9 categorical atom features, binary target.
- arxiv: one full graph, 128 features, 40 classes, homophilous edges,
  train/val/test node splits.
- code:  ASTs (trees), node features (type, attr, depth), 5-token target
  sequence over a vocab (+UNK/EOS).
- mag:   like arxiv, parameterizable scale (349 classes).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from egc_tpu.graph.transforms import to_undirected_np


def _random_molecule(rng, n, num_types, extra_edge_frac=0.3):
    """Connected molecule-like graph: a ring + random chords, undirected."""
    types = rng.integers(0, num_types, n)
    ring_s = np.arange(n, dtype=np.int32)
    ring_r = (ring_s + 1) % n
    n_extra = max(int(n * extra_edge_frac), 1)
    ex_s = rng.integers(0, n, n_extra).astype(np.int32)
    ex_r = rng.integers(0, n, n_extra).astype(np.int32)
    s = np.concatenate([ring_s, ex_s])
    r = np.concatenate([ring_r, ex_r])
    keep = s != r
    s, r = to_undirected_np(s[keep], r[keep], n)
    return types, s, r


def synthetic_zinc(num_graphs=1200, seed=0, num_types=28) -> Dict[str, List[dict]]:
    rng = np.random.default_rng(seed)
    type_w = np.random.default_rng(99).normal(size=(num_types,))
    graphs = []
    for _ in range(num_graphs):
        n = int(rng.integers(10, 38))
        types, s, r = _random_molecule(rng, n, num_types)
        deg = np.zeros(n)
        np.add.at(deg, r, 1.0)
        # learnable structural target: type statistics + degree statistics
        y = float(type_w[types].mean() + 0.2 * deg.std() + 0.1 * len(s) / n)
        graphs.append({
            "nodes": types.astype(np.int32).reshape(n, 1),
            "senders": s, "receivers": r,
            "y": np.array([y], np.float32),
        })
    return _split(graphs)


def synthetic_cifar(num_graphs=900, seed=0) -> Dict[str, List[dict]]:
    rng = np.random.default_rng(seed)
    w = np.random.default_rng(7).normal(size=(5, 10))
    graphs = []
    for _ in range(num_graphs):
        n = int(rng.integers(80, 150))
        feats = rng.normal(size=(n, 5)).astype(np.float32)
        _, s, r = _random_molecule(rng, n, 2, extra_edge_frac=3.0)
        label = int(np.argmax(feats.mean(0) @ w))
        graphs.append({
            "nodes": feats, "senders": s, "receivers": r,
            "y": np.array([label], np.int32),
        })
    return _split(graphs)


def synthetic_molhiv(num_graphs=1200, seed=0) -> Dict[str, List[dict]]:
    from egc_tpu.models.encoders import ATOM_FEATURE_DIMS
    rng = np.random.default_rng(seed)
    w = np.random.default_rng(13).normal(size=(len(ATOM_FEATURE_DIMS),))
    graphs = []
    for _ in range(num_graphs):
        n = int(rng.integers(10, 40))
        feats = np.stack(
            [rng.integers(0, d, n) for d in ATOM_FEATURE_DIMS], axis=1
        ).astype(np.int32)
        _, s, r = _random_molecule(rng, n, 2)
        score = (feats.mean(0) / np.asarray(ATOM_FEATURE_DIMS)) @ w
        label = int(score > 0.0)
        graphs.append({
            "nodes": feats, "senders": s, "receivers": r,
            "y": np.array([label], np.int32),
        })
    return _split(graphs)


def synthetic_code(num_graphs=900, seed=0, vocab_size=120, seq_len=5,
                   num_types=98, num_attrs=500, max_depth=20):
    rng = np.random.default_rng(seed)
    w = np.random.default_rng(21).normal(size=(num_types, vocab_size + 2))
    graphs = []
    for _ in range(num_graphs):
        n = int(rng.integers(20, 120))
        # random tree: parent[i] < i
        parents = np.array([rng.integers(0, max(i, 1)) for i in range(1, n)],
                           dtype=np.int32)
        s = np.arange(1, n, dtype=np.int32)      # child -> parent AST edges
        r = parents
        depth = np.zeros(n, np.int32)
        for i in range(1, n):
            depth[i] = depth[parents[i - 1]] + 1
        types = rng.integers(0, num_types, n).astype(np.int32)
        attrs = rng.integers(0, num_attrs, n).astype(np.int32)
        # learnable target: tokens from type histogram statistics
        hist = np.bincount(types, minlength=num_types).astype(np.float64)
        logits = hist @ w
        tokens = np.argsort(-logits)[:seq_len].astype(np.int32)
        graphs.append({
            "nodes": np.stack([types, attrs,
                               np.minimum(depth, max_depth)], 1),
            "senders": s, "receivers": r,
            "y": tokens,
        })
    return _split(graphs)


def synthetic_full_graph(num_nodes=4000, avg_degree=12, num_classes=40,
                         num_features=128, homophily=0.7, seed=0):
    """Homophilous citation-style graph (arxiv/mag stand-in), undirected."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, num_nodes).astype(np.int32)
    mu = rng.normal(size=(num_classes, num_features)).astype(np.float32)
    x = (mu[labels] + 0.8 * rng.normal(size=(num_nodes, num_features))
         ).astype(np.float32)
    num_edges = num_nodes * avg_degree // 2
    src = rng.integers(0, num_nodes, num_edges).astype(np.int32)
    # homophilous destination choice
    same = rng.random(num_edges) < homophily
    dst = np.where(
        same,
        _same_class_partner(rng, labels, src, num_classes),
        rng.integers(0, num_nodes, num_edges).astype(np.int32),
    ).astype(np.int32)
    keep = src != dst
    s, r = to_undirected_np(src[keep], dst[keep], num_nodes)

    idx = rng.permutation(num_nodes)
    n_tr, n_va = int(0.6 * num_nodes), int(0.2 * num_nodes)
    return {
        "x": x, "y": labels, "senders": s, "receivers": r,
        "train_idx": np.sort(idx[:n_tr]),
        "val_idx": np.sort(idx[n_tr:n_tr + n_va]),
        "test_idx": np.sort(idx[n_tr + n_va:]),
        "num_classes": num_classes,
    }


def _same_class_partner(rng, labels, src, num_classes):
    """For each source node, a random node of the same class."""
    order = np.argsort(labels, kind="stable")
    sorted_labels = labels[order]
    starts = np.searchsorted(sorted_labels, np.arange(num_classes), "left")
    ends = np.searchsorted(sorted_labels, np.arange(num_classes), "right")
    c = labels[src]
    span = np.maximum(ends[c] - starts[c], 1)
    pick = starts[c] + (rng.random(len(src)) * span).astype(np.int64)
    return order[np.minimum(pick, len(order) - 1)]


def _split(graphs, frac_train=0.7, frac_val=0.15):
    n = len(graphs)
    n_tr, n_va = int(n * frac_train), int(n * frac_val)
    return {
        "train": graphs[:n_tr],
        "val": graphs[n_tr:n_tr + n_va],
        "test": graphs[n_tr + n_va:],
    }
