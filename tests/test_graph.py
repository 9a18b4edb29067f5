"""Graph container, padding and batching tests."""

import numpy as np
import pytest

from egc_tpu.graph import Graph, pad_graph, batch_np
from egc_tpu.graph.transforms import (
    coalesce_np, remove_self_loops_np, to_undirected_np,
)


def small_graph(n=4, f=3, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "nodes": rng.normal(size=(n, f)).astype(np.float32),
        "senders": np.array([0, 1, 2], dtype=np.int32),
        "receivers": np.array([1, 2, 3], dtype=np.int32),
        "y": np.array([1.0], dtype=np.float32),
    }


def test_batch_and_pad():
    g1, g2 = small_graph(4), small_graph(3, seed=1)
    g2["senders"], g2["receivers"] = g2["senders"][:2], g2["receivers"][:2]
    g, y = batch_np([g1, g2], num_nodes=10, num_edges=8, num_graphs=4)
    assert g.num_nodes == 10 and g.num_edges == 8 and g.num_graphs == 4
    assert g.node_mask.sum() == 7 and g.edge_mask.sum() == 5
    assert g.graph_mask.sum() == 2
    # offsets applied: second graph's edges land in [4, 7)
    assert g.senders[3] == 4 and g.receivers[3] == 5
    # padding edges point at the padding node
    assert (g.senders[5:] == 9).all() and (g.receivers[5:] == 9).all()
    # padded nodes belong to the last graph slot
    assert (g.graph_ids[7:] == 3).all()
    assert y.shape == (4, 1) and y[0, 0] == 1.0 and (y[2:] == 0).all()


def test_batch_requires_padding_slots():
    g1 = small_graph()
    with pytest.raises(ValueError):
        batch_np([g1], num_nodes=8, num_edges=6, num_graphs=1)
    with pytest.raises(ValueError):  # padding edges but no padding node
        batch_np([g1], num_nodes=4, num_edges=6, num_graphs=2)


def test_transforms():
    s = np.array([0, 1, 1, 2, 2], dtype=np.int32)
    r = np.array([0, 2, 2, 1, 0], dtype=np.int32)
    s2, r2 = remove_self_loops_np(s, r)
    assert len(s2) == 4 and not (s2 == r2).any()
    s3, r3, _ = coalesce_np(s2, r2, 3)
    assert len(s3) == 3  # duplicate (1->2) dropped
    # sorted by receiver
    assert (np.diff(r3) >= 0).all()
    s4, r4 = to_undirected_np(s3, r3, 3)
    pairs = set(zip(s4.tolist(), r4.tolist()))
    assert pairs == {(1, 2), (2, 1), (2, 0), (0, 2)}


def test_from_coo():
    g = Graph.from_coo(
        np.zeros((5, 2), np.float32),
        np.array([0, 1], np.int32), np.array([1, 2], np.int32))
    assert g.num_graphs == 1 and g.node_mask.all() and g.edge_mask.all()
    padded = pad_graph(g, num_nodes=8, num_edges=4)
    assert padded.num_nodes == 8 and padded.senders[-1] == 7
