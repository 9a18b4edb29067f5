"""Host-side batched graph loader with static padding budgets.

Replaces the reference's PyG ``DataLoader(batch_size=...)`` (reference
``experiments/zinc/configs.py:36-45``). TPU twist: every batch is padded to
the SAME (num_nodes, num_edges, num_graphs) budget so the train step compiles
exactly once. The final short batch of an epoch is padded with empty graph
slots rather than dropped (step-count parity with the reference's loader).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from egc_tpu.graph.structure import Graph, batch_np


def padding_budget(
    graphs: Sequence[dict],
    batch_size: int,
    *,
    node_multiple: int = 8,
    edge_multiple: int = 128,
) -> Tuple[int, int, int]:
    """Static (nodes, edges, graphs) budget covering any batch of the dataset.

    Worst-case-exact for heavy-tailed size distributions: any batch of
    ``batch_size`` graphs is bounded by the ``batch_size`` LARGEST graphs
    (much tighter than batch_size * max for e.g. code2 ASTs), plus pad
    slots, rounded to hardware-friendly multiples.
    """
    node_counts = sorted(int(np.asarray(g["nodes"]).shape[0])
                         for g in graphs)
    edge_counts = sorted(len(g["senders"]) for g in graphs)

    def round_up(x, m):
        return ((x + m - 1) // m) * m

    num_nodes = round_up(sum(node_counts[-batch_size:]) + 1, node_multiple)
    num_edges = round_up(max(sum(edge_counts[-batch_size:]), 1),
                         edge_multiple)
    return num_nodes, num_edges, batch_size + 1


class GraphLoader:
    """Iterates fixed-shape padded batches over a list of graph dicts."""

    def __init__(
        self,
        graphs: List[dict],
        batch_size: int,
        *,
        shuffle: bool = False,
        seed: int = 0,
        budget: Optional[Tuple[int, int, int]] = None,
        drop_last: bool = False,
    ):
        self.graphs = graphs
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self.budget = budget or padding_budget(graphs, batch_size)
        self.drop_last = drop_last
        # eval loaders iterate the identical batches every epoch: build once
        self._cache = None if shuffle else []

    def __len__(self) -> int:
        n = len(self.graphs)
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Tuple[Graph, np.ndarray]]:
        if self._cache:
            yield from self._cache
            return
        order = np.arange(len(self.graphs))
        if self.shuffle:
            self._rng.shuffle(order)
        bn, be, bg = self.budget
        for start in range(0, len(order), self.batch_size):
            idx = order[start:start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                break
            batch = [self.graphs[i] for i in idx]
            item = batch_np(batch, num_nodes=bn, num_edges=be, num_graphs=bg)
            if self._cache is not None:
                self._cache.append(item)
            yield item
