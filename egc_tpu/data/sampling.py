"""Neighbor-sampled mini-batch loader for MAG-scale graphs.

New scope vs the reference (which trains ogbn-mag full-graph on one GPU,
SURVEY §2.4 "sampling parallelism"): GraphSAGE-style layered neighbor
sampling so graphs that exceed chip memory train on padded, static-shape
subgraph batches. Each batch:

- seeds: ``batch_size`` target nodes (loss is computed on these only);
- per hop k, up to ``fanouts[k]`` in-neighbors of the current frontier are
  sampled; sampled edges point INTO the frontier (message flow matches
  full-graph training);
- the subgraph is padded to the static worst-case budget so the train step
  compiles once.

Shard seeds across hosts/devices for distributed sampling-parallel training
(each device consumes its own seed stream; gradients psum — the DP path).
"""

from __future__ import annotations

from typing import Iterator, Sequence, Tuple

import numpy as np

from egc_tpu.graph.structure import Graph, pad_graph


class NeighborSampler:
    """Layered in-neighbor sampler over a static COO graph."""

    def __init__(self, senders: np.ndarray, receivers: np.ndarray,
                 num_nodes: int, fanouts: Sequence[int] = (10, 5),
                 seed: int = 0):
        self.num_nodes = num_nodes
        self.fanouts = tuple(fanouts)
        order = np.argsort(receivers, kind="stable")
        self._in_senders = senders[order].astype(np.int64)
        self._rowptr = np.searchsorted(receivers[order],
                                       np.arange(num_nodes + 1))
        self._rng = np.random.default_rng(seed)

    def budgets(self, batch_size: int) -> Tuple[int, int]:
        """Worst-case (nodes, edges) for a batch (before padding multiples)."""
        nodes, frontier, edges = batch_size, batch_size, 0
        for f in self.fanouts:
            edges += frontier * f
            frontier = frontier * f
            nodes += frontier
        return nodes + 1, edges

    def sample(self, seeds: np.ndarray):
        """Returns (global_node_ids, senders_local, receivers_local,
        seed_count) — seeds occupy local slots [0, len(seeds))."""
        local = {int(g): i for i, g in enumerate(seeds)}
        node_ids = list(map(int, seeds))
        s_loc, r_loc = [], []
        frontier = list(map(int, seeds))
        for fanout in self.fanouts:
            next_frontier = []
            for v in frontier:
                lo, hi = self._rowptr[v], self._rowptr[v + 1]
                deg = hi - lo
                if deg == 0:
                    continue
                if deg <= fanout:
                    picks = self._in_senders[lo:hi]
                else:
                    picks = self._in_senders[
                        lo + self._rng.choice(deg, fanout, replace=False)]
                for u in map(int, picks):
                    if u not in local:
                        local[u] = len(node_ids)
                        node_ids.append(u)
                        next_frontier.append(u)
                    s_loc.append(local[u])
                    r_loc.append(local[v])
            frontier = next_frontier
        return (np.asarray(node_ids, np.int64),
                np.asarray(s_loc, np.int32), np.asarray(r_loc, np.int32),
                len(seeds))


class SampledNodeLoader:
    """Yields padded subgraph batches (Graph, y, seed_mask) for node
    classification over seed splits."""

    def __init__(self, sampler: NeighborSampler, x: np.ndarray,
                 y: np.ndarray, seed_ids: np.ndarray, batch_size: int,
                 *, shuffle: bool = True, rng_seed: int = 0):
        self.sampler = sampler
        self.x, self.y = x, y
        self.seed_ids = np.asarray(seed_ids)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rng = np.random.default_rng(rng_seed)
        n_budget, e_budget = sampler.budgets(batch_size)
        self.node_budget = ((n_budget + 7) // 8) * 8
        self.edge_budget = ((e_budget + 127) // 128) * 128

    def __len__(self):
        return (len(self.seed_ids) + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator:
        order = self.seed_ids.copy()
        if self.shuffle:
            self._rng.shuffle(order)
        for i in range(0, len(order), self.batch_size):
            seeds = order[i:i + self.batch_size]
            gids, s, r, n_seed = self.sampler.sample(seeds)
            g = Graph.from_coo(self.x[gids], s, r)
            g = pad_graph(g, num_nodes=self.node_budget,
                          num_edges=self.edge_budget)
            y = np.zeros(self.node_budget, self.y.dtype)
            y[:len(gids)] = self.y[gids]
            seed_mask = np.zeros(self.node_budget, bool)
            seed_mask[:n_seed] = True
            yield g, y, seed_mask
