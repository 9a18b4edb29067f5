"""Data parallelism for the batched mini-graph tasks (zinc/cifar/mol/code).

Each device in the ``data`` mesh axis processes one microbatch; gradients
(and masked-BN statistics, via ``MaskedBatchNorm(axis_name=...)``) are
psum'd, so DP training reproduces single-device numerics on the equivalent
global batch exactly. New scope vs the reference (which packs independent
trials per GPU instead, SURVEY §2.4): this parallelizes a single trial.
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

try:                      # JAX >= 0.6 moved shard_map to the top level
    from jax import shard_map as _shard_map
except ImportError:       # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def stack_microbatches(batches: List[Tuple]):
    """Stack D (graph, y) microbatches into leading-axis-D pytrees."""
    graphs = [jax.tree.map(np.asarray, g) for g, _ in batches]
    ys = np.stack([np.asarray(y) for _, y in batches])
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *graphs)
    return stacked, ys


def microbatch_iter(loader: Iterable, num_devices: int) -> Iterator:
    """Group consecutive loader batches into DP steps of num_devices
    microbatches (drops a final incomplete group)."""
    group = []
    for item in loader:
        group.append(item)
        if len(group) == num_devices:
            yield stack_microbatches(group)
            group = []


def make_dp_train_step(model, loss_sum_fn: Callable, mesh, axis: str = "data"):
    """Build a jitted DP train step.

    ``loss_sum_fn(out, y, graph) -> (loss_sum, weight_sum)`` — summed (not
    averaged) so the global mean over all devices' valid elements matches
    single-device numerics regardless of per-device valid counts.
    """

    def sharded(state, graphs, ys, rng):
        graph = jax.tree.map(lambda a: a[0], graphs)   # local microbatch
        y = jax.tree.map(lambda a: a[0], ys)   # array OR pytree of labels
        rng_local = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def loss_wrapped(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                graph, train=True, rngs={"dropout": rng_local},
                mutable=["batch_stats"])
            s, c = loss_sum_fn(out, y, graph)
            s = jax.lax.psum(s, axis)
            c = jax.lax.psum(c, axis)
            return s / jnp.maximum(c, 1.0), mutated["batch_stats"]

        # NOTE: no explicit grad psum — shard_map's varying-manual-axes
        # system (check_vma=True) inserts the correct cross-device reduction
        # when differentiating the psum'd loss w.r.t. replicated params
        # (an explicit psum here would over-count by the axis size).
        (loss, bs), grads = jax.value_and_grad(
            loss_wrapped, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=bs)
        return new_state, loss

    step = _shard_map(
        sharded, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=True,
    )
    return jax.jit(step)
