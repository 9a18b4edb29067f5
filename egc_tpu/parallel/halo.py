"""Device-side halo exchange + partitioned full-graph training.

Per layer, each device refreshes its halo slots (features of remote sender
nodes) with ONE ``all_to_all`` over the ``graph`` mesh axis, then runs the
ordinary local aggregation — the convs themselves are unchanged; they see an
extended Graph whose senders index ``[owned | halo]`` rows. Combined with
psum'd gradients and sync-BN (global statistics), a partitioned step
reproduces single-device numerics exactly (tested by
tests/test_partition.py equivalence gates).

This is the tensor/sequence-parallel analog for GNNs described in SURVEY
§2.4 / §5 ("edge-partitioned full-graph training with per-layer halo
exchange"); the reference has no distributed layer at all.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax.sharding import PartitionSpec as P

from egc_tpu.graph.structure import Graph
from egc_tpu.models.nets import ConvSpec, _torch_dense
from egc_tpu.nn import MaskedBatchNorm
from egc_tpu.train.state import TrainState

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def halo_refresh(x_ext, send_idx, axis: str = "graph"):
    """Refresh halo rows from their owners.

    x_ext: [n_local + P*H, F] extended features (this device);
    send_idx: [P, H] local indices this device sends to each peer.
    Must run inside shard_map over ``axis`` with P devices.
    """
    num_parts, H = send_idx.shape
    n_local = x_ext.shape[0] - num_parts * H
    send = jnp.take(x_ext[:n_local], send_idx, axis=0)     # [P, H, F]
    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0)
    return x_ext.at[n_local:].set(recv.reshape(num_parts * H, -1))


class DistributedNodeClassifier(nn.Module):
    """ArxivNet/MagNet-shaped net over a partitioned graph.

    Identical math to the single-device nets (embed -> L x [conv BN ReLU
    drop +res] -> out Linear -> log_softmax), with a halo refresh after the
    embedding and after every block, and sync-BN over the mesh axis.
    """

    conv: ConvSpec
    hidden_dim: int
    num_layers: int = 3
    dropout: float = 0.5
    residual: bool = True
    num_features: int = 128
    num_classes: int = 40
    axis: str = "graph"
    use_embed: bool = True

    @nn.compact
    def __call__(self, g: Graph, send_idx, *, train: bool):
        refresh = lambda h: halo_refresh(h, send_idx, self.axis)  # noqa: E731
        x = g.nodes
        if self.use_embed:
            x = _torch_dense(self.hidden_dim, self.num_features,
                             name="embed")(x)
        x = refresh(x)
        for i in range(self.num_layers):
            identity = x
            x = self.conv.build(self.hidden_dim, i, self.num_layers)(
                g, x, train=train)
            x = MaskedBatchNorm(axis_name=self.axis)(
                x, g.node_mask, use_running_average=not train)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            if self.residual:
                x = x + identity
            x = refresh(x)
        x = _torch_dense(self.num_classes, self.hidden_dim, name="out")(x)
        return nn.log_softmax(x, axis=-1)


def init_partitioned(model, mesh, graphs, send_idx, rng,
                     axis: str = "graph"):
    """Initialize a distributed model's variables inside the mesh context
    (the forward pass contains collectives, so a bare ``model.init`` outside
    shard_map would fail with an unbound axis name)."""

    def sharded(graphs_, sidx):
        graph = jax.tree.map(lambda a: a[0], graphs_)
        return model.init(rng, graph, sidx[0], train=False)

    fn = _shard_map(sharded, mesh=mesh,
                    in_specs=(P(axis), P(axis)), out_specs=P(),
                    check_vma=True)
    return jax.jit(fn)(graphs, send_idx)


def make_partitioned_train_step(model, mesh, axis: str = "graph"):
    """Jitted partitioned full-graph train step.

    Inputs (stacked leading partition axis, sharded over ``axis``):
    graph (extended local Graph), send_idx [P, P, H], labels [P, n_local],
    train_mask [P, n_local]; state replicated. NLL loss over global train
    nodes; gradients psum'd.
    """

    def sharded(state, graphs, send_idx, labels, train_mask, rng):
        graph = jax.tree.map(lambda a: a[0], graphs)
        sidx = send_idx[0]
        y = labels[0]
        mask = train_mask[0]
        rng_local = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def loss_wrapped(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                graph, sidx, train=True, rngs={"dropout": rng_local},
                mutable=["batch_stats"])
            n_local = y.shape[0]
            nll = -jnp.take_along_axis(
                out[:n_local], y[:, None].astype(jnp.int32), axis=1
            ).reshape(-1)
            m = mask.astype(out.dtype)
            s = jax.lax.psum(jnp.sum(nll * m), axis)
            c = jax.lax.psum(jnp.sum(m), axis)
            return s / jnp.maximum(c, 1.0), mutated["batch_stats"]

        # NOTE: no explicit grad psum — see dp.py note (check_vma handles
        # the cross-device reduction in the transpose).
        (loss, bs), grads = jax.value_and_grad(
            loss_wrapped, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_batch_stats=bs), loss

    step = _shard_map(
        sharded, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=True,
    )
    return jax.jit(step)


def make_partitioned_eval_step(model, mesh, axis: str = "graph"):
    """Returns per-partition log-probs [P, n_ext, C] (owned rows valid)."""

    def sharded(state, graphs, send_idx):
        graph = jax.tree.map(lambda a: a[0], graphs)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            graph, send_idx[0], train=False)
        return out[None]

    step = _shard_map(
        sharded, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=True,
    )
    return jax.jit(step)
