"""Jitted train/eval step builders + host-side epoch drivers.

Mirrors the reference's per-epoch contract (reference
``experiments/zinc/configs.py:53-90``): ``train_epoch`` returns
``{"train_loss": mean}``, ``eval_epoch`` returns collected outputs for metric
computation. The step compiles once (static batch shapes from GraphLoader).
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp

from egc_tpu.graph.structure import Graph
from egc_tpu.train.state import TrainState


def make_train_step(model, loss_fn: Callable):
    """loss_fn(out, y, graph) -> scalar loss (must respect masks)."""

    @jax.jit
    def step(state: TrainState, graph: Graph, y, rng):
        def loss_wrapped(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                graph, train=True, rngs={"dropout": rng},
                mutable=["batch_stats"])
            return loss_fn(out, y, graph), \
                mutated.get("batch_stats", state.batch_stats)

        (loss, bs), grads = jax.value_and_grad(
            loss_wrapped, has_aux=True)(state.params)
        return state.apply_gradients(grads, new_batch_stats=bs), loss

    return step


def make_eval_step(model):
    @jax.jit
    def step(state: TrainState, graph: Graph):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            graph, train=False)

    return step


def train_epoch(step_fn, state: TrainState, loader: Iterable, rng):
    """One pass over the loader; returns (state, mean masked loss).

    Losses stay on device until the epoch ends — a per-batch ``float()``
    would sync the host to every step and serialize the input pipeline
    against device execution (loader prefetch threads rely on async
    dispatch)."""
    losses = []
    for i, (graph, y) in enumerate(loader):
        graph = jax.tree.map(jnp.asarray, graph)
        y = jnp.asarray(y)
        state, loss = step_fn(state, graph, y, jax.random.fold_in(rng, i))
        losses.append(loss)
    if not losses:
        return state, 0.0
    return state, float(jnp.mean(jnp.stack(losses)))


def eval_epoch(eval_fn, state: TrainState, loader: Iterable,
               collect: Optional[Callable] = None):
    """Runs eval over the loader, returning host-side (outputs, ys, masks).

    ``collect(out, y, graph) -> Any`` customizes what is brought to host;
    default returns (out, y, graph_mask) triples.
    """
    results = []
    for graph, y in loader:
        graph = jax.tree.map(jnp.asarray, graph)
        out = eval_fn(state, graph)
        if collect is not None:
            results.append(collect(out, y, graph))
        else:
            results.append((jax.device_get(out), y,
                            jax.device_get(graph.graph_mask)))
    return results
