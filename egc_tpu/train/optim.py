"""Optimizer + LR scheduling matching the reference's training dynamics.

- torch ``Adam(lr, weight_decay)`` (reference ``experiments/zinc/configs.py:129``)
  = L2 penalty added to the gradient BEFORE the Adam moments (not AdamW), so
  the optax chain is add_decayed_weights -> scale_by_adam -> scale(-lr).
- torch ``ReduceLROnPlateau(mode, factor=0.5, patience=10, min_lr=1e-5)``
  (reference ``experiments/exp_config.py:24-29`` and per-task overrides):
  relative threshold 1e-4, cooldown 0. Reproduced as a small pure state
  machine updated host-side after each validation; the live learning rate is
  a leaf of the optax state (via ``optax.inject_hyperparams``) so changing it
  does NOT retrigger XLA compilation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import optax


def make_optimizer(learning_rate: float, weight_decay: float = 0.0,
                   b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """torch.optim.Adam parity (weight decay as L2-into-grad)."""

    def opt(learning_rate):
        parts = []
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
        parts.append(optax.scale(-learning_rate))
        return optax.chain(*parts)

    return optax.inject_hyperparams(opt)(learning_rate=learning_rate)


def get_lr(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def set_lr(opt_state, lr: float):
    opt_state.hyperparams["learning_rate"] = jnp.asarray(
        lr, opt_state.hyperparams["learning_rate"].dtype)
    return opt_state


class PlateauState(NamedTuple):
    """torch ReduceLROnPlateau state (host-side scalars)."""

    lr: float
    best: float
    num_bad: int
    mode: str = "min"
    factor: float = 0.5
    patience: int = 10
    min_lr: float = 1e-5
    threshold: float = 1e-4


def plateau_init(lr: float, mode: str = "min", factor: float = 0.5,
                 patience: int = 10, min_lr: float = 1e-5) -> PlateauState:
    best = float("inf") if mode == "min" else float("-inf")
    return PlateauState(lr=lr, best=best, num_bad=0, mode=mode,
                        factor=factor, patience=patience, min_lr=min_lr)


def plateau_update(state: PlateauState, metric: float) -> PlateauState:
    """One validation-step update; returns state with possibly reduced lr."""
    # torch 'rel' threshold_mode: min -> metric < best * (1 - eps);
    # max -> metric > best * (1 + eps). First observation always improves.
    if state.mode == "min":
        improved = True if state.best == float("inf") else \
            metric < state.best * (1 - state.threshold)
    else:
        improved = True if state.best == float("-inf") else \
            metric > state.best * (1 + state.threshold)

    if improved:
        return state._replace(best=metric, num_bad=0)
    num_bad = state.num_bad + 1
    if num_bad > state.patience:
        new_lr = max(state.lr * state.factor, state.min_lr)
        return state._replace(lr=new_lr, num_bad=0)
    return state._replace(num_bad=num_bad)
