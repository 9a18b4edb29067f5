"""Checkpoint persist/restore — the reference's ``persist_trial`` /
``restore_trial`` contract (reference ``experiments/exp_config.py:31-53``):
{model, opt, lr_scheduler, hparams} saved per trial directory.

Implementation: flax msgpack serialization for the array pytrees + JSON for
hparams/scheduler scalars. Layout-stable: restoring only needs a template
state with matching tree structure (mesh-sharded states restore by replacing
leaves, so the same file works across device topologies).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
from flax import serialization

from egc_tpu.train.optim import PlateauState


def save_checkpoint(ckpt_dir, *, state, plateau: Optional[PlateauState] = None,
                    hparams: Optional[Dict[str, Any]] = None,
                    extra: Optional[Dict[str, Any]] = None) -> Path:
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    payload = {
        "params": serialization.to_state_dict(jax.device_get(state.params)),
        "batch_stats": serialization.to_state_dict(
            jax.device_get(state.batch_stats)),
        "opt_state": serialization.to_state_dict(
            jax.device_get(state.opt_state)),
        "step": jax.device_get(state.step),
    }
    (ckpt_dir / "checkpoint.msgpack").write_bytes(
        serialization.msgpack_serialize(payload))
    meta = {
        "hparams": hparams or {},
        "plateau": list(plateau) if plateau is not None else None,
        "extra": extra or {},
    }
    (ckpt_dir / "checkpoint.json").write_text(json.dumps(meta, default=float))
    return ckpt_dir / "checkpoint.msgpack"


def load_checkpoint(ckpt_dir, *, state_template):
    """Restore (state, plateau, hparams) from a trial directory.

    ``state_template`` is a freshly-created TrainState with the right tree
    structure (reference restore rebuilds model+opt then loads state dicts,
    ``experiments/zinc/configs.py:165-180`` — same flow here).
    """
    ckpt_dir = Path(ckpt_dir)
    raw = serialization.msgpack_restore(
        (ckpt_dir / "checkpoint.msgpack").read_bytes())
    state = state_template.replace(
        params=serialization.from_state_dict(state_template.params,
                                             raw["params"]),
        batch_stats=serialization.from_state_dict(state_template.batch_stats,
                                                  raw["batch_stats"]),
        opt_state=serialization.from_state_dict(state_template.opt_state,
                                                raw["opt_state"]),
        step=int(raw["step"]),
    )
    meta = json.loads((ckpt_dir / "checkpoint.json").read_text())
    plateau = None
    if meta.get("plateau") is not None:
        vals = meta["plateau"]
        plateau = PlateauState(lr=vals[0], best=vals[1], num_bad=int(vals[2]),
                               mode=vals[3], factor=vals[4],
                               patience=int(vals[5]), min_lr=vals[6],
                               threshold=vals[7])
    return state, plateau, meta.get("hparams", {})
