"""Multi-process (2-host stand-in) jax.distributed bring-up gate.

Runs scripts/multihost_smoke.py as a subprocess fleet: two OS processes x
4 virtual CPU devices wired by ``jax.distributed.initialize`` (Gloo), one
global-mesh psum plus one DP train step AND one graph-partitioned train
step (halo all_to_all) with per-process shards. Both losses must equal
the single-process 8-device run's (same seeds) — the cross-process
collective path changes nothing numerically.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run(args, env):
    res = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "multihost_smoke.py"),
         *args],
        env=env, capture_output=True, text=True, timeout=560)
    assert res.returncode == 0, res.stdout + res.stderr
    line = [ln for ln in res.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def test_multihost_smoke_two_processes():
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["EGC_TPU_SMOKE_PORT"] = "43911"   # avoid clashing with manual runs
    # the launcher/workers override platform + device count themselves.
    # Reference = the SAME DP step in one process owning all 8 virtual
    # devices (computed fresh, not a frozen constant, so a jax/XLA bump
    # that reorders float reductions can't false-fail the gate).
    ref = _run(["--reference"], env)
    out = _run([], env)
    assert out["ok"] is True
    assert out["psum"] == 8.0
    assert abs(out["loss"] - ref["loss"]) < 1e-6, (out, ref)
    # graph-partitioned step (halo all_to_all over Gloo) reproduces the
    # single-process mesh numerics too (VERDICT r4 item 7)
    assert abs(out["ploss"] - ref["ploss"]) < 1e-6, (out, ref)
