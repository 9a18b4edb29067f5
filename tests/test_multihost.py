"""Multi-process (2-host stand-in) jax.distributed bring-up gate.

Runs scripts/multihost_smoke.py as a subprocess fleet: two OS processes x
4 virtual CPU devices wired by ``jax.distributed.initialize`` (Gloo), one
global-mesh psum plus one DP train step with per-process shards. The DP
loss must equal the single-process 8-device dryrun's (same seeds) — the
cross-process collective path changes nothing numerically.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_multihost_smoke_two_processes():
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["EGC_TPU_SMOKE_PORT"] = "43911"   # avoid clashing with manual runs
    # the launcher/workers override platform + device count themselves
    res = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "multihost_smoke.py")],
        env=env, capture_output=True, text=True, timeout=560)
    assert res.returncode == 0, res.stdout + res.stderr
    line = [ln for ln in res.stdout.splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    assert out["ok"] is True
    assert out["psum"] == 8.0
    # bit-identical to the single-process 8-device DP dryrun (same seeds,
    # same microbatches): __graft_entry__.dryrun_multichip prints 0.4088
    assert abs(out["loss"] - 0.40880119800567627) < 1e-6
