"""Observability: structured metric logging + throughput counters.

The reference logs plain metric dicts to stdout and leans on Ray dashboards
(SURVEY §5). Here: a JSONL logger (one metric row per line, machine
readable) and a throughput meter that turns step timings into the
framework's north-star counter (edges/s/chip).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Optional


class JSONLLogger:
    """Append-only JSONL metric log (one dict per line, ts auto-added)."""

    def __init__(self, path, echo: bool = False):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.echo = echo
        self._fh = open(self.path, "a")

    def log(self, row: Dict[str, Any]):
        row = {"ts": time.time(), **row}
        self._fh.write(json.dumps(row, default=float) + "\n")
        self._fh.flush()
        if self.echo:
            print(" ".join(f"{k}={v}" for k, v in row.items()
                           if k != "ts"))

    def close(self):
        self._fh.close()


class ThroughputMeter:
    """Step-time -> edges/s / nodes/s counters with warmup skip."""

    def __init__(self, edges_per_step: int, nodes_per_step: int = 0,
                 warmup: int = 1):
        self.edges = edges_per_step
        self.nodes = nodes_per_step
        self.warmup = warmup
        self._steps = 0
        self._t0: Optional[float] = None
        self._elapsed = 0.0

    def step_start(self):
        self._t0 = time.time()

    def step_end(self):
        dt = time.time() - self._t0
        self._steps += 1
        if self._steps > self.warmup:
            self._elapsed += dt
        return dt

    @property
    def counted_steps(self) -> int:
        return max(self._steps - self.warmup, 0)

    def summary(self) -> Dict[str, float]:
        n = self.counted_steps
        if n == 0 or self._elapsed == 0:
            return {}
        per_step = self._elapsed / n
        out = {"step_time_s": per_step,
               "edges_per_s": self.edges / per_step}
        if self.nodes:
            out["nodes_per_s"] = self.nodes / per_step
        return out
