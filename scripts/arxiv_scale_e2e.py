#!/usr/bin/env python
"""End-to-end harness check at REAL arxiv scale on TPU: CLI-shaped config,
fused kernels, h136 (the reference's tuned width), plateau + checkpoint."""
import time
import numpy as np
from egc_tpu.exp.fullgraph import ArxivConfig
from egc_tpu.exp.runner import run_trial
from egc_tpu.data import synthetic

cfg = ArxivConfig("egc", hidden=136, heads=4, bases=4,
                  aggrs=("symnorm", "max", "mean"))
cfg.synthetic = True
cfg.load_full_graph = lambda: synthetic.synthetic_full_graph(
    num_nodes=169_343, avg_degree=14, num_classes=40, num_features=128,
    seed=0)
t0 = time.time()
res = run_trial(cfg, {"lr": 0.01, "wd": 0.0, "dropout": 0.1},
                seed=0, max_iterations=30, patience=100, verbose=False)
dt = time.time() - t0
accs = [h["val_acc"] for h in res["history"]]
print(f"30 full-graph epochs at arxiv scale (h136): {dt:.1f}s "
      f"({dt/30:.2f}s/epoch incl eval)")
print(f"val_acc first={accs[0]:.3f} best={max(accs):.3f} "
      f"test={res['test']['test_acc']:.3f}")
assert max(accs) > 0.9, accs
print("E2E OK")
