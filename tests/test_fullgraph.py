"""Full-graph (transductive) training tests on synthetic homophilous graphs."""

import numpy as np

from egc_tpu.data import synthetic
from egc_tpu.exp.fullgraph import ArxivConfig, MagConfig
from egc_tpu.exp.runner import run_trial


def test_arxiv_egc_trains():
    cfg = ArxivConfig("egc", hidden=32, heads=4, bases=4,
                      aggrs=("symnorm", "max", "mean"))
    cfg.load_full_graph = lambda: synthetic.synthetic_full_graph(
        num_nodes=600, avg_degree=8, num_classes=8, num_features=32, seed=1)
    hp = {"lr": 0.01, "wd": 0.0, "dropout": 0.1}
    res = run_trial(cfg, hp, seed=0, max_iterations=30, patience=50,
                    verbose=False)
    accs = [h["val_acc"] for h in res["history"]]
    assert max(accs) > 0.5, accs           # 8 classes, homophilous
    assert res["test"]["test_acc"] > 0.4


def test_mag_net_smoke():
    cfg = MagConfig("egc", hidden=32, heads=8, bases=4, aggrs=("symnorm",))
    cfg.load_full_graph = lambda: synthetic.synthetic_full_graph(
        num_nodes=500, avg_degree=6, num_classes=349, num_features=128,
        seed=2)
    hp = {"lr": 0.01, "wd": 0.0, "dropout": 0.2}
    res = run_trial(cfg, hp, seed=0, max_iterations=3, patience=50,
                    verbose=False)
    assert len(res["history"]) == 3
    assert np.isfinite(res["history"][-1]["train_loss"])
