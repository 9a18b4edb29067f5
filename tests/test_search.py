"""Search strategies, pruner, and parallel trial runner tests."""

import numpy as np

from egc_tpu.data import synthetic
from egc_tpu.exp.batched import ZincConfig
from egc_tpu.exp.hyperparams import (
    ChoiceHyperParam, LogUniformHyperParam, UniformHyperParam,
)
from egc_tpu.exp.search import (
    RandomSearchStrategy, GridSearchStrategy, AsyncHyperBandPruner,
    run_search,
)


def tiny_zinc_config():
    cfg = ZincConfig("egc", hidden=16, heads=2, bases=2, aggrs=("symnorm",),
                     num_layers=1)
    cfg.load_graphs = lambda: synthetic.synthetic_zinc(num_graphs=80)
    return cfg


def test_strategies_generate():
    space = {
        "lr": LogUniformHyperParam(1e-4, 1e-2, default=1e-3),
        "bs": ChoiceHyperParam([32, 64]),
        "u": UniformHyperParam(0.0, 1.0),
    }
    rng = np.random.default_rng(0)
    rand = RandomSearchStrategy(7).generate(space, rng)
    assert len(rand) == 7
    assert all(1e-4 <= hp["lr"] <= 1e-2 for hp in rand)
    grid = GridSearchStrategy({"lr": 3, "bs": 2}).generate(space, rng)
    assert len(grid) == 6  # 3 lr x 2 bs x 1 default u
    assert all(hp["u"] == 0.5 for hp in grid)


def test_pruner_prunes_bad_trials():
    pruner = AsyncHyperBandPruner("min", grace_period=5, reduction_factor=2,
                                  max_t=40)
    # good trials reaching the rung, then a bad one
    for v in (0.1, 0.2, 0.3):
        pruner.start_trial()
        pruner(5, v)
    pruner.start_trial()
    assert pruner(3, 5.0) is False      # not a rung iteration
    assert pruner(5, 5.0) is True       # clearly below the median cutoff


def test_pruner_uses_best_so_far():
    # AsyncHyperBand compares each trial's BEST-so-far at the rung: a trial
    # that already achieved a good score is kept even if the rung-iteration
    # value regressed
    pruner = AsyncHyperBandPruner("min", grace_period=5, reduction_factor=2,
                                  max_t=40)
    for v in (0.2, 0.3, 0.4):
        pruner.start_trial()
        pruner(5, v)
    pruner.start_trial()
    pruner(2, 0.05)                      # early good score
    assert pruner(5, 9.9) is False       # regressed at rung, best-so-far ok


def test_run_search_small(tmp_path):
    cfg = tiny_zinc_config()
    best = run_search(cfg, tmp_path, strategy=RandomSearchStrategy(2),
                      use_pruner=False, verbose=False)
    assert "lr" in best
    assert (tmp_path / "search_results.json").exists()


def _zinc_factory():
    return tiny_zinc_config()


def test_parallel_search(tmp_path):
    from egc_tpu.exp.parallel_search import run_search_parallel
    candidates = [{"lr": 1e-3, "batch_size": 32, "wd": 0.0},
                  {"lr": 5.0, "batch_size": 32, "wd": 0.0}]  # 2nd diverges
    best = run_search_parallel(
        ("tests.test_search", "_zinc_factory", (), {}),
        candidates, metric_mode="min", metric_name="val_loss",
        num_workers=2, exp_dir=tmp_path, max_iterations=3)
    assert best["lr"] == 1e-3
    assert (tmp_path / "search_results.json").exists()


# ---------------------------------------------------------------------------
# cross-worker pruning (VERDICT r2 item 5): shared rung table, decisions
# match the sequential pruner on a fixed candidate set
# ---------------------------------------------------------------------------

CANDIDATES = [{"lr": 1e-3, "batch_size": 32, "wd": 0.0},
              {"lr": 8e-4, "batch_size": 32, "wd": 0.0},
              {"lr": 9.0, "batch_size": 32, "wd": 0.0}]   # diverges


def _fast_pruner():
    return AsyncHyperBandPruner("min", grace_period=2, reduction_factor=2,
                                max_t=8)


def _zinc_factory_pruned():
    from egc_tpu.exp.config import StopperSpec
    cfg = tiny_zinc_config()
    cfg.trial_scheduler = _fast_pruner
    # identical iteration caps for the sequential path (which reads
    # stoppers()) and the parallel path (max_iterations=8 below)
    cfg.stoppers = lambda: StopperSpec(patience=8, max_iters=8)
    return cfg


def test_parallel_pruning_matches_sequential(tmp_path):
    """With one worker (=> sequential arrival order), the shared-rung
    pruner must reproduce the in-process pruner's results exactly."""
    import json
    from egc_tpu.exp.parallel_search import run_search_parallel

    cfg = _zinc_factory_pruned()

    class FixedStrategy:
        def generate(self, space, rng):
            return [dict(c) for c in CANDIDATES]

    seq_best = run_search(cfg, tmp_path / "seq", strategy=FixedStrategy(),
                          verbose=False)
    seq = json.loads((tmp_path / "seq" / "search_results.json").read_text())

    par_best = run_search_parallel(
        ("tests.test_search", "_zinc_factory_pruned", (), {}),
        [dict(c) for c in CANDIDATES], metric_mode="min",
        metric_name="val_loss", num_workers=1, exp_dir=tmp_path / "par",
        scheduler=_fast_pruner(), max_iterations=8)
    par = json.loads((tmp_path / "par" / "search_results.json").read_text())

    assert par_best == seq_best
    for s, p in zip(seq["results"], par["results"]):
        assert s["hparams"] == p["hparams"]
        np.testing.assert_allclose(p["best_val"], s["best_val"], rtol=1e-6)
        assert p["best_iter"] == s["best_iter"]


def test_parallel_pruning_aborts_bad_trials(tmp_path):
    """With 2 workers the divergent candidate must get pruned at a rung
    (stopped early) rather than run to patience."""
    import json
    from egc_tpu.exp.parallel_search import run_search_parallel

    best = run_search_parallel(
        ("tests.test_search", "_zinc_factory_pruned", (), {}),
        [dict(c) for c in CANDIDATES], metric_mode="min",
        metric_name="val_loss", num_workers=2, exp_dir=tmp_path,
        scheduler=_fast_pruner(), max_iterations=12)
    assert best["lr"] in (1e-3, 8e-4)
    res = json.loads((tmp_path / "search_results.json").read_text())
    rows = {r["hparams"]["lr"]: r for r in res["results"]}
    assert rows[9.0]["pruned"] is True
    assert rows[9.0]["best_iter"] < 11
