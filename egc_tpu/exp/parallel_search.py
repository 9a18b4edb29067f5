"""Multi-process trial-level parallelism — the Ray role (SURVEY §2.4).

The reference packs fractional-GPU trials via ray.tune (zinc/configs.py:106).
A TPU chip is not fractionally shareable, so trial parallelism here means:

- on one host: N worker PROCESSES running trials on CPU (search-phase
  screening; the chip stays free for the final runs), or
- across hosts: each host runs its own worker against its own chip(s)
  (launch one process per host with a disjoint trial shard; results merge
  by file).

Workers are spawned fresh (no JAX state inheritance); the config is rebuilt
inside the worker from a picklable spec (module-path factory + kwargs).
"""

from __future__ import annotations

import json
import multiprocessing
import os
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple



def _worker(spec: Tuple[str, str, tuple, dict], hparams: Dict[str, Any],
            seed: int, max_iterations: Optional[int], platform: str):
    os.environ["JAX_PLATFORMS"] = platform
    import importlib
    import jax

    jax.config.update("jax_platforms", platform)

    module, qualname, args, kwargs = spec
    factory = importlib.import_module(module)
    for part in qualname.split("."):
        factory = getattr(factory, part)
    config = factory(*args, **kwargs)

    from egc_tpu.exp.runner import run_trial

    res = run_trial(config, hparams, seed=seed,
                    max_iterations=max_iterations, verbose=False)
    return {"hparams": hparams, "best_val": res["best_val"],
            "best_iter": res["best_iter"], "test": res["test"]}


def run_search_parallel(
    config_spec: Tuple[str, str, tuple, dict],
    candidates: List[Dict[str, Any]],
    *,
    metric_mode: str,
    metric_name: str,
    num_workers: int = 2,
    exp_dir: Optional[Path] = None,
    seed: int = 0,
    max_iterations: Optional[int] = None,
    worker_platform: str = "cpu",
    resources=None,
) -> Dict[str, Any]:
    """Evaluate hyperparameter candidates across worker processes.

    ``config_spec`` = (module, qualname, args, kwargs) of a factory callable
    returning a fresh ExperimentConfig (must be importable in workers).
    Returns the best hyperparameters.

    ``resources``: the config's ``resource_requirements()`` (TrialResources)
    — the exptune/ray packing role: ``num_workers`` is clamped so that
    ``workers * resources.cpus`` does not oversubscribe the host.
    """
    if resources is not None and getattr(resources, "cpus", 0):
        cap = max(1, (os.cpu_count() or 1) // max(int(resources.cpus), 1))
        num_workers = max(1, min(num_workers, cap))
    sign = 1.0 if metric_mode == "min" else -1.0
    results = []
    # spawn (not fork): forking a process with an initialized JAX runtime
    # deadlocks in XLA's thread pools
    ctx = multiprocessing.get_context("spawn")
    with ProcessPoolExecutor(max_workers=num_workers, mp_context=ctx) as pool:
        futures = [
            pool.submit(_worker, config_spec, hp, seed + i, max_iterations,
                        worker_platform)
            for i, hp in enumerate(candidates)
        ]
        for fut in futures:
            results.append(fut.result())

    best = min(results, key=lambda r: sign * r["best_val"])
    if exp_dir is not None:
        Path(exp_dir).mkdir(parents=True, exist_ok=True)
        (Path(exp_dir) / "search_results.json").write_text(
            json.dumps({"results": results, "best": best["hparams"]},
                       indent=2, default=float))
    return best["hparams"]
