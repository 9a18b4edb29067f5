"""Pretrained-eval rehearsal over the FULL registry at published sizes.

The reference's verification story is ``run_pretrained.sh`` over 35
Dropbox checkpoints (``output/pretrained.txt``). The URLs are dead and the
environment has no egress, so this rehearses everything EXCEPT the
download: for every (dataset, model) row in ``PRETRAINED_CONF`` it

1. builds the config at the PUBLISHED architecture (hidden/heads/bases/
   aggrs — the exact sizes real checkpoints will arrive with),
2. exports the freshly-initialized model to a reference-format torch
   ``checkpoint.pt`` (``egc_tpu.exp.weight_port`` + torch.save),
3. restores it through the CLI path (``validate_pretrained`` +
   ``restore_pretrained_pt``) and evaluates on the synthetic test split,
4. re-imports and checks the forward reproduces exactly.

Run on CPU: python scripts/pretrained_rehearsal.py [--quick]
(--quick: 3 representative rows). Prints one JSON line per row + summary.

When a real checkpoint is mounted, the same flow is just
``python main.py DIR MODEL DATASET --pretrained --hidden ... --real``.
"""

import argparse
import collections
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


# (dataset, model-cli-name, registry key, egc aggrs or None, published
# param count from output/pretrained.txt via BASELINE.md — asserted when
# the synthetic dataset preserves the true input/output dims; code rows
# use a small synthetic vocab (token heads dominate), so no assert there)
ROWS = [
    ("zinc", "gatv2", "gatv2", None, 98_957),
    ("zinc", "egc", "egc_s", ("symadd",), 102_861),
    ("zinc", "egc", "egc_m", ("add", "std", "max"), 100_385),
    ("cifar", "gatv2", "gatv2", None, 96_912),
    ("cifar", "egc", "egc_s", ("symadd",), 99_552),
    ("cifar", "egc", "egc_m", ("symadd", "std", "max"), 103_466),
    ("hiv", "gcn", "gcn", None, 311_401),
    ("hiv", "gat", "gat", None, 313_321),
    ("hiv", "gatv2", "gatv2", None, 328_717),
    ("hiv", "gin", "gin", None, 311_405),
    ("hiv", "sage", "sage", None, 313_201),
    ("hiv", "mpnn-max", "mpnn_max", None, 314_641),
    ("hiv", "mpnn-sum", "mpnn_add", None, 314_641),
    ("hiv", "egc", "egc_s", ("symadd",), 323_509),
    ("hiv", "egc", "egc_m", ("add", "max", "mean"), 317_265),
    ("arxiv", "gcn", "gcn", None, 100_816),
    ("arxiv", "gat", "gat", None, 97_320),
    ("arxiv", "gatv2", "gatv2", None, 96_248),
    ("arxiv", "gin", "gin", None, 100_819),
    ("arxiv", "sage", "sage", None, 99_860),
    ("arxiv", "mpnn-max", "mpnn_max", None, 102_120),
    ("arxiv", "mpnn-sum", "mpnn_add", None, 102_120),
    ("arxiv", "pna", "pna", None, 96_332),
    ("arxiv", "egc", "egc_s", ("symadd",), 101_336),
    ("arxiv", "egc", "egc_m", ("symadd", "max", "mean"), 99_464),
    ("code", "gcn", "gcn", None, None),
    ("code", "gat", "gat", None, None),
    ("code", "gatv2", "gatv2", None, None),
    ("code", "gin", "gin", None, None),
    ("code", "sage", "sage", None, None),
    ("code", "mpnn-max", "mpnn_max", None, None),
    ("code", "mpnn-sum", "mpnn_add", None, None),
    ("code", "pna", "pna", None, None),
    ("code", "egc", "egc_s", ("symadd",), None),
    ("code", "egc", "egc_m", ("symadd", "min", "max"), None),
]

QUICK = [ROWS[2], ROWS[22], ROWS[34]]   # zinc egc_m, arxiv pna, code egc_m


def run_row(dataset, model, key, aggrs, pub_params):
    import torch
    from main import build_config
    from egc_tpu.exp.pretrained import PRETRAINED_CONF, validate_pretrained
    from egc_tpu.exp.weight_port import (
        export_model_state, restore_pretrained_pt,
    )
    import tempfile

    entry = PRETRAINED_CONF[dataset][key]
    config = build_config(
        dataset, model, hidden=entry.hidden, heads=entry.heads,
        bases=entry.bases, aggrs=",".join(aggrs) if aggrs else None,
        num_samples=1, synthetic=True)
    validate_pretrained(dataset, model, config)

    hp = config.default_hparams()
    data = config.data(hp)
    net = config.model(hp)
    state = config.init_state(net, hp, data, 0)
    variables = {"params": state.params}
    if getattr(state, "batch_stats", None):
        variables["batch_stats"] = state.batch_stats
    spec = {}
    if model == "egc":
        spec = dict(heads=entry.heads, bases=entry.bases, aggrs=aggrs)
    sd = export_model_state(dataset, model, variables, **spec)

    with tempfile.TemporaryDirectory() as td:
        pt = Path(td) / "checkpoint.pt"
        sd_t = collections.OrderedDict(
            (k, torch.from_numpy(np.ascontiguousarray(v)))
            for k, v in sd.items())
        torch.save({"model": sd_t, "opt": {}, "hparams": dict(hp),
                    "lr_scheduler": {}}, str(pt))
        net2, state2, _ = restore_pretrained_pt(config, dataset, pt,
                                                data=data)
    ref = config.test(net, state, data)
    got = config.test(net2, state2, data)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-6, err_msg=k)
    n_params = int(state.num_params)
    if pub_params is not None and n_params != pub_params:
        raise AssertionError(
            f"param count {n_params} != published {pub_params} "
            f"(output/pretrained.txt)")
    return {"dataset": dataset, "model": key, "hidden": entry.hidden,
            "params": n_params, "params_match_published":
                (n_params == pub_params) if pub_params else None,
            "tensors": len(sd),
            "test": {k: round(float(v), 4) for k, v in got.items()}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    rows = QUICK if args.quick else ROWS
    ok, failed = 0, []
    for dataset, model, key, aggrs, pub in rows:
        t0 = time.time()
        try:
            res = run_row(dataset, model, key, aggrs, pub)
            res["s"] = round(time.time() - t0, 1)
            print(json.dumps(res), flush=True)
            ok += 1
        except Exception as e:  # noqa: BLE001 — summarize all failures
            failed.append(f"{dataset}/{key}: {type(e).__name__}: {e}")
            print(json.dumps({"dataset": dataset, "model": key,
                              "error": str(e)[:200]}), flush=True)
    print(json.dumps({"metric": "pretrained_rehearsal_rows_ok",
                      "value": ok, "total": len(rows),
                      "failed": failed}), flush=True)
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
