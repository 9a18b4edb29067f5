"""One-command real-data parity runner (VERDICT r4 item 9).

The reference's whole verification story is ``run_pretrained.sh`` over its
Dropbox checkpoints (``output/pretrained.txt``). This environment has no
egress, so real artifacts cannot be fetched — but the day they CAN be,
parity must be one command, not an integration project. Given

    ROOT/datasets/      on-disk dataset layouts (egc_tpu.data.ondisk:
                        ogbn_arxiv/, ogbg_molhiv/, ogbg_code2/, zinc/,
                        cifar10_superpixels/ ...)
    ROOT/checkpoints/<dataset>_<key>.pt
                        reference torch checkpoints, named by registry key
                        (e.g. arxiv_egc_m.pt, hiv_gatv2.pt)

this evaluates every available pretrained-registry row through the same
restore path as ``main.py --pretrained --real`` and emits a BASELINE.md
diff table (one JSON line per row + a markdown summary).

    bash scripts/parity_from_real.sh ROOT [--rows ds:key,...]

``--fabricate``: CI dry run — fabricates small on-disk datasets
(scripts/bench_readers fabricators) and reference-format checkpoints from
fresh inits at the published architectures, then runs the SAME flow
end-to-end. Gates pipeline health (restore + eval produce finite
metrics), not metric values (fresh inits cannot match published numbers).
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))
sys.path.insert(0, str(HERE))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

# (dataset, cli model, registry key, aggrs) — pretrained_rehearsal's table
from pretrained_rehearsal import ROWS  # noqa: E402

# BASELINE.md published values: (dataset, registry key) -> (metric, value,
# higher_is_better). Source: /root/reference/output/pretrained.txt via
# BASELINE.md (mag/rmag have no committed reference numbers).
PUBLISHED = {
    ("zinc", "gatv2"): ("test_loss", 0.4303, False),
    ("zinc", "egc_s"): ("test_loss", 0.3639, False),
    ("zinc", "egc_m"): ("test_loss", 0.2802, False),
    ("cifar", "gatv2"): ("test_metric", 0.6744, True),
    ("cifar", "egc_s"): ("test_metric", 0.6685, True),
    ("cifar", "egc_m"): ("test_metric", 0.7094, True),
    ("hiv", "gcn"): ("test_metric", 0.7384, True),
    ("hiv", "gat"): ("test_metric", 0.7755, True),
    ("hiv", "gatv2"): ("test_metric", 0.7753, True),
    ("hiv", "gin"): ("test_metric", 0.7530, True),
    ("hiv", "sage"): ("test_metric", 0.7343, True),
    ("hiv", "mpnn_max"): ("test_metric", 0.7784, True),
    ("hiv", "mpnn_add"): ("test_metric", 0.7752, True),
    ("hiv", "egc_s"): ("test_metric", 0.7882, True),
    ("hiv", "egc_m"): ("test_metric", 0.7805, True),
    ("arxiv", "gcn"): ("test_metric", 0.7202, True),
    ("arxiv", "gat"): ("test_metric", 0.7178, True),
    ("arxiv", "gatv2"): ("test_metric", 0.7181, True),
    ("arxiv", "gin"): ("test_metric", 0.6882, True),
    ("arxiv", "sage"): ("test_metric", 0.7162, True),
    ("arxiv", "mpnn_max"): ("test_metric", 0.7096, True),
    ("arxiv", "mpnn_add"): ("test_metric", 0.6608, True),
    ("arxiv", "pna"): ("test_metric", 0.7134, True),
    ("arxiv", "egc_s"): ("test_metric", 0.7213, True),
    ("arxiv", "egc_m"): ("test_metric", 0.7232, True),
    ("code", "gcn"): ("test_metric", 0.1485, True),
    ("code", "gat"): ("test_metric", 0.1504, True),
    ("code", "gatv2"): ("test_metric", 0.1569, True),
    ("code", "gin"): ("test_metric", 0.1500, True),
    ("code", "sage"): ("test_metric", 0.1453, True),
    ("code", "mpnn_max"): ("test_metric", 0.1555, True),
    ("code", "mpnn_add"): ("test_metric", 0.1444, True),
    ("code", "pna"): ("test_metric", 0.1547, True),
    ("code", "egc_s"): ("test_metric", 0.1558, True),
    ("code", "egc_m"): ("test_metric", 0.1585, True),
}

# single-checkpoint eval is deterministic; this bounds float/layout noise,
# not training variance
TOL = 0.003


def eval_row(dataset, model, key, aggrs, ckpt: Path, *, synthetic: bool):
    from main import build_config
    from egc_tpu.exp.pretrained import PRETRAINED_CONF, validate_pretrained
    from egc_tpu.exp.weight_port import restore_pretrained_pt

    entry = PRETRAINED_CONF[dataset][key]
    config = build_config(
        dataset, model, hidden=entry.hidden, heads=entry.heads,
        bases=entry.bases, aggrs=",".join(aggrs) if aggrs else None,
        num_samples=1, synthetic=synthetic)
    validate_pretrained(dataset, model, config)
    net, state, data = restore_pretrained_pt(config, dataset, ckpt)
    return config.test(net, state, data)


def fabricate(root: Path, want=None):
    """Small on-disk datasets + fresh-init reference-format checkpoints."""
    import gzip

    import bench_readers as br

    ds = root / "datasets"
    ds.mkdir(parents=True, exist_ok=True)
    br.fabricate_arxiv(ds, 64)

    rng = np.random.default_rng(7)

    def hiv_labels(path, g):
        br.write_index_csv(path, np.random.default_rng(5).integers(0, 2, g))

    def code_labels(path, g):
        if path.exists():
            return
        toks = np.random.default_rng(6).integers(0, 9000, (g, 2))
        with gzip.open(path, "wt", compresslevel=1) as f:
            for a, b in toks:
                f.write(f"tok{a},tok{b}\n")

    br.fabricate_graphprop(ds, "ogbg_molhiv", 400, 5, 60, 9, 2,
                           hiv_labels, "scaffold", rng)
    br.fabricate_graphprop(ds, "ogbg_code2", 300, 50, 200, 2, 98,
                           code_labels, "project", rng, extras=True)

    # checkpoints: fresh inits at published architectures, exported to the
    # reference torch format (pretrained_rehearsal flow, but to disk)
    import torch

    from main import build_config
    from egc_tpu.exp.pretrained import PRETRAINED_CONF
    from egc_tpu.exp.weight_port import export_model_state

    ck = root / "checkpoints"
    ck.mkdir(exist_ok=True)
    for dataset, model, key, aggrs, _pub in ROWS:
        if dataset not in ("arxiv", "hiv", "code"):
            continue
        if want is not None and (dataset, key) not in want:
            continue
        out = ck / f"{dataset}_{key}.pt"
        if out.exists():
            continue
        entry = PRETRAINED_CONF[dataset][key]
        config = build_config(
            dataset, model, hidden=entry.hidden, heads=entry.heads,
            bases=entry.bases, aggrs=",".join(aggrs) if aggrs else None,
            num_samples=1, synthetic=False)
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
        sd_t = collections.OrderedDict(
            (k, torch.from_numpy(np.ascontiguousarray(v)))
            for k, v in sd.items())
        torch.save({"model": sd_t, "opt": {}, "hparams": dict(hp),
                    "lr_scheduler": {}}, str(out))
        print(f"# fabricated {out.name}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root", type=Path)
    ap.add_argument("--rows", type=str, default=None,
                    help="comma list ds:key to restrict (e.g. arxiv:egc_m)")
    ap.add_argument("--fabricate", action="store_true",
                    help="CI dry run on fabricated artifacts")
    args = ap.parse_args()
    root: Path = args.root

    os.environ["DATASET_LOC"] = str(root / "datasets")
    want = None
    if args.rows:
        want = {tuple(r.split(":")) for r in args.rows.split(",")}
    if args.fabricate:
        fabricate(root, want)

    table, n_fail, n_skip = [], 0, 0
    for dataset, model, key, aggrs, _pub in ROWS:
        if want is not None and (dataset, key) not in want:
            continue
        ckpt = root / "checkpoints" / f"{dataset}_{key}.pt"
        if not ckpt.exists():
            n_skip += 1
            continue
        t0 = time.time()
        row = {"dataset": dataset, "model": key}
        try:
            res = eval_row(dataset, model, key, aggrs, ckpt,
                           synthetic=False)
            mkey, pub, hib = PUBLISHED.get((dataset, key),
                                           (None, None, None))
            # full-graph configs name accuracy test_acc; batched ones
            # test_metric (rocauc/F1/acc) or test_loss (zinc MAE)
            if mkey not in res:
                mkey = next(k for k in ("test_metric", "test_acc",
                                        "test_loss") if k in res)
            got = float(res[mkey])
            row.update(metric=mkey, value=round(got, 4), s=round(
                time.time() - t0, 1))
            if not np.isfinite(got):
                row["status"] = "FAIL(non-finite)"
                n_fail += 1
            elif args.fabricate or pub is None:
                row["status"] = "ok(pipeline)"
            else:
                row.update(published=pub, diff=round(got - pub, 4))
                ok = (got >= pub - TOL) if hib else (got <= pub + TOL)
                row["status"] = "ok" if ok else "FAIL(parity)"
                n_fail += 0 if ok else 1
        except Exception as e:  # noqa: BLE001 — summarize every row
            row.update(status=f"ERROR: {type(e).__name__}",
                       error=str(e)[:200])
            n_fail += 1
        table.append(row)
        print(json.dumps(row), flush=True)

    print("\n| dataset | model | metric | value | published | diff | status |")
    print("|---|---|---|---|---|---|---|")
    for r in table:
        print(f"| {r['dataset']} | {r['model']} | {r.get('metric', '-')} | "
              f"{r.get('value', '-')} | {r.get('published', '-')} | "
              f"{r.get('diff', '-')} | {r['status']} |")
    print(json.dumps({"metric": "parity_rows", "evaluated": len(table),
                      "failed": n_fail, "skipped_no_checkpoint": n_skip}),
          flush=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
