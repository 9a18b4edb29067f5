"""At-scale reader gate: fabricate FULL-SIZE dataset layouts and time the
on-disk readers (VERDICT r2 item 2 — round 2 only ever parsed toy files).

Fabricates (once, cached under --root) the real datasets' shapes:
- ogbn-arxiv: 169,343 x 128 features, 1,166,243 directed edges
- ogbn-mag:   736,389 papers x 128, 4 relations totalling ~21.1M edge rows
- ogbg-code2: 452,741 ASTs, ~56M node rows (counts drawn ~Uniform[50,200])
- ogbg-molhiv: 41,127 molecules

then times every loader cold (parse) and warm (.npy sidecar cache) and
reports peak RSS. Gate: load_ogbn_mag_hetero cold < 5 min.

Usage: python scripts/bench_readers.py [--root DIR] [--small] [--fresh]
(--small scales node/edge counts by 64x down for a smoke run; --fresh
deletes sidecar caches first so "cold" timings are honest on reruns).
"""

import argparse
import gzip
import io
import json
import resource
import shutil
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ARXIV_N, ARXIV_E, ARXIV_F, ARXIV_C = 169_343, 1_166_243, 128, 40
MAG_NODES = {"paper": 736_389, "author": 1_134_649,
             "field_of_study": 59_965, "institution": 8_740}
MAG_RELS = {  # (src, rel, dst) -> edge rows (real ogbn-mag counts)
    ("author", "affiliated_with", "institution"): 1_043_998,
    ("author", "writes", "paper"): 7_145_660,
    ("paper", "cites", "paper"): 5_416_271,
    ("paper", "has_topic", "field_of_study"): 7_505_078,
}
CODE2_G = 452_741
HIV_G = 41_127


def log(*a):
    print(*a, flush=True)


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def write_block_csv(path: Path, render, total_rows: int,
                    block_rows: int = 65_536, unique: bool = False):
    """Stream a csv.gz. Default: repeat one rendered random block (values
    repeat every block_rows rows — fine for features/labels, 50x faster to
    fabricate). unique=True renders fresh blocks (REQUIRED for edge lists:
    the loaders deduplicate via to_undirected, so tiled edges collapse)."""
    path.parent.mkdir(parents=True, exist_ok=True)
    if path.exists():
        return

    def render_bytes(rows):
        buf = io.StringIO()
        np.savetxt(buf, render(rows), fmt=render.fmt, delimiter=",")
        return buf.getvalue().encode()

    block = None if unique else render_bytes(block_rows)
    with gzip.open(path, "wb", compresslevel=1) as f:
        done = 0
        while done < total_rows:
            take = min(block_rows, total_rows - done)
            if unique or take < block_rows:
                f.write(render_bytes(take))
            else:
                f.write(block)
            done += take


def renderer(fn, fmt):
    fn.fmt = fmt
    return fn


def fab_floats(rng, cols):
    return renderer(lambda n: rng.normal(size=(n, cols)).astype(np.float32),
                    "%.6f")


def fab_ints(rng, cols, hi):
    return renderer(lambda n: rng.integers(0, hi, size=(n, cols)), "%d")


def write_index_csv(path: Path, idx: np.ndarray):
    path.parent.mkdir(parents=True, exist_ok=True)
    if path.exists():
        return
    with gzip.open(path, "wt", compresslevel=1) as f:
        f.write("\n".join(map(str, idx)) + "\n")


def fabricate_arxiv(root: Path, scale: int):
    rng = np.random.default_rng(0)
    n, e = ARXIV_N // scale, ARXIV_E // scale
    raw = root / "ogbn_arxiv" / "raw"
    write_block_csv(raw / "node-feat.csv.gz", fab_floats(rng, ARXIV_F), n)
    write_block_csv(raw / "node-label.csv.gz", fab_ints(rng, 1, ARXIV_C), n)
    write_block_csv(raw / "edge.csv.gz", fab_ints(rng, 2, n), e,
                    unique=True)
    sd = root / "ogbn_arxiv" / "split" / "time"
    tr = int(n * 0.54)
    va = int(n * 0.18)
    write_index_csv(sd / "train.csv.gz", np.arange(tr))
    write_index_csv(sd / "valid.csv.gz", np.arange(tr, tr + va))
    write_index_csv(sd / "test.csv.gz", np.arange(tr + va, n))


def fabricate_mag(root: Path, scale: int):
    rng = np.random.default_rng(1)
    counts = {t: max(c // scale, 64) for t, c in MAG_NODES.items()}
    raw = root / "ogbn_mag" / "raw"
    write_block_csv(raw / "node-feat" / "paper" / "node-feat.csv.gz",
                    fab_floats(rng, 128), counts["paper"])
    write_block_csv(raw / "node-label" / "paper" / "node-label.csv.gz",
                    fab_ints(rng, 1, 349), counts["paper"])
    for (src, rel, dst), rows in MAG_RELS.items():
        p = raw / "relations" / f"{src}___{rel}___{dst}" / "edge.csv.gz"
        p.parent.mkdir(parents=True, exist_ok=True)
        if p.exists():
            continue
        lo, hi = counts[src], counts[dst]
        r = renderer(lambda n, lo=lo, hi=hi: np.stack(
            [rng.integers(0, lo, n), rng.integers(0, hi, n)], axis=1), "%d")
        write_block_csv(p, r, rows // scale, unique=True)
    nd = raw / "num-node-dict.json"
    if not nd.exists():
        nd.write_text(json.dumps(counts))
    sd = root / "ogbn_mag" / "split" / "time" / "paper"
    n = counts["paper"]
    tr, va = int(n * 0.85), int(n * 0.09)
    write_index_csv(sd / "train.csv.gz", np.arange(tr))
    write_index_csv(sd / "valid.csv.gz", np.arange(tr, tr + va))
    write_index_csv(sd / "test.csv.gz", np.arange(tr + va, n))


def fabricate_graphprop(root: Path, name: str, num_graphs: int,
                        node_lo, node_hi, feat_cols, feat_hi, labels_fn,
                        split_type: str, rng, extras=False):
    raw = root / name / "raw"
    raw.mkdir(parents=True, exist_ok=True)
    marker = raw / ".fabricated.json"
    if marker.exists():
        return json.loads(marker.read_text())
    nn = rng.integers(node_lo, node_hi, num_graphs)
    ne = np.maximum(nn - 1 + rng.integers(0, 10, num_graphs), 1)
    total_n, total_e = int(nn.sum()), int(ne.sum())
    write_index_csv(raw / "num-node-list.csv.gz", nn)
    write_index_csv(raw / "num-edge-list.csv.gz", ne)
    # edge ids must stay within each graph's node count: use ids < node_lo
    write_block_csv(raw / "edge.csv.gz", fab_ints(rng, 2, node_lo), total_e,
                    unique=True)
    write_block_csv(raw / "node-feat.csv.gz", fab_ints(rng, feat_cols,
                                                       feat_hi), total_n)
    if extras:
        write_block_csv(raw / "node_is_attributed.csv.gz",
                        fab_ints(rng, 1, 2), total_n)
        write_block_csv(raw / "node_depth.csv.gz", fab_ints(rng, 1, 25),
                        total_n)
    labels_fn(raw / "graph-label.csv.gz", num_graphs)
    sd = root / name / "split" / split_type
    tr, va = int(num_graphs * 0.8), int(num_graphs * 0.1)
    perm = rng.permutation(num_graphs)
    write_index_csv(sd / "train.csv.gz", perm[:tr])
    write_index_csv(sd / "valid.csv.gz", perm[tr:tr + va])
    write_index_csv(sd / "test.csv.gz", perm[tr + va:])
    meta = {"total_n": total_n, "total_e": total_e}
    marker.write_text(json.dumps(meta))
    return meta


def timed(name, fn, results):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    results[name] = round(dt, 2)
    log(f"  {name}: {dt:.1f}s (peak RSS {rss_mb():.0f} MB)")
    return out


def clear_sidecars(root: Path):
    for p in root.rglob("*.npy"):
        p.unlink()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/egc_tpu_fullsize")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--fresh", action="store_true",
                    help="drop .npy sidecar caches before timing")
    ap.add_argument("--wipe", action="store_true",
                    help="delete the fabricated root first")
    args = ap.parse_args()
    scale = 64 if args.small else 1
    root = Path(args.root + ("_small" if args.small else ""))
    if args.wipe and root.exists():
        shutil.rmtree(root)
    root.mkdir(parents=True, exist_ok=True)

    rng = np.random.default_rng(7)
    log(f"# fabricating full-size layouts under {root} (cached)")
    t0 = time.time()
    fabricate_arxiv(root, scale)
    fabricate_mag(root, scale)

    def hiv_labels(path, g):
        write_index_csv(path, np.random.default_rng(5).integers(0, 2, g))

    def code_labels(path, g):
        if path.exists():
            return
        toks = np.random.default_rng(6).integers(0, 9000, (g, 2))
        with gzip.open(path, "wt", compresslevel=1) as f:
            for a, b in toks:
                f.write(f"tok{a},tok{b}\n")

    fabricate_graphprop(root, "ogbg_molhiv", HIV_G // scale, 5, 60, 9, 2,
                        hiv_labels, "scaffold", rng)
    fabricate_graphprop(root, "ogbg_code2", CODE2_G // scale, 50, 200, 2,
                        98, code_labels, "project", rng, extras=True)
    log(f"# fabrication: {time.time() - t0:.1f}s")

    if args.fresh:
        clear_sidecars(root)

    from egc_tpu.data import ondisk
    results = {}
    log("# cold (parse) timings")
    arxiv = timed("load_ogbn_arxiv cold", lambda: ondisk.load_ogbn_arxiv(root),
                  results)
    assert arxiv["x"].shape == (ARXIV_N // scale, ARXIV_F)
    assert arxiv["senders"].size >= ARXIV_E // scale  # undirected >= directed
    del arxiv
    mag = timed("load_ogbn_mag_hetero cold",
                lambda: ondisk.load_ogbn_mag_hetero(root), results)
    assert mag["nodes"]["paper"].shape[0] == MAG_NODES["paper"] // scale
    assert len(mag["edges"]) == 7  # 4 relations + 3 reverses (cites merged)
    del mag
    timed("load_ogbn_mag_homogeneous cold",
          lambda: ondisk.load_ogbn_mag_homogeneous(root), results)
    hiv = timed("load_ogbg_molhiv cold",
                lambda: ondisk.load_ogbg_molhiv(root), results)
    assert sum(len(v) for v in hiv.values()) == HIV_G // scale
    del hiv
    code = timed("load_ogbg_code2 cold",
                 lambda: ondisk.load_ogbg_code2(root), results)
    assert sum(len(v) for v in code["splits"].values()) == CODE2_G // scale
    assert len(code["idx2vocab"]) <= 5002
    del code

    log("# warm (.npy sidecar) timings")
    timed("load_ogbn_arxiv warm", lambda: ondisk.load_ogbn_arxiv(root),
          results)
    timed("load_ogbn_mag_hetero warm",
          lambda: ondisk.load_ogbn_mag_hetero(root), results)

    gate = results["load_ogbn_mag_hetero cold"]
    ok = gate < 300 or args.small
    print(json.dumps({"metric": "mag_hetero_reader_cold_s", "value": gate,
                      "unit": "s", "gate_lt_s": 300, "ok": bool(ok),
                      "peak_rss_mb": round(rss_mb(), 1), "scale": scale,
                      "all": results}))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
