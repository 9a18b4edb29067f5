"""On-disk dataset reader tests against fabricated files in the documented
layouts (no network egress — real datasets can't be fetched, so the readers
are validated on miniature datasets written in the same formats)."""

import gzip
import pickle

import numpy as np
import pytest

from egc_tpu.data import ondisk


def write_csv_gz(path, arr, fmt="%d"):
    path.parent.mkdir(parents=True, exist_ok=True)
    with gzip.open(path, "wt") as f:
        np.savetxt(f, np.asarray(arr), delimiter=",", fmt=fmt)


def test_load_ogbn_arxiv(tmp_path, monkeypatch):
    monkeypatch.setenv("DATASET_LOC", str(tmp_path))
    root = tmp_path / "ogbn_arxiv"
    n = 10
    edges = np.array([[0, 1], [1, 2], [2, 3], [3, 0], [4, 5]])
    x = np.random.default_rng(0).normal(size=(n, 4))
    y = np.arange(n) % 3
    write_csv_gz(root / "raw" / "edge.csv.gz", edges)
    write_csv_gz(root / "raw" / "node-feat.csv.gz", x, fmt="%.6f")
    write_csv_gz(root / "raw" / "node-label.csv.gz", y.reshape(-1, 1))
    sd = root / "split" / "time"
    write_csv_gz(sd / "train.csv.gz", np.arange(6).reshape(-1, 1))
    write_csv_gz(sd / "valid.csv.gz", np.array([[6], [7]]))
    write_csv_gz(sd / "test.csv.gz", np.array([[8], [9]]))

    d = ondisk.load_ogbn_arxiv()
    assert d["x"].shape == (n, 4)
    assert d["num_classes"] == 3
    # to_undirected applied: both directions present
    pairs = set(zip(d["senders"].tolist(), d["receivers"].tolist()))
    assert (0, 1) in pairs and (1, 0) in pairs
    assert len(d["train_idx"]) == 6


def test_load_ogbg_molhiv(tmp_path, monkeypatch):
    monkeypatch.setenv("DATASET_LOC", str(tmp_path))
    root = tmp_path / "ogbg_molhiv"
    # two graphs: 3 nodes/2 edges and 2 nodes/1 edge
    write_csv_gz(root / "raw" / "num-node-list.csv.gz", [[3], [2]])
    write_csv_gz(root / "raw" / "num-edge-list.csv.gz", [[2], [1]])
    write_csv_gz(root / "raw" / "edge.csv.gz", [[0, 1], [1, 2], [0, 1]])
    feats = np.random.default_rng(0).integers(0, 2, size=(5, 9))
    write_csv_gz(root / "raw" / "node-feat.csv.gz", feats)
    write_csv_gz(root / "raw" / "graph-label.csv.gz", [[1], [0]])
    sd = root / "split" / "scaffold"
    write_csv_gz(sd / "train.csv.gz", [[0]])
    write_csv_gz(sd / "valid.csv.gz", [[1]])
    write_csv_gz(sd / "test.csv.gz", [[1]])

    d = ondisk.load_ogbg_molhiv()
    assert len(d["train"]) == 1 and len(d["val"]) == 1
    g0 = d["train"][0]
    assert g0["nodes"].shape == (3, 9)
    assert g0["y"][0] == 1
    # per-graph edge indices are local
    assert g0["senders"].max() < 3


def test_vocab_and_seq_roundtrip():
    seqs = [["get", "name"], ["set", "name"], ["name"]]
    v2i, i2v = ondisk.build_vocab(seqs, num_vocab=2)
    # top-2 by count: "name"(3), "get"(1) — stable first-appearance order
    assert i2v[:2] == ["name", "get"]
    assert i2v[-2:] == ["__UNK__", "__EOS__"]
    enc = ondisk.encode_seq(["set", "name"], v2i, seq_len=4)
    assert enc[0] == v2i["__UNK__"] and enc[1] == v2i["name"]
    assert enc[2] == v2i["__EOS__"]
    dec = ondisk.decode_arr(enc, i2v)
    assert dec == ["__UNK__", "name"]   # cut at first EOS


def test_augment_ast_edges():
    s = np.array([1, 2, 3], np.int32)      # child -> parent
    r = np.array([0, 0, 1], np.int32)
    is_att = np.array([0, 1, 0, 1])
    s2, r2 = ondisk.augment_ast_edges_np(s, r, is_att)
    pairs = set(zip(s2.tolist(), r2.tolist()))
    # AST + inverse
    assert (1, 0) in pairs and (0, 1) in pairs
    # next-token between attributed nodes 1 and 3, plus inverse
    assert (1, 3) in pairs and (3, 1) in pairs
    assert len(s2) == 2 * 3 + 2


def test_load_zinc(tmp_path, monkeypatch):
    import torch

    monkeypatch.setenv("DATASET_LOC", str(tmp_path))
    raw = tmp_path / "ZINC" / "raw"
    raw.mkdir(parents=True)
    mols = []
    for n in (3, 4):
        adj = np.zeros((n, n), np.int64)
        adj[0, 1] = adj[1, 0] = 1
        mols.append({
            "atom_type": torch.tensor(np.arange(n)),
            "bond_type": torch.tensor(adj),
            "logP_SA_cycle_normalized": torch.tensor(0.5),
        })
    for split in ("train", "val", "test"):
        with open(raw / f"{split}.pickle", "wb") as f:
            pickle.dump(mols, f)
        (raw / f"{split}.index").write_text("0,1")

    d = ondisk.load_zinc()
    assert len(d["train"]) == 2
    g = d["train"][0]
    assert g["nodes"].shape == (3, 1)
    assert set(zip(g["senders"].tolist(), g["receivers"].tolist())) == \
        {(0, 1), (1, 0)}
    assert g["y"][0] == pytest.approx(0.5)


def test_load_ogbn_mag_hetero(tmp_path, monkeypatch):
    import json

    monkeypatch.setenv("DATASET_LOC", str(tmp_path))
    root = tmp_path / "ogbn_mag"
    raw = root / "raw"
    n_paper, n_author, n_inst, n_fos = 6, 4, 2, 3
    x = np.random.default_rng(0).normal(size=(n_paper, 8))
    write_csv_gz(raw / "node-feat" / "paper" / "node-feat.csv.gz", x,
                 fmt="%.5f")
    write_csv_gz(raw / "node-label" / "paper" / "node-label.csv.gz",
                 (np.arange(n_paper) % 2).reshape(-1, 1))
    (raw / "num-node-dict.json").write_text(json.dumps({
        "paper": n_paper, "author": n_author, "institution": n_inst,
        "field_of_study": n_fos}))
    rels = {
        "author___affiliated_with___institution": [[0, 0], [1, 1]],
        "author___writes___paper": [[0, 1], [2, 3]],
        "paper___cites___paper": [[0, 1], [2, 3]],
        "paper___has_topic___field_of_study": [[0, 0], [5, 2]],
    }
    for d, e in rels.items():
        write_csv_gz(raw / "relations" / d / "edge.csv.gz", e)
    sd = root / "split" / "time" / "paper"
    write_csv_gz(sd / "train.csv.gz", [[0], [1], [2]])
    write_csv_gz(sd / "valid.csv.gz", [[3], [4]])
    write_csv_gz(sd / "test.csv.gz", [[5]])

    d = ondisk.load_ogbn_mag_hetero()
    assert d["nodes"]["paper"].shape == (n_paper, 8)
    assert d["nodes"]["author"].shape == (n_author, 0)
    # 4 relations -> 7 keys (3 reverses + symmetrized cites)
    assert len(d["edges"]) == 7
    s, r = d["edges"]["paper__cites__paper"]
    assert set(zip(s.tolist(), r.tolist())) == {(0, 1), (1, 0), (2, 3),
                                                (3, 2)}
    s, r = d["edges"]["paper__to__author"]
    assert set(zip(s.tolist(), r.tolist())) == {(1, 0), (3, 2)}
    assert d["num_classes"] == 2


def test_load_cifar10_superpixels(tmp_path, monkeypatch):
    import torch

    monkeypatch.setenv("DATASET_LOC", str(tmp_path))
    raw = tmp_path / "CIFAR10" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)

    def mk(n):
        items = []
        for i in range(n):
            nn = int(rng.integers(3, 6))
            items.append({
                "x": torch.tensor(rng.normal(size=(nn, 3)),
                                  dtype=torch.float32),
                "pos": torch.tensor(rng.random(size=(nn, 2)),
                                    dtype=torch.float32),
                "edge_index": torch.tensor(
                    rng.integers(0, nn, size=(2, 2 * nn))),
                "y": torch.tensor([int(rng.integers(0, 10))]),
            })
        return items

    for split, n in (("train", 4), ("val", 2), ("test", 2)):
        torch.save(mk(n), raw / f"CIFAR10_{split}.pt")

    d = ondisk.load_cifar10_superpixels()
    assert len(d["train"]) == 4 and len(d["val"]) == 2 and len(d["test"]) == 2
    g = d["train"][0]
    # pos concatenated onto x: 5 input features (reference
    # cifar/configs.py:37-39)
    assert g["nodes"].shape[1] == 5
    assert g["senders"].dtype == np.int32
    assert 0 <= g["y"][0] < 10


# ---------------------------------------------------------------------------
# fast CSV parsing paths (native / pandas / sidecar cache) — all must agree
# with np.loadtxt (the round-2 reference implementation)
# ---------------------------------------------------------------------------

def test_read_csv_gz_matches_loadtxt(tmp_path):
    rng = np.random.default_rng(0)
    f = rng.normal(size=(57, 7)).astype(np.float64) * 1e3
    write_csv_gz(tmp_path / "f.csv.gz", f, fmt="%.8g")
    i = rng.integers(-10**14, 10**14, size=(33, 3))
    write_csv_gz(tmp_path / "i.csv.gz", i)
    s = rng.integers(0, 9, size=(11, 1))
    write_csv_gz(tmp_path / "s.csv.gz", s)

    with gzip.open(tmp_path / "f.csv.gz", "rt") as fh:
        ref_f = np.loadtxt(fh, delimiter=",", dtype=np.float32, ndmin=2)
    got_f = ondisk._read_csv_gz(tmp_path / "f.csv.gz", np.float32)
    np.testing.assert_allclose(got_f, ref_f, rtol=1e-6)
    np.testing.assert_array_equal(
        ondisk._read_csv_gz(tmp_path / "i.csv.gz"), i)
    got_s = ondisk._read_csv_gz(tmp_path / "s.csv.gz")
    assert got_s.shape == (11, 1)
    np.testing.assert_array_equal(got_s, s)


def test_read_csv_gz_sidecar_cache(tmp_path):
    arr = np.arange(12).reshape(4, 3)
    write_csv_gz(tmp_path / "c.csv.gz", arr)
    a = ondisk._read_csv_gz(tmp_path / "c.csv.gz")
    cache = tmp_path / "c.csv.gz.npy"
    assert cache.exists()
    # poison the cache to prove the second read uses it
    np.save(cache, arr + 100)
    import os
    os.utime(cache)  # keep cache mtime >= source
    b = ondisk._read_csv_gz(tmp_path / "c.csv.gz")
    np.testing.assert_array_equal(b, arr + 100)
    # stale cache (older than source) is re-parsed
    os.utime(tmp_path / "c.csv.gz")
    os.utime(cache, (0, 0))
    c = ondisk._read_csv_gz(tmp_path / "c.csv.gz")
    np.testing.assert_array_equal(c, a)


def test_native_fastcsv_parser(tmp_path):
    from egc_tpu import native
    if native.get_fastcsv() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(1)
    # exponents, negatives, mixed whitespace, trailing newline variants
    text = b"1.5e-3,-2,0.25\n-1e10,3,4\r\n7,8,9"
    flat = native.parse_csv_bytes(text, np.float32)
    np.testing.assert_allclose(
        flat, [1.5e-3, -2, 0.25, -1e10, 3, 4, 7, 8, 9], rtol=1e-6)
    ints = native.parse_csv_bytes(b"5,-7\n12,9223372036854\n", np.int64)
    np.testing.assert_array_equal(ints, [5, -7, 12, 9223372036854])
    # large block exercises the multithreaded path (> 4 MB)
    big = rng.integers(0, 1000, size=(400_000, 2))
    blob = "\n".join(f"{a},{b}" for a, b in big).encode()
    out = native.parse_csv_bytes(blob, np.int64)
    np.testing.assert_array_equal(out.reshape(-1, 2), big)


def test_read_csv_gz_rejects_malformed_rows(tmp_path):
    """Empty fields must NOT silently compact/misalign (r3 review finding):
    the native fast path is structure-validated (rows*cols) and malformed
    files surface as a parse error, matching the old loadtxt behavior."""
    p = tmp_path / "bad.csv.gz"
    with gzip.open(p, "wt") as f:
        f.write("1,2\n3,\n,6\n7,8\n")   # two empty fields
    with pytest.raises(Exception):
        ondisk._read_csv_gz(p)


def test_read_csv_gz_rejects_offsetting_malformed_rows(tmp_path):
    """Offsetting malformations (one row cols+1, another cols-1) keep the
    TOTAL field count at rows*cols — the per-row native check must still
    reject them (r4 review finding), as must an embedded space splitting a
    field."""
    p = tmp_path / "offset.csv.gz"
    with gzip.open(p, "wt") as f:
        f.write("1,2,3\n4,5,6,7\n8,9\n1,2,3\n")   # 12 fields = 4 rows * 3
    with pytest.raises(Exception):
        ondisk._read_csv_gz(p)
    q = tmp_path / "space.csv.gz"
    with gzip.open(q, "wt") as f:
        f.write("1,2 9\n3,4\n")   # embedded space -> extra field in row 0
    with pytest.raises(Exception):
        ondisk._read_csv_gz(q)


def test_native_row_consistency_check():
    from egc_tpu import native
    if native.get_fastcsv() is None:
        pytest.skip("no native toolchain")
    assert native.csv_rows_consistent(b"1,2\n3,4\n", 2) == 2
    assert native.csv_rows_consistent(b"1,2\n3,4", 2) == 2   # no final \n
    assert native.csv_rows_consistent(b"1,2\n\n3,4\n", 2) == 2  # blank line
    assert native.csv_rows_consistent(b"1,2,3\n4,5\n", 2) == -1
    assert native.csv_rows_consistent(b"1,2\n3\n", 2) == -1
    # multithreaded path (> 4 MB), all rows consistent
    blob = b"12,345\n" * 800_000
    assert native.csv_rows_consistent(blob, 2) == 800_000
    assert native.csv_rows_consistent(blob + b"99\n", 2) == -1
