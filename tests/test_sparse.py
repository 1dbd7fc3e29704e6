"""Sparse vector spaces (qdrant sparse vectors): store persistence,
the host-side inverted index, hybrid search through the universal
query API, and the CLI surface. The reference app was dense-only
(reference core_system.py:659-664); sparse completes the store's
qdrant query model so hybrid dense+sparse search works.
"""
import dataclasses
import json
import os

import numpy as np
import pytest

from reverso_tpu.store import SparseIndex, StoreError, VectorStore
from reverso_tpu.store.persist import (
    SPARSE_ENTRY,
    SPARSE_FMT,
    SPARSE_IDX_FMT,
    check_sparse_row,
)

from test_topk import random_unit


def random_sparse(rng, n, vocab=200, max_nnz=8):
    rows = []
    for _ in range(n):
        nnz = int(rng.integers(0, max_nnz + 1))
        idx = rng.choice(vocab, size=nnz, replace=False)
        rows.append({"indices": idx.astype(np.int64),
                     "values": rng.normal(size=nnz).astype(np.float32)})
    return rows


def brute_topk(rows, query, k, keep=None):
    """fp64 truth: (-score, idx) order, rows sharing no query term
    excluded."""
    q = dict(zip(np.asarray(query["indices"]).tolist(),
                 np.asarray(query["values"]).tolist()))
    out = []
    for i, r in enumerate(rows):
        if keep is not None and not keep[i]:
            continue
        d = dict(zip(np.asarray(r["indices"]).tolist(),
                     np.asarray(r["values"]).tolist()))
        shared = [t for t in q if t in d]
        if not shared:
            continue
        out.append((-sum(float(d[t]) * float(q[t]) for t in sorted(d)
                         if t in q), i))
    out.sort()
    return [(i, -s) for s, i in out[:k]]


# ---------------------------------------------------------------------------
# row validation
# ---------------------------------------------------------------------------

def test_check_sparse_row_sorts_and_validates():
    i, v = check_sparse_row({"indices": [5, 1, 3], "values": [5., 1., 3.]})
    assert i.tolist() == [1, 3, 5] and v.tolist() == [1., 3., 5.]
    i, v = check_sparse_row(None)
    assert len(i) == 0 and len(v) == 0
    i, v = check_sparse_row(([2], [0.5]))             # pair form
    assert i.tolist() == [2]
    with pytest.raises(StoreError, match="duplicate"):
        check_sparse_row({"indices": [1, 1], "values": [1., 2.]})
    with pytest.raises(StoreError, match="indices but"):
        check_sparse_row({"indices": [1, 2], "values": [1.]})
    with pytest.raises(StoreError, match="u32"):
        check_sparse_row({"indices": [-1], "values": [1.]})


# ---------------------------------------------------------------------------
# store persistence
# ---------------------------------------------------------------------------

def make_store(tmp_path, n=12, dim=16, seed=0, name="sp"):
    rng = np.random.default_rng(seed)
    dense = random_unit(rng, n, dim)
    rows = random_sparse(rng, n)
    s = VectorStore.create(str(tmp_path), name, dim, sparse={"text": {}})
    s.append(dense, [{"region_id": f"r{i}"} for i in range(n)],
             {"text": rows})
    s.flush()
    return s, dense, rows


def assert_rows_equal(got, want):
    wi, wv = check_sparse_row(want)
    assert got["indices"].tolist() == wi.tolist()
    np.testing.assert_array_equal(got["values"], wv)


def test_store_roundtrip_and_reopen(tmp_path):
    s, dense, rows = make_store(tmp_path)
    for r, got in zip([0, 5, 11], s.sparse_rows("text", [0, 5, 11])):
        assert_rows_equal(got, rows[r])
    s.close()
    s2 = VectorStore.open(str(tmp_path), "sp")
    assert s2.sparse == {"text": {}}
    for r, got in zip(range(12), s2.sparse_rows("text", range(12))):
        assert_rows_equal(got, rows[r])
    # out-of-range -> None
    assert s2.sparse_rows("text", [99]) == [None]
    s2.close()


def test_append_requires_every_sparse_space(tmp_path):
    s, dense, rows = make_store(tmp_path)
    with pytest.raises(StoreError, match="sparse vectors for exactly"):
        s.append(dense[:1], [{}])
    with pytest.raises(StoreError, match="expected 1"):
        s.append(dense[:1], [{}], {"text": []})
    with pytest.raises(StoreError, match="sparse vectors for exactly"):
        s.append(dense[:1], [{}], {"text": [None], "bogus": [None]})
    s.close()


def test_sparse_name_collision_and_validation(tmp_path):
    with pytest.raises(StoreError, match="collides"):
        VectorStore.create(str(tmp_path), "x", 8, named={"a": 4},
                           sparse={"a": {}})
    with pytest.raises(StoreError, match="bad sparse space name"):
        VectorStore.create(str(tmp_path), "x", 8, sparse={"a/b": {}})


def test_torn_tail_trimmed_on_writable_open(tmp_path):
    s, dense, rows = make_store(tmp_path)
    path = s.path
    s.close()
    # torn append: extra entry bytes + an extra indptr row beyond count
    with open(os.path.join(path, SPARSE_FMT.format("text")), "ab") as f:
        f.write(b"\x01" * (3 * SPARSE_ENTRY.itemsize))
    with open(os.path.join(path, SPARSE_IDX_FMT.format("text")), "ab") as f:
        f.write(np.asarray([999], "<i8").tobytes())
    # read-only open ignores the tail
    ro = VectorStore.open(str(tmp_path), "sp")
    for r, got in zip(range(12), ro.sparse_rows("text", range(12))):
        assert_rows_equal(got, rows[r])
    ro.close()
    # writable open physically trims, then appends land clean
    w = VectorStore.open(str(tmp_path), "sp", writable=True)
    extra = {"indices": [7], "values": [2.0]}
    w.append(dense[:1], [{"region_id": "new"}], {"text": [extra]})
    w.flush()
    assert_rows_equal(w.sparse_rows("text", [12])[0], extra)
    w.close()


def test_truncate_and_counts(tmp_path):
    s, dense, rows = make_store(tmp_path)
    total5 = s._sparse_total("text", 5)
    s.truncate(5)
    assert s.count == 5
    assert os.path.getsize(
        os.path.join(s.path, SPARSE_FMT.format("text"))) == \
        total5 * SPARSE_ENTRY.itemsize
    assert os.path.getsize(
        os.path.join(s.path, SPARSE_IDX_FMT.format("text"))) == 5 * 8
    for r, got in zip(range(5), s.sparse_rows("text", range(5))):
        assert_rows_equal(got, rows[r])
    s.close()


def test_compact_keeps_selected_sparse_rows(tmp_path):
    s, dense, rows = make_store(tmp_path)
    keep = np.ones(12, bool)
    keep[[1, 4, 7]] = False
    removed = s.compact(keep)
    assert removed == 3 and s.count == 9
    kept = [r for i, r in enumerate(rows) if keep[i]]
    for want, got in zip(kept, s.sparse_rows("text", range(9))):
        assert_rows_equal(got, want)
    s.close()
    # reopen agrees
    s2 = VectorStore.open(str(tmp_path), "sp")
    for want, got in zip(kept, s2.sparse_rows("text", range(9))):
        assert_rows_equal(got, want)
    s2.close()


def test_update_sparse_vectors_roundtrip_and_errors(tmp_path):
    s, dense, rows = make_store(tmp_path)
    new3 = {"indices": [0, 9], "values": [1.5, -2.0]}
    new7 = None                                       # now empty
    assert s.update_sparse_vectors([3, 7], [new3, new7], "text") == 2
    assert_rows_equal(s.sparse_rows("text", [3])[0], new3)
    got7 = s.sparse_rows("text", [7])[0]
    assert len(got7["indices"]) == 0
    # untouched neighbors intact
    assert_rows_equal(s.sparse_rows("text", [2])[0], rows[2])
    assert_rows_equal(s.sparse_rows("text", [8])[0], rows[8])
    with pytest.raises(StoreError, match="duplicate"):
        s.update_sparse_vectors([1, 1], [new3, new3], "text")
    with pytest.raises(StoreError, match="row ids must be"):
        s.update_sparse_vectors([99], [new3], "text")
    with pytest.raises(StoreError, match="unknown sparse space"):
        s.update_sparse_vectors([1], [new3], "nope")
    s.close()
    s2 = VectorStore.open(str(tmp_path), "sp")
    assert_rows_equal(s2.sparse_rows("text", [3])[0], new3)
    s2.close()


def test_interrupted_sparse_update_rolls_forward(tmp_path):
    """Stage files + commit marker present (crash after the commit
    point): open() must finish the renames and install the marker
    meta. Stage files WITHOUT a marker are swept."""
    s, dense, rows = make_store(tmp_path)
    path = s.path
    ent_path, idx_path = s._sparse_paths("text")
    new0 = {"indices": [42], "values": [9.0]}

    # build the staged rewrite by running the real update, then undo
    # the renames to simulate the crash window
    meta_before = json.load(open(os.path.join(path, "meta.json")))
    assert s.update_sparse_vectors([0], [new0], "text") == 1
    staged_ent = open(ent_path, "rb").read()
    staged_idx = open(idx_path, "rb").read()
    meta_after = json.load(open(os.path.join(path, "meta.json")))
    s.close()

    # reconstruct: pre-update data files, stage files + marker present
    os.replace(ent_path, ent_path + ".compact")
    os.replace(idx_path, idx_path + ".compact")
    with VectorStore.create(str(tmp_path), "donor", 16,
                            sparse={"text": {}}) as donor:
        donor.append(dense, [{"region_id": f"r{i}"} for i in range(12)],
                     {"text": rows})
    os.replace(os.path.join(str(tmp_path), "donor",
                            SPARSE_FMT.format("text")), ent_path)
    os.replace(os.path.join(str(tmp_path), "donor",
                            SPARSE_IDX_FMT.format("text")), idx_path)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta_before, f)
    with open(os.path.join(path, "compact.commit"), "w") as f:
        json.dump(meta_after, f)

    s2 = VectorStore.open(str(tmp_path), "sp")        # rolls forward
    assert s2.data_version == meta_after["data_version"]
    assert_rows_equal(s2.sparse_rows("text", [0])[0], new0)
    assert open(ent_path, "rb").read() == staged_ent
    assert open(idx_path, "rb").read() == staged_idx
    assert not os.path.exists(os.path.join(path, "compact.commit"))
    s2.close()

    # markerless stage files are inert leftovers: swept, data untouched
    with open(ent_path + ".compact", "wb") as f:
        f.write(b"junk")
    s3 = VectorStore.open(str(tmp_path), "sp")
    assert not os.path.exists(ent_path + ".compact")
    assert_rows_equal(s3.sparse_rows("text", [0])[0], new0)
    s3.close()


def test_snapshot_roundtrip_with_sparse(tmp_path):
    s, dense, rows = make_store(tmp_path)
    snap = str(tmp_path / "sp.snap")
    s.export_snapshot(snap)
    s.close()
    imp = VectorStore.import_snapshot(str(tmp_path), "sp2", snap)
    assert imp.sparse == {"text": {}} and imp.count == 12
    for r, got in zip(range(12), imp.sparse_rows("text", range(12))):
        assert_rows_equal(got, rows[r])
    imp.close()


def test_snapshot_validates_sparse_sizes(tmp_path):
    import tarfile

    s, dense, rows = make_store(tmp_path)
    snap = str(tmp_path / "sp.snap")
    s.export_snapshot(snap)
    s.close()
    # corrupt: shrink the entry member by one entry
    bad = str(tmp_path / "bad.snap")
    with tarfile.open(snap) as src, tarfile.open(bad, "w") as dst:
        for m in src.getmembers():
            data = src.extractfile(m).read()
            if m.name == SPARSE_FMT.format("text"):
                data = data[:-SPARSE_ENTRY.itemsize]
                m.size = len(data)
            import io
            dst.addfile(m, io.BytesIO(data))
    with pytest.raises(StoreError, match="entry bytes"):
        VectorStore.import_snapshot(str(tmp_path), "spbad", bad)


def test_corrupt_sparse_files_detected_on_open(tmp_path):
    s, dense, rows = make_store(tmp_path)
    path = s.path
    s.close()
    ent = os.path.join(path, SPARSE_FMT.format("text"))
    with open(ent, "r+b") as f:
        os.ftruncate(f.fileno(), os.path.getsize(ent) - 8)
    with pytest.raises(StoreError, match="entry bytes"):
        VectorStore.open(str(tmp_path), "sp")


# ---------------------------------------------------------------------------
# inverted index
# ---------------------------------------------------------------------------

def test_sparse_index_parity_fuzz(tmp_path):
    rng = np.random.default_rng(7)
    for trial in range(6):
        n = int(rng.integers(1, 60))
        rows = random_sparse(rng, n, vocab=30, max_nnz=6)
        idx = SparseIndex.build(*_entries(rows))
        for _ in range(8):
            qn = int(rng.integers(1, 6))
            q = {"indices": rng.choice(30, size=qn, replace=False),
                 "values": rng.normal(size=qn).astype(np.float32)}
            k = int(rng.integers(1, 8))
            sc, ids = idx.search(q, k)
            want = brute_topk(rows, q, k)
            got = [(int(i), float(s)) for s, i in zip(sc, ids) if i >= 0]
            assert [g[0] for g in got] == [w[0] for w in want], \
                (trial, got, want)
            np.testing.assert_allclose([g[1] for g in got],
                                       [w[1] for w in want], atol=1e-5)


def _entries(rows):
    parts = [check_sparse_row(r) for r in rows]
    nnz = np.asarray([len(i) for i, _ in parts], np.int64)
    ent = np.zeros(int(nnz.sum()), SPARSE_ENTRY)
    if len(ent):
        ent["i"] = np.concatenate([i for i, _ in parts])
        ent["v"] = np.concatenate([v for _, v in parts])
    return ent, np.cumsum(nnz)


def test_sparse_index_ties_and_no_overlap():
    # identical rows tie -> lower id first; disjoint rows never match
    rows = [{"indices": [3], "values": [1.0]},
            {"indices": [3], "values": [1.0]},
            {"indices": [9], "values": [50.0]}]
    idx = SparseIndex.build(*_entries(rows))
    sc, ids = idx.search({"indices": [3], "values": [2.0]}, 4)
    assert ids.tolist() == [0, 1, -1, -1]
    assert sc[0] == sc[1] == 2.0


def test_sparse_index_mask_and_threshold():
    rows = [{"indices": [1], "values": [3.0]},
            {"indices": [1], "values": [2.0]},
            {"indices": [1], "values": [1.0]}]
    idx = SparseIndex.build(*_entries(rows))
    mask = np.asarray([False, True, True])
    sc, ids = idx.search({"indices": [1], "values": [1.0]}, 3,
                         row_mask=mask)
    assert ids.tolist() == [1, 2, -1]
    sc, ids = idx.search({"indices": [1], "values": [1.0]}, 3,
                         threshold=1.5)
    assert ids.tolist() == [0, 1, -1]


def test_sparse_index_cache_roundtrip(tmp_path):
    s, dense, rows = make_store(tmp_path)
    s.close()
    ro = VectorStore.open(str(tmp_path), "sp")
    idx = SparseIndex.from_store(ro, "text")
    cache = SparseIndex._cache_path(ro, "text")
    assert os.path.exists(cache)
    idx2 = SparseIndex.from_store(ro, "text")         # cache hit
    q = {"indices": rows[0]["indices"], "values": rows[0]["values"]}
    if len(np.asarray(q["indices"])):
        np.testing.assert_array_equal(idx.search(q, 5)[1],
                                      idx2.search(q, 5)[1])
    # stale cache (row count mismatch) is ignored, not served
    stale = SparseIndex._load(cache, ro.count + 1)
    assert stale is None
    ro.close()


# ---------------------------------------------------------------------------
# engine surface
# ---------------------------------------------------------------------------

@pytest.fixture()
def sparse_engine(tmp_path):
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso

    rng = np.random.default_rng(3)
    n, d = 24, 32
    dense = random_unit(rng, n, d)
    rows = random_sparse(rng, n, vocab=50, max_nnz=5)
    payloads = [{"region_id": f"r{i}",
                 "detected_class": "person" if i % 3 == 0 else "car"}
                for i in range(n)]
    root = str(tmp_path / "db")
    with VectorStore.create(root, "hyb", d, sparse={"text": {}}) as s:
        s.append(dense, payloads, {"text": rows})
    model = dataclasses.replace(MODEL_PRESETS["test-tiny"],
                                dtype="float32")
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=model,
        store=dataclasses.replace(cfg.store, root_dir=root))
    engine = Reverso(cfg)
    engine.load_database("hyb")
    return engine, dense, rows


def test_engine_sparse_query_parity(sparse_engine):
    engine, dense, rows = sparse_engine
    q = {"indices": [int(i) for i in rows[4]["indices"]],
         "values": [float(v) for v in rows[4]["values"]]}
    if not q["indices"]:
        q = {"indices": [1, 2], "values": [1.0, 1.0]}
    hits = engine.query(q, k=6, using="text")
    want = brute_topk(rows, q, 6)
    assert [h["id"] for h in hits] == [w[0] for w in want]
    np.testing.assert_allclose([h["score"] for h in hits],
                               [w[1] for w in want], atol=1e-5)
    # filtered
    from reverso_tpu.store.filter import payload_mask
    hits = engine.query(q, k=6, using="text",
                        filter="detected_class=person")
    keep = [i % 3 == 0 for i in range(24)]
    want = brute_topk(rows, q, 6, keep=keep)
    assert [h["id"] for h in hits] == [w[0] for w in want]


def test_engine_sparse_point_id_query(sparse_engine):
    engine, dense, rows = sparse_engine
    # pick a row with entries
    rid = next(i for i, r in enumerate(rows) if len(r["indices"]))
    hits = engine.query(rid, k=3, using="text")
    assert hits and hits[0]["id"] == rid          # self-dot is max? not
    # necessarily max, but the row itself must appear (it overlaps)
    hits2 = engine.query(f"r{rid}", k=3, using="text")
    assert [h["id"] for h in hits2] == [h["id"] for h in hits]


def test_engine_hybrid_fusion_and_rescore(sparse_engine):
    engine, dense, rows = sparse_engine
    rid = next(i for i, r in enumerate(rows) if len(r["indices"]))
    sq = {"indices": [int(i) for i in rows[rid]["indices"]],
          "values": [float(v) for v in rows[rid]["values"]]}
    dq = dense[rid].tolist()
    # RRF fusion of a sparse and a dense branch
    hits = engine.query(prefetch=[{"query": sq, "using": "text",
                                   "limit": 8},
                                  {"query": dq, "limit": 8}],
                        fusion="rrf", k=5)
    assert hits and rid in [h["id"] for h in hits]
    # dense prefetch, exact sparse rescore
    hits = engine.query(sq, prefetch=[{"query": dq, "limit": 24}],
                        using="text", k=5)
    want = brute_topk(rows, sq, 5)
    assert [h["id"] for h in hits] == [w[0] for w in want]
    # sparse prefetch, exact dense rescore
    hits = engine.query(dq, prefetch=[{"query": sq, "using": "text",
                                       "limit": 24}], k=5)
    cand = {w[0] for w in brute_topk(rows, sq, 24)}
    assert all(h["id"] in cand for h in hits)
    scores = dense[sorted(cand)] @ np.asarray(dq, np.float32)
    best = sorted(zip(-scores, sorted(cand)))[0][1]
    assert hits[0]["id"] == best


def test_engine_sparse_upsert_update_retrieve(sparse_engine):
    engine, dense, rows = sparse_engine
    rng = np.random.default_rng(9)
    nd = random_unit(rng, 2, 32)
    nsp = [{"indices": [100], "values": [5.0]},
           {"indices": [100, 101], "values": [1.0, 2.0]}]
    msg = engine.upsert_points({"": nd, "text": nsp},
                               [{"region_id": "n0"}, {"region_id": "n1"}])
    assert msg.startswith("✅"), msg
    hits = engine.query({"indices": [100], "values": [1.0]}, k=3,
                        using="text")
    assert [h["id"] for h in hits] == [24, 25]
    # retrieve sparse vectors
    pts = engine.retrieve([24], with_payload=False, with_vectors=True,
                          using="text")
    assert pts[0]["vector"]["indices"].tolist() == [100]
    # update the sparse side only
    msg = engine.update_vectors(["n0"], [{"indices": [101],
                                          "values": [10.0]}],
                                using="text")
    assert msg.startswith("✅"), msg
    hits = engine.query({"indices": [101], "values": [1.0]}, k=2,
                        using="text")
    assert hits[0]["id"] == 24 and abs(hits[0]["score"] - 10.0) < 1e-6
    # missing sparse space in upsert errors cleanly
    msg = engine.upsert_points(nd, [{}, {}])
    assert msg.startswith("❌")


def test_engine_sparse_unsupported_surfaces_error(sparse_engine):
    engine, dense, rows = sparse_engine
    # recommend reports via its (text, items) error contract
    text, items = engine.recommend(positive=[0], using="text")
    assert text.startswith("❌") and "text" in text and items == []
    with pytest.raises(StoreError, match="sparse|unknown vector space"):
        engine.search_matrix(sample=4, limit=2, using="text")


def test_engine_query_batch_sparse_falls_back(sparse_engine):
    engine, dense, rows = sparse_engine
    rid = next(i for i, r in enumerate(rows) if len(r["indices"]))
    sq = {"indices": [int(i) for i in rows[rid]["indices"]],
          "values": [float(v) for v in rows[rid]["values"]]}
    res = engine.query_batch([
        {"query": sq, "using": "text", "k": 3},
        {"query": dense[0].tolist(), "k": 3},
    ])
    assert len(res) == 2
    want = brute_topk(rows, sq, 3)
    assert [h["id"] for h in res[0]] == [w[0] for w in want]
    assert res[1][0]["id"] == 0


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def test_cli_sparse_upsert_query_update(tmp_path, capsys):
    from reverso_tpu.cli import main

    rng = np.random.default_rng(5)
    n, d = 10, 16
    dense = random_unit(rng, n, d)
    rows = random_sparse(rng, n, vocab=40, max_nnz=4)
    parts = [check_sparse_row(r) for r in rows]
    indptr = np.concatenate(
        [[0], np.cumsum([len(i) for i, _ in parts])]).astype(np.int64)
    npz = str(tmp_path / "pts.npz")
    np.savez(npz, vectors=dense,
             sparse_text_indices=np.concatenate(
                 [i for i, _ in parts]).astype(np.int64),
             sparse_text_values=np.concatenate([v for _, v in parts]),
             sparse_text_indptr=indptr,
             payloads=np.asarray(
                 [json.dumps({"region_id": f"r{i}"}) for i in range(n)]))
    root = str(tmp_path / "db")
    rc = main(["--db-root", root, "--model", "test-tiny",
               "upsert", "clisp", npz])
    out = capsys.readouterr()
    assert rc == 0, out.err

    rid = next(i for i, r in enumerate(rows) if len(r["indices"]))
    q = {"indices": [int(i) for i in rows[rid]["indices"]],
         "values": [float(v) for v in rows[rid]["values"]]}
    rc = main(["--db-root", root, "--model", "test-tiny",
               "query", "clisp", "--target", json.dumps(q),
               "--using", "text", "--top-k", "4", "--json"])
    out = capsys.readouterr()
    assert rc == 0, out.err
    hits = json.loads(out.out)["hits"]
    want = brute_topk(rows, q, 4)
    assert [h["id"] for h in hits] == [w[0] for w in want]

    # info lists the sparse space
    rc = main(["--db-root", root, "--model", "test-tiny",
               "info", "clisp", "--json"])
    out = capsys.readouterr()
    assert rc == 0
    assert json.loads(out.out)["sparse_vectors"] == ["text"]

    # sparse update-vectors via CSR npz
    up = str(tmp_path / "up.npz")
    np.savez(up, ids=np.asarray([rid]),
             indices=np.asarray([33], np.int64),
             values=np.asarray([7.0], np.float32),
             indptr=np.asarray([0, 1], np.int64))
    rc = main(["--db-root", root, "--model", "test-tiny",
               "update-vectors", "clisp", up, "--space", "text"])
    out = capsys.readouterr()
    assert rc == 0, out.err
    rc = main(["--db-root", root, "--model", "test-tiny",
               "query", "clisp", "--target",
               json.dumps({"indices": [33], "values": [1.0]}),
               "--using", "text", "--top-k", "1", "--json"])
    out = capsys.readouterr()
    assert rc == 0
    hits = json.loads(out.out)["hits"]
    assert hits and hits[0]["id"] == rid and \
        abs(hits[0]["score"] - 7.0) < 1e-6


def test_native_sparse_score_parity(monkeypatch):
    """Native C++ postings accumulate == the numpy reference, bitwise
    (same f64 per-row segment order), across hot/cold terms, duplicate
    rows across segments, and masked/thresholded searches."""
    from reverso_tpu import native as native_mod
    from reverso_tpu.store.sparse import SparseIndex

    if not native_mod.native_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    n, nnz, vocab = 5000, 20, 40   # tiny vocab -> huge postings lists
    # store invariant: indices UNIQUE within a row (check_sparse_row)
    terms, vals, ends = [], [], []
    total = 0
    for _ in range(n):
        t = rng.choice(vocab, nnz, replace=False)
        terms.append(t)
        vals.append(rng.standard_normal(nnz).astype(np.float32))
        total += nnz
        ends.append(total)
    entries = np.empty(total, dtype=[("i", np.uint32), ("v", np.float32)])
    entries["i"] = np.concatenate(terms).astype(np.uint32)
    entries["v"] = np.concatenate(vals)
    indptr = np.asarray(ends, np.int64)
    idx = SparseIndex.build(entries, indptr)
    assert idx.rows.dtype == np.int32

    for trial in range(8):
        w = int(rng.integers(1, 8))
        q_idx = rng.choice(vocab + 5, w, replace=False)  # some missing
        q = {"indices": q_idx.tolist(),
             "values": rng.standard_normal(w).astype(np.float32).tolist()}
        mask = (rng.random(n) < 0.7) if trial % 2 else None
        s_nat, i_nat = idx.search(q, 12, row_mask=mask)
        monkeypatch.setattr(native_mod, "_LIB", None)
        monkeypatch.setattr(native_mod, "_TRIED", True)
        s_py, i_py = idx.search(q, 12, row_mask=mask)
        monkeypatch.undo()
        np.testing.assert_array_equal(i_nat, i_py)
        np.testing.assert_array_equal(s_nat, s_py)   # bitwise


def test_native_sparse_score_parity_threaded(monkeypatch):
    """Parity with the MULTITHREADED row-partition path: the native
    scorer forces n_threads=1 below 65536 touched postings
    (native/reverso_native.cpp), so this corpus is sized to exceed it —
    10-term vocab, 20k rows x 6 nnz = 120k postings, and the query
    names every term (>= 65536 touched => threads actually run)."""
    from reverso_tpu import native as native_mod
    from reverso_tpu.store.sparse import SparseIndex

    if not native_mod.native_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(17)
    n, nnz, vocab = 20000, 6, 10
    terms, vals, ends = [], [], []
    total = 0
    for _ in range(n):
        t = rng.choice(vocab, nnz, replace=False)  # unique within row
        terms.append(t)
        vals.append(rng.standard_normal(nnz).astype(np.float32))
        total += nnz
        ends.append(total)
    entries = np.empty(total, dtype=[("i", np.uint32), ("v", np.float32)])
    entries["i"] = np.concatenate(terms).astype(np.uint32)
    entries["v"] = np.concatenate(vals)
    idx = SparseIndex.build(entries, np.asarray(ends, np.int64))
    q = {"indices": list(range(vocab)),
         "values": rng.standard_normal(vocab).astype(np.float32).tolist()}
    for mask in (None, rng.random(n) < 0.6):
        s_nat, i_nat = idx.search(q, 25, row_mask=mask)
        monkeypatch.setattr(native_mod, "_LIB", None)
        monkeypatch.setattr(native_mod, "_TRIED", True)
        s_py, i_py = idx.search(q, 25, row_mask=mask)
        monkeypatch.undo()
        np.testing.assert_array_equal(i_nat, i_py)
        np.testing.assert_array_equal(s_nat, s_py)   # bitwise


def test_query_batch_hybrid_sparse_dense(sparse_engine):
    """query_batch's round-5 branch coalescing: hybrid requests whose
    DENSE branch coalesces across the batch while the sparse branch
    runs host-side per request == sequential query() exactly."""
    engine, dense, rows = sparse_engine
    reqs = []
    for rid in range(6):
        if not len(rows[rid]["indices"]):
            continue
        sq = {"indices": [int(i) for i in rows[rid]["indices"]],
              "values": [float(v) for v in rows[rid]["values"]]}
        reqs.append({"prefetch": [
            {"query": sq, "using": "text", "limit": 8},
            {"query": dense[rid].tolist(), "limit": 8}],
            "fusion": "rrf", "k": 5})
        reqs.append({"query": dense[(rid + 1) % 24].tolist(),
                     "prefetch": [{"query": sq, "using": "text",
                                   "limit": 12},
                                  {"query": dense[rid].tolist(),
                                   "limit": 12}], "k": 4})
    assert len(reqs) >= 4
    seq = [engine.query(**dict(r)) for r in reqs]
    got = engine.query_batch(reqs)
    assert got == seq
