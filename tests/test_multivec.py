"""Multivector spaces (qdrant multivectors, MaxSim / ColBERT-style
late interaction): the device scoring op, the store's ragged
persistence, the engine surface, and the CLI. The reference app was
single-vector-only (reference core_system.py:659-664); this completes
the store's qdrant query model.
"""
import dataclasses
import json

import numpy as np
import pytest

from reverso_tpu.ops.multivec import maxsim_score_rows, maxsim_topk
from reverso_tpu.store import MultiVecIndex, StoreError, VectorStore

from test_topk import random_unit


def random_multi(rng, n, d, max_t=5, unit=True):
    rows = []
    for _ in range(n):
        t = int(rng.integers(0, max_t + 1))
        m = rng.normal(size=(t, d)).astype(np.float32)
        if t and unit:
            m /= np.linalg.norm(m, axis=1, keepdims=True)
        rows.append(m)
    return rows


def flat_of(rows, d):
    flat = (np.concatenate([m for m in rows if len(m)])
            if any(len(m) for m in rows) else np.zeros((0, d), np.float32))
    return flat, np.cumsum([len(m) for m in rows])


def brute_maxsim(rows, query, k, keep=None):
    """fp64 truth: sum over query rows of max over sub-vectors;
    empty points never match; (-score, idx) order."""
    q = np.atleast_2d(np.asarray(query, np.float64))
    out = []
    for i, m in enumerate(rows):
        if keep is not None and not keep[i]:
            continue
        if len(m) == 0:
            continue
        s = float((q @ np.asarray(m, np.float64).T).max(axis=1).sum())
        out.append((-s, i))
    out.sort()
    return [(i, -s) for s, i in out[:k]]


# ---------------------------------------------------------------------------
# op
# ---------------------------------------------------------------------------

def test_maxsim_topk_parity_fuzz():
    rng = np.random.default_rng(0)
    for trial in range(6):
        n = int(rng.integers(1, 50))
        d = int(rng.choice([8, 16, 32]))
        rows = random_multi(rng, n, d)
        flat, indptr = flat_of(rows, d)
        for _ in range(4):
            tq = int(rng.integers(1, 5))
            q = rng.normal(size=(tq, d)).astype(np.float32)
            k = int(rng.integers(1, 8))
            s, i = maxsim_topk(flat, indptr, [q], k)
            want = brute_maxsim(rows, q, k)
            got = [(int(ii), float(ss)) for ss, ii in zip(s[0], i[0])
                   if ii >= 0]
            assert [g[0] for g in got] == [w[0] for w in want], \
                (trial, got, want)
            np.testing.assert_allclose([g[1] for g in got],
                                       [w[1] for w in want], atol=1e-4)


def test_maxsim_topk_ragged_batch_and_single_vector():
    rng = np.random.default_rng(1)
    d = 16
    rows = random_multi(rng, 20, d)
    flat, indptr = flat_of(rows, d)
    q1 = rng.normal(size=(3, d)).astype(np.float32)
    q2 = rng.normal(size=d).astype(np.float32)          # [d] operand
    s, i = maxsim_topk(flat, indptr, [q1, q2], 4)
    assert s.shape == (2, 4)
    for row, q in enumerate([q1, q2]):
        want = brute_maxsim(rows, q, 4)
        got = [int(x) for x in i[row] if x >= 0]
        assert got == [w[0] for w in want]


def test_maxsim_topk_mask_empty_points_and_ties():
    d = 8
    e = np.eye(d, dtype=np.float32)
    rows = [e[:1], np.zeros((0, d), np.float32), e[:1], e[1:2]]
    flat, indptr = flat_of(rows, d)
    s, i = maxsim_topk(flat, indptr, [e[0]], 4)
    # rows 0 and 2 tie at 1.0 -> lower id first; empty row 1 absent;
    # row 3 scores 0.0 (orthogonal) but still matches
    assert i[0].tolist() == [0, 2, 3, -1]
    assert s[0][0] == s[0][1] == 1.0 and s[0][2] == 0.0
    mask = np.asarray([False, True, True, True])
    s, i = maxsim_topk(flat, indptr, [e[0]], 4, row_mask=mask)
    assert i[0].tolist() == [2, 3, -1, -1]


def test_maxsim_index_wrapper_chunks_and_bf16():
    rng = np.random.default_rng(2)
    d = 16
    rows = random_multi(rng, 25, d)
    flat, indptr = flat_of(rows, d)
    idx = MultiVecIndex(flat, indptr, dtype="bfloat16")
    idx._BLOCK_BYTES = 4 * 3 * max(len(flat), 1) * 2   # force chunking
    qs = [rng.normal(size=(3, d)).astype(np.float32) for _ in range(5)]
    s, i = idx.search(qs, 4)
    assert s.shape == (5, 4)
    for row, q in enumerate(qs):
        want = brute_maxsim(rows, q, 4)
        got = [int(x) for x in i[row] if x >= 0]
        # bf16 storage rounds sub-vectors; ids must match where the
        # fp64 score gaps are far above bf16 noise, so check top-1 only
        assert got[0] == want[0][0] or \
            abs(s[row][0] - want[0][1]) < 0.05


def test_maxsim_score_rows_host():
    rng = np.random.default_rng(3)
    d = 8
    rows = random_multi(rng, 10, d)
    q = rng.normal(size=(2, d)).astype(np.float32)
    scores = maxsim_score_rows(rows, q)
    for i, m in enumerate(rows):
        if len(m) == 0:
            assert np.isneginf(scores[i])
        else:
            want = (q.astype(np.float64)
                    @ m.astype(np.float64).T).max(axis=1).sum()
            np.testing.assert_allclose(scores[i], want, atol=1e-4)


def test_sharded_maxsim_matches_single_device():
    """Point-sharded MaxSim scan (8-device virtual mesh) returns the
    single-device ids exactly — masked and unmasked, ragged T with
    empty points, n_rows not divisible by the shard count."""
    import jax
    from jax.sharding import Mesh
    from reverso_tpu.ops.multivec import (shard_multivec_layout,
                                          sharded_maxsim_topk)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    rng = np.random.default_rng(7)
    for n, d, k in [(37, 16, 5), (64, 32, 10), (5, 8, 8)]:
        rows = random_multi(rng, n, d)
        flat, indptr = flat_of(rows, d)
        queries = [rng.normal(size=(3, d)).astype(np.float32),
                   rng.normal(size=(d,)).astype(np.float32)]
        subs_sh, seg_sh, local_rows = shard_multivec_layout(
            flat, indptr, 8)
        for mask in (None, (rng.random(n) < 0.5).astype(np.int8)):
            ref_s, ref_i = map(np.asarray, maxsim_topk(
                flat, indptr, queries, k, row_mask=mask))
            s, i = map(np.asarray, sharded_maxsim_topk(
                subs_sh, seg_sh, queries, k, mesh, n_rows=n,
                local_rows=local_rows, row_mask=mask))
            assert np.array_equal(i, ref_i), (n, d, k, mask is None)
            np.testing.assert_allclose(s, ref_s, atol=1e-5, rtol=1e-5)


def test_multivec_index_mesh_matches_single_device():
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    rng = np.random.default_rng(11)
    n, d = 29, 16
    rows = random_multi(rng, n, d)
    flat, indptr = flat_of(rows, d)
    single = MultiVecIndex(flat, indptr, dtype="float32")
    sharded = MultiVecIndex(flat, indptr, dtype="float32", mesh=mesh)
    qs = [rng.normal(size=(2, d)).astype(np.float32) for _ in range(3)]
    s1, i1 = single.search(qs, 6)
    s2, i2 = sharded.search(qs, 6)
    assert np.array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-5, rtol=1e-5)
    keep = (rng.random(n) < 0.4).astype(np.int8)
    s1, i1 = single.search(qs, 6, row_mask=keep)
    s2, i2 = sharded.search(qs, 6, row_mask=keep)
    assert np.array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# store persistence (the ragged machinery is shared with sparse and
# fuzz-covered in test_crashfuzz; these pin the multi-specific parts)
# ---------------------------------------------------------------------------

def make_store(tmp_path, n=12, d=8, dm=16, seed=0, name="mv"):
    rng = np.random.default_rng(seed)
    dense = random_unit(rng, n, d)
    rows = random_multi(rng, n, dm)
    s = VectorStore.create(str(tmp_path), name, d, multi={"tok": dm})
    s.append(dense, [{"region_id": f"r{i}"} for i in range(n)],
             multi_vectors={"tok": rows})
    s.flush()
    return s, dense, rows


def test_store_roundtrip_truncate_compact(tmp_path):
    s, dense, rows = make_store(tmp_path)
    for r, got in zip(range(12), s.multivector_rows("tok", range(12))):
        np.testing.assert_array_equal(got, rows[r])
    flat, indptr = s.multivectors("tok")
    assert indptr[-1] == sum(len(m) for m in rows)
    s.truncate(7)
    for r, got in zip(range(7), s.multivector_rows("tok", range(7))):
        np.testing.assert_array_equal(got, rows[r])
    keep = np.ones(7, bool)
    keep[[2, 4]] = False
    s.compact(keep)
    kept = [rows[i] for i in range(7) if keep[i]]
    for want, got in zip(kept, s.multivector_rows("tok", range(5))):
        np.testing.assert_array_equal(got, want)
    s.close()
    s2 = VectorStore.open(str(tmp_path), "mv")
    assert s2.multi == {"tok": 16} and s2.count == 5
    s2.close()


def test_store_update_multivectors(tmp_path):
    s, dense, rows = make_store(tmp_path)
    new = np.full((4, 16), 0.25, np.float32)
    assert s.update_multivectors([3], [new], "tok") == 1
    np.testing.assert_array_equal(s.multivector_rows("tok", [3])[0], new)
    np.testing.assert_array_equal(s.multivector_rows("tok", [4])[0],
                                  rows[4])
    with pytest.raises(StoreError, match="multivector rows"):
        s.update_multivectors([1], [np.zeros((2, 9), np.float32)], "tok")
    s.close()


def test_store_snapshot_roundtrip_multi(tmp_path):
    s, dense, rows = make_store(tmp_path)
    snap = str(tmp_path / "mv.snap")
    s.export_snapshot(snap)
    s.close()
    imp = VectorStore.import_snapshot(str(tmp_path), "mv2", snap)
    assert imp.multi == {"tok": 16}
    for r, got in zip(range(12), imp.multivector_rows("tok", range(12))):
        np.testing.assert_array_equal(got, rows[r])
    imp.close()


def test_append_requires_multi_cover(tmp_path):
    s, dense, rows = make_store(tmp_path)
    with pytest.raises(StoreError, match="multivectors for exactly"):
        s.append(dense[:1], [{}])
    with pytest.raises(StoreError, match="must be \\[\\*, 16\\]"):
        s.append(dense[:1], [{}],
                 multi_vectors={"tok": [np.zeros((1, 5), np.float32)]})
    s.close()


# ---------------------------------------------------------------------------
# engine surface
# ---------------------------------------------------------------------------

@pytest.fixture()
def multi_engine(tmp_path):
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso

    rng = np.random.default_rng(4)
    n, d, dm = 20, 8, 16
    dense = random_unit(rng, n, d)
    rows = random_multi(rng, n, dm)
    payloads = [{"region_id": f"r{i}",
                 "detected_class": "person" if i % 2 else "car"}
                for i in range(n)]
    root = str(tmp_path / "db")
    with VectorStore.create(root, "mv", d, multi={"tok": dm}) as s:
        s.append(dense, payloads, multi_vectors={"tok": rows})
    model = dataclasses.replace(MODEL_PRESETS["test-tiny"],
                                dtype="float32")
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=model,
        store=dataclasses.replace(cfg.store, root_dir=root,
                                  dtype="float32"))
    engine = Reverso(cfg)
    engine.load_database("mv")
    return engine, dense, rows


def test_engine_multivec_query_and_filter(multi_engine):
    engine, dense, rows = multi_engine
    rng = np.random.default_rng(5)
    q = rng.normal(size=(3, 16)).astype(np.float32)
    hits = engine.query(q.tolist(), k=6, using="tok")
    want = brute_maxsim(rows, q, 6)
    assert [h["id"] for h in hits] == [w[0] for w in want]
    np.testing.assert_allclose([h["score"] for h in hits],
                               [w[1] for w in want], atol=1e-4)
    hits = engine.query(q.tolist(), k=6, using="tok",
                        filter="detected_class=person")
    keep = [i % 2 == 1 for i in range(20)]
    want = brute_maxsim(rows, q, 6, keep=keep)
    assert [h["id"] for h in hits] == [w[0] for w in want]


def test_engine_multivec_hybrid_and_rescore(multi_engine):
    engine, dense, rows = multi_engine
    rng = np.random.default_rng(6)
    q = rng.normal(size=(2, 16)).astype(np.float32)
    dq = dense[3].tolist()
    hits = engine.query(prefetch=[{"query": q.tolist(), "using": "tok",
                                   "limit": 10},
                                  {"query": dq, "limit": 10}],
                        fusion="rrf", k=5)
    assert hits and 3 in [h["id"] for h in hits]
    # dense prefetch covering everything -> exact MaxSim rescore
    hits = engine.query(q.tolist(), prefetch=[{"query": dq, "limit": 20}],
                        using="tok", k=5)
    want = brute_maxsim(rows, q, 5)
    assert [h["id"] for h in hits] == [w[0] for w in want]


def test_engine_multivec_upsert_update_retrieve(multi_engine):
    engine, dense, rows = multi_engine
    rng = np.random.default_rng(7)
    nd = random_unit(rng, 1, 8)
    nm = [rng.normal(size=(2, 16)).astype(np.float32)]
    msg = engine.upsert_points({"": nd, "tok": nm},
                               [{"region_id": "new"}])
    assert msg.startswith("✅"), msg
    pts = engine.retrieve(["new"], with_vectors=True, using="tok")
    assert pts[0]["vector"].shape == (2, 16)
    np.testing.assert_allclose(
        np.linalg.norm(pts[0]["vector"], axis=1), 1.0, atol=1e-5)
    # query by point id in the multi space
    hits = engine.query(20, k=1, using="tok")
    assert hits and hits[0]["id"] == 20          # self max-sim = Tq
    msg = engine.update_vectors(
        ["new"], [rng.normal(size=(4, 16)).astype(np.float32)],
        using="tok")
    assert msg.startswith("✅"), msg
    pts = engine.retrieve(["new"], with_vectors=True, using="tok")
    assert pts[0]["vector"].shape == (4, 16)
    # missing multi space in upsert errors cleanly
    msg = engine.upsert_points(nd, [{}])
    assert msg.startswith("❌")


def test_engine_multivec_query_batch_falls_back(multi_engine):
    engine, dense, rows = multi_engine
    rng = np.random.default_rng(8)
    q = rng.normal(size=(2, 16)).astype(np.float32)
    res = engine.query_batch([
        {"query": q.tolist(), "using": "tok", "k": 3},
        {"query": dense[0].tolist(), "k": 3},
    ])
    want = brute_maxsim(rows, q, 3)
    assert [h["id"] for h in res[0]] == [w[0] for w in want]
    assert res[1][0]["id"] == 0


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def test_cli_multivec_upsert_query_update(tmp_path, capsys):
    from reverso_tpu.cli import main

    rng = np.random.default_rng(9)
    n, d, dm = 8, 8, 16
    dense = random_unit(rng, n, d)
    rows = random_multi(rng, n, dm)
    flat, indptr = flat_of(rows, dm)
    npz = str(tmp_path / "pts.npz")
    np.savez(npz, vectors=dense, multi_tok_vectors=flat,
             multi_tok_indptr=np.concatenate([[0], indptr]),
             payloads=np.asarray(
                 [json.dumps({"region_id": f"r{i}"}) for i in range(n)]))
    root = str(tmp_path / "db")
    rc = main(["--db-root", root, "--model", "test-tiny",
               "--index-dtype", "float32",
               "upsert", "climv", npz])
    out = capsys.readouterr()
    assert rc == 0, out.err

    q = rng.normal(size=(2, dm)).astype(np.float32)
    rc = main(["--db-root", root, "--model", "test-tiny",
               "--index-dtype", "float32",
               "query", "climv", "--target", json.dumps(q.tolist()),
               "--using", "tok", "--top-k", "4", "--json"])
    out = capsys.readouterr()
    assert rc == 0, out.err
    hits = json.loads(out.out)["hits"]
    want = brute_maxsim(rows, q, 4)
    assert [h["id"] for h in hits] == [w[0] for w in want]

    rc = main(["--db-root", root, "--model", "test-tiny",
               "info", "climv", "--json"])
    out = capsys.readouterr()
    assert rc == 0
    assert json.loads(out.out)["multivectors"] == {"tok": dm}

    # multivector update via flat + indptr npz
    up = str(tmp_path / "up.npz")
    new = rng.normal(size=(3, dm)).astype(np.float32)
    np.savez(up, ids=np.asarray([2]), vectors=new,
             indptr=np.asarray([0, 3], np.int64))
    rc = main(["--db-root", root, "--model", "test-tiny",
               "update-vectors", "climv", up, "--space", "tok"])
    out = capsys.readouterr()
    assert rc == 0, out.err
    st = VectorStore.open(root, "climv")
    got = st.multivector_rows("tok", [2])[0]
    st.close()
    assert got.shape == (3, dm)
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0,
                               atol=1e-5)
