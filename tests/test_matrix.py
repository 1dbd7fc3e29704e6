"""Distance-matrix API (qdrant's search_matrix_pairs / offsets role),
random sampling in the universal query, and batched universal queries
(query_batch_points role) — the remaining qdrant points surface over
the reference's store (reference core_system.py:659-664).
"""
import dataclasses

import numpy as np
import pytest
import jax

from reverso_tpu.ops.recommend import matrix_topk
from reverso_tpu.store import VectorStore, StoreError

from test_topk import random_unit


# ---------------------------------------------------------------------------
# fp64 truth
# ---------------------------------------------------------------------------

def numpy_matrix64(vecs, limit):
    """Per-row top-`limit` other-row neighbors in fp64, (-score, idx)."""
    g = vecs.astype(np.float64) @ vecs.astype(np.float64).T
    np.fill_diagonal(g, -np.inf)
    out_s, out_i = [], []
    for r in range(len(vecs)):
        order = np.lexsort((np.arange(len(vecs)), -g[r]))[:limit]
        s = g[r][order]
        out_s.append(np.pad(s, (0, limit - len(s)),
                            constant_values=-np.inf))
        i = np.where(np.isneginf(s), -1, order)
        out_i.append(np.pad(i, (0, limit - len(i)), constant_values=-1))
    return np.asarray(out_s), np.asarray(out_i, np.int32)


def assert_matrix_equiv(vecs, s, i, limit, tol=1e-5):
    ts, ti = numpy_matrix64(vecs, limit)
    s, i = np.asarray(s), np.asarray(i)
    np.testing.assert_array_equal(i < 0, ti < 0)
    valid = ti >= 0
    np.testing.assert_allclose(np.where(valid, s, 0.0),
                               np.where(valid, ts, 0.0), atol=tol)
    # ids must match wherever the fp64 score gap is clear
    clear = np.ones_like(valid)
    with np.errstate(invalid="ignore"):     # -inf minus -inf pad slots
        clear[:, :-1] &= (ts[:, :-1] - ts[:, 1:]) > tol
        clear[:, 1:] &= (ts[:, :-1] - ts[:, 1:]) > tol
    np.testing.assert_array_equal(np.where(clear & valid, i, -1),
                                  np.where(clear & valid, ti, -1))


# ---------------------------------------------------------------------------
# op
# ---------------------------------------------------------------------------

def test_matrix_topk_vs_fp64():
    rng = np.random.default_rng(0)
    v = random_unit(rng, 37, 48)
    s, i = jax.device_get(matrix_topk(v, 5))
    assert_matrix_equiv(v, s, i, 5)


def test_matrix_topk_padded_rows_masked():
    rng = np.random.default_rng(1)
    v = random_unit(rng, 19, 32)
    pad = np.concatenate([v, np.zeros((13, 32), np.float32)])
    s, i = jax.device_get(matrix_topk(pad, 4, n_valid=19))
    assert_matrix_equiv(v, s[:19], i[:19], 4)
    # pad rows report nothing, and no real row points at a pad column
    assert (i[19:] == -1).all() and (s[19:] == -np.inf).all()
    assert (i[:19] < 19).all()


def test_matrix_topk_limit_exceeds_sample():
    rng = np.random.default_rng(2)
    v = random_unit(rng, 3, 16)
    s, i = jax.device_get(matrix_topk(v, 6))
    assert_matrix_equiv(v, s, i, 6)        # cols 2.. are -1 (only 2 others)
    assert (i[:, 2:] == -1).all()


# ---------------------------------------------------------------------------
# engine surface
# ---------------------------------------------------------------------------

@pytest.fixture()
def engine_store(tmp_path):
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso

    model = dataclasses.replace(MODEL_PRESETS["test-tiny"], dtype="float32")
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=model,
        store=dataclasses.replace(cfg.store,
                                  root_dir=str(tmp_path / "db")))
    engine = Reverso(cfg)
    rng = np.random.default_rng(0)
    d = 64
    vecs = random_unit(rng, 40, d)
    payloads = [{"filename": f"f{i}.jpg", "region_id": f"r{i}",
                 "detected_class": "person" if i % 4 == 0 else "car",
                 "confidence": i / 40}
                for i in range(40)]
    with VectorStore.create(str(tmp_path / "db"), "mat", d) as s:
        s.append(vecs, payloads)
    engine.load_database("mat")
    return engine, vecs


def test_search_matrix_pairs_full_sample(engine_store):
    engine, vecs = engine_store
    # sample >= count takes every row: verifiable against fp64 truth
    pairs = engine.search_matrix(sample=64, limit=3)
    ts, ti = numpy_matrix64(vecs, 3)
    want = [(r, int(ti[r, j]), ts[r, j])
            for r in range(40) for j in range(3) if ti[r, j] >= 0]
    assert len(pairs) == len(want)
    for p, (a, b, sc) in zip(pairs, want):
        assert p["id_a"] == a and p["id_b"] == b
        assert abs(p["score"] - sc) < 1e-5
        assert p["id_a"] != p["id_b"]


def test_search_matrix_seeded_and_filtered(engine_store):
    engine, _ = engine_store
    f = {"must": [{"key": "detected_class",
                   "match": {"value": "person"}}]}
    p1 = engine.search_matrix(sample=5, limit=2, filter=f, seed=7)
    p2 = engine.search_matrix(sample=5, limit=2, filter=f, seed=7)
    assert p1 == p2 and p1
    for p in p1:                        # persons are ids 0, 4, 8, ...
        assert p["id_a"] % 4 == 0 and p["id_b"] % 4 == 0


def test_search_matrix_offsets_consistent(engine_store):
    engine, _ = engine_store
    pairs = engine.search_matrix(sample=12, limit=3, seed=3)
    off = engine.search_matrix(sample=12, limit=3, seed=3, offsets=True)
    assert off["ids"] == sorted(off["ids"])
    rebuilt = [{"id_a": off["ids"][r], "id_b": off["ids"][c],
                "score": s}
               for r, c, s in zip(off["offsets_row"], off["offsets_col"],
                                  off["scores"])]
    assert rebuilt == pairs


def test_search_matrix_errors(engine_store):
    engine, _ = engine_store
    with pytest.raises(ValueError):
        engine.search_matrix(sample=1)
    with pytest.raises(ValueError):
        engine.search_matrix(sample=9000)
    with pytest.raises(ValueError):
        engine.search_matrix(limit=0)
    # fewer than 2 matching points: empty result, both formats
    f = {"must": [{"key": "filename", "match": {"value": "f0.jpg"}}]}
    assert engine.search_matrix(filter=f) == []
    assert engine.search_matrix(filter=f, offsets=True)["ids"] == []


# ---------------------------------------------------------------------------
# random sampling (universal query)
# ---------------------------------------------------------------------------

def test_query_random_sampling(engine_store):
    engine, _ = engine_store
    hits = engine.query({"sample": "random"}, k=7, seed=3)
    assert len(hits) == 7
    ids = [h["id"] for h in hits]
    assert len(set(ids)) == 7
    assert all(h["score"] == 0.0 for h in hits)
    assert hits == engine.query({"sample": "random"}, k=7, seed=3)
    # filtered: only matching rows are drawn; k over-ask returns all
    f = {"must": [{"key": "detected_class",
                   "match": {"value": "person"}}]}
    hits = engine.query({"sample": "random"}, k=50, filter=f)
    assert sorted(h["id"] for h in hits) == list(range(0, 40, 4))


def test_query_random_branch_feeds_exact_rescore(engine_store):
    engine, _ = engine_store
    # a random branch covering the whole store rescored exactly ==
    # the plain exact search
    got = engine.query(0, prefetch=[
        {"query": {"sample": "random"}, "limit": 40}], k=5)
    want = engine.query(0, k=5)
    assert [h["id"] for h in got] == [h["id"] for h in want]
    # rescore is exact fp32; the plain path scores via the bf16 index
    np.testing.assert_allclose([h["score"] for h in got],
                               [h["score"] for h in want], atol=2e-3)


def test_query_random_cannot_rescore(engine_store):
    engine, _ = engine_store
    with pytest.raises(ValueError):
        engine.query({"sample": "random"}, prefetch=[2], k=3)


# ---------------------------------------------------------------------------
# query_batch
# ---------------------------------------------------------------------------

def test_query_nearest_wrapper(engine_store):
    """qdrant NearestQuery: {"nearest": op} == the bare operand, in
    plain queries, prefetch branches, and query_batch coalescing."""
    engine, vecs = engine_store
    q = vecs[7].tolist()
    bare = engine.query(q, k=5)
    wrapped = engine.query({"nearest": q}, k=5)
    assert [h["id"] for h in wrapped] == [h["id"] for h in bare]
    assert [h["score"] for h in wrapped] == [h["score"] for h in bare]
    # point-id operand through the wrapper
    byid = engine.query({"nearest": 7}, k=5)
    assert [h["id"] for h in byid] == [h["id"] for h in bare]
    # prefetch branch wrapped vs bare
    b1 = engine.query(prefetch=[{"query": {"nearest": q}, "limit": 10}],
                      fusion="rrf", k=5)
    b2 = engine.query(prefetch=[{"query": q, "limit": 10}],
                      fusion="rrf", k=5)
    assert [h["id"] for h in b1] == [h["id"] for h in b2]
    # query_batch treats the wrapper as plain (coalescing path)
    rb = engine.query_batch([{"query": {"nearest": q}, "k": 5},
                             {"query": q, "k": 5}])
    assert [h["id"] for h in rb[0]] == [h["id"] for h in rb[1]] \
        == [h["id"] for h in bare]


def test_query_batch_matches_sequential(engine_store):
    engine, vecs = engine_store
    f = {"must": [{"key": "detected_class", "match": {"value": "car"}}]}
    reqs = [
        {"query": 0, "k": 3},
        {"query": vecs[5], "k": 6, "filter": f},
        {"query": 9, "k": 2, "filter": f},
        {"prefetch": [2, 7], "fusion": "rrf", "k": 4},
        {"query": "r3", "k": 5, "with_payload": False},
    ]
    got = engine.query_batch(reqs)
    assert len(got) == len(reqs)
    for res, req in zip(got, reqs):
        want = engine.query(**req)
        assert [h["id"] for h in res] == [h["id"] for h in want]
        np.testing.assert_allclose([h["score"] for h in res],
                                   [h["score"] for h in want], atol=1e-6)
    assert got[4][0]["payload"] is None            # per-request override
    assert got[0][0]["payload"]["filename"] == "f0.jpg"
    for h in got[1]:
        assert h["payload"]["detected_class"] == "car"


def test_query_batch_payload_default_covers_fallback(engine_store):
    # the batch-level with_payload default must reach requests that
    # fall back to query() (prefetch/fusion), not just coalesced ones
    engine, _ = engine_store
    got = engine.query_batch(
        [{"query": 0, "k": 2},
         {"prefetch": [2, 7], "fusion": "rrf", "k": 2}],
        with_payload=False)
    for res in got:
        assert res and all(h["payload"] is None for h in res)
    # per-request with_payload still wins over the batch default
    got = engine.query_batch(
        [{"prefetch": [2], "fusion": "rrf", "k": 2,
          "with_payload": True}], with_payload=False)
    assert got[0][0]["payload"] is not None


def test_query_batch_no_store(tmp_path):
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(MODEL_PRESETS["test-tiny"],
                                       dtype="float32"),
        store=dataclasses.replace(cfg.store,
                                  root_dir=str(tmp_path / "db")))
    with pytest.raises(StoreError):
        Reverso(cfg).query_batch([{"query": 0}])


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def test_cli_matrix_and_random(tmp_path, capsys):
    import json as _json
    from reverso_tpu.cli import main

    vecs = random_unit(np.random.default_rng(4), 15, 16)
    payloads = [{"region_id": f"r{i}",
                 "detected_class": "person" if i % 3 == 0 else "car"}
                for i in range(15)]
    root = str(tmp_path / "db")
    with VectorStore.create(root, "clim", 16) as s:
        s.append(vecs, payloads)
    base = ["--db-root", root, "--model", "test-tiny"]

    rc = main(base + ["matrix", "clim", "--sample", "8", "--limit", "2",
                      "--seed", "1", "--json"])
    out = capsys.readouterr().out
    assert rc == 0
    pairs = _json.loads(out)["pairs"]
    assert pairs and all(p["id_a"] != p["id_b"] for p in pairs)

    rc = main(base + ["matrix", "clim", "--sample", "8", "--limit", "2",
                      "--seed", "1", "--offsets"])
    out = capsys.readouterr().out
    assert rc == 0
    off = _json.loads(out)
    assert len(off["scores"]) == len(pairs)

    rc = main(base + ["matrix", "clim", "--sample", "1"])
    assert rc == 1 and "sample" in capsys.readouterr().err

    # no-results exit code 2 holds in offsets mode too (the offsets
    # dict itself is always truthy — only its lists are empty)
    rc = main(base + ["matrix", "clim", "--filter", "region_id=r0",
                      "--offsets"])
    capsys.readouterr()
    assert rc == 2

    rc = main(base + ["query", "clim", "--random", "--seed", "2",
                      "--top-k", "4", "--json"])
    out = capsys.readouterr().out
    assert rc == 0
    hits = _json.loads(out)["hits"]
    assert len(hits) == 4 and all(h["score"] == 0.0 for h in hits)

    rc = main(base + ["query", "clim", "--random", "--target", "1"])
    assert rc == 1
    assert "only one of" in capsys.readouterr().err


def test_query_batch_hybrid_coalescing(engine_store, monkeypatch):
    """Round-5 lift of the plain-requests-only coalescing: universal
    requests with plain dense prefetch branches share one stacked
    device scan per (space, limit, branch-filter, global-filter) —
    and the results are EXACTLY what sequential query() calls give."""
    engine, vecs = engine_store
    carf = {"must": [{"key": "detected_class",
                      "match": {"value": "car"}}]}
    reqs = []
    for j in range(6):
        reqs.append({"prefetch": [
            {"query": vecs[j].tolist(), "limit": 12},
            {"query": {"nearest": vecs[j + 1].tolist()}, "limit": 8,
             "filter": carf},
        ], "fusion": "rrf", "k": 5})
    # exact-rescore shape (final vector query over the branch union)
    reqs.append({"prefetch": [{"query": vecs[3].tolist(),
                               "limit": 12}],
                 "query": vecs[4].tolist(), "k": 5})
    # dbsf fusion + a global filter
    reqs.append({"prefetch": [
        {"query": vecs[8].tolist(), "limit": 12},
        {"query": vecs[9].tolist(), "limit": 12}],
        "fusion": "dbsf", "k": 4, "filter": carf})
    seq = [engine.query(**dict(r)) for r in reqs]

    calls = []
    real = engine._get_index

    class Proxy:
        def __init__(self, inner):
            self._inner = inner

        def search(self, q, *a, **k):
            calls.append(np.asarray(q).shape[0])
            return self._inner.search(q, *a, **k)

        def __getattr__(self, name):
            return getattr(self._inner, name)

    monkeypatch.setattr(engine, "_get_index",
                        lambda using="": Proxy(real(using)))
    got = engine.query_batch(reqs)
    assert got == seq
    # scan groups: (limit 12, no filters) x7 members; (limit 8, car
    # branch filter) x6; (limit 12, car global filter) x2 -> 3
    # launches for 15 branch scans
    assert sorted(calls) == [2, 6, 7], calls
