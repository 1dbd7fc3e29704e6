"""Distance metrics for bring-your-own-vector stores — the role of
qdrant's Distance config (COSINE / DOT / EUCLID / MANHATTAN). The
reference app was cosine-only (reference core_system.py:600-603
created its collection with COSINE); dot rides the existing kernels
unchanged (cosine IS a dot over the unit rows), euclid maps onto them
via the [x, ||x||^2] augmentation, and manhattan scans with the
chunked XLA L1 op (ops/l1.py — no dot factorization exists for L1).
Distance scores are reported negated so higher-is-better ordering
holds across the whole stack.
"""
import dataclasses
import json

import numpy as np
import pytest

from reverso_tpu.store import (
    DeviceIndex,
    HostIndex,
    StoreError,
    VectorStore,
)

from test_topk import random_unit


def raw_vectors(rng, n, d, scale=3.0):
    return (rng.normal(size=(n, d)) * scale).astype(np.float32)


def brute_dot(vecs, q, k):
    s = vecs.astype(np.float64) @ np.asarray(q, np.float64)
    order = np.lexsort((np.arange(len(vecs)), -s))[:k]
    return [(int(i), float(s[i])) for i in order]


def brute_euclid(vecs, q, k, keep=None):
    d = np.linalg.norm(vecs.astype(np.float64)
                       - np.asarray(q, np.float64)[None], axis=1)
    idx = np.arange(len(vecs))
    if keep is not None:
        idx = idx[np.asarray(keep, bool)]
    order = idx[np.lexsort((idx, d[idx]))][:k]
    return [(int(i), float(-d[i])) for i in order]


def brute_manhattan(vecs, q, k, keep=None):
    d = np.abs(vecs.astype(np.float64)
               - np.asarray(q, np.float64)[None]).sum(axis=1)
    idx = np.arange(len(vecs))
    if keep is not None:
        idx = idx[np.asarray(keep, bool)]
    order = idx[np.lexsort((idx, d[idx]))][:k]
    return [(int(i), float(-d[i])) for i in order]


# ---------------------------------------------------------------------------
# store metadata
# ---------------------------------------------------------------------------

def test_store_distance_roundtrip_and_validation(tmp_path):
    s = VectorStore.create(str(tmp_path), "dotdb", 8, distance="dot")
    assert s.distance == "dot"
    s.close()
    s2 = VectorStore.open(str(tmp_path), "dotdb")
    assert s2.distance == "dot"
    s2.close()
    with pytest.raises(StoreError, match="unknown distance"):
        VectorStore.create(str(tmp_path), "bad", 8, distance="hamming")
    # legacy stores (no distance key) read as cosine
    s3 = VectorStore.create(str(tmp_path), "cosdb", 8)
    assert s3.distance == "cosine"
    s3.close()


def test_snapshot_preserves_distance(tmp_path):
    rng = np.random.default_rng(0)
    with VectorStore.create(str(tmp_path), "eu", 8,
                            distance="euclid") as s:
        s.append(raw_vectors(rng, 5, 8), [{} for _ in range(5)])
        snap = s.export_snapshot(str(tmp_path / "eu.snap"))
    imp = VectorStore.import_snapshot(str(tmp_path), "eu2", snap)
    assert imp.distance == "euclid"
    imp.close()


# ---------------------------------------------------------------------------
# index layer
# ---------------------------------------------------------------------------

def test_device_index_dot_raw_magnitudes():
    rng = np.random.default_rng(1)
    vecs = raw_vectors(rng, 40, 32)
    idx = DeviceIndex(vecs, dtype="float32", distance="dot")
    q = rng.normal(size=32).astype(np.float32)
    s, i = np.asarray(idx.search(q[None], 5)[0]), \
        np.asarray(idx.search(q[None], 5)[1])
    want = brute_dot(vecs, q, 5)
    assert [int(x) for x in i[0]] == [w[0] for w in want]
    np.testing.assert_allclose(s[0], [w[1] for w in want], rtol=1e-5)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "int8"])
def test_device_index_euclid_parity(dtype):
    rng = np.random.default_rng(2)
    vecs = raw_vectors(rng, 60, 16)
    idx = DeviceIndex(vecs, dtype=dtype, distance="euclid")
    assert idx._dtype != np.dtype("int8")     # int8 coerced (norm col)
    q = rng.normal(size=(3, 16)).astype(np.float32) * 2
    s, i = idx.search(q, 6)
    s, i = np.asarray(s), np.asarray(i)
    for row in range(3):
        want = brute_euclid(vecs, q[row], 6)
        got = [int(x) for x in i[row] if x >= 0]
        if dtype == "float32":
            assert got == [w[0] for w in want]
            np.testing.assert_allclose(s[row], [w[1] for w in want],
                                       atol=1e-3)
        else:
            # bf16 storage rounds the matrix; top-1 and score scale
            # must still agree
            assert got[0] == want[0][0]
            assert abs(s[row][0] - want[0][1]) < 0.3
        assert (s[row][i[row] >= 0] <= 0).all()   # -distance is <= 0


def test_device_index_euclid_mask_and_overfetch():
    rng = np.random.default_rng(3)
    vecs = raw_vectors(rng, 20, 8)
    idx = DeviceIndex(vecs, dtype="float32", distance="euclid")
    q = rng.normal(size=8).astype(np.float32)
    keep = np.zeros(20, bool)
    keep[::3] = True
    s, i = idx.search(q[None], 4, row_mask=keep)
    want = brute_euclid(vecs, q, 4, keep=keep)
    assert [int(x) for x in np.asarray(i)[0]] == [w[0] for w in want]
    # k > n pads with -1
    s, i = idx.search(q[None], 30)
    i = np.asarray(i)[0]
    assert (i[20:] == -1).all()


@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "int8"])
def test_device_index_manhattan_parity(dtype):
    rng = np.random.default_rng(12)
    vecs = raw_vectors(rng, 60, 16)
    idx = DeviceIndex(vecs, dtype=dtype, distance="manhattan")
    assert idx._dtype != np.dtype("int8")    # int8 coerced (L1 scale)
    q = rng.normal(size=(3, 16)).astype(np.float32) * 2
    s, i = idx.search(q, 6)
    s, i = np.asarray(s), np.asarray(i)
    for row in range(3):
        want = brute_manhattan(vecs, q[row], 6)
        got = [int(x) for x in i[row] if x >= 0]
        if dtype == "float32":
            assert got == [w[0] for w in want]
            np.testing.assert_allclose(s[row], [w[1] for w in want],
                                       atol=1e-3)
        else:
            assert got[0] == want[0][0]
            assert abs(s[row][0] - want[0][1]) < 0.5
        assert (s[row][i[row] >= 0] <= 0).all()


def test_device_index_manhattan_mask_overfetch_and_chunking():
    rng = np.random.default_rng(13)
    # > one scan chunk at tiny _CHUNK_ELEMS? use enough rows that the
    # scan takes multiple steps at d=8 (chunk floor is 128 rows)
    vecs = raw_vectors(rng, 300, 8)
    idx = DeviceIndex(vecs, dtype="float32", distance="manhattan")
    q = rng.normal(size=8).astype(np.float32)
    keep = np.zeros(300, bool)
    keep[::7] = True
    s, i = idx.search(q[None], 5, row_mask=keep)
    want = brute_manhattan(vecs, q, 5, keep=keep)
    assert [int(x) for x in np.asarray(i)[0]] == [w[0] for w in want]
    np.testing.assert_allclose(np.asarray(s)[0], [w[1] for w in want],
                               atol=1e-3)
    # k > n pads with -1
    s, i = idx.search(q[None], 310)
    i = np.asarray(i)[0]
    assert (i[300:] == -1).all()
    # example-combine surfaces reject L1 cleanly
    with pytest.raises(ValueError, match="manhattan"):
        idx.best_score(q[None], k=2)


def test_sharded_manhattan_matches_single_device():
    import jax
    import jax.numpy as jnp

    from reverso_tpu.ops.l1 import manhattan_topk_xla, sharded_manhattan_topk
    from reverso_tpu.parallel import make_mesh, shard_rows, replicate

    rng = np.random.default_rng(14)
    n, d, k = 1024, 16, 7          # divisible by the 8-device mesh
    db = raw_vectors(rng, n, d)
    qs = rng.normal(size=(3, d)).astype(np.float32)
    mesh = make_mesh()
    s1, i1 = jax.device_get(manhattan_topk_xla(jnp.asarray(db),
                                               jnp.asarray(qs), k))
    s8, i8 = jax.device_get(sharded_manhattan_topk(
        shard_rows(jnp.asarray(db), mesh), replicate(jnp.asarray(qs), mesh),
        k, mesh))
    np.testing.assert_array_equal(i1, i8)
    np.testing.assert_allclose(s1, s8, atol=1e-5)
    # masked sharded scan
    keep = rng.random(n) < 0.3
    s1, i1 = jax.device_get(manhattan_topk_xla(
        jnp.asarray(db), jnp.asarray(qs), k, row_mask=jnp.asarray(keep)))
    s8, i8 = jax.device_get(sharded_manhattan_topk(
        shard_rows(jnp.asarray(db), mesh), replicate(jnp.asarray(qs), mesh),
        k, mesh, row_mask=jnp.asarray(keep)))
    np.testing.assert_array_equal(i1, i8)
    np.testing.assert_allclose(s1, s8, atol=1e-5)
    # n_valid masks trailing rows identically
    s1, i1 = jax.device_get(manhattan_topk_xla(
        jnp.asarray(db), jnp.asarray(qs), k, n_valid=900))
    s8, i8 = jax.device_get(sharded_manhattan_topk(
        shard_rows(jnp.asarray(db), mesh), replicate(jnp.asarray(qs), mesh),
        k, mesh, n_valid=900))
    np.testing.assert_array_equal(i1, i8)
    assert (i1 < 900).all()


def test_manhattan_topk_fp64_parity_and_ties():
    import jax
    import jax.numpy as jnp

    from reverso_tpu.ops.l1 import manhattan_topk_host, manhattan_topk_xla

    rng = np.random.default_rng(15)
    # quantized values force exact ties; ties must go to the lower id
    vecs = np.round(rng.normal(size=(50, 4)) * 2).astype(np.float32)
    vecs[11] = vecs[3]            # exact duplicate -> tie pair
    q = np.round(rng.normal(size=4) * 2).astype(np.float32)
    want = brute_manhattan(vecs, q, 10)
    s, i = jax.device_get(manhattan_topk_xla(jnp.asarray(vecs),
                                             jnp.asarray(q[None]), 10))
    assert [int(x) for x in i[0]] == [w[0] for w in want]
    np.testing.assert_allclose(s[0], [w[1] for w in want], atol=1e-5)
    hs, hi = manhattan_topk_host(vecs, q[None], 10)
    np.testing.assert_array_equal(hi, i)
    np.testing.assert_allclose(hs, s, atol=1e-5)
    # the host scan carries a running top-k across row chunks — a
    # chunk smaller than n must merge identically (ties included)
    cs, ci = manhattan_topk_host(vecs, q[None], 10, chunk=7)
    np.testing.assert_array_equal(ci, hi)
    np.testing.assert_allclose(cs, hs, atol=0)
    keep = np.arange(len(vecs)) % 3 == 0
    ms, mi = manhattan_topk_host(vecs, q[None], 10, row_mask=keep)
    cs, ci = manhattan_topk_host(vecs, q[None], 10, row_mask=keep,
                                 chunk=7)
    np.testing.assert_array_equal(ci, mi)


def test_host_index_distance_parity():
    rng = np.random.default_rng(4)
    vecs = raw_vectors(rng, 30, 16)
    q = rng.normal(size=16).astype(np.float32)
    hd = HostIndex(vecs, distance="dot")
    s, i = hd.search(q[None], 5)
    want = brute_dot(vecs, q, 5)
    assert [int(x) for x in i[0]] == [w[0] for w in want]
    he = HostIndex(vecs, distance="euclid")
    s, i = he.search(q[None], 5)
    want = brute_euclid(vecs, q, 5)
    assert [int(x) for x in i[0]] == [w[0] for w in want]
    np.testing.assert_allclose(s[0], [w[1] for w in want], atol=1e-4)
    with pytest.raises(ValueError, match="euclid"):
        he.best_score([q], k=3)
    hm = HostIndex(vecs, distance="manhattan")
    s, i = hm.search(q[None], 5)
    want = brute_manhattan(vecs, q, 5)
    assert [int(x) for x in i[0]] == [w[0] for w in want]
    np.testing.assert_allclose(s[0], [w[1] for w in want], atol=1e-4)
    keep = np.arange(30) % 4 == 0
    s, i = hm.search(q[None], 5, row_mask=keep)
    want = brute_manhattan(vecs, q, 5, keep=keep)
    assert [int(x) for x in i[0]] == [w[0] for w in want]
    with pytest.raises(ValueError, match="manhattan"):
        hm.best_score([q], k=3)


def test_device_index_euclid_blocks_example_combines():
    rng = np.random.default_rng(5)
    idx = DeviceIndex(raw_vectors(rng, 10, 8), dtype="float32",
                      distance="euclid")
    with pytest.raises(ValueError, match="euclid"):
        idx.best_score(rng.normal(size=(1, 8)).astype(np.float32), k=2)


# ---------------------------------------------------------------------------
# engine surface
# ---------------------------------------------------------------------------

def make_engine(tmp_path, distance, n=25, d=16, seed=6):
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso

    rng = np.random.default_rng(seed)
    vecs = raw_vectors(rng, n, d)
    root = str(tmp_path / "db")
    VectorStore.create(root, "dist", d, distance=distance).close()
    model = dataclasses.replace(MODEL_PRESETS["test-tiny"],
                                dtype="float32")
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=model,
        store=dataclasses.replace(cfg.store, root_dir=root,
                                  dtype="float32"))
    engine = Reverso(cfg)
    engine.load_database("dist")
    msg = engine.upsert_points(
        vecs, [{"region_id": f"r{i}", "cls": "a" if i % 2 else "b"}
               for i in range(n)])
    assert msg.startswith("✅"), msg
    return engine, vecs, rng


def test_engine_dot_store_keeps_magnitudes(tmp_path):
    engine, vecs, rng = make_engine(tmp_path, "dot")
    pts = engine.retrieve([3], with_vectors=True)
    np.testing.assert_allclose(pts[0]["vector"], vecs[3], atol=1e-6)
    q = rng.normal(size=16).astype(np.float32)
    hits = engine.query(q.tolist(), k=5)
    want = brute_dot(vecs, q, 5)
    assert [h["id"] for h in hits] == [w[0] for w in want]
    np.testing.assert_allclose([h["score"] for h in hits],
                               [w[1] for w in want], rtol=1e-5)


def test_engine_euclid_store_end_to_end(tmp_path):
    engine, vecs, rng = make_engine(tmp_path, "euclid")
    q = rng.normal(size=16).astype(np.float32) * 2
    hits = engine.query(q.tolist(), k=5)
    want = brute_euclid(vecs, q, 5)
    assert [h["id"] for h in hits] == [w[0] for w in want]
    np.testing.assert_allclose([h["score"] for h in hits],
                               [w[1] for w in want], atol=1e-3)
    # filtered
    hits = engine.query(q.tolist(), k=5, filter="cls=a")
    keep = [i % 2 == 1 for i in range(25)]
    want = brute_euclid(vecs, q, 5, keep=keep)
    assert [h["id"] for h in hits] == [w[0] for w in want]
    # exact rescore of a prefetch union uses -distance too
    hits = engine.query(q.tolist(),
                        prefetch=[{"query": q.tolist(), "limit": 25}],
                        k=5)
    want = brute_euclid(vecs, q, 5)
    assert [h["id"] for h in hits] == [w[0] for w in want]
    # update keeps raw magnitudes on non-cosine stores
    nv = rng.normal(size=(1, 16)).astype(np.float32) * 5
    msg = engine.update_vectors([0], nv)
    assert msg.startswith("✅"), msg
    pts = engine.retrieve([0], with_vectors=True)
    np.testing.assert_allclose(pts[0]["vector"], nv[0], atol=1e-6)
    # guards: dot-product surfaces reject euclid cleanly
    with pytest.raises(StoreError, match="euclid"):
        engine.search_matrix(sample=4, limit=2)
    text, items = engine.recommend(positive=[1], strategy="best_score")
    assert text.startswith("❌") and items == []


def test_engine_manhattan_store_end_to_end(tmp_path):
    engine, vecs, rng = make_engine(tmp_path, "manhattan")
    q = rng.normal(size=16).astype(np.float32) * 2
    hits = engine.query(q.tolist(), k=5)
    want = brute_manhattan(vecs, q, 5)
    assert [h["id"] for h in hits] == [w[0] for w in want]
    np.testing.assert_allclose([h["score"] for h in hits],
                               [w[1] for w in want], atol=1e-3)
    # filtered
    hits = engine.query(q.tolist(), k=5, filter="cls=a")
    keep = [i % 2 == 1 for i in range(25)]
    want = brute_manhattan(vecs, q, 5, keep=keep)
    assert [h["id"] for h in hits] == [w[0] for w in want]
    # exact rescore of a prefetch union uses -L1 too
    hits = engine.query(q.tolist(),
                        prefetch=[{"query": q.tolist(), "limit": 25}],
                        k=5)
    want = brute_manhattan(vecs, q, 5)
    assert [h["id"] for h in hits] == [w[0] for w in want]
    # guards: dot-product surfaces reject manhattan cleanly
    with pytest.raises(StoreError, match="manhattan"):
        engine.search_matrix(sample=4, limit=2)
    text, items = engine.recommend(positive=[1], strategy="best_score")
    assert text.startswith("❌") and items == []


def test_engine_euclid_point_id_query(tmp_path):
    engine, vecs, rng = make_engine(tmp_path, "euclid")
    hits = engine.query(7, k=1)
    assert hits[0]["id"] == 7 and abs(hits[0]["score"]) < 1e-3


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def test_cli_distance_upsert_query_info(tmp_path, capsys):
    from reverso_tpu.cli import main

    rng = np.random.default_rng(8)
    vecs = raw_vectors(rng, 12, 8)
    npz = str(tmp_path / "pts.npz")
    np.savez(npz, vectors=vecs, payloads=np.asarray(
        [json.dumps({"region_id": f"r{i}"}) for i in range(12)]))
    root = str(tmp_path / "db")
    rc = main(["--db-root", root, "--model", "test-tiny",
               "--index-dtype", "float32",
               "upsert", "clieu", npz, "--distance", "euclid"])
    out = capsys.readouterr()
    assert rc == 0, out.err

    q = rng.normal(size=8).astype(np.float32)
    rc = main(["--db-root", root, "--model", "test-tiny",
               "--index-dtype", "float32",
               "query", "clieu", "--target", json.dumps(q.tolist()),
               "--top-k", "3", "--json"])
    out = capsys.readouterr()
    assert rc == 0, out.err
    hits = json.loads(out.out)["hits"]
    want = brute_euclid(vecs, q, 3)
    assert [h["id"] for h in hits] == [w[0] for w in want]
    np.testing.assert_allclose([h["score"] for h in hits],
                               [w[1] for w in want], atol=1e-3)

    rc = main(["--db-root", root, "--model", "test-tiny",
               "info", "clieu", "--json"])
    out = capsys.readouterr()
    assert rc == 0
    assert json.loads(out.out)["distance"] == "euclid"

    # manhattan end-to-end through the CLI
    rc = main(["--db-root", root, "--model", "test-tiny",
               "--index-dtype", "float32",
               "upsert", "climan", npz, "--distance", "manhattan"])
    out = capsys.readouterr()
    assert rc == 0, out.err
    rc = main(["--db-root", root, "--model", "test-tiny",
               "--index-dtype", "float32",
               "query", "climan", "--target", json.dumps(q.tolist()),
               "--top-k", "3", "--json"])
    out = capsys.readouterr()
    assert rc == 0, out.err
    hits = json.loads(out.out)["hits"]
    want = brute_manhattan(vecs, q, 3)
    assert [h["id"] for h in hits] == [w[0] for w in want]
    np.testing.assert_allclose([h["score"] for h in hits],
                               [w[1] for w in want], atol=1e-3)
