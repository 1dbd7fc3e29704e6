"""Product quantization — qdrant's ProductQuantization role (m-byte
learned-codebook candidate index + rescore/oversampling search params).
The reference never enabled any quantization (cosine-only qdrant local
mode, reference core_system.py:600-622); here PQ is the highest-
compression mode of the device index: ops/pq.py one-hot-through-MXU
decompress scan + on-device batched k-means, store/index.py PQIndex,
the engine's shared rescore adapter.
"""
import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reverso_tpu.ops.pq import (
    pq_decode,
    pq_encode,
    pq_topk_xla,
    sharded_pq_topk,
    train_pq,
)
from reverso_tpu.store import PQIndex, StoreError, VectorStore
from reverso_tpu.store.index import default_pq_m


def bf16(x):
    return np.asarray(jnp.asarray(x, jnp.bfloat16).astype(jnp.float32))


def nice_codebooks(rng, m, dsub):
    """bf16-exact codebook values (multiples of 1/8) so fp64 references
    match the device's f32-accumulated proxy bitwise."""
    return (rng.integers(-8, 9, size=(m, 256, dsub)) / 8.0
            ).astype(np.float32)


def nice_query(rng, d):
    return (np.round(rng.normal(size=d) * 4) / 2).astype(np.float32)


def brute_pq(codes, cb, q, k):
    """fp64 reference of the asymmetric proxy: bf16(q) . decode."""
    x = pq_decode(codes, cb).astype(np.float64)
    s = x @ bf16(q).astype(np.float64)
    order = np.lexsort((np.arange(len(x)), -s))[:k]
    return [(int(i), float(s[i])) for i in order]


# ---------------------------------------------------------------------------
# ops layer
# ---------------------------------------------------------------------------

def test_encode_decode_roundtrip():
    rng = np.random.default_rng(0)
    m, dsub = 4, 8
    cb = nice_codebooks(rng, m, dsub)
    codes = rng.integers(0, 256, size=(50, m)).astype(np.uint8)
    x = pq_decode(codes, cb)
    assert x.shape == (50, m * dsub)
    # encoding an exact centroid recovers a code that decodes back to
    # it (duplicate centroids may alias the id, never the value)
    got = pq_encode(x, cb)
    np.testing.assert_array_equal(pq_decode(got, cb), x)
    # shape validation
    with pytest.raises(ValueError):
        pq_encode(np.zeros((3, m * dsub + 1), np.float32), cb)
    with pytest.raises(ValueError):
        train_pq(np.zeros((10, 31), np.float32), 4)   # 4 does not divide 31


def test_pq_topk_parity_and_ties():
    rng = np.random.default_rng(1)
    n, m, dsub, k = 300, 4, 8, 8
    d = m * dsub
    cb = nice_codebooks(rng, m, dsub)
    codes = rng.integers(0, 256, size=(n, m)).astype(np.uint8)
    codes[57] = codes[3]          # identical codes -> exact tie
    q = nice_query(rng, d)
    s, i = jax.device_get(pq_topk_xla(jnp.asarray(codes),
                                      jnp.asarray(cb),
                                      jnp.asarray(q[None]), k, d))
    want = brute_pq(codes, cb, q, k)
    assert [int(x) for x in i[0]] == [w[0] for w in want]
    np.testing.assert_allclose(s[0], [w[1] for w in want], rtol=1e-6)
    # the tie went to the lower row id
    assert 3 in [int(x) for x in i[0]] or 57 not in [int(x) for x in i[0]]


def test_pq_topk_mask_nvalid_and_kn():
    rng = np.random.default_rng(2)
    n, m, dsub = 200, 2, 8
    d = m * dsub
    cb = nice_codebooks(rng, m, dsub)
    codes = rng.integers(0, 256, size=(n, m)).astype(np.uint8)
    q = nice_query(rng, d)
    keep = np.arange(n) % 3 == 0
    s, i = jax.device_get(pq_topk_xla(
        jnp.asarray(codes), jnp.asarray(cb), jnp.asarray(q[None]), 5, d,
        row_mask=jnp.asarray(keep)))
    x = pq_decode(codes, cb).astype(np.float64)
    sc = x @ bf16(q).astype(np.float64)
    idx = np.arange(n)[keep]
    want = idx[np.lexsort((idx, -sc[idx]))][:5]
    assert [int(v) for v in i[0]] == [int(w) for w in want]
    # n_valid masks trailing rows
    s, i = jax.device_get(pq_topk_xla(jnp.asarray(codes), jnp.asarray(cb),
                                      jnp.asarray(q[None]), 5, d,
                                      n_valid=50))
    assert (i[0] < 50).all()
    # k > n pads with -1
    s, i = jax.device_get(pq_topk_xla(jnp.asarray(codes), jnp.asarray(cb),
                                      jnp.asarray(q[None]), n + 10, d))
    assert (i[0, n:] == -1).all() and np.isneginf(s[0, n:]).all()


def test_train_pq_learns_and_is_deterministic():
    rng = np.random.default_rng(3)
    n, d, m = 600, 32, 4
    protos = rng.normal(size=(12, d)).astype(np.float32)
    vecs = (protos[rng.integers(0, 12, n)]
            + 0.01 * rng.normal(size=(n, d))).astype(np.float32)
    cb = train_pq(vecs, m, iters=10, seed=0)
    assert cb.shape == (m, 256, d // m)
    # near-duplicate clusters quantize almost losslessly
    recon = pq_decode(pq_encode(vecs, cb), cb)
    rel = np.linalg.norm(recon - vecs) / np.linalg.norm(vecs)
    assert rel < 0.05, rel
    # deterministic: same seed -> same codebooks
    cb2 = train_pq(vecs, m, iters=10, seed=0)
    np.testing.assert_array_equal(cb, cb2)
    # tiny corpora (n < 256 centroids) still train
    small = vecs[:40]
    cbs = train_pq(small, m, iters=3, seed=1)
    recon = pq_decode(pq_encode(small, cbs), cbs)
    assert np.linalg.norm(recon - small) / np.linalg.norm(small) < 0.05


def test_sharded_pq_matches_single_device():
    from reverso_tpu.parallel import make_mesh, replicate, shard_rows

    rng = np.random.default_rng(4)
    n, m, dsub, k = 1024, 4, 8, 9
    d = m * dsub
    cb = nice_codebooks(rng, m, dsub)
    codes = rng.integers(0, 256, size=(n, m)).astype(np.uint8)
    qs = np.stack([nice_query(rng, d) for _ in range(3)])
    mesh = make_mesh()
    s1, i1 = jax.device_get(pq_topk_xla(jnp.asarray(codes),
                                        jnp.asarray(cb),
                                        jnp.asarray(qs), k, d))
    s8, i8 = jax.device_get(sharded_pq_topk(
        shard_rows(jnp.asarray(codes), mesh), jnp.asarray(cb),
        replicate(jnp.asarray(qs), mesh), k, d, mesh))
    np.testing.assert_array_equal(i1, i8)
    np.testing.assert_allclose(s1, s8, rtol=1e-6)
    keep = rng.random(n) < 0.4
    s1, i1 = jax.device_get(pq_topk_xla(
        jnp.asarray(codes), jnp.asarray(cb), jnp.asarray(qs), k, d,
        row_mask=jnp.asarray(keep)))
    s8, i8 = jax.device_get(sharded_pq_topk(
        shard_rows(jnp.asarray(codes), mesh), jnp.asarray(cb),
        replicate(jnp.asarray(qs), mesh), k, d, mesh,
        row_mask=jnp.asarray(keep)))
    np.testing.assert_array_equal(i1, i8)


# ---------------------------------------------------------------------------
# index + adapter
# ---------------------------------------------------------------------------

def clustered_unit(rng, groups, per, d, noise=0.017):
    centers = rng.normal(size=(groups, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = (np.repeat(centers, per, axis=0)
            + noise * rng.normal(size=(groups * per, d)))
    return (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
            ).astype(np.float32), centers


def test_pq_index_capacity_cache_and_extend(tmp_path):
    rng = np.random.default_rng(5)
    # 4096 rows: the pre-pad is a no-op, so the capacity claim is
    # visible (m bytes/row + codebooks vs the f32 matrix)
    vecs, _ = clustered_unit(rng, 64, 64, 64)
    idx = PQIndex(vecs, iters=5)
    assert idx.m == default_pq_m(64) == 8
    assert idx.nbytes < vecs.nbytes / 8
    # cache round-trip: identical codebooks and codes, no retraining
    path = str(tmp_path / "pq.npz")
    idx.save_cache(path)
    idx2 = PQIndex.load_cache(vecs, path)
    np.testing.assert_array_equal(idx.codebooks, idx2.codebooks)
    np.testing.assert_array_equal(idx._host_codes, idx2._host_codes)
    q = vecs[3]
    s1, i1 = jax.device_get(idx.search(q, 7))
    s2, i2 = jax.device_get(idx2.search(q, 7))
    np.testing.assert_array_equal(i1, i2)
    # extend: more rows encode only the tail against cached codebooks
    more = np.concatenate([vecs, vecs[:16] * -1.0])
    idx3 = PQIndex.load_cache(more, path)
    assert idx3 is not None and idx3.n_valid == len(more)
    np.testing.assert_array_equal(idx3.codebooks, idx.codebooks)
    np.testing.assert_array_equal(idx3._host_codes[:len(vecs)],
                                  idx._host_codes)
    # a cache covering MORE rows than the matrix does not fit
    assert PQIndex.load_cache(vecs[:10], path) is None


def test_rescore_adapter_pq_exact_when_oversampling_covers():
    from reverso_tpu.engine import _BinaryRescoreAdapter

    rng = np.random.default_rng(6)
    n, d, k = 120, 64, 5
    vecs, _ = clustered_unit(rng, 12, 10, d)
    q = vecs[11] / np.linalg.norm(vecs[11])
    ad = _BinaryRescoreAdapter(PQIndex(vecs, iters=5), vecs,
                               oversampling=n / k)
    s, i = ad.search(q, k)
    exact = vecs.astype(np.float64) @ q.astype(np.float64)
    want = np.lexsort((np.arange(n), -exact))[:k]
    assert [int(x) for x in i[0]] == [int(w) for w in want]
    np.testing.assert_allclose(s[0], exact[want], atol=1e-5)
    # rescore=False surfaces the raw proxy scores (proxy order)
    ad2 = _BinaryRescoreAdapter(PQIndex(vecs, iters=5), vecs,
                                oversampling=2.0, rescore=False)
    s2, i2 = ad2.search(q, k)
    assert (np.diff(s2[0]) <= 1e-6).all()


def test_pq_recall_on_separable_data():
    """On clustered unit vectors the PQ proxy keeps the true neighbors
    inside a 3x oversample — recall@10 must be high (the operating
    point the defaults advertise; binary's test shape, smaller d)."""
    from reverso_tpu.engine import _BinaryRescoreAdapter

    rng = np.random.default_rng(7)
    d, k = 256, 10
    vecs, centers = clustered_unit(rng, 80, 10, d)
    ad = _BinaryRescoreAdapter(PQIndex(vecs, iters=10), vecs,
                               oversampling=3.0)
    exact = vecs.astype(np.float64)
    recalls = []
    for g in range(8):
        q = centers[g] + 0.017 * rng.normal(size=d)
        q = (q / np.linalg.norm(q)).astype(np.float32)
        s, i = ad.search(q, k)
        truth = np.argsort(-(exact @ q.astype(np.float64)))[:k]
        recalls.append(len(set(map(int, i[0])) & set(map(int, truth))) / k)
    assert np.mean(recalls) >= 0.95, recalls


def test_pq_index_k_exceeds_n_and_empty():
    rng = np.random.default_rng(8)
    vecs = rng.normal(size=(4, 16)).astype(np.float32)
    idx = PQIndex(vecs, iters=2)
    s, i = jax.device_get(idx.search(vecs[0], 10))
    assert (np.asarray(i)[0, 4:] == -1).all()
    empty = PQIndex(np.zeros((0, 16), np.float32))
    s, i = jax.device_get(empty.search(vecs[0], 3))
    assert (np.asarray(i) == -1).all()


# ---------------------------------------------------------------------------
# engine + CLI
# ---------------------------------------------------------------------------

def make_engine(tmp_path, *, distance="cosine", n=300, d=64, seed=9,
                oversampling=3.0):
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso

    rng = np.random.default_rng(seed)
    vecs, _ = clustered_unit(rng, 10, n // 10, d, noise=0.3)
    root = str(tmp_path / "db")
    VectorStore.create(root, "pq", d, distance=distance).close()
    model = dataclasses.replace(MODEL_PRESETS["test-tiny"],
                                dtype="float32")
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=model,
        store=dataclasses.replace(cfg.store, root_dir=root, dtype="pq"),
        search=dataclasses.replace(cfg.search,
                                   pq_oversampling=oversampling))
    engine = Reverso(cfg)
    engine.load_database("pq")
    msg = engine.upsert_points(
        vecs, [{"region_id": f"r{i}", "cls": "a" if i % 2 else "b"}
               for i in range(n)])
    assert msg.startswith("✅"), msg
    return engine, vecs, rng


def test_engine_pq_end_to_end(tmp_path):
    # oversampling covering the whole store -> exact results, so the
    # engine path is deterministic-testable
    engine, vecs, rng = make_engine(tmp_path, n=60, oversampling=60.0)
    q = vecs[7] + 0.01 * rng.normal(size=vecs.shape[1])
    q = (q / np.linalg.norm(q)).astype(np.float32)
    hits = engine.query(q.tolist(), k=5)
    exact = vecs.astype(np.float64) @ q.astype(np.float64)
    want = np.lexsort((np.arange(len(vecs)), -exact))[:5]
    assert [h["id"] for h in hits] == [int(w) for w in want]
    np.testing.assert_allclose([h["score"] for h in hits], exact[want],
                               atol=1e-5)
    # filtered search restricts the candidate scan exactly
    hits = engine.query(q.tolist(), k=5, filter="cls=a")
    keep = np.arange(len(vecs)) % 2 == 1
    idx = np.arange(len(vecs))[keep]
    want = idx[np.lexsort((idx, -exact[idx]))][:5]
    assert [h["id"] for h in hits] == [int(w) for w in want]
    # the k-means result persisted next to the store
    files = os.listdir(os.path.join(engine.db_root, "pq", "index"))
    assert any(f.startswith("pq_m") for f in files), files
    # appends extend the cache (same codebooks, tail encoded) instead
    # of retraining
    with np.load(os.path.join(engine.db_root, "pq", "index",
                              [f for f in files
                               if f.startswith("pq_m")][0])) as z:
        cb_before = z["codebooks"].copy()
    msg = engine.upsert_points(
        vecs[:8] * -1.0, [{"region_id": f"x{i}"} for i in range(8)])
    assert msg.startswith("✅"), msg
    hits = engine.query(q.tolist(), k=5)    # rebuild via extend
    files = [f for f in os.listdir(os.path.join(engine.db_root, "pq",
                                                "index"))
             if f.startswith("pq_m")]
    assert len(files) == 1 and f"_{len(vecs) + 8}_" in files[0], files
    with np.load(os.path.join(engine.db_root, "pq", "index",
                              files[0])) as z:
        np.testing.assert_array_equal(z["codebooks"], cb_before)
        assert len(z["codes"]) == len(vecs) + 8


def test_engine_pq_rejects_distance_stores(tmp_path):
    engine, vecs, rng = make_engine(tmp_path, distance="euclid", n=20)
    with pytest.raises(StoreError, match="product quantization"):
        engine.query(vecs[0].tolist(), k=3)


def test_cli_pq_index(tmp_path, capsys):
    from reverso_tpu.cli import main

    rng = np.random.default_rng(10)
    vecs = rng.normal(size=(40, 32)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    npz = str(tmp_path / "pts.npz")
    np.savez(npz, vectors=vecs, payloads=np.asarray(
        [json.dumps({"region_id": f"r{i}"}) for i in range(40)]))
    root = str(tmp_path / "db")
    rc = main(["--db-root", root, "--model", "test-tiny",
               "upsert", "clipq", npz])
    out = capsys.readouterr()
    assert rc == 0, out.err
    q = vecs[3]
    rc = main(["--db-root", root, "--model", "test-tiny",
               "--index-dtype", "pq", "--pq-m", "4",
               "--pq-oversampling", "40",
               "query", "clipq", "--target", json.dumps(q.tolist()),
               "--top-k", "3", "--json"])
    out = capsys.readouterr()
    assert rc == 0, out.err
    hits = json.loads(out.out)["hits"]
    exact = vecs.astype(np.float64) @ q.astype(np.float64)
    want = np.lexsort((np.arange(40), -exact))[:3]
    assert [h["id"] for h in hits] == [int(w) for w in want]
