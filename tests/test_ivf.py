"""IVF approximate-search tests: recall vs exact scan, exactness at full
probe, id mapping."""
import numpy as np
import pytest
import jax

from reverso_tpu.store.ivf import IVFIndex
from test_topk import numpy_topk64, random_unit


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    # clustered data so IVF has structure to find
    centers = random_unit(rng, 32, 64)
    rows = []
    for c in centers:
        pts = c[None] + 0.15 * rng.standard_normal((250, 64)).astype(np.float32)
        rows.append(pts / np.linalg.norm(pts, axis=1, keepdims=True))
    db = np.concatenate(rows)
    perm = rng.permutation(len(db))
    return db[perm].astype(np.float32)


def recall_at_k(pred_ids, true_ids):
    return np.mean([len(set(p) & set(t)) / len(t)
                    for p, t in zip(pred_ids, true_ids)])


def test_ivf_recall(corpus):
    rng = np.random.default_rng(1)
    queries = corpus[rng.choice(len(corpus), 32, replace=False)]
    true_s, true_i = numpy_topk64(corpus, queries, 10)
    idx = IVFIndex(corpus, n_clusters=32, dtype="float32", seed=0)
    s, i = jax.device_get(idx.search(queries, 10, nprobe=8))
    assert recall_at_k(i, true_i) > 0.95
    # scores are true cosine scores of the returned ids
    got = np.take_along_axis(
        queries.astype(np.float64) @ corpus.astype(np.float64).T, i, axis=1)
    np.testing.assert_allclose(s, got, atol=1e-4)


def test_ivf_full_probe_is_exact(corpus):
    rng = np.random.default_rng(2)
    queries = random_unit(rng, 8, 64)
    _, true_i = numpy_topk64(corpus, queries, 10)
    idx = IVFIndex(corpus, n_clusters=16, dtype="float32", seed=0)
    s, i = jax.device_get(idx.search(queries, 10, nprobe=16))
    assert recall_at_k(i, true_i) == 1.0


def test_ivf_small_k_and_1d_query(corpus):
    idx = IVFIndex(corpus[:500], n_clusters=8, dtype="float32")
    s, i = jax.device_get(idx.search(corpus[3], 5, nprobe=2))
    assert i.shape == (1, 5)
    assert i[0, 0] == 3            # self-match survives the id mapping
    assert s[0, 0] > 0.999


def test_engine_ivf_mode(tmp_path):
    """search.index='ivf' routes engine queries through the IVF index."""
    import dataclasses, sys
    sys.path.insert(0, "tests")
    from test_pipeline import make_corpus
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.detect import StubDetector
    from reverso_tpu.engine import Reverso, _IVFSearchAdapter
    from reverso_tpu.models.pe import PerceptionEncoder
    import numpy as np

    model = dataclasses.replace(MODEL_PRESETS["test-tiny"], dtype="float32")
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=model,
        store=dataclasses.replace(cfg.store, root_dir=str(tmp_path / "db")),
        search=dataclasses.replace(cfg.search, index="ivf", ivf_clusters=4,
                                   ivf_nprobe=4))
    engine = Reverso(cfg, encoder=PerceptionEncoder(model))
    files = make_corpus(tmp_path / "imgs", n=20)
    engine.create_database(str(tmp_path / "imgs"), "ivfdb", use_direct_pe=True)
    engine.process_image_direct_pe(files[5])
    text, items = engine.search_similar(similarity_threshold=0.5)
    assert items and items[0]["filename"] == "img_005.jpg", text
    assert isinstance(engine._get_index(), _IVFSearchAdapter)

    # with a mesh, the engine builds the row-SHARDED IVF, same results
    engine_m = Reverso(cfg, encoder=engine.encoder, use_mesh=True)
    engine_m.load_database("ivfdb")
    engine_m.region_embeddings = engine.region_embeddings
    engine_m.region_metadata_list = engine.region_metadata_list
    text_m, items_m = engine_m.search_similar(similarity_threshold=0.5)
    assert engine_m._get_index()._ivf.mesh is not None
    assert [it["filename"] for it in items_m] == [
        it["filename"] for it in items]


@pytest.mark.slow
def test_sharded_ivf_matches_single_device(corpus):
    """8-way virtual-mesh IVF == single-device IVF, exactly (BASELINE
    config #5's multi-host story, round-1 verdict #6)."""
    from reverso_tpu.parallel import make_mesh

    mesh = make_mesh()
    rng = np.random.default_rng(3)
    queries = corpus[rng.choice(len(corpus), 16, replace=False)]
    single = IVFIndex(corpus, n_clusters=32, dtype="float32", seed=0)
    sharded = IVFIndex(corpus, n_clusters=32, dtype="float32", seed=0,
                       mesh=mesh)
    for nprobe in (4, 8, 32):
        s1, i1 = jax.device_get(single.search(queries, 10, nprobe=nprobe))
        s2, i2 = jax.device_get(sharded.search(queries, 10, nprobe=nprobe))
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, atol=1e-6)


def test_sharded_ivf_uneven_rows_and_big_k():
    """Row count not divisible by the shard count; k larger than any
    single cluster; 1-row clusters at shard boundaries."""
    from reverso_tpu.parallel import make_mesh

    mesh = make_mesh()
    rng = np.random.default_rng(4)
    db = random_unit(rng, 8 * 37 + 5, 32)     # 301 rows over 8 shards
    qs = random_unit(rng, 4, 32)
    single = IVFIndex(db, n_clusters=12, dtype="float32", seed=1)
    sharded = IVFIndex(db, n_clusters=12, dtype="float32", seed=1,
                       mesh=mesh)
    s1, i1 = jax.device_get(single.search(qs, 40, nprobe=12))
    s2, i2 = jax.device_get(sharded.search(qs, 40, nprobe=12))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-6)
    # full probe on every shard == exact scan
    _, true_i = numpy_topk64(db, qs, 40)
    assert recall_at_k(i2, true_i) == 1.0


# -- int8 storage (round 3: IVF x 2x capacity for the 100M config) ------

def test_ivf_int8_recall_and_exact_scores(corpus):
    """int8 IVF probes clusters with the two-digit exact scan: recall
    matches the bf16 index (probe misses dominate, not quantization)
    and returned scores are exact w.r.t. the stored int8 rows."""
    rng = np.random.default_rng(3)
    queries = corpus[rng.choice(len(corpus), 16, replace=False)]
    _, true_i = numpy_topk64(corpus, queries, 10)
    idx = IVFIndex(corpus, n_clusters=32, dtype="int8", seed=0)
    s, i = jax.device_get(idx.search(queries, 10, nprobe=8))
    assert recall_at_k(i, true_i) > 0.9
    # scores must equal f64 cosine vs the DEQUANTIZED stored rows
    deq = np.zeros_like(corpus)
    order = np.asarray(idx.row_ids)
    mat = np.asarray(idx.matrix[: idx.m]).astype(np.float64)
    valid = order >= 0                 # skip 8-alignment gap rows
    deq[order[valid]] = mat[valid] * idx.db_scale
    got = np.take_along_axis(
        queries.astype(np.float64) @ deq.T, i, axis=1)
    np.testing.assert_allclose(s, got, rtol=2e-5, atol=2e-5)


def test_ivf_int8_full_probe_matches_int8_exact_kernel(corpus):
    """nprobe == n_clusters must reproduce the flat int8-exact scan's
    neighbor ids (same stored quantization, same query decomposition)."""
    import jax.numpy as jnp
    from reverso_tpu.ops.topk import cosine_topk_int8_exact, quantize_db_int8

    db = corpus[:2000]
    rng = np.random.default_rng(4)
    queries = random_unit(rng, 8, 64)
    idx = IVFIndex(db, n_clusters=8, dtype="int8", seed=0)
    s_ivf, i_ivf = jax.device_get(idx.search(queries, 10, nprobe=8))
    # flat scan over the SAME int8 representation (global scale is
    # computed on the cluster-sorted matrix => identical values)
    deq = np.zeros_like(db)
    order = np.asarray(idx.row_ids)
    valid = order >= 0                 # skip 8-alignment gap rows
    deq[order[valid]] = np.asarray(
        idx.matrix[: idx.m]).astype(np.float32)[valid] * idx.db_scale
    true_s, true_i = numpy_topk64(deq, queries, 10)
    assert recall_at_k(i_ivf, true_i) == 1.0
    np.testing.assert_allclose(s_ivf, true_s, rtol=2e-5, atol=2e-5)


def test_sharded_ivf_int8_matches_single_device(corpus):
    from reverso_tpu.parallel import make_mesh
    mesh = make_mesh()
    rng = np.random.default_rng(5)
    queries = corpus[rng.choice(len(corpus), 8, replace=False)]
    single = IVFIndex(corpus, n_clusters=32, dtype="int8", seed=0)
    sharded = IVFIndex(corpus, n_clusters=32, dtype="int8", seed=0,
                       mesh=mesh)
    s1, i1 = jax.device_get(single.search(queries, 10, nprobe=8))
    s2, i2 = jax.device_get(sharded.search(queries, 10, nprobe=8))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6, atol=1e-6)


def test_ivf_cache_roundtrip_bitwise(tmp_path, corpus):
    """save_cache/load_cache must reproduce the index exactly (same
    centroids/order/counts -> bitwise-identical search results)."""
    rng = np.random.default_rng(6)
    queries = corpus[rng.choice(len(corpus), 8, replace=False)]
    for dtype in ("bfloat16", "int8"):
        idx = IVFIndex(corpus, n_clusters=32, dtype=dtype, seed=0)
        path = str(tmp_path / f"ivf_{dtype}.npz")
        idx.save_cache(path)
        idx2 = IVFIndex.load_cache(corpus, path, dtype=dtype)
        assert idx2 is not None
        s1, i1 = jax.device_get(idx.search(queries, 10, nprobe=8))
        s2, i2 = jax.device_get(idx2.search(queries, 10, nprobe=8))
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(s1, s2)
    # mismatched vectors (different count) -> None, not garbage
    assert IVFIndex.load_cache(corpus[:100], path) is None


def test_engine_ivf_cache_skips_retraining(tmp_path, monkeypatch):
    """Second process (fresh engine) must reload the persisted k-means
    result instead of retraining."""
    import dataclasses
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso
    from reverso_tpu.models.pe import PerceptionEncoder
    from reverso_tpu.store import VectorStore
    import reverso_tpu.store.ivf as ivf_mod

    root = str(tmp_path / "db")
    rng = np.random.default_rng(0)
    vecs = random_unit(rng, 600, 16)
    import os as _os
    _os.makedirs(root, exist_ok=True)
    with VectorStore.create(root, "ivfdb", 16) as s:
        s.append(vecs, [{"region_id": f"r{i}", "filename": f"{i}.jpg"}
                        for i in range(len(vecs))])

    def make(monkey_fail):
        cfg = default_config()
        enc = PerceptionEncoder(dataclasses.replace(
            MODEL_PRESETS["test-tiny"], dtype="float32"))
        cfg = dataclasses.replace(
            cfg, model=enc.cfg,
            store=dataclasses.replace(cfg.store, root_dir=root),
            search=dataclasses.replace(cfg.search, index="ivf",
                                       ivf_clusters=16, ivf_nprobe=16))
        eng = Reverso(cfg, encoder=enc)
        eng.load_database("ivfdb")
        if monkey_fail:
            def boom(*a, **k):
                raise AssertionError("k-means retrained despite cache")
            monkeypatch.setattr(ivf_mod, "_kmeans_fit", boom)
        return eng

    eng1 = make(False)
    s1, i1 = eng1.search_batch(vecs[:4], k=5)
    cache_dir = _os.path.join(root, "ivfdb", "index")
    assert any(f.startswith("ivf_") for f in _os.listdir(cache_dir))

    eng2 = make(True)       # _kmeans_fit now raises if called
    s2, i2 = eng2.search_batch(vecs[:4], k=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(s1, s2)


# -- spilled assignments (round 3: SOAR-lite recall boost) ---------------

def test_spill_unique_ids_and_recall_gain(corpus):
    """spill=0.25 must (a) never return a duplicate id, (b) return
    exact cosine scores for the ids it returns, and (c) beat the
    no-spill recall at small nprobe on clustered data (boundary rows
    are recoverable from the runner-up cluster)."""
    rng = np.random.default_rng(7)
    # queries near db points, where probe misses actually happen
    qi = rng.choice(len(corpus), 64, replace=False)
    queries = corpus[qi] + 0.05 * rng.standard_normal(
        (64, corpus.shape[1])).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    _, true_i = numpy_topk64(corpus, queries, 10)

    plain = IVFIndex(corpus, n_clusters=32, dtype="float32", seed=0)
    spill = IVFIndex(corpus, n_clusters=32, dtype="float32", seed=0,
                     spill=0.25)
    assert plain.n_spill == 0 and plain.n_entries == plain.n
    assert spill.n_spill == pytest.approx(0.25 * len(corpus), rel=0.05)
    assert spill.n_entries == spill.n + spill.n_spill

    rec = {}
    for name, idx in (("plain", plain), ("spill", spill)):
        s, i = jax.device_get(idx.search(queries, 10, nprobe=2))
        valid = i >= 0
        for row_ids, row_valid in zip(i, valid):
            ids = row_ids[row_valid]
            assert len(set(ids.tolist())) == len(ids), row_ids
        got = np.take_along_axis(
            queries.astype(np.float64) @ corpus.astype(np.float64).T,
            np.where(valid, i, 0), axis=1)
        np.testing.assert_allclose(s[valid], got[valid], atol=1e-4)
        rec[name] = recall_at_k(i, true_i)
    assert rec["spill"] > rec["plain"], rec


def test_spill_full_probe_is_exact(corpus):
    """With every cluster probed, every spilled row appears TWICE in
    the candidates — dedup must still reproduce the exact scan."""
    rng = np.random.default_rng(8)
    queries = random_unit(rng, 8, 64)
    true_s, true_i = numpy_topk64(corpus, queries, 10)
    idx = IVFIndex(corpus, n_clusters=16, dtype="float32", seed=0,
                   spill=0.5)
    s, i = jax.device_get(idx.search(queries, 10, nprobe=16))
    assert recall_at_k(i, true_i) == 1.0
    np.testing.assert_allclose(s, true_s, atol=1e-4)


@pytest.mark.slow
def test_sharded_spill_matches_single_device(corpus):
    """Row-sharded spill == single-device spill, exactly: shards emit
    top-2k so the merged multiset is complete, dedup runs post-merge
    in the same (-score, composite-position) order."""
    from reverso_tpu.parallel import make_mesh

    mesh = make_mesh()
    rng = np.random.default_rng(9)
    queries = corpus[rng.choice(len(corpus), 16, replace=False)]
    for dtype in ("float32", "int8"):
        single = IVFIndex(corpus, n_clusters=32, dtype=dtype, seed=0,
                          spill=0.3)
        sharded = IVFIndex(corpus, n_clusters=32, dtype=dtype, seed=0,
                           spill=0.3, mesh=mesh)
        for nprobe in (2, 8, 32):
            s1, i1 = jax.device_get(single.search(queries, 10,
                                                  nprobe=nprobe))
            s2, i2 = jax.device_get(sharded.search(queries, 10,
                                                   nprobe=nprobe))
            np.testing.assert_array_equal(i1, i2)
            np.testing.assert_allclose(s1, s2, atol=1e-6)


def test_spill_int8_full_probe_matches_exact(corpus):
    """int8 x spill: full probe reproduces the flat scan over the same
    stored int8 rows (dedup + two-digit decomposition compose)."""
    db = corpus[:2000]
    rng = np.random.default_rng(10)
    queries = random_unit(rng, 8, 64)
    idx = IVFIndex(db, n_clusters=8, dtype="int8", seed=0, spill=0.4)
    s_ivf, i_ivf = jax.device_get(idx.search(queries, 10, nprobe=8))
    deq = np.zeros_like(db)
    order = np.asarray(idx.row_ids)
    valid = order >= 0                 # skip 8-alignment gap rows
    deq[order[valid]] = np.asarray(
        idx.matrix[: idx.m]).astype(np.float32)[valid] * idx.db_scale
    true_s, true_i = numpy_topk64(deq, queries, 10)
    assert recall_at_k(i_ivf, true_i) == 1.0
    np.testing.assert_allclose(s_ivf, true_s, rtol=2e-5, atol=2e-5)


def test_spill_cache_roundtrip(tmp_path, corpus):
    """save_cache/load_cache must preserve the spilled entry table
    (n_spill, duplicated order) -> bitwise-identical search."""
    rng = np.random.default_rng(11)
    queries = corpus[rng.choice(len(corpus), 8, replace=False)]
    idx = IVFIndex(corpus, n_clusters=32, dtype="int8", seed=0, spill=0.2)
    path = str(tmp_path / "ivf_spill.npz")
    idx.save_cache(path)
    idx2 = IVFIndex.load_cache(corpus, path, dtype="int8")
    assert idx2 is not None
    assert idx2.n_spill == idx.n_spill and idx2.m == idx.m
    s1, i1 = jax.device_get(idx.search(queries, 10, nprobe=4))
    s2, i2 = jax.device_get(idx2.search(queries, 10, nprobe=4))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(s1, s2)


# -- incremental extension (round 3: appends don't retrain k-means) -----

def test_extend_cache_full_probe_exact(tmp_path, corpus):
    """Extending a cached index with appended rows must keep the exact
    contract: full probe == exact scan over ALL rows, and the new rows
    are findable by id."""
    old, new = corpus[:6000], corpus[:7500]
    idx = IVFIndex(old, n_clusters=16, dtype="float32", seed=0)
    path = str(tmp_path / "ivf.npz")
    idx.save_cache(path)

    ext = IVFIndex.extend_cache(new, path, dtype="float32")
    assert ext is not None
    assert ext.n == 7500 and ext.n_entries == 7500 and ext.n_spill == 0
    rng = np.random.default_rng(12)
    queries = new[rng.choice(7500, 16, replace=False)]
    _, true_i = numpy_topk64(new, queries, 10)
    s, i = jax.device_get(ext.search(queries, 10, nprobe=16))
    assert recall_at_k(i, true_i) == 1.0
    # a query equal to an appended row finds itself first
    s, i = jax.device_get(ext.search(new[7000], 5, nprobe=16))
    assert i[0, 0] == 7000

    # not a prefix / too much growth -> None (caller retrains)
    assert IVFIndex.extend_cache(new[:6000], path) is None       # n == n_old
    assert IVFIndex.extend_cache(new[:3000], path) is None       # shrunk
    assert IVFIndex.extend_cache(new, path, max_grow=0.1) is None


def test_extend_cache_spill_and_int8(tmp_path, corpus):
    """Extension composes with spill (same fraction on the new rows)
    and int8 storage; still no duplicate ids, still exact at full
    probe w.r.t. the stored int8 rows."""
    old, new = corpus[:5000], corpus[:6800]
    idx = IVFIndex(old, n_clusters=16, dtype="int8", seed=0, spill=0.2)
    path = str(tmp_path / "ivf.npz")
    idx.save_cache(path)
    ext = IVFIndex.extend_cache(new, path, dtype="int8")
    assert ext is not None
    assert ext.n_spill > idx.n_spill        # new rows spilled too
    assert ext.n_entries == 6800 + ext.n_spill
    rng = np.random.default_rng(13)
    queries = new[rng.choice(6800, 8, replace=False)]
    s, i = jax.device_get(ext.search(queries, 10, nprobe=16))
    for row in np.asarray(i):
        v = row[row >= 0]
        assert len(set(v.tolist())) == len(v), row
    deq = np.zeros_like(new)
    order = np.asarray(ext.row_ids)
    valid = order >= 0                 # skip 8-alignment gap rows
    deq[order[valid]] = np.asarray(
        ext.matrix[: ext.m]).astype(np.float32)[valid] * ext.db_scale
    _, true_i = numpy_topk64(deq, queries, 10)
    assert recall_at_k(i, true_i) == 1.0


def test_engine_ivf_append_extends_without_retrain(tmp_path, monkeypatch):
    """Store appends must NOT retrain k-means (extend path); truncate
    bumps mutation_epoch and forces the retrain."""
    import dataclasses
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso
    from reverso_tpu.models.pe import PerceptionEncoder
    from reverso_tpu.store import VectorStore
    import reverso_tpu.store.ivf as ivf_mod
    import os as _os

    root = str(tmp_path / "db")
    rng = np.random.default_rng(0)
    vecs = random_unit(rng, 900, 16)
    _os.makedirs(root, exist_ok=True)
    with VectorStore.create(root, "grow", 16) as s:
        s.append(vecs[:600], [{"region_id": f"r{i}"} for i in range(600)])

    def make():
        cfg = default_config()
        enc = PerceptionEncoder(dataclasses.replace(
            MODEL_PRESETS["test-tiny"], dtype="float32"))
        cfg = dataclasses.replace(
            cfg, model=enc.cfg,
            store=dataclasses.replace(cfg.store, root_dir=root),
            search=dataclasses.replace(cfg.search, index="ivf",
                                       ivf_clusters=16, ivf_nprobe=16))
        eng = Reverso(cfg, encoder=enc)
        eng.load_database("grow")
        return eng

    eng1 = make()
    eng1.search_batch(vecs[:4], k=5)                 # trains + caches

    with VectorStore.open(root, "grow", writable=True) as s:
        s.append(vecs[600:800], [{"region_id": f"r{i}"}
                                 for i in range(600, 800)])

    calls = []
    orig = ivf_mod._kmeans_fit
    monkeypatch.setattr(ivf_mod, "_kmeans_fit",
                        lambda *a, **k: (calls.append(1), orig(*a, **k))[1])
    eng2 = make()
    s2, i2 = eng2.search_batch(vecs[795], k=5)
    assert calls == [], "append retrained k-means instead of extending"
    assert i2[0, 0] == 795                           # appended row found
    # the extended table was re-cached: a THIRD engine hits load_cache
    eng3 = make()
    s3, i3 = eng3.search_batch(vecs[795], k=5)
    assert calls == []
    np.testing.assert_array_equal(i2, i3)

    # truncate rewrites the prefix -> epoch bump -> full retrain
    with VectorStore.open(root, "grow", writable=True) as s:
        s.truncate(700)
    eng4 = make()
    eng4.search_batch(vecs[:4], k=5)
    assert calls == [1], "truncate must invalidate the k-means cache"


# -- device-resident build (`from_device`) ------------------------------

def test_from_device_matches_host_build_bitwise(corpus):
    """Same values + same seed => the device build IS the host build:
    identical entry order, counts, stored matrix, and search output
    (shared _kmeans_fit/_assign_all/_plan_entries on one backend)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    queries = corpus[rng.choice(len(corpus), 16, replace=False)]
    host = IVFIndex(corpus, n_clusters=32, dtype="bfloat16", seed=0)
    dev = IVFIndex.from_device(jnp.asarray(corpus), n_clusters=32,
                               dtype="bfloat16", seed=0)
    np.testing.assert_array_equal(np.asarray(host.row_ids),
                                  np.asarray(dev.row_ids))
    np.testing.assert_array_equal(np.asarray(host.counts),
                                  np.asarray(dev.counts))
    np.testing.assert_array_equal(
        np.asarray(host.centroids, np.float32),
        np.asarray(dev.centroids, np.float32))
    m = host.m
    np.testing.assert_array_equal(
        np.asarray(host.matrix[:m], np.float32),
        np.asarray(dev.matrix[:m], np.float32))
    for nprobe in (4, 32):
        s1, i1 = jax.device_get(host.search(queries, 10, nprobe=nprobe))
        s2, i2 = jax.device_get(dev.search(queries, 10, nprobe=nprobe))
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(s1, s2)


def test_from_device_int8_and_spill_match_host(corpus):
    import jax.numpy as jnp

    rng = np.random.default_rng(8)
    queries = corpus[rng.choice(len(corpus), 8, replace=False)]
    host = IVFIndex(corpus, n_clusters=16, dtype="int8", seed=0,
                    spill=0.2)
    dev = IVFIndex.from_device(jnp.asarray(corpus), n_clusters=16,
                               dtype="int8", seed=0, spill=0.2)
    assert dev.n_spill == host.n_spill > 0
    assert dev.db_scale == pytest.approx(host.db_scale, rel=1e-6)
    m = host.m
    np.testing.assert_array_equal(np.asarray(host.matrix[:m]),
                                  np.asarray(dev.matrix[:m]))
    s1, i1 = jax.device_get(host.search(queries, 10, nprobe=6))
    s2, i2 = jax.device_get(dev.search(queries, 10, nprobe=6))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(s1, s2)


@pytest.mark.slow
def test_from_device_sharded_matches_single(corpus):
    """Mesh from_device gathers straight into the sharded layout; search
    must equal the single-device from_device search exactly."""
    import jax.numpy as jnp
    from reverso_tpu.parallel import make_mesh

    mesh = make_mesh()
    rng = np.random.default_rng(9)
    queries = corpus[rng.choice(len(corpus), 8, replace=False)]
    emb = jnp.asarray(corpus)
    single = IVFIndex.from_device(emb, n_clusters=32, dtype="float32",
                                  seed=0)
    sharded = IVFIndex.from_device(emb, n_clusters=32, dtype="float32",
                                   seed=0, mesh=mesh)
    for nprobe in (4, 32):
        s1, i1 = jax.device_get(single.search(queries, 10, nprobe=nprobe))
        s2, i2 = jax.device_get(sharded.search(queries, 10, nprobe=nprobe))
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, atol=1e-6)


def test_from_device_cache_roundtrip(tmp_path, corpus):
    """save_cache from a host build -> load_cache_device rebuilds the
    same index from device embeddings (zero host O(N*d) traffic)."""
    import jax.numpy as jnp

    path = str(tmp_path / "ivf.npz")
    host = IVFIndex(corpus, n_clusters=16, dtype="bfloat16", seed=0)
    host.save_cache(path)
    dev = IVFIndex.load_cache_device(jnp.asarray(corpus), path,
                                     dtype="bfloat16")
    assert dev is not None
    rng = np.random.default_rng(10)
    queries = corpus[rng.choice(len(corpus), 8, replace=False)]
    s1, i1 = jax.device_get(host.search(queries, 10, nprobe=8))
    s2, i2 = jax.device_get(dev.search(queries, 10, nprobe=8))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(s1, s2)
    # shape mismatch -> None
    assert IVFIndex.load_cache_device(jnp.asarray(corpus[:100]),
                                      path) is None


# -- capacity balancing (`balance=f`) -----------------------------------

def _skewed_corpus(seed=11, n=6000, d=64):
    """Lognormal cluster sizes: the shape where cmax >> mean."""
    rng = np.random.default_rng(seed)
    centers = random_unit(rng, 24, d)
    w = rng.lognormal(0.0, 1.2, 24)
    sizes = np.maximum(8, (w / w.sum() * n)).astype(int)
    rows = []
    for c, s in zip(centers, sizes):
        pts = c[None] + 0.12 * rng.standard_normal((s, d)).astype(np.float32)
        rows.append(pts / np.linalg.norm(pts, axis=1, keepdims=True))
    db = np.concatenate(rows)[:n]
    return db[rng.permutation(len(db))].astype(np.float32)


def test_balance_caps_cmax_by_splitting():
    db = _skewed_corpus()
    n = len(db)
    plain = IVFIndex(db, n_clusters=24, dtype="float32", seed=0)
    bal = IVFIndex(db, n_clusters=24, dtype="float32", seed=0,
                   balance=1.25)
    cap = int(np.ceil(1.25 * n / 24))
    # oversized clusters split into child centroids: cmax capped, the
    # centroid table grows
    assert bal.cmax <= cap, (bal.cmax, cap)
    assert bal.cmax < plain.cmax
    assert bal.n_clusters > plain.n_clusters == 24
    assert len(np.asarray(bal.centroids)) == bal.n_clusters
    # every row present exactly once (gaps carry -1)
    rid_all = np.asarray(bal.row_ids)
    ids = np.sort(rid_all[rid_all >= 0])
    np.testing.assert_array_equal(ids, np.arange(n))
    # rows land close to their stored centroid: each row's cluster
    # scores within the top-4 of the expanded table (children are
    # trained on the parent's members only, so global top-1 is not
    # guaranteed — top-4 bounds the drift)
    cent = np.asarray(bal.centroids, np.float32)
    s = db @ cent.T
    offsets = np.asarray(bal.offsets)
    counts = np.asarray(bal.counts)
    cluster_of = np.empty(n, np.int64)
    rid = np.asarray(bal.row_ids)
    for c in range(bal.n_clusters):
        cluster_of[rid[offsets[c]:offsets[c] + counts[c]]] = c
    rank = (s > s[np.arange(n), cluster_of][:, None]).sum(1)
    assert (rank < 4).mean() > 0.95, (rank < 4).mean()


def test_balance_hard_cap_on_point_mass():
    """A mass of identical rows is spatially unsplittable (every
    k-means round routes it whole); the residual even split must still
    enforce the cap, keep every id exactly once, and return exact
    scores for the duplicated vector."""
    rng = np.random.default_rng(16)
    base = random_unit(rng, 1, 64)[0]
    dup = np.repeat(base[None], 3000, axis=0)
    rest = random_unit(rng, 3000, 64)
    db = np.concatenate([dup, rest]).astype(np.float32)
    db = db[rng.permutation(len(db))]
    bal = IVFIndex(db, n_clusters=12, dtype="float32", seed=0,
                   balance=1.1)
    cap = int(np.ceil(1.1 * len(db) / 12))
    assert bal.cmax <= cap, (bal.cmax, cap)
    rid_all = np.asarray(bal.row_ids)
    ids = np.sort(rid_all[rid_all >= 0])
    np.testing.assert_array_equal(ids, np.arange(len(db)))
    # siblings share the parent's exact centroid -> tie-adjacent ranks
    # -> probing enough slots finds the mass members at score ~1.0
    s, i = jax.device_get(bal.search(base, 10, nprobe=10))
    np.testing.assert_allclose(np.asarray(s)[0], 1.0, atol=1e-5)
    dup_rows = set(np.nonzero((db == base).all(axis=1))[0].tolist())
    assert all(int(x) in dup_rows for x in np.asarray(i)[0])


def test_balance_recall_stays_close(corpus):
    rng = np.random.default_rng(12)
    q = corpus[rng.choice(len(corpus), 32, replace=False)]
    exact = IVFIndex(corpus, n_clusters=1, dtype="float32", seed=0)
    _, i_true = jax.device_get(exact.search(q, 10, nprobe=1))
    plain = IVFIndex(corpus, n_clusters=32, dtype="float32", seed=0)
    bal = IVFIndex(corpus, n_clusters=32, dtype="float32", seed=0,
                   balance=1.25)
    _, i_p = jax.device_get(plain.search(q, 10, nprobe=8))
    _, i_b = jax.device_get(bal.search(q, 10, nprobe=8))
    r_p = recall_at_k(i_p, i_true)
    r_b = recall_at_k(i_b, i_true)
    assert r_b >= r_p - 0.05, (r_p, r_b)


def test_balance_with_spill_and_from_device_parity(corpus):
    import jax.numpy as jnp

    rng = np.random.default_rng(13)
    q = corpus[rng.choice(len(corpus), 8, replace=False)]
    host = IVFIndex(corpus, n_clusters=16, dtype="int8", seed=0,
                    spill=0.15, balance=1.5)
    dev = IVFIndex.from_device(jnp.asarray(corpus), n_clusters=16,
                               dtype="int8", seed=0, spill=0.15,
                               balance=1.5)
    assert host.n_spill == dev.n_spill > 0
    np.testing.assert_array_equal(np.asarray(host.row_ids),
                                  np.asarray(dev.row_ids))
    s1, i1 = jax.device_get(host.search(q, 10, nprobe=6))
    s2, i2 = jax.device_get(dev.search(q, 10, nprobe=6))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(s1, s2)


# -- Pallas probed-scan kernel (ops/ivf_scan.py) -------------------------
# interpret mode on CPU; the contract is exact equality with the XLA
# probe loop (int8 is bitwise by construction; bf16/f32 share the same
# f32 math in interpret mode)

@pytest.fixture(scope="module")
def corpus128():
    """Clustered corpus at d=128 (the kernel needs d % 128 == 0), with
    skewed cluster sizes and a few exact-duplicate rows (tie cases)."""
    rng = np.random.default_rng(5)
    centers = random_unit(rng, 24, 128)
    w = rng.lognormal(0.0, 1.0, 24)
    sizes = np.maximum(16, (w / w.sum() * 6000)).astype(int)
    rows = []
    for c, sz in zip(centers, sizes):
        pts = c[None] + 0.15 * rng.standard_normal(
            (sz, 128)).astype(np.float32)
        rows.append(pts / np.linalg.norm(pts, axis=1, keepdims=True))
    db = np.concatenate(rows)
    db[100] = db[4000]          # exact duplicates across clusters
    db[101] = db[4000]
    return db[rng.permutation(len(db))].astype(np.float32)


@pytest.mark.parametrize("dtype,spill,balance", [
    ("float32", 0.0, 0.0),
    ("bfloat16", 0.0, 1.25),
    ("int8", 0.0, 0.0),
    ("int8", 0.2, 1.25),
    ("bfloat16", 0.15, 0.0),
])
def test_probe_scan_matches_xla(corpus128, dtype, spill, balance):
    idx = IVFIndex(corpus128, n_clusters=24, dtype=dtype, seed=0,
                   spill=spill, balance=balance)
    rng = np.random.default_rng(6)
    q = corpus128[rng.choice(len(corpus128), 8, replace=False)]
    q = q + 0.03 * rng.standard_normal(q.shape).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    for qs, k, nprobe in ((q[:1], 10, 4), (q, 10, 6), (q, 3, 1),
                          (q, 25, idx.n_clusters)):
        s_x, i_x = jax.device_get(idx.search(qs, k, nprobe=nprobe,
                                             impl="xla"))
        s_p, i_p = jax.device_get(idx.search(qs, k, nprobe=nprobe,
                                             impl="pallas"))
        np.testing.assert_array_equal(i_x, i_p)
        if dtype == "int8":
            # exact s32 dots: the two paths are bitwise equal
            np.testing.assert_array_equal(s_x, s_p)
        else:
            # matvec vs matmul accumulation order: last-ulp f32 drift
            np.testing.assert_allclose(s_x, s_p, rtol=2e-6, atol=1e-7)


def test_probe_scan_query_chunking(corpus128):
    """Q > the kernel's resident-query cap exercises the launch loop."""
    idx = IVFIndex(corpus128, n_clusters=16, dtype="int8", seed=0)
    rng = np.random.default_rng(7)
    q = corpus128[rng.choice(len(corpus128), 67, replace=False)]
    s_x, i_x = jax.device_get(idx.search(q, 10, nprobe=4, impl="xla"))
    s_p, i_p = jax.device_get(idx.search(q, 10, nprobe=4, impl="pallas"))
    np.testing.assert_array_equal(i_x, i_p)
    np.testing.assert_array_equal(s_x, s_p)


def test_probe_scan_tiny_clusters_and_k_gt_candidates():
    """cmax smaller than one tile; k exceeding the probed candidate
    count must pad with (-inf, -1) exactly like the XLA path."""
    rng = np.random.default_rng(8)
    db = random_unit(rng, 64, 128)
    idx = IVFIndex(db, n_clusters=32, dtype="float32", seed=0)
    q = random_unit(rng, 3, 128)
    s_x, i_x = jax.device_get(idx.search(q, 20, nprobe=2, impl="xla"))
    s_p, i_p = jax.device_get(idx.search(q, 20, nprobe=2, impl="pallas"))
    np.testing.assert_array_equal(i_x, i_p)
    np.testing.assert_allclose(s_x, s_p, rtol=2e-6, atol=1e-7)
    assert (i_p == -1).any()        # some slots below k are absent


@pytest.mark.slow
@pytest.mark.parametrize("dtype,spill", [("int8", 0.15), ("bfloat16", 0.0)])
def test_probe_scan_sharded_matches_xla(corpus128, dtype, spill):
    """Kernel inside shard_map: per-shard probed scan + all_gather
    merge must equal the XLA sharded path AND the single-device scan."""
    from reverso_tpu.parallel import make_mesh

    mesh = make_mesh()
    idx = IVFIndex(corpus128, n_clusters=16, dtype=dtype, seed=0,
                   spill=spill, balance=1.25, mesh=mesh)
    single = IVFIndex(corpus128, n_clusters=16, dtype=dtype, seed=0,
                      spill=spill, balance=1.25)
    rng = np.random.default_rng(9)
    q = corpus128[rng.choice(len(corpus128), 8, replace=False)]
    for nprobe in (4, 8):
        s_x, i_x = jax.device_get(idx.search(q, 10, nprobe=nprobe,
                                             impl="xla"))
        s_p, i_p = jax.device_get(idx.search(q, 10, nprobe=nprobe,
                                             impl="pallas"))
        s_1, i_1 = jax.device_get(single.search(q, 10, nprobe=nprobe,
                                                impl="xla"))
        np.testing.assert_array_equal(i_x, i_p)
        np.testing.assert_array_equal(i_1, i_p)
        if dtype == "int8":
            np.testing.assert_array_equal(s_x, s_p)
        else:
            np.testing.assert_allclose(s_x, s_p, rtol=2e-6, atol=1e-7)


def test_probe_scan_rejects_unpadded_dim(corpus):
    idx = IVFIndex(corpus[:500], n_clusters=8, dtype="float32", seed=0)
    with pytest.raises(ValueError, match="128"):
        idx.search(corpus[:2], 5, nprobe=2, impl="pallas")


def test_extend_cache_after_balance(tmp_path, corpus):
    """Appends extend a balance-built cache assign-only: the expanded
    child-centroid table is reused, no retrain, every id exactly once,
    and full-probe recall stays exact."""
    old, new = corpus[:5000], corpus[:6500]
    idx = IVFIndex(old, n_clusters=16, dtype="float32", seed=0,
                   balance=1.25)
    assert idx.n_clusters > 16                   # splitting engaged
    path = str(tmp_path / "ivf.npz")
    idx.save_cache(path)
    ext = IVFIndex.extend_cache(new, path, dtype="float32")
    assert ext is not None
    assert ext.n_clusters == idx.n_clusters     # table reused, no split
    rid_all = np.asarray(ext.row_ids)
    ids = np.sort(rid_all[rid_all >= 0])
    np.testing.assert_array_equal(ids, np.arange(6500))
    rng = np.random.default_rng(21)
    q = new[rng.choice(6500, 8, replace=False)]
    _, i = jax.device_get(ext.search(q, 10, nprobe=ext.n_clusters))
    _, true_i = numpy_topk64(new, q, 10)
    assert recall_at_k(i, true_i) == 1.0


@pytest.mark.slow
def test_balance_sharded_matches_single_device(corpus):
    """Mesh-sharded IVF with balance == single-device, exactly (the
    split-expanded centroid table shards like any other)."""
    from reverso_tpu.parallel import make_mesh

    rng = np.random.default_rng(15)
    q = corpus[rng.choice(len(corpus), 16, replace=False)]
    single = IVFIndex(corpus, n_clusters=24, dtype="float32", seed=0,
                      balance=1.25)
    sharded = IVFIndex(corpus, n_clusters=24, dtype="float32", seed=0,
                       balance=1.25, mesh=make_mesh())
    assert sharded.n_clusters == single.n_clusters > 24
    for nprobe in (4, 8):
        s1, i1 = jax.device_get(single.search(q, 10, nprobe=nprobe))
        s2, i2 = jax.device_get(sharded.search(q, 10, nprobe=nprobe))
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, atol=1e-6)


def test_engine_ivf_balance_wiring(tmp_path):
    """config.search.ivf_balance reaches the IVF build and keys the
    persisted cache (a plain-cache file must not satisfy a balance
    config)."""
    import dataclasses
    import os as _os
    import sys
    sys.path.insert(0, "tests")
    from test_pipeline import make_corpus
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.detect import StubDetector  # noqa: F401 (import parity)
    from reverso_tpu.engine import Reverso
    from reverso_tpu.models.pe import PerceptionEncoder

    model = dataclasses.replace(MODEL_PRESETS["test-tiny"],
                                dtype="float32")
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=model,
        store=dataclasses.replace(cfg.store, root_dir=str(tmp_path / "db")),
        search=dataclasses.replace(cfg.search, index="ivf", ivf_clusters=4,
                                   ivf_nprobe=4, ivf_balance=1.5))
    engine = Reverso(cfg, encoder=PerceptionEncoder(model))
    make_corpus(tmp_path / "imgs", n=20)
    engine.create_database(str(tmp_path / "imgs"), "baldb",
                           use_direct_pe=True)
    adapter = engine._get_index()
    assert adapter._ivf.cmax <= int(np.ceil(1.5 * adapter._ivf.n / 4))
    cache_dir = _os.path.join(str(tmp_path / "db"), "baldb", "index")
    names = _os.listdir(cache_dir)
    assert any("_b150" in f for f in names), names


def test_balance_cache_roundtrip(tmp_path, corpus):
    path = str(tmp_path / "ivf.npz")
    bal = IVFIndex(corpus, n_clusters=16, dtype="bfloat16", seed=0,
                   balance=1.25)
    bal.save_cache(path)
    re = IVFIndex.load_cache(corpus, path, dtype="bfloat16")
    assert re is not None and re.cmax == bal.cmax
    rng = np.random.default_rng(14)
    q = corpus[rng.choice(len(corpus), 8, replace=False)]
    s1, i1 = jax.device_get(bal.search(q, 10, nprobe=8))
    s2, i2 = jax.device_get(re.search(q, 10, nprobe=8))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(s1, s2)


def test_plan_entries_cap_drops_overflow():
    """Spill admission is per runner-up cluster up to the balance cap:
    most-boundary rows (smallest margin) first, deterministic tiebreak
    on row id, overflow simply not spilled."""
    from reverso_tpu.store.ivf import _plan_entries

    assign = np.array([0, 0, 1, 1, 2, 2])
    second = np.array([1, 1, 0, 0, 0, 0])
    margin = np.array([.9, .9, .1, .2, .3, .4], np.float32)
    # cap == base counts: no room anywhere -> every spill dropped
    order, counts, n_spill = _plan_entries(6, 3, assign, second, margin,
                                           spill=1.0, cap=2)
    assert n_spill == 0
    np.testing.assert_array_equal(counts, [2, 2, 2])
    np.testing.assert_array_equal(np.sort(order), np.arange(6))
    # one slot of room per cluster: cluster 0 admits its smallest-
    # margin suitor (row 2); cluster 1 admits row 0 (margin tie with
    # row 1 -> lower row id wins); cluster 2 has no suitors
    order, counts, n_spill = _plan_entries(6, 3, assign, second, margin,
                                           spill=1.0, cap=3)
    assert n_spill == 2
    np.testing.assert_array_equal(counts, [3, 3, 2])
    spilled = np.bincount(order, minlength=6)
    np.testing.assert_array_equal(spilled, [2, 1, 2, 1, 1, 1])
    # no cap: every candidate spills (previous behavior unchanged)
    _, counts, n_spill = _plan_entries(6, 3, assign, second, margin,
                                       spill=1.0, cap=None)
    assert n_spill == 6 and counts.sum() == 12


def test_spill_respects_balance_cap():
    """Spilled copies must not re-inflate clusters past the balance
    cap: a popular runner-up cluster otherwise grows cmax unbounded
    and every probe's padded [cmax, d] slice pays for it."""
    db = _skewed_corpus()
    n = len(db)
    idx = IVFIndex(db, n_clusters=24, dtype="float32", seed=0,
                   spill=0.25, balance=1.25)
    cap = int(np.ceil(1.25 * n / 24))
    counts = np.asarray(idx.counts)
    assert counts.max() <= cap, (int(counts.max()), cap)
    assert idx.cmax <= cap
    rid = np.asarray(idx.row_ids)
    copies = np.bincount(rid[rid >= 0], minlength=n)
    assert copies.min() >= 1 and copies.max() <= 2
    assert idx.n_spill == idx.n_entries - n <= int(0.25 * n) + 1
    s, i = jax.device_get(idx.search(db[5], 10, nprobe=8))
    assert i[0, 0] == 5
    assert len(set(i[0].tolist())) == 10      # dedup intact


def test_ivf_scan_supported_bounds():
    """The auto-dispatch feasibility check: d/k contract bounds plus
    the VMEM budget (staging area scales with cmax_pad and cannot be
    tiled away — wide-but-feasible widths run at a reduced query
    block, infeasible ones report unsupported so dispatch falls back
    to XLA instead of failing a Mosaic allocation)."""
    from reverso_tpu.ops.ivf_scan import (_probe_tiling, _qp_for,
                                          ivf_scan_supported)

    assert ivf_scan_supported(5120, 1024, 1, 20)
    assert not ivf_scan_supported(5120, 1000, 1, 20)      # d % 128
    assert not ivf_scan_supported(5120, 1024, 1, 129)     # k contract
    assert not ivf_scan_supported(400_000, 1024, 1, 20)   # VMEM
    # the measured hardware config keeps its exact tiling (gw is part
    # of the flat-index contract)
    assert _probe_tiling(5120, 1024, 1) == (512, 12, 4)
    # cmax_pad ~24k is feasible at a reduced query block
    db_tile, chunks, n_bufs = _probe_tiling(24576, 1024, 1)
    qp = _qp_for(db_tile, chunks, n_bufs, 1024, 1, 24, int8=True)
    assert 8 <= qp < 64, qp
    assert ivf_scan_supported(24576, 1024, 1, 20)


def test_probe_scan_k_over_128_raises():
    import jax.numpy as jnp

    from reverso_tpu.ops.ivf_scan import ivf_probe_scan

    mat = jnp.zeros((16, 128), jnp.float32)
    q = jnp.zeros((1, 128), jnp.float32)
    qd = jnp.zeros((2, 1, 128), jnp.int8)
    tbl = jnp.zeros((1, 2), jnp.int32)
    with pytest.raises(ValueError, match="k <= 128"):
        ivf_probe_scan(mat, q, qd, jnp.ones((1, 1)), tbl, tbl,
                       k=129, nprobe=2, cmax_pad=8, int8=False)


def test_engine_cache_keeps_sibling_configs(tmp_path):
    """A dirty rebuild under config B must not delete config A's
    still-valid cache: alternating two IVF configs against one store
    (an A/B of spill, say) would otherwise retrain k-means on every
    flip."""
    import dataclasses
    import os as _os
    import sys
    sys.path.insert(0, "tests")
    from test_pipeline import make_corpus
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso
    from reverso_tpu.models.pe import PerceptionEncoder

    model = dataclasses.replace(MODEL_PRESETS["test-tiny"],
                                dtype="float32")
    base = default_config()
    base = dataclasses.replace(
        base, model=model,
        store=dataclasses.replace(base.store,
                                  root_dir=str(tmp_path / "db")),
        search=dataclasses.replace(base.search, index="ivf",
                                   ivf_clusters=4, ivf_nprobe=4))
    enc = PerceptionEncoder(model)
    eng_a = Reverso(base, encoder=enc)
    make_corpus(tmp_path / "imgs", n=20)
    eng_a.create_database(str(tmp_path / "imgs"), "sibdb",
                          use_direct_pe=True)
    eng_a._get_index()
    cache_dir = _os.path.join(str(tmp_path / "db"), "sibdb", "index")
    files_a = set(_os.listdir(cache_dir))
    assert len(files_a) == 1
    (cache_a,) = files_a
    mtime_a = _os.path.getmtime(_os.path.join(cache_dir, cache_a))

    cfg_b = dataclasses.replace(
        base, search=dataclasses.replace(base.search, ivf_spill=0.25))
    eng_b = Reverso(cfg_b, encoder=enc)
    assert eng_b.load_database("sibdb").startswith("✅")
    eng_b._get_index()
    files_ab = set(_os.listdir(cache_dir))
    assert cache_a in files_ab and len(files_ab) == 2, files_ab
    assert _os.path.getmtime(
        _os.path.join(cache_dir, cache_a)) == mtime_a

    # config A reloads its untouched cache (no retrain, no new files)
    eng_a2 = Reverso(base, encoder=enc)
    assert eng_a2.load_database("sibdb").startswith("✅")
    eng_a2._get_index()
    assert set(_os.listdir(cache_dir)) == files_ab


def test_engine_ivf_named_spaces(tmp_path, monkeypatch):
    """IVF applies per NAMED vector space (qdrant indexes each named
    space independently; round-4 lift of the default-space-only
    restriction): `using=` + index='ivf' routes through a per-space
    IVF adapter with its own persisted k-means cache, and a fresh
    engine reloads both caches without retraining."""
    import dataclasses
    import os as _os

    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso, _IVFSearchAdapter
    from reverso_tpu.models.pe import PerceptionEncoder
    from reverso_tpu.store import VectorStore
    import reverso_tpu.store.ivf as ivf_mod

    root = str(tmp_path / "db")
    rng = np.random.default_rng(2)
    n, d, dn = 400, 16, 8
    dense = random_unit(rng, n, d)
    named = random_unit(rng, n, dn)
    with VectorStore.create(root, "nsivf", d, named={"txt": dn}) as s:
        s.append({"": dense, "txt": named},
                 [{"region_id": f"r{i}"} for i in range(n)])

    def make():
        cfg = default_config()
        enc = PerceptionEncoder(dataclasses.replace(
            MODEL_PRESETS["test-tiny"], dtype="float32"))
        cfg = dataclasses.replace(
            cfg, model=enc.cfg,
            store=dataclasses.replace(cfg.store, root_dir=root),
            search=dataclasses.replace(cfg.search, index="ivf",
                                       ivf_clusters=8, ivf_nprobe=8))
        eng = Reverso(cfg, encoder=enc)
        eng.load_database("nsivf")
        return eng

    eng = make()
    assert isinstance(eng._get_index(""), _IVFSearchAdapter)
    assert isinstance(eng._get_index("txt"), _IVFSearchAdapter)
    # full probe (nprobe == clusters) reproduces the exact scan over
    # the stored representation — named-space ids must match brute
    # force over the named matrix, not the default one
    q = named[7]
    hits = eng.query(q.tolist(), using="txt", k=5)
    brute = np.argsort(-(named @ q))[:5]
    assert [h["id"] for h in hits] == list(brute)
    hits_d = eng.query(dense[7].tolist(), k=5)
    brute_d = np.argsort(-(dense @ dense[7]))[:5]
    assert [h["id"] for h in hits_d] == list(brute_d)
    # per-space cache files persisted side by side
    files = _os.listdir(_os.path.join(root, "nsivf", "index"))
    assert any(f.startswith("ivf_txt_c8_") for f in files), files
    assert any(f.startswith("ivf_c8_") for f in files), files

    # fresh engine: both spaces reload from cache, no retrain
    eng2 = make()
    def boom(*a, **k):
        raise AssertionError("k-means retrained despite cache")
    monkeypatch.setattr(ivf_mod, "_kmeans_fit", boom)
    hits2 = eng2.query(q.tolist(), using="txt", k=5)
    assert [h["id"] for h in hits2] == [h["id"] for h in hits]
    hits2_d = eng2.query(dense[7].tolist(), k=5)
    assert [h["id"] for h in hits2_d] == [h["id"] for h in hits_d]


def test_engine_ivf_dot_store(tmp_path):
    """Dot-distance stores index with IVF too (round-5 lift of the
    cosine-only gate; qdrant indexes every metric): the whole IVF
    pipeline is dot-based, so unnormalized rows cluster by
    magnitude-weighted direction and in-cluster scans score the metric
    itself. Full probe == brute-force dot; partial probe keeps recall
    on clustered data; euclid stores still fall through to the exact
    index."""
    import dataclasses

    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso, _IVFSearchAdapter
    from reverso_tpu.models.pe import PerceptionEncoder
    from reverso_tpu.store import VectorStore

    root = str(tmp_path / "db")
    rng = np.random.default_rng(11)
    n, d = 600, 32
    # clustered UNNORMALIZED rows: direction clusters x magnitude spread
    centers = random_unit(rng, 12, d)
    rows = np.concatenate(
        [c[None] * rng.uniform(0.5, 3.0, (50, 1)).astype(np.float32)
         + 0.05 * rng.standard_normal((50, d)).astype(np.float32)
         for c in centers])
    rows = rows[rng.permutation(n)].astype(np.float32)
    with VectorStore.create(root, "dotivf", d, distance="dot") as s:
        s.append(rows, [{"region_id": f"r{i}"} for i in range(n)])

    def make(nprobe, name="dotivf"):
        cfg = default_config()
        enc = PerceptionEncoder(dataclasses.replace(
            MODEL_PRESETS["test-tiny"], dtype="float32"))
        cfg = dataclasses.replace(
            cfg, model=enc.cfg,
            store=dataclasses.replace(cfg.store, root_dir=root,
                                      dtype="float32"),
            search=dataclasses.replace(cfg.search, index="ivf",
                                       ivf_clusters=12, ivf_nprobe=nprobe))
        eng = Reverso(cfg, encoder=enc)
        eng.load_database(name)
        return eng

    eng = make(nprobe=12)
    assert isinstance(eng._get_index(""), _IVFSearchAdapter)
    qs = rows[:20]
    dots64 = rows.astype(np.float64) @ qs.astype(np.float64).T
    true = np.argsort(-dots64, axis=0, kind="stable")[:10].T
    # full probe reproduces brute-force dot (set-exact; near-tie order
    # may differ between f32 accumulation and the f64 reference)
    for j, q in enumerate(qs):
        hits = eng.query(q.tolist(), k=10)
        assert recall_at_k([[h["id"] for h in hits]], [true[j]]) == 1.0
        got = np.asarray([h["score"] for h in hits])
        want = dots64[[h["id"] for h in hits], j]
        np.testing.assert_allclose(got, want, atol=1e-4)
    # partial probe: high recall on clustered data
    eng2 = make(nprobe=4)
    got = [[h["id"] for h in eng2.query(q.tolist(), k=10)] for q in qs]
    assert recall_at_k(got, list(true)) >= 0.9

    # euclid still falls through to the exact (augmented) dense index
    with VectorStore.create(root, "euivf", d, distance="euclid") as s:
        s.append(rows, [{"region_id": f"r{i}"} for i in range(n)])
    enge = make(nprobe=12, name="euivf")
    assert not isinstance(enge._get_index(""), _IVFSearchAdapter)


def test_engine_ivf_dot_sharded_and_per_space(tmp_path):
    """Dot IVF composes with the rest of the gate's machinery: a
    row-sharded (8-device mesh) dot IVF returns the same ids as the
    single-device one, and NAMED dot spaces route through per-space
    IVF adapters."""
    import dataclasses

    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso, _IVFSearchAdapter
    from reverso_tpu.models.pe import PerceptionEncoder
    from reverso_tpu.store import VectorStore

    root = str(tmp_path / "db")
    rng = np.random.default_rng(13)
    n, d, dn = 500, 32, 16
    dense = (random_unit(rng, n, d)
             * rng.uniform(0.5, 2.0, (n, 1)).astype(np.float32))
    named = (random_unit(rng, n, dn)
             * rng.uniform(0.5, 2.0, (n, 1)).astype(np.float32))
    with VectorStore.create(root, "dsh", d, named={"txt": dn},
                            distance="dot") as s:
        s.append({"": dense, "txt": named},
                 [{"region_id": f"r{i}"} for i in range(n)])

    def make(use_mesh):
        cfg = default_config()
        enc = PerceptionEncoder(dataclasses.replace(
            MODEL_PRESETS["test-tiny"], dtype="float32"))
        cfg = dataclasses.replace(
            cfg, model=enc.cfg,
            store=dataclasses.replace(cfg.store, root_dir=root,
                                      dtype="float32"),
            search=dataclasses.replace(cfg.search, index="ivf",
                                       ivf_clusters=8, ivf_nprobe=4))
        eng = Reverso(cfg, encoder=enc, use_mesh=use_mesh)
        eng.load_database("dsh")
        return eng

    eng = make(False)
    engm = make(True)
    assert isinstance(eng._get_index("txt"), _IVFSearchAdapter)
    assert engm._get_index("")._ivf.mesh is not None
    for q, sp in [(dense[3], ""), (named[3], "txt")]:
        h1 = eng.query(q.tolist(), k=8, using=sp)
        h2 = engm.query(q.tolist(), k=8, using=sp)
        assert [x["id"] for x in h1] == [x["id"] for x in h2], sp
        assert [x["score"] for x in h1] == [x["score"] for x in h2], sp
        # NB: no self-match assertion — under dot a bigger-magnitude
        # neighbor can legitimately outscore the query row itself
        assert len(h1) == 8


def test_from_chunks_matches_from_device(corpus):
    """Virtual-corpus build (chunk_fn windows, donated scatter buffer)
    == from_device on the same f32 source: bitwise matrix/row_ids and
    identical searches, int8 and bf16, with and without spill."""
    import jax.numpy as jnp

    n, d = corpus.shape
    emb = jnp.asarray(corpus)

    def chunk_fn(lo, rows):
        return emb[lo:lo + rows]

    for dtype, spill in [("int8", 0.0), ("int8", 0.1),
                         ("float32", 0.0)]:
        a = IVFIndex.from_device(emb, n_clusters=16, dtype=dtype,
                                 seed=3, spill=spill)
        b = IVFIndex.from_chunks(chunk_fn, n, d, chunk=1024,
                                 n_clusters=16, dtype=dtype, seed=3,
                                 spill=spill)
        assert a.m == b.m and a.cmax == b.cmax
        assert a.db_scale == b.db_scale
        np.testing.assert_array_equal(np.asarray(a.row_ids),
                                      np.asarray(b.row_ids))
        np.testing.assert_array_equal(
            np.asarray(a.matrix).view(np.uint8),
            np.asarray(b.matrix).view(np.uint8))
        qs = corpus[:5]
        sa, ia = map(np.asarray, a.search(qs, 8, nprobe=4))
        sb, ib = map(np.asarray, b.search(qs, 8, nprobe=4))
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(sa, sb)
