"""Recommend-by-example search (qdrant's recommend API role over the
reference's store, core_system.py:659-664) and scroll-style point
listing: the average_vector query composition, the best_score combine
vs fp64 truth on every index path (f32 / bf16 / int8 / sharded / host),
and the engine/CLI surfaces.
"""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reverso_tpu.ops.recommend import (
    average_query, best_score_topk, best_score_topk_host,
    context_topk, context_topk_host, discover_topk, discover_topk_host,
    sharded_best_score_topk, sharded_context_topk, sharded_discover_topk,
)
from reverso_tpu.ops.topk import quantize_db_int8
from reverso_tpu.store import VectorStore, DeviceIndex, HostIndex
from reverso_tpu.parallel import make_mesh, shard_rows, replicate

from test_topk import random_unit


# ---------------------------------------------------------------------------
# fp64 truth
# ---------------------------------------------------------------------------

def numpy_best_score64(db, pos, neg=None, mask=None):
    """[N] combined best-score values in fp64 (qdrant's combine)."""
    db64 = db.astype(np.float64)
    bp = (np.atleast_2d(pos).astype(np.float64) @ db64.T).max(axis=0)
    if neg is not None and len(np.atleast_2d(neg)):
        bn = (np.atleast_2d(neg).astype(np.float64) @ db64.T).max(axis=0)
        combined = np.where(bp > bn, bp, -(bn * bn))
    else:
        combined = bp
    if mask is not None:
        combined = np.where(np.asarray(mask, bool), combined, -np.inf)
    return combined


def numpy_discover64(db, target, pos=None, neg=None, mask=None):
    """[N] discover keys in fp64: pair votes * 4 + target similarity."""
    db64 = db.astype(np.float64)
    combined = db64 @ np.asarray(target, np.float64).reshape(-1)
    if pos is not None and len(np.atleast_2d(pos)):
        sp = np.atleast_2d(pos).astype(np.float64) @ db64.T
        sn = np.atleast_2d(neg).astype(np.float64) @ db64.T
        votes = np.where(sp > sn, 1.0, -1.0).sum(axis=0)
        combined = votes * 4.0 + combined
    if mask is not None:
        combined = np.where(np.asarray(mask, bool), combined, -np.inf)
    return combined


def numpy_context64(db, pos, neg, mask=None):
    """[N] context losses in fp64: sum of min(0, s_pos - s_neg)."""
    db64 = db.astype(np.float64)
    sp = np.atleast_2d(pos).astype(np.float64) @ db64.T
    sn = np.atleast_2d(neg).astype(np.float64) @ db64.T
    combined = np.minimum(sp - sn, 0.0).sum(axis=0)
    if mask is not None:
        combined = np.where(np.asarray(mask, bool), combined, -np.inf)
    return combined


def assert_combined_equiv(combined, s, i, k, tol=2e-3):
    """s, i: [1, k] results; checks equivalence against a [N] fp64
    combined-score truth with tie tolerance (same style as
    tests.test_topk.assert_topk_equiv)."""
    order = np.lexsort((np.arange(len(combined)), -combined))
    ts = combined[order][:k]
    ti = order[:k].astype(np.int32)
    ti = np.where(np.isneginf(ts), -1, ti)
    s, i = np.asarray(s)[0], np.asarray(i)[0]
    valid = ti >= 0
    np.testing.assert_array_equal(i[:len(ti)] < 0, ~valid)
    np.testing.assert_allclose(np.where(valid, s[:len(ts)], 0.0),
                               np.where(valid, ts, 0.0), atol=tol)
    clear = np.ones_like(valid)
    clear[:-1] &= (ts[:-1] - ts[1:]) > tol
    clear[1:] &= (ts[:-1] - ts[1:]) > tol
    np.testing.assert_array_equal(np.where(clear & valid, i[:len(ti)], -1),
                                  np.where(clear & valid, ti, -1))


def assert_best_equiv(db, pos, neg, s, i, k, mask=None, tol=2e-3):
    """fp64-truth equivalence for the best_score combine."""
    assert_combined_equiv(numpy_best_score64(db, pos, neg, mask),
                          s, i, k, tol=tol)


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(11)
    db = random_unit(rng, 3000, 64)
    pos = random_unit(rng, 3, 64)
    neg = random_unit(rng, 2, 64)
    return db, pos, neg


# ---------------------------------------------------------------------------
# average_vector composition
# ---------------------------------------------------------------------------

def test_average_query_formula():
    rng = np.random.default_rng(0)
    pos = rng.standard_normal((3, 16)).astype(np.float32)
    neg = rng.standard_normal((2, 16)).astype(np.float32)

    def unit_mean(x):
        x = x / np.linalg.norm(x, axis=1, keepdims=True)
        return x.mean(axis=0)

    ap, an = unit_mean(pos), unit_mean(neg)
    want = ap + (ap - an)
    want /= np.linalg.norm(want)
    np.testing.assert_allclose(average_query(pos, neg), want, atol=1e-6)
    # no negatives -> normalized positive centroid
    ap_unit = ap / np.linalg.norm(ap)
    np.testing.assert_allclose(average_query(pos), ap_unit, atol=1e-6)
    # a single 1-D positive recommends itself
    np.testing.assert_allclose(average_query(pos[0]),
                               pos[0] / np.linalg.norm(pos[0]), atol=1e-6)
    # scaling an example must not change the result (normalize-first)
    scaled = pos.copy()
    scaled[0] *= 100.0
    np.testing.assert_allclose(average_query(scaled, neg),
                               average_query(pos, neg), atol=1e-5)
    with pytest.raises(ValueError):
        average_query(np.zeros((0, 16), np.float32))


# ---------------------------------------------------------------------------
# best_score op
# ---------------------------------------------------------------------------

def test_best_score_f32(case):
    db, pos, neg = case
    ex = jnp.asarray(np.concatenate([pos, neg]))
    s, i = jax.device_get(best_score_topk(jnp.asarray(db), ex, 3, 10))
    assert_best_equiv(db, pos, neg, s, i, 10, tol=1e-5)


def test_best_score_no_negatives(case):
    db, pos, _ = case
    s, i = jax.device_get(best_score_topk(jnp.asarray(db),
                                          jnp.asarray(pos), 3, 10))
    assert_best_equiv(db, pos, None, s, i, 10, tol=1e-5)
    # with no negatives the combine is max-over-positives cosine
    assert (np.asarray(s) <= 1.0 + 1e-5).all()


def test_best_score_negative_sinks(case):
    db, pos, _ = case
    # a db row used AS the negative must sink to -(1.0^2) ~ -1
    neg = db[42:43]
    ex = jnp.asarray(np.concatenate([pos, neg]))
    s, i = jax.device_get(best_score_topk(jnp.asarray(db), ex, 3,
                                          db.shape[0]))
    flat_i = np.asarray(i)[0]
    pos42 = int(np.nonzero(flat_i == 42)[0][0])
    assert np.asarray(s)[0, pos42] <= -0.99
    assert pos42 > db.shape[0] // 2       # ranked deep in the tail


def test_best_score_mask_and_n_valid(case):
    db, pos, neg = case
    mask = np.random.default_rng(3).random(3000) < 0.2
    ex = jnp.asarray(np.concatenate([pos, neg]))
    s, i = jax.device_get(best_score_topk(
        jnp.asarray(db), ex, 3, 10, row_mask=jnp.asarray(mask)))
    assert_best_equiv(db, pos, neg, s, i, 10, mask=mask, tol=1e-5)
    # n_valid trims trailing rows
    s, i = jax.device_get(best_score_topk(jnp.asarray(db), ex, 3, 10,
                                          n_valid=100))
    assert (np.asarray(i) < 100).all()
    assert_best_equiv(db[:100], pos, neg, s, i, 10, tol=1e-5)
    # k > n pads with (-inf, -1)
    s, i = jax.device_get(best_score_topk(jnp.asarray(db[:4]),
                                          ex, 3, 10))
    assert (np.asarray(i)[0, 4:] == -1).all()
    assert np.isneginf(np.asarray(s)[0, 4:]).all()


def test_best_score_int8(case):
    db, pos, neg = case
    db_i8, scale = quantize_db_int8(jnp.asarray(db))
    ex = jnp.asarray(np.concatenate([pos, neg]))
    s, i = jax.device_get(best_score_topk(db_i8, ex, 3, 10,
                                          db_scale=scale))
    deq = np.asarray(db_i8, np.float32) * float(scale)
    assert_best_equiv(deq, pos, neg, s, i, 10, tol=1e-5)


def test_sharded_best_score_matches_single(case):
    db, pos, neg = case
    mesh = make_mesh()
    n = (len(db) // (8 * 8)) * 8 * 8
    ex = jnp.asarray(np.concatenate([pos, neg]))
    s1, i1 = jax.device_get(best_score_topk(jnp.asarray(db[:n]), ex, 3, 10))
    s2, i2 = jax.device_get(sharded_best_score_topk(
        shard_rows(jnp.asarray(db[:n]), mesh), replicate(ex, mesh),
        3, 10, mesh))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-6)
    # masked sharded == masked single
    mask = np.random.default_rng(5).random(n) < 0.3
    s1, i1 = jax.device_get(best_score_topk(
        jnp.asarray(db[:n]), ex, 3, 10, row_mask=jnp.asarray(mask)))
    s2, i2 = jax.device_get(sharded_best_score_topk(
        shard_rows(jnp.asarray(db[:n]), mesh), replicate(ex, mesh),
        3, 10, mesh, row_mask=jax.device_put(
            jnp.asarray(mask),
            jax.sharding.NamedSharding(mesh,
                                       jax.sharding.PartitionSpec("data")))))
    np.testing.assert_array_equal(i1, i2)


# ---------------------------------------------------------------------------
# discover / context ops
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def disc_case():
    rng = np.random.default_rng(17)
    db = random_unit(rng, 3000, 64)
    target = random_unit(rng, 1, 64)[0]
    pos = random_unit(rng, 3, 64)
    neg = random_unit(rng, 3, 64)
    return db, target, pos, neg


def _disc_ex(target, pos, neg):
    return jnp.asarray(np.concatenate([target[None], pos, neg]))


def test_discover_f32(disc_case):
    db, target, pos, neg = disc_case
    s, i = jax.device_get(discover_topk(
        jnp.asarray(db), _disc_ex(target, pos, neg), 3, 10))
    assert_combined_equiv(numpy_discover64(db, target, pos, neg),
                          s, i, 10, tol=1e-5)
    # keys decompose: vote level is an exact integer band
    votes = np.round((np.asarray(s)[0] - 0.0) / 4.0)
    assert (np.abs(np.asarray(s)[0] - votes * 4.0) <= 1.0 + 1e-5).all()


def test_discover_no_pairs_is_target_search(disc_case):
    db, target, _, _ = disc_case
    s, i = jax.device_get(discover_topk(
        jnp.asarray(db), jnp.asarray(target[None]), 0, 10))
    assert_combined_equiv(numpy_discover64(db, target), s, i, 10, tol=1e-5)
    assert (np.asarray(s)[0] <= 1.0 + 1e-5).all()


def test_discover_mask_and_int8(disc_case):
    db, target, pos, neg = disc_case
    mask = np.random.default_rng(6).random(3000) < 0.2
    ex = _disc_ex(target, pos, neg)
    s, i = jax.device_get(discover_topk(
        jnp.asarray(db), ex, 3, 10, row_mask=jnp.asarray(mask)))
    assert_combined_equiv(numpy_discover64(db, target, pos, neg, mask),
                          s, i, 10, tol=1e-5)
    db_i8, scale = quantize_db_int8(jnp.asarray(db))
    s, i = jax.device_get(discover_topk(db_i8, ex, 3, 10, db_scale=scale))
    deq = np.asarray(db_i8, np.float32) * float(scale)
    assert_combined_equiv(numpy_discover64(deq, target, pos, neg),
                          s, i, 10, tol=1e-5)


def test_context_f32_and_zero_loss(disc_case):
    db, _, pos, neg = disc_case
    ex = jnp.asarray(np.concatenate([pos, neg]))
    s, i = jax.device_get(context_topk(jnp.asarray(db), ex, 3, 10))
    assert_combined_equiv(numpy_context64(db, pos, neg), s, i, 10, tol=1e-5)
    assert (np.asarray(s)[0] <= 1e-6).all()     # context loss is <= 0
    # a db row equal to a positive is inside that pair's zone for sure
    db2 = db.copy()
    db2[7] = pos[0]
    s, i = jax.device_get(context_topk(
        jnp.asarray(db2), jnp.asarray(np.concatenate([pos[:1], neg[:1]])),
        1, 10))
    top = np.asarray(i)[0]
    assert 7 in top[np.asarray(s)[0] >= -1e-6]


def test_sharded_discover_context_match_single(disc_case):
    db, target, pos, neg = disc_case
    mesh = make_mesh()
    n = (len(db) // (8 * 8)) * 8 * 8
    ex_d = _disc_ex(target, pos, neg)
    s1, i1 = jax.device_get(discover_topk(jnp.asarray(db[:n]), ex_d, 3, 10))
    s2, i2 = jax.device_get(sharded_discover_topk(
        shard_rows(jnp.asarray(db[:n]), mesh), replicate(ex_d, mesh),
        3, 10, mesh))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-6)
    ex_c = jnp.asarray(np.concatenate([pos, neg]))
    s1, i1 = jax.device_get(context_topk(jnp.asarray(db[:n]), ex_c, 3, 10))
    s2, i2 = jax.device_get(sharded_context_topk(
        shard_rows(jnp.asarray(db[:n]), mesh), replicate(ex_c, mesh),
        3, 10, mesh))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-6)


def test_discover_context_host(disc_case):
    db, target, pos, neg = disc_case
    s, i = discover_topk_host(db, target, pos, neg, 10)
    assert_combined_equiv(numpy_discover64(db, target, pos, neg),
                          s, i, 10, tol=1e-5)
    s, i = discover_topk_host(db, target, None, None, 10)
    assert_combined_equiv(numpy_discover64(db, target), s, i, 10, tol=1e-5)
    s, i = context_topk_host(db, pos, neg, 10)
    assert_combined_equiv(numpy_context64(db, pos, neg), s, i, 10, tol=1e-5)


# ---------------------------------------------------------------------------
# index layer
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dtype,tol", [("float32", 1e-5),
                                       ("bfloat16", 2e-2),
                                       ("int8", 1e-5)])
def test_device_index_best_score(case, dtype, tol):
    db, pos, neg = case
    idx = DeviceIndex(db, dtype=dtype, db_tile=256)
    s, i = jax.device_get(idx.best_score(pos, neg, 10))
    if dtype == "float32":
        truth = db
    else:
        # truth against the stored (rounded) matrix
        truth = (np.asarray(idx.matrix[:len(db)], np.float32)
                 * (idx.scale or 1.0))
    assert_best_equiv(truth, pos, neg, s, i, 10, tol=tol)
    # masked
    mask = np.random.default_rng(4).random(len(db)) < 0.2
    s, i = jax.device_get(idx.best_score(pos, neg, 10, row_mask=mask))
    assert mask[np.asarray(i)[0][np.asarray(i)[0] >= 0]].all()
    assert_best_equiv(truth, pos, neg, s, i, 10, mask=mask, tol=tol)


@pytest.mark.parametrize("dtype,tol", [("float32", 1e-5),
                                       ("bfloat16", 2e-2),
                                       ("int8", 1e-5)])
def test_device_index_discover_context(disc_case, dtype, tol):
    db, target, pos, neg = disc_case
    idx = DeviceIndex(db, dtype=dtype, db_tile=256)
    if dtype == "float32":
        truth = db
    else:
        truth = (np.asarray(idx.matrix[:len(db)], np.float32)
                 * (idx.scale or 1.0))
    s, i = jax.device_get(idx.discover(target, pos, neg, 10))
    # bf16 flips near-tie votes: only check vote-stable cases tightly
    if dtype != "bfloat16":
        assert_combined_equiv(numpy_discover64(truth, target, pos, neg),
                              s, i, 10, tol=tol)
    s, i = jax.device_get(idx.discover(target, k=10))
    assert_combined_equiv(numpy_discover64(truth, target), s, i, 10, tol=tol)
    s, i = jax.device_get(idx.context(pos, neg, 10))
    if dtype != "bfloat16":
        assert_combined_equiv(numpy_context64(truth, pos, neg),
                              s, i, 10, tol=tol)
    with pytest.raises(ValueError):
        idx.discover(target, pos, neg[:2], 10)
    with pytest.raises(ValueError):
        idx.context(np.zeros((0, db.shape[1])), np.zeros((0, db.shape[1])),
                    10)


def test_host_index_discover_context(disc_case):
    db, target, pos, neg = disc_case
    hidx = HostIndex(db)
    s, i = hidx.discover(target, pos, neg, 10)
    assert_combined_equiv(numpy_discover64(db, target, pos, neg),
                          s, i, 10, tol=1e-5)
    mask = np.random.default_rng(9).random(len(db)) < 0.2
    s, i = hidx.context(pos, neg, 10, row_mask=mask)
    assert_combined_equiv(numpy_context64(db, pos, neg, mask),
                          s, i, 10, tol=1e-5)


def test_host_index_best_score(case):
    db, pos, neg = case
    s, i = HostIndex(db).best_score(pos, neg, 10)
    assert_best_equiv(db, pos, neg, s, i, 10, tol=1e-5)
    s, i = best_score_topk_host(db, pos, None, 10)
    assert_best_equiv(db, pos, None, s, i, 10, tol=1e-5)


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
    with VectorStore.create(str(tmp_path / "db"), "rec", d) as s:
        s.append(vecs, payloads)
    engine.load_database("rec")
    return engine, vecs


def test_engine_recommend_average(engine_store):
    engine, vecs = engine_store
    text, items = engine.recommend([3, 7], max_results=5)
    assert items and text.startswith("🎯")
    ids = [it["id"] for it in items]
    assert 3 not in ids and 7 not in ids       # examples excluded
    assert len(items) == 5                     # over-fetch keeps the page full
    # matches the composed-query search directly
    q = average_query(vecs[[3, 7]])
    s, i = engine.search_batch(q, k=7)
    want = [int(x) for x in i[0] if int(x) not in (3, 7)][:5]
    assert ids == want
    # vectors (not ids) work and are not excluded
    text, items = engine.recommend(vecs[3], max_results=3)
    assert items[0]["id"] == 3


def test_engine_recommend_sum_scores(engine_store):
    """qdrant's sum_scores strategy: scores are summed similarities,
    rank == dot with sum(pos) - sum(neg) by linearity."""
    engine, vecs = engine_store
    text, items = engine.recommend([3, 7], negative=[5], max_results=5,
                                   strategy="sum_scores")
    assert items, text
    sims = vecs.astype(np.float64) @ (vecs[3] + vecs[7]
                                      - vecs[5]).astype(np.float64)
    order = [int(i) for i in np.lexsort((np.arange(len(vecs)), -sims))
             if i not in (3, 5, 7)][:5]
    assert [it["id"] for it in items] == order
    # scores ARE the summed sims (not cosines of a composed unit
    # query); tolerance covers the fixture's bf16 index storage
    np.testing.assert_allclose([it["score"] for it in items],
                               sims[order], atol=5e-3)


def test_engine_recommend_sum_scores_rejects_distance_stores(tmp_path):
    import dataclasses as _dc

    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso

    rng = np.random.default_rng(3)
    root = str(tmp_path / "db2")
    vecs = rng.normal(size=(10, 8)).astype(np.float32)
    with VectorStore.create(root, "eu", 8, distance="euclid") as s:
        s.append(vecs, [{} for _ in range(10)])
    cfg = default_config()
    cfg = _dc.replace(
        cfg, model=_dc.replace(MODEL_PRESETS["test-tiny"],
                               dtype="float32"),
        store=_dc.replace(cfg.store, root_dir=root, dtype="float32"))
    engine = Reverso(cfg)
    engine.load_database("eu")
    text, items = engine.recommend([1], strategy="sum_scores")
    assert text.startswith("❌") and "sum_scores" in text and not items


def test_engine_scroll_with_vectors(engine_store):
    engine, vecs = engine_store
    points, nxt = engine.scroll(limit=4, with_vectors=True)
    assert len(points) == 4 and nxt == 4
    for pt in points:
        np.testing.assert_allclose(pt["vector"], vecs[pt["id"]],
                                   atol=1e-6)
    points, _ = engine.scroll(limit=4)
    assert "vector" not in points[0]


def test_engine_recommend_best_score_and_filters(engine_store):
    engine, vecs = engine_store
    text, items = engine.recommend([1], negative=[2], max_results=6,
                                   strategy="best_score",
                                   filter={"detected_class": "person"})
    assert items
    assert all(it["payload"]["detected_class"] == "person" for it in items)
    combined = numpy_best_score64(vecs, vecs[1:2], vecs[2:3])
    persons = np.array([i % 4 == 0 for i in range(40)])
    combined = np.where(persons, combined, -np.inf)
    order = [i for i in np.argsort(-combined, kind="stable") if i != 1][:6]
    got = [it["id"] for it in items]
    assert got == [int(i) for i in order if combined[i] > -np.inf][:len(got)]


def test_engine_recommend_errors(engine_store):
    engine, vecs = engine_store
    text, items = engine.recommend([])
    assert text.startswith("❌") and not items
    text, items = engine.recommend([999])
    assert "out of range" in text
    text, items = engine.recommend([1], strategy="bogus")
    assert "Unknown strategy" in text


def test_engine_discover(engine_store):
    engine, vecs = engine_store
    text, items = engine.discover(3, [(5, 6)], max_results=5)
    assert items and text.startswith("🎯")
    ids = [it["id"] for it in items]
    assert not {3, 5, 6} & set(ids)            # target + pair ids excluded
    combined = numpy_discover64(vecs, vecs[3], vecs[5:6], vecs[6:7])
    order = [int(i) for i in np.argsort(-combined, kind="stable")
             if int(i) not in (3, 5, 6)][:5]
    assert ids == order
    # pure context search (no target)
    text, items = engine.discover(context=[(5, 6)], max_results=5)
    assert items
    ids = [it["id"] for it in items]
    assert not {5, 6} & set(ids)
    combined = numpy_context64(vecs, vecs[5:6], vecs[6:7])
    order = [int(i) for i in np.lexsort((np.arange(40), -combined))
             if int(i) not in (5, 6)][:5]
    assert ids == order
    # raw-vector target + filtered
    text, items = engine.discover(vecs[8], [(1, 2)],
                                  filter={"detected_class": "person"})
    assert items
    assert all(it["payload"]["detected_class"] == "person" for it in items)


def test_engine_discover_errors(engine_store):
    engine, vecs = engine_store
    text, items = engine.discover()
    assert text.startswith("❌") and not items
    text, items = engine.discover(3, [(1,)])
    assert text.startswith("❌")
    text, items = engine.discover(999, [(1, 2)])
    assert "out of range" in text


def test_engine_count(engine_store):
    engine, _ = engine_store
    assert engine.count() == 40
    assert engine.count({"detected_class": "person"}) == 10
    assert engine.count("confidence>=0.5") == 20


def test_engine_scroll(engine_store):
    engine, _ = engine_store
    points, nxt = engine.scroll(limit=15)
    assert [p["id"] for p in points] == list(range(15))
    assert points[0]["payload"]["filename"] == "f0.jpg"
    assert nxt == 15
    points, nxt = engine.scroll(offset=nxt, limit=100)
    assert [p["id"] for p in points] == list(range(15, 40))
    assert nxt is None
    # filtered pages: persons are every 4th row
    points, nxt = engine.scroll(filter={"detected_class": "person"}, limit=4)
    assert [p["id"] for p in points] == [0, 4, 8, 12]
    assert nxt == 16
    points, nxt = engine.scroll(filter={"detected_class": "person"},
                                offset=nxt, limit=100)
    assert [p["id"] for p in points] == [16, 20, 24, 28, 32, 36]
    assert nxt is None
    points, _ = engine.scroll(limit=2, with_payload=False)
    assert points[0]["payload"] is None


def test_engine_scroll_order_by(engine_store):
    """qdrant order_by semantics: numeric payload key, (value, id)
    resume tokens, filters compose, desc direction."""
    engine, _ = engine_store
    points, nxt = engine.scroll(order_by="confidence", limit=10)
    assert [p["id"] for p in points] == list(range(10))   # asc = row order here
    assert nxt == (10 / 40, 10)
    points, nxt = engine.scroll(order_by="confidence", offset=nxt, limit=100)
    assert [p["id"] for p in points] == list(range(10, 40))
    assert nxt is None
    # desc: highest confidence first
    points, nxt = engine.scroll(order_by="confidence", direction="desc",
                                limit=3)
    assert [p["id"] for p in points] == [39, 38, 37]
    points, _ = engine.scroll(order_by="confidence", direction="desc",
                              offset=nxt, limit=100)
    assert [p["id"] for p in points] == list(range(36, -1, -1))
    # filter composes
    points, _ = engine.scroll(filter={"detected_class": "person"},
                              order_by="confidence", direction="desc",
                              limit=4)
    assert [p["id"] for p in points] == [36, 32, 28, 24]
    # ties (same value) break by ascending row id and never dup/skip
    # across pages: walk 1-by-1 and reassemble
    seen = []
    tok = 0
    while True:
        pts, tok = engine.scroll(order_by="confidence", offset=tok, limit=1)
        seen += [p["id"] for p in pts]
        if tok is None:
            break
    assert seen == list(range(40))
    with pytest.raises(ValueError):
        engine.scroll(order_by="confidence", direction="sideways")


def test_scroll_order_by_ties_and_nonnumeric(tmp_path):
    """Tied values page without dup/skip (ties break by ascending row
    id in BOTH directions); rows missing the key or holding strings
    are excluded, matching qdrant's numeric-only order_by."""
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso

    model = dataclasses.replace(MODEL_PRESETS["test-tiny"],
                                dtype="float32")
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=model,
        store=dataclasses.replace(cfg.store,
                                  root_dir=str(tmp_path / "db")))
    engine = Reverso(cfg)
    vecs = random_unit(np.random.default_rng(1), 9, 16)
    # scores: ties everywhere; row 6 missing; row 7 non-numeric
    payloads = [{"filename": f"f{i}.jpg", "score": s} for i, s in
                enumerate([2.0, 1.0, 2.0, 1.0, 2.0, 1.0])]
    payloads += [{"filename": "f6.jpg"},
                 {"filename": "f7.jpg", "score": "high"},
                 {"filename": "f8.jpg", "score": 0.5}]
    with VectorStore.create(str(tmp_path / "db"), "ties", 16) as s:
        s.append(vecs, payloads)
    engine.load_database("ties")
    want_asc = [8, 1, 3, 5, 0, 2, 4]
    for page in (1, 2, 3, 7):
        seen, tok = [], 0
        while True:
            pts, tok = engine.scroll(order_by="score", offset=tok,
                                     limit=page)
            seen += [p["id"] for p in pts]
            if tok is None:
                break
        assert seen == want_asc, (page, seen)
        seen, tok = [], 0
        while True:
            pts, tok = engine.scroll(order_by="score", offset=tok,
                                     direction="desc", limit=page)
            seen += [p["id"] for p in pts]
            if tok is None:
                break
        assert seen == [0, 2, 4, 1, 3, 5, 8], (page, seen)


def test_scroll_order_by_datetime(tmp_path):
    """order_by over RFC 3339 string payloads sorts by timestamp
    (qdrant's datetime order_by); unparseable strings stay excluded
    and numeric values share the epoch-seconds axis."""
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso

    model = dataclasses.replace(MODEL_PRESETS["test-tiny"],
                                dtype="float32")
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=model,
        store=dataclasses.replace(cfg.store,
                                  root_dir=str(tmp_path / "db")))
    engine = Reverso(cfg)
    vecs = random_unit(np.random.default_rng(2), 6, 16)
    payloads = [
        {"ts": "2024-03-01T00:00:00Z"},            # 0: middle
        {"ts": "2024-01-02T01:00:00+02:00"},       # 1: earliest (utc)
        {"ts": "not a date"},                      # 2: excluded
        {"ts": "2024-06-01"},                      # 3: latest (naive=utc)
        {},                                        # 4: excluded
        {"ts": "2024-01-02T00:00:00Z"},            # 5: second (tie-ish)
    ]
    with VectorStore.create(str(tmp_path / "db"), "dts", 16) as s:
        s.append(vecs, payloads)
    engine.load_database("dts")
    want = [1, 5, 0, 3]     # 1 is 2024-01-01T23:00Z < 5
    seen, tok = [], 0
    while True:
        pts, tok = engine.scroll(order_by="ts", offset=tok, limit=2)
        seen += [p["id"] for p in pts]
        if tok is None:
            break
    assert seen == want, seen
    pts, _ = engine.scroll(order_by="ts", direction="desc", limit=10)
    assert [p["id"] for p in pts] == want[::-1]


def test_engine_query_plain_and_rescore(engine_store):
    """Universal query API: plain shape matches search_batch; the
    multi-stage shape rescores the union of prefetch candidates
    EXACTLY (fp32 dot, ties to lower id) against the query."""
    engine, vecs = engine_store
    # plain: vector / point-id / region_id operands agree
    hits = engine.query(vecs[3], k=5)
    s, i = engine.search_batch(vecs[3], k=5)
    assert [h["id"] for h in hits] == [int(x) for x in i[0]]
    np.testing.assert_allclose([h["score"] for h in hits], s[0], atol=1e-6)
    assert hits[0]["payload"]["filename"] == "f3.jpg"
    assert [h["id"] for h in engine.query(3, k=5)] == \
        [h["id"] for h in engine.query("r3", k=5)] == \
        [h["id"] for h in hits]

    # use_batcher routes the plain unfiltered shape through the
    # micro-batcher (same results, launch counted); filtered queries
    # stay on the direct masked path regardless
    before = engine.searcher.launches
    hb = engine.query(vecs[3], k=5, use_batcher=True)
    assert [h["id"] for h in hb] == [h["id"] for h in hits]
    assert engine.searcher.launches > before
    f = {"must": [{"key": "detected_class", "match": {"value": "car"}}]}
    before = engine.searcher.launches
    hf = engine.query(vecs[3], k=5, filter=f, use_batcher=True)
    assert engine.searcher.launches == before
    assert all(h["payload"]["detected_class"] == "car" for h in hf)

    # multi-stage: two branches, exact rescore of the union
    hits = engine.query(vecs[0],
                        prefetch=[{"query": 5, "limit": 8},
                                  {"query": 9, "limit": 8,
                                   "filter": "detected_class=car"}],
                        k=6)
    s5, i5 = engine.search_batch(vecs[5], k=8)
    s9, i9 = engine.search_batch(vecs[9], k=8)
    mask = np.array([p % 4 != 0 for p in range(40)])
    order = np.lexsort((np.arange(40),
                        -np.where(mask, vecs @ vecs[9], -np.inf)))
    want9 = order[:8]
    cand = sorted(set(int(x) for x in i5[0]) | set(int(x) for x in want9))
    resc = np.asarray(vecs[cand], np.float32) @ vecs[0].astype(np.float32)
    best = np.lexsort((np.asarray(cand), -resc))[:6]
    assert [h["id"] for h in hits] == [int(cand[j]) for j in best]
    np.testing.assert_allclose([h["score"] for h in hits],
                               resc[best], atol=1e-6)

    # errors
    with pytest.raises(ValueError):
        engine.query()
    with pytest.raises(ValueError):
        engine.query(vecs[0], prefetch=[3], fusion="rrf")
    from reverso_tpu.store import StoreError
    with pytest.raises(StoreError):
        engine.query(999)
    with pytest.raises(StoreError):
        engine.query(np.zeros(7))


def test_engine_query_fusion(engine_store):
    """RRF and DBSF fusion vs hand-computed references."""
    engine, vecs = engine_store
    k = 6
    b1, b2 = engine.search_batch(vecs[2], k=10), \
        engine.search_batch(vecs[11], k=10)
    ids1 = [int(x) for x in b1[1][0]]
    ids2 = [int(x) for x in b2[1][0]]
    fused = {}
    for ids in (ids1, ids2):
        for r, pid in enumerate(ids):
            fused[pid] = fused.get(pid, 0.0) + 1.0 / (61.0 + r)
    want = [pid for pid, _ in
            sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:k]]
    hits = engine.query(prefetch=[{"query": 2, "limit": 10},
                                  {"query": 11, "limit": 10}], k=k)
    assert [h["id"] for h in hits] == want            # rrf is the default
    hits2 = engine.query(prefetch=[{"query": 2, "limit": 10},
                                   {"query": 11, "limit": 10}],
                         fusion="rrf", k=k)
    assert hits2 == hits

    fused = {}
    for ids, scores in ((ids1, b1[0][0]), (ids2, b2[0][0])):
        a = np.asarray(scores, np.float64)
        lo, hi = a.mean() - 3 * a.std(), a.mean() + 3 * a.std()
        for pid, ns in zip(ids, (a - lo) / (hi - lo)):
            fused[pid] = fused.get(pid, 0.0) + float(ns)
    want = [pid for pid, _ in
            sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:k]]
    hits = engine.query(prefetch=[{"query": 2, "limit": 10},
                                  {"query": 11, "limit": 10}],
                        fusion="dbsf", k=k)
    assert [h["id"] for h in hits] == want
    with pytest.raises(ValueError):
        engine.query(prefetch=[2], fusion="mean")
    # global filter applies INSIDE branches: all results match it
    hits = engine.query(prefetch=[{"query": 2, "limit": 10}],
                        filter={"detected_class": "person"}, k=5)
    assert hits and all(h["id"] % 4 == 0 for h in hits)


def test_engine_query_text_operand(tmp_path):
    """`{"text": ...}` operands embed through the text tower — usable
    as prefetch branches or the rescoring query."""
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso
    from reverso_tpu.store import StoreError

    d = 16
    vecs = random_unit(np.random.default_rng(5), 12, d)

    class FakeTextEmbedder:
        def embed(self, text):
            return vecs[3][None]           # always "matches" row 3

    model = dataclasses.replace(MODEL_PRESETS["test-tiny"],
                                dtype="float32")
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=model,
        store=dataclasses.replace(cfg.store,
                                  root_dir=str(tmp_path / "db")))
    engine = Reverso(cfg, text_embedder=FakeTextEmbedder())
    with VectorStore.create(str(tmp_path / "db"), "txq", d) as s:
        s.append(vecs, [{"filename": f"f{i}.jpg"} for i in range(12)])
    engine.load_database("txq")
    hits = engine.query({"text": "whatever"}, k=3)
    assert hits[0]["id"] == 3
    hits = engine.query({"text": "x"}, prefetch=[0, 5], k=4)
    assert hits                                   # rescore path
    hits = engine.query(prefetch=[{"query": {"text": "x"}, "limit": 4}],
                        k=2)
    assert hits[0]["id"] == 3                     # branch operand
    engine2 = Reverso(cfg)                        # no text tower
    engine2.load_database("txq")
    with pytest.raises(StoreError):
        engine2.query({"text": "x"})


def test_engine_retrieve(engine_store):
    engine, vecs = engine_store
    pts = engine.retrieve([5, "r7", 999, "nope", 0])
    assert [p["id"] for p in pts] == [5, 7, 0]     # unknown ids skipped
    assert pts[1]["payload"]["region_id"] == "r7"
    pts = engine.retrieve([3], with_vectors=True)
    np.testing.assert_allclose(pts[0]["vector"], vecs[3], atol=1e-6)
    assert engine.retrieve([]) == []


def test_with_payload_selectors(engine_store):
    # qdrant PayloadSelector forms flow through retrieve/scroll/query
    engine, vecs = engine_store
    pts = engine.retrieve([2], with_payload=["filename"])
    assert pts[0]["payload"] == {"filename": "f2.jpg"}
    pts = engine.retrieve([2], with_payload={"exclude": ["region_id",
                                                         "confidence"]})
    assert set(pts[0]["payload"]) == {"filename", "detected_class"}
    pts, _ = engine.scroll(limit=2, with_payload="detected_class")
    assert pts[0]["payload"] == {"detected_class": "person"}
    hits = engine.query(vecs[5], k=3,
                        with_payload={"include": ["region_id"]})
    assert hits[0]["id"] == 5
    assert hits[0]["payload"] == {"region_id": "r5"}
    [res] = engine.query_batch([{"query": vecs[5], "k": 2,
                                 "with_payload": ["filename"]}])
    assert res[0]["payload"] == {"filename": "f5.jpg"}
    from reverso_tpu.store.filter import FilterError
    with pytest.raises(FilterError):
        engine.retrieve([2], with_payload={"bogus": []})


def test_engine_facet(engine_store):
    engine, _ = engine_store
    rows = engine.facet("detected_class")
    assert rows == [{"value": "car", "count": 30},
                    {"value": "person", "count": 10}]
    rows = engine.facet("detected_class", filter="confidence>=0.5")
    assert rows == [{"value": "car", "count": 15},
                    {"value": "person", "count": 5}]
    assert engine.facet("detected_class", limit=1) == [
        {"value": "car", "count": 30}]
    assert engine.facet("missing_key") == []


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def test_cli_recommend_and_points(tmp_path, capsys):
    from reverso_tpu.cli import main

    rng = np.random.default_rng(1)
    vecs = random_unit(rng, 20, 32)
    payloads = [{"filename": f"f{i}.jpg", "region_id": f"r{i}",
                 "detected_class": "person" if i < 5 else "car"}
                for i in range(20)]
    root = str(tmp_path / "db")
    with VectorStore.create(root, "clirec", 32) as s:
        s.append(vecs, payloads)

    rc = main(["--db-root", root, "--model", "test-tiny",
               "recommend", "--name", "clirec",
               "--positive", "2", "--negative", "9",
               "--top-k", "4", "--json"])
    out = capsys.readouterr().out
    assert rc == 0
    import json as _json
    items = _json.loads(out)
    assert len(items) == 4 and all(it["id"] not in (2, 9) for it in items)

    rc = main(["--db-root", root, "--model", "test-tiny",
               "points", "clirec",
               "--filter", "detected_class=person", "--limit", "3",
               "--json"])
    out = capsys.readouterr().out
    assert rc == 0
    data = _json.loads(out)
    assert [p["id"] for p in data["points"]] == [0, 1, 2]
    assert data["next_offset"] == 3

    rc = main(["--db-root", root, "--model", "test-tiny",
               "discover", "--name", "clirec", "--target", "2",
               "--pair", "5:9", "--top-k", "4", "--json"])
    out = capsys.readouterr().out
    assert rc == 0
    items = _json.loads(out)
    assert len(items) == 4 and all(it["id"] not in (2, 5, 9) for it in items)

    rc = main(["--db-root", root, "--model", "test-tiny",
               "discover", "--name", "clirec", "--target", "2",
               "--pair", "bogus"])
    assert rc == 1
    assert "bad --pair" in capsys.readouterr().err


def test_cli_facet_get_ordered_points(tmp_path, capsys):
    import json as _json
    from reverso_tpu.cli import main

    rng = np.random.default_rng(2)
    vecs = random_unit(rng, 12, 32)
    payloads = [{"filename": f"f{i}.jpg", "region_id": f"r{i}",
                 "detected_class": "person" if i % 3 == 0 else "car",
                 "confidence": (i % 4) / 4}
                for i in range(12)]
    root = str(tmp_path / "db")
    with VectorStore.create(root, "clif", 32) as s:
        s.append(vecs, payloads)
    base = ["--db-root", root, "--model", "test-tiny"]

    rc = main(base + ["facet", "clif", "detected_class", "--json"])
    out = capsys.readouterr().out
    assert rc == 0
    assert _json.loads(out)["facets"] == [
        {"value": "car", "count": 8}, {"value": "person", "count": 4}]

    rc = main(base + ["get", "clif", "3", "r5", "77", "--json"])
    out = capsys.readouterr().out
    assert rc == 0
    pts = _json.loads(out)["points"]
    assert [p["id"] for p in pts] == [3, 5]
    rc = main(base + ["get", "clif", "99"])
    capsys.readouterr()
    assert rc == 2                       # nothing found

    # ordered paging through the VALUE:ID token round-trip
    seen, tok = [], None
    while True:
        cmd = base + ["points", "clif", "--order-by", "confidence",
                      "--desc", "--limit", "5", "--json"]
        if tok:
            cmd += ["--offset", tok]
        assert main(cmd) == 0
        data = _json.loads(capsys.readouterr().out)
        seen += [p["id"] for p in data["points"]]
        tok = data["next_offset"]
        if tok is None:
            break
    assert seen == [3, 7, 11, 2, 6, 10, 1, 5, 9, 0, 4, 8]

    rc = main(base + ["points", "clif", "--order-by", "confidence",
                      "--offset", "banana"])
    assert rc == 1
    assert "VALUE:ID" in capsys.readouterr().err


def test_cli_query(tmp_path, capsys):
    import json as _json
    from reverso_tpu.cli import main

    vecs = random_unit(np.random.default_rng(4), 15, 16)
    payloads = [{"region_id": f"r{i}", "filename": f"f{i}.jpg",
                 "detected_class": "person" if i % 3 == 0 else "car"}
                for i in range(15)]
    root = str(tmp_path / "db")
    with VectorStore.create(root, "cliq", 16) as s:
        s.append(vecs, payloads)
    base = ["--db-root", root, "--model", "test-tiny"]

    # fusion of two branches (one with its own filter, as JSON)
    rc = main(base + ["query", "cliq", "--prefetch", "2",
                      "--prefetch",
                      '{"query": 7, "limit": 6, '
                      '"filter": "detected_class=car"}',
                      "--fusion", "rrf", "--top-k", "4", "--json"])
    out = capsys.readouterr().out
    assert rc == 0
    hits = _json.loads(out)["hits"]
    assert len(hits) == 4 and hits[0]["payload"]["filename"]

    # multi-stage rescore against --target
    rc = main(base + ["query", "cliq", "--prefetch", "2",
                      "--target", "r0", "--top-k", "3", "--json"])
    out = capsys.readouterr().out
    assert rc == 0
    hits = _json.loads(out)["hits"]
    assert len(hits) == 3
    # caller errors are a clean exit code, not a traceback
    rc = main(base + ["query", "cliq", "--prefetch", "2",
                      "--target", "1", "--fusion", "rrf"])
    assert rc == 1
    assert "not both" in capsys.readouterr().err
    rc = main(base + ["query", "cliq"])
    assert rc == 1


def test_cli_payload_mutation(tmp_path, capsys):
    import json as _json
    from reverso_tpu.cli import main

    vecs = random_unit(np.random.default_rng(3), 6, 16)
    payloads = [{"region_id": f"r{i}", "detected_class": "car",
                 "confidence": i / 6} for i in range(6)]
    root = str(tmp_path / "db")
    with VectorStore.create(root, "clip", 16) as s:
        s.append(vecs, payloads)
    base = ["--db-root", root, "--model", "test-tiny"]

    rc = main(base + ["payload", "clip", "set", "--kv", "reviewed=true",
                      "--kv", "note=checked twice",
                      "--filter", "confidence>=0.5"])
    out = capsys.readouterr().out
    assert rc == 0 and "3 points" in out
    rc = main(base + ["get", "clip", "4", "--json"])
    pt = _json.loads(capsys.readouterr().out)["points"][0]
    assert pt["payload"]["reviewed"] is True            # JSON-parsed value
    assert pt["payload"]["note"] == "checked twice"

    rc = main(base + ["payload", "clip", "delete", "--keys", "note",
                      "--points", "4", "r5"])
    assert rc == 0
    capsys.readouterr()
    main(base + ["get", "clip", "4", "5", "3", "--json"])
    pts = _json.loads(capsys.readouterr().out)["points"]
    assert all("note" not in p["payload"] for p in pts[:2])
    assert pts[2]["payload"]["note"] == "checked twice"

    rc = main(base + ["payload", "clip", "clear", "--points", "0"])
    assert rc == 0
    capsys.readouterr()
    main(base + ["get", "clip", "0", "--json"])
    assert _json.loads(capsys.readouterr().out)["points"][0]["payload"] \
        == {}

    rc = main(base + ["payload", "clip", "set", "--points", "0"])
    assert rc == 1 and "--kv" in capsys.readouterr().err
    rc = main(base + ["payload", "clip", "set", "--kv", "nonsense"])
    assert rc == 1 and "KEY=VALUE" in capsys.readouterr().err
    rc = main(base + ["payload", "clip", "delete", "--keys", "x"])
    assert rc == 1                      # nothing selected
    assert "Nothing selected" in capsys.readouterr().err


# ---------------------------------------------------------------------------
# named vector spaces (qdrant named vectors)
# ---------------------------------------------------------------------------

@pytest.fixture()
def named_engine(tmp_path):
    """Engine over a store with a default 64-d image space and a 16-d
    named 'text' space (distinct dims catch space mixups)."""
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso

    model = dataclasses.replace(MODEL_PRESETS["test-tiny"], dtype="float32")
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=model,
        store=dataclasses.replace(cfg.store,
                                  root_dir=str(tmp_path / "db")))
    engine = Reverso(cfg)
    rng = np.random.default_rng(3)
    img = random_unit(rng, 32, 64)
    txt = random_unit(rng, 32, 16)
    payloads = [{"region_id": f"r{i}", "cls": "a" if i % 2 else "b"}
                for i in range(32)]
    with VectorStore.create(str(tmp_path / "db"), "nv", 64,
                            named={"text": 16}) as s:
        s.append({"": img, "text": txt}, payloads)
    engine.load_database("nv")
    return engine, img, txt


def _brute(vecs, q, k, mask=None):
    scores = vecs @ q
    if mask is not None:
        scores = np.where(mask, scores, -np.inf)
    order = np.lexsort((np.arange(len(vecs)), -scores))[:k]
    return [int(i) for i in order if np.isfinite(scores[i])]


def test_named_space_search(named_engine):
    """using= routes every search surface to the right space's index
    (dims differ, so a mixup is a shape error, not a wrong answer)."""
    engine, img, txt = named_engine
    q = txt[5]
    s, i = engine.search_batch(q, k=5, using="text")
    assert [int(x) for x in i[0]] == _brute(txt, q, 5)
    # default space is unaffected
    s0, i0 = engine.search_batch(img[5], k=5)
    assert [int(x) for x in i0[0]] == _brute(img, img[5], 5)
    # filtered named search masks exactly
    mask = np.asarray([p % 2 == 1 for p in range(32)])
    _, i2 = engine.search_batch(q, k=5, using="text",
                                filter={"cls": "a"})
    assert [int(x) for x in i2[0] if x >= 0] == _brute(txt, q, 5, mask)
    # search_similar + batcher coalescing stays per-space
    text, items = engine.search_similar(-1.0, 5, embeddings=q[None],
                                        using="text", use_batcher=True)
    assert [it["id"] for it in items] == _brute(txt, q, 5)
    from reverso_tpu.store import StoreError
    with pytest.raises(StoreError):
        engine.search_batch(q, k=5, using="nope")


def test_named_space_query_hybrid(named_engine):
    """qdrant hybrid search: per-branch using with RRF fusion, and a
    named-space prefetch rescored exactly in the default space."""
    engine, img, txt = named_engine
    hits = engine.query(prefetch=[
        {"query": txt[3].tolist(), "using": "text", "limit": 8},
        {"query": img[3].tolist(), "limit": 8}], fusion="rrf", k=5)
    a = _brute(txt, txt[3], 8)
    b = _brute(img, img[3], 8)
    fused = {}
    for ids in (a, b):
        for r, pid in enumerate(ids):
            fused[pid] = fused.get(pid, 0.0) + 1.0 / (61.0 + r)
    want = [pid for pid, _ in sorted(fused.items(),
                                     key=lambda kv: (-kv[1], kv[0]))[:5]]
    assert [h["id"] for h in hits] == want
    # multi-stage: text-space prefetch, exact rescore in default space
    hits = engine.query(query=img[7].tolist(), prefetch=[
        {"query": txt[7].tolist(), "using": "text", "limit": 6}], k=3)
    cand = sorted(_brute(txt, txt[7], 6))
    scores = img[cand] @ img[7]
    order = np.lexsort((np.asarray(cand), -scores))[:3]
    assert [h["id"] for h in hits] == [int(cand[j]) for j in order]
    # query with using= resolves point ids in that space
    hits = engine.query(query=9, using="text", k=4)
    assert [h["id"] for h in hits] == _brute(txt, txt[9], 4)


def test_named_space_recommend_and_mutation(named_engine, tmp_path):
    engine, img, txt = named_engine
    text, items = engine.recommend([4, 11], max_results=4, using="text")
    q = (txt[4] + txt[11]) / 2.0
    want = [i for i in _brute(txt, q, 6) if i not in (4, 11)][:4]
    assert [it["id"] for it in items] == want
    # per-space vector overwrite through the engine
    newt = random_unit(np.random.default_rng(9), 1, 16)
    msg = engine.update_vectors([2], newt, using="text")
    assert msg.startswith("✅")
    pts = engine.retrieve([2], with_vectors=True, using="text")
    np.testing.assert_allclose(pts[0]["vector"], newt[0], atol=1e-6)
    # default space untouched
    pts0 = engine.retrieve([2], with_vectors=True)
    np.testing.assert_allclose(pts0[0]["vector"], img[2], atol=1e-6)
    # named upsert requires every space
    msg = engine.upsert_points(random_unit(np.random.default_rng(1), 2, 64))
    assert msg.startswith("❌")
    msg = engine.upsert_points(
        {"": random_unit(np.random.default_rng(1), 2, 64),
         "text": random_unit(np.random.default_rng(2), 2, 16)},
        [{"region_id": "n0"}, {"region_id": "n1"}])
    assert "ids 32..33" in msg


# ---------------------------------------------------------------------------
# universal-query operand types (qdrant RecommendQuery / DiscoverQuery /
# ContextQuery / OrderByQuery inside query_points)
# ---------------------------------------------------------------------------

def _hits_arrays(hits, k):
    s = np.full((1, k), -np.inf, np.float32)
    i = np.full((1, k), -1, np.int32)
    s[0, :len(hits)] = [h["score"] for h in hits]
    i[0, :len(hits)] = [h["id"] for h in hits]
    return s, i


def test_query_recommend_operand(engine_store):
    engine, vecs = engine_store
    n = len(vecs)
    # average (default) == composed-query search, examples excluded
    hits = engine.query({"recommend": {"positive": [3, 7]}}, k=5)
    q = average_query(vecs[[3, 7]])
    mask = np.ones(n, bool)
    mask[[3, 7]] = False
    s64 = np.where(mask, vecs.astype(np.float64) @ q.astype(np.float64),
                   -np.inf)
    want = np.lexsort((np.arange(n), -s64))[:5]
    assert [h["id"] for h in hits] == [int(w) for w in want]
    # qdrant's strategy name aliases, vectors mix with ids
    hits2 = engine.query({"recommend": {
        "positive": [3, vecs[7]], "strategy": "average_vector"}}, k=5)
    got2 = [h["id"] for h in hits2]
    assert 3 not in got2 and 7 in got2       # only ID examples exclude
    # best_score combine matches the fp64 truth
    hits = engine.query({"recommend": {"positive": [3], "negative": [5],
                                       "strategy": "best_score"}}, k=5)
    m2 = np.ones(n, bool)
    m2[[3, 5]] = False
    comb = numpy_best_score64(vecs, vecs[[3]], vecs[[5]], mask=m2)
    assert_combined_equiv(comb, *_hits_arrays(hits, 5), 5)
    # filter composes (global filter AND example exclusion)
    hits = engine.query({"recommend": {"positive": [4]}}, k=4,
                        filter={"detected_class": "person"})
    assert all(h["payload"]["detected_class"] == "person" for h in hits)
    assert 4 not in [h["id"] for h in hits]
    # errors are ValueErrors (UI 400s), not crashes
    with pytest.raises(ValueError, match="strategy"):
        engine.query({"recommend": {"positive": [1], "strategy": "nope"}})
    with pytest.raises(ValueError, match="positive"):
        engine.query({"recommend": {"negative": [1]}})


def test_query_discover_context_operands(engine_store):
    engine, vecs = engine_store
    n = len(vecs)
    ex = np.ones(n, bool)
    ex[[2, 0, 5]] = False
    # discover: target + qdrant-shaped pairs
    hits = engine.query({"discover": {
        "target": 2, "context": [{"positive": 0, "negative": 5}]}}, k=5)
    comb = numpy_discover64(vecs, vecs[2], vecs[[0]], vecs[[5]], mask=ex)
    assert_combined_equiv(comb, *_hits_arrays(hits, 5), 5)
    # pure context, tuple pairs
    hits = engine.query({"context": [(0, 5)]}, k=5)
    ex2 = np.ones(n, bool)
    ex2[[0, 5]] = False
    comb = numpy_context64(vecs, vecs[[0]], vecs[[5]], mask=ex2)
    assert_combined_equiv(comb, *_hits_arrays(hits, 5), 5)
    with pytest.raises(ValueError, match="context"):
        engine.query({"context": []})
    with pytest.raises(ValueError, match="pairs"):
        engine.query({"context": [{"positive": 1}]})
    with pytest.raises(ValueError, match="discover"):
        engine.query({"discover": {}})


def test_query_order_by_operand(engine_store):
    engine, vecs = engine_store
    # payloads carry confidence = i / 40: descending = reversed ids
    hits = engine.query({"order_by": {"key": "confidence",
                                      "direction": "desc"}}, k=4)
    assert [h["id"] for h in hits] == [39, 38, 37, 36]
    assert hits[0]["score"] == pytest.approx(39 / 40)
    # string shorthand = ascending; start_from is inclusive
    hits = engine.query({"order_by": "confidence"}, k=3)
    assert [h["id"] for h in hits] == [0, 1, 2]
    hits = engine.query({"order_by": {"key": "confidence",
                                      "start_from": 5 / 40}}, k=3)
    assert [h["id"] for h in hits] == [5, 6, 7]
    # composes with the global filter
    hits = engine.query({"order_by": "confidence"}, k=3,
                        filter={"detected_class": "person"})
    assert [h["id"] for h in hits] == [0, 4, 8]
    with pytest.raises(ValueError, match="direction"):
        engine.query({"order_by": {"key": "confidence",
                                   "direction": "up"}})
    with pytest.raises(ValueError, match="order_by"):
        engine.query({"order_by": {}})


def test_query_operands_in_prefetch_and_rescore(engine_store):
    engine, vecs = engine_store
    n = len(vecs)
    # combine operand as a prefetch branch feeding an exact rescore
    hits = engine.query(vecs[9], k=3, prefetch=[
        {"query": {"recommend": {"positive": [3, 7]}}, "limit": n}])
    pool = engine.query({"recommend": {"positive": [3, 7]}}, k=n)
    pool_ids = {h["id"] for h in pool}
    s64 = vecs.astype(np.float64) @ vecs[9].astype(np.float64)
    want = [i for i in np.lexsort((np.arange(n), -s64))
            if int(i) in pool_ids][:3]
    assert [h["id"] for h in hits] == [int(w) for w in want]
    # combine operand as the RESCORING query over a prefetch union
    hits = engine.query({"recommend": {"positive": [3],
                                       "strategy": "best_score"}},
                        k=3, prefetch=[{"query": vecs[9], "limit": n}])
    m = np.ones(n, bool)
    m[3] = False
    comb = numpy_best_score64(vecs, vecs[[3]], None, mask=m)
    assert_combined_equiv(comb, *_hits_arrays(hits, 3), 3)
    # order_by branch (newest-first pool) + order_by rescore
    hits = engine.query({"order_by": {"key": "confidence",
                                      "direction": "desc"}}, k=3,
                        prefetch=[{"query": vecs[9], "limit": 5}])
    pool = engine.query(vecs[9], k=5)
    want = sorted((h["id"] for h in pool), reverse=True)[:3]
    assert [h["id"] for h in hits] == want
    # query_batch falls back per request and matches query()
    [res] = engine.query_batch([{  # noqa: F841
        "query": {"recommend": {"positive": [3, 7]}}, "k": 5}])
    direct = engine.query({"recommend": {"positive": [3, 7]}}, k=5)
    assert [h["id"] for h in res] == [h["id"] for h in direct]
    # recommend_groups / discover_groups for free via query_groups
    groups = engine.query_groups({"recommend": {"positive": [3, 7]}},
                                 group_by="detected_class",
                                 group_size=2, limit=2)
    assert {g["key"] for g in groups} <= {"person", "car"}
    for g in groups:
        assert all(h["payload"]["detected_class"] == g["key"]
                   for h in g["hits"])
        assert not {3, 7} & {h["id"] for h in g["hits"]}
