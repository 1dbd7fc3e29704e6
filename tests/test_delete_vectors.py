"""qdrant delete_vectors: remove specific vectors from points WITHOUT
deleting the points (payloads and other spaces stay). The reference
app's single-vector qdrant collection had no analog
(reference core_system.py:600-622); this pins the TPU build's
equivalent: dense deletions via the store's atomic mask file
(searches exclude the rows exactly through _PresenceMaskedIndex,
has_vector flips, update_vectors resurrects, compact/truncate/snapshot
carry the mask), and sparse/multivector deletions via empty ragged
rewrites.
"""
import dataclasses
import os

import numpy as np
import pytest

from reverso_tpu.store import StoreError, VectorStore


def unit(rng, m, d):
    v = rng.normal(size=(m, d)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# store layer
# ---------------------------------------------------------------------------

def test_store_delete_vector_rows(tmp_path):
    rng = np.random.default_rng(0)
    v = unit(rng, 10, 4)
    with VectorStore.create(str(tmp_path), "db", 4, named={"t": 4}) as s:
        s.append({"": v, "t": v}, [{"region_id": f"r{i}"}
                                   for i in range(10)])
    w = VectorStore.open(str(tmp_path), "db", writable=True)
    dv0, vv0 = w.data_version, w.vector_version
    assert w.delete_vector_rows([3, 5], "") == 2
    assert w.delete_vector_rows([3], "") == 0          # idempotent
    assert w.delete_vector_rows([7], "t") == 1
    assert w.deleted_rows("").tolist() == [3, 5]
    assert w.deleted_rows("t").tolist() == [7]
    # both versions bump: has_vector answers AND the device index change
    assert w.data_version > dv0 and w.vector_version > vv0
    with pytest.raises(StoreError):
        w.delete_vector_rows([0], "nope")
    with pytest.raises(StoreError):
        w.delete_vector_rows([10], "")
    w.close()
    # persists across reopen; read-only handles see it but can't mutate
    s = VectorStore.open(str(tmp_path), "db")
    assert s.deleted_rows("").tolist() == [3, 5]
    with pytest.raises(StoreError):
        s.delete_vector_rows([1], "")


def test_store_resurrect_compact_truncate_snapshot(tmp_path):
    rng = np.random.default_rng(1)
    v = unit(rng, 10, 4)
    with VectorStore.create(str(tmp_path), "db", 4, named={"t": 4}) as s:
        s.append({"": v, "t": v}, [{"region_id": f"r{i}"}
                                   for i in range(10)])
    w = VectorStore.open(str(tmp_path), "db", writable=True)
    w.delete_vector_rows([3, 5], "")
    w.delete_vector_rows([7], "t")
    # update_vectors resurrects exactly the overwritten rows
    w.update_vectors([3], v[:1], space="")
    assert w.deleted_rows("").tolist() == [5]
    # compact: dropping row 0 renumbers the surviving mask bits
    keep = np.ones(10, bool)
    keep[0] = False
    w.compact(keep)
    assert w.deleted_rows("").tolist() == [4]
    assert w.deleted_rows("t").tolist() == [6]
    # snapshot carries the mask
    snap = str(tmp_path / "snap.tar")
    w.export_snapshot(snap)
    s2 = VectorStore.import_snapshot(str(tmp_path), "db2", snap)
    assert s2.deleted_rows("").tolist() == [4]
    assert s2.deleted_rows("t").tolist() == [6]
    # truncate below a deleted id drops it (clip-on-read + tidy rewrite)
    w.truncate(4)
    assert w.deleted_rows("").tolist() == []
    assert w.deleted_rows("t").tolist() == []
    assert not os.path.exists(os.path.join(w.path,
                                           "deleted_vectors.json"))
    w.close()


# ---------------------------------------------------------------------------
# engine layer
# ---------------------------------------------------------------------------

def build(tmp_path, d=8, n=24, seed=0):
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso

    rng = np.random.default_rng(seed)
    root = str(tmp_path / "db")
    v = unit(rng, n, d)
    v2 = unit(rng, n, d)
    sp_rows = [{"indices": [i % 5], "values": [1.0]} for i in range(n)]
    mv_rows = [v[i:i + 1] for i in range(n)]
    with VectorStore.create(root, "main", d, named={"txt": d},
                            sparse={"sp": {}}, multi={"mv": d}) as s:
        s.append({"": v, "txt": v2},
                 [{"region_id": f"r{i}",
                   "cls": "person" if i % 2 == 0 else "car"}
                  for i in range(n)],
                 sparse_vectors={"sp": sp_rows},
                 multi_vectors={"mv": mv_rows})
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(MODEL_PRESETS["test-tiny"],
                                       dtype="float32"),
        store=dataclasses.replace(cfg.store, root_dir=root,
                                  dtype="float32"))
    engine = Reverso(cfg)
    engine.load_database("main")
    return engine, v, v2


def _ids(hits):
    return [h["id"] for h in hits]


def test_search_excludes_deleted_exactly(tmp_path):
    engine, v, v2 = build(tmp_path)
    n = len(v)
    q = v[0]
    before = _ids(engine.query(q.tolist(), k=n))
    msg = engine.delete_vectors([0, "r5"], "")
    assert msg.startswith("✅"), msg
    after = engine.query(q.tolist(), k=n)
    # the deleted rows vanish; the rest keep brute-force fp64 order
    scores = v.astype(np.float64) @ q.astype(np.float64)
    order = np.lexsort((np.arange(n), -scores))
    want = [int(r) for r in order if r not in (0, 5)]
    assert _ids(after) == want
    assert set(before) - set(_ids(after)) == {0, 5}
    # the named space is untouched
    got_txt = _ids(engine.query(v2[0].tolist(), k=3, using="txt"))
    s2 = v2.astype(np.float64) @ v2[0].astype(np.float64)
    assert got_txt == np.lexsort((np.arange(n), -s2))[:3].tolist()
    # recommend (best_score rides the same wrapper) also excludes
    _, items = engine.recommend(positive=[v[0].tolist()],
                                strategy="best_score", max_results=n)
    assert 0 not in _ids(items) and 5 not in _ids(items)


def test_has_vector_retrieve_and_operands(tmp_path):
    engine, v, v2 = build(tmp_path)
    n = len(v)
    engine.delete_vectors([2], "")
    assert engine.count({"has_vector": ""}) == n - 1
    assert engine.count({"has_vector": "txt"}) == n
    # retrieve: the deleted space's vector is absent, others present
    pt = engine.retrieve([2], with_vectors=True)[0]
    assert "vector" not in pt and pt["payload"]["region_id"] == "r2"
    pt_txt = engine.retrieve([2], with_vectors=True, using="txt")[0]
    assert "vector" in pt_txt
    # a deleted stored-point operand is a clean error, not a stale hit
    with pytest.raises(Exception, match="delete_vectors"):
        engine.query(2, k=3)
    with pytest.raises(Exception, match="delete_vectors"):
        engine.query("r2", k=3)
    # random sampling never draws the deleted row
    for seed in range(5):
        got = _ids(engine.query({"sample": "random"}, k=n, seed=seed))
        assert 2 not in got and len(got) == n - 1


def test_resurrect_and_batch(tmp_path):
    engine, v, v2 = build(tmp_path)
    n = len(v)
    engine.delete_vectors(points=None, spaces="",
                          filter={"cls": "person"})
    assert engine.count({"has_vector": ""}) == n // 2
    # update_vectors resurrects
    msg = engine.update_vectors([0], v[:1])
    assert msg.startswith("✅"), msg
    assert engine.count({"has_vector": ""}) == n // 2 + 1
    assert 0 in _ids(engine.query(v[0].tolist(), k=n))
    # batch op form (points selector, named space)
    msg = engine.update_batch([
        {"delete_vectors": {"points": [1, 3], "spaces": ["txt"]}}])
    assert msg.startswith("✅"), msg
    assert engine.count({"has_vector": "txt"}) == n - 2
    got = _ids(engine.query(v2[1].tolist(), k=n, using="txt"))
    assert 1 not in got and 3 not in got
    # malformed: unknown space rejects the whole batch up front
    msg = engine.update_batch([
        {"delete_vectors": {"points": [1], "spaces": ["nope"]}}])
    assert msg.startswith("❌"), msg


def test_sparse_and_multi_delete(tmp_path):
    engine, v, v2 = build(tmp_path)
    n = len(v)
    # row 0's sparse term is index 0: it matches this query before
    q = {"indices": [0], "values": [1.0]}
    assert 0 in _ids(engine.query(q, k=n, using="sp"))
    engine.delete_vectors([0], ["sp", "mv"])
    assert 0 not in _ids(engine.query(q, k=n, using="sp"))
    assert engine.count({"has_vector": "sp"}) == n - 1
    assert engine.count({"has_vector": "mv"}) == n - 1
    # an emptied multivector row never matches MaxSim
    got = _ids(engine.query(v[0].tolist(), k=n, using="mv"))
    assert 0 not in got and len(got) == n - 1
    # the dense spaces are untouched
    assert 0 in _ids(engine.query(v[0].tolist(), k=3))


def test_cross_space_rescore_excludes_deleted(tmp_path):
    """A prefetch branch in one space can surface a candidate whose
    vector is deleted in the RESCORING space; the exact rescore, the
    MMR union, and the combine rescore must all skip it instead of
    scoring the stale on-disk bytes (advisor r03 findings 1-2)."""
    engine, v, v2 = build(tmp_path)
    n = len(v)
    engine.delete_vectors([1, 4], "")          # default space only
    pre = [{"query": v2[1].tolist(), "using": "txt", "limit": n}]
    # exact dense rescore of the union in the default space
    got = _ids(engine.query(v[1].tolist(), prefetch=pre, k=n))
    assert 1 not in got and 4 not in got and len(got) == n - 2
    # MMR rerank of the union
    got = _ids(engine.query(
        {"nearest": v[1].tolist(), "mmr": {"diversity": 0.3}},
        prefetch=pre, k=n))
    assert 1 not in got and 4 not in got
    # the txt space is untouched: rescoring THERE keeps every row
    got = _ids(engine.query(v2[1].tolist(), prefetch=[
        {"query": v[0].tolist(), "using": "txt", "limit": n}],
        k=n, using="txt"))
    assert 1 in got and 4 in got


def test_lookup_from_deleted_operand_raises(tmp_path):
    """lookup_from point-id operands must hit the same clean
    delete_vectors StoreError as local operands, not silently read
    the deleted row's stale bytes (advisor r03 finding 3)."""
    engine, v, v2 = build(tmp_path)
    root = os.path.dirname(engine._store.path)
    rng = np.random.default_rng(7)
    lv = unit(rng, 6, v.shape[1])
    with VectorStore.create(root, "lk", v.shape[1]) as s:
        s.append(lv, [{"region_id": f"L{i}"} for i in range(6)])
    w = VectorStore.open(root, "lk", writable=True)
    w.delete_vector_rows([2], "")
    w.close()
    lf = {"collection": "lk"}
    with pytest.raises(Exception, match="delete_vectors"):
        engine.query(2, k=3, lookup_from=lf)
    with pytest.raises(Exception, match="delete_vectors"):
        engine.query("L2", k=3, lookup_from=lf)
    # a live lookup row still resolves
    assert engine.query(0, k=3, lookup_from=lf)


def test_batch_empty_spaces_rejected(tmp_path):
    """update_batch delete_vectors with an explicitly empty spaces
    list must reject (like the public API), not silently delete the
    default space (advisor r03 finding 4)."""
    engine, v, v2 = build(tmp_path)
    msg = engine.update_batch([
        {"delete_vectors": {"points": [1], "spaces": []}}])
    assert msg.startswith("❌") and "at least one" in msg
    assert engine.count({"has_vector": ""}) == len(v)  # nothing deleted
    # absent key still means the default space
    msg = engine.update_batch([
        {"delete_vectors": {"points": [1]}}])
    assert msg.startswith("✅"), msg
    assert engine.count({"has_vector": ""}) == len(v) - 1
