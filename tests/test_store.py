"""Persistence + device-index tests (SURVEY.md §4 items 1, 4, 5)."""
import os

import numpy as np
import pytest
import jax

from reverso_tpu.store import (
    VectorStore, StoreError, StoreLockedError, DeviceIndex,
    list_databases, delete_database, unlock_database, collection_name,
)
from reverso_tpu.parallel import make_mesh

from test_topk import assert_topk_equiv, random_unit


def make_payloads(n, start=0):
    return [{"region_id": f"r{i}", "detected_class": "object",
             "bbox": [0, 0, 10, 10], "detection_index": i}
            for i in range(start, start + n)]


def test_create_append_reopen(tmp_path, rng):
    root = str(tmp_path)
    vecs = random_unit(rng, 37, 16)
    with VectorStore.create(root, "db1", 16) as s:
        s.append(vecs[:20], make_payloads(20))
        s.append(vecs[20:], make_payloads(17, 20))
        assert s.count == 37
    s2 = VectorStore.open(root, "db1")
    assert s2.count == 37
    assert s2.collection == collection_name("db1")
    np.testing.assert_allclose(np.asarray(s2.vectors()), vecs, atol=1e-7)
    pays = s2.payloads([0, 36, 40, -1])
    assert pays[0]["region_id"] == "r0"
    assert pays[1]["region_id"] == "r36"
    assert pays[2] is None and pays[3] is None


def test_lock_semantics(tmp_path, rng):
    root = str(tmp_path)
    with VectorStore.create(root, "db", 8) as s:
        s.append(random_unit(rng, 4, 8), make_payloads(4))
        # second writer must fail while locked
        with pytest.raises(StoreLockedError):
            VectorStore.open(root, "db", writable=True)
    # closed -> lock released
    s2 = VectorStore.open(root, "db", writable=True)
    s2.close()
    # stale lock (crash simulation) -> unlock_database clears it
    open(os.path.join(root, "db", ".lock"), "w").close()
    with pytest.raises(StoreLockedError):
        VectorStore.open(root, "db", writable=True)
    assert unlock_database(root, "db") is True
    assert unlock_database(root, "db") is False
    VectorStore.open(root, "db", writable=True).close()


def test_list_delete(tmp_path, rng):
    root = str(tmp_path)
    VectorStore.create(root, "a", 8).close()
    VectorStore.create(root, "b", 8).close()
    assert list_databases(root) == ["a", "b"]
    delete_database(root, "a")
    assert list_databases(root) == ["b"]
    with pytest.raises(StoreError):
        delete_database(root, "missing")


def test_truncate_resume(tmp_path, rng):
    root = str(tmp_path)
    vecs = random_unit(rng, 30, 8)
    s = VectorStore.create(root, "db", 8)
    s.append(vecs, make_payloads(30))
    s.truncate(12)
    assert s.count == 12
    np.testing.assert_allclose(np.asarray(s.vectors()), vecs[:12], atol=1e-7)
    assert len(s.payloads()) == 12
    s.close()


def test_device_index_single(rng):
    db = random_unit(rng, 333, 64)          # deliberately unaligned row count
    qs = random_unit(rng, 5, 64)
    idx = DeviceIndex(db, dtype="float32", db_tile=128)
    s, i = jax.device_get(idx.search(qs, 10))
    assert_topk_equiv(db, qs, s, i, 10)


def test_device_index_sharded(rng):
    mesh = make_mesh()
    db = random_unit(rng, 1234, 64)         # unaligned vs 8 shards * tile
    qs = random_unit(rng, 7, 64)
    idx = DeviceIndex(db, mesh=mesh, dtype="float32", db_tile=128)
    s, i = jax.device_get(idx.search(qs, 10))
    assert_topk_equiv(db, qs, s, i, 10)
    # padding must never surface
    assert (np.asarray(i) < 1234).all()


def test_device_index_empty():
    idx = DeviceIndex(np.zeros((0, 16), np.float32))
    s, i = jax.device_get(idx.search(np.zeros((2, 16), np.float32), 3))
    assert (i == -1).all()


def test_payload_random_access_after_growth_and_truncate(tmp_path, rng):
    root = str(tmp_path)
    with VectorStore.create(root, "pidx", 8) as s:
        s.append(random_unit(rng, 10, 8), make_payloads(10))
        assert s.payloads([3])[0]["region_id"] == "r3"     # builds offsets
        s.append(random_unit(rng, 5, 8), make_payloads(5, 10))
        # cache must refresh to cover the new rows
        assert s.payloads([12])[0]["region_id"] == "r12"
        s.truncate(7)
        got = s.payloads([6, 7])
        assert got[0]["region_id"] == "r6" and got[1] is None
