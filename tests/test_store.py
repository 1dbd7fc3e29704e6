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


def test_named_vector_spaces(tmp_path, rng):
    """qdrant named vectors: extra per-space files, same row count,
    own dims; append requires every space; every mutation stays
    aligned across spaces; snapshots round-trip all of them."""
    root = str(tmp_path)
    n, d, dt = 24, 16, 8
    img = random_unit(rng, n, d)
    txt = random_unit(rng, n, dt)
    with VectorStore.create(root, "nv", d, named={"text": dt}) as s:
        assert s.spaces() == {"": d, "text": dt}
        with pytest.raises(StoreError):
            s.append(img, make_payloads(n))          # missing a space
        with pytest.raises(StoreError):
            s.append({"": img, "text": img}, make_payloads(n))  # bad dim
        s.append({"": img, "text": txt}, make_payloads(n))
    s2 = VectorStore.open(root, "nv")
    assert s2.named == {"text": dt}
    np.testing.assert_allclose(np.asarray(s2.vectors()), img, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s2.vectors("text")), txt,
                               atol=1e-7)
    with pytest.raises(StoreError):
        s2.vectors("nope")
    s2.close()

    # truncate + compact keep every space row-aligned
    w = VectorStore.open(root, "nv", writable=True)
    w.truncate(20)
    keep = np.ones(20, bool)
    keep[[1, 5]] = False
    w.compact(keep)
    np.testing.assert_allclose(np.asarray(w.vectors())[0], img[0])
    np.testing.assert_allclose(np.asarray(w.vectors("text"))[1], txt[2])
    # per-space vector overwrite
    nt = random_unit(rng, 1, dt)
    w.update_vectors([3], nt, space="text")
    np.testing.assert_allclose(np.asarray(w.vectors("text"))[3], nt[0])
    np.testing.assert_allclose(np.asarray(w.vectors())[3], img[4])
    with pytest.raises(StoreError):
        w.update_vectors([0], nt, space="nope")
    w.close()

    # snapshot round-trip carries all spaces
    s3 = VectorStore.open(root, "nv")
    tar = s3.export_snapshot(os.path.join(root, "nv.snapshot"))
    s3.close()
    imp = VectorStore.import_snapshot(root, "nv2", tar)
    assert imp.named == {"text": dt}
    np.testing.assert_allclose(np.asarray(imp.vectors("text")),
                               np.asarray(VectorStore.open(root, "nv")
                                          .vectors("text")))
    imp.close()
    with pytest.raises(StoreError):
        VectorStore.create(root, "bad", d, named={"no/slash": 4})


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


# -- payload-offset sidecar (payloads.idx) ------------------------------

def _idx_rows(root, name):
    p = os.path.join(root, name, "payloads.idx")
    return os.path.getsize(p) // 8 if os.path.exists(p) else None


def test_payload_sidecar_written_in_lockstep(tmp_path, rng):
    root = str(tmp_path)
    with VectorStore.create(root, "sc", 8) as s:
        s.append(random_unit(rng, 6, 8), make_payloads(6))
        s.append(random_unit(rng, 3, 8), make_payloads(3, 6))
    assert _idx_rows(root, "sc") == 9
    s2 = VectorStore.open(root, "sc")
    offs = s2._payload_offsets()
    # offsets must be exactly the JSONL line starts
    with open(os.path.join(root, "sc", "payloads.jsonl"), "rb") as f:
        expect, pos = [], 0
        for line in f:
            expect.append(pos)
            pos += len(line)
    np.testing.assert_array_equal(np.asarray(offs), expect)
    assert s2.payloads([8])[0]["region_id"] == "r8"


def test_legacy_store_scan_fallback_and_upgrade(tmp_path, rng):
    """A store with no sidecar (legacy layout) still answers O(k) reads
    via the one-time scan, and writes the sidecar back for next time."""
    root = str(tmp_path)
    with VectorStore.create(root, "lg", 8) as s:
        s.append(random_unit(rng, 12, 8), make_payloads(12))
    os.remove(os.path.join(root, "lg", "payloads.idx"))
    s2 = VectorStore.open(root, "lg")
    assert s2.payloads([7])[0]["region_id"] == "r7"
    assert _idx_rows(root, "lg") == 12       # upgraded in place
    s3 = VectorStore.open(root, "lg")        # fresh process: memmap path
    assert isinstance(s3._payload_offsets(), np.memmap)
    assert s3.payloads([11])[0]["region_id"] == "r11"


def test_torn_sidecar_short_repaired_on_append(tmp_path, rng):
    """Crash between the JSONL write and the sidecar write leaves the
    sidecar short; the next writer repairs the tail before appending."""
    root = str(tmp_path)
    with VectorStore.create(root, "tr", 8) as s:
        s.append(random_unit(rng, 10, 8), make_payloads(10))
    idx = os.path.join(root, "tr", "payloads.idx")
    with open(idx, "r+b") as f:
        f.truncate(4 * 8)                    # lose the last 6 entries
    with VectorStore.open(root, "tr", writable=True) as s2:
        s2.append(random_unit(rng, 2, 8), make_payloads(2, 10))
    assert _idx_rows(root, "tr") == 12
    s3 = VectorStore.open(root, "tr")
    got = s3.payloads([3, 9, 11])
    assert [p["region_id"] for p in got] == ["r3", "r9", "r11"]


def test_corrupt_sidecar_past_eof_rebuilt(tmp_path, rng):
    """A sidecar entry pointing past the JSONL's EOF (torn truncate)
    must not be trusted: readers rebuild, writers rebuild-then-append."""
    root = str(tmp_path)
    with VectorStore.create(root, "cx", 8) as s:
        s.append(random_unit(rng, 5, 8), make_payloads(5))
    idx = os.path.join(root, "cx", "payloads.idx")
    with open(idx, "r+b") as f:
        f.seek(4 * 8)
        f.write(np.asarray([2 ** 40], "<i8").tobytes())
    s2 = VectorStore.open(root, "cx")
    assert s2.payloads([4])[0]["region_id"] == "r4"   # rebuilt, not trusted
    with VectorStore.open(root, "cx", writable=True) as s3:
        s3.append(random_unit(rng, 1, 8), make_payloads(1, 5))
    s4 = VectorStore.open(root, "cx")
    assert [p["region_id"] for p in s4.payloads([4, 5])] == ["r4", "r5"]


def test_truncate_keeps_sidecar_in_lockstep(tmp_path, rng):
    root = str(tmp_path)
    with VectorStore.create(root, "tc", 8) as s:
        s.append(random_unit(rng, 9, 8), make_payloads(9))
        s.truncate(4)
        s.append(random_unit(rng, 2, 8), make_payloads(2, 4))
    assert _idx_rows(root, "tc") == 6
    s2 = VectorStore.open(root, "tc")
    got = s2.payloads([0, 3, 4, 5])
    assert [p["region_id"] for p in got] == ["r0", "r3", "r4", "r5"]


# -- review-fix regressions (truncate crash-safety, lock atomicity,
#    torn-tail trim, -1 contract, int8 wide-dim dispatch) ---------------

def test_truncate_noop_keeps_epoch(tmp_path, rng):
    """Resume truncates unconditionally; a no-op truncate (count
    unchanged) must not bump mutation_epoch — that key invalidates the
    IVF k-means cache and forces a full retrain for nothing."""
    root = str(tmp_path)
    with VectorStore.create(root, "db", 8) as s:
        s.append(random_unit(rng, 10, 8), make_payloads(10))
        epoch = s.mutation_epoch
        version = s.data_version
        s.truncate(10)
        assert s.mutation_epoch == epoch
        assert s.data_version == version
        s.truncate(6)                      # real truncation still bumps
        assert s.mutation_epoch == epoch + 1
        assert s.count == 6


def test_truncate_is_inplace_shrink_not_rewrite(tmp_path, rng):
    """truncate must shrink payloads.jsonl at its byte offset (O(1) via
    the sidecar), never zero-and-rewrite it: the payload bytes of kept
    rows are byte-identical before and after."""
    root = str(tmp_path)
    with VectorStore.create(root, "db", 8) as s:
        s.append(random_unit(rng, 20, 8), make_payloads(20))
        s.flush()
        pay = os.path.join(root, "db", "payloads.jsonl")
        with open(pay, "rb") as f:
            before = f.read()
        s.truncate(7)
        with open(pay, "rb") as f:
            after = f.read()
        cut = len(b"".join(before.splitlines(keepends=True)[:7]))
        assert after == before[:cut]
        assert s.payloads([6])[0]["region_id"] == "r6"
        assert s.payloads([7])[0] is None


def test_interrupted_truncate_recovers_on_reopen(tmp_path, rng):
    """Crash window: meta committed with the reduced count but the data
    files never shrank. A writable reopen must trim the tails so later
    appends stay aligned."""
    import json as _json
    root = str(tmp_path)
    vecs = random_unit(rng, 12, 8)
    with VectorStore.create(root, "db", 8) as s:
        s.append(vecs, make_payloads(12))
    meta_path = os.path.join(root, "db", "meta.json")
    with open(meta_path) as f:
        meta = _json.load(f)
    meta["count"] = 5                       # simulated torn truncate
    meta["mutation_epoch"] += 1
    with open(meta_path, "w") as f:
        _json.dump(meta, f)
    s2 = VectorStore.open(root, "db", writable=True)
    assert s2.count == 5
    assert os.path.getsize(os.path.join(root, "db", "vectors.bin")) \
        == 5 * 4 * 8
    new = random_unit(rng, 3, 8)
    s2.append(new, make_payloads(3, 5))
    got = np.asarray(s2.vectors())
    np.testing.assert_allclose(got[:5], vecs[:5], atol=1e-7)
    np.testing.assert_allclose(got[5:], new, atol=1e-7)
    assert s2.payloads([5])[0]["region_id"] == "r5"
    s2.close()


def test_writable_open_trims_torn_append(tmp_path, rng):
    """A crash mid-append leaves partial trailing bytes; appending after
    them would misalign every later row. Writable open drops them."""
    root = str(tmp_path)
    vecs = random_unit(rng, 6, 8)
    with VectorStore.create(root, "db", 8) as s:
        s.append(vecs, make_payloads(6))
    with open(os.path.join(root, "db", "vectors.bin"), "ab") as f:
        f.write(b"\x00" * 13)               # torn partial row
    with open(os.path.join(root, "db", "payloads.jsonl"), "ab") as f:
        f.write(b'{"region_id": "torn"')    # torn partial line
    # read-only open tolerates the tail
    assert VectorStore.open(root, "db").count == 6
    s2 = VectorStore.open(root, "db", writable=True)
    new = random_unit(rng, 2, 8)
    s2.append(new, make_payloads(2, 6))
    got = np.asarray(s2.vectors())
    assert got.shape == (8, 8)
    np.testing.assert_allclose(got[6:], new, atol=1e-7)
    assert s2.payloads([6])[0]["region_id"] == "r6"
    assert s2.payloads([7])[0]["region_id"] == "r7"
    s2.close()


def test_delete_locked_store_refused(tmp_path, rng):
    root = str(tmp_path)
    s = VectorStore.create(root, "db", 8)
    s.append(random_unit(rng, 3, 8), make_payloads(3))
    with pytest.raises(StoreLockedError):
        delete_database(root, "db")
    s.close()
    delete_database(root, "db")             # unlocked: fine
    assert list_databases(root) == []


def test_corrupt_meta_raises_store_error(tmp_path, rng):
    root = str(tmp_path)
    with VectorStore.create(root, "db", 8) as s:
        s.append(random_unit(rng, 3, 8), make_payloads(3))
    with open(os.path.join(root, "db", "meta.json"), "w") as f:
        f.write('{"name": "db", "cou')       # power-loss partial write
    with pytest.raises(StoreError):
        VectorStore.open(root, "db")


def test_xla_topk_absent_slots_are_minus_one(rng):
    """cosine_topk_xla must emit -1 for -inf slots (n_valid < k) like
    the Pallas and int8-XLA paths — the repo-wide contract."""
    from reverso_tpu.ops.topk import cosine_topk_xla
    db = random_unit(rng, 64, 16)            # 64 rows, only 3 valid
    s, i = jax.device_get(cosine_topk_xla(db, db[:2], 10, n_valid=3))
    assert (i[:, 3:] == -1).all(), i
    assert np.isneginf(s[:, 3:]).all()
    assert (i[:, :3] >= 0).all()


def test_device_index_int8_wide_dim_auto_falls_back(rng):
    """int8 storage with d > 1040 (e.g. a 1152-dim encoder): auto must
    route to the chunked int8 XLA scan instead of crashing on the
    int8-exact kernel's exactness bound."""
    d = 1152
    db = random_unit(rng, 96, d)
    q = db[:4]
    idx = DeviceIndex(db, dtype="int8", db_tile=64)
    s, i = jax.device_get(idx.search(q, 5))
    assert i[0, 0] == 0 and i[3, 0] == 3
    # scores are cosines against the dequantized int8 rows
    deq = np.asarray(idx.matrix[:96], np.float32) * idx.scale
    want = np.take_along_axis(q.astype(np.float64) @ deq.astype(np.float64).T,
                              i, axis=1)
    np.testing.assert_allclose(s, want, rtol=1e-5, atol=1e-6)


def test_device_index_prepad_covers_all_ring_depths(rng):
    """Row pre-padding must be a multiple of lcm(4,3,2)*db_tile so the
    kernel's in-jit pad is a no-op for EVERY VMEM-adaptive ring depth
    (a 3-buffer launch against a 4-aligned matrix copied the whole
    database inside jit)."""
    idx = DeviceIndex(random_unit(rng, 100, 16), db_tile=64)
    assert idx.matrix.shape[0] % (12 * 64) == 0


# ---------------------------------------------------------------------------
# snapshots (export / import)
# ---------------------------------------------------------------------------

def test_snapshot_round_trip(tmp_path, rng):
    root = str(tmp_path / "dbs")
    vecs = random_unit(rng, 25, 16)
    with VectorStore.create(root, "src", 16) as s:
        s.append(vecs, make_payloads(25))
    src = VectorStore.open(root, "src")
    snap = str(tmp_path / "src.snapshot")
    assert src.export_snapshot(snap) == snap

    dst = VectorStore.import_snapshot(root, "copy", snap)
    assert dst.count == 25 and dst.dim == 16
    assert dst.collection == collection_name("copy")
    np.testing.assert_array_equal(np.asarray(dst.vectors()),
                                  np.asarray(src.vectors()))
    assert dst.payloads([0, 24]) == src.payloads([0, 24])
    # fresh identity: derived caches from any prior incarnation of
    # "copy" must never alias the import
    assert dst.data_version != src.data_version
    # the imported store is fully functional (search + append)
    idx = DeviceIndex(np.asarray(dst.vectors()), dtype="float32")
    s_, i_ = jax.device_get(idx.search(vecs[7], 3))
    assert i_[0, 0] == 7
    with VectorStore.open(root, "copy", writable=True) as w:
        w.append(random_unit(rng, 2, 16), make_payloads(2, 25))
    assert VectorStore.open(root, "copy").count == 27


def test_snapshot_excludes_uncommitted_tail(tmp_path, rng):
    """A torn append (bytes past the committed count) must not leak
    into the archive: the snapshot cut is the committed row count."""
    root = str(tmp_path / "dbs")
    with VectorStore.create(root, "torn", 8) as s:
        s.append(random_unit(rng, 10, 8), make_payloads(10))
    with open(os.path.join(root, "torn", "vectors.bin"), "ab") as f:
        f.write(b"\0" * 13)          # torn partial row
    store = VectorStore.open(root, "torn")
    snap = str(tmp_path / "torn.snapshot")
    store.export_snapshot(snap)
    dst = VectorStore.import_snapshot(root, "torn2", snap)
    assert dst.count == 10
    assert os.path.getsize(os.path.join(root, "torn2", "vectors.bin")) \
        == 10 * 4 * 8


def test_snapshot_import_guards(tmp_path, rng):
    root = str(tmp_path / "dbs")
    with VectorStore.create(root, "a", 8) as s:
        s.append(random_unit(rng, 4, 8), make_payloads(4))
    snap = str(tmp_path / "a.snapshot")
    VectorStore.open(root, "a").export_snapshot(snap)

    # refuse to clobber an existing database without overwrite
    with pytest.raises(StoreError):
        VectorStore.import_snapshot(root, "a", snap)
    # refuse to overwrite a locked (live) database
    live = VectorStore.open(root, "a", writable=True)
    with pytest.raises(StoreLockedError):
        VectorStore.import_snapshot(root, "a", snap, overwrite=True)
    live.close()
    dst = VectorStore.import_snapshot(root, "a", snap, overwrite=True)
    assert dst.count == 4

    # reject arbitrary tars (member names validated before extraction)
    import tarfile, io
    evil = str(tmp_path / "evil.tar")
    with tarfile.open(evil, "w") as tar:
        data = b"x"
        info = tarfile.TarInfo("../../escape.txt")
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))
    with pytest.raises(StoreError):
        VectorStore.import_snapshot(root, "evil", snap_path := evil)

    # corrupt size mismatch
    bad = str(tmp_path / "bad.tar")
    with tarfile.open(snap, "r") as src_tar, tarfile.open(bad, "w") as out:
        for m in src_tar.getmembers():
            data = src_tar.extractfile(m).read()
            if m.name == "vectors.bin":
                data = data[:-4]
            info = tarfile.TarInfo(m.name)
            info.size = len(data)
            out.addfile(info, io.BytesIO(data))
    with pytest.raises(StoreError):
        VectorStore.import_snapshot(root, "bad", bad)
    assert not os.path.isdir(os.path.join(root, "bad"))


def test_snapshot_cli_round_trip(tmp_path, rng):
    from reverso_tpu.cli import main
    root = str(tmp_path / "dbs")
    with VectorStore.create(root, "clidb", 8) as s:
        s.append(random_unit(rng, 6, 8), make_payloads(6))
    snap = str(tmp_path / "clidb.snapshot")
    assert main(["--db-root", root, "export", "clidb", snap]) == 0
    assert main(["--db-root", root, "import", snap, "--name", "clidb2"]) == 0
    assert VectorStore.open(root, "clidb2").count == 6
    assert main(["--db-root", root, "import", snap, "--name", "clidb2"]) == 1


# ---------------------------------------------------------------------------
# compaction (delete points)
# ---------------------------------------------------------------------------

def test_compact_basic(tmp_path, rng):
    root = str(tmp_path)
    vecs = random_unit(rng, 30, 16)
    with VectorStore.create(root, "c1", 16) as s:
        s.append(vecs, make_payloads(30))
        keep = np.ones(30, bool)
        keep[[3, 7, 8, 29]] = False
        old_dv, old_me = s.data_version, s.mutation_epoch
        assert s.compact(keep) == 4
        assert s.count == 26
        assert s.data_version == old_dv + 1 and s.mutation_epoch == old_me + 1
        # writable handle keeps working after the rewrite
        s.append(random_unit(rng, 1, 16), make_payloads(1, 30))
    s2 = VectorStore.open(root, "c1")
    assert s2.count == 27
    kept_ids = [i for i in range(30) if i not in (3, 7, 8, 29)] + [30]
    np.testing.assert_array_equal(
        np.asarray(s2.vectors()),
        np.concatenate([vecs[[i for i in kept_ids[:-1]]],
                        np.asarray(s2.vectors())[-1:]]))
    pays = s2.payloads()
    assert [p["detection_index"] for p in pays] == kept_ids
    # O(k) joins against the rebuilt sidecar
    assert s2.payloads([0, 25])[0]["detection_index"] == 0
    assert s2.payloads([25])[0]["detection_index"] == 28
    # no stage/marker leftovers
    assert not any(f.endswith(".compact") or f == "compact.commit"
                   for f in os.listdir(os.path.join(root, "c1")))


def test_compact_guards(tmp_path, rng):
    root = str(tmp_path)
    with VectorStore.create(root, "c2", 8) as s:
        s.append(random_unit(rng, 5, 8), make_payloads(5))
        assert s.compact(np.ones(5, bool)) == 0      # no-op
        with pytest.raises(StoreError):
            s.compact(np.ones(4, bool))              # wrong shape
    ro = VectorStore.open(root, "c2")
    with pytest.raises(StoreError):
        ro.compact(np.zeros(5, bool))                # read-only


def test_compact_crash_rolls_forward(tmp_path, rng):
    """Marker committed + stage files present == compaction happened:
    open() must finish the renames and install the marker meta."""
    import json as _json
    root = str(tmp_path)
    vecs = random_unit(rng, 10, 8)
    with VectorStore.create(root, "c3", 8) as s:
        s.append(vecs, make_payloads(10))
    path = os.path.join(root, "c3")
    # hand-stage a compaction that kept rows 0,2,4,6,8 and "crashed"
    # right after the marker rename (no real file renamed yet)
    keep = np.arange(10) % 2 == 0
    kept = vecs[keep]
    with open(os.path.join(path, "vectors.bin.compact"), "wb") as f:
        f.write(np.ascontiguousarray(kept).tobytes())
    lines, offs, pos = [], [], 0
    with open(os.path.join(path, "payloads.jsonl"), "rb") as f:
        for i, line in enumerate(f):
            if keep[i]:
                lines.append(line)
                offs.append(pos)
                pos += len(line)
    with open(os.path.join(path, "payloads.jsonl.compact"), "wb") as f:
        f.writelines(lines)
    with open(os.path.join(path, "payloads.idx.compact"), "wb") as f:
        f.write(np.asarray(offs, "<i8").tobytes())
    meta = _json.load(open(os.path.join(path, "meta.json")))
    meta.update(count=5, data_version=meta["data_version"] + 1,
                mutation_epoch=meta["mutation_epoch"] + 1)
    with open(os.path.join(path, "compact.commit"), "w") as f:
        _json.dump(meta, f)

    s2 = VectorStore.open(root, "c3")
    assert s2.count == 5
    np.testing.assert_array_equal(np.asarray(s2.vectors()), kept)
    assert [p["detection_index"] for p in s2.payloads()] == [0, 2, 4, 6, 8]
    assert not os.path.exists(os.path.join(path, "compact.commit"))


def test_compact_precrash_stage_is_inert(tmp_path, rng):
    """Stage files WITHOUT a marker (crash before commit) must be
    swept; the original data stays authoritative."""
    root = str(tmp_path)
    vecs = random_unit(rng, 6, 8)
    with VectorStore.create(root, "c4", 8) as s:
        s.append(vecs, make_payloads(6))
    path = os.path.join(root, "c4")
    with open(os.path.join(path, "vectors.bin.compact"), "wb") as f:
        f.write(b"garbage")
    s2 = VectorStore.open(root, "c4")
    assert s2.count == 6
    np.testing.assert_array_equal(np.asarray(s2.vectors()), vecs)
    assert not os.path.exists(os.path.join(path, "vectors.bin.compact"))


def test_compact_stage_survives_live_writer(tmp_path, rng):
    """A concurrent read-only open() while a LIVE writer is mid-compact
    (stage files present, marker not yet committed) must not sweep the
    writer's stage files — and must not roll a committed marker forward
    either (that's the live writer's job). Only a stale lock (dead PID)
    re-enables recovery."""
    import json as _json
    root = str(tmp_path)
    vecs = random_unit(rng, 6, 8)
    s = VectorStore.create(root, "c5", 8)
    s.append(vecs, make_payloads(6))
    s.flush()
    path = os.path.join(root, "c5")
    stage = os.path.join(path, "vectors.bin.compact")
    with open(stage, "wb") as f:
        f.write(b"writer work product")
    # live lock (this process): reader backs off entirely
    ro = VectorStore.open(root, "c5")
    assert os.path.exists(stage)
    assert ro.count == 6
    # even a committed marker is left for the live writer to finish
    meta = _json.load(open(os.path.join(path, "meta.json")))
    marker_meta = dict(meta, count=3)
    with open(os.path.join(path, "compact.commit"), "w") as f:
        _json.dump(marker_meta, f)
    ro2 = VectorStore.open(root, "c5")
    assert ro2.count == 6              # old meta still authoritative
    assert os.path.exists(os.path.join(path, "compact.commit"))
    os.remove(os.path.join(path, "compact.commit"))
    s.close()                          # releases the lock
    # stale-lock case: dead PID re-enables the sweep
    with open(os.path.join(path, ".lock"), "w") as f:
        f.write("999999999")           # no such PID
    ro3 = VectorStore.open(root, "c5")
    assert not os.path.exists(stage)
    assert ro3.count == 6
    os.remove(os.path.join(path, ".lock"))


def test_update_payloads_modes(tmp_path, rng):
    """set/overwrite/delete/clear rewrite only the selected payload
    lines; vectors are bit-identical, vector_version and mutation_epoch
    hold still (no device re-upload, IVF cache stays valid), and
    data_version bumps (payload caches refresh)."""
    root = str(tmp_path)
    vecs = random_unit(rng, 8, 16)
    s = VectorStore.create(root, "up", 16)
    s.append(vecs, make_payloads(8))
    s.flush()
    vv, me, dv = s.vector_version, s.mutation_epoch, s.data_version

    assert s.update_payloads([1, 3], patch={"note": "x", "bbox": [1, 1]},
                             mode="set") == 2
    pays = s.payloads()
    assert pays[1]["note"] == "x" and pays[1]["bbox"] == [1, 1]
    assert pays[1]["region_id"] == "r1"          # merge keeps other keys
    assert "note" not in pays[0] and pays[0]["bbox"] == [0, 0, 10, 10]
    assert s.data_version == dv + 1
    assert s.vector_version == vv and s.mutation_epoch == me
    np.testing.assert_array_equal(np.asarray(s.vectors()), vecs)

    assert s.update_payloads([2], patch={"only": 1}, mode="overwrite") == 1
    assert s.payloads([2])[0] == {"only": 1}
    assert s.update_payloads([1], keys=["note", "ghost"],
                             mode="delete") == 1
    assert "note" not in s.payloads([1])[0]
    assert s.update_payloads([0], mode="clear") == 1
    assert s.payloads([0])[0] == {}
    # empty selection is a no-op with no version churn
    dv2 = s.data_version
    assert s.update_payloads([], patch={"a": 1}, mode="set") == 0
    assert s.data_version == dv2

    with pytest.raises(StoreError):
        s.update_payloads([0], mode="nonsense")
    with pytest.raises(StoreError):
        s.update_payloads([0], mode="set")             # no patch
    with pytest.raises(StoreError):
        s.update_payloads([0], mode="delete")          # no keys
    with pytest.raises(StoreError):
        s.update_payloads([99], patch={}, mode="overwrite")
    s.close()

    # sidecar stayed in lockstep: O(k) joins on a fresh handle
    s2 = VectorStore.open(root, "up")
    assert s2.payloads([2, 0, 7]) == [{"only": 1}, {},
                                      make_payloads(1, 7)[0]]
    with pytest.raises(StoreError):
        s2.update_payloads([0], mode="clear")          # read-only


def test_update_payloads_crash_rolls_forward(tmp_path, rng):
    """A crash after the commit marker lands (stage files present,
    renames not yet done) must roll forward on the next open — same
    journal as compact, but payload-only staging leaves vectors.bin
    alone."""
    import json as _json
    root = str(tmp_path)
    vecs = random_unit(rng, 4, 8)
    s = VectorStore.create(root, "upc", 8)
    s.append(vecs, make_payloads(4))
    s.flush()
    path = os.path.join(root, "upc")
    # build the staged rewrite by hand (row 2 cleared)
    lines = []
    with open(os.path.join(path, "payloads.jsonl"), "rb") as f:
        lines = f.read().splitlines(keepends=True)
    lines[2] = b"{}\n"
    offs, pos = [], 0
    for ln in lines:
        offs.append(pos)
        pos += len(ln)
    with open(os.path.join(path, "payloads.jsonl.compact"), "wb") as f:
        f.write(b"".join(lines))
    with open(os.path.join(path, "payloads.idx.compact"), "wb") as f:
        f.write(np.asarray(offs, "<i8").tobytes())
    meta = _json.load(open(os.path.join(path, "meta.json")))
    marker = dict(meta, data_version=meta["data_version"] + 1)
    with open(os.path.join(path, "compact.commit"), "w") as f:
        _json.dump(marker, f)
    s.close()                                # crash: lock released

    s2 = VectorStore.open(root, "upc")
    assert s2.count == 4
    assert s2.payloads([2])[0] == {}
    assert s2.payloads([1])[0]["region_id"] == "r1"
    assert s2.data_version == meta["data_version"] + 1
    assert s2.vector_version == meta["vector_version"]
    np.testing.assert_array_equal(np.asarray(s2.vectors()), vecs)
    assert not os.path.exists(os.path.join(path, "compact.commit"))
    assert not os.path.exists(
        os.path.join(path, "payloads.jsonl.compact"))


def test_aliases(tmp_path, rng):
    """qdrant collection-aliases role: stable names over databases,
    atomic repointing, death with the target database."""
    from reverso_tpu.store import (delete_alias, list_aliases,
                                   resolve_alias, set_alias)

    root = str(tmp_path)
    for name in ("v1", "v2"):
        with VectorStore.create(root, name, 8) as s:
            s.append(random_unit(rng, 3, 8), make_payloads(3))
    set_alias(root, "prod", "v1")
    assert resolve_alias(root, "prod") == "v1"
    assert resolve_alias(root, "v2") == "v2"        # real names pass through
    assert resolve_alias(root, "ghost") == "ghost"
    set_alias(root, "prod", "v2")                   # atomic flip
    assert list_aliases(root) == {"prod": "v2"}
    with pytest.raises(StoreError):
        set_alias(root, "v1", "v2")                 # collides with a db
    with pytest.raises(StoreError):
        set_alias(root, "x", "ghost")               # target must exist
    with pytest.raises(StoreError):
        set_alias(root, "a/b", "v2")
    # deleting the target drops its aliases
    delete_database(root, "v2")
    assert list_aliases(root) == {}
    assert delete_alias(root, "prod") is False

    # engine loads through an alias
    import dataclasses
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=MODEL_PRESETS["test-tiny"],
        store=dataclasses.replace(cfg.store, root_dir=root))
    engine = Reverso(cfg)
    set_alias(root, "prod", "v1")
    msg = engine.load_database("prod")
    assert msg.startswith("✅") and "alias prod" in msg
    assert engine.current_database == "v1"
    assert engine.count() == 3


def test_cli_alias(tmp_path, rng, capsys):
    from reverso_tpu.cli import main

    root = str(tmp_path / "db")
    with VectorStore.create(root, "base", 8) as s:
        s.append(random_unit(rng, 2, 8), make_payloads(2))
    base = ["--db-root", root, "--model", "test-tiny"]
    assert main(base + ["alias", "set", "prod", "base"]) == 0
    capsys.readouterr()
    assert main(base + ["alias", "list"]) == 0
    assert "prod\tbase" in capsys.readouterr().out
    # store-only commands work through the alias
    assert main(base + ["points", "prod", "--limit", "1"]) == 0
    capsys.readouterr()
    assert main(base + ["alias", "set", "prod", "ghost"]) == 1
    capsys.readouterr()
    assert main(base + ["alias", "delete", "prod"]) == 0
    assert main(base + ["alias", "set"]) == 1


def test_update_vectors_in_place(tmp_path, rng):
    """In-place vector overwrite (qdrant update_vectors role): rows
    rewritten at their byte offsets, payloads untouched, all three
    version fields bump (device index re-uploads, IVF retrains)."""
    root = str(tmp_path)
    vecs = random_unit(rng, 6, 8)
    s = VectorStore.create(root, "uv", 8)
    s.append(vecs, make_payloads(6))
    s.flush()
    dv, vv, me = s.data_version, s.vector_version, s.mutation_epoch
    new = random_unit(rng, 2, 8)
    assert s.update_vectors([4, 1], new) == 2
    got = np.asarray(s.vectors())
    np.testing.assert_array_equal(got[4], new[0])
    np.testing.assert_array_equal(got[1], new[1])
    np.testing.assert_array_equal(got[[0, 2, 3, 5]], vecs[[0, 2, 3, 5]])
    assert s.payloads([4])[0]["region_id"] == "r4"
    assert (s.data_version, s.vector_version, s.mutation_epoch) == \
        (dv + 1, vv + 1, me + 1)
    assert not os.path.exists(os.path.join(root, "uv", "vectors.patch"))
    with pytest.raises(StoreError):
        s.update_vectors([0, 0], random_unit(rng, 2, 8))   # dup rows
    with pytest.raises(StoreError):
        s.update_vectors([99], random_unit(rng, 1, 8))
    with pytest.raises(StoreError):
        s.update_vectors([0], random_unit(rng, 1, 4))      # wrong dim
    assert s.update_vectors([], np.zeros((0, 8), np.float32)) == 0
    s.close()
    ro = VectorStore.open(root, "uv")
    with pytest.raises(StoreError):
        ro.update_vectors([0], random_unit(rng, 1, 8))


def test_update_vectors_crash_rolls_forward(tmp_path, rng):
    """A committed vectors.patch with the apply interrupted must roll
    forward on open; a STALE leftover patch (older data_version) must
    be dropped, never replayed over newer data."""
    import json as _json
    root = str(tmp_path)
    vecs = random_unit(rng, 4, 8)
    s = VectorStore.create(root, "uvc", 8)
    s.append(vecs, make_payloads(4))
    s.flush()
    path = os.path.join(root, "uvc")
    new_row = random_unit(rng, 1, 8)
    meta = _json.load(open(os.path.join(path, "meta.json")))
    patch_meta = dict(meta, data_version=meta["data_version"] + 1,
                      vector_version=meta["vector_version"] + 1,
                      mutation_epoch=meta["mutation_epoch"] + 1)
    with open(os.path.join(path, "vectors.patch"), "wb") as f:
        np.savez(f, rows=np.asarray([2], np.int64),
                 vecs=new_row.astype(np.float32),
                 meta=np.asarray(_json.dumps(patch_meta)))
    s.close()                               # crash: apply never ran

    s2 = VectorStore.open(root, "uvc")
    np.testing.assert_array_equal(np.asarray(s2.vectors())[2], new_row[0])
    assert s2.data_version == patch_meta["data_version"]
    assert s2.vector_version == patch_meta["vector_version"]
    assert not os.path.exists(os.path.join(path, "vectors.patch"))

    # stale patch: data_version not beyond current -> dropped unapplied
    stale_row = random_unit(rng, 1, 8)
    with open(os.path.join(path, "vectors.patch"), "wb") as f:
        np.savez(f, rows=np.asarray([0], np.int64),
                 vecs=stale_row.astype(np.float32),
                 meta=np.asarray(_json.dumps(patch_meta)))  # same dv
    s3 = VectorStore.open(root, "uvc")
    np.testing.assert_array_equal(np.asarray(s3.vectors())[0], vecs[0])
    assert not os.path.exists(os.path.join(path, "vectors.patch"))


def test_engine_update_vectors(tmp_path, rng):
    import dataclasses
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
    vecs = random_unit(rng, 8, 16)
    with VectorStore.create(str(tmp_path / "db"), "uve", 16) as s:
        s.append(vecs, make_payloads(8))
    engine.load_database("uve")
    s_, i_ = engine.search_batch(vecs[5], k=1)
    assert int(i_[0, 0]) == 5
    # move point 5 onto point 0's direction (unnormalized input ok)
    msg = engine.update_vectors([5, "r2"], np.stack([vecs[0] * 7.0,
                                                     vecs[1] * 2.0]))
    assert msg.startswith("✅") and "2 points" in msg
    s_, i_ = engine.search_batch(vecs[0], k=2)
    assert set(int(x) for x in i_[0]) == {0, 5}     # index refreshed
    s_, i_ = engine.search_batch(vecs[1], k=2)
    assert set(int(x) for x in i_[0]) == {1, 2}
    assert engine.update_vectors([99], vecs[:1]).startswith("❌")
    assert engine.update_vectors([1, 2], vecs[:1]).startswith("❌")
    assert engine.update_vectors([1],
                                 np.zeros((1, 16))).startswith("❌")


def test_engine_upsert_points(tmp_path, rng):
    import dataclasses
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=MODEL_PRESETS["test-tiny"],
        store=dataclasses.replace(cfg.store,
                                  root_dir=str(tmp_path / "db")))
    engine = Reverso(cfg)
    vecs = random_unit(rng, 4, 16)
    with VectorStore.create(str(tmp_path / "db"), "ups", 16) as s:
        s.append(vecs, make_payloads(4))
    engine.load_database("ups")
    more = random_unit(rng, 3, 16) * 5.0            # unnormalized ok
    msg = engine.upsert_points(more, [{"tag": "x"}, {"tag": "y"}, {}])
    assert msg.startswith("✅") and "ids 4..6" in msg
    assert engine.count() == 7
    s_, i_ = engine.search_batch(more[1] / np.linalg.norm(more[1]), k=1)
    assert int(i_[0, 0]) == 5                       # index refreshed
    assert engine.retrieve([4])[0]["payload"] == {"tag": "x"}
    assert engine.upsert_points(more[:2], [{}]).startswith("❌")
    assert engine.upsert_points(np.zeros((1, 16))).startswith("❌")
    assert engine.upsert_points(random_unit(rng, 1, 8)).startswith("❌")


def test_cli_upsert(tmp_path, rng, capsys):
    import json as _json
    from reverso_tpu.cli import main

    root = str(tmp_path / "db")
    base = ["--db-root", root, "--model", "test-tiny"]
    vecs = random_unit(rng, 3, 8)
    npz = str(tmp_path / "pts.npz")
    np.savez(npz, vectors=vecs,
             payloads=np.asarray([_json.dumps({"filename": f"f{i}.jpg"})
                                  for i in range(3)]))
    # creates the database when missing
    rc = main(base + ["upsert", "fresh", npz])
    assert rc == 0 and "3 points" in capsys.readouterr().out
    rc = main(base + ["upsert", "fresh", npz])      # appends
    assert rc == 0 and "ids 3..5" in capsys.readouterr().out
    st = VectorStore.open(root, "fresh")
    assert st.count == 6
    assert st.payloads([1])[0]["filename"] == "f1.jpg"
    # JSONL payload sidecar wins
    jl = str(tmp_path / "p.jsonl")
    with open(jl, "w") as f:
        for i in range(3):
            f.write(_json.dumps({"n": i}) + "\n")
    rc = main(base + ["upsert", "fresh", npz, "--payloads", jl])
    assert rc == 0
    capsys.readouterr()
    assert VectorStore.open(root, "fresh").payloads([6])[0] == {"n": 0}
    rc = main(base + ["upsert", "fresh", str(tmp_path / "nope.npz")])
    assert rc == 1
    # upserting through an ALIAS appends to the target — it must not
    # create a shadow database named after the alias
    from reverso_tpu.store import set_alias
    set_alias(root, "prod", "fresh")
    rc = main(base + ["upsert", "prod", npz])
    assert rc == 0
    capsys.readouterr()
    assert not os.path.isdir(os.path.join(root, "prod"))
    assert VectorStore.open(root, "fresh").count == 12


def test_cli_update_vectors(tmp_path, rng, capsys):
    from reverso_tpu.cli import main

    vecs = random_unit(rng, 5, 8)
    root = str(tmp_path / "db")
    with VectorStore.create(root, "cliuv", 8) as s:
        s.append(vecs, make_payloads(5))
    new = random_unit(rng, 2, 8)
    npz = str(tmp_path / "patch.npz")
    np.savez(npz, ids=np.asarray([3, 0]), vectors=new)
    rc = main(["--db-root", root, "--model", "test-tiny",
               "update-vectors", "cliuv", npz])
    assert rc == 0 and "2 points" in capsys.readouterr().out
    got = np.asarray(VectorStore.open(root, "cliuv").vectors())
    np.testing.assert_allclose(got[3], new[0], atol=1e-6)
    np.testing.assert_allclose(got[0], new[1], atol=1e-6)
    rc = main(["--db-root", root, "--model", "test-tiny",
               "update-vectors", "cliuv", str(tmp_path / "nope.npz")])
    assert rc == 1


def test_engine_payload_mutation(tmp_path, rng):
    """Engine facade: selection by ids/region_ids/filter, device index
    survives the mutation (vectors unchanged), filters see the new
    payload values."""
    import dataclasses
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
    vecs = random_unit(rng, 10, 32)
    payloads = [{"region_id": f"r{i}", "filename": f"f{i}.jpg",
                 "detected_class": "person" if i < 4 else "car"}
                for i in range(10)]
    with VectorStore.create(str(tmp_path / "db"), "mut", 32) as s:
        s.append(vecs, payloads)
    engine.load_database("mut")
    idx_before = engine._get_index()

    msg = engine.set_payload({"reviewed": True},
                             points=[0, "r2"], filter="detected_class=car")
    assert msg.startswith("✅") and "8 points" in msg
    assert engine.count({"reviewed": True}) == 8
    assert engine._get_index() is idx_before       # no re-upload

    msg = engine.delete_payload(["reviewed"], points=[0])
    assert msg.startswith("✅")
    assert engine.count({"reviewed": True}) == 7
    msg = engine.clear_payload(filter="detected_class=person")
    assert msg.startswith("✅")
    assert engine.retrieve([1])[0]["payload"] == {}
    msg = engine.overwrite_payload({"fresh": 1}, points=[5])
    assert engine.retrieve([5])[0]["payload"] == {"fresh": 1}

    # guard rails
    assert engine.set_payload({"a": 1}).startswith("❌")
    assert engine.set_payload({"a": 1},
                              filter="bad syntax((").startswith("❌")
    # search still exact against the untouched vectors
    s_, i_ = engine.search_batch(vecs[3], k=1)
    assert int(i_[0, 0]) == 3


def test_engine_delete_points(tmp_path, rng):
    import dataclasses
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso
    from reverso_tpu.models.pe import PerceptionEncoder

    model = dataclasses.replace(MODEL_PRESETS["test-tiny"], dtype="float32")
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=model,
        store=dataclasses.replace(cfg.store, root_dir=str(tmp_path / "db")))
    engine = Reverso(cfg, encoder=PerceptionEncoder(model))
    d = engine.encoder.embed_dim
    vecs = random_unit(rng, 20, d)
    with VectorStore.create(str(tmp_path / "db"), "pts", d) as s:
        s.append(vecs, [{"region_id": f"r{i}", "filename": f"f{i}.jpg",
                         "detected_class": "person" if i < 8 else "car"}
                        for i in range(20)])
    engine.load_database("pts")
    # searches see 20 rows, then 12 after the delete
    scores, ids = engine.search_batch(vecs[:1], k=32)
    assert (ids >= 0).sum() == 20
    msg = engine.delete_points({"detected_class": "person"})
    assert msg.startswith("✅") and "8" in msg, msg
    scores, ids = engine.search_batch(vecs[:1], k=32)
    assert (ids >= 0).sum() == 12
    _, items = engine.search_similar(similarity_threshold=-1.0,
                                     embeddings=vecs[10:11])
    assert items and all(it["payload"]["detected_class"] == "car"
                         for it in items)
    assert engine.delete_points("").startswith("❌")
    assert engine.delete_points({"detected_class": "unicorn"}) \
        .startswith("✅ Deleted 0")
    # delete by ids: mixed row id + region_id string selectors; ids of
    # the compacted store (rows renumber after the filter delete above)
    items = engine.retrieve(["r10", "r11"])
    assert [it["payload"]["region_id"] for it in items] == ["r10", "r11"]
    rid_row = items[0]["id"]
    msg = engine.delete_points(points=[rid_row, "r11"])
    assert msg.startswith("✅ Deleted 2"), msg
    assert engine.retrieve(["r10", "r11"]) == []
    scores, ids = engine.search_batch(vecs[:1], k=32)
    assert (ids >= 0).sum() == 10
    # unknown ids are skipped (qdrant semantics): no-op success
    assert engine.delete_points(points=["nope"]).startswith("✅ Deleted 0")
    # filter AND ids union in one call
    msg = engine.delete_points({"region_id": "r12"}, points=["r13"])
    assert msg.startswith("✅ Deleted 2"), msg


def test_engine_update_batch(tmp_path, rng):
    import dataclasses
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(MODEL_PRESETS["test-tiny"],
                                       dtype="float32"),
        store=dataclasses.replace(cfg.store,
                                  root_dir=str(tmp_path / "db")))
    engine = Reverso(cfg)
    vecs = random_unit(rng, 6, 16)
    with VectorStore.create(str(tmp_path / "db"), "ub", 16) as s:
        s.append(vecs, make_payloads(6))
    engine.load_database("ub")

    more = random_unit(rng, 2, 16)
    msg = engine.update_batch([
        # 1) append two points (one carries a region_id for later ops)
        {"upsert": {"vectors": more * 3.0,           # unnormalized ok
                    "payloads": [{"region_id": "new0", "tag": "a"},
                                 {"tag": "b"}]}},
        # 2) tag some originals, selecting by id AND by filter
        {"set_payload": {"payload": {"tag": "old"},
                         "points": ["r0"],
                         "filter": {"detection_index": {"gte": 4}}}},
        # 3) drop r1; later integer ids refer to the RENUMBERED state
        {"delete": {"points": ["r1"]}},
        # 4) move the upserted point onto vecs[2]'s direction
        {"update_vectors": {"points": ["new0"], "vectors": vecs[2:3]}},
        # 5) strip a key from every original row
        {"delete_payload": {"keys": ["bbox"],
                            "filter": {"detected_class": "object"}}},
    ])
    assert msg.startswith("✅ Applied 5 operations"), msg
    assert "upsert 2" in msg and "delete 1" in msg, msg
    # count: 6 + 2 - 1
    assert engine.count() == 7
    # op 2 hit r0, r4, r5 (detection_index 4,5)
    tagged = engine.count({"tag": "old"})
    assert tagged == 3
    # op 4: searching vecs[2] now finds both row 2 (renumbered) and new0
    s_, i_ = engine.search_batch(vecs[2], k=2)
    hits = engine.retrieve([int(x) for x in i_[0]])
    rids = {h["payload"].get("region_id") for h in hits}
    assert rids == {"r2", "new0"}, rids
    # op 5: bbox gone from originals, upserted rows never had it
    assert all("bbox" not in p["payload"]
               for p in engine.retrieve(["r0", "r2"]))

    # validation rejects the whole batch up front: nothing is touched
    before = engine.count()
    assert engine.update_batch([{"nope": {}}]).startswith("❌")
    assert engine.update_batch([{"upsert": {"vectors": more},
                                 "delete": {}}]).startswith("❌")
    assert engine.update_batch(
        [{"upsert": {"vectors": np.zeros((1, 16))}}]).startswith("❌")
    assert engine.update_batch(
        [{"delete": {}}]).startswith("❌")
    assert engine.update_batch(
        [{"update_vectors": {"points": [0, 1],
                             "vectors": vecs[:1]}}]).startswith("❌")
    assert engine.update_batch(
        [{"set_payload": {"payload": {"x": 1}, "points": [0],
                          "bogus": 1}}]).startswith("❌")
    assert engine.count() == before
    assert engine.update_batch([]).startswith("✅ Applied 0")
    # mid-batch failure keeps the prefix (ordered, not transactional)
    msg = engine.update_batch([
        {"set_payload": {"payload": {"seen": 1}, "points": ["r2"]}},
        {"update_vectors": {"points": ["ghost"], "vectors": vecs[:1]}},
    ])
    assert msg.startswith("❌"), msg
    assert engine.count({"seen": 1}) == 1


def test_batch_cli(tmp_path, rng):
    import json as _json
    from reverso_tpu.cli import main
    root = str(tmp_path / "dbs")
    with VectorStore.create(root, "b1", 8) as s:
        s.append(random_unit(rng, 5, 8), make_payloads(5))
    opsfile = str(tmp_path / "ops.json")
    with open(opsfile, "w") as f:
        _json.dump({"operations": [
            {"set_payload": {"payload": {"lang": "en"},
                             "points": ["r0", "r3"]}},
            {"delete": {"filter": {"detection_index": 4}}},
        ]}, f)
    assert main(["--db-root", root, "batch", "b1", opsfile]) == 0
    store = VectorStore.open(root, "b1")
    assert store.count == 4
    langs = [p.get("lang") for p in store.payloads(range(4))]
    assert langs == ["en", None, None, "en"]
    # malformed file -> error before touching the store
    with open(opsfile, "w") as f:
        f.write("{not json")
    assert main(["--db-root", root, "batch", "b1", opsfile]) == 1
    with open(opsfile, "w") as f:
        _json.dump({"operations": {"set_payload": {}}}, f)
    assert main(["--db-root", root, "batch", "b1", opsfile]) == 1


def test_prune_and_info_cli(tmp_path, rng):
    from reverso_tpu.cli import main
    root = str(tmp_path / "dbs")
    with VectorStore.create(root, "p1", 8) as s:
        s.append(random_unit(rng, 9, 8),
                 [{"region_id": f"r{i}",
                   "detected_class": "person" if i % 3 == 0 else "car"}
                  for i in range(9)])
    assert main(["--db-root", root, "prune", "p1",
                 "--filter", "detected_class=person", "--dry-run"]) == 0
    assert VectorStore.open(root, "p1").count == 9
    assert main(["--db-root", root, "prune", "p1",
                 "--filter", "detected_class=person"]) == 0
    assert VectorStore.open(root, "p1").count == 6
    # prune by ids: one row id, one region_id string (post-compaction
    # survivors are r1,r2,r4,r5,r7,r8 in rows 0..5)
    assert main(["--db-root", root, "prune", "p1",
                 "--ids", "0", "r8"]) == 0
    store = VectorStore.open(root, "p1")
    assert store.count == 4
    left = {p["region_id"] for p in store.payloads(range(store.count))}
    assert left == {"r2", "r4", "r5", "r7"}
    # neither selector -> error
    assert main(["--db-root", root, "prune", "p1"]) == 1
    assert main(["--db-root", root, "info", "p1", "--classes",
                 "--json"]) == 0
