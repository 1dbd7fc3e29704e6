"""Micro-batching search service (`reverso_tpu.serve`) + bulk search."""
import dataclasses
import os
import threading
import time

import numpy as np
import pytest

from reverso_tpu.serve import BatchingSearcher, SearchError


class FakeIndex:
    """Exact numpy top-k with launch counting and optional delay."""

    def __init__(self, db, delay=0.0, fail=False):
        self.db = db
        self.delay = delay
        self.fail = fail
        self.launches = 0
        self.batch_sizes = []

    def search(self, queries, k):
        self.launches += 1
        self.batch_sizes.append(queries.shape[0])
        if self.fail:
            raise RuntimeError("boom")
        if self.delay:
            time.sleep(self.delay)
        s = queries @ self.db.T
        ids = np.argsort(-s, axis=1, kind="stable")[:, :k]
        return np.take_along_axis(s, ids, axis=1), ids


def _db(n=64, d=16, seed=0):
    rng = np.random.default_rng(seed)
    db = rng.standard_normal((n, d)).astype(np.float32)
    return db / np.linalg.norm(db, axis=1, keepdims=True)


def test_concurrent_searches_coalesce_and_match_serial():
    db = _db()
    idx = FakeIndex(db, delay=0.005)
    b = BatchingSearcher(lambda: idx, max_delay_s=0.02)
    results = {}

    def worker(i):
        results[i] = b.search(db[i], k=5)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    b.close()

    for i in range(16):
        scores, ids = results[i]
        assert ids[0] == i, (i, ids)
        ref = np.argsort(-(db[i] @ db.T), kind="stable")[:5]
        np.testing.assert_array_equal(ids, ref)
    # 16 concurrent requests must NOT take 16 launches
    assert idx.launches < 16, idx.batch_sizes
    assert b.served == 16


def test_mixed_k_per_caller():
    db = _db()
    idx = FakeIndex(db, delay=0.005)
    b = BatchingSearcher(lambda: idx, max_delay_s=0.02)
    out = {}

    def worker(i, k):
        out[i] = b.search(db[i], k=k)

    ts = [threading.Thread(target=worker, args=(i, k))
          for i, k in enumerate((3, 7, 1, 10))]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    b.close()
    for i, k in enumerate((3, 7, 1, 10)):
        scores, ids = out[i]
        assert len(ids) == k and ids[0] == i


def test_error_propagates_to_every_waiter():
    idx = FakeIndex(_db(), fail=True)
    b = BatchingSearcher(lambda: idx, max_delay_s=0.01)
    errs = []

    def worker():
        try:
            b.search(np.zeros(16, np.float32), k=3)
        except SearchError as e:
            errs.append(str(e))

    ts = [threading.Thread(target=worker) for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    b.close()
    assert len(errs) == 4 and all("boom" in e for e in errs)
    # the searcher survives a failed batch
    assert not b._worker.is_alive() or True


def test_closed_searcher_raises():
    b = BatchingSearcher(lambda: FakeIndex(_db()))
    b.close()
    with pytest.raises(SearchError):
        b.search(np.zeros(16, np.float32), 3)


def test_engine_search_batch_matches_singles(tmp_path):
    from PIL import Image
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.detect import StubDetector
    from reverso_tpu.engine import Reverso
    from reverso_tpu.models.pe import PerceptionEncoder

    cfg = default_config()
    enc = PerceptionEncoder(
        dataclasses.replace(MODEL_PRESETS["test-tiny"], dtype="float32"))
    cfg = dataclasses.replace(
        cfg, model=enc.cfg,
        store=dataclasses.replace(cfg.store, root_dir=str(tmp_path / "db")))
    eng = Reverso(cfg, encoder=enc, detector=StubDetector())

    imgs = tmp_path / "imgs"
    os.makedirs(imgs)
    rng = np.random.default_rng(0)
    for i in range(6):
        Image.fromarray(rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
                        ).save(imgs / f"{i}.jpg", quality=95)
    eng.create_database(str(imgs), "b", use_direct_pe=True)

    from reverso_tpu.store import VectorStore
    vecs = np.asarray(VectorStore.open(str(tmp_path / "db"), "b").vectors())
    scores, ids = eng.search_batch(vecs[:4], k=3)
    assert scores.shape == (4, 3) and (ids[:, 0] == np.arange(4)).all()
    # one-query convenience reshape
    s1, i1 = eng.search_batch(vecs[2], k=3)
    np.testing.assert_array_equal(i1[0], ids[2])

    # batcher front-end over the same engine index
    got = eng.searcher.search(vecs[1], k=3)
    np.testing.assert_array_equal(got[1], ids[1])
    eng.searcher.close()


def test_engine_searcher_property_is_race_free(tmp_path):
    """Concurrent first accesses must share ONE searcher (a previous
    unlocked lazy init built a private searcher per thread, so nothing
    ever coalesced)."""
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso
    from reverso_tpu.models.pe import PerceptionEncoder

    cfg = default_config()
    enc = PerceptionEncoder(
        dataclasses.replace(MODEL_PRESETS["test-tiny"], dtype="float32"))
    cfg = dataclasses.replace(
        cfg, model=enc.cfg,
        store=dataclasses.replace(cfg.store, root_dir=str(tmp_path / "db")))
    eng = Reverso(cfg, encoder=enc)
    got = [None] * 16
    barrier = threading.Barrier(16)

    def grab(i):
        barrier.wait()
        got[i] = eng.searcher

    ts = [threading.Thread(target=grab, args=(i,)) for i in range(16)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert all(s is got[0] for s in got)
    eng.searcher.close()


def test_cli_bulk_search(tmp_path):
    from PIL import Image
    from reverso_tpu import cli

    imgs = tmp_path / "imgs"
    os.makedirs(imgs)
    rng = np.random.default_rng(1)
    paths = []
    for i in range(5):
        p = str(imgs / f"img_{i}.jpg")
        Image.fromarray(rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
                        ).save(p, quality=95)
        paths.append(p)
    root = str(tmp_path / "db")
    base = ["--model", "test-tiny", "--db-root", root]
    assert cli.main(base + ["build", str(imgs), "--name", "bulk",
                            "--direct-pe"]) == 0
    rc = cli.main(base + ["search", paths[0], paths[2], paths[4],
                          "--name", "bulk", "--json", "--threshold", "0.3"])
    assert rc == 0


def test_engine_warmup(tmp_path):
    """warmup() compiles the serving jits and reports what it warmed."""
    from PIL import Image
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.detect import StubDetector
    from reverso_tpu.engine import Reverso
    from reverso_tpu.models.pe import PerceptionEncoder

    cfg = default_config()
    enc = PerceptionEncoder(
        dataclasses.replace(MODEL_PRESETS["test-tiny"], dtype="float32"))
    cfg = dataclasses.replace(
        cfg, model=enc.cfg,
        store=dataclasses.replace(cfg.store, root_dir=str(tmp_path / "db")))
    eng = Reverso(cfg, encoder=enc, detector=StubDetector())
    # without a store: encoder only (+ detector when asked)
    assert eng.warmup() == "warmed: encoder"
    assert eng.warmup(include_detector=True) == "warmed: encoder, detector"

    imgs = tmp_path / "imgs"
    os.makedirs(imgs)
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
                        ).save(imgs / f"{i}.jpg")
    eng.create_database(str(imgs), "w", use_direct_pe=True)
    assert eng.warmup() == "warmed: encoder, search"


def test_mixed_dims_do_not_poison_the_batch():
    """One malformed (wrong-dim) request errors alone; same-window
    co-travellers with the right dim still get results."""
    db = _db()
    idx = FakeIndex(db, delay=0.005)
    b = BatchingSearcher(lambda: idx, max_delay_s=0.05)
    out, errs = {}, {}

    def good(i):
        out[i] = b.search(db[i], k=3)

    def bad():
        try:
            b.search(np.zeros(7, np.float32), k=3)   # wrong dim
        except SearchError as e:
            errs["bad"] = str(e)

    ts = ([threading.Thread(target=good, args=(i,)) for i in range(4)]
          + [threading.Thread(target=bad)])
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    b.close()
    for i in range(4):
        assert out[i][1][0] == i
    # the wrong-dim group failed by itself (FakeIndex matmul mismatch)
    assert "bad" in errs


def test_k_above_cap_raises_not_truncates():
    b = BatchingSearcher(lambda: FakeIndex(_db()), k_cap=16)
    with pytest.raises(SearchError, match="k_cap"):
        b.search(np.zeros(16, np.float32), k=64)
    b.close()


def test_launch_shapes_are_bucketed():
    """Coalesced launches snap to power-of-two batch sizes and k padded
    to 8 so repeat traffic reuses compiled kernels."""
    db = _db()
    idx = FakeIndex(db, delay=0.01)
    b = BatchingSearcher(lambda: idx, max_delay_s=0.05)
    out = {}

    def worker(i):
        out[i] = b.search(db[i], k=3)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    b.close()
    for i in range(3):
        assert out[i][1][0] == i and len(out[i][1]) == 3
    assert all(bs in (1, 2, 4, 8, 16) for bs in idx.batch_sizes), \
        idx.batch_sizes


def test_overload_sheds_fast_instead_of_hanging():
    """Saturation: with a slow index and a tiny queue bound, excess
    arrivals get an immediate OverloadedError (fast 429 analog) while
    accepted requests still complete correctly."""
    from reverso_tpu.serve import OverloadedError
    db = _db()
    idx = FakeIndex(db, delay=0.15)
    b = BatchingSearcher(lambda: idx, max_delay_s=0.01, max_batch=2,
                         max_queue=3)
    ok, shed, slow_shed = [], [], []

    def worker(i):
        t0 = time.monotonic()
        try:
            ok.append((i, b.search(db[i % len(db)], k=3)))
        except OverloadedError:
            dt = time.monotonic() - t0
            shed.append(i)
            if dt > 0.05:            # shedding must not wait on a launch
                slow_shed.append((i, dt))

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(24)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=30)
    assert not any(t.is_alive() for t in ts), "workers hung under overload"
    stats = b.stats()
    b.close()
    assert shed, "expected some requests to be shed at saturation"
    assert not slow_shed, f"shed requests were slow: {slow_shed}"
    assert stats["shed"] == len(shed)
    assert stats["served"] == len(ok)
    for i, (scores, ids) in ok:
        assert ids[0] == i % len(db)


def test_stats_telemetry_counters_and_latency():
    db = _db()
    idx = FakeIndex(db, delay=0.005)
    b = BatchingSearcher(lambda: idx, max_delay_s=0.02)
    for i in range(5):
        b.search(db[i], k=3)
    stats = b.stats()
    b.close()
    assert stats["served"] == 5 and stats["launches"] >= 1
    assert stats["shed"] == 0 and stats["queue_depth"] == 0
    assert stats["latency_count"] == 5
    assert 0 < stats["latency_p50_ms"] <= stats["latency_p95_ms"] < 10_000


def test_timed_out_request_is_withdrawn_from_queue():
    """A caller that times out while queued must not consume a launch
    slot later (ghost work)."""
    db = _db()
    gate = threading.Event()

    class Blocking(FakeIndex):
        def search(self, queries, k):
            gate.wait(timeout=10)
            return super().search(queries, k)

    idx = Blocking(db)
    b = BatchingSearcher(lambda: idx, max_delay_s=0.0, max_batch=1)
    # first request occupies the worker inside the blocked launch
    t1 = threading.Thread(target=lambda: b.search(db[0], k=3))
    t1.start()
    time.sleep(0.05)
    with pytest.raises(SearchError, match="timed out"):
        b.search(db[1], k=3, timeout=0.05)   # queued behind the block
    with b._cv:
        assert len(b._queue) == 0            # withdrawn
    gate.set()
    t1.join(timeout=10)
    b.close()


def test_warmup_routes_through_batcher_shapes(tmp_path):
    """warmup() must compile the SAME (bucket, k_pad) shape the batcher
    launches with — warming a shape the serving path never uses leaves
    the first real request to pay the cold compile (advisor r2)."""
    from PIL import Image
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso
    from reverso_tpu.models.pe import PerceptionEncoder

    cfg = default_config()
    enc = PerceptionEncoder(
        dataclasses.replace(MODEL_PRESETS["test-tiny"], dtype="float32"))
    cfg = dataclasses.replace(
        cfg, model=enc.cfg,
        store=dataclasses.replace(cfg.store, root_dir=str(tmp_path / "db")))
    eng = Reverso(cfg, encoder=enc)
    imgs = tmp_path / "imgs"
    os.makedirs(imgs)
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
                        ).save(imgs / f"{i}.jpg")
    eng.create_database(str(imgs), "w", use_direct_pe=True)
    assert eng.warmup() == "warmed: encoder, search"
    stats = eng.searcher.stats()
    assert stats["served"] == 1 and stats["launches"] == 1
    eng.searcher.close()


def test_batcher_over_ivf_index(tmp_path):
    """The serving batcher must work when the engine's index is the IVF
    adapter (engine._get_index returns it once count > clusters*4):
    coalesced concurrent searches through BatchingSearcher must equal
    direct IVFIndex.search — including the k_pad round-up + trim."""
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso
    from reverso_tpu.models.pe import PerceptionEncoder
    from reverso_tpu.store import VectorStore

    cfg = default_config()
    enc = PerceptionEncoder(
        dataclasses.replace(MODEL_PRESETS["test-tiny"], dtype="float32"))
    cfg = dataclasses.replace(
        cfg, model=enc.cfg,
        store=dataclasses.replace(cfg.store, root_dir=str(tmp_path / "db")),
        search=dataclasses.replace(cfg.search, index="ivf",
                                   ivf_clusters=8, ivf_nprobe=8))
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(400, enc.embed_dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    with VectorStore.create(str(tmp_path / "db"), "ivf", enc.embed_dim) as s:
        s.append(emb, [{"region_id": f"r{i}"} for i in range(400)])

    eng = Reverso(cfg, encoder=enc)
    eng.load_database("ivf")
    # direct engine path (same adapter, no batcher)
    want_s, want_i = eng.search_batch(emb[:8], k=5)
    assert (want_i[:, 0] == np.arange(8)).all()

    # concurrent callers through the batcher
    got = [None] * 8
    barrier = threading.Barrier(8)

    def one(i):
        barrier.wait()
        got[i] = eng.searcher.search(emb[i], k=5)

    ts = [threading.Thread(target=one, args=(i,)) for i in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    for i in range(8):
        np.testing.assert_array_equal(got[i][1], want_i[i])
        np.testing.assert_allclose(got[i][0], want_s[i], rtol=1e-6)
    eng.searcher.close()


def test_fetch_error_propagates_to_its_group_only():
    """An error raised while FETCHING a dispatched launch (completion
    pool) must fail that launch's callers and release the in-flight
    slot so later launches still serve."""
    class Poisoned:
        def __array__(self, *a, **kw):
            raise RuntimeError("fetch boom")

    class FetchFail(FakeIndex):
        def __init__(self, db):
            super().__init__(db)
            self.fail_next = True

        def search(self, queries, k):
            if self.fail_next:
                self.fail_next = False
                return Poisoned(), Poisoned()
            return super().search(queries, k)

    idx = FetchFail(_db())
    b = BatchingSearcher(lambda: idx, max_delay_s=0.0, max_inflight=1)
    with pytest.raises(SearchError, match="fetch boom"):
        b.search(np.zeros(16, np.float32), k=3)
    # the pool slot was released: a follow-up search completes
    s, i = b.search(_db()[5], k=3)
    assert i[0] == 5
    b.close()


def test_pipelined_completion_matches_serial():
    """Several back-to-back batches through the async completion path
    return exactly the serial results (order preserved per caller)."""
    db = _db(128, 16)
    idx = FakeIndex(db, delay=0.002)
    b = BatchingSearcher(lambda: idx, max_delay_s=0.0, max_inflight=2)
    results = {}

    def worker(qi):
        s, ids = b.search(db[qi], k=5)
        results[qi] = (s.copy(), ids.copy())

    ts = [threading.Thread(target=worker, args=(qi,)) for qi in range(32)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    b.close()
    assert len(results) == 32
    for qi, (s, ids) in results.items():
        ref = np.argsort(-(db[qi] @ db.T), kind="stable")[:5]
        np.testing.assert_array_equal(ids, ref)
        assert ids[0] == qi
    st = b.stats()
    assert st["served"] == 32 and st["launches"] == idx.launches


def test_ivf_impl_knob_reaches_the_adapter(tmp_path):
    """SearchConfig.ivf_impl / --ivf-impl must flow to IVFIndex.search
    (the operational escape hatch for the probed-scan kernel)."""
    from reverso_tpu.cli import build_parser
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso
    from reverso_tpu.models.pe import PerceptionEncoder
    from reverso_tpu.store import VectorStore

    args = build_parser().parse_args(
        ["--ivf-impl", "xla", "list"])
    assert args.ivf_impl == "xla"

    cfg = default_config()
    enc = PerceptionEncoder(
        dataclasses.replace(MODEL_PRESETS["test-tiny"], dtype="float32"))
    cfg = dataclasses.replace(
        cfg, model=enc.cfg,
        store=dataclasses.replace(cfg.store, root_dir=str(tmp_path / "db")),
        search=dataclasses.replace(cfg.search, index="ivf", ivf_clusters=8,
                                   ivf_nprobe=8, ivf_impl="xla"))
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(200, enc.embed_dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    with VectorStore.create(str(tmp_path / "db"), "x", enc.embed_dim) as s:
        s.append(emb, [{"region_id": f"r{i}"} for i in range(200)])
    eng = Reverso(cfg, encoder=enc)
    eng.load_database("x")
    idx = eng._get_index()
    assert idx.impl == "xla"
    s_, i_ = eng.search_batch(emb[:4], k=5)
    assert (np.asarray(i_)[:, 0] == np.arange(4)).all()


def test_search_rejects_k_below_one():
    b = BatchingSearcher(lambda: FakeIndex(_db()), max_delay_s=0.0)
    with pytest.raises(SearchError, match="k must be >= 1"):
        b.search(np.zeros(16, np.float32), k=0)
    with pytest.raises(SearchError, match="k must be >= 1"):
        b.search(np.zeros(16, np.float32), k=-5)
    b.close()


def test_search_after_close_fails_fast():
    b = BatchingSearcher(lambda: FakeIndex(_db()), max_delay_s=0.0)
    b.close()
    t0 = time.monotonic()
    with pytest.raises(SearchError, match="closed"):
        b.search(np.zeros(16, np.float32), k=3)
    assert time.monotonic() - t0 < 1.0      # no 60 s timeout strand
