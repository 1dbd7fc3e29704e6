"""Regression tests for the round-1 advisor findings: crash-recovery must
never destroy data, locks must protect the destructive create, text search
must not inherit the image-image threshold, and the device index must
detect same-count store mutations."""
import dataclasses
import os
import subprocess
import sys

import numpy as np
import pytest

from reverso_tpu.config import MODEL_PRESETS, default_config
from reverso_tpu.detect import StubDetector
from reverso_tpu.engine import Reverso
from reverso_tpu.models.pe import PerceptionEncoder
from reverso_tpu.ingest.pipeline import checkpoint_path
from reverso_tpu.store import StoreLockedError, VectorStore
from reverso_tpu.store.persist import lock_holder_alive

sys.path.insert(0, os.path.dirname(__file__))
from test_pipeline import make_corpus  # noqa: E402


@pytest.fixture(scope="module")
def encoder():
    cfg = dataclasses.replace(MODEL_PRESETS["test-tiny"], dtype="float32")
    return PerceptionEncoder(cfg)


@pytest.fixture()
def engine(tmp_path, encoder):
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        model=encoder.cfg,
        store=dataclasses.replace(cfg.store, root_dir=str(tmp_path / "db")),
    )
    return Reverso(cfg, encoder=encoder, detector=StubDetector())


def _dead_pid() -> int:
    proc = subprocess.Popen(["sleep", "0"])
    proc.wait()
    return proc.pid


def _interrupted_build(engine, tmp_path, name="crashdb", n=12):
    """Build partially, then stop — leaves a checkpoint behind."""
    files = make_corpus(tmp_path / "imgs", n=n)
    calls = {"n": 0}

    def cb(msg, p):
        calls["n"] += 1
        if "Processing batch" in msg and calls["n"] > 3:
            engine.request_stop()

    cfg = engine.config
    engine.config = dataclasses.replace(
        cfg, ingest=dataclasses.replace(cfg.ingest, batch_size=2,
                                        checkpoint_every=2))
    t = engine.create_database(str(tmp_path / "imgs"), name,
                               use_direct_pe=True, progress_callback=cb)
    assert "stopped" in t
    assert os.path.exists(checkpoint_path(engine.db_root, name))
    return files


def test_resume_takes_over_stale_lock(engine, tmp_path):
    """A crashed build leaves .lock behind; resume must take it over and
    keep the embedded rows — NOT wipe the store (round-1 high finding)."""
    files = _interrupted_build(engine, tmp_path)
    rows_before = VectorStore.open(engine.db_root, "crashdb").count
    assert rows_before > 0
    # simulate the crash: lock file owned by a dead process
    lock = os.path.join(engine.db_root, "crashdb", ".lock")
    with open(lock, "w") as f:
        f.write(str(_dead_pid()))
    assert lock_holder_alive(engine.db_root, "crashdb") is False

    t = engine.create_database(str(tmp_path / "imgs"), "crashdb",
                               use_direct_pe=True,
                               resume_from_checkpoint=True)
    assert "Removed stale lock" in t
    assert "Resuming from checkpoint" in t
    store = VectorStore.open(engine.db_root, "crashdb")
    assert store.count == len(files)


def test_resume_aborts_on_live_lock_without_wiping(engine, tmp_path):
    """A lock held by a LIVE process aborts the resume; rows survive."""
    _interrupted_build(engine, tmp_path, name="livedb")
    rows_before = VectorStore.open(engine.db_root, "livedb").count
    lock = os.path.join(engine.db_root, "livedb", ".lock")
    with open(lock, "w") as f:
        f.write(str(os.getpid()))          # this test process: alive

    t = engine.create_database(str(tmp_path / "imgs"), "livedb",
                               use_direct_pe=True,
                               resume_from_checkpoint=True)
    assert "locked by a running process" in t
    os.remove(lock)
    assert VectorStore.open(engine.db_root, "livedb").count == rows_before


def test_build_refuses_locked_overwrite(engine, tmp_path):
    """A fresh (non-resume) build must not rmtree a locked live store."""
    make_corpus(tmp_path / "imgs", n=3)
    engine.create_database(str(tmp_path / "imgs"), "lockdb",
                           use_direct_pe=True)
    lock = os.path.join(engine.db_root, "lockdb", ".lock")
    with open(lock, "w") as f:
        f.write(str(os.getpid()))
    rows = VectorStore.open(engine.db_root, "lockdb").count

    t = engine.create_database(str(tmp_path / "imgs"), "lockdb",
                               use_direct_pe=True)
    assert "locked" in t
    os.remove(lock)
    assert VectorStore.open(engine.db_root, "lockdb").count == rows


def test_create_overwrite_refuses_locked(tmp_path):
    root = str(tmp_path)
    live = VectorStore.create(root, "db", 8)
    live.append(np.eye(8, dtype=np.float32)[:3], [{}, {}, {}])
    try:
        with pytest.raises(StoreLockedError):
            VectorStore.create(root, "db", 8, overwrite=True)
        assert live.count == 3
    finally:
        live.close()


def test_refresh_and_data_version(tmp_path):
    root = str(tmp_path)
    w = VectorStore.create(root, "db", 4)
    w.append(np.eye(4, dtype=np.float32), [{}] * 4)
    w.flush()
    r = VectorStore.open(root, "db")
    assert r.count == 4
    v0 = r.data_version
    # same-count mutation: truncate then reappend different rows
    w.truncate(0)
    w.append(-np.eye(4, dtype=np.float32), [{}] * 4)
    w.flush()
    r.refresh()
    assert r.count == 4 and r.data_version != v0
    np.testing.assert_allclose(np.asarray(r.vectors()),
                               -np.eye(4, dtype=np.float32))
    w.close()


def test_engine_index_detects_same_count_mutation(engine, tmp_path):
    """_get_index keyed on (count, data_version): a truncate-then-
    reappend to the same size must not serve stale device vectors."""
    d = engine.encoder.embed_dim
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((6, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    s = VectorStore.create(engine.db_root, "mut", d)
    s.append(vecs, [{"filename": f"a{i}.jpg", "bbox": [0, 0, 1, 1]}
                    for i in range(6)])
    s.flush()

    engine.load_database("mut")
    engine.region_embeddings = vecs[:1]
    engine.region_metadata_list = [{}]
    _, items = engine.search_similar(similarity_threshold=0.99,
                                     max_results=1)
    assert items and items[0]["filename"] == "a0.jpg"

    # same-count mutation through the still-open writable handle
    s.truncate(0)
    new = np.roll(vecs, 1, axis=0)
    s.append(new, [{"filename": f"b{i}.jpg", "bbox": [0, 0, 1, 1]}
                   for i in range(6)])
    s.flush()
    s.close()

    _, items = engine.search_similar(similarity_threshold=0.99,
                                     max_results=1)
    assert items and items[0]["filename"] == "b1.jpg", items


def test_text_search_default_threshold(tmp_path, encoder):
    """search_by_text must not inherit the 0.7 image-image default:
    text-image cosines peak ~0.2-0.35, so the text default (0.18) has to
    let a 0.3-scoring hit through."""
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=encoder.cfg,
        store=dataclasses.replace(cfg.store, root_dir=str(tmp_path / "db")))
    d = encoder.embed_dim

    q = np.zeros(d, np.float32)
    q[0] = 1.0
    hit = np.zeros(d, np.float32)
    hit[0], hit[1] = 0.3, np.sqrt(1 - 0.09)   # cos(q, hit) = 0.3

    class FakeTextEmbedder:
        def embed(self, text):
            return q[None]

    engine = Reverso(cfg, encoder=encoder,
                     text_embedder=FakeTextEmbedder())
    s = VectorStore.create(str(tmp_path / "db"), "txt", d)
    s.append(hit[None], [{"filename": "hit.jpg", "bbox": [0, 0, 1, 1]}])
    s.close()
    engine.load_database("txt")

    text, items = engine.search_by_text("anything")
    assert items and items[0]["filename"] == "hit.jpg", text
    # image-image search keeps the strict 0.7 default
    engine.region_embeddings = q[None]
    engine.region_metadata_list = [{}]
    text, items = engine.search_similar()
    assert "No similar regions found above threshold 0.7" in text
