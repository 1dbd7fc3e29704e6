"""Edge-case robustness tests across subsystems."""
import dataclasses
import json
import threading
import time

import numpy as np
import pytest

from reverso_tpu.config import MODEL_PRESETS, default_config
from reverso_tpu.detect import StubDetector, parse_prompts
from reverso_tpu.engine import Reverso
from reverso_tpu.models.pe import PerceptionEncoder
from reverso_tpu.store import VectorStore

from test_pipeline import make_corpus
from test_topk import random_unit


@pytest.fixture(scope="module")
def encoder():
    cfg = dataclasses.replace(MODEL_PRESETS["test-tiny"], dtype="float32")
    return PerceptionEncoder(cfg)


def make_engine(tmp_path, encoder, **search_kw):
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=encoder.cfg,
        store=dataclasses.replace(cfg.store, root_dir=str(tmp_path / "db")))
    if search_kw:
        cfg = dataclasses.replace(
            cfg, search=dataclasses.replace(cfg.search, **search_kw))
    return Reverso(cfg, encoder=encoder, detector=StubDetector())


def test_unicode_and_weird_payloads(tmp_path, rng):
    with VectorStore.create(str(tmp_path), "u", 8) as s:
        payloads = [
            {"region_id": "r0", "filename": "фото_01.jpg", "note": "café ☕"},
            {"region_id": "r1", "filename": "图片.png",
             "nested": {"a": [1, 2, {"b": None}]}},
            {"region_id": "r2", "filename": 'quo"te\n.jpg'},
        ]
        s.append(random_unit(rng, 3, 8), payloads)
    s2 = VectorStore.open(str(tmp_path), "u")
    got = s2.payloads([0, 1, 2])
    assert got[0]["note"] == "café ☕"
    assert got[1]["nested"]["a"][2]["b"] is None
    assert got[2]["filename"] == 'quo"te\n.jpg'   # json escaping keeps lines intact


def test_prompt_edge_cases():
    assert parse_prompts("...") == ["object"]
    assert parse_prompts("a" * 500) == ["a" * 500]
    assert parse_prompts("one . . two") == ["one", "two"]


def test_build_same_name_twice_overwrites(tmp_path, encoder):
    engine = make_engine(tmp_path, encoder)
    make_corpus(tmp_path / "a", n=3)
    make_corpus(tmp_path / "b", n=5, seed=9)
    engine.create_database(str(tmp_path / "a"), "dup", use_direct_pe=True)
    engine.create_database(str(tmp_path / "b"), "dup", use_direct_pe=True)
    store = VectorStore.open(engine.db_root, "dup")
    assert store.count == 5   # fresh build replaced the old rows


def test_search_k_larger_than_corpus(tmp_path, encoder):
    engine = make_engine(tmp_path, encoder)
    files = make_corpus(tmp_path / "imgs", n=3)
    engine.create_database(str(tmp_path / "imgs"), "small", use_direct_pe=True)
    engine.process_image_direct_pe(files[0])
    text, items = engine.search_similar(similarity_threshold=-1.0,
                                        max_results=50)
    assert len(items) == 3    # only valid hits, no -1 leakage


def test_concurrent_searches_are_consistent(tmp_path, encoder):
    """The reference corrupted shared query state across sessions
    (SURVEY.md §5.2); engine queries must stay self-consistent when
    driven from threads (each thread sets then searches under the GIL;
    the UI layer serializes fully, this is the raw-engine smoke)."""
    engine = make_engine(tmp_path, encoder)
    files = make_corpus(tmp_path / "imgs", n=6)
    engine.create_database(str(tmp_path / "imgs"), "conc", use_direct_pe=True)
    lock = threading.Lock()
    failures = []

    def worker(i):
        for _ in range(3):
            with lock:    # the supported concurrency model: serialize
                engine.process_image_direct_pe(files[i])
                text, items = engine.search_similar(similarity_threshold=0.5)
                if not items or items[0]["filename"] != f"img_{i:03d}.jpg":
                    failures.append((i, text))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not failures, failures


def test_stop_before_start_is_cleared(tmp_path, encoder):
    engine = make_engine(tmp_path, encoder)
    make_corpus(tmp_path / "imgs", n=3)
    engine.request_stop()   # stale stop from a previous cancelled run
    transcript = engine.create_database(str(tmp_path / "imgs"), "stale",
                                        use_direct_pe=True)
    assert "ready for searching" in transcript   # stale flag was cleared


def test_cli_rejects_unknown_model():
    from reverso_tpu import cli
    with pytest.raises(SystemExit):
        cli.main(["--model", "nonexistent", "list"])
