"""End-to-end integration tests: folder -> build -> search (SURVEY.md §4
item 5: tiny-image-folder golden tests with the stub detector, no model
weights needed)."""
import dataclasses
import os
import threading

import numpy as np
import pytest
from PIL import Image

from reverso_tpu.config import MODEL_PRESETS, default_config
from reverso_tpu.detect import StubDetector, parse_prompts
from reverso_tpu.engine import Reverso
from reverso_tpu.models.pe import PerceptionEncoder
from reverso_tpu.ingest.pipeline import checkpoint_path


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


def make_corpus(path, n=8, size=48, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(path, exist_ok=True)
    files = []
    for i in range(n):
        arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        p = os.path.join(path, f"img_{i:03d}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        files.append(p)
    return files


def test_prompt_parsing():
    assert parse_prompts("person . car .building") == ["person", "car", "building"]
    assert parse_prompts("  ") == ["object"]
    assert parse_prompts(None) == ["object"]


def test_build_and_search_direct_pe(engine, tmp_path):
    files = make_corpus(tmp_path / "imgs")
    transcript = engine.create_database(str(tmp_path / "imgs"), "direct",
                                        use_direct_pe=True)
    assert "ready for searching" in transcript
    assert engine.current_database == "direct"

    # query with one of the corpus images -> should match itself first
    engine.process_image_direct_pe(files[3])
    text, items = engine.search_similar(similarity_threshold=0.5, max_results=5)
    assert items, text
    assert items[0]["filename"] == "img_003.jpg"
    assert items[0]["score"] > 0.98
    assert items[0]["payload"]["detected_class"] == "full_image"
    assert items[0]["payload"]["confidence"] == 1.0


def test_build_region_mode(engine, tmp_path):
    make_corpus(tmp_path / "imgs", n=4)
    transcript = engine.create_database(str(tmp_path / "imgs"), "regions",
                                        text_prompt="person . car")
    assert "ready for searching" in transcript
    n = engine.detect_regions(str(tmp_path / "imgs" / "img_000.jpg"),
                              "person . car")
    assert n == 4   # stub: 2 boxes per prompt
    embs, metas = engine.extract_embeddings(
        str(tmp_path / "imgs" / "img_000.jpg"))
    assert len(embs) == 4
    assert metas[0]["detected_class"] == "person"
    assert metas[0]["mask_status"] == "processed"
    assert len(metas[0]["bbox"]) == 4
    text, items = engine.search_similar(similarity_threshold=0.5)
    assert items
    # payload schema parity (reference core_system.py:382-418,568-574)
    payload = items[0]["payload"]
    for key in ("region_id", "original_region_id", "bbox", "area_ratio",
                "detection_index", "confidence", "detected_class",
                "mask_status", "image_source", "filename"):
        assert key in payload, key


def test_ingest_detects_at_original_resolution(engine, tmp_path):
    """Ingest-time detection must run on the ORIGINAL image and store
    bboxes in original pixel space, agreeing exactly with the query path
    (round-1 verdict #3: it used to detect on the 336-px squashed PE
    input, putting bboxes in 336-space)."""
    # non-square, larger than the model input: squashing would show
    rng = np.random.default_rng(7)
    os.makedirs(tmp_path / "imgs")
    arr = rng.integers(0, 256, (120, 200, 3), dtype=np.uint8)   # H=120, W=200
    path = str(tmp_path / "imgs" / "wide.jpg")
    Image.fromarray(arr).save(path, quality=95)

    engine.create_database(str(tmp_path / "imgs"), "origres",
                           text_prompt="person . car")
    from reverso_tpu.store import VectorStore
    store = VectorStore.open(engine.db_root, "origres")
    ingest_payloads = store.payloads()
    assert ingest_payloads

    engine.detect_regions(path, "person . car")
    _, query_metas = engine.extract_embeddings(path)
    assert len(query_metas) == len(ingest_payloads)
    for qm, ip in zip(query_metas, ingest_payloads):
        assert ip["bbox"] == qm["bbox"], (ip["bbox"], qm["bbox"])
        assert ip["area_ratio"] == pytest.approx(qm["area_ratio"])
    # bboxes genuinely live in original pixel space, not 336-space
    xs = [c for p in ingest_payloads for c in (p["bbox"][0], p["bbox"][2])]
    ys = [c for p in ingest_payloads for c in (p["bbox"][1], p["bbox"][3])]
    assert max(xs) > 120    # stub tiles boxes across the 200-px width
    assert max(xs) <= 200 and max(ys) <= 120


def test_search_without_query(engine):
    text, items = engine.search_similar()
    assert text.startswith("❌ No query embeddings")


def test_search_without_db(engine, tmp_path):
    make_corpus(tmp_path / "imgs", n=1)
    engine.process_image_direct_pe(str(tmp_path / "imgs" / "img_000.jpg"))
    text, items = engine.search_similar()
    assert text.startswith("❌ No database loaded")


def test_db_management_messages(engine):
    assert engine.load_database("") == "❌ Please provide a database name"
    assert engine.load_database("nope") == "❌ Database not found: nope"
    assert engine.delete_database("nope") == "❌ Database not found: nope"
    assert engine.unlock_database("nope") == "❌ Database not found: nope"


def test_resume_after_stop(engine, tmp_path, encoder):
    """Checkpoint/resume actually works (the reference's was broken,
    SURVEY.md §5.4)."""
    files = make_corpus(tmp_path / "imgs", n=12)
    cfg = engine.config
    small = dataclasses.replace(
        cfg, ingest=dataclasses.replace(cfg.ingest, batch_size=2,
                                        checkpoint_every=2))
    engine.config = small

    calls = {"n": 0}

    def cb(msg, p):
        calls["n"] += 1
        if "Processing batch" in msg and calls["n"] > 4:
            engine.request_stop()

    transcript = engine.create_database(str(tmp_path / "imgs"), "resumable",
                                        use_direct_pe=True,
                                        progress_callback=cb)
    assert "Processing stopped" in transcript
    assert os.path.exists(checkpoint_path(engine.db_root, "resumable"))

    transcript2 = engine.create_database(str(tmp_path / "imgs"), "resumable",
                                         use_direct_pe=True,
                                         resume_from_checkpoint=True)
    assert "Resuming from checkpoint" in transcript2
    assert "ready for searching" in transcript2
    assert not os.path.exists(checkpoint_path(engine.db_root, "resumable"))

    # all 12 images indexed exactly once
    from reverso_tpu.store import VectorStore
    store = VectorStore.open(engine.db_root, "resumable")
    assert store.count == 12
    names = sorted(p["filename"] for p in store.payloads())
    assert names == sorted(os.path.basename(f) for f in files)


def test_corrupt_image_fault_tolerance(engine, tmp_path):
    make_corpus(tmp_path / "imgs", n=3)
    with open(tmp_path / "imgs" / "broken.jpg", "wb") as f:
        f.write(b"not a jpeg")
    transcript = engine.create_database(str(tmp_path / "imgs"), "faulty",
                                        use_direct_pe=True)
    assert "❌ Error processing broken.jpg" in transcript
    assert "ready for searching" in transcript
    from reverso_tpu.store import VectorStore
    assert VectorStore.open(engine.db_root, "faulty").count == 3


def test_visualize(engine, tmp_path):
    make_corpus(tmp_path / "imgs", n=1)
    path = str(tmp_path / "imgs" / "img_000.jpg")
    engine.detect_regions(path, "thing")
    img = engine.visualize_detections(path, selected_region_index=0)
    assert img.size == (48, 48)


def test_cli_end_to_end(tmp_path, monkeypatch):
    from reverso_tpu import cli
    imgs = tmp_path / "imgs"
    make_corpus(imgs, n=5)
    root = str(tmp_path / "db")
    base = ["--model", "test-tiny", "--db-root", root]
    assert cli.main(base + ["build", str(imgs), "--name", "clidb",
                            "--direct-pe"]) == 0
    assert cli.main(base + ["list"]) == 0
    rc = cli.main(base + ["search", str(imgs / "img_001.jpg"),
                          "--name", "clidb", "--json", "--threshold", "0.5"])
    assert rc == 0
    assert cli.main(base + ["delete", "clidb"]) == 0
    assert cli.main(base + ["delete", "clidb"]) == 1


def test_compat_shim(tmp_path, encoder):
    """Reference-style code runs unchanged against the compat facade."""
    import dataclasses
    from reverso_tpu.compat import SimpleReverso
    from reverso_tpu.config import default_config
    from reverso_tpu.detect import StubDetector

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=encoder.cfg,
        store=dataclasses.replace(cfg.store, root_dir=str(tmp_path / "db")))
    reverso = SimpleReverso(cfg, encoder=encoder, detector=StubDetector())
    files = make_corpus(tmp_path / "imgs", n=5)

    status = reverso.create_database(str(tmp_path / "imgs"), "compat_db",
                                     use_direct_pe=True)
    assert "ready for searching" in status
    assert "compat_db" in reverso.list_databases()
    embs, metas = reverso.process_image_direct_pe(files[1])
    assert len(embs) == 1 and metas[0]["detected_class"] == "full_image"
    text, items = reverso.search_similar(similarity_threshold=0.5,
                                         max_results=3)
    assert items[0]["filename"] == "img_001.jpg"
    n = reverso.detect_regions(files[0], "person . car")
    assert n == 4
    assert len(reverso.detected_regions) == 4
    img = reverso.visualize_detections(files[0], selected_region_index=1)
    assert img.size == (48, 48)
    assert reverso.load_database("compat_db").startswith("✅")
    assert reverso.delete_database("compat_db").startswith("✅")


@pytest.mark.slow
def test_cli_train(tmp_path):
    from reverso_tpu import cli
    imgs = tmp_path / "imgs"
    make_corpus(imgs, n=8, size=32)
    ckpt = str(tmp_path / "ckpt")
    rc = cli.main(["--model", "test-tiny", "train", str(imgs),
                   "--steps", "3", "--batch-size", "4",
                   "--checkpoint", ckpt])
    assert rc == 0
    rc = cli.main(["--model", "test-tiny", "train", str(imgs),
                   "--steps", "2", "--batch-size", "4",
                   "--checkpoint", ckpt, "--resume"])
    assert rc == 0


def test_cli_trace_dir(tmp_path, monkeypatch):
    """--trace-dir captures a loadable jax.profiler trace of the command
    (SURVEY §5.1; round-1 verdict #8)."""
    import glob

    from reverso_tpu import cli

    make_corpus(tmp_path / "imgs", n=3)
    trace_dir = str(tmp_path / "trace")
    rc = cli.main(["--db-root", str(tmp_path / "db"), "--model", "test-tiny",
                   "--trace-dir", trace_dir,
                   "build", str(tmp_path / "imgs"), "--name", "t",
                   "--direct-pe"])
    assert rc == 0
    traces = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                       recursive=True) + glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    assert traces, os.listdir(trace_dir)


def test_region_build_int8_index_batched_search(tmp_path):
    """Cross-feature: region-mode build -> int8 device index -> searches
    through the micro-batching front-end, all consistent with the
    direct index path."""
    import dataclasses
    import threading
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.detect import StubDetector
    from reverso_tpu.engine import Reverso
    from reverso_tpu.models.pe import PerceptionEncoder
    from reverso_tpu.store import VectorStore

    model = dataclasses.replace(MODEL_PRESETS["test-tiny"], dtype="float32")
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=model,
        store=dataclasses.replace(cfg.store, root_dir=str(tmp_path / "db"),
                                  dtype="int8"))
    eng = Reverso(cfg, encoder=PerceptionEncoder(model),
                  detector=StubDetector())
    files = make_corpus(tmp_path / "imgs", n=5)
    eng.create_database(str(tmp_path / "imgs"), "xint8",
                        text_prompt="person . car")
    store = VectorStore.open(str(tmp_path / "db"), "xint8")
    assert store.count >= 5   # stub yields >= 1 region per image

    vecs = np.asarray(store.vectors())
    import jax.numpy as jnp
    idx = eng._get_index()
    assert idx.matrix.dtype == jnp.int8     # config flowed through
    direct_s, direct_i = eng.search_batch(vecs[:3], k=4)
    out = {}

    def worker(i):
        out[i] = eng.searcher.search(vecs[i], k=4)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    eng.searcher.close()
    for i in range(3):
        np.testing.assert_array_equal(out[i][1], direct_i[i])
        np.testing.assert_allclose(out[i][0], direct_s[i], atol=1e-6)


def test_resume_without_checkpoint_refuses_rebuild(engine, tmp_path):
    """A completed build removes its checkpoint; a habitual re-run with
    resume_from_checkpoint=True must NOT fall through to the
    destructive create(overwrite=True) and wipe the finished DB."""
    make_corpus(tmp_path / "imgs", n=4)
    t1 = engine.create_database(str(tmp_path / "imgs"), "done",
                                use_direct_pe=True)
    assert "ready for searching" in t1
    from reverso_tpu.store import VectorStore
    count = VectorStore.open(engine.db_root, "done").count
    assert count > 0
    t2 = engine.create_database(str(tmp_path / "imgs"), "done",
                                use_direct_pe=True,
                                resume_from_checkpoint=True)
    assert "Nothing to resume" in t2
    # the store was left untouched
    assert VectorStore.open(engine.db_root, "done").count == count
    # a fresh name still builds fine under resume (no store to protect)
    t3 = engine.create_database(str(tmp_path / "imgs"), "fresh",
                                use_direct_pe=True,
                                resume_from_checkpoint=True)
    assert "ready for searching" in t3


def test_search_explicit_none_embeddings_never_falls_back(engine, tmp_path):
    """A UI session whose detect produced 0 regions passes
    embeddings=None; that must error, not silently answer with the
    engine singleton's (i.e. another session's) query state."""
    make_corpus(tmp_path / "imgs", n=2)
    engine.create_database(str(tmp_path / "imgs"), "iso",
                           use_direct_pe=True)
    # engine state holds a valid query (another "session")
    engine.process_image_direct_pe(str(tmp_path / "imgs" / "img_000.jpg"))
    assert engine.region_embeddings is not None
    text, items = engine.search_similar(embeddings=None)
    assert text.startswith("❌ No query embeddings") and items == []
    # omitting the argument keeps the engine-singleton behavior
    text2, items2 = engine.search_similar(similarity_threshold=-1.0)
    assert not text2.startswith("❌ No query embeddings")


def test_build_embeds_at_one_batch_shape(engine, tmp_path, encoder):
    """Tail batches and failure-shrunk batches must pad to the fixed
    batch size: every distinct embed shape is a fresh (remote,
    30-180 s) jit compile."""
    files = make_corpus(tmp_path / "imgs", n=10)
    # one unreadable file mid-corpus shrinks its batch
    with open(os.path.join(tmp_path / "imgs", "img_003.jpg"), "wb") as f:
        f.write(b"not a jpeg")
    shapes = []
    real = encoder.encode_image

    def recording(images, **kw):
        shapes.append(np.asarray(images).shape)
        return real(images, **kw)

    cfg = engine.config
    engine.config = dataclasses.replace(
        cfg, ingest=dataclasses.replace(cfg.ingest, batch_size=4))
    try:
        encoder.encode_image = recording
        t = engine.create_database(str(tmp_path / "imgs"), "shapes",
                                   use_direct_pe=True)
    finally:
        encoder.encode_image = real
        engine.config = cfg
    assert "ready for searching" in t
    # 9 good files in batches of 4 -> 4, 3(+1 failed), 2 — all padded to 4
    assert shapes and all(s[0] == 4 for s in shapes), shapes


def test_cli_tune(tmp_path, capsys):
    """`reverso tune` sweeps nprobe on a store's own vectors, reports a
    recall table, and recommends the smallest nprobe meeting the
    target — warming the same k-means cache serving reloads."""
    import json as _json
    import numpy as np
    from reverso_tpu import cli
    from reverso_tpu.store import VectorStore

    root = str(tmp_path / "db")
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((16, 32)).astype(np.float32)
    rows = centers[rng.integers(0, 16, 2000)] + \
        0.1 * rng.standard_normal((2000, 32)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    os.makedirs(root, exist_ok=True)
    with VectorStore.create(root, "tunedb", 32) as s:
        s.append(rows, [{"region_id": f"r{i}"} for i in range(2000)])

    rc = cli.main(["--db-root", root, "--index", "ivf", "tune",
                   "--name", "tunedb", "--target-recall", "0.9",
                   "--queries", "64", "--k", "5"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["recommended_nprobe"] >= 1
    assert out["sweep"][-1]["recall"] >= 0.9 or \
        out["recommended_nprobe"] == out["clusters"]
    # 2000 rows <= 4x default clusters: serving would take the exact
    # scan for this config, and tune must say so
    assert "EXACT" in out.get("note", "")
    # recall is non-decreasing along the pow2 ladder (sanity)
    recalls = [r["recall"] for r in out["sweep"]]
    assert all(b >= a - 0.02 for a, b in zip(recalls, recalls[1:]))
    # the tune run persisted the k-means cache serving will reload
    assert any(f.startswith("ivf_")
               for f in os.listdir(os.path.join(root, "tunedb", "index")))
