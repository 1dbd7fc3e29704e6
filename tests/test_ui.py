"""Web-UI API tests: live HTTP server over a test-tiny engine."""
import base64
import dataclasses
import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest
from PIL import Image

from reverso_tpu.config import MODEL_PRESETS, default_config
from reverso_tpu.detect import StubDetector
from reverso_tpu.engine import Reverso
from reverso_tpu.models.pe import PerceptionEncoder
from reverso_tpu.ui.server import create_server

from test_pipeline import make_corpus


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ui")
    cfg = default_config()
    model = dataclasses.replace(MODEL_PRESETS["test-tiny"], dtype="float32")
    cfg = dataclasses.replace(
        cfg, model=model,
        store=dataclasses.replace(cfg.store, root_dir=str(tmp / "db")))
    engine = Reverso(cfg, encoder=PerceptionEncoder(model),
                     detector=StubDetector())
    srv = create_server(engine, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, tmp
    srv.shutdown()


def get(base, path):
    with urllib.request.urlopen(base + path) as r:
        return json.loads(r.read())


def post(base, path, obj):
    req = urllib.request.Request(
        base + path, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def img_b64(path):
    with open(path, "rb") as f:
        return base64.b64encode(f.read()).decode()


def test_index_and_about(server):
    base, _ = server
    with urllib.request.urlopen(base + "/") as r:
        html = r.read().decode()
    for tab in ("Extract Video Frames", "Create Database", "Search Similar",
                "Database Management", "About"):
        assert tab in html
    about = get(base, "/api/about")
    assert about["name"] == "Reverso-TPU"


def test_full_ui_flow(server, tmp_path):
    base, tmp = server
    files = make_corpus(tmp / "imgs", n=6)

    # build (async) + poll
    code, r = post(base, "/api/build", {
        "folder": str(tmp / "imgs"), "name": "uidb", "direct_pe": True})
    assert code == 200 and r["started"]
    for _ in range(300):
        s = get(base, "/api/build/status")
        if s["state"] in ("done", "error"):
            break
        time.sleep(0.2)
    assert s["state"] == "done", s
    assert "ready for searching" in s["transcript"]

    dbs = get(base, "/api/databases")
    assert "uidb" in dbs["databases"]
    assert dbs["current"] == "uidb"

    # detect + search round trip
    code, det = post(base, "/api/query/detect",
                     {"image": img_b64(files[2]), "prompt": "person"})
    assert code == 200 and det["num_regions"] == 2
    assert det["visualization"]
    code, res = post(base, "/api/query/search",
                     {"threshold": 0.5, "max_results": 5})
    assert code == 200, res
    assert res["results"], res
    assert res["results"][0]["filename"] == "img_002.jpg"
    assert res["results"][0]["image"]    # thumbnail present

    # payload-filtered search: direct-PE rows carry detected_class
    # "full_image"; a matching filter keeps results, a non-matching one
    # yields none, a malformed clause is a 400 (not a 500)
    code, res = post(base, "/api/query/search",
                     {"threshold": 0.5, "max_results": 5,
                      "filter": "detected_class=full_image"})
    assert code == 200 and res["results"], res
    code, res = post(base, "/api/query/search",
                     {"threshold": 0.5, "max_results": 5,
                      "filter": "detected_class=unicorn"})
    assert code == 200 and not res["results"], res
    code, res = post(base, "/api/query/search",
                     {"threshold": 0.5, "max_results": 5,
                      "filter": "not a clause"})
    assert code == 400 and "filter" in res["error"], res

    # direct-PE query path
    code, det2 = post(base, "/api/query/detect",
                      {"image": img_b64(files[0]), "direct_pe": True})
    assert code == 200 and det2["num_regions"] == 1

    # management ops
    code, r = post(base, "/api/db/load", {"name": "uidb"})
    assert "✅" in r["message"]
    code, r = post(base, "/api/db/unlock", {"name": "uidb"})
    assert "ℹ️" in r["message"] or "✅" in r["message"]
    code, r = post(base, "/api/db/load", {"name": "ghost"})
    assert "❌" in r["message"]


def test_error_paths(server):
    base, _ = server
    # undecodable image payload is a CALLER error (binascii.Error is a
    # ValueError): 400, not a 500 with a stack trace in the log
    code, r = post(base, "/api/query/detect", {"image": "!!!notb64"})
    assert code == 400 and "error" in r
    code, r = post(base, "/api/nonexistent", {})
    assert code == 404
    code, r = post(base, "/api/video/local",
                   {"input_folder": "", "output_folder": ""})
    assert code == 200 and r["message"].startswith("❌")


def test_visualize_selection(server, tmp_path):
    base, tmp = server
    files = make_corpus(tmp / "vizimgs", n=1)
    code, det = post(base, "/api/query/detect",
                     {"image": img_b64(files[0]), "prompt": "person"})
    assert code == 200
    code, r = post(base, "/api/query/visualize",
                   {"image": img_b64(files[0]), "region_index": 1})
    assert code == 200 and r["visualization"]


def test_search_text_endpoint(server):
    base, _ = server
    # engine has no text embedder -> graceful message, empty results
    code, r = post(base, "/api/query/search_text", {"text": "a cat"})
    assert code == 200
    assert r["summary"].startswith("❌ No text encoder")
    assert r["results"] == []


def test_session_isolation(server, tmp_path):
    """Two interleaved query sessions must not see each other's state:
    the reference's singleton swap race (SURVEY.md §5.2), fixed with
    per-token server-side query sessions."""
    base, tmp = server
    files = make_corpus(tmp / "sessimgs", n=4)

    # session A detects on img 0; session B then detects on img 1,
    # clobbering the engine singleton; A's token must still search
    # with A's embeddings.
    code, det_a = post(base, "/api/query/detect",
                       {"image": img_b64(files[0]), "direct_pe": True})
    assert code == 200 and det_a["token"]
    code, det_b = post(base, "/api/query/detect",
                       {"image": img_b64(files[1]), "direct_pe": True})
    assert code == 200 and det_b["token"] != det_a["token"]

    code, res_a = post(base, "/api/query/search",
                       {"token": det_a["token"], "threshold": 0.5,
                        "max_results": 3})
    code_b, res_b = post(base, "/api/query/search",
                         {"token": det_b["token"], "threshold": 0.5,
                          "max_results": 3})
    assert code == 200 and code_b == 200
    assert res_a["results"][0]["filename"] == "img_000.jpg", res_a
    assert res_b["results"][0]["filename"] == "img_001.jpg", res_b

    # tokenless search still works off the engine singleton (B's state)
    code, res = post(base, "/api/query/search",
                     {"threshold": 0.5, "max_results": 3})
    assert code == 200 and res["results"][0]["filename"] == "img_001.jpg"

    # visualize with a stale/unknown token falls back gracefully
    code, r = post(base, "/api/query/visualize",
                   {"image": img_b64(files[0]), "token": "nosuch",
                    "region_index": 0})
    assert code == 200 and r["visualization"]


def test_stats_endpoint(server, tmp_path):
    base, tmp = server
    # before any batched search the searcher may be absent: still 200
    stats = get(base, "/api/stats")
    assert "build_running" in stats and "search" in stats
    # drive one token search so the batcher exists and has telemetry
    files = make_corpus(tmp / "stats_imgs", n=4)
    code, r = post(base, "/api/build",
                   {"folder": str(tmp / "stats_imgs"), "name": "statsdb",
                    "direct_pe": True})
    assert code == 200
    for _ in range(100):
        s = get(base, "/api/build/status")
        if s["state"] in ("done", "error"):
            break
        time.sleep(0.2)
    assert s["state"] == "done", s
    code, r = post(base, "/api/query/detect",
                   {"image": img_b64(files[0]), "direct_pe": True})
    assert code == 200
    code, r = post(base, "/api/query/search",
                   {"token": r["token"], "threshold": 0.1, "max_results": 3})
    assert code == 200, r
    stats = get(base, "/api/stats")
    assert stats["search"]["served"] >= 1
    assert stats["search"]["launches"] >= 1
    assert "latency_p50_ms" in stats["search"]


def test_recommend_and_points_endpoints(server, tmp_path):
    base, tmp = server
    files = make_corpus(tmp / "rec_imgs", n=6)
    code, r = post(base, "/api/build",
                   {"folder": str(tmp / "rec_imgs"), "name": "recdb",
                    "direct_pe": True})
    assert code == 200
    for _ in range(100):
        s = get(base, "/api/build/status")
        if s["state"] in ("done", "error"):
            break
        time.sleep(0.2)
    assert s["state"] == "done", s

    # scroll-style paging with a stable next_offset
    code, r = post(base, "/api/points", {"limit": 4})
    assert code == 200, r
    assert [p["id"] for p in r["points"]] == [0, 1, 2, 3]
    assert r["points"][0]["payload"]["detected_class"] == "full_image"
    assert r["next_offset"] == 4
    code, r = post(base, "/api/points", {"offset": 4, "limit": 10})
    assert code == 200 and r["next_offset"] is None
    assert [p["id"] for p in r["points"]] == [4, 5]
    # malformed filter is a 400, not a 500
    code, r = post(base, "/api/points", {"filter": "not a clause"})
    assert code == 400 and "filter" in r["error"], r

    # recommend by stored point id: results carry ids, example excluded
    code, r = post(base, "/api/query/recommend",
                   {"positive": [2], "max_results": 3})
    assert code == 200, r
    assert r["results"], r
    ids = [it["id"] for it in r["results"]]
    assert 2 not in ids and all(isinstance(i, int) for i in ids)
    assert r["results"][0]["image"]            # thumbnails render

    # best_score strategy + filter through the same endpoint
    code, r = post(base, "/api/query/recommend",
                   {"positive": [0], "negative": [5],
                    "strategy": "best_score", "max_results": 3,
                    "filter": "detected_class=full_image"})
    assert code == 200 and r["results"], r

    # caller errors surface as messages, not 500s
    code, r = post(base, "/api/query/recommend", {"positive": []})
    assert code == 200 and r["summary"].startswith("❌"), r
    code, r = post(base, "/api/query/recommend", {"positive": [999]})
    assert code == 200 and "out of range" in r["summary"], r

    # discovery search: target + context pair, examples excluded
    code, r = post(base, "/api/query/discover",
                   {"target": 2, "pairs": [[0, 5]], "max_results": 3})
    assert code == 200, r
    assert r["results"], r
    ids = [it["id"] for it in r["results"]]
    assert not {0, 2, 5} & set(ids)
    # pure context (no target)
    code, r = post(base, "/api/query/discover",
                   {"pairs": [[0, 5]], "max_results": 3})
    assert code == 200 and r["results"], r
    # neither target nor pairs -> message, not 500
    code, r = post(base, "/api/query/discover", {})
    assert code == 200 and r["summary"].startswith("❌"), r

    # facet histogram (qdrant facet API)
    code, r = post(base, "/api/points/facet", {"key": "detected_class"})
    assert code == 200, r
    assert r["facets"] == [{"value": "full_image", "count": 6}]

    # retrieve by id / region_id, unknown ids skipped
    rid = None
    code, r = post(base, "/api/points", {"limit": 1})
    rid = r["points"][0]["payload"]["region_id"]
    code, r = post(base, "/api/points/get", {"ids": [3, rid, 999]})
    assert code == 200, r
    assert [p["id"] for p in r["points"]] == [3, 0]

    # universal query: fusion of two prefetch branches
    code, r = post(base, "/api/query/universal",
                   {"prefetch": [0, {"query": 1, "limit": 3}],
                    "fusion": "rrf", "max_results": 3})
    assert code == 200, r
    assert len(r["hits"]) == 3 and "score" in r["hits"][0]
    # multi-stage rescore; bad shapes are 400s
    code, r = post(base, "/api/query/universal",
                   {"target": 0, "prefetch": [1], "max_results": 2})
    assert code == 200 and r["hits"], r
    code, r = post(base, "/api/query/universal",
                   {"target": 0, "prefetch": [1], "fusion": "rrf"})
    assert code == 400 and "not both" in r["error"], r
    code, r = post(base, "/api/query/universal", {})
    assert code == 400, r
    # random sampling through the universal endpoint
    code, r = post(base, "/api/query/universal",
                   {"target": {"sample": "random"}, "max_results": 3})
    assert code == 200 and len(r["hits"]) == 3, r
    assert all(h["score"] == 0.0 for h in r["hits"])
    # seed reaches the engine: same seed = same draw; bad seed is a 400
    code, r = post(base, "/api/query/universal",
                   {"target": {"sample": "random"}, "max_results": 3,
                    "seed": 9})
    assert code == 200, r
    code, r2 = post(base, "/api/query/universal",
                    {"target": {"sample": "random"}, "max_results": 3,
                     "seed": 9})
    assert code == 200 and r2["hits"] == r["hits"], (r, r2)
    code, r = post(base, "/api/query/universal",
                   {"target": {"sample": "random"}, "seed": 1.5})
    assert code == 400 and "seed" in r["error"], r

    # grouped universal query (qdrant query_points_groups role)
    code, r = post(base, "/api/query/groups",
                   {"target": 0, "group_by": "filename",
                    "group_size": 2, "max_results": 3})
    assert code == 200 and len(r["groups"]) == 3, r
    for g in r["groups"]:
        assert all(h["payload"]["filename"] == g["key"]
                   for h in g["hits"])
    code, r = post(base, "/api/query/groups", {"target": 0})
    assert code == 400 and "group_by" in r["error"], r

    # batched universal queries (qdrant query_batch_points role)
    code, r = post(base, "/api/query/batch",
                   {"requests": [{"query": 0, "k": 2},
                                 {"query": 1, "k": 3}]})
    assert code == 200, r
    assert [len(x) for x in r["results"]] == [2, 3]
    code, r = post(base, "/api/query/batch",
                   {"requests": [{"nope": 1}]})
    assert code == 400, r

    # distance matrix over a seeded sample (qdrant search_matrix)
    code, r = post(base, "/api/query/matrix",
                   {"sample": 6, "limit": 2, "seed": 1})
    assert code == 200 and r["pairs"], r
    assert all(p["id_a"] != p["id_b"] for p in r["pairs"])
    code, r = post(base, "/api/query/matrix",
                   {"sample": 6, "limit": 2, "seed": 1, "offsets": True})
    assert code == 200 and r["ids"] == sorted(r["ids"]), r
    code, r = post(base, "/api/query/matrix", {"sample": 1})
    assert code == 400, r
    # explicit zeros must hit the engine's range validation, not be
    # silently remapped to the defaults by `or`-style coercion
    code, r = post(base, "/api/query/matrix", {"sample": 0})
    assert code == 400, r
    code, r = post(base, "/api/query/matrix", {"sample": 6, "limit": 0})
    assert code == 400, r
    code, r = post(base, "/api/query/matrix", {"sample": 6, "seed": 1.5})
    assert code == 400 and "seed" in r["error"], r

    # ordered scroll with [value, id] tokens (all confidences tie at
    # 1.0, so order falls back to row id and paging must not dup/skip)
    code, r = post(base, "/api/points",
                   {"order_by": "confidence", "limit": 4})
    assert code == 200, r
    assert [p["id"] for p in r["points"]] == [0, 1, 2, 3]
    assert r["next_offset"] == [1.0, 4]
    code, r = post(base, "/api/points",
                   {"order_by": "confidence", "offset": r["next_offset"],
                    "limit": 10})
    assert code == 200 and r["next_offset"] is None
    assert [p["id"] for p in r["points"]] == [4, 5]
    # malformed resume token is a 400, not a 500
    code, r = post(base, "/api/points",
                   {"order_by": "confidence", "offset": 7})
    assert code == 400 and "token" in r["error"], r


def test_search_groups_endpoint(server, tmp_path):
    base, tmp = server
    files = make_corpus(tmp / "grp_imgs", n=6)
    code, r = post(base, "/api/build",
                   {"folder": str(tmp / "grp_imgs"), "name": "grpdb",
                    "direct_pe": True})
    assert code == 200
    for _ in range(100):
        s = get(base, "/api/build/status")
        if s["state"] in ("done", "error"):
            break
        time.sleep(0.2)
    assert s["state"] == "done", s

    # stateless token-free grouped search needs a query first
    img = img_b64(files[0])
    code, r = post(base, "/api/query/detect",
                   {"image": img, "direct_pe": True})
    assert code == 200, r
    token = r.get("token")
    code, r = post(base, "/api/query/search_groups",
                   {"token": token, "threshold": -1.0, "max_results": 3,
                    "group_by": "filename", "group_size": 2})
    assert code == 200, r
    assert r["groups"], r
    keys = [g["key"] for g in r["groups"]]
    assert len(set(keys)) == len(keys) <= 3
    for g in r["groups"]:
        assert 1 <= len(g["results"]) <= 2
        assert all(it["filename"] == g["key"] for it in g["results"])
    # missing payload key -> message, not 500
    code, r = post(base, "/api/query/search_groups",
                   {"token": token, "group_by": "nope"})
    assert code == 200 and r["summary"].startswith("❌"), r


def test_hybrid_spaces_through_universal_endpoint(server, tmp_path):
    """Sparse / multivector spaces and hybrid fusion ride the SAME
    /api/query/universal endpoint the dense universal query uses —
    operands are plain JSON ({"indices","values"} dicts, [Tq, d]
    matrices) and `using` selects the space, qdrant-style."""
    import numpy as np

    from reverso_tpu.store import VectorStore

    base, tmp = server
    rng = np.random.default_rng(11)
    n, d = 10, 16
    dense = rng.normal(size=(n, d)).astype(np.float32)
    dense /= np.linalg.norm(dense, axis=1, keepdims=True)
    sp = [{"indices": [i, 100 + i], "values": [1.0, 0.5]}
          for i in range(n)]
    mv = [(rng.normal(size=(2, 8)) /
           np.linalg.norm(rng.normal(size=(2, 8)), axis=1,
                          keepdims=True)).astype(np.float32)
          for _ in range(n)]
    with VectorStore.create(str(tmp / "db"), "hybui", d,
                            sparse={"txt": {}}, multi={"tok": 8}) as s:
        s.append(dense, [{"region_id": f"r{i}"} for i in range(n)],
                 {"txt": sp}, {"tok": mv})
    code, r = post(base, "/api/db/load", {"name": "hybui"})
    assert code == 200, r

    # sparse plain search through the universal endpoint
    code, r = post(base, "/api/query/universal",
                   {"target": {"indices": [3], "values": [2.0]},
                    "using": "txt", "max_results": 2})
    assert code == 200, r
    assert [h["id"] for h in r["hits"]] == [3]
    assert abs(r["hits"][0]["score"] - 2.0) < 1e-6

    # multivector [Tq, d] operand
    q = mv[5].tolist()
    code, r = post(base, "/api/query/universal",
                   {"target": q, "using": "tok", "max_results": 3})
    assert code == 200, r
    assert r["hits"] and r["hits"][0]["id"] == 5

    # hybrid: sparse branch + dense branch fused by RRF
    code, r = post(base, "/api/query/universal",
                   {"prefetch": [
                       {"query": {"indices": [3], "values": [1.0]},
                        "using": "txt", "limit": 5},
                       {"query": dense[3].tolist(), "limit": 5}],
                    "fusion": "rrf", "max_results": 3})
    assert code == 200, r
    assert r["hits"][0]["id"] == 3           # rank 1 in both branches

    # malformed sparse operand is a 400, not a 500
    code, r = post(base, "/api/query/universal",
                   {"target": {"indices": [1, 1], "values": [1.0, 2.0]},
                    "using": "txt"})
    assert code == 400 and "duplicate" in r["error"], r

    # formula rescoring rides the same endpoint (qdrant score boosting)
    code, r = post(base, "/api/query/universal",
                   {"target": {"formula": {"sum": ["$score", 1.0]}},
                    "prefetch": [{"query": dense[3].tolist(),
                                  "limit": 5}],
                    "max_results": 3})
    assert code == 200, r
    assert r["hits"][0]["id"] == 3
    # cos(3,3) + 1.0 — the branch scanned in bf16, so ~2 within rounding
    assert abs(r["hits"][0]["score"] - 2.0) < 5e-3
    # malformed formula is a 400
    code, r = post(base, "/api/query/universal",
                   {"target": {"formula": {"sum": []}},
                    "prefetch": [{"query": dense[3].tolist()}]})
    assert code == 400, r
