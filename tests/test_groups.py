"""Grouped search (qdrant's search_groups API role over the reference's
store, core_system.py:659-664) and the filtered point count (qdrant's
count API role): exactness vs a host brute-force group-by, the scan-
deepening loop, missing-key/threshold/filter semantics, and the CLI
surfaces (`search --group-by`, `info --filter`).
"""
import dataclasses
import json

import numpy as np
import pytest

from reverso_tpu.store import VectorStore

from test_topk import random_unit


def brute_groups(vecs, q, key_col, thr, n_groups, group_size, mask=None):
    """Host fp32 group-by over the full scan — the exactness truth."""
    s = (vecs @ q).astype(np.float32)
    order = np.lexsort((np.arange(len(s)), -s))
    sel = {}
    for i in order:
        i = int(i)
        if s[i] < thr:
            break
        if mask is not None and not mask[i]:
            continue
        kv = key_col[i]
        if kv is None:
            continue
        hits = sel.get(kv)
        if hits is None:
            if len(sel) >= n_groups:
                continue
            sel[kv] = [i]
        elif len(hits) < group_size:
            hits.append(i)
    return sel


@pytest.fixture(scope="module")
def engine_store(tmp_path_factory):
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso

    tmp = tmp_path_factory.mktemp("groups")
    rng = np.random.default_rng(7)
    d = 64
    n = 240
    vecs = random_unit(rng, n, d)
    # 3 regions per image -> 80 images; every 4th row carries a "tag"
    payloads = []
    for i in range(n):
        p = {"filename": f"img{i // 3}.jpg", "region_id": f"r{i}",
             "detected_class": "person" if i % 2 == 0 else "car",
             "confidence": (i % 10) / 10}
        if i % 4 == 0:
            p["tag"] = f"t{i % 8}"
        payloads.append(p)
    with VectorStore.create(str(tmp / "db"), "grp", d) as s:
        s.append(vecs, payloads)

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(MODEL_PRESETS["test-tiny"], dtype="float32"),
        store=dataclasses.replace(cfg.store, root_dir=str(tmp / "db"),
                                  dtype="float32"))
    engine = Reverso(cfg)
    engine.load_database("grp")
    return engine, vecs, payloads


def keys_of(payloads, key):
    return [p.get(key) for p in payloads]


def test_count(engine_store):
    engine, vecs, payloads = engine_store
    assert engine.count() == len(vecs)
    persons = sum(p["detected_class"] == "person" for p in payloads)
    assert engine.count({"detected_class": "person"}) == persons
    assert engine.count("confidence>=0.5") == sum(
        p["confidence"] >= 0.5 for p in payloads)
    assert engine.count([]) == len(vecs)          # empty filter = all


def test_groups_match_brute_force(engine_store):
    engine, vecs, payloads = engine_store
    q = vecs[17]
    text, groups = engine.search_groups(
        0.0, 4, group_by="filename", group_size=2, embeddings=q[None])
    want = brute_groups(vecs, q, keys_of(payloads, "filename"), 0.0, 4, 2)
    assert [g["key"] for g in groups] == list(want)
    assert {g["key"]: [h["id"] for h in g["hits"]] for g in groups} == want
    assert text.startswith("🎯 Found 4 groups")
    # scores are globally ordered within each group
    for g in groups:
        ss = [h["score"] for h in g["hits"]]
        assert ss == sorted(ss, reverse=True)
    # group ranking follows best hit
    bests = [g["hits"][0]["score"] for g in groups]
    assert bests == sorted(bests, reverse=True)


def test_groups_deepening_loop(engine_store):
    """group_size == rows-per-key forces the scan past the initial k
    (top groups' last members rank deep in random data)."""
    engine, vecs, payloads = engine_store
    q = vecs[100]
    text, groups = engine.search_groups(
        -1.0, 3, group_by="filename", group_size=3, embeddings=q[None])
    want = brute_groups(vecs, q, keys_of(payloads, "filename"), -1.0, 3, 3)
    assert {g["key"]: [h["id"] for h in g["hits"]] for g in groups} == want
    assert all(len(g["hits"]) == 3 for g in groups)


def test_groups_threshold_and_missing_key(engine_store):
    engine, vecs, payloads = engine_store
    q = vecs[0]
    # only ~every-4th row has "tag": others never appear
    text, groups = engine.search_groups(
        -1.0, 3, group_by="tag", group_size=2, embeddings=q[None])
    want = brute_groups(vecs, q, keys_of(payloads, "tag"), -1.0, 3, 2)
    assert {g["key"]: [h["id"] for h in g["hits"]] for g in groups} == want
    for g in groups:
        assert all(payloads[h["id"]].get("tag") == g["key"]
                   for h in g["hits"])
    # a threshold above every score (incl. the self-match at 1.0) ->
    # no groups
    text, groups = engine.search_groups(
        1.5, 3, group_by="filename", group_size=2, embeddings=q[None])
    assert groups == [] and text.startswith("❌")
    # a key no payload carries -> explicit message
    text, groups = engine.search_groups(
        0.0, 3, group_by="nope", group_size=2, embeddings=q[None])
    assert groups == [] and "nope" in text


def test_groups_with_filter(engine_store):
    engine, vecs, payloads = engine_store
    q = vecs[50]
    text, groups = engine.search_groups(
        -1.0, 3, group_by="filename", group_size=2, embeddings=q[None],
        filter={"detected_class": "person"})
    mask = np.array([p["detected_class"] == "person" for p in payloads])
    want = brute_groups(vecs, q, keys_of(payloads, "filename"),
                        -1.0, 3, 2, mask=mask)
    assert {g["key"]: [h["id"] for h in g["hits"]] for g in groups} == want
    for g in groups:
        assert all(h["payload"]["detected_class"] == "person"
                   for h in g["hits"])


def test_cli_info_filter_count(tmp_path, capsys):
    from reverso_tpu.cli import main

    rng = np.random.default_rng(2)
    vecs = random_unit(rng, 30, 16)
    payloads = [{"filename": f"f{i}.jpg", "region_id": f"r{i}",
                 "detected_class": "person" if i < 12 else "car"}
                for i in range(30)]
    root = str(tmp_path / "db")
    with VectorStore.create(root, "cnt", 16) as s:
        s.append(vecs, payloads)

    rc = main(["--db-root", root, "info", "cnt",
               "--filter", "detected_class=person", "--json"])
    out = capsys.readouterr().out
    assert rc == 0
    data = json.loads(out)
    assert data["rows"] == 30 and data["matching"] == 12
    rc = main(["--db-root", root, "info", "cnt", "--filter", "not a clause"])
    assert rc == 1


def test_cli_search_group_by(tmp_path, capsys):
    from reverso_tpu.cli import main
    from test_pipeline import make_corpus

    files = make_corpus(tmp_path / "imgs", n=6)
    root = str(tmp_path / "db")
    rc = main(["--db-root", root, "--model", "test-tiny",
               "build", str(tmp_path / "imgs"), "--name", "g",
               "--direct-pe"])
    assert rc == 0
    capsys.readouterr()
    rc = main(["--db-root", root, "--model", "test-tiny",
               "search", str(files[0]), "--name", "g",
               "--group-by", "filename", "--group-size", "2",
               "--top-k", "3", "--threshold", "-1", "--json"])
    out = capsys.readouterr().out
    assert rc == 0
    groups = json.loads(out)
    assert len(groups) == 3
    # direct-PE: one row per image -> one hit per filename group,
    # the query image's own group first
    assert groups[0]["key"] == "img_000.jpg"
    assert all(len(g["hits"]) == 1 for g in groups)

# ---------------------------------------------------------------------------
# query_groups (qdrant query_points_groups: universal query + group_by)
# ---------------------------------------------------------------------------

def test_query_groups_plain_matches_brute(engine_store):
    engine, vecs, payloads = engine_store
    q = vecs[17]
    groups = engine.query_groups(q, group_by="filename",
                                 group_size=2, limit=4)
    want = brute_groups(vecs, q, keys_of(payloads, "filename"),
                        -2.0, 4, 2)
    assert [g["key"] for g in groups] == list(want)
    assert {g["key"]: [h["id"] for h in g["hits"]]
            for g in groups} == want
    # payloads attached, scores globally ordered inside each group
    for g in groups:
        assert all(h["payload"]["filename"] == g["key"]
                   for h in g["hits"])
        ss = [h["score"] for h in g["hits"]]
        assert ss == sorted(ss, reverse=True)


def test_query_groups_deepening_and_missing_key(engine_store):
    engine, vecs, payloads = engine_store
    q = vecs[100]
    # 3 rows per filename, group_size=3: top groups' last members rank
    # deep -> forces the doubling loop past the initial limit
    groups = engine.query_groups(q, group_by="filename",
                                 group_size=3, limit=3)
    want = brute_groups(vecs, q, keys_of(payloads, "filename"),
                        -2.0, 3, 3)
    assert {g["key"]: [h["id"] for h in g["hits"]]
            for g in groups} == want
    assert all(len(g["hits"]) == 3 for g in groups)
    # rows without the key are skipped (qdrant semantics)
    groups = engine.query_groups(q, group_by="tag", group_size=2,
                                 limit=3)
    want = brute_groups(vecs, q, keys_of(payloads, "tag"), -2.0, 3, 2)
    assert {g["key"]: [h["id"] for h in g["hits"]]
            for g in groups} == want


def test_query_groups_filter_and_selector(engine_store):
    engine, vecs, payloads = engine_store
    q = vecs[50]
    groups = engine.query_groups(
        q, group_by="filename", group_size=2, limit=3,
        filter={"detected_class": "person"},
        with_payload=["detected_class"])
    mask = np.array([p["detected_class"] == "person" for p in payloads])
    want = brute_groups(vecs, q, keys_of(payloads, "filename"),
                        -2.0, 3, 2, mask=mask)
    assert {g["key"]: [h["id"] for h in g["hits"]]
            for g in groups} == want
    for g in groups:
        for h in g["hits"]:
            assert h["payload"] == {"detected_class": "person"}


def test_query_groups_prefetch_fusion(engine_store):
    engine, vecs, payloads = engine_store
    n = len(vecs)
    pf = [{"query": vecs[5], "limit": n}, {"query": vecs[9], "limit": n}]
    groups = engine.query_groups(prefetch=pf, fusion="rrf",
                                 group_by="filename", group_size=2,
                                 limit=4)
    # truth: group-by over the full fused order (branches cover the
    # whole store, so deepening never changes the pool)
    fused = engine.query(prefetch=pf, fusion="rrf", k=n,
                         with_payload=False)
    keys = keys_of(payloads, "filename")
    sel = {}
    for h in fused:
        kv = keys[h["id"]]
        got = sel.get(kv)
        if got is None:
            if len(sel) >= 4:
                continue
            sel[kv] = [h["id"]]
        elif len(got) < 2:
            got.append(h["id"])
    assert {g["key"]: [h["id"] for h in g["hits"]]
            for g in groups} == sel
    # exact rescore of the union, grouped
    groups = engine.query_groups(vecs[17], prefetch=pf,
                                 group_by="filename", group_size=2,
                                 limit=4)
    want = brute_groups(vecs, vecs[17], keys, -2.0, 4, 2)
    assert {g["key"]: [h["id"] for h in g["hits"]]
            for g in groups} == want


def test_query_groups_errors(engine_store):
    engine, vecs, _ = engine_store
    with pytest.raises(ValueError):
        engine.query_groups(vecs[0], group_by="")
    with pytest.raises(ValueError):
        engine.query_groups(None, group_by="filename")


def test_cli_query_group_by(engine_store, capsys):
    from reverso_tpu.cli import main

    engine, vecs, payloads = engine_store
    root = engine.db_root
    rc = main(["--db-root", root, "query", "grp", "--target", "17",
               "--group-by", "filename", "--group-size", "2",
               "--top-k", "3", "--json"])
    out = capsys.readouterr().out
    assert rc == 0
    groups = json.loads(out)["groups"]
    assert len(groups) == 3
    assert groups[0]["key"] == payloads[17]["filename"]
    assert all(len(g["hits"]) == 2 for g in groups)
