"""Cross-collection lookups — qdrant's `lookup_from` (resolve example/
query point ids in another collection) and `with_lookup` (join group
keys against another collection's points). The reference app was
single-collection (reference core_system.py:600-622); these are the
query-surface joins qdrant layers on top.
"""
import dataclasses
import json

import numpy as np
import pytest

from reverso_tpu.store import VectorStore


def build(tmp_path, d=16, n=20, seed=0):
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso

    rng = np.random.default_rng(seed)
    root = str(tmp_path / "db")

    def unit(m, dd=d):
        v = rng.normal(size=(m, dd)).astype(np.float32)
        return v / np.linalg.norm(v, axis=1, keepdims=True)

    regions = unit(n)
    docs = unit(6)
    with VectorStore.create(root, "regions", d) as s:
        s.append(regions, [{"region_id": f"r{i}", "doc": int(i % 6),
                            "docname": f"d{i % 6}"} for i in range(n)])
    with VectorStore.create(root, "docs", d) as s:
        s.append(docs, [{"region_id": f"d{i}", "title": f"Doc {i}"}
                        for i in range(6)])
    with VectorStore.create(root, "docs8", 8) as s:
        s.append(unit(3, 8), [{} for _ in range(3)])

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(MODEL_PRESETS["test-tiny"],
                                       dtype="float32"),
        store=dataclasses.replace(cfg.store, root_dir=root,
                                  dtype="float32"))
    engine = Reverso(cfg)
    engine.load_database("regions")
    return engine, regions, docs


def test_recommend_lookup_from(tmp_path):
    engine, regions, docs = build(tmp_path)
    # id 2 resolves in the DOCS collection, not the loaded one — and
    # is NOT excluded from the local results
    text, items = engine.recommend(positive=[2], max_results=5,
                                   lookup_from={"collection": "docs"})
    assert items, text
    scores = regions.astype(np.float64) @ docs[2].astype(np.float64)
    want = np.lexsort((np.arange(len(regions)), -scores))[:5]
    assert [it["id"] for it in items] == [int(w) for w in want]
    # same ids WITHOUT lookup_from mean local points (and self-exclude)
    text2, items2 = engine.recommend(positive=[2], max_results=5)
    assert 2 not in {it["id"] for it in items2}
    # unknown collection is a clean error
    text3, items3 = engine.recommend(positive=[2],
                                     lookup_from="nope")
    assert text3.startswith("❌") and items3 == []


def test_query_and_discover_lookup_from(tmp_path):
    engine, regions, docs = build(tmp_path)
    hits = engine.query(1, k=4, lookup_from="docs")
    want = engine.query(docs[1].tolist(), k=4)
    assert [h["id"] for h in hits] == [h["id"] for h in want]
    # prefetch branch ids resolve there too
    hits = engine.query(prefetch=[{"query": 1, "limit": 6}],
                        fusion="rrf", k=3, lookup_from="docs")
    assert [h["id"] for h in hits] == [h["id"] for h in want[:3]]
    # out-of-range lookup id
    from reverso_tpu.store import StoreError
    with pytest.raises(StoreError, match="out of range"):
        engine.query(99, lookup_from="docs")
    # dim-mismatched lookup collection is a clean error
    with pytest.raises(StoreError, match="query vector must be"):
        engine.query(0, lookup_from="docs8")
    text, items = engine.recommend(positive=[0], lookup_from="docs8")
    assert text.startswith("❌") and "16-d" in text
    # discover with lookup target
    text, items = engine.discover(target=1, max_results=3,
                                  lookup_from="docs")
    assert items and [it["id"] for it in items] == \
        [h["id"] for h in want[:3]]
    # string (region_id) operands resolve in the LOOKUP collection too
    hits = engine.query("d1", k=4, lookup_from="docs")
    assert [h["id"] for h in hits] == [h["id"] for h in want]
    with pytest.raises(StoreError, match="lookup collection"):
        engine.query("r0", lookup_from="docs")   # local-only region_id


def test_combine_operands_lookup_from(tmp_path):
    """qdrant query-type wrappers (recommend/discover/context) resolve
    their inner point ids in the lookup collection — and because they
    arrive pre-resolved to vectors, no LOCAL row is self-excluded."""
    engine, regions, docs = build(tmp_path)
    hits = engine.query({"recommend": {"positive": [2]}}, k=5,
                        lookup_from="docs")
    scores = regions.astype(np.float64) @ docs[2].astype(np.float64)
    want = np.lexsort((np.arange(len(regions)), -scores))[:5]
    assert [h["id"] for h in hits] == [int(w) for w in want]
    # the same ids WITHOUT lookup_from are local (and self-exclude)
    hits2 = engine.query({"recommend": {"positive": [2]}}, k=5)
    assert 2 not in {h["id"] for h in hits2}
    # discover wrapper: target + pair ids all in the docs collection
    hits = engine.query({"discover": {
        "target": 1, "context": [{"positive": 2, "negative": 3}]}},
        k=3, lookup_from="docs")
    want = engine.query({"discover": {
        "target": docs[1], "context": [(docs[2], docs[3])]}}, k=3)
    assert [h["id"] for h in hits] == [h["id"] for h in want]
    from reverso_tpu.store import StoreError
    with pytest.raises(StoreError, match="out of range"):
        engine.query({"context": [(0, 99)]}, lookup_from="docs")


def test_search_groups_with_lookup(tmp_path):
    engine, regions, docs = build(tmp_path)
    q = regions[0]
    # int group keys -> row ids in the docs collection
    text, groups = engine.search_groups(
        -1.0, 3, group_by="doc", group_size=2, embeddings=q[None],
        with_lookup="docs")
    assert groups
    for g in groups:
        assert g["lookup"] is not None
        assert g["lookup"]["id"] == g["key"]
        assert g["lookup"]["payload"]["title"] == f"Doc {g['key']}"
    # string group keys -> region_id match in the docs collection
    text, groups = engine.search_groups(
        -1.0, 3, group_by="docname", group_size=2, embeddings=q[None],
        with_lookup={"collection": "docs", "with_vectors": True})
    assert groups
    for g in groups:
        doc_row = int(g["key"][1:])
        assert g["lookup"]["id"] == doc_row
        np.testing.assert_allclose(g["lookup"]["vector"], docs[doc_row],
                                   atol=1e-6)
    # keys with no matching point get lookup=None
    text, groups = engine.search_groups(
        -1.0, 2, group_by="region_id", group_size=1, embeddings=q[None],
        with_lookup="docs")
    assert groups and all(g["lookup"] is None for g in groups)


def test_cli_lookup_from(tmp_path, capsys):
    from reverso_tpu.cli import main

    engine, regions, docs = build(tmp_path)
    root = str(tmp_path / "db")
    rc = main(["--db-root", root, "--model", "test-tiny",
               "--index-dtype", "float32",
               "query", "regions", "--target", "1",
               "--lookup-from", "docs", "--top-k", "3", "--json"])
    out = capsys.readouterr()
    assert rc == 0, out.err
    hits = json.loads(out.out)["hits"]
    scores = regions.astype(np.float64) @ docs[1].astype(np.float64)
    want = np.lexsort((np.arange(len(regions)), -scores))[:3]
    assert [h["id"] for h in hits] == [int(w) for w in want]
