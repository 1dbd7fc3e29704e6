"""MMR (Maximal Marginal Relevance) diversified search — qdrant 1.15's
`mmr` query operand (`engine._mmr_select`). The reference app only ran
plain nearest searches (reference core_system.py:659-664); MMR is the
query-surface feature that de-duplicates near-identical region hits.
"""
import dataclasses

import numpy as np
import pytest

from reverso_tpu.store import StoreError, VectorStore


def make_engine(tmp_path, vecs, distance="cosine"):
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso

    root = str(tmp_path / "db")
    VectorStore.create(root, "mmr", vecs.shape[1],
                       distance=distance).close()
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(MODEL_PRESETS["test-tiny"],
                                       dtype="float32"),
        store=dataclasses.replace(cfg.store, root_dir=root,
                                  dtype="float32"))
    engine = Reverso(cfg)
    engine.load_database("mmr")
    msg = engine.upsert_points(
        vecs, [{"region_id": f"r{i}", "grp": int(i) // 4}
               for i in range(len(vecs))])
    assert msg.startswith("✅"), msg
    return engine


def clustered(seed=0, groups=5, per=4, d=32, noise=0.02):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(groups, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    v = np.repeat(centers, per, axis=0) + noise * rng.normal(
        size=(groups * per, d))
    return (v / np.linalg.norm(v, axis=1, keepdims=True)
            ).astype(np.float32), centers


def mmr_reference(vecs, cand, rel, k, diversity):
    """Independent greedy reference; pairwise sims in f32 (the same
    arithmetic the engine uses) so near-tie picks match bitwise."""
    cand = list(cand)
    remaining = set(range(len(cand)))
    max_sim = np.full(len(cand), -np.inf)
    v = vecs[cand].astype(np.float32)
    out = []
    for step in range(min(k, len(cand))):
        obj = (np.asarray(rel, np.float64) if step == 0
               else (1 - diversity) * np.asarray(rel, np.float64)
               - diversity * max_sim)
        best = min(((-obj[j], cand[j], j) for j in remaining))
        j = best[2]
        out.append(cand[j])
        remaining.discard(j)
        max_sim = np.maximum(max_sim, (v @ v[j]).astype(np.float64))
    return out


def test_mmr_diversifies_across_groups(tmp_path):
    vecs, centers = clustered()
    engine = make_engine(tmp_path, vecs)
    q = (centers.mean(axis=0) + centers[0])
    q = (q / np.linalg.norm(q)).astype(np.float32)
    # plain top-8 is dominated by the nearest group's near-duplicates;
    # diversity=0.7 must spread across groups
    plain = engine.query(q.tolist(), k=8)
    plain_groups = {h["payload"]["grp"] for h in plain}
    hits = engine.query({"nearest": q.tolist(),
                         "mmr": {"diversity": 0.7}}, k=8)
    mmr_groups = {h["payload"]["grp"] for h in hits}
    assert len(mmr_groups) > len(plain_groups)
    assert len(mmr_groups) == 5          # every group represented
    # scores are the RELEVANCE scores, in selection order (first pick
    # = most relevant overall)
    assert hits[0]["id"] == plain[0]["id"]
    assert abs(hits[0]["score"] - plain[0]["score"]) < 1e-5
    # diversity=0 == plain top-k
    hits0 = engine.query({"nearest": q.tolist(),
                          "mmr": {"diversity": 0.0}}, k=8)
    assert [h["id"] for h in hits0] == [h["id"] for h in plain]


def test_mmr_matches_greedy_reference(tmp_path):
    """Selection-order parity vs an independent greedy implementation
    fed the engine's OWN f32 relevance scores and f32 pairwise sims —
    near-tie greedy picks are decided by the same bits."""
    vecs, centers = clustered(seed=3)
    engine = make_engine(tmp_path, vecs)
    # a MIXED query (not a stored point): if q equals a stored row,
    # relevance == similarity-to-the-first-pick and every later
    # objective cancels to float noise — pure tie-break territory
    q = 0.6 * centers[0] + 0.3 * centers[1] + 0.1 * centers[2]
    q = (q / np.linalg.norm(q)).astype(np.float32)
    plain = engine.query(q.tolist(), k=20)
    cand = [h["id"] for h in plain]
    rel = np.asarray([h["score"] for h in plain], np.float64)
    for diversity in (0.3, 0.5, 0.9):
        hits = engine.query({"nearest": q.tolist(),
                             "mmr": {"diversity": diversity,
                                     "candidates_limit": 20}}, k=6)
        want = mmr_reference(vecs, cand, rel, 6, diversity)
        assert [h["id"] for h in hits] == want, diversity


def test_mmr_over_prefetch_union_and_filters(tmp_path):
    vecs, centers = clustered(seed=5)
    engine = make_engine(tmp_path, vecs)
    q = vecs[0].astype(np.float32)
    # prefetch union reranked by MMR; relevance = exact rescore
    hits = engine.query({"nearest": q.tolist(),
                         "mmr": {"diversity": 0.6}},
                        prefetch=[{"query": q.tolist(), "limit": 12}],
                        k=5)
    assert hits and hits[0]["id"] == 0
    # filter applies to the candidate scan
    hits = engine.query({"nearest": q.tolist(),
                         "mmr": {"diversity": 0.0}},
                        k=5, filter="grp=2")
    assert all(h["payload"]["grp"] == 2 for h in hits)
    # k > candidates: returns what exists, no -1 leakage
    hits = engine.query({"nearest": q.tolist(),
                         "mmr": {"diversity": 0.5,
                                 "candidates_limit": 3}}, k=10)
    assert len(hits) == 3


def test_mmr_through_query_batch(tmp_path):
    """query_batch routes mmr (and formula) requests through the
    per-request query() path instead of the plain coalescer."""
    vecs, centers = clustered(seed=9)
    engine = make_engine(tmp_path, vecs)
    q = (0.5 * centers[0] + 0.5 * centers[1])
    q = (q / np.linalg.norm(q)).astype(np.float32)
    res = engine.query_batch([
        {"query": q.tolist(), "k": 4},
        {"query": {"nearest": q.tolist(), "mmr": {"diversity": 0.8}},
         "k": 4},
    ])
    direct = engine.query({"nearest": q.tolist(),
                           "mmr": {"diversity": 0.8}}, k=4)
    assert [h["id"] for h in res[1]] == [h["id"] for h in direct]
    assert [h["id"] for h in res[0]] == \
        [h["id"] for h in engine.query(q.tolist(), k=4)]


def test_mmr_validation(tmp_path):
    vecs, _ = clustered(seed=7)
    engine = make_engine(tmp_path, vecs)
    q = vecs[0].tolist()
    with pytest.raises(ValueError, match="diversity"):
        engine.query({"nearest": q, "mmr": {"diversity": 1.5}}, k=3)
    with pytest.raises(ValueError, match="nearest"):
        engine.query({"mmr": {"diversity": 0.5}}, k=3)
    with pytest.raises(ValueError, match="candidates_limit"):
        engine.query({"nearest": q,
                      "mmr": {"candidates_limit": 0}}, k=3)
    with pytest.raises(ValueError, match="not both"):
        engine.query({"formula": "$score", "mmr": {}},
                     prefetch=[{"query": q}], k=3)
