"""Formula (score-boosting) rescoring — qdrant's FormulaQuery
(store/formula.py + the engine.query `{"formula": ...}` operand).
The reference app only ever ran plain searches (reference
core_system.py:659-664); this is store-surface parity with modern
qdrant query_points.
"""
import dataclasses
import math

import numpy as np
import pytest

from reverso_tpu.store import VectorStore
from reverso_tpu.store.formula import (
    FormulaContext,
    FormulaError,
    eval_formula,
    parse_formula,
)


def ctx_of(ids, branches, payloads, defaults=None, cond=None):
    pay = {i: p for i, p in zip(ids, payloads)}
    return FormulaContext(
        ids, branches,
        payloads_of=lambda pids: [pay.get(p, {}) for p in pids],
        condition_mask=cond or (lambda spec: np.zeros(max(ids) + 1, bool)),
        defaults=defaults)


# ---------------------------------------------------------------------------
# grammar
# ---------------------------------------------------------------------------

def test_parse_rejects_bad_nodes():
    for bad in (None, [1, 2], {"sum": []}, {"div": {"left": 1}},
                {"pow": {"base": 1}}, {},
                {"gauss_decay": {"x": 1, "midpoint": 1.5}},
                {"lin_decay": {"x": 1, "scale": 0}},
                {"geo_distance": {"origin": {"lat": 1}, "to": "g"}}):
        with pytest.raises(FormulaError):
            parse_formula(bad)
    # numbers, variables, nested ops, conditions all parse
    parse_formula({"sum": ["$score", {"mult": [0.5, "price"]},
                           {"key": "tag", "match": {"value": "x"}}]})


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------

def test_arithmetic_and_score_vars():
    ids = [3, 7, 9]
    branches = [{3: 1.0, 7: 0.5}, {7: 2.0, 9: 4.0}]
    c = ctx_of(ids, branches, [{}, {}, {}], defaults={"$score": 0.0})
    # "$score" = first branch the point appeared in (branch order)
    np.testing.assert_allclose(eval_formula("$score", c), [1.0, 0.5, 4.0])
    np.testing.assert_allclose(eval_formula("$score[1]", c),
                               [0.0, 2.0, 4.0])
    got = eval_formula({"sum": ["$score", {"mult": [2, "$score[1]"]}]}, c)
    np.testing.assert_allclose(got, [1.0, 4.5, 12.0])
    got = eval_formula({"div": {"left": 1.0, "right": "$score[1]",
                                "by_zero_default": -1.0}}, c)
    np.testing.assert_allclose(got, [-1.0, 0.5, 0.25])
    with pytest.raises(FormulaError, match="by_zero_default"):
        eval_formula({"div": {"left": 1.0, "right": "$score[1]"}}, c)
    with pytest.raises(FormulaError, match="prefetch branches"):
        eval_formula("$score[5]", c)
    # no default -> missing branch score is an error
    c2 = ctx_of(ids, branches, [{}, {}, {}])
    with pytest.raises(FormulaError, match="defaults"):
        eval_formula("$score[1]", c2)


def test_payload_vars_paths_bools_datetimes_defaults():
    ids = [0, 1, 2]
    payloads = [{"price": 4, "meta": {"depth": 2.5}, "hot": True,
                 "ts": "2024-01-01T00:00:00Z"},
                {"price": 9, "meta": {"depth": 0.5}, "hot": False,
                 "ts": "2024-01-02T00:00:00Z"},
                {}]
    c = ctx_of(ids, [{}], payloads,
               defaults={"price": 0.0, "meta.depth": 1.0, "hot": 0.0,
                         "ts": "2024-01-01T00:00:00Z"})
    np.testing.assert_allclose(eval_formula("price", c), [4, 9, 0])
    np.testing.assert_allclose(eval_formula("meta.depth", c),
                               [2.5, 0.5, 1.0])
    np.testing.assert_allclose(eval_formula("hot", c), [1, 0, 0])
    ts = eval_formula("ts", c)
    assert ts[1] - ts[0] == 86400.0 and ts[2] == ts[0]
    c2 = ctx_of(ids, [{}], payloads)
    with pytest.raises(FormulaError, match="no default"):
        eval_formula("price", c2)
    # defaults apply per-key; datetime default strings parse
    with pytest.raises(FormulaError, match="neither a number"):
        eval_formula("name", ctx_of([0], [{}], [{"name": "bob"}]))


def test_decays_and_geo():
    ids = [0, 1, 2]
    payloads = [{"x": 0.0}, {"x": 1.0}, {"x": 2.0}]
    c = ctx_of(ids, [{}], payloads)
    # each decay equals `midpoint` exactly at |x - target| == scale
    for op in ("lin_decay", "exp_decay", "gauss_decay"):
        got = eval_formula({op: {"x": "x", "target": 0.0, "scale": 1.0,
                                 "midpoint": 0.5}}, c)
        assert got[0] == pytest.approx(1.0)
        assert got[1] == pytest.approx(0.5)
    # shapes beyond the midpoint differ per decay
    got = eval_formula({"lin_decay": {"x": "x", "scale": 1.0}}, c)
    np.testing.assert_allclose(got, [1.0, 0.5, 0.0])
    got = eval_formula({"exp_decay": {"x": "x", "scale": 1.0}}, c)
    np.testing.assert_allclose(got, [1.0, 0.5, 0.25])
    got = eval_formula({"gauss_decay": {"x": "x", "scale": 1.0}}, c)
    np.testing.assert_allclose(got, [1.0, 0.5, 0.5 ** 4])
    # datetime decay: target as RFC 3339, x from a payload datetime
    pay2 = [{"ts": "2024-01-01T00:00:00Z"}, {"ts": "2024-01-03T00:00:00Z"}]
    c2 = ctx_of([0, 1], [{}], pay2)
    got = eval_formula({"exp_decay": {"x": "ts",
                                      "target": "2024-01-01T00:00:00Z",
                                      "scale": 86400.0 * 2}}, c2)
    np.testing.assert_allclose(got, [1.0, 0.5])
    # decay target can be a payload key (per the grammar), not only an
    # RFC 3339 literal
    pay2b = [{"ts": "2024-01-03T00:00:00Z", "t0": "2024-01-01T00:00:00Z"},
             {"ts": "2024-01-01T00:00:00Z", "t0": "2024-01-01T00:00:00Z"}]
    c2b = ctx_of([0, 1], [{}], pay2b)
    got = eval_formula({"exp_decay": {"x": "ts", "target": "t0",
                                      "scale": 86400.0 * 2}}, c2b)
    np.testing.assert_allclose(got, [0.5, 1.0])
    # geo_distance: ~111 km per degree of latitude
    pay3 = [{"loc": {"lat": 1.0, "lon": 0.0}},
            {"loc": {"lat": 0.0, "lon": 0.0}},
            {"loc": {"lat": 0.0, "lon": 180.0}}]   # antipode: no NaN
    c3 = ctx_of([0, 1, 2], [{}], pay3)
    got = eval_formula({"geo_distance": {
        "origin": {"lat": 0.0, "lon": 0.0}, "to": "loc"}}, c3)
    assert got[0] == pytest.approx(111_195, rel=1e-3)
    assert got[1] == 0.0
    assert np.isfinite(got[2]) and got[2] == pytest.approx(
        np.pi * 6_371_008.8, rel=1e-6)


def test_condition_nodes_use_the_mask():
    ids = [0, 1, 2]
    mask = np.array([True, False, True])
    c = ctx_of(ids, [{}], [{}, {}, {}],
               cond=lambda spec: mask)
    got = eval_formula({"key": "tag", "match": {"value": "x"}}, c)
    np.testing.assert_allclose(got, [1.0, 0.0, 1.0])


# ---------------------------------------------------------------------------
# engine surface
# ---------------------------------------------------------------------------

def make_engine(tmp_path, n=20, d=8, seed=0):
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso

    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    root = str(tmp_path / "db")
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(MODEL_PRESETS["test-tiny"],
                                       dtype="float32"),
        store=dataclasses.replace(cfg.store, root_dir=root,
                                  dtype="float32"))
    VectorStore.create(root, "fdb", d).close()
    engine = Reverso(cfg)
    engine.load_database("fdb")
    msg = engine.upsert_points(
        vecs, [{"region_id": f"r{i}", "price": float(i),
                "cls": "a" if i % 2 else "b"} for i in range(n)])
    assert msg.startswith("✅"), msg
    return engine, vecs, rng


def test_engine_formula_query_end_to_end(tmp_path):
    engine, vecs, rng = make_engine(tmp_path)
    q = vecs[5]
    # boost: prefetch score + 0.1 * (cls == "a"), minus a price decay
    hits = engine.query(
        {"formula": {"sum": [
            "$score",
            {"mult": [0.1, {"key": "cls", "match": {"value": "a"}}]},
            {"neg": {"mult": [0.01, "price"]}},
        ]}},
        prefetch=[{"query": q.tolist(), "limit": 20}], k=20)
    # manual reference
    exact = vecs.astype(np.float64) @ q.astype(np.float64)
    want = exact + 0.1 * (np.arange(20) % 2 == 1) - 0.01 * np.arange(20)
    order = np.lexsort((np.arange(20), -want))
    assert [h["id"] for h in hits] == [int(i) for i in order]
    np.testing.assert_allclose([h["score"] for h in hits], want[order],
                               atol=1e-5)
    # defaults fill missing payload keys
    hits = engine.query(
        {"formula": {"sum": ["$score", "missing_key"]},
         "defaults": {"missing_key": 0.25}},
        prefetch=[{"query": q.tolist(), "limit": 5}], k=3)
    assert hits and hits[0]["id"] == 5
    assert hits[0]["score"] == pytest.approx(1.0 + 0.25, abs=1e-5)
    # errors: no prefetch, malformed spec, missing key without default
    with pytest.raises(ValueError, match="prefetch"):
        engine.query({"formula": "$score"})
    with pytest.raises(FormulaError):
        engine.query({"formula": {"sum": []}},
                     prefetch=[{"query": q.tolist()}])
    with pytest.raises(FormulaError, match="no default"):
        engine.query({"formula": "missing_key"},
                     prefetch=[{"query": q.tolist(), "limit": 3}])
    # global filter restricts the branch scan before the formula
    hits = engine.query({"formula": "$score"},
                        prefetch=[{"query": q.tolist(), "limit": 20}],
                        filter="cls=a", k=20)
    assert all(h["id"] % 2 == 1 for h in hits)


def test_engine_formula_multi_branch_scores(tmp_path):
    engine, vecs, rng = make_engine(tmp_path)
    qa, qb = vecs[2], vecs[9]
    hits = engine.query(
        {"formula": {"sum": ["$score[0]", "$score[1]"]},
         "defaults": {"$score": 0.0}},
        prefetch=[{"query": qa.tolist(), "limit": 5},
                  {"query": qb.tolist(), "limit": 5}], k=4)
    assert hits
    # point 2 and 9 each get ~1.0 from their own branch
    top_ids = {h["id"] for h in hits}
    assert 2 in top_ids and 9 in top_ids
