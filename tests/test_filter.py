"""Payload-filtered search: parse -> row mask -> exact masked top-k.

The reference's embedded qdrant store supports payload filters on
search (the app only ever used score_threshold,
reference core_system.py:659-664); these tests pin the TPU build's
equivalent: `store.filter` spec parsing, the columnar payload pass,
and mask-exactness through every index path (XLA bf16/int8, sharded,
host, IVF) — a filtered top-k must equal the brute-force scan over the
matching subset, same (-score, idx) order.
"""
import dataclasses
import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reverso_tpu.store.filter import (
    Condition, Filter, FilterError, PayloadColumns,
    evaluate_filter, parse_filter, payload_mask,
)
from reverso_tpu.ops.topk import (
    cosine_topk_xla, cosine_topk_int8_xla, quantize_db_int8,
    sharded_cosine_topk,
)
from reverso_tpu.store import VectorStore, DeviceIndex, HostIndex
from reverso_tpu.store.ivf import IVFIndex
from reverso_tpu.parallel import make_mesh, shard_rows, replicate

from test_topk import numpy_topk64, random_unit


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------

def test_parse_shorthand():
    f = parse_filter({"detected_class": "person", "confidence": {"gte": 0.5},
                      "filename": ["a.jpg", "b.jpg"]})
    ops = {c.key: c.op for c in f.must}
    assert ops == {"detected_class": "match", "confidence": "range",
                   "filename": "any"}
    assert not f.should and not f.must_not


def test_parse_qdrant_form():
    f = parse_filter({
        "must": [{"key": "detected_class", "match": "car"}],
        "should": [{"key": "confidence", "range": {"gt": 0.3}},
                   {"key": "mask_status", "exists": True}],
        "must_not": {"key": "filename", "match": "skip.jpg"},
    })
    assert len(f.must) == 1 and len(f.should) == 2 and len(f.must_not) == 1
    assert f.keys() == {"detected_class", "confidence", "mask_status",
                        "filename"}


def test_parse_qdrant_match_wrappers():
    # qdrant's canonical JSON wraps match values: {"match": {"value": v}}
    # and {"match": {"any": [...]}} — both must unwrap, not compare the
    # wrapper dict itself (which silently matches nothing)
    f = parse_filter({"must": [
        {"key": "detected_class", "match": {"value": "person"}},
        {"key": "filename", "match": {"any": ["a.jpg", "b.jpg"]}},
    ]})
    assert f.must[0] == Condition("detected_class", "match", "person")
    assert f.must[1] == Condition("filename", "any", ("a.jpg", "b.jpg"))
    f = parse_filter({"must": [
        {"key": "detected_class", "match": {"except": ["car"]}},
        {"key": "caption", "match": {"text": "brown fox"}},
    ]})
    assert f.must[0] == Condition("detected_class", "except", ("car",))
    assert f.must[1] == Condition("caption", "text", "brown fox")
    with pytest.raises(FilterError):
        parse_filter({"key": "a", "match": {"bogus": 1}})


def test_parse_string_clauses():
    f = parse_filter("detected_class=person, confidence>=0.5, filename!=x.jpg")
    assert [c.op for c in f.must] == ["match", "range"]
    assert f.must[1].value == {"gte": 0.5}
    assert f.must_not[0] == Condition("filename", "match", "x.jpg")
    # repeatable CLI flag -> list of clause strings
    f2 = parse_filter(["a=1", "b<2"])
    assert len(f2.must) == 2
    # JSON object string
    f3 = parse_filter(json.dumps({"must": [{"key": "a", "match": 1}]}))
    assert f3.must[0] == Condition("a", "match", 1)


def test_parse_scalar_coercion():
    f = parse_filter("flag=true, n=3, x=1.5, name=img")
    vals = {c.key: c.value for c in f.must}
    assert vals == {"flag": True, "n": 3, "x": 1.5, "name": "img"}


def test_parse_errors():
    with pytest.raises(FilterError):
        parse_filter("oops")                     # no operator
    with pytest.raises(FilterError):
        parse_filter("name>abc")                 # ordered needs a number
    with pytest.raises(FilterError):
        parse_filter({"must": [{"match": 1}]})   # condition without key
    with pytest.raises(FilterError):
        parse_filter({"key": "a", "match": 1, "range": {"gt": 0}, "must": []})
    with pytest.raises(FilterError):
        parse_filter({"must": [], "bogus": []})
    assert parse_filter(None).is_empty()
    assert parse_filter("").is_empty()


# ---------------------------------------------------------------------------
# evaluation over a real store
# ---------------------------------------------------------------------------

def _make_store(tmp_path, n=40, d=16, seed=0):
    rng = np.random.default_rng(seed)
    vecs = random_unit(rng, n, d)
    payloads = [{"filename": f"img_{i:03d}.jpg",
                 "detected_class": ("person" if i % 3 == 0 else
                                    "car" if i % 3 == 1 else "building"),
                 "confidence": round(float(i) / n, 3),
                 **({"extra": i} if i % 2 == 0 else {})}
                for i in range(n)]
    with VectorStore.create(str(tmp_path), "fdb", d) as s:
        s.append(vecs, payloads)
    store = VectorStore.open(str(tmp_path), "fdb")
    return store, vecs, payloads


def test_payload_mask_semantics(tmp_path):
    store, _, payloads = _make_store(tmp_path)
    n = len(payloads)
    mask = payload_mask(store, {"detected_class": "person"})
    np.testing.assert_array_equal(mask, [i % 3 == 0 for i in range(n)])

    mask = payload_mask(store, "confidence>=0.5, detected_class!=car")
    expect = [(p["confidence"] >= 0.5 and p["detected_class"] != "car")
              for p in payloads]
    np.testing.assert_array_equal(mask, expect)

    # missing key: never matches / range never holds / exists False matches
    mask = payload_mask(store, {"key": "extra", "range": {"gte": 0}})
    np.testing.assert_array_equal(mask, [i % 2 == 0 for i in range(n)])
    mask = payload_mask(store, {"key": "extra", "exists": False})
    np.testing.assert_array_equal(mask, [i % 2 == 1 for i in range(n)])

    # should: at least one of the clauses
    mask = payload_mask(store, {"should": [
        {"key": "detected_class", "match": "person"},
        {"key": "confidence", "range": {"gt": 0.9}}]})
    expect = [(p["detected_class"] == "person" or p["confidence"] > 0.9)
              for p in payloads]
    np.testing.assert_array_equal(mask, expect)

    # any
    mask = payload_mask(store, {"filename": ["img_000.jpg", "img_007.jpg"]})
    assert mask.sum() == 2 and mask[0] and mask[7]


def _make_rich_store(tmp_path):
    """Store whose payloads exercise every extended condition type."""
    payloads = [
        {"region_id": "r0", "cls": "person", "tags": ["a", "b"],
         "ts": "2024-01-02T00:00:00Z", "caption": "The Quick brown Fox",
         "loc": {"lon": 13.40, "lat": 52.52}},                 # Berlin
        {"region_id": "r1", "cls": "car", "tags": [],
         "ts": "2023-06-01", "caption": "quick fox",
         "loc": [{"lon": -122.42, "lat": 37.77},               # SF and
                 {"lon": 139.77, "lat": 35.68}]},              # Tokyo
        {"region_id": "r2", "cls": "person", "t": None,
         "ts": "2024-01-02T01:00:00+02:00",                    # < row 0 utc
         "big": 2 ** 60, "loc": {"lon": 179.5, "lat": 0.0}},
        {"region_id": "r3", "big": 2 ** 60 + 1,
         "loc": {"lon": -179.5, "lat": 0.0}},
        {"region_id": "r4", "cls": "building", "tags": ["a"],
         "ts": 12345, "loc": "not a point"},
    ]
    d = 8
    vecs = random_unit(np.random.default_rng(3), len(payloads), d)
    with VectorStore.create(str(tmp_path), "rich", d) as s:
        s.append(vecs, payloads)
    return VectorStore.open(str(tmp_path), "rich"), payloads


def test_match_except_and_text(tmp_path):
    store, _ = _make_rich_store(tmp_path)
    # except = exact complement of any, INCLUDING rows missing the key
    m_any = payload_mask(store, {"key": "cls", "match": {"any": ["person"]}})
    m_exc = payload_mask(store, {"key": "cls",
                                 "match": {"except": ["person"]}})
    np.testing.assert_array_equal(m_exc, ~m_any)
    np.testing.assert_array_equal(m_any, [1, 0, 1, 0, 0])
    # full-text: every query token among the value's tokens, both
    # lowercased; non-string payloads (row 3's missing) never match
    m = payload_mask(store, {"key": "caption", "match": {"text": "fox quick"}})
    np.testing.assert_array_equal(m, [1, 1, 0, 0, 0])
    m = payload_mask(store, {"key": "caption", "match": {"text": "BROWN"}})
    np.testing.assert_array_equal(m, [1, 0, 0, 0, 0])


def test_match_phrase(tmp_path):
    """qdrant 1.15 MatchPhrase: tokens must appear consecutively and in
    order (row 0 holds 'the quick brown fox', row 1 'quick fox')."""
    store, _ = _make_rich_store(tmp_path)
    m = payload_mask(store, {"key": "caption", "match": {"phrase": "quick fox"}})
    np.testing.assert_array_equal(m, [0, 1, 0, 0, 0])
    m = payload_mask(store, {"key": "caption",
                             "match": {"phrase": "Quick BROWN fox"}})
    np.testing.assert_array_equal(m, [1, 0, 0, 0, 0])
    # single-token phrase degenerates to token containment, like text
    m = payload_mask(store, {"key": "caption", "match": {"phrase": "fox"}})
    np.testing.assert_array_equal(m, [1, 1, 0, 0, 0])
    # a longer phrase than the value never matches; punctuation-only
    # and non-string queries are parse errors
    m = payload_mask(store, {"key": "caption",
                             "match": {"phrase": "quick fox runs"}})
    np.testing.assert_array_equal(m, [0, 0, 0, 0, 0])
    with pytest.raises(FilterError):
        parse_filter({"key": "caption", "match": {"phrase": " !! "}})
    with pytest.raises(FilterError):
        parse_filter({"key": "caption", "match": {"phrase": 3}})


def test_datetime_range(tmp_path):
    store, _ = _make_rich_store(tmp_path)
    # row 2's +02:00 offset makes it EARLIER than row 0 in UTC; naive
    # row 1 is taken as UTC; non-string row 4 never matches
    m = payload_mask(store, {"key": "ts", "datetime_range":
                             {"gte": "2024-01-02T00:00:00Z"}})
    np.testing.assert_array_equal(m, [1, 0, 0, 0, 0])
    m = payload_mask(store, {"key": "ts", "datetime_range":
                             {"gte": "2023-01-01T00:00:00Z",
                              "lt": "2024-01-01T00:00:00Z"}})
    np.testing.assert_array_equal(m, [0, 1, 0, 0, 0])
    with pytest.raises(FilterError):
        parse_filter({"key": "ts", "datetime_range": {"gte": "not a date"}})


def test_values_count(tmp_path):
    store, _ = _make_rich_store(tmp_path)
    # list -> len, scalar -> 1, missing -> 0
    m = payload_mask(store, {"key": "tags", "values_count": {"gte": 2}})
    np.testing.assert_array_equal(m, [1, 0, 0, 0, 0])
    m = payload_mask(store, {"key": "tags", "values_count": {"lt": 1}})
    np.testing.assert_array_equal(m, [0, 1, 1, 1, 0])
    m = payload_mask(store, {"key": "cls", "values_count": {"gte": 1}})
    np.testing.assert_array_equal(m, [1, 1, 1, 0, 1])


def test_is_empty_is_null(tmp_path):
    store, _ = _make_rich_store(tmp_path)
    # is_empty: absent, null, or [] — row 1's empty list counts
    m = payload_mask(store, {"must": [{"is_empty": {"key": "tags"}}]})
    np.testing.assert_array_equal(m, [0, 1, 1, 1, 0])
    m = payload_mask(store, {"must": [{"is_null": {"key": "t"}}]})
    np.testing.assert_array_equal(m, [0, 0, 1, 0, 0])
    # null is empty but missing is not null
    m = payload_mask(store, {"must": [{"is_empty": {"key": "t"}}]})
    np.testing.assert_array_equal(m, [1, 1, 1, 1, 1])
    m = payload_mask(store, {"must": [{"is_null": {"key": "nope"}}]})
    np.testing.assert_array_equal(m, [0, 0, 0, 0, 0])


def test_has_id(tmp_path):
    store, _ = _make_rich_store(tmp_path)
    # int ids address store rows; out-of-range ints are ignored
    m = payload_mask(store, {"must": [{"has_id": [1, 3, 99]}]})
    np.testing.assert_array_equal(m, [0, 1, 0, 1, 0])
    # string ids address the region_id payload
    m = payload_mask(store, {"must": [{"has_id": ["r0", "r4", "zz"]}]})
    np.testing.assert_array_equal(m, [1, 0, 0, 0, 1])
    # mixed, and the bare / shorthand forms
    m = payload_mask(store, {"has_id": [0, "r2"]})
    np.testing.assert_array_equal(m, [1, 0, 1, 0, 0])
    m = payload_mask(store, {"must": [{"has_id": 2}]})   # scalar shorthand
    np.testing.assert_array_equal(m, [0, 0, 1, 0, 0])
    with pytest.raises(FilterError):
        parse_filter({"has_id": [1.5]})
    # pure-int-id filters must not extract the all-unique id column
    f = parse_filter({"has_id": [0, 1]})
    assert f.keys() == set()
    assert parse_filter({"has_id": ["r0"]}).keys() == {"region_id"}


def test_payload_selector():
    from reverso_tpu.store.filter import compile_payload_selector

    p = {"a": 1, "b": {"c": 2, "d": 3},
         "items": [{"x": 1, "y": 2}, {"y": 3}, 7]}
    assert compile_payload_selector(True) is True
    assert compile_payload_selector(None) is False
    assert compile_payload_selector(False) is False
    # include shorthand: key list / single string
    sel = compile_payload_selector(["a", "b.c"])
    assert sel(p) == {"a": 1, "b": {"c": 2}}
    assert compile_payload_selector("a")(p) == {"a": 1}
    # arrays traverse implicitly; elements without a match drop
    sel = compile_payload_selector({"include": ["items.x"]})
    assert sel(p) == {"items": [{"x": 1}]}
    # a shorter path subsumes a longer one
    sel = compile_payload_selector(["b", "b.c"])
    assert sel(p)["b"] == {"c": 2, "d": 3}
    # nothing matched -> empty payload, not None
    assert compile_payload_selector(["zz"])(p) == {}
    # exclude removes paths, keeps everything else (arrays element-wise)
    sel = compile_payload_selector({"exclude": ["b.d", "items.y"]})
    assert sel(p) == {"a": 1, "b": {"c": 2},
                      "items": [{"x": 1}, {}, 7]}
    assert compile_payload_selector({"exclude": ["a"]})(p) == {
        "b": {"c": 2, "d": 3}, "items": [{"x": 1, "y": 2}, {"y": 3}, 7]}
    # the source payload is never mutated
    assert p["b"] == {"c": 2, "d": 3}
    # malformed selectors fail before any IO
    for bad in ({"include": ["a"], "exclude": ["b"]}, {"nope": []},
                {"include": []}, {"include": [3]}, 42):
        with pytest.raises(FilterError):
            compile_payload_selector(bad)


def test_has_vector(tmp_path):
    # store with a named dense space + sparse + multi; sparse row 1 and
    # multi rows 0/3 were appended empty -> "vector not set"
    rng = np.random.default_rng(0)
    dense = random_unit(rng, 4, 8)
    with VectorStore.create(str(tmp_path), "hv", 8, named={"aux": 4},
                            sparse={"text": {}},
                            multi={"tok": 6}) as s:
        s.append({"": dense, "aux": random_unit(rng, 4, 4)},
                 [{"region_id": f"r{i}"} for i in range(4)],
                 sparse_vectors={"text": [
                     {"indices": [1], "values": [1.0]}, None,
                     {"indices": [2, 5], "values": [0.5, 2.0]},
                     {"indices": [], "values": []}]},
                 multi_vectors={"tok": [
                     None, rng.normal(size=(3, 6)),
                     rng.normal(size=(1, 6)), np.zeros((0, 6))]})
        s.flush()
        # dense spaces: every committed row has one
        np.testing.assert_array_equal(
            payload_mask(s, {"has_vector": ""}), [1, 1, 1, 1])
        np.testing.assert_array_equal(
            payload_mask(s, {"must": [{"has_vector": "aux"}]}),
            [1, 1, 1, 1])
        # sparse: empty/None rows have no vector
        np.testing.assert_array_equal(
            payload_mask(s, {"has_vector": "text"}), [1, 0, 1, 0])
        # multi: zero sub-vectors == not set
        np.testing.assert_array_equal(
            payload_mask(s, {"has_vector": "tok"}), [0, 1, 1, 0])
        # composes with other conditions and with must_not
        np.testing.assert_array_equal(
            payload_mask(s, {"must": [{"has_vector": "text"},
                                      {"has_id": [0, 1]}]}),
            [1, 0, 0, 0])
        np.testing.assert_array_equal(
            payload_mask(s, {"must_not": [{"has_vector": "tok"}]}),
            [1, 0, 0, 1])
        # unknown space -> FilterError (surfaces as a 400, not a scan)
        with pytest.raises(FilterError):
            payload_mask(s, {"has_vector": "nope"})
        # malformed value -> parse error; no payload keys are extracted
        with pytest.raises(FilterError):
            parse_filter({"has_vector": 3})
        assert parse_filter({"has_vector": "text"}).keys() == set()
        # not allowed inside nested (elements have no point identity)
        with pytest.raises(FilterError):
            parse_filter({"nested": {"key": "items", "filter":
                                     {"has_vector": "text"}}})


def test_geo_conditions(tmp_path):
    store, _ = _make_rich_store(tmp_path)
    # bounding box around Berlin
    m = payload_mask(store, {"key": "loc", "geo_bounding_box": {
        "top_left": {"lon": 10.0, "lat": 55.0},
        "bottom_right": {"lon": 15.0, "lat": 50.0}}})
    np.testing.assert_array_equal(m, [1, 0, 0, 0, 0])
    # date-line-crossing box catches rows 2 (179.5) and 3 (-179.5)
    m = payload_mask(store, {"key": "loc", "geo_bounding_box": {
        "top_left": {"lon": 175.0, "lat": 10.0},
        "bottom_right": {"lon": -175.0, "lat": -10.0}}})
    np.testing.assert_array_equal(m, [0, 0, 1, 1, 0])
    # radius: 50 km around SF matches row 1 via its FIRST point;
    # 50 km around Tokyo matches it via the SECOND (any-point lists)
    for center in ({"lon": -122.0, "lat": 37.7},
                   {"lon": 139.7, "lat": 35.7}):
        m = payload_mask(store, {"key": "loc", "geo_radius":
                                 {"center": center, "radius": 50_000}})
        np.testing.assert_array_equal(m, [0, 1, 0, 0, 0])
    # the haversine radius is calibrated in real meters: Berlin to
    # Potsdam is ~26 km, so 20 km excludes it and 30 km includes it
    potsdam = {"lon": 13.06, "lat": 52.40}
    m20 = payload_mask(store, {"key": "loc", "geo_radius":
                               {"center": potsdam, "radius": 20_000}})
    m30 = payload_mask(store, {"key": "loc", "geo_radius":
                               {"center": potsdam, "radius": 30_000}})
    np.testing.assert_array_equal(m20, [0, 0, 0, 0, 0])
    np.testing.assert_array_equal(m30, [1, 0, 0, 0, 0])
    # polygon with an interior hole: square around the equator point
    # minus a hole that swallows row 2's (179.5, 0) — malformed row 4
    # ("not a point") never matches anything
    square = {"points": [{"lon": 179.0, "lat": -1.0},
                         {"lon": 180.0, "lat": -1.0},
                         {"lon": 180.0, "lat": 1.0},
                         {"lon": 179.0, "lat": 1.0}]}
    m = payload_mask(store, {"key": "loc", "geo_polygon":
                             {"exterior": square}})
    np.testing.assert_array_equal(m, [0, 0, 1, 0, 0])
    hole = {"points": [{"lon": 179.4, "lat": -0.1},
                       {"lon": 179.6, "lat": -0.1},
                       {"lon": 179.6, "lat": 0.1},
                       {"lon": 179.4, "lat": 0.1},
                       {"lon": 179.4, "lat": -0.1}]}      # pre-closed ring
    m = payload_mask(store, {"key": "loc", "geo_polygon":
                             {"exterior": square, "interiors": [hole]}})
    np.testing.assert_array_equal(m, [0, 0, 0, 0, 0])
    with pytest.raises(FilterError):
        parse_filter({"key": "loc", "geo_radius":
                      {"center": {"lon": 0, "lat": 0}, "radius": -1}})
    with pytest.raises(FilterError):
        parse_filter({"key": "loc", "geo_polygon":
                      {"exterior": {"points": [{"lon": 0, "lat": 0}]}}})


def test_bigint_match_exactness(tmp_path):
    store, _ = _make_rich_store(tmp_path)
    # 2**60 and 2**60+1 collapse to the same float64; the odd-row
    # python recheck must keep them distinct
    m = payload_mask(store, {"key": "big", "match": 2 ** 60})
    np.testing.assert_array_equal(m, [0, 0, 1, 0, 0])
    m = payload_mask(store, {"key": "big", "match": 2 ** 60 + 1})
    np.testing.assert_array_equal(m, [0, 0, 0, 1, 0])


def test_payload_columns_reuse(tmp_path):
    store, _, _ = _make_store(tmp_path)
    cols = PayloadColumns(store)
    cols.ensure(["detected_class"])
    c1 = cols.column("detected_class")
    cols.ensure(["confidence"])          # second pass for the new key only
    assert cols.column("detected_class") is c1
    assert len(cols.column("confidence")) == store.count


def test_payload_columns_native_parity(tmp_path):
    """The C++ JSONL walker (native.payload_scan) must produce columns
    element- and type-identical to the Python json pass across every
    JSON value shape, including escaped/unicode strings, non-standard
    Infinity/NaN literals (json.dumps emits them), nested decoy keys,
    duplicate keys, corrupt lines, and trailing junk."""
    from reverso_tpu.native import native_available
    from reverso_tpu.store.filter import _MISSING

    if not native_available():
        pytest.skip("native library unavailable")
    payloads = [
        {"filename": "a.jpg", "conf": 0.5, "n": 3, "tag": True},
        {"filename": "b.jpg", "conf": -1.25e-3, "n": -7, "tag": False,
         "x": None},
        {"filename": "céçà 😀.jpg", "quote": 'said "hi"\n\ttab', "n": 2**40},
        # the f64-rounding edge: 2^53+1 ROUNDS ONTO an inclusive 2^53
        # bound check inside strtod-based scanners — both sides of it
        # and the bound itself must come back exact
        {"n": 2**53 + 1, "conf": 2.0**53},
        {"n": -(2**53) - 1, "tag": 2**53, "x": 2**60 + 7},
        {"bbox": [1, 2, 3.5, 4], "meta": {"a": [1, {"filename": "decoy"}]},
         "conf": float("inf")},
        {"conf": float("-inf"), "weird": float("nan"), "empty": "",
         "filename": "d.jpg"},
        {},
        {"filename": "keep", "n": 1},
        {"filename": "corrupt-me", "n": 2},
        {"filename": "junk-me", "n": 3},
    ]
    d = 8
    vecs = random_unit(np.random.default_rng(0), len(payloads), d)
    with VectorStore.create(str(tmp_path), "nat", d) as s:
        s.append(vecs, payloads)
    store = VectorStore.open(str(tmp_path), "nat")
    # in-place surgery preserving line lengths (offsets stay valid):
    # row 9 -> unparseable, row 10 -> valid object + trailing junk
    import os as _os
    jsonl = _os.path.join(store.path, "payloads.jsonl")
    offs = np.append(np.asarray(store._payload_offsets()),
                     _os.path.getsize(jsonl))
    with open(jsonl, "r+b") as f:
        for row, patch in ((9, b"x"), (10, b'{"n":9}')):
            ln = int(offs[row + 1] - offs[row]) - 1
            f.seek(int(offs[row]))
            f.write((patch + b"y" * ln)[:ln])

    keys = ["filename", "conf", "n", "tag", "x", "bbox", "meta", "weird",
            "empty", "quote", "nope"]
    pc = PayloadColumns(store)
    cols_py = pc._extract_python(keys)
    cols_nat = pc._extract_native(keys)
    assert cols_nat is not None
    for k in keys:
        a, b = cols_py[k], cols_nat[k]
        assert len(a) == len(b) == len(payloads)
        for i in range(len(a)):
            va, vb = a[i], b[i]
            if isinstance(va, float) and np.isnan(va):
                assert isinstance(vb, float) and np.isnan(vb), (k, i)
                continue
            assert (va is _MISSING) == (vb is _MISSING), (k, i, va, vb)
            assert va is _MISSING or va == vb, (k, i, repr(va), repr(vb))
            assert va is _MISSING or type(va) == type(vb), (k, i)
    # both surgically-altered rows are all-missing on both paths
    for row in (9, 10):
        assert all(cols_py[k][row] is _MISSING for k in keys)
        assert all(cols_nat[k][row] is _MISSING for k in keys)

    # the ensure() dispatch produces identical masks either way
    mask_nat = payload_mask(store, "conf>=0, filename!=a.jpg")
    _os.environ["REVERSO_NATIVE"] = "0"
    try:
        mask_py = payload_mask(store, "conf>=0, filename!=a.jpg")
    finally:
        _os.environ.pop("REVERSO_NATIVE")
    np.testing.assert_array_equal(mask_nat, mask_py)


def _make_array_store(tmp_path):
    """Payloads with arrays and nested objects (qdrant-style docs)."""
    payloads = [
        {"region_id": "r0", "tags": ["car", "red"], "n": [1, 5],
         "meta": {"cls": "person", "score": 0.9},
         "items": [{"kind": "a", "price": 3, "ts": "2024-01-01"},
                   {"kind": "b", "price": 9}]},
        {"region_id": "r1", "tags": ["tree"], "n": [7],
         "meta": {"cls": "car", "deep": {"x": 1}},
         "items": [{"kind": "a", "price": 20},
                   {"kind": "c", "price": 1}]},
        {"region_id": "r2", "tags": "car", "n": 3,
         "meta": {"score": 0.2}, "items": []},
        {"region_id": "r3", "ts_list": ["2024-06-01", "bogus"],
         "caption_list": ["a quick fox", 7],
         "items": [{"kind": "b", "price": 2}]},
    ]
    d = 8
    vecs = random_unit(np.random.default_rng(5), len(payloads), d)
    with VectorStore.create(str(tmp_path), "arr", d) as s:
        s.append(vecs, payloads)
    return VectorStore.open(str(tmp_path), "arr"), payloads


def test_array_any_element_semantics(tmp_path):
    """qdrant array semantics: a list payload matches when ANY element
    does — match/any/except/range/datetime_range/text alike."""
    store, _ = _make_array_store(tmp_path)
    m = payload_mask(store, {"key": "tags", "match": "car"})
    np.testing.assert_array_equal(m, [1, 0, 1, 0])     # scalar row 2 too
    m = payload_mask(store, {"key": "tags", "match": {"any": ["red",
                                                             "tree"]}})
    np.testing.assert_array_equal(m, [1, 1, 0, 0])
    # except: NO stored value is listed (missing rows vacuously match)
    m = payload_mask(store, {"key": "tags", "match": {"except": ["car"]}})
    np.testing.assert_array_equal(m, [0, 1, 0, 1])
    # range: any numeric element in range
    m = payload_mask(store, {"key": "n", "range": {"gte": 5}})
    np.testing.assert_array_equal(m, [1, 1, 0, 0])
    m = payload_mask(store, {"key": "n", "range": {"lte": 3}})
    np.testing.assert_array_equal(m, [1, 0, 1, 0])
    # datetime_range / text over string arrays (non-strings ignored)
    m = payload_mask(store, {"key": "ts_list", "datetime_range":
                             {"gte": "2024-01-01T00:00:00Z"}})
    np.testing.assert_array_equal(m, [0, 0, 0, 1])
    m = payload_mask(store, {"key": "caption_list",
                             "match": {"text": "FOX quick"}})
    np.testing.assert_array_equal(m, [0, 0, 0, 1])


def test_nested_path_keys(tmp_path):
    """Dotted paths descend objects; arrays traverse implicitly, with
    '[]' accepted as the explicit spelling. Works through every
    condition type and the string filter form."""
    store, _ = _make_array_store(tmp_path)
    m = payload_mask(store, {"key": "meta.cls", "match": "person"})
    np.testing.assert_array_equal(m, [1, 0, 0, 0])
    m = payload_mask(store, {"key": "meta.score", "range": {"gte": 0.5}})
    np.testing.assert_array_equal(m, [1, 0, 0, 0])
    m = payload_mask(store, {"key": "meta.deep.x", "match": 1})
    np.testing.assert_array_equal(m, [0, 1, 0, 0])
    # array-of-objects projection: items[].price / items.price alike
    for key in ("items[].price", "items.price"):
        m = payload_mask(store, {"key": key, "range": {"gte": 9}})
        np.testing.assert_array_equal(m, [1, 1, 0, 0], err_msg=key)
    m = payload_mask(store, {"key": "items.kind", "match": "c"})
    np.testing.assert_array_equal(m, [0, 1, 0, 0])
    # exists / is_empty over a projected path
    m = payload_mask(store, {"key": "meta.cls", "exists": True})
    np.testing.assert_array_equal(m, [1, 1, 0, 0])
    m = payload_mask(store, {"must": [{"is_empty": {"key":
                                                    "items.price"}}]})
    np.testing.assert_array_equal(m, [0, 0, 1, 0])   # r2's items == []
    # string form
    m = payload_mask(store, "meta.cls=car")
    np.testing.assert_array_equal(m, [0, 1, 0, 0])
    m = payload_mask(store, "items[].price>=9")
    np.testing.assert_array_equal(m, [1, 1, 0, 0])
    with pytest.raises(FilterError):
        parse_filter({"key": "a.[].b", "match": 1})


def test_nested_condition(tmp_path):
    """`nested`: ONE element satisfies the whole inner filter — unlike
    independent path conditions that different elements may satisfy."""
    store, _ = _make_array_store(tmp_path)
    # row 0: kind=a&price<5 on the SAME element; row 1's kind=a element
    # costs 20 (its cheap element is kind=c) -> paths say yes, nested no
    paths = payload_mask(store, {"must": [
        {"key": "items.kind", "match": "a"},
        {"key": "items.price", "range": {"lt": 5}}]})
    np.testing.assert_array_equal(paths, [1, 1, 0, 0])
    nested = payload_mask(store, {"must": [{"nested": {
        "key": "items", "filter": {"must": [
            {"key": "kind", "match": "a"},
            {"key": "price", "range": {"lt": 5}}]}}}]})
    np.testing.assert_array_equal(nested, [1, 0, 0, 0])
    # must_not binds per element too: an element with kind!=b and
    # price<5 — row 1's kind=c/price=1 element qualifies
    m = payload_mask(store, {"must": [{"nested": {
        "key": "items", "filter": {
            "must": [{"key": "price", "range": {"lt": 5}}],
            "must_not": [{"key": "kind", "match": "b"}]}}}]})
    np.testing.assert_array_equal(m, [1, 1, 0, 0])
    # datetime + dotted path inside the element filter
    m = payload_mask(store, {"must": [{"nested": {
        "key": "items", "filter": {"must": [
            {"key": "ts", "datetime_range": {"gte": "2024-01-01"}}]}}}]})
    np.testing.assert_array_equal(m, [1, 0, 0, 0])
    # bare top-level nested (no must wrapper) parses as one condition
    m = payload_mask(store, {"nested": {
        "key": "items", "filter": {"kind": "a", "price": {"lt": 5}}}})
    np.testing.assert_array_equal(m, [1, 0, 0, 0])
    with pytest.raises(FilterError):
        parse_filter({"nested": {"key": "items",
                                 "filter": {"has_id": [1]}}})
    with pytest.raises(FilterError):
        parse_filter({"nested": {"key": "items"}})


def test_array_bigint_collision_and_validation(tmp_path):
    """Big-int elements must not f64-collide with nearby match values
    (the element scatter is rechecked in python), token-less text
    queries and fractional values_count bounds are parse errors, and
    an empty path projection is MISSING (exists=False finds it)."""
    payloads = [{"n": [2**53 + 1]}, {"n": [2**53]}, {"n": 7},
                {"items": []}, {"items": [{"kind": "x"}]}]
    vecs = random_unit(np.random.default_rng(9), len(payloads), 8)
    with VectorStore.create(str(tmp_path), "bi", 8) as s:
        s.append(vecs, payloads)
    store = VectorStore.open(str(tmp_path), "bi")
    m = payload_mask(store, {"key": "n", "match": 2**53})
    np.testing.assert_array_equal(m, [0, 1, 0, 0, 0])
    m = payload_mask(store, {"key": "n", "match": 2**53 + 1})
    np.testing.assert_array_equal(m, [1, 0, 0, 0, 0])
    # except inherits the exactness (a collision would wrongly DROP)
    m = payload_mask(store, {"key": "n", "match": {"except": [2**53]}})
    np.testing.assert_array_equal(m, [1, 0, 1, 1, 1])
    # empty projection: no price value anywhere at the path
    m = payload_mask(store, {"key": "items.price", "exists": True})
    np.testing.assert_array_equal(m, [0, 0, 0, 0, 0])
    m = payload_mask(store, {"key": "items.price", "exists": False})
    np.testing.assert_array_equal(m, [1, 1, 1, 1, 1])
    with pytest.raises(FilterError):
        parse_filter({"key": "caption", "match": {"text": "  ...  "}})
    with pytest.raises(FilterError):
        parse_filter({"key": "tags", "values_count": {"gte": 2.5}})
    with pytest.raises(FilterError):
        parse_filter({"key": "tags", "values_count": {"gte": None}})


def test_min_should(tmp_path):
    store, _ = _make_array_store(tmp_path)
    spec = {"min_should": {"conditions": [
        {"key": "tags", "match": "car"},
        {"key": "n", "range": {"gte": 5}},
        {"key": "meta.cls", "exists": True}], "min_count": 2}}
    # r0 hits all three; r1 hits n>=5 + meta.cls; r2 hits tags only
    np.testing.assert_array_equal(payload_mask(store, spec),
                                  [1, 1, 0, 0])
    spec["min_should"]["min_count"] = 3
    np.testing.assert_array_equal(payload_mask(store, spec),
                                  [1, 0, 0, 0])
    # combines with must / must_not
    both = {"must": [{"key": "region_id", "match": {"except": ["r0"]}}],
            **spec}
    np.testing.assert_array_equal(payload_mask(store, both),
                                  [0, 0, 0, 0])
    for bad in ({"conditions": []}, {"conditions": [], "min_count": 0},
                {"conditions": [], "min_count": True}):
        with pytest.raises(FilterError):
            parse_filter({"min_should": bad})


def test_array_columns_persist_roundtrip(tmp_path, monkeypatch):
    """Element arrays and path columns rebuild identically from the
    on-disk column cache (they derive from the persisted odd values)."""
    store, _ = _make_array_store(tmp_path)
    cols = PayloadColumns(store)
    keys = ["tags", "n", "meta.cls", "items.price"]
    cols.ensure(keys)
    assert cols.persist(keys)
    cols2 = PayloadColumns(store)
    monkeypatch.setattr(
        PayloadColumns, "_extract_python",
        lambda self, m: (_ for _ in ()).throw(AssertionError("streamed")))
    monkeypatch.setattr(
        PayloadColumns, "_extract_native",
        lambda self, m: (_ for _ in ()).throw(AssertionError("streamed")))
    cols2.ensure(keys)
    for spec in [{"key": "tags", "match": "car"},
                 {"key": "tags", "match": {"except": ["car"]}},
                 {"key": "n", "range": {"gte": 5}},
                 {"key": "meta.cls", "match": "person"},
                 {"key": "items.price", "range": {"lte": 2}},
                 {"key": "tags", "values_count": {"gte": 2}},
                 {"must": [{"is_empty": {"key": "n"}}]}]:
        np.testing.assert_array_equal(
            evaluate_filter(parse_filter(spec), cols2),
            evaluate_filter(parse_filter(spec), cols), err_msg=str(spec))


def _reference_eval(cond, col):
    """Python-semantics reference for one condition over an object
    column: python equality (True == 1, exact big ints) plus qdrant's
    array semantics — a list payload matches when ANY element does."""
    from reverso_tpu.store.filter import _MISSING, _numeric

    def match1(v, value):
        if v is _MISSING:
            return False
        if v == value:
            return True
        return isinstance(v, list) and any(e == value for e in v)

    if cond.op == "exists":
        present = col != _MISSING
        return present if cond.value else ~present
    if cond.op == "match":
        return np.fromiter((match1(v, cond.value) for v in col),
                           np.bool_, count=len(col))
    if cond.op == "any":
        return np.fromiter(
            (any(match1(v, a) for a in cond.value) for v in col),
            np.bool_, count=len(col))

    def in_range(x, r):
        if not (isinstance(x, (int, float)) and not isinstance(x, bool)):
            return False
        x = float(x)                # f64 semantics, like the view arrays
        return (("gt" not in r or x > float(r["gt"]))
                and ("gte" not in r or x >= float(r["gte"]))
                and ("lt" not in r or x < float(r["lt"]))
                and ("lte" not in r or x <= float(r["lte"])))

    r = cond.value
    if not r:                       # empty range matches everything
        return np.ones(col.shape, np.bool_)
    return np.fromiter(
        (any(in_range(e, r) for e in v) if isinstance(v, list)
         else in_range(v, r) for v in col), np.bool_, count=len(col))


def test_typed_view_vectorized_parity(tmp_path):
    """The memoized TypedView fast path must match python-equality
    semantics exactly over an adversarial value mix: bools vs 1/0,
    big ints beyond 2^53, None, NaN, lists, dicts, unicode strings."""
    from reverso_tpu.store.filter import Condition

    values = ["person", "café ❤", "", "1", True, False, 1, 0, -3,
              2**53 + 1, -(2**60) - 7, 0.5, 1.0, float("nan"),
              None, [1, 2], {"a": 1}, 3.5, "person", 2**53 + 1,
              # arrays: any-element semantics, incl. odd elements
              ["person", True], [2**53 + 1, None], [[1, 2], {"a": 1}],
              [], [0.5, "1"], [False]]
    payloads = [{"v": v, "i": i} for i, v in enumerate(values)]
    payloads.append({"i": len(values)})            # row missing "v"
    d = 8
    vecs = random_unit(np.random.default_rng(0), len(payloads), d)
    with VectorStore.create(str(tmp_path), "tv", d) as s:
        s.append(vecs, payloads)
    store = VectorStore.open(str(tmp_path), "tv")
    cols = PayloadColumns(store)
    col = cols.column("v")

    conds = [Condition("v", "match", m) for m in
             ["person", "café ❤", "", "1", "nope", True, False,
              1, 0, 1.0, 0.5, 2**53, 2**53 + 1, 2**53 + 2,
              float(2**53), -(2**60) - 7,
              None, [1, 2], {"a": 1}, 3.5, float("nan")]]
    conds += [Condition("v", "any", a) for a in
              [["person", 1], [True, 0.5], [None, ""],
               [2**53 + 1, "1"], []]]
    conds += [Condition("v", "range", r) for r in
              [{"gte": 0}, {"gt": 0.5, "lte": 1}, {"lt": -1},
               {"gte": 2**53}, {}]]
    conds += [Condition("v", "exists", True),
              Condition("v", "exists", False)]
    from reverso_tpu.store.filter import _eval_condition
    for cond in conds:
        got = _eval_condition(cond, cols)
        want = _reference_eval(cond, col)
        np.testing.assert_array_equal(
            got, want, err_msg=f"{cond.op} {cond.value!r}")
    # memoization: second evaluation reuses the view object
    assert cols.view("v") is cols.view("v")


def test_paycols_persist_roundtrip(tmp_path, monkeypatch):
    """The on-disk column cache must reconstruct columns element- AND
    type-identically (ints vs floats vs bools vs NaN vs big ints vs
    lists), and a fresh process must serve filters from it without
    touching the JSONL."""
    from reverso_tpu.store import filter as fmod

    values = ["person", "café ❤", "", True, False, 1, 0, -3,
              2**53 + 1, 0.5, 1.0, float("nan"), None, [1, 2],
              {"a": 1}, "person"]
    payloads = [{"v": v, "n": float(i)} for i, v in enumerate(values)]
    payloads.append({"n": 99.0})                  # missing "v"
    vecs = random_unit(np.random.default_rng(0), len(payloads), 8)
    with VectorStore.create(str(tmp_path), "pc", 8) as s:
        s.append(vecs, payloads)
    store = VectorStore.open(str(tmp_path), "pc")
    cols = PayloadColumns(store)
    cols.ensure(["v", "n"])
    path = cols.persist(["v", "n"])
    assert path and path.endswith(".npz")

    # fresh instance: loads from the cache — extraction is forbidden
    cols2 = PayloadColumns(store)
    monkeypatch.setattr(
        PayloadColumns, "_extract_python",
        lambda self, m: (_ for _ in ()).throw(AssertionError("streamed")))
    monkeypatch.setattr(
        PayloadColumns, "_extract_native",
        lambda self, m: (_ for _ in ()).throw(AssertionError("streamed")))
    cols2.ensure(["v", "n"])
    a, b = cols.column("v"), cols2.column("v")
    for x, y in zip(a.tolist(), b.tolist()):
        if isinstance(x, float) and np.isnan(x):
            assert isinstance(y, float) and np.isnan(y)
        else:
            assert x == y and type(x) is type(y), (x, y)
    # filters evaluate identically through the loaded views
    for spec in [{"v": "person"}, {"v": True}, {"v": 1},
                 {"v": {"gte": 0}}, {"v": 2**53 + 1},
                 "n>=3, n<10", {"v": ["person", 0.5]}]:
        np.testing.assert_array_equal(
            evaluate_filter(parse_filter(spec), cols2),
            evaluate_filter(parse_filter(spec), cols), err_msg=str(spec))

    # mutation invalidates by filename: the stale cache never matches
    w = VectorStore.open(str(tmp_path), "pc", writable=True)
    w.update_payloads([0], patch={"v": "edited"}, mode="set")
    w.close()
    store2 = VectorStore.open(str(tmp_path), "pc")
    cols3 = PayloadColumns(store2)
    monkeypatch.undo()
    cols3.ensure(["v"])
    assert cols3.column("v")[0] == "edited"
    # persist for the new version sweeps the stale file
    new_path = cols3.persist(["v"])
    assert new_path != path
    import os as _os
    assert not _os.path.exists(path) and _os.path.exists(new_path)


def test_paycols_auto_persist_and_guard(tmp_path, monkeypatch):
    from reverso_tpu.store import filter as fmod

    n = 64
    payloads = [{"detected_class": "person" if i % 2 else "car",
                 "region_id": "u" * 200 + str(i)}    # huge unique strings
                for i in range(n)]
    vecs = random_unit(np.random.default_rng(1), n, 8)
    with VectorStore.create(str(tmp_path), "ap", 8) as s:
        s.append(vecs, payloads)
    store = VectorStore.open(str(tmp_path), "ap")
    monkeypatch.setattr(fmod, "_PERSIST_MIN_ROWS", 10)
    mask = payload_mask(store, {"detected_class": "person"})
    assert mask.sum() == 32
    import glob as _glob
    files = _glob.glob(str(tmp_path / "ap" / "index" / "paycols_*.npz"))
    assert len(files) == 1                      # auto-persisted
    with np.load(files[0]) as z:
        keys = {nm.split("::")[0] for nm in z.files}
    assert keys == {"detected_class"}
    # the guard skips the dictionary-heavy unique column on auto...
    cols = PayloadColumns(store)
    cols.ensure(["region_id"])
    assert cols.persist(["region_id"], force=False) is None
    # ...but explicit indexing takes it
    assert cols.persist(["region_id"], force=True)
    with np.load(_glob.glob(
            str(tmp_path / "ap" / "index" / "paycols_*.npz"))[0]) as z:
        keys = {nm.split("::")[0] for nm in z.files}
    assert keys == {"detected_class", "region_id"}  # merge-on-write
    # kill switch
    monkeypatch.setenv("REVERSO_PAYCOL_CACHE", "0")
    cols4 = PayloadColumns(store)
    cols4.ensure(["detected_class"])            # streams, doesn't load
    assert cols4.column("detected_class")[0] == "car"


def test_paycols_wrong_size_cache_falls_back(tmp_path):
    """A cache file whose arrays don't match the store's row count
    (e.g. copied from elsewhere under the right name) must fall back to
    extraction for that key — and must NOT leave a half-installed
    wrong-size view behind."""
    import os as _os
    vecs6 = random_unit(np.random.default_rng(0), 6, 8)
    with VectorStore.create(str(tmp_path), "a", 8) as s:
        s.append(vecs6, [{"c": "x"}] * 6)
    store_a = VectorStore.open(str(tmp_path), "a")
    ca = PayloadColumns(store_a)
    ca.ensure(["c"])
    src = ca.persist(["c"])
    with VectorStore.create(str(tmp_path), "b", 8) as s:
        s.append(random_unit(np.random.default_rng(1), 4, 8),
                 [{"c": f"v{i}"} for i in range(4)])
    store_b = VectorStore.open(str(tmp_path), "b")
    from reverso_tpu.store.filter import _paycols_path
    dst = _paycols_path(store_b)
    _os.makedirs(_os.path.dirname(dst), exist_ok=True)
    import shutil as _shutil
    _shutil.copy(src, dst)                  # 6-row arrays, 4-row store
    cb = PayloadColumns(store_b)
    cb.ensure(["c"])
    assert cb.column("c").tolist() == ["v0", "v1", "v2", "v3"]
    assert len(cb.view("c").present) == 4
    mask = payload_mask(store_b, {"c": "v2"})
    np.testing.assert_array_equal(mask, [False, False, True, False])


def test_cli_index_payload(tmp_path, capsys):
    from reverso_tpu.cli import main

    vecs = random_unit(np.random.default_rng(2), 12, 8)
    payloads = [{"detected_class": "car", "confidence": i / 12}
                for i in range(12)]
    root = str(tmp_path / "db")
    with VectorStore.create(root, "clidx", 8) as s:
        s.append(vecs, payloads)
    rc = main(["--db-root", root, "--model", "test-tiny",
               "index-payload", "clidx", "detected_class", "confidence"])
    out = capsys.readouterr().out
    assert rc == 0 and "Indexed payload keys" in out
    import glob as _glob
    assert _glob.glob(root + "/clidx/index/paycols_*.npz")


def test_native_columns_survive_torn_tail(tmp_path):
    """Crash between the jsonl append and the sidecar append leaves
    torn bytes after the last committed row with a sidecar of exactly
    `count` offsets. The native extraction must bound the last row's
    span at its own newline — not EOF — or parse_line rejects the
    trailing junk and the last row silently vanishes from filters."""
    from reverso_tpu.native import native_available
    from reverso_tpu.store.filter import _MISSING

    if not native_available():
        pytest.skip("native library unavailable")
    payloads = [{"filename": f"f{i}.jpg", "n": i} for i in range(5)]
    d = 8
    vecs = random_unit(np.random.default_rng(0), len(payloads), d)
    with VectorStore.create(str(tmp_path), "torn", d) as s:
        s.append(vecs, payloads)
    store = VectorStore.open(str(tmp_path), "torn")
    store._payload_offsets()          # sidecar now holds exactly 5 offsets
    import os as _os
    jsonl = _os.path.join(store.path, "payloads.jsonl")
    with open(jsonl, "ab") as f:      # torn partial line, no sidecar entry
        f.write(b'{"filename": "torn')
    pc = PayloadColumns(store)
    cols = pc._extract_native(["filename", "n"])
    assert cols is not None
    assert cols["filename"][4] == "f4.jpg"
    assert cols["n"][4] == 4
    mask = payload_mask(store, "n>=4")
    np.testing.assert_array_equal(mask, [False] * 4 + [True])


# ---------------------------------------------------------------------------
# masked top-k exactness (every index path)
# ---------------------------------------------------------------------------

def filtered_truth(db, qs, mask, k):
    """fp64 exact top-k over the masked subset, ids in original space."""
    ids = np.nonzero(mask)[0]
    if len(ids) == 0:
        q = qs.shape[0]
        return (np.full((q, k), -np.inf), np.full((q, k), -1, np.int32))
    s, i = numpy_topk64(db[ids], qs, min(k, len(ids)))
    i = ids[i].astype(np.int32)
    if i.shape[1] < k:
        pad = k - i.shape[1]
        s = np.pad(s, ((0, 0), (0, pad)), constant_values=-np.inf)
        i = np.pad(i, ((0, 0), (0, pad)), constant_values=-1)
    return s, i


def assert_masked_equiv(db, qs, mask, s, i, k, tol=2e-3):
    ts, ti = filtered_truth(db, qs, mask, k)
    s, i = np.asarray(s), np.asarray(i)
    valid = ti >= 0
    np.testing.assert_array_equal(i < 0, ~valid)
    # every returned id satisfies the mask
    assert mask[i[valid]].all()
    np.testing.assert_allclose(np.where(valid, s, 0.0),
                               np.where(valid, ts, 0.0), atol=tol)
    # ids match exactly where margins are clear
    clear = np.ones_like(valid)
    clear[:, :-1] &= (ts[:, :-1] - ts[:, 1:]) > tol
    clear[:, 1:] &= (ts[:, :-1] - ts[:, 1:]) > tol
    np.testing.assert_array_equal(np.where(clear & valid, i, -1),
                                  np.where(clear & valid, ti, -1))


@pytest.fixture(scope="module")
def masked_case():
    rng = np.random.default_rng(7)
    db = random_unit(rng, 3000, 64)
    qs = random_unit(rng, 9, 64)
    mask = rng.random(3000) < 0.3
    return db, qs, mask


def test_topk_xla_row_mask(masked_case):
    db, qs, mask = masked_case
    s, i = jax.device_get(cosine_topk_xla(
        jnp.asarray(db), jnp.asarray(qs), 10, row_mask=jnp.asarray(mask)))
    assert_masked_equiv(db, qs, mask, s, i, 10)


def test_topk_int8_xla_row_mask(masked_case):
    db, qs, mask = masked_case
    db_i8, scale = quantize_db_int8(jnp.asarray(db))
    s, i = jax.device_get(cosine_topk_int8_xla(
        db_i8, scale, jnp.asarray(qs), 10, row_mask=jnp.asarray(mask),
        chunk=1024))
    # truth against the DEQUANTIZED matrix (int8 storage rounding)
    deq = np.asarray(db_i8, np.float32) * float(scale)
    assert_masked_equiv(deq, qs, mask, s, i, 10, tol=1e-5)


def test_sharded_row_mask_matches_single(masked_case):
    db, qs, mask = masked_case
    mesh = make_mesh()
    n = (len(db) // (8 * 8)) * 8 * 8            # divisible shard size
    db8, mask8 = db[:n], mask[:n]
    s1, i1 = jax.device_get(cosine_topk_xla(
        jnp.asarray(db8), jnp.asarray(qs), 10, row_mask=jnp.asarray(mask8)))
    s2, i2 = jax.device_get(sharded_cosine_topk(
        shard_rows(jnp.asarray(db8), mesh), replicate(jnp.asarray(qs), mesh),
        10, mesh, row_mask=jax.device_put(
            jnp.asarray(mask8),
            jax.sharding.NamedSharding(mesh,
                                       jax.sharding.PartitionSpec("data")))))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-6)


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_device_index_row_mask(masked_case, dtype):
    db, qs, mask = masked_case
    idx = DeviceIndex(db, dtype=dtype)
    s, i = jax.device_get(idx.search(qs, 10, row_mask=mask))
    if dtype == "int8":
        ref = np.asarray(
            jnp.asarray(np.clip(np.round(
                db / idx.scale), -127, 127), jnp.int8),
            np.float32) * idx.scale
        assert_masked_equiv(ref, qs, mask, s, i, 10, tol=1e-5)
    else:
        assert_masked_equiv(db, qs, mask, s, i, 10, tol=1e-5)


def test_device_index_row_mask_mesh(masked_case):
    db, qs, mask = masked_case
    mesh = make_mesh()
    idx = DeviceIndex(db, mesh=mesh, dtype="float32")
    s, i = jax.device_get(idx.search(qs, 10, row_mask=mask))
    assert_masked_equiv(db, qs, mask, s, i, 10, tol=1e-5)


def test_host_index_row_mask(masked_case):
    db, qs, mask = masked_case
    idx = HostIndex(db)
    s, i = idx.search(qs, 10, row_mask=mask)
    assert_masked_equiv(db, qs, mask, s, i, 10, tol=1e-5)


def test_row_mask_all_false(masked_case):
    db, qs, _ = masked_case
    idx = DeviceIndex(db[:256], dtype="float32")
    s, i = jax.device_get(idx.search(qs, 5,
                                     row_mask=np.zeros(256, bool)))
    assert (i == -1).all() and np.isneginf(s).all()


def test_row_mask_fewer_than_k(masked_case):
    db, qs, _ = masked_case
    mask = np.zeros(len(db), bool)
    mask[[5, 17, 99]] = True
    idx = DeviceIndex(db, dtype="float32")
    s, i = jax.device_get(idx.search(qs, 10, row_mask=mask))
    assert ((i >= 0).sum(axis=1) == 3).all()
    assert set(i[i >= 0].tolist()) == {5, 17, 99}


# ---------------------------------------------------------------------------
# IVF filtered search
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ivf_corpus():
    rng = np.random.default_rng(3)
    centers = random_unit(rng, 16, 64)
    rows = []
    for c in centers:
        pts = c[None] + 0.15 * rng.standard_normal((120, 64)).astype(np.float32)
        rows.append(pts / np.linalg.norm(pts, axis=1, keepdims=True))
    db = np.concatenate(rows)
    return db[rng.permutation(len(db))].astype(np.float32)


def test_ivf_row_mask_full_probe_exact(ivf_corpus):
    rng = np.random.default_rng(4)
    qs = random_unit(rng, 6, 64)
    mask = rng.random(len(ivf_corpus)) < 0.4
    idx = IVFIndex(ivf_corpus, n_clusters=16, dtype="float32", seed=0)
    s, i = jax.device_get(idx.search(qs, 10, nprobe=16, row_mask=mask))
    assert_masked_equiv(ivf_corpus, qs, mask, s, i, 10, tol=1e-4)


def test_ivf_row_mask_spill(ivf_corpus):
    """Spilled copies inherit the mask bit; dedup still holds."""
    rng = np.random.default_rng(5)
    qs = random_unit(rng, 4, 64)
    mask = rng.random(len(ivf_corpus)) < 0.5
    idx = IVFIndex(ivf_corpus, n_clusters=16, dtype="float32", seed=0,
                   spill=0.2)
    s, i = jax.device_get(idx.search(qs, 10, nprobe=16, row_mask=mask))
    assert_masked_equiv(ivf_corpus, qs, mask, s, i, 10, tol=1e-4)
    for row in i:
        got = row[row >= 0]
        assert len(set(got.tolist())) == len(got)


def test_ivf_sharded_row_mask(ivf_corpus):
    rng = np.random.default_rng(6)
    qs = random_unit(rng, 4, 64)
    mask = rng.random(len(ivf_corpus)) < 0.4
    single = IVFIndex(ivf_corpus, n_clusters=8, dtype="float32", seed=0)
    mesh = make_mesh()
    sharded = IVFIndex(ivf_corpus, n_clusters=8, dtype="float32", seed=0,
                       mesh=mesh)
    s1, i1 = jax.device_get(single.search(qs, 10, nprobe=8, row_mask=mask))
    s2, i2 = jax.device_get(sharded.search(qs, 10, nprobe=8, row_mask=mask))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)


# ---------------------------------------------------------------------------
# engine end-to-end
# ---------------------------------------------------------------------------

def test_engine_filtered_search(tmp_path):
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso
    from reverso_tpu.models.pe import PerceptionEncoder

    model = dataclasses.replace(MODEL_PRESETS["test-tiny"], dtype="float32")
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=model,
        store=dataclasses.replace(cfg.store,
                                  root_dir=str(tmp_path / "db")))
    engine = Reverso(cfg, encoder=PerceptionEncoder(model))

    rng = np.random.default_rng(0)
    d = engine.encoder.embed_dim
    vecs = random_unit(rng, 30, d)
    payloads = [{"filename": f"f{i}.jpg", "region_id": f"r{i}",
                 "detected_class": "person" if i < 10 else "car",
                 "confidence": i / 30}
                for i in range(30)]
    with VectorStore.create(str(tmp_path / "db"), "named", d) as s:
        s.append(vecs, payloads)
    engine.load_database("named")

    # query = row 20 (a car); filter to persons -> best person, not row 20
    text, items = engine.search_similar(
        similarity_threshold=-1.0, embeddings=vecs[20:21],
        filter={"detected_class": "person"})
    assert items
    assert all(it["payload"]["detected_class"] == "person" for it in items)

    scores, ids = engine.search_batch(vecs[:4], k=5,
                                      filter="confidence>=0.5")
    assert (ids[ids >= 0] >= 15).all()

    # unfiltered still sees everything (row 20 is its own best match)
    _, items = engine.search_similar(similarity_threshold=-1.0,
                                     embeddings=vecs[20:21])
    assert items[0]["payload"]["filename"] == "f20.jpg"

    # column cache refreshes after an append through another handle
    with VectorStore.open(str(tmp_path / "db"), "named",
                          writable=True) as w:
        w.append(random_unit(rng, 2, d),
                 [{"filename": "new0.jpg", "detected_class": "person",
                   "region_id": "n0", "confidence": 1.0},
                  {"filename": "new1.jpg", "detected_class": "person",
                   "region_id": "n1", "confidence": 1.0}])
    scores, ids = engine.search_batch(vecs[:1], k=40,
                                      filter={"detected_class": "person"})
    assert (ids >= 0).sum() == 12          # 10 old + 2 new persons


# ---------------------------------------------------------------------------
# fused-kernel mask path (streams the mask beside the db tiles)
# ---------------------------------------------------------------------------

def test_topk_pallas_row_mask(masked_case):
    from reverso_tpu.ops.topk import cosine_topk_pallas
    db, qs, mask = masked_case
    s, i = jax.device_get(cosine_topk_pallas(
        jnp.asarray(db, jnp.float32), jnp.asarray(qs, jnp.float32), 10,
        db_tile=256, row_mask=mask))
    assert_masked_equiv(db, qs, mask, s, i, 10, tol=1e-5)
    # bitwise-identical to the masked XLA scan (f32 everywhere)
    s2, i2 = jax.device_get(cosine_topk_xla(
        jnp.asarray(db, jnp.float32), jnp.asarray(qs, jnp.float32), 10,
        row_mask=jnp.asarray(mask)))
    np.testing.assert_array_equal(i, i2)


def test_topk_pallas_row_mask_sparse_and_empty(masked_case):
    from reverso_tpu.ops.topk import cosine_topk_pallas
    db, qs, _ = masked_case
    mask = np.zeros(len(db), bool)
    s, i = jax.device_get(cosine_topk_pallas(
        jnp.asarray(db, jnp.float32), jnp.asarray(qs, jnp.float32), 5,
        db_tile=256, row_mask=mask))
    assert (i == -1).all() and np.isneginf(s).all()
    mask[[17, 1234, 2999]] = True     # fewer matches than k
    s, i = jax.device_get(cosine_topk_pallas(
        jnp.asarray(db, jnp.float32), jnp.asarray(qs, jnp.float32), 5,
        db_tile=256, row_mask=mask))
    assert ((i >= 0).sum(axis=1) == 3).all()
    assert set(i[i >= 0].tolist()) == {17, 1234, 2999}


def test_topk_int8_exact_row_mask(masked_case):
    from reverso_tpu.ops.topk import cosine_topk_int8_exact
    db, qs, mask = masked_case
    db_i8, scale = quantize_db_int8(jnp.asarray(db))
    s, i = jax.device_get(cosine_topk_int8_exact(
        db_i8, scale, jnp.asarray(qs, jnp.float32), 10, db_tile=256,
        row_mask=mask))
    # bitwise equal ids/scores vs the masked chunked int8 XLA scan is
    # not guaranteed (different combine), but id sets at clear margins
    # and exactness vs the dequantized matrix are
    deq = np.asarray(db_i8, np.float32) * float(scale)
    assert_masked_equiv(deq, qs, mask, s, i, 10, tol=2e-4)


def test_sharded_pallas_row_mask(masked_case):
    """Masked sharded scan on the kernel path == single-device kernel."""
    from reverso_tpu.ops.topk import cosine_topk_pallas
    db, qs, mask = masked_case
    mesh = make_mesh()
    n = (len(db) // (8 * 64)) * 8 * 64
    db8, mask8 = np.asarray(db[:n], np.float32), mask[:n]
    s1, i1 = jax.device_get(cosine_topk_pallas(
        jnp.asarray(db8), jnp.asarray(qs, jnp.float32), 10, db_tile=64,
        row_mask=mask8))
    s2, i2 = jax.device_get(sharded_cosine_topk(
        shard_rows(jnp.asarray(db8), mesh),
        replicate(jnp.asarray(qs, jnp.float32), mesh),
        10, mesh, impl="pallas", row_mask=jax.device_put(
            jnp.asarray(mask8),
            jax.sharding.NamedSharding(mesh,
                                       jax.sharding.PartitionSpec("data")))))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-6)


# ---------------------------------------------------------------------------
# full-text inverted index (store/text.py — qdrant text payload index)
# ---------------------------------------------------------------------------

def test_text_index_parity_fuzz(tmp_path, monkeypatch):
    """The inverted-index text/phrase path returns bitwise-identical
    masks to the legacy per-unique evaluator on adversarial corpora:
    repeated tokens, substring-vs-token traps, unicode, arrays of
    strings, missing keys, non-string rows."""
    rng = np.random.default_rng(9)
    words = ["fox", "quick", "brown", "the", "a", "лиса", "42",
             "foxes", "qu", "ick", "x"]
    payloads = []
    for i in range(120):
        kind = rng.integers(0, 5)
        if kind == 0:
            payloads.append({})                       # missing key
        elif kind == 1:
            payloads.append({"cap": int(i)})          # non-string
        elif kind == 2:
            toks = rng.choice(words, rng.integers(0, 6))
            payloads.append({"cap": " ".join(toks)})
        elif kind == 3:                               # punctuated
            toks = rng.choice(words, rng.integers(1, 4))
            payloads.append({"cap": "!,".join(toks) + "."})
        else:                                         # array payload
            vals = [" ".join(rng.choice(words, rng.integers(0, 4)))
                    for _ in range(rng.integers(0, 3))]
            payloads.append({"cap": vals})
    vecs = random_unit(rng, len(payloads), 8)
    with VectorStore.create(str(tmp_path), "txt", 8) as s:
        s.append(vecs, payloads)
    store = VectorStore.open(str(tmp_path), "txt")
    queries = (["fox", "quick fox", "FOX Quick", "fox fox",
                "foxes", "qu", "лиса", "42 the", "brown a x the"]
               + [" ".join(rng.choice(words, rng.integers(1, 4)))
                  for _ in range(12)])
    for q in queries:
        for op in ("text", "phrase"):
            spec = {"key": "cap", "match": {op: q}}
            monkeypatch.setenv("REVERSO_TEXT_INDEX", "0")
            legacy = payload_mask(store, spec)
            monkeypatch.setenv("REVERSO_TEXT_INDEX", "1")
            indexed = payload_mask(store, spec)
            np.testing.assert_array_equal(indexed, legacy,
                                          err_msg=f"{op} {q!r}")
    store.close()


def test_text_index_persist_and_reload(tmp_path, monkeypatch):
    """index_payload(text=True) persists the postings next to the
    typed views; a fresh process loads them without rebuilding, and a
    digest mismatch falls back to a clean rebuild."""
    import reverso_tpu.store.text as text_mod
    from reverso_tpu.store.filter import PayloadColumns, parse_filter, \
        evaluate_filter

    payloads = [{"cap": f"sentence number {i} quick brown fox"}
                for i in range(30)]
    vecs = random_unit(np.random.default_rng(0), len(payloads), 8)
    with VectorStore.create(str(tmp_path), "txtp", 8) as s:
        s.append(vecs, payloads)
    store = VectorStore.open(str(tmp_path), "txtp")
    cols = PayloadColumns(store)
    cols.ensure(["cap"])
    path = cols.persist_text(["cap"])
    assert path is not None

    # fresh columns: the index must come from disk, not a rebuild
    def boom(*a, **k):
        raise AssertionError("TextIndex rebuilt despite persisted cache")
    monkeypatch.setattr(text_mod.TextIndex, "build", boom)
    cols2 = PayloadColumns(store)
    filt = parse_filter({"key": "cap", "match": {"phrase": "quick brown"}})
    cols2.ensure(["cap"])
    m = evaluate_filter(filt, cols2)
    assert m.all()
    monkeypatch.undo()

    # digest mismatch (simulate a cache paired with a different
    # dictionary): loader must reject and rebuild
    import numpy as _np
    monkeypatch.setattr(text_mod, "uniq_digest",
                        lambda uniq: _np.zeros(16, _np.uint8) - 1)
    cols3 = PayloadColumns(store)
    cols3.ensure(["cap"])
    m2 = evaluate_filter(filt, cols3)
    np.testing.assert_array_equal(m2, m)
    store.close()


def test_text_index_engine_and_cli(tmp_path, capsys):
    from reverso_tpu.cli import main

    root = str(tmp_path / "db")
    payloads = [{"region_id": f"r{i}",
                 "cap": ("quick brown fox" if i % 2 else "lazy dog")}
                for i in range(10)]
    vecs = random_unit(np.random.default_rng(1), len(payloads), 8)
    import os as _os
    _os.makedirs(root, exist_ok=True)
    with VectorStore.create(root, "txtc", 8) as s:
        s.append(vecs, payloads)
    rc = main(["--db-root", root, "--model", "test-tiny",
               "index-payload", "txtc", "cap", "--text"])
    out = capsys.readouterr()
    assert rc == 0, out.err
    assert "text-indexed" in out.out
    store = VectorStore.open(root, "txtc")
    m = payload_mask(store, {"key": "cap", "match": {"phrase": "brown fox"}})
    np.testing.assert_array_equal(m, [i % 2 == 1 for i in range(10)])
    store.close()
