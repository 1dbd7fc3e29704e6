"""Payload filters: qdrant-style metadata conditions compiled to a row mask.

The reference embeds qdrant local mode as its store, whose search API
accepts payload filters (must / should / must_not conditions) even
though the app itself only ever passed `score_threshold`
(reference core_system.py:659-664). This module supplies that
capability for the TPU store: a filter is parsed host-side, payload
columns are extracted once per store version into numpy arrays, and
the filter evaluates to a boolean row mask. The device kernels apply
the mask exactly (masked rows score -inf before k-selection), so
filtered search keeps the exact `(-score, idx)` result contract —
a filtered top-k equals the brute-force scan over the matching subset.

Filter spec (dict form, qdrant-shaped):

    {"must":     [cond, ...],   # all must match
     "should":   [cond, ...],   # at least one must match (if present)
     "must_not": [cond, ...]}   # none may match

with each condition one of

    {"key": K, "match": v}              # payload[K] == v
    {"key": K, "match": {"value": v}}   # qdrant's canonical wrapper
    {"key": K, "match": {"any": [...]}} # qdrant's set-match wrapper
    {"key": K, "any": [v1, v2, ...]}    # payload[K] in {v1, v2, ...}
    {"key": K, "range": {"gt"|"gte"|"lt"|"lte": x, ...}}
    {"key": K, "exists": True|False}
    nested filter dict                  # recursive must/should/must_not

plus shorthand: a dict without must/should/must_not is a conjunction,
`{"detected_class": "person", "confidence": {"gte": 0.5}}` — scalar
values mean `match`, lists mean `any`, range-keyed dicts mean `range`.

String form (the CLI's `--filter`): comma-separated clauses
`key=value`, `key!=value`, `key>=x`, `key<=x`, `key>x`, `key<x`;
numeric-looking values compare numerically for the ordered operators.
"""
from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

import numpy as np

_RANGE_OPS = ("gt", "gte", "lt", "lte")


class FilterError(ValueError):
    """Malformed filter spec."""


# ---------------------------------------------------------------------------
# Parsing
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Condition:
    key: str
    op: str                      # "match" | "any" | "range" | "exists"
    value: Any = None

    def keys(self) -> set:
        return {self.key}


@dataclass(frozen=True)
class Filter:
    must: tuple = ()
    should: tuple = ()
    must_not: tuple = ()

    def keys(self) -> set:
        out: set = set()
        for clause in (self.must, self.should, self.must_not):
            for c in clause:
                out |= c.keys()
        return out

    def is_empty(self) -> bool:
        return not (self.must or self.should or self.must_not)


def _parse_condition(spec: Any) -> "Condition | Filter":
    if isinstance(spec, (Filter, Condition)):
        return spec
    if not isinstance(spec, dict):
        raise FilterError(f"condition must be a dict, got {type(spec).__name__}")
    if any(k in spec for k in ("must", "should", "must_not")):
        return parse_filter(spec)
    if "key" in spec:
        key = spec["key"]
        ops = [k for k in ("match", "any", "range", "exists") if k in spec]
        if len(ops) != 1:
            raise FilterError(
                f"condition for key {key!r} needs exactly one of "
                f"match/any/range/exists, got {sorted(spec)}")
        op = ops[0]
        value = spec[op]
        if op == "match" and isinstance(value, dict):
            # qdrant's canonical wrappers: {"match": {"value": v}} and
            # {"match": {"any": [...]}} — unwrap rather than comparing
            # the wrapper dict itself (which would silently match nothing)
            if set(value) == {"value"}:
                value = value["value"]
            elif set(value) == {"any"}:
                op, value = "any", value["any"]
            else:
                raise FilterError(
                    f"match for key {key!r} must be a scalar, "
                    f"{{'value': v}}, or {{'any': [...]}}, got {value!r}")
        if op == "range":
            if not isinstance(value, dict) or not value or \
                    not set(value) <= set(_RANGE_OPS):
                raise FilterError(
                    f"range for key {key!r} must be a dict with keys from "
                    f"{_RANGE_OPS}, got {value!r}")
            value = {k: float(v) for k, v in value.items()}
        elif op == "any":
            value = tuple(value)
        elif op == "exists":
            value = bool(value)
        return Condition(str(key), op, value)
    raise FilterError(f"condition dict needs a 'key': {spec!r}")


def _shorthand_condition(key: str, value: Any) -> Condition:
    if isinstance(value, dict):
        if set(value) <= set(_RANGE_OPS) and value:
            return Condition(key, "range", {k: float(v)
                                            for k, v in value.items()})
        raise FilterError(
            f"shorthand value for {key!r} must be a scalar, list, or "
            f"range dict ({_RANGE_OPS}), got {value!r}")
    if isinstance(value, (list, tuple, set)):
        return Condition(key, "any", tuple(value))
    return Condition(key, "match", value)


def parse_filter(spec: Any) -> Filter:
    """Normalize any accepted spec (dict, string, Filter) to a Filter."""
    if spec is None:
        return Filter()
    if isinstance(spec, Filter):
        return spec
    if isinstance(spec, str):
        return _parse_filter_string(spec)
    if isinstance(spec, (list, tuple)):
        # list of string clauses (repeatable CLI flag)
        merged = Filter()
        for part in spec:
            f = parse_filter(part)
            merged = Filter(merged.must + f.must, merged.should + f.should,
                            merged.must_not + f.must_not)
        return merged
    if not isinstance(spec, dict):
        raise FilterError(f"cannot parse filter from {type(spec).__name__}")
    if any(k in spec for k in ("must", "should", "must_not")):
        extra = set(spec) - {"must", "should", "must_not"}
        if extra:
            raise FilterError(f"unknown filter clauses: {sorted(extra)}")

        def clause(name: str) -> tuple:
            items = spec.get(name, ())
            if isinstance(items, dict):
                items = (items,)
            return tuple(_parse_condition(c) for c in items)
        return Filter(clause("must"), clause("should"), clause("must_not"))
    if "key" in spec and any(k in spec
                             for k in ("match", "any", "range", "exists")):
        return Filter((_parse_condition(spec),))     # bare condition dict
    return Filter(tuple(_shorthand_condition(k, v) for k, v in spec.items()))


_CLAUSE_RE = re.compile(
    r"^\s*([A-Za-z0-9_.\-]+)\s*(>=|<=|!=|=|>|<)\s*(.*?)\s*$")


def _parse_scalar(text: str) -> Any:
    low = text.lower()
    if low in ("true", "false"):
        return low == "true"
    if low in ("null", "none"):
        return None
    try:
        return int(text)
    except ValueError:
        pass
    try:
        return float(text)
    except ValueError:
        pass
    return text.strip("\"'")


def _parse_filter_string(text: str) -> Filter:
    """`key=v,key2>=3` — comma-separated conjunction of clauses.

    A JSON object string is also accepted and parsed as the dict form.
    """
    text = text.strip()
    if not text:
        return Filter()
    if text.startswith("{"):
        try:
            return parse_filter(json.loads(text))
        except json.JSONDecodeError as e:
            raise FilterError(f"bad JSON filter: {e}") from None
    must, must_not = [], []
    for part in text.split(","):
        if not part.strip():
            continue
        m = _CLAUSE_RE.match(part)
        if not m:
            raise FilterError(
                f"bad filter clause {part!r} (expected key=value, "
                f"key!=value, or key{{<,<=,>,>=}}number)")
        key, op, raw = m.groups()
        value = _parse_scalar(raw)
        if op == "=":
            must.append(Condition(key, "match", value))
        elif op == "!=":
            must_not.append(Condition(key, "match", value))
        else:
            try:
                num = float(raw)
            except ValueError:
                raise FilterError(
                    f"ordered comparison needs a numeric value: {part!r}"
                ) from None
            rop = {">": "gt", ">=": "gte", "<": "lt", "<=": "lte"}[op]
            must.append(Condition(key, "range", {rop: num}))
    return Filter(tuple(must), (), tuple(must_not))


# ---------------------------------------------------------------------------
# Payload columns (one streaming pass per store version)
# ---------------------------------------------------------------------------

_MISSING = object()


class PayloadColumns:
    """Columnar view of selected payload keys.

    Built by ONE streaming pass over `payloads.jsonl` (never holding
    all payload dicts at once); each requested key becomes an object
    ndarray of length `count` with `_MISSING` for absent keys. A
    second `ensure` call with new keys re-streams once for the union.
    Freshness is the owner's job: cache instances keyed on
    (count, data_version) — see `Reverso._filter_mask`.
    """

    def __init__(self, store):
        self._store = store
        self.count = store.count
        self._cols: dict[str, np.ndarray] = {}

    def ensure(self, keys: Sequence[str]) -> None:
        missing = [k for k in keys if k not in self._cols]
        if not missing or self.count == 0:
            for k in missing:
                self._cols[k] = np.empty((0,), object)
            return
        from .persist import PAYLOAD_FILE
        cols = {k: np.full((self.count,), _MISSING, object)
                for k in missing}
        path = os.path.join(self._store.path, PAYLOAD_FILE)
        self._store.flush()
        with open(path, "rb") as f:
            for i, line in enumerate(f):
                if i >= self.count:
                    break
                try:
                    payload = json.loads(line)
                except (ValueError, UnicodeDecodeError):
                    continue        # torn/corrupt line -> all keys missing
                for k in missing:
                    if k in payload:
                        cols[k][i] = payload[k]
        self._cols.update(cols)

    def column(self, key: str) -> np.ndarray:
        self.ensure([key])
        return self._cols[key]

    def present(self, key: str) -> np.ndarray:
        """[count] bool: rows whose payload carries `key` at all."""
        return self.column(key) != _MISSING


def _numeric(col: np.ndarray) -> np.ndarray:
    """Object column -> float64 with NaN for missing/non-numeric values
    (NaN compares False under every ordered operator, which is exactly
    the 'missing never matches a range' semantics we want)."""
    out = np.full(col.shape, np.nan, np.float64)
    for i, v in enumerate(col):
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            out[i] = v
    return out


def _eval_condition(cond: "Condition | Filter",
                    columns: PayloadColumns) -> np.ndarray:
    if isinstance(cond, Filter):
        return evaluate_filter(cond, columns)
    col = columns.column(cond.key)
    if cond.op == "exists":
        present = col != _MISSING
        return present if cond.value else ~present
    if cond.op == "match":
        return np.fromiter((v is not _MISSING and v == cond.value
                            for v in col), np.bool_, count=len(col))
    if cond.op == "any":
        allowed = set(cond.value)
        return np.fromiter(
            (v is not _MISSING and not isinstance(v, (list, dict))
             and v in allowed for v in col), np.bool_, count=len(col))
    if cond.op == "range":
        num = _numeric(col)
        ok = np.ones(col.shape, np.bool_)
        r = cond.value
        if "gt" in r:
            ok &= num > r["gt"]
        if "gte" in r:
            ok &= num >= r["gte"]
        if "lt" in r:
            ok &= num < r["lt"]
        if "lte" in r:
            ok &= num <= r["lte"]
        return ok
    raise FilterError(f"unknown condition op {cond.op!r}")


def evaluate_filter(filt: Filter, columns: PayloadColumns) -> np.ndarray:
    """Boolean mask [count] of rows matching the filter.

    Semantics match qdrant: must = AND of all; must_not = AND of the
    negations; should = at least one matches whenever the clause is
    non-empty (alongside must, both apply)."""
    n = columns.count
    mask = np.ones((n,), np.bool_)
    for c in filt.must:
        mask &= _eval_condition(c, columns)
    if filt.should:
        any_mask = np.zeros((n,), np.bool_)
        for c in filt.should:
            any_mask |= _eval_condition(c, columns)
        mask &= any_mask
    for c in filt.must_not:
        mask &= ~_eval_condition(c, columns)
    return mask


def payload_mask(store, spec: Any) -> np.ndarray:
    """One-shot convenience: parse + stream + evaluate against a store."""
    filt = parse_filter(spec)
    cols = PayloadColumns(store)
    cols.ensure(sorted(filt.keys()))
    return evaluate_filter(filt, cols)
