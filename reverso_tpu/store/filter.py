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


def _assign(col: np.ndarray, idx: np.ndarray, values: list) -> None:
    """col[idx] = values, element-wise — a plain fancy assignment would
    let numpy coerce a list of equal-length lists into a 2-D block."""
    tmp = np.asarray(values, object)
    if tmp.ndim != 1:               # equal-length list values: keep 1-D
        tmp = np.empty((len(values),), object)
        for m, v in enumerate(values):
            tmp[m] = v
    col[idx] = tmp


class PayloadColumns:
    """Columnar view of selected payload keys.

    Built by ONE pass over `payloads.jsonl` (never holding all payload
    dicts at once); each requested key becomes an object ndarray of
    length `count` with `_MISSING` for absent keys. A second `ensure`
    call with new keys re-streams once for the union. Freshness is the
    owner's job: cache instances keyed on (count, data_version) — see
    `Reverso._filter_mask`.

    The pass runs through the native C++ JSONL walker when available
    (`native.payload_scan`: multithreaded, touches each byte once,
    materializes only the requested keys — the scaling path for 10M+
    row stores), falling back to the Python `json` reference pass. The
    two are semantically identical except that the native path rounds
    integers beyond 2**53 to float precision.
    """

    def __init__(self, store):
        self._store = store
        self.count = store.count
        self._cols: dict[str, np.ndarray] = {}
        self._views: dict[str, "TypedView"] = {}
        # cache-loaded keys whose object column hasn't been asked for
        # yet: key -> odd values (column() materializes on demand)
        self._pending: dict[str, list] = {}

    def ensure(self, keys: Sequence[str]) -> None:
        missing = [k for k in keys
                   if k not in self._cols and k not in self._pending]
        if not missing or self.count == 0:
            for k in missing:
                self._cols[k] = np.empty((0,), object)
            return
        missing = self._load_persisted(missing)
        if not missing:
            return
        self._store.flush()
        cols = None
        if os.environ.get("REVERSO_NATIVE", "1") != "0":
            try:
                cols = self._extract_native(missing)
            except Exception:
                cols = None           # any native hiccup -> json pass
        if cols is None:
            cols = self._extract_python(missing)
        self._cols.update(cols)
        self._maybe_persist(list(cols))

    def _load_persisted(self, missing: Sequence[str]) -> list:
        """Install any of `missing` available in the on-disk column
        cache for this exact store version; returns the keys still
        missing. Any corruption falls back to re-extraction."""
        if os.environ.get("REVERSO_PAYCOL_CACHE", "1") == "0":
            return list(missing)
        path = _paycols_path(self._store)
        if not os.path.exists(path):
            return list(missing)
        try:
            with np.load(path, allow_pickle=False) as z:
                have = {name.split("::", 1)[0] for name in z.files}
                still = []
                for k in missing:
                    if k not in have:
                        still.append(k)
                        continue
                    # per-key isolation: a corrupt/wrong-size member
                    # must fall back to extraction WITHOUT leaving a
                    # half-installed view behind for that key
                    try:
                        view, odd_vals = _view_from_arrays(z, k,
                                                           self.count)
                    except Exception:
                        still.append(k)
                        continue
                    self._views[k] = view
                    self._pending[k] = odd_vals
            return still
        except Exception:
            return list(missing)

    def persist(self, keys: Optional[Sequence[str]] = None, *,
                force: bool = True) -> Optional[str]:
        """Write a typed-column cache file for this store version — the
        payload-index role of qdrant's create_payload_index: later
        processes load these arrays (an mmap-speed npz read) instead of
        re-streaming the whole JSONL and re-deriving views. Returns the
        path, or None when nothing qualified / the filesystem refused.

        `force=False` applies the auto-persist size guard per key
        (skips e.g. all-unique id columns whose dictionary would dwarf
        the data). Existing cached keys for the same version are
        preserved (merge-on-write); stale versions are swept."""
        if keys is None:
            keys = list(self._cols) + [k for k in self._pending
                                       if k not in self._cols]
        keys = list(keys)
        if not keys or self.count == 0:
            return None
        path = _paycols_path(self._store)
        arrays: dict = {}
        try:
            if os.path.exists(path):       # merge with already-cached keys
                with np.load(path, allow_pickle=False) as z:
                    arrays.update({name: z[name] for name in z.files})
        except Exception:
            arrays = {}
        budget = _PERSIST_MAX_BYTES_PER_ROW * self.count
        wrote = False
        for k in keys:
            member = _view_to_arrays(k, self.view(k), self.column(k))
            if not force and sum(a.nbytes for a in member.values()) > budget:
                continue
            arrays.update(member)
            wrote = True
        if not wrote:
            return None
        try:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                np.savez(f, **arrays)
            os.replace(tmp, path)
            for fname in os.listdir(os.path.dirname(path)):
                if fname.startswith(_PAYCOL_PREFIX) and \
                        fname != os.path.basename(path):
                    try:
                        os.remove(os.path.join(os.path.dirname(path),
                                               fname))
                    except OSError:
                        pass
            return path
        except OSError:
            return None               # read-only filesystem etc.

    def _maybe_persist(self, new_keys: Sequence[str]) -> None:
        """Auto-persist freshly extracted keys on big stores, so the
        NEXT process's first filtered search skips the JSONL stream
        and the view derivation entirely."""
        if self.count < _PERSIST_MIN_ROWS or \
                os.environ.get("REVERSO_PAYCOL_CACHE", "1") == "0":
            return
        try:
            self.persist(new_keys, force=False)
        except Exception:
            pass                      # cache write must never fail a query

    def _extract_python(self, missing: Sequence[str]) -> dict:
        """Reference implementation: json-parse every line."""
        from .persist import PAYLOAD_FILE
        cols = {k: np.full((self.count,), _MISSING, object)
                for k in missing}
        path = os.path.join(self._store.path, PAYLOAD_FILE)
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
        return cols

    def _extract_native(self, missing: Sequence[str]) -> Optional[dict]:
        """One multithreaded C++ byte pass; only complex values
        (lists/objects) and escaped strings json-parse per cell.
        Returns None when the native library or offsets can't serve."""
        import mmap as mmap_mod

        from ..native import (PAYLOAD_COMPLEX, PAYLOAD_FALSE, PAYLOAD_FLOAT,
                              PAYLOAD_INT, PAYLOAD_NULL, PAYLOAD_STR,
                              PAYLOAD_STR_ESC, PAYLOAD_TRUE, intern_spans,
                              payload_scan)
        from .persist import PAYLOAD_FILE

        store = self._store
        offsets = np.asarray(store._payload_offsets(), np.int64)
        if len(offsets) < self.count:
            return None          # sidecar trails the JSONL: json pass
        path = os.path.join(store.path, PAYLOAD_FILE)
        size = os.path.getsize(path)
        if size == 0:
            return None
        n = self.count
        with open(path, "rb") as f:
            mm = mmap_mod.mmap(f.fileno(), 0, access=mmap_mod.ACCESS_READ)
        buf = mv = None
        try:
            buf = np.frombuffer(mm, np.uint8)
            ends = np.empty(n, np.int64)
            ends[:-1] = offsets[1:n]
            if len(offsets) > n:
                ends[-1] = int(offsets[n])
            else:
                # The sidecar holds exactly n offsets, so the last row's
                # span would otherwise run to EOF — which can include a
                # TORN TAIL (crash between the jsonl append and the
                # sidecar append). parse_line rejects trailing bytes, so
                # that would silently drop the last committed row from
                # every filter. Bound the span at the row's own newline.
                nl = mm.find(b"\n", int(offsets[n - 1]))
                ends[-1] = size if nl < 0 else nl + 1
            res = payload_scan(buf, offsets[:n], ends, list(missing))
            if res is None:
                return None
            types, numbers, str_off, str_len = res
            mv = memoryview(mm)
            cols = {}
            for j, key in enumerate(missing):
                col = np.full((n,), _MISSING, object)
                t = types[:, j]
                col[t == PAYLOAD_NULL] = None
                col[t == PAYLOAD_FALSE] = False
                col[t == PAYLOAD_TRUE] = True
                ii = np.nonzero(t == PAYLOAD_INT)[0]
                if len(ii):
                    # tolist() boxes to Python ints/floats at C speed
                    _assign(col, ii,
                            numbers[ii, j].astype(np.int64).tolist())
                ii = np.nonzero(t == PAYLOAD_FLOAT)[0]
                if len(ii):
                    _assign(col, ii, numbers[ii, j].tolist())
                ii = np.nonzero(t == PAYLOAD_STR)[0]
                if len(ii):
                    col[ii] = self._decode_strings(
                        buf, mv, str_off[ii, j], str_len[ii, j])
                for tag, wrap in ((PAYLOAD_STR_ESC, b'"%s"'),
                                  (PAYLOAD_COMPLEX, b"%s")):
                    ii = np.nonzero(t == tag)[0]
                    if len(ii):
                        vals = []
                        for o, ln in zip(str_off[ii, j].tolist(),
                                         str_len[ii, j].tolist()):
                            try:
                                vals.append(json.loads(
                                    wrap % bytes(mv[o:o + ln])))
                            except ValueError:
                                vals.append(_MISSING)
                        _assign(col, ii, vals)
                cols[key] = col
            return cols
        finally:
            # the mmap can't close while numpy/memoryview exports exist
            # (NB: probing via locals() would cache a frame-locals dict
            # that itself keeps `buf` exported past the rebind)
            if mv is not None:
                mv.release()
            buf = None
            mm.close()

    @staticmethod
    def _decode_strings(buf, mv, offs, lens) -> np.ndarray:
        """Clean-string spans -> object array of Python strings.

        Low-cardinality columns (detected_class & friends — the usual
        filter keys) dictionary-encode natively so each UNIQUE value
        decodes once, then one vectorized object gather. A sample pass
        decides: when the column is mostly unique (region_id-like ids),
        interning buys nothing, so rows decode directly."""
        from ..native import intern_spans

        sample = 65536
        enc = (intern_spans(buf, offs[:sample], lens[:sample])
               if len(offs) > sample else None)
        mostly_unique = (enc is not None
                         and len(enc[1]) > 0.5 * min(sample, len(offs)))
        if not mostly_unique:
            enc = intern_spans(buf, offs, lens)
        if enc is not None and not mostly_unique:
            codes, u_off, u_len = enc
            uniq = np.empty((len(u_off),), object)
            for m, (o, ln) in enumerate(zip(u_off.tolist(),
                                            u_len.tolist())):
                uniq[m] = bytes(mv[o:o + ln]).decode("utf-8")
            return uniq[codes]
        # direct per-row decode (native lib absent, or mostly unique)
        interned: dict = {}
        vals = np.empty((len(offs),), object)
        for m, (o, ln) in enumerate(zip(offs.tolist(), lens.tolist())):
            b = bytes(mv[o:o + ln])
            v = interned.get(b)
            if v is None:
                v = interned[b] = b.decode("utf-8")
            vals[m] = v
        return vals

    def column(self, key: str) -> np.ndarray:
        self.ensure([key])
        if key in self._pending:        # cache-loaded: materialize now
            self._cols[key] = _column_from_view(
                self._views[key], self._pending.pop(key), self.count)
        return self._cols[key]

    def view(self, key: str) -> "TypedView":
        """Memoized typed view (see `TypedView`) — derived once per
        (store version, key), then every filter/order_by/lookup is
        vectorized numpy. Treat the arrays as read-only."""
        v = self._views.get(key)
        if v is None:
            v = self._views[key] = TypedView(self.column(key))
        return v

    def present(self, key: str) -> np.ndarray:
        """[count] bool: rows whose payload carries `key` at all.
        Treat as read-only (shared with the memoized view)."""
        return self.view(key).present


class TypedView:
    """Exactness-preserving typed views of one object column.

    Derived in ONE python pass per (store version, key) and memoized on
    the owning `PayloadColumns`, so every later filter evaluation,
    order_by sort, and region_id lookup is pure vectorized numpy — the
    per-query python loop over 1M+ rows that the object column forces
    otherwise. The exactness contract vs the python reference
    semantics is kept by a sparse `odd` row list (values float64
    equality can't represent: ints beyond 2^53, lists, dicts) that
    match/any re-check with python `==`."""

    __slots__ = ("present", "num", "numb", "codes", "uniq", "uindex",
                 "is_null", "isint", "odd")

    def __init__(self, col: np.ndarray):
        n = len(col)
        self.present = np.zeros(n, np.bool_)
        # numbers excluding bools (the `range` operand, matching the
        # old _numeric); big ints round to f64 exactly as before
        self.num = np.full(n, np.nan, np.float64)
        # numbers INCLUDING bools as 1/0 (the `match` operand: python
        # equality says True == 1)
        self.numb = np.full(n, np.nan, np.float64)
        self.codes = np.full(n, -1, np.int32)      # clean-string dict codes
        self.is_null = np.zeros(n, np.bool_)
        self.isint = np.zeros(n, np.bool_)   # int (vs float) numeric rows
        uniq: list[str] = []
        uindex: dict[str, int] = {}
        odd: list[int] = []
        big = 2 ** 53
        for i, v in enumerate(col):
            if v is _MISSING:
                continue
            self.present[i] = True
            t = type(v)
            if t is str:
                c = uindex.get(v)
                if c is None:
                    c = uindex[v] = len(uniq)
                    uniq.append(v)
                self.codes[i] = c
            elif t is bool:
                self.numb[i] = 1.0 if v else 0.0
            elif t is int:
                self.num[i] = self.numb[i] = v
                self.isint[i] = True
                if not -big <= v <= big:
                    odd.append(i)          # f64-inexact: python-check ==
            elif t is float:
                self.num[i] = self.numb[i] = v
            elif v is None:
                self.is_null[i] = True
            else:
                odd.append(i)              # lists/dicts/exotic types
        self.uniq = np.asarray(uniq, object)
        self.uindex = uindex
        self.odd = np.asarray(odd, np.int64)


_PAYCOL_PREFIX = "paycols_"
_PERSIST_MIN_ROWS = 100_000        # auto-persist threshold (rows)
_PERSIST_MAX_BYTES_PER_ROW = 40    # per-key auto-persist size guard


def _paycols_path(store) -> str:
    """Persisted-column file for the store's CURRENT version. The
    (count, data_version) key in the name is the whole invalidation
    story: any mutation bumps data_version, so a stale file simply
    never matches again (and is swept on the next persist)."""
    return os.path.join(
        store.path, "index",
        f"{_PAYCOL_PREFIX}{store.count}_{store.data_version}.npz")


def _view_to_arrays(key: str, view: "TypedView",
                    col: np.ndarray) -> dict:
    """TypedView -> plain typed arrays (npz-safe, no pickle). Unique
    strings ship as one utf-8 blob + lengths; odd values (big ints,
    lists, dicts) as their exact JSON."""
    enc = [u.encode("utf-8") for u in view.uniq.tolist()]
    blob = (np.frombuffer(b"".join(enc), np.uint8).copy() if enc
            else np.zeros(0, np.uint8))
    lens = np.asarray([len(e) for e in enc], np.int64)
    odd_json = (np.asarray([json.dumps(col[i])
                            for i in view.odd.tolist()])
                if len(view.odd) else np.zeros(0, "U1"))
    return {f"{key}::present": view.present, f"{key}::num": view.num,
            f"{key}::numb": view.numb, f"{key}::codes": view.codes,
            f"{key}::is_null": view.is_null, f"{key}::isint": view.isint,
            f"{key}::odd": view.odd, f"{key}::odd_json": odd_json,
            f"{key}::uniq_blob": blob, f"{key}::uniq_lens": lens}


def _view_from_arrays(z, key: str, n: int):
    """Inverse of `_view_to_arrays`: (TypedView, odd values)."""
    view = TypedView.__new__(TypedView)
    for slot in ("present", "num", "numb", "codes", "is_null", "isint",
                 "odd"):
        arr = np.asarray(z[f"{key}::{slot}"])
        setattr(view, slot, arr)
    if len(view.present) != n:
        raise ValueError(f"persisted column {key!r} has "
                         f"{len(view.present)} rows, store has {n}")
    blob = bytes(np.asarray(z[f"{key}::uniq_blob"], np.uint8))
    lens = np.asarray(z[f"{key}::uniq_lens"], np.int64).tolist()
    uniq, pos = [], 0
    for ln in lens:
        uniq.append(blob[pos:pos + ln].decode("utf-8"))
        pos += ln
    view.uniq = np.asarray(uniq, object)
    view.uindex = {u: i for i, u in enumerate(uniq)}
    odd_vals = [json.loads(s) for s in
                np.asarray(z[f"{key}::odd_json"]).tolist()]
    return view, odd_vals


def _column_from_view(view: "TypedView", odd_vals, n: int) -> np.ndarray:
    """Object column reconstructed from a loaded view — each cell with
    its exact python type (ints via isint, bools via numb-without-num,
    NaN floats, odd rows from their JSON), so facet/group-by/python-
    fallback paths behave identically to a freshly extracted column.
    Deferred until someone actually asks for the object view: filter
    evaluation runs on the typed arrays alone."""
    col = np.full(n, _MISSING, object)
    srows = np.nonzero(view.codes >= 0)[0]
    if len(srows):
        col[srows] = view.uniq[view.codes[srows]]
    has_num = ~np.isnan(view.num)
    irows = np.nonzero(view.isint)[0]
    if len(irows):
        col[irows] = view.num[irows].astype(np.int64).tolist()
    frows = np.nonzero(has_num & ~view.isint)[0]
    if len(frows):
        col[frows] = view.num[frows].tolist()
    brows = np.nonzero(~has_num & ~np.isnan(view.numb))[0]
    if len(brows):
        col[brows] = (view.numb[brows] > 0.5).tolist()
    col[view.is_null] = None
    # NaN-float payloads: present but in no typed class above
    nanrows = (view.present & np.isnan(view.numb) & (view.codes < 0)
               & ~view.is_null)
    nanrows[view.odd] = False
    col[nanrows] = float("nan")
    for i, v in zip(view.odd.tolist(), odd_vals):
        col[i] = v
    return col


def _numeric(col: np.ndarray) -> np.ndarray:
    """Object column -> float64 with NaN for missing/non-numeric values
    (NaN compares False under every ordered operator, which is exactly
    the 'missing never matches a range' semantics we want).
    Kept as the reference implementation; hot paths use
    `PayloadColumns.view(key).num` instead."""
    out = np.full(col.shape, np.nan, np.float64)
    for i, v in enumerate(col):
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            out[i] = v
    return out


def _match_mask(view: TypedView, col_fn, value) -> np.ndarray:
    """Vectorized `payload[key] == value` with python-equality
    semantics (True == 1, exact big-int compares). `col_fn` supplies
    the object column lazily — it is only touched for odd rows (big
    ints, lists, dicts) or non-scalar match values, so cache-loaded
    columns usually never materialize."""
    if isinstance(value, str):
        m = view.codes == view.uindex.get(value, -2)
    elif value is None:
        m = view.is_null.copy()
    elif isinstance(value, bool) or (isinstance(value, int)
                                     and -2**53 <= value <= 2**53) \
            or isinstance(value, float):
        m = view.numb == float(value)
    else:
        # non-scalar or f64-inexact match value: python reference path
        col = col_fn()
        return np.fromiter((v is not _MISSING and v == value
                            for v in col), np.bool_, count=len(col))
    if len(view.odd):
        col = col_fn()
        for i in view.odd:                 # sparse python re-check
            m[i] = col[i] == value
    return m


def _eval_condition(cond: "Condition | Filter",
                    columns: PayloadColumns) -> np.ndarray:
    if isinstance(cond, Filter):
        return evaluate_filter(cond, columns)
    view = columns.view(cond.key)
    col_fn = lambda: columns.column(cond.key)   # noqa: E731 — lazy
    if cond.op == "exists":
        return view.present if cond.value else ~view.present
    if cond.op == "match":
        return _match_mask(view, col_fn, cond.value)
    if cond.op == "any":
        # python semantics preserved: short-circuit excludes list/dict
        # payloads before the `in allowed` membership test, and a list
        # payload never equals a scalar in the odd-row recheck either
        m = np.zeros(len(view.present), np.bool_)
        for value in cond.value:
            m |= _match_mask(view, col_fn, value)
        return m
    if cond.op == "range":
        num = view.num
        # ones, not `present`: every op below compares NaN→False for
        # missing/non-numeric rows, and a (pathological) empty range
        # matched everything in the reference implementation
        ok = np.ones(len(num), np.bool_)
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
