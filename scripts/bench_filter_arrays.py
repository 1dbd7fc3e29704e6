"""Host-side A/B of the array/path filter paths at 1M rows.

Measures (a) TypedView derivation for an array column (the one-time
per-store-version python pass over list elements), (b) warm vectorized
evaluation of array-semantics conditions vs the per-query python loop
they replace, (c) nested-path column derivation, (d) the nested
condition's element-table build + eval.

Run on the build host; timings swing with tenant load, so only
same-process comparisons are meaningful (matches the methodology of
scripts/bench_payload_scan.py).
"""
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from reverso_tpu.store import VectorStore                     # noqa: E402
from reverso_tpu.store.filter import (PayloadColumns,          # noqa: E402
                                      evaluate_filter, parse_filter)

N = int(os.environ.get("BENCH_ROWS", 1_000_000))
CLASSES = ["person", "car", "tree", "building", "sign"]


def make_store(root):
    rng = np.random.default_rng(0)
    d = 8
    cls = rng.integers(0, len(CLASSES), N)
    extra = rng.integers(0, len(CLASSES), N)
    nums = rng.random(N)
    path = os.path.join(root, "bench")
    os.makedirs(path, exist_ok=True)
    vecs = np.zeros((N, d), np.float32)
    vecs[:, 0] = 1.0
    with VectorStore.create(root, "bench", d) as s:
        # write payloads in chunks to bound memory
        chunk = 100_000
        for lo in range(0, N, chunk):
            hi = min(N, lo + chunk)
            pls = [{"tags": [CLASSES[cls[i]], CLASSES[extra[i]]],
                    "conf": float(nums[i]),
                    "meta": {"cls": CLASSES[cls[i]],
                             "items": [{"p": int(cls[i])},
                                       {"p": int(extra[i])}]}}
                   for i in range(lo, hi)]
            s.append(vecs[lo:hi], pls)
    return VectorStore.open(root, "bench")


def t(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    root = tempfile.mkdtemp()
    t0 = time.perf_counter()
    store = make_store(root)
    print(f"built {N} rows in {time.perf_counter()-t0:.1f}s")
    os.environ["REVERSO_PAYCOL_CACHE"] = "0"

    cols = PayloadColumns(store)
    t0 = time.perf_counter()
    cols.ensure(["tags"])
    t_extract = time.perf_counter() - t0
    t0 = time.perf_counter()
    cols.view("tags")                      # element indexing happens here
    t_view = time.perf_counter() - t0
    print(f"tags (2-elem array/row): extract {t_extract:.2f}s, "
          f"typed view + element arrays {t_view:.2f}s")

    f_match = parse_filter({"key": "tags", "match": "person"})
    f_vc = parse_filter({"key": "tags", "values_count": {"gte": 2}})
    warm_match = t(lambda: evaluate_filter(f_match, cols))
    warm_vc = t(lambda: evaluate_filter(f_vc, cols))

    # the replaced semantics: per-query python loop over list rows
    col = cols.column("tags")
    def py_match():
        return np.fromiter(("person" in v for v in col), np.bool_,
                           count=len(col))
    def py_vc():
        return np.fromiter((len(v) >= 2 for v in col), np.bool_,
                           count=len(col))
    loop_match = t(py_match, reps=1)
    loop_vc = t(py_vc, reps=1)
    print(f"warm array match: vectorized {warm_match*1e3:.1f} ms vs "
          f"python loop {loop_match*1e3:.0f} ms "
          f"({loop_match/warm_match:.0f}x)")
    print(f"warm values_count: vectorized {warm_vc*1e3:.1f} ms vs "
          f"python loop {loop_vc*1e3:.0f} ms ({loop_vc/warm_vc:.0f}x)")

    t0 = time.perf_counter()
    cols.ensure(["meta.cls"])
    t_path = time.perf_counter() - t0
    f_path = parse_filter({"key": "meta.cls", "match": "person"})
    warm_path = t(lambda: evaluate_filter(f_path, cols))
    print(f"path column meta.cls: derive {t_path:.2f}s "
          f"(root column already extracted: "
          f"{'meta' in cols._cols or 'meta' in cols._pending}), "
          f"warm eval {warm_path*1e3:.1f} ms")

    f_nested = parse_filter({"nested": {
        "key": "meta.items", "filter": {"p": {"gte": 3}}}})
    t0 = time.perf_counter()
    m = evaluate_filter(f_nested, cols)
    t_nested_cold = time.perf_counter() - t0
    warm_nested = t(lambda: evaluate_filter(f_nested, cols))
    print(f"nested condition (2 obj elems/row): cold "
          f"{t_nested_cold:.2f}s (element table build), warm "
          f"{warm_nested*1e3:.1f} ms; matches {int(m.sum())}")
    print(json.dumps({"rows": N, "warm_array_match_ms": warm_match*1e3,
                      "warm_path_ms": warm_path*1e3,
                      "warm_nested_ms": warm_nested*1e3}))


if __name__ == "__main__":
    main()
