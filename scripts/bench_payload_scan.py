"""A/B the payload-column extraction paths: native C++ JSONL walker
(`native.payload_scan`) vs the Python json reference pass.

This is the cold-cache cost of the FIRST filtered search / group-by /
count against a store (engine caches columns per (count, data_version)
afterwards). The reference's analog is qdrant local mode re-reading its
payload store (core_system.py:608-622).

Usage: python scripts/bench_payload_scan.py [--rows 1000000]
"""
import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--keys", default="detected_class,confidence")
    args = ap.parse_args()

    from reverso_tpu.store import VectorStore
    from reverso_tpu.store.filter import PayloadColumns

    tmp = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    n = args.rows
    print(f"writing {n:,} payload rows ...", flush=True)
    classes = ["person", "car", "building", "sign", "tree"]
    with VectorStore.create(tmp, "bench", 4) as s:
        chunk = 100_000
        for lo in range(0, n, chunk):
            hi = min(n, lo + chunk)
            vecs = np.zeros((hi - lo, 4), np.float32)
            payloads = [
                {"region_id": f"r{i}", "filename": f"img_{i % 9173:05d}.jpg",
                 "detected_class": classes[i % 5],
                 "confidence": round(float((i * 37) % 100) / 100, 2),
                 "bbox": [i % 640, i % 480, (i + 50) % 640, (i + 60) % 480],
                 "image_source": f"/data/img_{i % 9173:05d}.jpg"}
                for i in range(lo, hi)]
            s.append(vecs, payloads)
    store = VectorStore.open(tmp, "bench")
    size_mb = os.path.getsize(os.path.join(store.path,
                                           "payloads.jsonl")) / 1e6
    keys = args.keys.split(",")
    print(f"jsonl {size_mb:.0f} MB; extracting {keys}")

    # interleaved best-of-3: this host's load swings absolute timings
    # several-x between runs; only within-round alternation compares
    results = {}
    cols_keep = {}
    for rnd in range(3):
        pc = PayloadColumns(store)
        for name, fn in (("python-json", pc._extract_python),
                         ("native-c++", pc._extract_native)):
            t0 = time.perf_counter()
            cols = fn(keys)
            dt = time.perf_counter() - t0
            if cols is None:
                continue
            results[name] = min(results.get(name, float("inf")), dt)
            if rnd == 0:
                cols_keep[name] = cols
    for name, dt in results.items():
        print(f"{name:12s}  best {dt:7.2f} s   {n / dt / 1e6:6.2f} M rows/s"
              f"   {size_mb / dt:6.0f} MB/s")
    if len(results) == 2:
        cp, cn = cols_keep["python-json"], cols_keep["native-c++"]
        same = all((cp[k] == cn[k]).all() for k in keys)
        print(f"speedup {results['python-json'] / results['native-c++']:.1f}x"
              f"; columns identical: {same}")


if __name__ == "__main__":
    main()
