"""Serving under concurrent load on the chip (VERDICT r4 ask #2).

The reference serves interactive queries one at a time off a global
engine lock (/root/reference/ui.py:235, main.py:33-40). This build's
serving layer is `serve.BatchingSearcher` (coalescing, pow-2 launch
buckets, bounded queue + shed, p50/p95 stats) — functionally tested,
but never measured under load until this script. Three parts:

1. **Batcher sweep**: N concurrent client threads (N in {1, 8, 64,
   256}) hammer `BatchingSearcher.search(q, k=10)` against the
   headline corpus shape (1M x 1024 bf16, device-resident, same
   `cosine_topk_pallas` kernel bench.py times raw): achieved QPS,
   end-to-end p50/p95 (through the ~1.6-29 ms axon tunnel RTT), and
   the coalesced launch-size distribution (served/launches).
2. **Shed**: a small-queue searcher (max_queue=32, max_batch=16)
   under a 256-thread burst must shed with OverloadedError, not hang.
3. **HTTP surface**: a real store (262144 x 1024) behind the engine +
   `ui/server.py` ThreadingHTTPServer; 32 concurrent clients POST
   /api/query/universal (vector target, use_batcher on the server
   side): achieved QPS + latency through the full JSON/HTTP path.

The bare-matmul contention reference (bench.py) is co-measured so the
numbers are attributable. Each pow-2 launch bucket is prewarmed
explicitly — a cold (bucket, k_pad) shape costs a 30-180 s remote
compile that would otherwise poison the measured window (the compile
cache makes reruns cheap).

Usage: python scripts/bench_serve.py [--duration 8] [--skip-http]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def part_batcher(duration: float):
    import jax
    import jax.numpy as jnp

    from reverso_tpu.ops import cosine_topk_pallas, l2_normalize
    from reverso_tpu.serve import BatchingSearcher

    N_PAD, N, D, K = 1024 * 1024, 1_000_000, 1024, 10
    db = l2_normalize(jax.random.normal(
        jax.random.PRNGKey(0), (N_PAD, D), jnp.bfloat16))

    class _DevIndex:
        """Device-resident adapter with the DeviceIndex search
        contract — same kernel + corpus shape as bench.py's headline
        so batched-serving QPS reads directly against raw-scan QPS."""
        n_valid = N

        def search(self, queries, k, **_):
            return cosine_topk_pallas(
                db, jnp.asarray(queries, jnp.bfloat16), k, n_valid=N)

    idx = _DevIndex()
    searcher = BatchingSearcher(lambda space="": idx)

    # prewarm every pow-2 launch bucket at the batcher's k_pad (16)
    host_q = np.asarray(db[:256], np.float32)
    for b in [1, 2, 4, 8, 16, 32, 64, 128, 256]:
        t0 = time.perf_counter()
        np.asarray(idx.search(host_q[:b], 16)[0][:1])
        print(f"  warm bucket {b}: {time.perf_counter() - t0:.1f}s",
              flush=True)

    results = []
    for n_clients in (1, 8, 64, 256):
        before = searcher.stats()
        stop = threading.Event()
        counts = [0] * n_clients
        errs = [0] * n_clients

        def client(ci):
            rng = np.random.default_rng(ci)
            while not stop.is_set():
                q = host_q[rng.integers(0, 256)]
                try:
                    searcher.search(q, K, timeout=120.0)
                    counts[ci] += 1
                except Exception:
                    errs[ci] += 1

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(n_clients)]
        for t in threads:
            t.start()
        time.sleep(1.0)                       # settle
        base = sum(counts)
        t0 = time.perf_counter()
        time.sleep(duration)
        done = sum(counts) - base
        wall = time.perf_counter() - t0
        stop.set()
        for t in threads:
            t.join()
        after = searcher.stats()
        launches = after["launches"] - before["launches"]
        served = after["served"] - before["served"]
        row = {
            "clients": n_clients,
            "qps": round(done / wall, 1),
            "p50_ms": round(after.get("latency_p50_ms", 0.0), 2),
            "p95_ms": round(after.get("latency_p95_ms", 0.0), 2),
            "avg_batch": round(served / max(1, launches), 2),
            "errors": sum(errs),
        }
        results.append(row)
        print(f"  clients={n_clients:4d} qps={row['qps']:9.1f} "
              f"p50={row['p50_ms']:7.2f}ms p95={row['p95_ms']:7.2f}ms "
              f"avg_batch={row['avg_batch']:6.2f} errs={row['errors']}",
              flush=True)
    searcher.close()
    return results, idx, host_q


def part_shed(idx, host_q):
    """Saturate a small-queue searcher: shedding must engage."""
    from reverso_tpu.serve import BatchingSearcher, OverloadedError

    searcher = BatchingSearcher(lambda space="": idx, max_queue=32,
                                max_batch=16)
    ok = [0]
    shed = [0]
    lock = threading.Lock()

    def burst(ci):
        rng = np.random.default_rng(1000 + ci)
        for _ in range(4):
            try:
                searcher.search(host_q[rng.integers(0, 256)], 10,
                                timeout=120.0)
                with lock:
                    ok[0] += 1
            except OverloadedError:
                with lock:
                    shed[0] += 1

    threads = [threading.Thread(target=burst, args=(i,))
               for i in range(256)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    stats = searcher.stats()
    searcher.close()
    out = {"requests": 1024, "served": ok[0], "shed": shed[0],
           "stats_shed": stats["shed"]}
    print(f"  shed burst: {out}", flush=True)
    assert shed[0] > 0, "saturation did not shed — queue bound broken?"
    assert ok[0] + shed[0] == 1024
    return out


def part_http(duration: float):
    """Concurrent clients through the real HTTP JSON surface."""
    import dataclasses
    import http.client

    from reverso_tpu.config import default_config
    from reverso_tpu.engine import Reverso
    from reverso_tpu.store import VectorStore
    from reverso_tpu.ui.server import create_server

    N, D = 262144, 1024
    root = tempfile.mkdtemp(prefix="serve_bench_")
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((N, D)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    with VectorStore.create(root, "httpdb", D) as s:
        s.append(vecs, [{"region_id": f"r{i}"} for i in range(N)])

    cfg = default_config()
    cfg = cfg.replace(store=dataclasses.replace(cfg.store,
                                                root_dir=root))
    engine = Reverso(cfg)
    engine.load_database("httpdb")
    server = create_server(engine, "127.0.0.1", 0)
    port = server.server_address[1]
    st = threading.Thread(target=server.serve_forever, daemon=True)
    st.start()

    # prewarm buckets 1..32 at this corpus shape through the batcher
    for b in [1, 2, 4, 8, 16, 32]:
        t0 = time.perf_counter()
        import jax
        jax.device_get(engine._get_index("").search(vecs[:b], 16))
        print(f"  warm http bucket {b}: "
              f"{time.perf_counter() - t0:.1f}s", flush=True)

    n_clients = 32
    stop = threading.Event()
    counts = [0] * n_clients
    errs = [0] * n_clients
    lats: list[float] = []
    lat_lock = threading.Lock()

    def client(ci):
        rng = np.random.default_rng(ci)
        conn = http.client.HTTPConnection("127.0.0.1", port,
                                          timeout=120)
        while not stop.is_set():
            q = vecs[rng.integers(0, N)].tolist()
            body = json.dumps({"target": q, "max_results": 10})
            t0 = time.perf_counter()
            try:
                conn.request("POST", "/api/query/universal", body,
                             {"Content-Type": "application/json"})
                r = conn.getresponse()
                payload = r.read()
                if r.status != 200:
                    raise RuntimeError(payload[:200])
                counts[ci] += 1
                with lat_lock:
                    lats.append(time.perf_counter() - t0)
            except Exception:
                errs[ci] += 1
                conn.close()
                conn = http.client.HTTPConnection(
                    "127.0.0.1", port, timeout=120)
        conn.close()

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_clients)]
    for t in threads:
        t.start()
    time.sleep(2.0)
    base = sum(counts)
    with lat_lock:
        lats.clear()
    t0 = time.perf_counter()
    time.sleep(duration)
    done = sum(counts) - base
    wall = time.perf_counter() - t0
    stop.set()
    for t in threads:
        t.join()
    server.shutdown()
    lat = sorted(lats)
    out = {
        "clients": n_clients,
        "qps": round(done / wall, 1),
        "p50_ms": round(1e3 * lat[len(lat) // 2], 2) if lat else None,
        "p95_ms": round(1e3 * lat[int(len(lat) * 0.95)], 2)
        if lat else None,
        "errors": sum(errs),
        "corpus": f"{N}x{D}",
    }
    print(f"  http: {out}", flush=True)
    import shutil
    shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=8.0)
    ap.add_argument("--skip-http", action="store_true")
    args = ap.parse_args()

    from reverso_tpu.cli import _enable_compile_cache
    _enable_compile_cache()

    import bench
    print("contention reference (pre):", flush=True)
    ref_pre = bench._contention_reference()
    print(f"  {ref_pre}", flush=True)

    print("batcher sweep (1M x 1024 bf16, k=10):", flush=True)
    sweep, idx, host_q = part_batcher(args.duration)
    print("shed burst:", flush=True)
    shed = part_shed(idx, host_q)
    http_out = None
    if not args.skip_http:
        print("http surface:", flush=True)
        http_out = part_http(args.duration)

    print("contention reference (post):", flush=True)
    ref_post = bench._contention_reference()
    print(f"  {ref_post}", flush=True)

    print(json.dumps({"sweep": sweep, "shed": shed, "http": http_out,
                      "ref_pre": ref_pre, "ref_post": ref_post}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
