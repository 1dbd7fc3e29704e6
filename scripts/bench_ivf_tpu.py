#!/usr/bin/env python
"""Capacity-scale IVF vs exact scan on the REAL TPU chip.

The exact streaming kernel is throughput-optimal for BATCHED queries
(one 4 GB corpus scan serves all 256 queries), but a lone investigator
query still pays the full scan: ~19 ms at 4M x 1024 int8. The IVF
index is query-major (each query dynamic-slices only its probed
clusters), so its win is LATENCY at serving batch sizes (Q = 1-8) and
capacity beyond what exact scan can sustain. This benchmark measures
both sides on hardware at 4M x 1024 int8 (the 2x-capacity mode; 100M
across a v5e-8 is 32 chips-worth of this shard shape):

  * exact int8 scan latency at Q in {1, 8, 256} (cosine_topk_int8_*),
  * IVF latency at Q in {1, 8} x nprobe in {8, 16, 32},
  * recall@10 of IVF vs the exact scan over the SAME stored int8 rows
    (isolating probe misses from quantization, which both paths share),
  * on CLUSTERED data (mixture of Gaussians, bench_ivf_recall.py's
    generator) — the honest case for probe misses.

Timing is latency-immune block-minima (bench._best_time): the axon
tunnel adds 1.6-29 ms per sync, so single-synced calls lie.

Run:  python scripts/bench_ivf_tpu.py [--n 4194304]
Reference analog: the corpus-scaling axis of the qdrant scan it
replaces (/root/reference/core_system.py:659-664).
"""
import argparse
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))   # repo root: bench, reverso_tpu
sys.path.insert(0, _HERE)                    # sibling: bench_ivf_recall
from bench_ivf_recall import make_clustered  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4 * 1024 * 1024)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--centers", type=int, default=4096)
    ap.add_argument("--clusters", type=int, default=1024)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--qs", default="1,8")
    ap.add_argument("--nprobes", default="8,16,32")
    ap.add_argument("--eval-queries", type=int, default=64)
    ap.add_argument("--budget", type=float, default=20.0,
                    help="seconds of timing budget per point")
    args = ap.parse_args()

    import jax
    from bench import _best_time
    from reverso_tpu.cli import _enable_compile_cache
    from reverso_tpu.ops.topk import cosine_topk_int8_xla, quantize_db_int8
    from reverso_tpu.store.ivf import IVFIndex

    _enable_compile_cache()
    print(f"backend={jax.default_backend()}  N={args.n} d={args.d} "
          f"int8, {args.centers}-Gaussian corpus, IVF C={args.clusters}",
          flush=True)

    rng = np.random.default_rng(0)
    t0 = time.time()
    db = make_clustered(rng, args.n, args.d, args.centers)
    print(f"corpus built in {time.time() - t0:.0f}s "
          f"({db.nbytes / 2**30:.1f} GiB host)", flush=True)

    qi = rng.choice(args.n, args.eval_queries, replace=False)
    qs_eval = db[qi] + 0.05 * rng.standard_normal(
        (args.eval_queries, args.d)).astype(np.float32)
    qs_eval /= np.linalg.norm(qs_eval, axis=1, keepdims=True)

    # ---- IVF build (trains k-means on device, stores int8) ----------
    t0 = time.time()
    ivf = IVFIndex(db, n_clusters=args.clusters, dtype="int8", seed=0)
    print(f"IVF build {time.time() - t0:.0f}s  cmax={ivf.cmax} "
          f"(scan fraction/probe ~= {ivf.cmax / args.n:.4f})", flush=True)

    # ---- exact int8 baseline on the SAME rows ------------------------
    t0 = time.time()
    db_i8, scale = quantize_db_int8(db)
    db_dev = jax.device_put(db_i8)
    print(f"exact int8 copy staged {time.time() - t0:.0f}s", flush=True)

    def exact(q):
        return cosine_topk_int8_xla(db_dev, scale, q, k=args.k)

    s_true, i_true = jax.device_get(exact(qs_eval))
    print("ground truth (exact scan over stored int8) done", flush=True)

    # recall once per nprobe (independent of the timed batch size)
    nprobes = [int(x) for x in args.nprobes.split(",")]
    recall = {}
    for np_ in nprobes:
        _, ids = jax.device_get(ivf.search(qs_eval, args.k, nprobe=np_))
        recall[np_] = np.mean([len(set(p) & set(t)) / args.k
                               for p, t in zip(ids, i_true)])
        print(f"recall@{args.k} nprobe={np_}: {recall[np_]:.4f}",
              flush=True)

    results = []
    for q_n in [int(x) for x in args.qs.split(",")]:
        q = qs_eval[:q_n] if q_n <= args.eval_queries else np.tile(
            qs_eval, (q_n // args.eval_queries + 1, 1))[:q_n]
        np.asarray(exact(q)[0][:1, :1])          # compile outside timing
        dt = _best_time(lambda: exact(q),
                        lambda r: np.asarray(r[0][:1, :1]),
                        budget_s=args.budget)
        print(f"exact  Q={q_n:>3}: {dt * 1e3:7.2f} ms "
              f"({q_n / dt:,.0f} QPS)", flush=True)
        results.append(("exact", q_n, None, dt, 1.0))
        for np_ in nprobes:
            np.asarray(ivf.search(q, args.k, nprobe=np_)[0][:1, :1])
            dt = _best_time(lambda: ivf.search(q, args.k, nprobe=np_),
                            lambda r: np.asarray(r[0][:1, :1]),
                            budget_s=args.budget)
            print(f"IVF    Q={q_n:>3} nprobe={np_:>2}: {dt * 1e3:7.2f} ms "
                  f"({q_n / dt:,.0f} QPS)  recall@{args.k}="
                  f"{recall[np_]:.4f}", flush=True)
            results.append(("ivf", q_n, np_, dt, recall[np_]))

    print("\n| path | Q | nprobe | ms/batch | QPS | recall@10 |")
    print("|---|---|---|---|---|---|")
    for name, q_n, np_, dt, rec in results:
        print(f"| {name} | {q_n} | {np_ or '-'} | {dt * 1e3:.2f} "
              f"| {q_n / dt:,.0f} | {rec:.4f} |")


if __name__ == "__main__":
    main()
