#!/usr/bin/env python
"""IVF recall-vs-nprobe sweep on CLUSTERED data (mixture of Gaussians).

Uniform random vectors are the easiest possible IVF case (every
centroid equidistant, probe misses barely matter) — VERDICT r2 called
the round-2 eval unrealistic. This sweep builds a corpus with real
cluster structure (queries drawn near db points, clusters of varied
size/spread), measures recall@10 against the exact fp32 scan for bf16
AND int8 storage across nprobe, and prints a markdown table for
EVAL.md.

Run (CPU or TPU):  python scripts/bench_ivf_recall.py [--n 131072]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_clustered(rng, n, d, n_centers=512):
    """Mixture of Gaussians with log-normal cluster sizes — the shape
    real embedding corpora have (duplicate-ish media, bursty scenes),
    and the case where probe misses hurt. Spreads are calibrated so
    intra-cluster cosines land ~0.6-0.95 (sigma*sqrt(d) in [0.3, 0.8]),
    like near-duplicate/same-scene embeddings; 15% of rows are diffuse
    background (unit-norm noise), the hardest probe targets.

    Vectorized f32 end-to-end, one output allocation, chunked
    application: the naive per-center f64 block list cost 3x the bytes
    in temporaries — on a host with slow first-touch paging (this
    environment: MB/s-range fault-in under contention) that dominated
    the whole benchmark. Shuffling the ASSIGNMENT vector replaces the
    16 GB row-permutation copy (iid noise makes them equivalent)."""
    n_bg = int(0.15 * n)
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    w = rng.lognormal(0.0, 1.0, n_centers)
    sizes = np.maximum(1, (w / w.sum() * (n - n_bg))).astype(int)
    while sizes.sum() < n - n_bg:
        sizes[rng.integers(n_centers)] += 1
    sig = (rng.uniform(0.3, 0.8, n_centers) / np.sqrt(d)).astype(
        np.float32)
    # per-row center index; -1 = background; pre-shuffled
    idx = np.repeat(np.arange(n_centers, dtype=np.int32), sizes)[:n - n_bg]
    idx = np.concatenate([idx, np.full(n_bg, -1, np.int32)])
    rng.shuffle(idx)
    db = rng.standard_normal((n, d), dtype=np.float32)  # noise, in place
    chunk = 262144
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        ix = idx[lo:hi]
        blk = db[lo:hi]
        blk *= np.where(ix >= 0, sig[np.maximum(ix, 0)], 1.0)[:, None]
        blk += np.where(ix >= 0, 1.0, 0.0)[:, None] \
            * centers[np.maximum(ix, 0)]
        blk /= np.linalg.norm(blk, axis=1, keepdims=True)
    return db


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--centers", type=int, default=512)
    ap.add_argument("--clusters", type=int, default=256)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--nprobes", default="1,2,4,8,16,32,64")
    ap.add_argument("--spill", type=float, default=0.0,
                    help="also sweep an index with spilled assignments")
    args = ap.parse_args()

    import jax
    if os.environ.get("IVF_TPU") is None:
        # recall sweeps are compute-light; don't burn TPU compiles or
        # contend with kernel benchmarks (IVF_TPU=1 to override). Must
        # run BEFORE any backend initialization.
        jax.config.update("jax_platforms", "cpu")
    from reverso_tpu.store.ivf import IVFIndex

    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}  corpus: mixture of "
          f"{args.centers} Gaussians, N={args.n} d={args.d}, "
          f"IVF C={args.clusters}", flush=True)
    db = make_clustered(rng, args.n, args.d, args.centers)
    # queries near (not equal to) db points: perturbed members
    qi = rng.choice(args.n, args.queries, replace=False)
    qs = db[qi] + 0.05 * rng.standard_normal((args.queries, args.d)
                                             ).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)

    s64 = qs.astype(np.float64) @ db.astype(np.float64).T
    true_i = np.argsort(-s64, axis=1)[:, : args.k]

    nprobes = [int(x) for x in args.nprobes.split(",")]
    variants = [("bfloat16", 0.0), ("int8", 0.0)]
    if args.spill > 0:
        variants += [("bfloat16", args.spill), ("int8", args.spill)]
    table = {}
    for dtype, spill in variants:
        name = dtype + (f"+sp{spill}" if spill else "")
        t0 = time.time()
        idx = IVFIndex(db, n_clusters=args.clusters, dtype=dtype, seed=0,
                       spill=spill)
        build = time.time() - t0
        row = []
        for np_ in nprobes:
            t0 = time.time()
            _, ids = jax.device_get(idx.search(qs, args.k, nprobe=np_))
            dt = time.time() - t0
            rec = np.mean([len(set(p) & set(t)) / args.k
                           for p, t in zip(ids, true_i)])
            row.append((np_, rec, dt))
            print(f"  {name} nprobe={np_}: recall@{args.k}="
                  f"{rec:.4f} ({dt * 1e3:.0f} ms incl. host)", flush=True)
        table[name] = (build, row)

    names = [d + (f"+sp{s}" if s else "") for d, s in variants]
    print("\n| nprobe | " + " | ".join(f"recall@10 {n}" for n in names)
          + " |")
    print("|---|" + "---|" * len(names))
    for j, np_ in enumerate(nprobes):
        cells = " | ".join(f"{table[n][1][j][1]:.4f}" for n in names)
        print(f"| {np_} | {cells} |")
    print(f"\n(build: bf16 {table['bfloat16'][0]:.1f}s, "
          f"int8 {table['int8'][0]:.1f}s; scan fraction at nprobe=8 "
          f"~= {8 / args.clusters:.3f} of the corpus)")


if __name__ == "__main__":
    main()
