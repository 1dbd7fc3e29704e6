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

Everything O(N*d) stays on device: the clustered corpus is GENERATED
in HBM (host RAM never holds it — a 16 GiB host corpus is minutes of
memcpy even on a healthy host), the index is built with
`IVFIndex.from_device`, and the exact-scan ground truth runs over the
index's own cluster-sorted int8 matrix (ids mapped back through
row_ids), so no second exact copy is staged.

Run:  python scripts/bench_ivf_tpu.py [--n 4194304]
Reference analog: the corpus-scaling axis of the qdrant scan it
replaces (/root/reference/core_system.py:659-664).
"""
import argparse
import functools
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))   # repo root: bench, reverso_tpu


def make_clustered_device(seed: int, n: int, d: int, n_centers: int,
                          chunk: int = 262144):
    """Mixture-of-Gaussians corpus generated ON DEVICE, bf16 [n, d].

    Same distribution as bench_ivf_recall.make_clustered (lognormal
    cluster sizes, sigma*sqrt(d) in [0.3, 0.8], 15% diffuse
    background), but only the O(n) assignment vector exists on host;
    noise, center add, and normalization run chunked on device.
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    n_bg = int(0.15 * n)
    w = rng.lognormal(0.0, 1.0, n_centers)
    sizes = np.maximum(1, (w / w.sum() * (n - n_bg))).astype(int)
    while sizes.sum() < n - n_bg:
        sizes[rng.integers(n_centers)] += 1
    sig = (rng.uniform(0.3, 0.8, n_centers) / np.sqrt(d)).astype(
        np.float32)
    idx = np.repeat(np.arange(n_centers, dtype=np.int32),
                    sizes)[:n - n_bg]
    idx = np.concatenate([idx, np.full(n_bg, -1, np.int32)])
    rng.shuffle(idx)

    key = jax.random.PRNGKey(seed)
    centers = jax.random.normal(key, (n_centers, d), jnp.float32)
    centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)
    sig_d = jnp.asarray(sig)

    @functools.partial(jax.jit, static_argnames=("rows",),
                       donate_argnames=("buf",))
    def gen(buf, step, ix, lo, rows: int):
        noise = jax.random.normal(jax.random.fold_in(key, step + 1),
                                  (rows, d), jnp.float32)
        clustered = (ix >= 0)[:, None]
        s = jnp.where(clustered, sig_d[jnp.maximum(ix, 0)][:, None], 1.0)
        c = jnp.where(clustered, 1.0, 0.0) * centers[jnp.maximum(ix, 0)]
        r = noise * s + c
        r = r / jnp.linalg.norm(r, axis=1, keepdims=True)
        return jax.lax.dynamic_update_slice(buf, r.astype(jnp.bfloat16),
                                            (lo, 0))

    # write chunks into ONE donated buffer: jnp.concatenate(parts) would
    # briefly hold corpus x2 in HBM (16 GiB at N=4M) and OOM the chip
    buf = jnp.zeros((n, d), jnp.bfloat16)
    for i, lo in enumerate(range(0, n, chunk)):
        rows = min(chunk, n - lo)
        buf = gen(buf, i, jnp.asarray(idx[lo:lo + rows]),
                  jnp.int32(lo), rows=rows)
    return buf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4 * 1024 * 1024)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--centers", type=int, default=4096)
    ap.add_argument("--clusters", type=int, default=1024)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--spill", type=float, default=0.0)
    ap.add_argument("--balance", type=float, default=0.0)
    ap.add_argument("--qs", default="1,8")
    ap.add_argument("--nprobes", default="8,16,32")
    ap.add_argument("--eval-queries", type=int, default=64)
    ap.add_argument("--budget", type=float, default=20.0,
                    help="seconds of timing budget per point")
    args = ap.parse_args()

    import jax
    if os.environ.get("IVF_CPU"):        # smoke-test the plumbing off-TPU
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from bench import _best_time
    from reverso_tpu.cli import _enable_compile_cache
    from reverso_tpu.ops.topk import cosine_topk_int8_xla
    from reverso_tpu.store.ivf import IVFIndex

    _enable_compile_cache()
    print(f"backend={jax.default_backend()}  N={args.n} d={args.d} "
          f"int8, {args.centers}-Gaussian corpus, IVF C={args.clusters}",
          flush=True)

    rng = np.random.default_rng(0)
    t0 = time.time()
    emb = make_clustered_device(0, args.n, args.d, args.centers)
    np.asarray(emb[:1, :1])                      # sync
    print(f"corpus generated on device in {time.time() - t0:.0f}s "
          f"({emb.nbytes / 2**30:.1f} GiB HBM bf16)", flush=True)

    # eval queries: perturbed corpus members (pull 64 rows, not the db)
    qi = np.sort(rng.choice(args.n, args.eval_queries, replace=False))
    qs_eval = np.asarray(jnp.take(emb, jnp.asarray(qi), axis=0),
                         np.float32)
    qs_eval += 0.05 * rng.standard_normal(
        (args.eval_queries, args.d)).astype(np.float32)
    qs_eval /= np.linalg.norm(qs_eval, axis=1, keepdims=True)

    # ---- IVF build, fully on device (from_device) -------------------
    t0 = time.time()
    ivf = IVFIndex.from_device(emb, n_clusters=args.clusters,
                               dtype="int8", seed=0, spill=args.spill,
                               balance=args.balance)
    np.asarray(ivf.matrix[:1, :1])               # sync
    build_s = time.time() - t0
    print(f"IVF from_device build {build_s:.0f}s  cmax={ivf.cmax} "
          f"(scan fraction/probe ~= {ivf.cmax / args.n:.4f})", flush=True)
    emb.delete()       # free the bf16 source: the index owns the rows now

    # ---- exact int8 baseline over the index's OWN sorted rows -------
    # (no second copy staged; positions map back through row_ids)
    row_ids = jnp.concatenate([ivf.row_ids,
                               jnp.full((1,), -1, jnp.int32)])

    def exact(q):
        s, pos = cosine_topk_int8_xla(ivf.matrix, ivf.db_scale,
                                      q, args.k, n_valid=ivf.m)
        return s, jnp.where(pos < 0, -1,
                            row_ids[jnp.clip(pos, 0, ivf.m)])

    if args.spill > 0:
        # spilled copies duplicate ids in the sorted matrix: fetch 2k
        # and dedup keep-first per query so ground truth has k UNIQUE ids
        s2k, pos2k = jax.device_get(cosine_topk_int8_xla(
            ivf.matrix, ivf.db_scale, qs_eval, 2 * args.k,
            n_valid=ivf.m))
        ids2k = np.where(pos2k < 0, -1,
                         np.asarray(row_ids)[np.clip(pos2k, 0, ivf.m)])
        i_true = np.stack([
            np.array([x for j, x in enumerate(r)
                      if x not in r[:j]][:args.k])
            for r in ids2k])
    else:
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
