#!/usr/bin/env python
"""Interleaved A/B: IVF Pallas probed-scan kernel vs the XLA probe
loop, on the REAL chip.

The XLA path pays a dynamic_slice copy of every padded [cmax, d]
cluster slice plus fori_loop dispatch per probe; the kernel streams
only the probed ranges through a manual DMA ring (ops/ivf_scan.py).
Both paths return identical results (bitwise for int8) — this measures
latency at serving batch sizes on clustered data with `balance`
capping cmax.

Timing is interleaved per (Q, nprobe) point (chip is time-shared;
cross-run absolute numbers drift) with latency-immune block minima.

Run:  python scripts/bench_ivf_probe.py [--n 4194304] [--balance 1.25]
"""
import argparse
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4 * 1024 * 1024)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--centers", type=int, default=4096)
    ap.add_argument("--clusters", type=int, default=1024)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--spill", type=float, default=0.0)
    ap.add_argument("--balance", type=float, default=1.25)
    ap.add_argument("--dtype", default="int8")
    ap.add_argument("--qs", default="1,8,64")
    ap.add_argument("--nprobes", default="8,32")
    ap.add_argument("--budget", type=float, default=8.0)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    if os.environ.get("IVF_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from bench import _best_time
    from reverso_tpu.cli import _enable_compile_cache
    from reverso_tpu.store.ivf import IVFIndex
    from bench_ivf_tpu import make_clustered_device

    _enable_compile_cache()
    print(f"backend={jax.default_backend()}  N={args.n} d={args.d} "
          f"{args.dtype}, C={args.clusters} balance={args.balance} "
          f"spill={args.spill}", flush=True)

    t0 = time.time()
    emb = make_clustered_device(0, args.n, args.d, args.centers)
    np.asarray(emb[:1, :1])
    print(f"corpus on device in {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    ivf = IVFIndex.from_device(emb, n_clusters=args.clusters,
                               dtype=args.dtype, seed=0, spill=args.spill,
                               balance=args.balance)
    np.asarray(ivf.matrix[:1, :1])
    print(f"build {time.time() - t0:.0f}s  n_clusters={ivf.n_clusters} "
          f"cmax={ivf.cmax}", flush=True)
    emb.delete()

    rng = np.random.default_rng(0)
    qn_max = max(int(x) for x in args.qs.split(","))
    qi = np.sort(rng.choice(args.n, qn_max, replace=False))
    qs_all = np.asarray(jnp.take(ivf.matrix, jnp.asarray(qi), axis=0),
                        np.float32)
    if args.dtype == "int8":
        qs_all *= ivf.db_scale
    qs_all += 0.05 * rng.standard_normal(qs_all.shape).astype(np.float32)
    qs_all /= np.linalg.norm(qs_all, axis=1, keepdims=True)

    results = []
    for q_n in [int(x) for x in args.qs.split(",")]:
        q = qs_all[:q_n]
        for np_ in [int(x) for x in args.nprobes.split(",")]:
            # compile + equality check outside timing
            s_x, i_x = jax.device_get(ivf.search(q, args.k, nprobe=np_,
                                                 impl="xla"))
            s_p, i_p = jax.device_get(ivf.search(q, args.k, nprobe=np_,
                                                 impl="pallas"))
            eq = np.array_equal(i_x, i_p)
            ts_x, ts_p = [], []
            for _ in range(args.rounds):
                ts_x.append(_best_time(
                    lambda: ivf.search(q, args.k, nprobe=np_, impl="xla"),
                    lambda r: np.asarray(r[0][:1, :1]),
                    budget_s=args.budget))
                ts_p.append(_best_time(
                    lambda: ivf.search(q, args.k, nprobe=np_,
                                       impl="pallas"),
                    lambda r: np.asarray(r[0][:1, :1]),
                    budget_s=args.budget))
            dx, dp = min(ts_x), min(ts_p)
            print(f"Q={q_n:>3} nprobe={np_:>2}: xla {dx * 1e3:7.2f} ms | "
                  f"pallas {dp * 1e3:7.2f} ms  ({dx / dp:.2f}x)  ids_eq={eq}",
                  flush=True)
            results.append((q_n, np_, dx, dp, eq))

    print("\n| Q | nprobe | xla ms | pallas ms | speedup | ids equal |")
    print("|---|---|---|---|---|---|")
    for q_n, np_, dx, dp, eq in results:
        print(f"| {q_n} | {np_} | {dx * 1e3:.2f} | {dp * 1e3:.2f} "
              f"| {dx / dp:.2f}x | {eq} |")


if __name__ == "__main__":
    main()
