"""Product-quantized scan A/B on the real chip.

Measures, at 1M x 1024 (clustered data, the capacity regime PQ exists
for, same corpus generator as scripts/bench_pq.py's binary sibling):
 1. PQ candidate-scan latency (ops/pq.py, m bytes/row of HBM) vs the
    bf16 fused exact scan and the packed binary scan at the same query
    batch;
 2. candidate recall@10 (true exact top-10 inside the oversampled
    candidate set — after the engine's exact rescore this IS the
    end-to-end recall@10), PQ vs binary at MATCHED HBM (m = d/8).

Tunnel discipline: the corpus is generated on device; training pulls
only a 65,536-row sample to the host (~256 MB once), and encoding runs
on device against the device-resident matrix (ops.pq._pq_assign per
chunk) — nothing else big crosses. Timing forces a small transfer per
rep (np.asarray on the [Q, k] outputs) per the block_until_ready
caveat in CLAUDE.md.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def build_db(key, n, d, n_centers=4096, within_cos=0.85):
    kc, kn, ka = jax.random.split(key, 3)
    centers = jax.random.normal(kc, (n_centers, d), jnp.float32)
    centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)
    assign = jax.random.randint(ka, (n,), 0, n_centers)
    noise = float(np.sqrt((1 - within_cos) / within_cos / d))
    db = centers[assign] + noise * jax.random.normal(kn, (n, d),
                                                     jnp.float32)
    db = db / jnp.linalg.norm(db, axis=1, keepdims=True)
    return db, assign


@jax.jit
def pack_device(db):
    center = db.mean(axis=0, keepdims=True)
    bits = (db > center).astype(jnp.uint8)
    n, d = db.shape
    planes = bits.reshape(n, 8, d // 8)
    weights = (2 ** jnp.arange(8, dtype=jnp.uint32))[None, :, None]
    return (planes.astype(jnp.uint32) * weights).sum(1).astype(jnp.uint8)


def encode_device(db, cb, m, chunk=65536):
    """Codes for a DEVICE-resident matrix, chunked through the jitted
    assignment (no host round-trip of the 4 GB corpus)."""
    from reverso_tpu.ops.pq import _pq_assign

    n, d = db.shape
    dsub = d // m
    cb_j = jnp.asarray(cb)
    outs = []
    for lo in range(0, n, chunk):
        block = db[lo:lo + chunk].reshape(-1, m, dsub)
        outs.append(_pq_assign(block, cb_j))
    return jnp.concatenate(outs, axis=0)


def timed(fn, reps=5):
    outs = fn()
    _ = tuple(np.asarray(o)[:1, :1] for o in outs)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = fn()
        _ = tuple(np.asarray(o)[:1, :1] for o in outs)
        ts.append(time.perf_counter() - t0)
    return min(ts), outs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--q", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--m", type=int, default=0, help="0 = d/8")
    ap.add_argument("--oversampling", type=float, default=3.0)
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--centers", type=int, default=65536)
    ap.add_argument("--within-cos", type=float, default=0.85)
    ap.add_argument("--skip-binary", action="store_true")
    args = ap.parse_args()

    from reverso_tpu.ops.binary import binary_topk
    from reverso_tpu.ops.pq import pq_topk_xla, train_pq
    from reverso_tpu.ops.topk import cosine_topk_pallas

    n, d, q, k = args.n, args.d, args.q, args.k
    m = args.m or d // 8
    k_fetch = int(np.ceil(args.oversampling * k))
    key = jax.random.PRNGKey(0)
    db, _ = build_db(key, n, d, n_centers=args.centers,
                     within_cos=args.within_cos)
    db = jax.block_until_ready(db)
    db16 = db.astype(jnp.bfloat16)

    # train on a device-drawn sample (one ~256 MB pull)
    t0 = time.perf_counter()
    ks = jax.random.PRNGKey(7)
    srows = jax.random.randint(ks, (65536,), 0, n)
    host_sample = np.asarray(db[srows], np.float32)
    cb = train_pq(host_sample, m, iters=args.iters, sample=65536)
    t_train = time.perf_counter() - t0
    t0 = time.perf_counter()
    codes = jax.block_until_ready(encode_device(db, cb, m))
    t_enc = time.perf_counter() - t0
    print(f"train {t_train:.1f} s (incl. sample pull), encode 1M "
          f"{t_enc:.1f} s; codes {codes.nbytes/2**20:.0f} MB HBM "
          f"(m={m})")

    kq, kn2 = jax.random.split(jax.random.PRNGKey(1))
    rows = jax.random.randint(kq, (q,), 0, n)
    qs = db[rows] + (0.3 / np.sqrt(d)) * jax.random.normal(
        kn2, (q, d), jnp.float32)
    qs = jax.block_until_ready(qs / jnp.linalg.norm(qs, axis=1,
                                                    keepdims=True))
    cb_j = jnp.asarray(cb)

    t_pq, (ps, pi) = timed(lambda: pq_topk_xla(codes, cb_j, qs,
                                               k_fetch, d))
    t_bf16, (es, ei) = timed(lambda: cosine_topk_pallas(
        db16, qs.astype(jnp.bfloat16), k, n_valid=n))
    pi_h, ei_h = np.asarray(pi), np.asarray(ei)
    recall = np.mean([len(set(pi_h[r]) & set(ei_h[r])) / k
                      for r in range(q)])
    print(f"n={n} d={d} Q={q}: PQ scan (k_fetch={k_fetch}) "
          f"{t_pq*1e3:.2f} ms ({q/t_pq:,.0f} QPS) "
          f"[{codes.nbytes/2**20:.0f} MB HBM]")
    print(f"  bf16 exact scan (k={k}) {t_bf16*1e3:.2f} ms "
          f"({q/t_bf16:,.0f} QPS) [{n*d*2/2**20:.0f} MB HBM]")
    print(f"  PQ candidate recall@{k} at {args.oversampling:.1f}x "
          f"oversample: {recall:.3f}")
    if not args.skip_binary:
        packed = jax.block_until_ready(pack_device(db))
        t_bin, (bs, bi) = timed(lambda: binary_topk(
            packed, qs, k_fetch, d))
        bi_h = np.asarray(bi)
        brec = np.mean([len(set(bi_h[r]) & set(ei_h[r])) / k
                        for r in range(q)])
        print(f"  binary packed scan (k_fetch={k_fetch}) "
              f"{t_bin*1e3:.2f} ms [{packed.nbytes/2**20:.0f} MB HBM]: "
              f"candidate recall@{k} {brec:.3f} (matched bytes)")


if __name__ == "__main__":
    main()
