"""Binary-quantized scan A/B on the real chip.

Measures, at 1M x 1024 (clustered data, the regime BQ exists for):
 1. packed candidate-scan latency (ops/binary.py, 128 MB HBM) vs the
    bf16 fused exact scan (2 GB HBM) at the same query batch;
 2. candidate recall@10 (true exact top-10 inside the oversampled
    candidate set — after the engine's exact rescore this IS the
    end-to-end recall@10).

Everything is generated on device: a 4096-center Gaussian mixture
(within-cluster cosine ~0.85, cross ~0.03 — near-duplicate region
embeddings, the workload the reference serves) so nothing big crosses
the tunnel. Timing forces a small transfer per rep (np.asarray on the
[Q, k] outputs) per the block_until_ready caveat in CLAUDE.md.
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
    """Gaussian-mixture corpus with a REAL within-cluster cosine: the
    per-dim noise sigma is scaled by 1/sqrt(d) so |noise| stays the
    fraction of the unit center that yields `within_cos` (at high d an
    unscaled sigma drowns the centers and the data degenerates to
    uniform-random — no structure for any index to find)."""
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
    """Device-side pack: sign bits (vs the per-dim mean) into uint8,
    PLANAR layout — bit-compatible with ops.binary.pack_signs."""
    center = db.mean(axis=0, keepdims=True)
    bits = (db > center).astype(jnp.uint8)
    n, d = db.shape
    planes = bits.reshape(n, 8, d // 8)
    weights = (2 ** jnp.arange(8, dtype=jnp.uint32))[None, :, None]
    return (planes.astype(jnp.uint32) * weights).sum(1).astype(jnp.uint8)


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
    ap.add_argument("--oversampling", type=float, default=3.0)
    ap.add_argument("--centers", type=int, default=65536,
                    help="mixture centers; n/centers = points per "
                         "near-duplicate group")
    ap.add_argument("--sweep-chunk", action="store_true",
                    help="A/B the scan chunk size in-session")
    args = ap.parse_args()

    from reverso_tpu.ops.binary import binary_topk_xla
    from reverso_tpu.ops.topk import cosine_topk_pallas

    n, d, q, k = args.n, args.d, args.q, args.k
    k_fetch = int(np.ceil(args.oversampling * k))
    key = jax.random.PRNGKey(0)
    db, _ = build_db(key, n, d, n_centers=args.centers)
    db = jax.block_until_ready(db)
    packed = jax.block_until_ready(pack_device(db))
    db16 = jax.block_until_ready(db.astype(jnp.bfloat16))
    # queries: perturbed copies of db rows (near-duplicate lookups)
    kq, kn2 = jax.random.split(jax.random.PRNGKey(1))
    rows = jax.random.randint(kq, (q,), 0, n)
    # perturbation |noise| ~ 0.3 of the unit row (cos(q, row) ~ 0.96)
    qs = db[rows] + (0.3 / np.sqrt(d)) * jax.random.normal(
        kn2, (q, d), jnp.float32)
    qs = jax.block_until_ready(qs / jnp.linalg.norm(qs, axis=1,
                                                    keepdims=True))

    from reverso_tpu.ops.binary import binary_topk_pallas

    if args.sweep_chunk:
        for c in (8192, 32768, 65536, 131072):
            t, _o = timed(lambda c=c: binary_topk_xla(packed, qs,
                                                      k_fetch, d, chunk=c))
            print(f"  chunk={c}: {t*1e3:.2f} ms", flush=True)
    t_pal, (ps, pi) = timed(lambda: binary_topk_pallas(packed, qs,
                                                       k_fetch, d))
    t_bin, (bs, bi) = timed(lambda: binary_topk_xla(packed, qs, k_fetch, d))
    t_bf16, (es, ei) = timed(lambda: cosine_topk_pallas(
        db16, qs.astype(jnp.bfloat16), k, n_valid=n))
    print(f"  PALLAS packed scan {t_pal*1e3:.2f} ms ({q/t_pal:,.0f} QPS); "
          f"ids == xla: {bool((np.asarray(pi) == np.asarray(bi)).all())}")
    bi_h, ei_h = np.asarray(bi), np.asarray(ei)
    recall = np.mean([len(set(bi_h[r]) & set(ei_h[r])) / k
                      for r in range(q)])
    print(f"n={n} d={d} Q={q}: packed scan (k_fetch={k_fetch}) "
          f"{t_bin*1e3:.2f} ms ({q/t_bin:,.0f} QPS) "
          f"[{n*(d//8)/2**20:.0f} MB HBM]")
    print(f"  bf16 exact scan (k={k}) {t_bf16*1e3:.2f} ms "
          f"({q/t_bf16:,.0f} QPS) [{n*d*2/2**20:.0f} MB HBM]")
    print(f"  candidate recall@{k} at {args.oversampling:.1f}x "
          f"oversample: {recall:.3f}")


if __name__ == "__main__":
    main()
