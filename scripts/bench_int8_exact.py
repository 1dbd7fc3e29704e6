#!/usr/bin/env python
"""Interleaved A/B: int8-exact streaming scan vs bf16, 1M x 1024, Q=256,
k=10; then a 4M-row capacity run (4 GB int8 resident — 2x the practical
bf16 ceiling alongside a model). Difference-of-block-minima timing."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def best_time(run, k=8, budget_s=25.0):
    def block(n, budget):
        best = float("inf")
        t0s = time.perf_counter()
        while time.perf_counter() - t0s < budget:
            t0 = time.perf_counter()
            r = None
            for _ in range(n):
                r = run()
            np.asarray(r[0][:1])
            best = min(best, time.perf_counter() - t0)
        return best
    h = max(1, k // 2)
    return max((block(k, budget_s / 2) - block(h, budget_s / 2)) / (k - h),
               1e-9)


def main():
    import jax
    import jax.numpy as jnp
    from reverso_tpu.cli import _enable_compile_cache
    from reverso_tpu.ops import (cosine_topk_pallas, cosine_topk_int8_exact,
                                 quantize_db_int8, l2_normalize)

    _enable_compile_cache()
    N, D, Q, K = 1024 * 1024, 1024, 256, 10
    db = l2_normalize(
        jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.float32))
    db16 = db.astype(jnp.bfloat16)
    v8, scale = quantize_db_int8(db)
    v8 = jax.device_put(v8)
    queries = db[:Q].astype(jnp.bfloat16)
    qf = db[:Q]

    run_bf16 = lambda: cosine_topk_pallas(db16, queries, K)
    run_int8 = lambda: cosine_topk_int8_exact(v8, scale, qf, K)

    sa, ia = map(np.asarray, run_bf16())
    sb, ib = map(np.asarray, run_int8())
    assert (ia[:, 0] == np.arange(Q)).all()
    assert (ib[:, 0] == np.arange(Q)).all(), (ib[:, 0] != np.arange(Q)).sum()
    rec = np.mean([len(set(a) & set(b)) / K for a, b in zip(ia, ib)])
    print(f"self-recall@1 both exact; int8-vs-bf16 id overlap {rec:.3f}",
          flush=True)

    for rnd in range(3):
        ta = best_time(run_bf16)
        tb = best_time(run_int8)
        print(f"round {rnd}: bf16 {ta*1e3:6.2f} ms ({Q/ta:7.0f} qps) | "
              f"int8 {tb*1e3:6.2f} ms ({Q/tb:7.0f} qps) | "
              f"int8/bf16 {ta/tb:.3f}x", flush=True)

    # capacity: 4M rows int8 (4 GB resident), quantized in chunks with a
    # shared scale (a 16 GB f32 intermediate would not fit HBM)
    del db, db16
    N4, CH = 4 * 1024 * 1024, 512 * 1024

    def chunk(i, sc):
        c = l2_normalize(jax.random.normal(
            jax.random.PRNGKey(100 + i), (CH, D), jnp.float32))
        return jnp.clip(jnp.round(c / sc), -127, 127).astype(jnp.int8)

    sc4 = jnp.float32(0.2 / 127.0)   # normalized rows: |v| < 0.2 at d=1024
    v84 = jnp.concatenate([chunk(i, sc4) for i in range(N4 // CH)])
    q4 = (v84[:Q].astype(jnp.float32) * sc4)
    run4 = lambda: cosine_topk_int8_exact(v84, sc4, q4, K)
    s4, i4 = map(np.asarray, run4())
    assert (i4[:, 0] == np.arange(Q)).all()
    t4 = best_time(run4, budget_s=20.0)
    print(f"4M x 1024 int8: {t4*1e3:6.2f} ms ({Q/t4:7.0f} qps), "
          f"self-recall@1 ok", flush=True)


if __name__ == "__main__":
    main()
