#!/usr/bin/env python
"""Interleaved A/B: deferred (software-pipelined) extraction vs inline,
1M x 1024 bf16, Q=256, k=10. Difference-of-block-minima timing."""
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
    from reverso_tpu.ops import cosine_topk_pallas, l2_normalize

    _enable_compile_cache()
    N, D, Q, K = 1024 * 1024, 1024, 256, 10
    db = l2_normalize(
        jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.bfloat16))
    queries = db[:Q]

    run_a = lambda: cosine_topk_pallas(db, queries, K, defer=False)
    # defer needs the smaller tile to fit the second staging buffer in
    # VMEM (17.06M > 16M scoped limit at db_tile=1024)
    run_b = lambda: cosine_topk_pallas(db, queries, K, defer=True,
                                       db_tile=512)
    run_c = lambda: cosine_topk_pallas(db, queries, K, defer=False,
                                       db_tile=512)

    sa, ia = map(np.asarray, run_a())
    sb, ib = map(np.asarray, run_b())
    np.asarray(run_c()[0])
    assert np.array_equal(ia, ib), (ia != ib).sum()
    assert (ia[:, 0] == np.arange(Q)).all()
    print("hardware parity exact", flush=True)

    for rnd in range(3):
        ta = best_time(run_a)
        tb = best_time(run_b)
        tc = best_time(run_c)
        print(f"round {rnd}: inline1024 {ta*1e3:6.2f} ms ({Q/ta:7.0f} qps)"
              f" | defer512 {tb*1e3:6.2f} ms ({Q/tb:7.0f} qps)"
              f" | inline512 {tc*1e3:6.2f} ms ({Q/tc:7.0f} qps)"
              f" | best-speedup {ta/min(tb,tc):.3f}x", flush=True)


if __name__ == "__main__":
    main()
