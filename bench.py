"""Headline benchmark: exact cosine top-10 QPS over 1M x 1024 vectors.

This is the driver's north-star metric (BASELINE.json: >= 10,000 QPS on a
v5e-8; vs_baseline is measured QPS / 10,000). The database is generated
and normalized on-device (the host<->device tunnel in this environment is
slow and irrelevant to steady-state serving). Query batch 256, bf16
storage, fp32 accumulation, Pallas streaming kernel.

Prints exactly one JSON line. `python bench.py --embed` instead prints
the PE-Core-L14-336 embedding-throughput line (BASELINE.md ">= 50x the
CPU baseline" target; the reference CPU path runs ~1-3 img/s).
"""
import json
import sys
import time

import numpy as np


def _best_time(run, sync, iters=None, budget_s=60.0, k=8):
    """Per-call kernel time as a difference of block minima.

    The tunnel to the TPU adds a per-SYNC round-trip that has been
    observed anywhere from ~1.6 ms to ~29 ms depending on load, while
    dispatch stays async and the chip itself runs at full speed. Timing
    single synced calls conflates that latency with kernel time, so:
    time a block of k dispatches + one sync, and a block of k/2, take
    the min of each over a time budget, and use the difference — an
    estimator immune to any additive sync latency, with min() handling
    multiplicative contention. The k-blocks and half-blocks ALTERNATE
    within one loop (the chip is time-shared: two disjoint windows can
    sample different contention regimes and corrupt the subtraction;
    interleaved minima see the same best-case regime).
    (iters is accepted for compatibility.)"""
    del iters

    k = max(2, k)
    half = max(1, k // 2)
    best = {k: float("inf"), half: float("inf")}
    t_start = time.perf_counter()
    while time.perf_counter() - t_start < budget_s:
        for n in (k, half):
            t0 = time.perf_counter()
            r = None
            for _ in range(n):
                r = run()
            sync(r)
            best[n] = min(best[n], time.perf_counter() - t0)
    return max((best[k] - best[half]) / (k - half), 1e-9)


def embed_main() -> None:
    """PE-Core-L14-336 bf16 image embedding throughput (best of batch
    32/64 — a throughput metric; 64 amortizes per-layer overheads)."""
    import jax
    import jax.numpy as jnp
    from reverso_tpu.cli import _enable_compile_cache
    from reverso_tpu.models.pe import PerceptionEncoder

    _enable_compile_cache()
    pe = PerceptionEncoder.from_preset("PE-Core-L14-336")

    ips = 0.0
    for B in (32, 64):
        images = jax.random.normal(
            jax.random.PRNGKey(0), (B, 336, 336, 3), jnp.float32)

        def run():
            return pe._fwd(pe.params, images)

        np.asarray(run())[:1]
        dt = _best_time(run, lambda r: np.asarray(r[:1, :8]),
                        budget_s=30.0, k=4)
        ips = max(ips, B / dt)
    print(json.dumps({
        "metric": "pe_l14_336_embed_img_per_s",
        "value": round(ips, 1),
        "unit": "img/s",
        "vs_baseline": round(ips / 2.0, 1),   # reference CPU ~1-3 img/s
    }))


def _contention_reference(budget_s: float = 25.0) -> dict:
    """Same-session roofline co-measurement so BENCH artifacts are
    self-interpreting (VERDICT r3 weak #2): a bare 8192^3 bf16 matmul
    (1.10 TFLOP) timed with the same block-minima estimator. The chip
    is time-shared; this chip's uncontended peak is ~197 TFLOP/s bf16
    (PERF.md). `ref_matmul_frac_peak` near 1.0 means the QPS number was
    taken in a clean window; well below 1.0 means tenant contention —
    round-to-round QPS drift should be read against it."""
    import jax
    import jax.numpy as jnp

    M = 8192
    a = jax.random.normal(jax.random.PRNGKey(1), (M, M), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(2), (M, M), jnp.bfloat16)
    mm = jax.jit(lambda x, y: x @ y)
    np.asarray(mm(a, b)[:1, :8])
    dt = _best_time(lambda: mm(a, b), lambda r: np.asarray(r[:1, :8]),
                    budget_s=budget_s, k=8)
    tflops = 2 * M**3 / dt / 1e12
    return {
        "ref_matmul_tflops": round(tflops, 1),
        "ref_matmul_frac_peak": round(tflops / 197.0, 3),
    }


def main() -> None:
    import jax
    import jax.numpy as jnp
    from reverso_tpu.cli import _enable_compile_cache
    from reverso_tpu.ops import cosine_topk_pallas, l2_normalize

    _enable_compile_cache()

    N_PAD, N, D, Q, K = 1024 * 1024, 1_000_000, 1024, 256, 10

    db = l2_normalize(
        jax.random.normal(jax.random.PRNGKey(0), (N_PAD, D), jnp.bfloat16))
    queries = db[:Q]

    def run():
        return cosine_topk_pallas(db, queries, K, n_valid=N)

    # correctness gate: every query must find itself at rank 0
    scores, idx = run()
    idx_h = np.asarray(idx)
    assert (idx_h[:, 0] == np.arange(Q)).all(), "self-recall@1 failed"

    # warm + honest timing (block_until_ready does not sync through the
    # axon tunnel; a host transfer does). The chip is time-shared and
    # contended windows last minutes — a longer budget raises the odds
    # the interleaved minima catch an uncontended stretch, and min()
    # only improves with more blocks.
    np.asarray(run()[0])
    dt = _best_time(run, lambda r: np.asarray(r[0][:1]), k=8,
                    budget_s=150.0)
    qps = Q / dt

    line = {
        "metric": "exact_cosine_top10_qps_1M",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / 10000.0, 3),
        "scan_ms": round(dt * 1e3, 2),
    }
    line.update(_contention_reference())
    print(json.dumps(line))


def _require_device(timeout_s: float = 540.0) -> None:
    """Fail fast (with a diagnosable JSON line) if the TPU tunnel is
    unreachable: backend init otherwise hangs FOREVER during an axon
    outage (observed 2026-08-17), and a silent hang at round end loses
    the whole bench artifact. 540 s, not 300: under tenant contention
    the first remote compile of even an 8x8 matmul was MEASURED at
    141 s (2026-08-19), and a 300 s cut zeroed two otherwise-healthy
    bench runs that session."""
    import threading

    ok = threading.Event()

    def probe():
        import jax
        import jax.numpy as jnp
        x = jnp.ones((8, 8))
        np.asarray(x @ x)
        ok.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    if not ok.wait(timeout_s):
        print(json.dumps({
            "metric": "exact_cosine_top10_qps_1M",
            "value": 0.0,
            "unit": "qps",
            "vs_baseline": 0.0,
            "error": f"device unreachable after {timeout_s:.0f}s "
                     "(axon tunnel down?)",
        }))
        sys.exit(2)


if __name__ == "__main__":
    _require_device()
    if "--embed" in sys.argv:
        embed_main()
    else:
        main()
