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


def embed_main() -> None:
    """PE-Core-L14-336 bf16 image embedding throughput, batch 32."""
    import jax
    import jax.numpy as jnp
    from reverso_tpu.cli import _enable_compile_cache
    from reverso_tpu.models.pe import PerceptionEncoder

    _enable_compile_cache()
    B = 32
    pe = PerceptionEncoder.from_preset("PE-Core-L14-336")
    images = jax.random.normal(
        jax.random.PRNGKey(0), (B, 336, 336, 3), jnp.float32)

    def run():
        return pe._fwd(pe.params, images)

    np.asarray(run())[:1]
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        r = run()
    np.asarray(r[:1, :8])      # small transfer forces sync (axon tunnel)
    dt = (time.perf_counter() - t0) / iters
    ips = B / dt
    print(json.dumps({
        "metric": "pe_l14_336_embed_img_per_s",
        "value": round(ips, 1),
        "unit": "img/s",
        "vs_baseline": round(ips / 2.0, 1),   # reference CPU ~1-3 img/s
    }))


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
    # axon tunnel; a host transfer does)
    np.asarray(run()[0])
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        r = run()
    np.asarray(r[0])
    dt = (time.perf_counter() - t0) / iters
    qps = Q / dt

    print(json.dumps({
        "metric": "exact_cosine_top10_qps_1M",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / 10000.0, 3),
    }))


if __name__ == "__main__":
    if "--embed" in sys.argv:
        embed_main()
    else:
        main()
