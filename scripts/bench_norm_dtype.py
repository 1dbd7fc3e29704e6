#!/usr/bin/env python
"""Interleaved A/B: PE-L14-336 embed throughput with fp32 vs bf16
LayerNorms (fp32 params either way), plus embedding cosine agreement.

The chip is time-shared; only interleaved same-session comparisons are
valid (PERF.md). Timing via difference of block minima.
"""
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def best_time(run, k=4, budget_s=14.0):
    def block(n, budget):
        best = float("inf")
        t0s = time.perf_counter()
        while time.perf_counter() - t0s < budget:
            t0 = time.perf_counter()
            r = None
            for _ in range(n):
                r = run()
            np.asarray(r[:1, :8])
            best = min(best, time.perf_counter() - t0)
        return best
    t_k = block(k, budget_s / 2)
    t_h = block(max(1, k // 2), budget_s / 2)
    return max((t_k - t_h) / (k - max(1, k // 2)), 1e-9)


def main():
    import jax
    import jax.numpy as jnp
    from reverso_tpu.cli import _enable_compile_cache
    _enable_compile_cache()
    from reverso_tpu.config import MODEL_PRESETS
    from reverso_tpu.models.pe import PerceptionEncoder

    base = MODEL_PRESETS["PE-Core-L14-336"]
    pe32 = PerceptionEncoder(base)
    pe16 = PerceptionEncoder(
        dataclasses.replace(base, norm_dtype="bfloat16"))
    pe16.params = pe32.params   # identical weights

    for B in (32, 64):
        images = jax.random.normal(
            jax.random.PRNGKey(0), (B, 336, 336, 3), jnp.float32)
        r32 = lambda: pe32._fwd(pe32.params, images)
        r16 = lambda: pe16._fwd(pe16.params, images)
        a, b = np.asarray(r32()), np.asarray(r16())
        an = a / np.linalg.norm(a, axis=1, keepdims=True)
        bn = b / np.linalg.norm(b, axis=1, keepdims=True)
        cos = np.sum(an * bn, axis=1)
        # interleave: A, B, A, B
        t32a = best_time(r32); t16a = best_time(r16)
        t32b = best_time(r32); t16b = best_time(r16)
        t32 = min(t32a, t32b); t16 = min(t16a, t16b)
        print(f"B={B:3d}: fp32-LN {B/t32:6.1f} img/s | bf16-LN "
              f"{B/t16:6.1f} img/s ({t32/t16:.3f}x) | "
              f"cos min {cos.min():.6f} mean {cos.mean():.6f}", flush=True)


if __name__ == "__main__":
    main()
