#!/usr/bin/env python
"""Diagnose the int8 tower's end-to-end gap: time none / int8_mlp /
int8_qkv / int8 variants interleaved (bench_embed_int8.py measured
1.03x where components predicted ~1.18x — which half underdelivers
in-model?).

Run: python scripts/bench_embed_quant_parts.py
"""
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))


def main():
    import jax
    import jax.numpy as jnp
    from bench import _best_time
    from reverso_tpu.cli import _enable_compile_cache
    from reverso_tpu.models.pe import PerceptionEncoder

    _enable_compile_cache()
    print("backend:", jax.default_backend(), flush=True)

    base = PerceptionEncoder.from_preset("PE-Core-L14-336")
    variants = {"none": base}
    for q in ("int8_mlp", "int8_qkv", "int8"):
        variants[q] = PerceptionEncoder.from_preset(
            "PE-Core-L14-336", params=base.params, quant=q)

    B = 64
    images = jax.random.normal(jax.random.PRNGKey(0),
                               (B, 336, 336, 3), jnp.float32)
    for pe in variants.values():
        np.asarray(pe._fwd(pe.params, images))[:1]

    times = {k: [] for k in variants}
    for _ in range(3):
        for k, pe in variants.items():
            times[k].append(_best_time(
                lambda pe=pe: pe._fwd(pe.params, images),
                lambda r: np.asarray(r[:1, :8]), budget_s=10.0, k=4))
    t0 = min(times["none"])
    for k in variants:
        t = min(times[k])
        print(f"{k:9s}: {t*1e3:6.1f} ms  {B/t:5.1f} img/s  "
              f"ratio {t0/t:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
