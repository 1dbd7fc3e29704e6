#!/usr/bin/env python
"""Decision micro-bench: dynamic-int8 linear vs bf16 at ViT-L shapes.

The embed tower at B=64 (PERF.md round-3 accounting) spends 96 ms in
the MLP (87% of bf16 peak) and ~48 ms in q/k/v/out projections. The s8
MXU path is 2x bf16 (397 vs 197 TOP/s, bench_mxu.py) — IF the XLA
`dot(s8, s8) -> s32` lowering hits it AND the per-row dynamic
quantize/dequant passes fuse away, `ops.quant.int8_linear` halves the
MXU time of every projection. This script answers whether the XLA path
delivers before any model wiring happens.

Interleaved timing (bf16/int8 alternating rounds) — absolute ms drifts
with chip sharing; only the ratio matters. Also prints the relative
error of the int8 result vs an f32 reference (expected ~0.2% at
d=1024 per the PERF.md accuracy model).

Run: python scripts/bench_int8_linear.py
"""
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))


def main():
    import jax
    import jax.numpy as jnp
    from bench import _best_time
    from reverso_tpu.cli import _enable_compile_cache
    from reverso_tpu.ops.quant import int8_linear, quantize_weight_int8

    _enable_compile_cache()
    print("backend:", jax.default_backend(), flush=True)

    T = 64 * 584                       # B=64, S=577 padded to 584
    shapes = [
        ("proj 1024->1024", T, 1024, 1024),
        ("qkv  1024->3072", T, 1024, 3072),
        ("mlp up 1024->4096", T, 1024, 4096),
        ("mlp dn 4096->1024", T, 4096, 1024),
    ]
    rng = np.random.default_rng(0)

    bf16 = jax.jit(lambda x, w: jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    i8 = jax.jit(lambda x, w8, ws: int8_linear(x, w8, ws))

    for name, t, d_in, d_out in shapes:
        x = jnp.asarray(rng.standard_normal((t, d_in)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((d_in, d_out))
                        / np.sqrt(d_in), jnp.bfloat16)
        w8, ws = quantize_weight_int8(w)
        w8, ws = jax.device_put(w8), jax.device_put(ws)

        ref = np.asarray(jnp.dot(x.astype(jnp.float32),
                                 w.astype(jnp.float32)))
        got = np.asarray(i8(x, w8, ws), np.float32)
        rel = np.abs(got - ref) / (np.abs(ref).mean() + 1e-9)
        np.asarray(bf16(x, w)[:1, :1])           # compile both
        np.asarray(i8(x, w8, ws)[:1, :1])

        t_bf, t_i8 = [], []
        for _ in range(3):                       # interleaved rounds
            t_bf.append(_best_time(lambda: bf16(x, w),
                                   lambda r: np.asarray(r[:1, :1]),
                                   budget_s=4.0))
            t_i8.append(_best_time(lambda: i8(x, w8, ws),
                                   lambda r: np.asarray(r[:1, :1]),
                                   budget_s=4.0))
        tb, ti = min(t_bf), min(t_i8)
        fl = 2 * t * d_in * d_out
        print(f"{name}: bf16 {tb*1e3:6.3f} ms ({fl/tb/1e12:5.1f}T)  "
              f"int8 {ti*1e3:6.3f} ms ({fl/ti/1e12:5.1f}T)  "
              f"ratio {tb/ti:4.2f}x  relerr mean {rel.mean():.2e} "
              f"p99 {np.quantile(rel, 0.99):.2e}", flush=True)


if __name__ == "__main__":
    main()
