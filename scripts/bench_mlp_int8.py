#!/usr/bin/env python
"""Pallas fused-MLP: bf16 vs int8-dynamic (quant=True) at ViT-L shape.

The XLA int8_linear path loses on the MLP's wide-input matmul (0.74x —
the per-row quantize pass round-trips [T, 4096] through HBM,
bench_int8_linear.py). The Pallas variant quantizes x ONCE per row
tile into VMEM scratch and re-quantizes the hidden activation
per-chunk in VMEM — this script decides whether that recovers the s8
MXU's 2x (397 vs 197 TOP/s, bench_mxu.py).

Interleaved rounds; the ratio is the result, absolute ms drifts with
chip sharing. Also prints mean relative error vs the f32 XLA MLP.

Run: python scripts/bench_mlp_int8.py
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
    from reverso_tpu.ops.fused_mlp import fused_mlp, mlp_xla

    _enable_compile_cache()
    print("backend:", jax.default_backend(), flush=True)

    T, W, HID = 64 * 584, 1024, 4096         # ViT-L B=64 layer shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, W)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((W, HID)) / 32.0, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal(HID) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((HID, W)) / 64.0, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal(W) * 0.02, jnp.bfloat16)

    bf = jax.jit(lambda x: fused_mlp(x, w1, b1, w2, b2))
    q8 = jax.jit(lambda x: fused_mlp(x, w1, b1, w2, b2, quant=True))

    ref = np.asarray(mlp_xla(x.astype(jnp.float32), w1.astype(jnp.float32),
                             b1.astype(jnp.float32), w2.astype(jnp.float32),
                             b2.astype(jnp.float32)))
    for name, fn in [("bf16", bf), ("int8", q8)]:
        got = np.asarray(fn(x), np.float32)
        rel = np.abs(got - ref).mean() / np.abs(ref).mean()
        print(f"{name} relerr vs f32: {rel:.2e}", flush=True)

    np.asarray(bf(x)[:1, :1]); np.asarray(q8(x)[:1, :1])
    t_bf, t_q8 = [], []
    for _ in range(3):
        t_bf.append(_best_time(lambda: bf(x),
                               lambda r: np.asarray(r[:1, :1]),
                               budget_s=6.0))
        t_q8.append(_best_time(lambda: q8(x),
                               lambda r: np.asarray(r[:1, :1]),
                               budget_s=6.0))
    tb, tq = min(t_bf), min(t_q8)
    fl = 4 * T * W * HID
    print(f"bf16 {tb*1e3:6.3f} ms ({fl/tb/1e12:5.1f}T)   "
          f"int8 {tq*1e3:6.3f} ms ({fl/tq/1e12:5.1f}T)   "
          f"ratio {tb/tq:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
