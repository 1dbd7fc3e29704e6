#!/usr/bin/env python
"""MXU throughput probe: bf16 vs int8 vs f32 matmul inside Pallas.

Round-1 finding (PERF.md): Mosaic lowered s8xs8->s32 dots ~4x BELOW
bf16, so int8 vector storage lost its DMA win to compute. If a newer
toolchain lowers int8 natively (v5e spec: int8 is 2x bf16 FLOPs), the
int8 top-k (`ops/topk_int8.py`) flips from a capacity option to the
fastest search path (half the HBM bytes). Interleaved, min-of-synced
timing; ratios are meaningful even on the shared chip.
"""
import time

import numpy as np


def bench(m, k, n, dtype, acc, iters=1024, reps=10):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, b_ref, o_ref):
        b = b_ref[:]

        def body(_, carry):
            a, acc_v = carry
            acc_v = acc_v + jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())), preferred_element_type=acc)
            if dtype == "int8":
                a = jnp.bitwise_xor(a, jnp.ones((), jnp.int8))
            else:
                a = (a + jnp.ones((), a_ref.dtype)).astype(a_ref.dtype)
            return a, acc_v

        _, acc_v = jax.lax.fori_loop(
            0, iters, body, (a_ref[:], jnp.zeros((m, n), acc)))
        o_ref[:] = acc_v[:8]

    rng = np.random.default_rng(0)
    if dtype == "int8":
        a = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
        b = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)
    else:
        a = jnp.asarray(rng.standard_normal((m, k)), dtype)
        b = jnp.asarray(rng.standard_normal((k, n)), dtype)
    fn = jax.jit(lambda a, b: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n), acc),
    )(a, b))
    try:
        np.asarray(fn(a, b))
    except Exception as e:
        name = dtype if isinstance(dtype, str) else np.dtype(dtype).name
        print(f"{name:9s}: FAILED {type(e).__name__} {str(e)[:90]}")
        return
    def block(c):
        best = 9e9
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(c):
                r = fn(a, b)
            np.asarray(r)
            best = min(best, time.perf_counter() - t0)
        return best

    best = max((block(8) - block(4)) / 4, 1e-9)
    fl = 2 * m * k * n * iters
    name = dtype if isinstance(dtype, str) else np.dtype(dtype).name
    print(f"{name:9s} acc={np.dtype(acc).name:7s}: {best*1e3:7.2f} ms  "
          f"{fl/best/1e12:6.1f} TOP/s")


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp
    print("devices:", jax.devices())
    M, K, N = 256, 1024, 1024
    bench(M, K, N, jnp.bfloat16, jnp.float32)
    bench(M, K, N, "int8", jnp.int32)
    bench(M, K, N, jnp.float32, jnp.float32)
