#!/usr/bin/env python
"""HBM->VMEM DMA throughput vs ring depth / concurrent streams.

v5e spec HBM bandwidth is ~819 GB/s; the round-1 search kernel's manual
4-deep ring measured ~460-500 GB/s, which sets the exact-search floor
(2 GB per 256-query batch). If more outstanding DMAs or parallel
streams raise achieved bandwidth, the kernel floor drops directly.

Each variant streams a [N, 1024] bf16 array through VMEM buffers and
max-reduces one lane tile to defeat DCE (negligible compute).
"""
import argparse
import functools
import time

import numpy as np


def bench(n_rows, tile, n_bufs, streams, iters=8):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = 1024
    n_tiles = n_rows // tile
    sub = tile // streams

    def kernel(db_hbm, out, bufs, sems):
        def dma(s, slot, i):
            return pltpu.make_async_copy(
                db_hbm.at[pl.ds(i * tile + s * sub, sub), :],
                bufs.at[s, slot], sems.at[s, slot])

        for i in range(min(n_bufs - 1, n_tiles)):
            for s in range(streams):
                dma(s, i % n_bufs, i).start()

        def body(i, acc):
            slot = jax.lax.rem(i, n_bufs)
            pre = i + n_bufs - 1

            @pl.when(pre < n_tiles)
            def _():
                for s in range(streams):
                    dma(s, jax.lax.rem(pre, n_bufs), pre).start()
            r = acc
            for s in range(streams):
                dma(s, slot, i).wait()
                r = jnp.maximum(r, bufs[s, slot, 0:8, :].astype(jnp.float32))
            return r

        out[:] = jax.lax.fori_loop(0, n_tiles, body,
                                   jnp.full((8, d), -1e30, jnp.float32))

    db = jnp.zeros((n_rows, d), jnp.bfloat16)
    fn = jax.jit(lambda x: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((streams, n_bufs, sub, d), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((streams, n_bufs)),
        ],
    )(x))
    np.asarray(fn(db))

    def block(k):
        best = 9e9
        for _ in range(iters):
            t0 = time.perf_counter()
            for _ in range(k):
                r = fn(db)
            np.asarray(r)
            best = min(best, time.perf_counter() - t0)
        return best

    # difference of block minima: cancels the tunnel's per-sync latency
    best = max((block(4) - block(2)) / 2, 1e-9)
    gb = n_rows * d * 2 / 1e9
    print(f"tile={tile:5d} bufs={n_bufs} streams={streams}: "
          f"{best*1e3:7.2f} ms  {gb/best:6.0f} GB/s")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1024 * 1024)
    a = ap.parse_args()
    import jax
    print("devices:", jax.devices())
    for tile, bufs, streams in ((1024, 4, 1), (1024, 8, 1), (2048, 4, 1),
                                (1024, 4, 2), (1024, 4, 4), (2048, 8, 2),
                                (512, 8, 1), (4096, 4, 1)):
        try:
            bench(a.rows, tile, bufs, streams)
        except Exception as e:
            print(f"tile={tile} bufs={bufs} streams={streams}: FAILED "
                  f"{type(e).__name__} {str(e)[:100]}")
