#!/usr/bin/env python
"""Why don't the search kernel's DMA and matmul overlap?

Per-tile costs at 1M x 1024 bf16, q=256: DMA 2.24 us, MXU 2.7 us --
fully overlapped the scan floor is ~2.8 ms, yet the shipped kernel
spends ~4.3 ms before extraction. Suspect: the buffer ring is ONE
scratch ref indexed by a traced slot, so Mosaic may serialize the
matmul read of bufs[slot] against the DMA write of bufs[(i+3)%4]
(cannot prove disjointness). Variants:

  dyn    : dynamic slot indexing (shipped kernel's structure)
  unroll : body unrolled by ring depth -> every slot index is STATIC

Both do matmul + running max only (no k-select) so the pipeline is
isolated. Timing: difference of block minima (latency-immune).
"""
import functools
import time

import numpy as np

N, D, Q = 1024 * 1024, 1024, 256
TILE, BUFS = 1024, 4
N_TILES = N // TILE


def timed(fn, *args, reps=8):
    import jax
    sync = lambda r: np.asarray(r)[:1]
    sync(fn(*args))

    def block(k):
        best = 9e9
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(k):
                r = fn(*args)
            sync(r)
            best = min(best, time.perf_counter() - t0)
        return best

    return max((block(4) - block(2)) / 2, 1e-9)


def make(variant):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(q_hbm, db_hbm, out, q_vmem, bufs, sems, q_sem,
               sp_scr, col_scr):
        cq = pltpu.make_async_copy(q_hbm, q_vmem, q_sem)
        cq.start()
        cq.wait()

        def dma(slot, i):
            return pltpu.make_async_copy(
                db_hbm.at[pl.ds(i * TILE, TILE), :], bufs.at[slot],
                sems.at[slot])

        for i in range(BUFS - 1):
            dma(i, i).start()

        if variant in ("stage", "wide"):
            # static-slot pipeline + group staging (+3 wide extraction
            # passes for "wide"), no k-select inserts: isolates what the
            # staging/extraction core costs on top of the bare scan.
            def body(g_i, acc):
                for j in range(BUFS):
                    i = g_i * BUFS + j
                    pre = i + BUFS - 1

                    @pl.when(pre < N_TILES)
                    def _(pre=pre, j=j):
                        dma((j + BUFS - 1) % BUFS, pre).start()
                    dma(j, i).wait()
                    s = jax.lax.dot_general(
                        q_vmem[:], bufs[j],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    g = j % 2
                    sp_scr[:, g * TILE:(g + 1) * TILE] = s
                    if variant == "wide" and g == 1:
                        sp = sp_scr[:, :]
                        m0 = jnp.max(sp, axis=1, keepdims=True)
                        sel = jnp.min(jnp.where(sp == m0, col[:], 2**30),
                                      axis=1, keepdims=True)
                        cnt = jnp.sum((sp > acc[:, :1]).astype(jnp.int32),
                                      axis=1, keepdims=True)
                        acc = jnp.maximum(
                            acc, m0 + sel.astype(jnp.float32) * 0.0
                            + cnt.astype(jnp.float32) * 0.0)
                    elif g == 1:
                        acc = jnp.maximum(
                            acc, jnp.max(sp_scr[:, :], axis=1, keepdims=True))
                return acc

            col = col_scr
            col_scr[:] = jax.lax.broadcasted_iota(jnp.int32, col_scr.shape, 1)
            acc = jax.lax.fori_loop(
                0, N_TILES // BUFS, body,
                jnp.full((Q, TILE), -jnp.inf, jnp.float32))
        elif variant == "dyn":
            def body(i, acc):
                slot = jax.lax.rem(i, BUFS)
                pre = i + BUFS - 1

                @pl.when(pre < N_TILES)
                def _():
                    dma(jax.lax.rem(pre, BUFS), pre).start()
                dma(slot, i).wait()
                s = jax.lax.dot_general(
                    q_vmem[:], bufs[slot],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return jnp.maximum(acc, s)

            acc = jax.lax.fori_loop(
                0, N_TILES, body, jnp.full((Q, TILE), -jnp.inf, jnp.float32))
        else:
            def body(g, acc):
                for j in range(BUFS):                 # static slot j
                    i = g * BUFS + j
                    pre = i + BUFS - 1

                    @pl.when(pre < N_TILES)
                    def _(pre=pre, j=j):
                        dma((j + BUFS - 1) % BUFS, pre).start()
                    dma(j, i).wait()
                    s = jax.lax.dot_general(
                        q_vmem[:], bufs[j],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = jnp.maximum(acc, s)
                return acc

            acc = jax.lax.fori_loop(
                0, N_TILES // BUFS, body,
                jnp.full((Q, TILE), -jnp.inf, jnp.float32))
        out[:] = acc

    def run(db, q):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Q, TILE), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((Q, D), jnp.bfloat16),
                pltpu.VMEM((BUFS, TILE, D), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((BUFS,)),
                pltpu.SemaphoreType.DMA(()),
                pltpu.VMEM((Q, 2 * TILE), jnp.float32),
                pltpu.VMEM((Q, 2 * TILE), jnp.int32),
            ],
        )(q, db)

    return jax.jit(run)


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp
    print("devices:", jax.devices())
    db = jax.random.normal(jax.random.PRNGKey(0), (N, D)).astype(jnp.bfloat16)
    q = db[:Q]
    for v in ("unroll", "stage", "wide"):
        fn = make(v)
        dt = timed(fn, db, q)
        print(f"{v:7s}: {dt*1e3:7.2f} ms scan+matmul "
              f"({N*D*2/dt/1e9:5.0f} GB/s effective)")
