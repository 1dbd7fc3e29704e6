#!/usr/bin/env python
"""De-risk probe for the IVF probed-scan Pallas kernel.

Question: can a manual async_copy DMA a [rows, d] block from an HBM
ref at an ARBITRARY (unaligned, data-dependent) row offset read from
SMEM, and how much slower is it than a 512-aligned offset?

Runs a minimal kernel: one DMA from `mat[off : off+rows]` -> VMEM,
one dot against a resident query block, writes the [8, rows] scores.
Checks exactness vs the XLA slice+dot and times aligned vs unaligned
offsets interleaved.

Usage: python scripts/proto_dyn_dma.py            (TPU)
       IVF_CPU=1 python scripts/proto_dyn_dma.py  (interpret smoke)
"""
import functools
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = bool(os.environ.get("IVF_CPU"))
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")


def kernel(off_ref, q_hbm, mat_hbm, out_ref, q_vmem, buf, sem, qsem,
           *, rows: int, reps: int):
    cq = pltpu.make_async_copy(q_hbm, q_vmem, qsem)
    cq.start()
    cq.wait()

    def body(i, _):
        off = off_ref[i]
        c = pltpu.make_async_copy(
            mat_hbm.at[pl.ds(off, rows), :], buf, sem)
        c.start()
        c.wait()
        out_ref[:] = jax.lax.dot_general(
            q_vmem[:], buf[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, reps, body, 0)


@functools.partial(jax.jit, static_argnames=("rows", "reps"))
def run(offs, q, mat, *, rows: int, reps: int):
    return pl.pallas_call(
        functools.partial(kernel, rows=rows, reps=reps),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, rows), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, mat.shape[1]), mat.dtype),
            pltpu.VMEM((rows, mat.shape[1]), mat.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=INTERPRET,
    )(offs, q, mat)


def main():
    n, d, rows = 262144, 1024, 512
    rng = np.random.default_rng(0)
    for dtype in ("int8", "bfloat16"):
        if dtype == "int8":
            mat = jnp.asarray(rng.integers(-127, 128, (n, d)), jnp.int8)
            q = jnp.asarray(rng.integers(-127, 128, (8, d)), jnp.int8)
        else:
            mat = jnp.asarray(rng.standard_normal((n, d)), jnp.bfloat16)
            q = jnp.asarray(rng.standard_normal((8, d)), jnp.bfloat16)

        # exactness at awkward offsets
        for off in (0, 1, 7, 31, 33, 517, n - rows - 3):
            offs = jnp.asarray([off], jnp.int32)
            try:
                got = np.asarray(run(offs, q, mat, rows=rows, reps=1))
            except Exception as e:  # noqa: BLE001 — report and move on
                print(f"{dtype} off={off}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}")
                break
            if dtype == "int8":
                want = (q.astype(jnp.int32) @
                        mat[off:off + rows].astype(jnp.int32).T
                        ).astype(jnp.float32)
            else:
                want = jax.lax.dot_general(
                    q, mat[off:off + rows], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            ok = np.array_equal(got, np.asarray(want))
            print(f"{dtype} off={off}: exact={ok}")
            if not ok:
                print("   max|diff|", np.abs(got - np.asarray(want)).max())

        if INTERPRET:
            continue
        # timing: aligned vs unaligned, interleaved
        reps = 512
        al = jnp.asarray(rng.integers(0, (n - rows) // 512, reps) * 512,
                         jnp.int32)
        un = jnp.asarray(rng.integers(0, n - rows, reps), jnp.int32)
        for name, offs in (("aligned", al), ("unaligned", un),
                           ("aligned2", al), ("unaligned2", un)):
            np.asarray(run(offs, q, mat, rows=rows, reps=reps)[:1, :1])
            t0 = time.perf_counter()
            for _ in range(5):
                r = run(offs, q, mat, rows=rows, reps=reps)
            np.asarray(r[:1, :1])
            dt = (time.perf_counter() - t0) / (5 * reps)
            bw = rows * d * mat.dtype.itemsize / dt / 2**30
            print(f"{dtype} {name}: {dt * 1e6:7.2f} us/dma-dot "
                  f"({bw:.0f} GiB/s)")


if __name__ == "__main__":
    main()
