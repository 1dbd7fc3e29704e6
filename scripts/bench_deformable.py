#!/usr/bin/env python
"""Deformable-attention kernel experiments on the real TPU.

GroundingDINO's hot op (reference stack: custom CUDA `MSDeformAttn`;
ours: `reverso_tpu/ops/deformable.py` XLA gathers) is the end-to-end
detector bottleneck (PERF.md: ~44 ms per encoder layer at 800 px).

This script measures, at real encoder shapes, the candidate TPU
formulations before committing to a Pallas kernel:

  1. xla-patch   : shipped ms_deform_attn (one [2,2,D] gather/sample)
  2. dyngather   : raw Mosaic `tpu.dynamic_gather` (sublane gather)
                   microbenchmark at several table sizes -- decides
                   whether a VMEM-resident gather kernel can win
  3. pallas-ms   : the Pallas kernel (ops/deformable.py pallas path),
                   once it exists

Usage: python scripts/bench_deformable.py [--micro-only]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# GroundingDINO-tiny encoder shapes at 800 px input
SHAPES = ((100, 100), (50, 50), (25, 25), (13, 13))
LV = sum(h * w for h, w in SHAPES)     # 13294
B, H, D, P = 1, 8, 32, 4
LQ = LV


def timed(fn, *args, reps=8, k=4, warmup=2):
    """Difference of block minima: the tunnel adds 1.6-29 ms PER SYNC
    depending on load (dispatch is async; the chip runs full speed), so
    time k dispatches + one sync vs k/2 and take the min-difference —
    immune to additive sync latency, min() handles real contention."""
    import jax

    def sync(r):
        np.asarray(jax.tree.leaves(r)[0]).ravel()[:8]

    for _ in range(warmup):
        sync(fn(*args))

    def block(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            r = None
            for _ in range(n):
                r = fn(*args)
            sync(r)
            best = min(best, time.perf_counter() - t0)
        return best

    half = max(1, k // 2)
    return max((block(k) - block(half)) / (k - half), 1e-9)


def bench_xla(dtype, impl):
    import jax
    import jax.numpy as jnp
    from reverso_tpu.ops.deformable import ms_deform_attn

    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.standard_normal((B, LV, H, D)), dtype)
    loc = jnp.asarray(rng.random((B, LQ, H, len(SHAPES), P, 2)), dtype)
    w = jnp.asarray(rng.random((B, LQ, H, len(SHAPES), P)), dtype)

    fn = jax.jit(functools.partial(
        ms_deform_attn, spatial_shapes=SHAPES, impl=impl))
    dt = timed(lambda: fn(value, sampling_locations=loc, attention_weights=w))
    print(f"xla-{impl:9s} {np.dtype(dtype).name:8s}: {dt*1e3:8.2f} ms/layer")
    return dt


def bench_dyngather_micro(n_rows, lanes=128, dtype="float32", iters=64):
    """Raw sublane dynamic_gather throughput: out[i,j] = tab[idx[i,j], j].

    The op requires idx/out shape == tab shape, so one call produces
    n_rows*lanes gathered elements; `iters` grid steps amortize launch.
    Returns ns per gathered ROW of `lanes` elements (the unit the
    deformable kernel pays per bilinear corner).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(tab_ref, idx_ref, out_ref):
        acc = jnp.zeros(tab_ref.shape, jnp.float32)
        tab = tab_ref[:]
        idx = idx_ref[:]
        for i in range(iters):
            g = jnp.take_along_axis(tab, (idx + i) % n_rows, axis=0)
            acc = acc + g.astype(jnp.float32)
        out_ref[:] = acc.astype(tab_ref.dtype)

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((n_rows, lanes)), dtype)
    idx = jnp.asarray(rng.integers(0, n_rows, (n_rows, lanes)), jnp.int32)

    fn = jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows, lanes), t.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    try:
        dt = timed(lambda: fn(tab, idx))
    except Exception as e:
        print(f"dyngather n={n_rows:6d} {np.dtype(dtype).name}: FAILED "
              f"({type(e).__name__}: {str(e)[:120]})")
        return None
    rows = n_rows * iters
    print(f"dyngather n={n_rows:6d} {np.dtype(dtype).name}: "
          f"{dt*1e3:8.3f} ms for {rows} gathered rows x{lanes} lanes "
          f"-> {dt/rows*1e9:7.1f} ns/row")
    return dt / rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--micro-only", action="store_true")
    args = ap.parse_args()
    import jax
    print("devices:", jax.devices())

    if args.micro_only:
        # Finding (2026-08): Mosaic sublane dynamic_gather only supports a
        # single source vreg along the gather dim (<=8 f32 rows) -- no
        # large-table vector gather on v5e; these all fail to compile.
        for n in (8, 256):
            bench_dyngather_micro(n, dtype="float32")
        return

    import jax.numpy as jnp
    for impl in ("patch", "patchrow", "pallas"):
        bench_xla(jnp.float32, impl)
        bench_xla(jnp.bfloat16, impl)


if __name__ == "__main__":
    main()
