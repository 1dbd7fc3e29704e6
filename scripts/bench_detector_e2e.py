#!/usr/bin/env python
"""End-to-end GroundingDINO-tiny throughput on the real TPU.

Full-size config (Swin-T, 6+6 layers, 900 queries) at 800 px, random
weights — architecture throughput, not box accuracy. Interleaved A/B of
the deformable backends; difference-of-block-minima timing.
"""
import dataclasses
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, reps=6, k=4):
    import jax

    def sync(r):
        np.asarray(jax.tree.leaves(r)[0]).ravel()[:8]

    sync(fn()); sync(fn())

    def block(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            r = None
            for _ in range(n):
                r = fn()
            sync(r)
            best = min(best, time.perf_counter() - t0)
        return best

    h = max(1, k // 2)
    return max((block(k) - block(h)) / (k - h), 1e-9)


def main():
    import jax
    import jax.numpy as jnp
    from reverso_tpu.cli import _enable_compile_cache
    from reverso_tpu.models.groundingdino import (
        GroundingDinoConfig, GroundingDino, generate_text_masks)

    _enable_compile_cache()
    rng = np.random.default_rng(0)
    ids = np.array([[101] + list(rng.integers(1000, 2000, 6)) + [102]],
                   np.int32)
    attn, pos = generate_text_masks(ids)

    for dtype, batch in (("float32", 1), ("bfloat16", 1), ("bfloat16", 4)):
        imgs = rng.standard_normal((batch, 800, 800, 3)).astype(np.float32)
        row = [f"{dtype} b{batch}:"]
        for impl in ("pallas", "patch"):
            cfg = GroundingDinoConfig(dtype=dtype, deform_impl=impl)
            gd = GroundingDino(cfg)
            params = jax.jit(gd.init)(
                jax.random.PRNGKey(0), jnp.asarray(imgs[:1]),
                jnp.asarray(ids), jnp.asarray(attn), jnp.asarray(pos))

            @jax.jit
            def fwd(p, im):
                return gd.apply(p, im, jnp.asarray(ids).repeat(im.shape[0], 0),
                                jnp.asarray(attn).repeat(im.shape[0], 0),
                                jnp.asarray(pos).repeat(im.shape[0], 0))

            dt = timed(lambda: fwd(params, jnp.asarray(imgs)))
            row.append(f"{impl} {dt/batch*1e3:7.1f} ms/img "
                       f"({batch/dt:5.1f} img/s)")
        print(" | ".join(row), flush=True)


if __name__ == "__main__":
    main()
