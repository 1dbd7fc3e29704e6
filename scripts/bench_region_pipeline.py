#!/usr/bin/env python
"""Steady-state region-ingest compute: GroundingDINO batch-4 + SAM with
4 box prompts per image, full-size configs, random weights,
device-resident inputs (a real TPU host's PCIe feed is not the tunnel's
100 MB/s). Reports ms/img for the combined detect+segment stage."""
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
    from reverso_tpu.models.sam import Sam, SamConfig

    _enable_compile_cache()
    rng = np.random.default_rng(0)
    B = 4
    ids = np.array([[101] + list(rng.integers(1000, 2000, 6)) + [102]],
                   np.int32).repeat(B, 0)
    attn, pos = generate_text_masks(ids)

    for dtype in ("float32", "bfloat16"):
        dcfg = GroundingDinoConfig(dtype=dtype)
        gd = GroundingDino(dcfg)
        imgs = jnp.asarray(rng.standard_normal((B, 800, 800, 3)),
                           jnp.float32)
        dparams = jax.jit(gd.init)(jax.random.PRNGKey(0), imgs[:1],
                                   jnp.asarray(ids[:1]),
                                   jnp.asarray(attn[:1]),
                                   jnp.asarray(pos[:1]))
        dino = jax.jit(lambda p, im: gd.apply(
            p, im, jnp.asarray(ids), jnp.asarray(attn), jnp.asarray(pos)))

        scfg = SamConfig(dtype=dtype)
        sam = Sam(scfg)
        simg = jnp.asarray(rng.standard_normal((1, 1024, 1024, 3)),
                           jnp.float32)
        boxes = jnp.asarray(rng.uniform(0, 1024, (1, 4, 4)), jnp.float32)
        sparams = jax.jit(functools.partial(
            sam.init, multimask_output=False))(
            jax.random.PRNGKey(1), simg, boxes)
        samf = jax.jit(functools.partial(sam.apply,
                                         multimask_output=False))

        t_dino = timed(lambda: dino(dparams, imgs)) / B
        t_sam = timed(lambda: samf(sparams, simg, boxes))
        print(f"{dtype}: dino {t_dino*1e3:6.1f} ms/img (b{B}) + "
              f"sam(4 boxes) {t_sam*1e3:6.1f} ms/img = "
              f"{(t_dino + t_sam)*1e3:6.1f} ms/img "
              f"({1.0/(t_dino + t_sam):4.1f} img/s region-ingest compute)",
              flush=True)


if __name__ == "__main__":
    main()
