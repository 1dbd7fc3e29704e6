#!/usr/bin/env python
"""A/B the deformable kernel's per-tile chunk skip at encoder shapes.

Realistic encoder sampling locations = each query's own raster position
plus a few-pixel offset (GroundingDINO init/trained behavior), which is
what makes the y-bounds chunk skip fire; uniform-random locations
disable it (every tile spans every chunk). Also asserts COMPILED
hardware parity vs the gather path (interpret mode hides precision
traps — see PERF.md)."""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = ((100, 100), (50, 50), (25, 25), (13, 13))
LV = sum(h * w for h, w in SHAPES)
B, H, D, P = 1, 8, 32, 4


def timed(fn, reps=8, k=4, warmup=2):
    import jax

    def sync(r):
        np.asarray(jax.tree.leaves(r)[0]).ravel()[:8]

    for _ in range(warmup):
        sync(fn())

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

    half = max(1, k // 2)
    return max((block(k) - block(half)) / (k - half), 1e-9)


def encoder_locations(rng, spread_px=3.0):
    """[B, LQ, H, L, P, 2] norm coords: query reference + small offsets."""
    refs = []
    for hl, wl in SHAPES:
        ys, xs = np.mgrid[0:hl, 0:wl]
        r = np.stack([(xs + 0.5) / wl, (ys + 0.5) / hl], -1).reshape(-1, 2)
        refs.append(r)
    ref = np.concatenate(refs)                          # [LQ, 2] normalized
    sizes = np.array([[wl, hl] for hl, wl in SHAPES], np.float32)
    off = rng.uniform(-spread_px, spread_px,
                      (B, LV, H, len(SHAPES), P, 2)).astype(np.float32)
    loc = ref[None, :, None, None, None, :] + off / sizes[None, None, None, :, None, :]
    return np.clip(loc, 0.0, 1.0).astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp
    from reverso_tpu.cli import _enable_compile_cache
    from reverso_tpu.ops.deformable import ms_deform_attn

    _enable_compile_cache()
    rng = np.random.default_rng(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        value = jnp.asarray(rng.standard_normal((B, LV, H, D)), dtype)
        w = jax.nn.softmax(jnp.asarray(
            rng.standard_normal((B, LV, H, len(SHAPES), P)), dtype)
            .reshape(B, LV, H, -1), -1).reshape(B, LV, H, len(SHAPES), P)
        loc_c = jnp.asarray(encoder_locations(rng), dtype)
        loc_u = jnp.asarray(rng.random((B, LV, H, len(SHAPES), P, 2)), dtype)

        pallas = jax.jit(functools.partial(
            ms_deform_attn, spatial_shapes=SHAPES, impl="pallas"))
        patch = jax.jit(functools.partial(
            ms_deform_attn, spatial_shapes=SHAPES, impl="patch"))

        # compiled parity on hardware, clustered locations
        a = np.asarray(pallas(value, sampling_locations=loc_c,
                              attention_weights=w), np.float32)
        bref = np.asarray(patch(value, sampling_locations=loc_c,
                                attention_weights=w), np.float32)
        name = np.dtype(dtype).name
        if dtype == jnp.float32:
            err = np.abs(a - bref).max() / max(np.abs(bref).max(), 1e-9)
            tol = 3e-6
        else:
            # bf16 COORDINATES quantize sampling points by ~0.5 px at
            # the 100-wide level; BOTH impls sit ~0.10 mean-rel from f32
            # truth because of it (measured: patch-bf16 0.0996,
            # pallas-bf16 0.153 vs f32-patch). This is a sanity bound,
            # not a parity gate — fp32 above is the parity gate.
            err = (np.abs(a - bref).mean() / max(np.abs(bref).mean(), 1e-9))
            tol = 0.2
        assert err < tol, (name, err)
        print(f"{name}: compiled parity vs patch ok (rel {err:.2e})",
              flush=True)

        t_c = timed(lambda: pallas(value, sampling_locations=loc_c,
                                   attention_weights=w))
        t_u = timed(lambda: pallas(value, sampling_locations=loc_u,
                                   attention_weights=w))
        t_p = timed(lambda: patch(value, sampling_locations=loc_c,
                                  attention_weights=w))
        print(f"{name}: pallas clustered {t_c*1e3:6.2f} ms | "
              f"pallas uniform (skip inert) {t_u*1e3:6.2f} ms | "
              f"patch {t_p*1e3:6.2f} ms | skip gain {t_u/t_c:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
