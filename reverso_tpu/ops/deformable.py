"""Multi-scale deformable attention, lowered to XLA gathers.

GroundingDINO's core op. The reference stack ships a custom CUDA kernel
(`MSDeformAttn`) with a slow torch fallback (SURVEY.md §2.2 GroundingDINO
row); neither maps to TPU. This implementation expresses the bilinear
sampling as four static gathers per (level, point) with zero padding —
fully static shapes, batched over heads, XLA-fusable — matching torch
`grid_sample(align_corners=False, padding_mode="zeros")` semantics which
the torch fallback uses.

Layouts follow the transformers implementation so converted checkpoints
are bit-compatible:
  value              [B, Lv, H, D]     (flattened multi-scale features)
  spatial_shapes     static tuple ((H0, W0), (H1, W1), ...)
  sampling_locations [B, Lq, H, L, P, 2]   normalized (x, y) in [0, 1]
  attention_weights  [B, Lq, H, L, P]      softmaxed over L*P
returns              [B, Lq, H * D]
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Zero-padded bilinear sampling.

    img: [N, H, W, D]; x, y: [N, S] pixel coordinates (already in pixel
    space, i.e. norm * size - 0.5). Returns [N, S, D].
    """
    n, h, w, d = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = img.reshape(n, h * w, d)

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals * valid[..., None].astype(img.dtype)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    wx = wx[..., None].astype(img.dtype)
    wy = wy[..., None].astype(img.dtype)
    return ((v00 * (1 - wx) + v01 * wx) * (1 - wy)
            + (v10 * (1 - wx) + v11 * wx) * wy)


def ms_deform_attn(value: jnp.ndarray,
                   spatial_shapes: Sequence[tuple[int, int]],
                   sampling_locations: jnp.ndarray,
                   attention_weights: jnp.ndarray) -> jnp.ndarray:
    """Core multi-scale deformable attention (shapes in module docstring)."""
    b, lv, h, d = value.shape
    _, lq, _, n_levels, n_points, _ = sampling_locations.shape
    assert n_levels == len(spatial_shapes)

    out = jnp.zeros((b, lq, h, d), jnp.float32)
    start = 0
    for lvl, (hl, wl) in enumerate(spatial_shapes):
        # [B, Hl*Wl, H, D] -> [B*H, Hl, Wl, D]
        v = value[:, start:start + hl * wl]
        v = v.transpose(0, 2, 1, 3).reshape(b * h, hl, wl, d)
        # locations for this level: [B, Lq, H, P, 2] -> [B*H, Lq*P]
        loc = sampling_locations[:, :, :, lvl]                  # [B, Lq, H, P, 2]
        loc = loc.transpose(0, 2, 1, 3, 4).reshape(b * h, lq * n_points, 2)
        px = loc[..., 0] * wl - 0.5
        py = loc[..., 1] * hl - 0.5
        sampled = bilinear_sample(v, px, py)                    # [B*H, Lq*P, D]
        sampled = sampled.reshape(b, h, lq, n_points, d)
        wgt = attention_weights[:, :, :, lvl]                   # [B, Lq, H, P]
        wgt = wgt.transpose(0, 2, 1, 3)[..., None]              # [B, H, Lq, P, 1]
        out = out + jnp.sum(sampled.astype(jnp.float32)
                            * wgt.astype(jnp.float32), axis=3).transpose(0, 2, 1, 3)
        start += hl * wl
    return out.reshape(b, lq, h * d).astype(value.dtype)
