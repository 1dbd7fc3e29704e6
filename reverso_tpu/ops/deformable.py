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
    """Zero-padded bilinear sampling (torch grid_sample semantics).

    img: [N, H, W, D]; x, y: [N, S] pixel coordinates (already in pixel
    space, i.e. norm * size - 0.5). Returns [N, S, D].

    TPU formulation: one batched `lax.gather` fetches the whole [2, 2, D]
    bilinear patch per sample, with NO per-corner masks or selects —
    coordinates are clamped to [-1, size] (any further out interpolates
    to exactly 0 through the weights: the in-image corner gets weight 0)
    and the image carries an explicit zero ring, so every patch read is
    in bounds and out-of-bounds corners read zeros. Matches
    grid_sample(padding_mode="zeros", align_corners=False) exactly.
    """
    n, h, w, d = img.shape
    x = jnp.clip(x, -1.0, float(w))
    y = jnp.clip(y, -1.0, float(h))
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(img.dtype)[..., None]
    wy = (y - y0).astype(img.dtype)[..., None]

    # zero ring: 1 at top/left, 2 at bottom/right (patch start may be H+1)
    img_p = jnp.pad(img, ((0, 0), (1, 2), (1, 2), (0, 0)))
    sy = y0.astype(jnp.int32) + 1                          # in [0, H+1]
    sx = x0.astype(jnp.int32) + 1
    starts = jnp.stack([sy, sx], axis=-1)                  # [N, S, 2]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    patch = jax.lax.gather(img_p, starts, dn, slice_sizes=(1, 2, 2, d),
                           mode="promise_in_bounds")       # [N, S, 2, 2, D]
    top = patch[:, :, 0, 0] * (1 - wx) + patch[:, :, 0, 1] * wx
    bot = patch[:, :, 1, 0] * (1 - wx) + patch[:, :, 1, 1] * wx
    return top * (1 - wy) + bot * wy


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
