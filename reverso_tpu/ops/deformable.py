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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def _patch_table(v: jnp.ndarray) -> jnp.ndarray:
    """Precompute the 2x2 bilinear patch of every position as ONE row.

    v: [N, H, W, D] -> [N, H+2, W+2, 4*D] where row (y, x) holds the
    corners (y,x), (y,x+1), (y+1,x), (y+1,x+1) of the zero-ringed map
    (ring: 1 top/left, 2 bottom/right, as in `bilinear_sample`). Costs
    4x the memory of the level but turns every bilinear sample into a
    SINGLE aligned row gather (4*32=128 lanes at GroundingDINO head
    dim) instead of a strided [2,2,D] patch gather -- the TPU gather
    unit pays per slice, not per byte, so fewer/wider slices win.
    """
    vp = jnp.pad(v, ((0, 0), (1, 2), (1, 2), (0, 0)))
    return jnp.concatenate(
        [vp[:, :-1, :-1], vp[:, :-1, 1:], vp[:, 1:, :-1], vp[:, 1:, 1:]],
        axis=-1)


def _sample_patchrow(table: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                     w: int, h: int) -> jnp.ndarray:
    """Bilinear sampling from a `_patch_table`.

    table: [N, H+2, W+2, 4D]; x, y: [N, S] pixel coords. Returns [N, S, D].
    """
    n, hp, wp, d4 = table.shape
    d = d4 // 4
    x = jnp.clip(x, -1.0, float(w))
    y = jnp.clip(y, -1.0, float(h))
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(table.dtype)[..., None]
    wy = (y - y0).astype(table.dtype)[..., None]
    starts = jnp.stack([y0.astype(jnp.int32) + 1,
                        x0.astype(jnp.int32) + 1], axis=-1)       # [N, S, 2]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2,),
        collapsed_slice_dims=(1, 2),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    rows = jax.lax.gather(table, starts, dn, slice_sizes=(1, 1, 1, d4),
                          mode="promise_in_bounds")               # [N, S, 4D]
    p = rows.reshape(n, x.shape[1], 4, d)
    top = p[:, :, 0] * (1 - wx) + p[:, :, 1] * wx
    bot = p[:, :, 2] * (1 - wx) + p[:, :, 3] * wx
    return top * (1 - wy) + bot * wy


# ---------------------------------------------------------------------------
# Pallas kernel: gather-free deformable attention as hat-matrix matmuls
# ---------------------------------------------------------------------------
#
# TPU v5e has no large-table vector gather (Mosaic's tpu.dynamic_gather
# is limited to one source vreg along the gather dim), and XLA's gather
# unit pays ~25-50 ns per sampled patch -- it is the detector's
# end-to-end bottleneck (PERF.md). This kernel removes gathers entirely:
# bilinear sampling of point p by query q is a sparse row A[q, :] with 4
# nonzeros, so the per-(head, query-tile) output is
#
#   out[q, c] = sum_n A[n, q] * V[n, c],      A[n=(y,x), q] =
#       sum_p w_pq * relu(1-|py_pq - y|) * relu(1-|px_pq - x|)
#
# The "hat" functions evaluate the exact grid_sample(zeros) bilinear
# weights (zero outside the map, partial corners at the border), the
# attention weight w folds into the y-hat, and the P-point sum folds
# into A. A is built densely on the VPU (a [16, W_pad, Q] outer-product
# slab per 16-row chunk) and immediately contracted on the MXU against
# the level's value rows -- dense FLOPs instead of random access, which
# is the right trade on this hardware (queries x total-positions x
# channels at GroundingDINO-tiny encoder shapes is ~0.5 GFLOP per
# query-tile program, a few microseconds of MXU time).


def _deform_level_meta(spatial_shapes):
    """Static per-level geometry: (h, w, h_pad16, w_pad8, lane_offset)."""
    meta, off = [], 0
    for hl, wl in spatial_shapes:
        hp = -(-hl // 16) * 16
        wp = -(-wl // 8) * 8
        meta.append((hl, wl, hp, wp, off))
        off += hp * wp
    return meta, off


def _deform_kernel(meta, q_tile, px_ref, py_ref, w_ref, vt_ref, out_ref):
    f32 = jnp.float32
    adt = vt_ref.dtype
    # [Q, L*P] -> [L*P, Q]: point coordinates along lanes
    pxT = jnp.transpose(px_ref[0], (1, 0))
    pyT = jnp.transpose(py_ref[0], (1, 0))
    wT = jnp.transpose(w_ref[0], (1, 0)).astype(f32)
    n_points = pxT.shape[0] // len(meta)

    out = jnp.zeros((vt_ref.shape[1], q_tile), f32)
    for lvl, (hl, wl, hp, wp, off) in enumerate(meta):
        xi = jax.lax.broadcasted_iota(jnp.int32, (wp, q_tile), 0).astype(f32)
        hxs = []
        for p in range(n_points):
            lp = lvl * n_points + p
            px = jnp.clip(pxT[lp:lp + 1, :], -1.0, float(wl))
            hx = jnp.maximum(1.0 - jnp.abs(px - xi), 0.0)
            # x >= wl hat tails are harmless (the padded value rows are
            # zero) but cheap to mask here, once per level.
            hxs.append(jnp.where(xi < wl, hx, 0.0).astype(adt)[None])

        # Per-tile y-bounds: a 16-row chunk [y0, y0+16) receives weight
        # only from points with py in (y0-1, y0+16). Deformable sampling
        # clusters around each query's reference point, and a query tile
        # is a contiguous raster run, so most chunks of most levels have
        # NO overlap with this tile — the whole [16, wp, Q] slab build
        # and its matmul are skipped on a scalar branch.
        lvl_py = pyT[lvl * n_points:(lvl + 1) * n_points, :]
        min_py = jnp.min(jnp.clip(lvl_py, -1.0, float(hl)))
        max_py = jnp.max(jnp.clip(lvl_py, -1.0, float(hl)))

        def chunk(i, acc, lvl=lvl, hl=hl, hp=hp, wp=wp, off=off, hxs=hxs,
                  min_py=min_py, max_py=max_py):
            y0 = i * 16
            y0f = y0.astype(f32) if hasattr(y0, "astype") else float(y0)

            def live(acc):
                yi = (jax.lax.broadcasted_iota(jnp.int32, (16, q_tile), 0)
                      .astype(f32) + y0)
                # The [16, wp, Q] outer-product passes dominate the kernel
                # (VPU-bound); run them in the value dtype (bf16 packs 2x)
                # and tree-sum the point terms with no zero-init pass. The
                # hats themselves are evaluated in f32.
                terms = []
                for p in range(n_points):
                    lp = lvl * n_points + p
                    py = jnp.clip(pyT[lp:lp + 1, :], -1.0, float(hl))
                    hy = jnp.maximum(1.0 - jnp.abs(py - yi), 0.0)
                    hy = jnp.where(yi < hl, hy, 0.0) * wT[lp:lp + 1, :]
                    terms.append(hy.astype(adt)[:, None, :] * hxs[p])
                while len(terms) > 1:
                    terms = ([a + b for a, b in zip(terms[::2], terms[1::2])]
                             + ([terms[-1]] if len(terms) % 2 else []))
                a = terms[0].reshape(16 * wp, q_tile)              # [rows, Q]
                vc = vt_ref[0, :, pl.ds(off + y0 * wp, 16 * wp)]   # [D, rows]
                # HIGHEST for f32 inputs: a default-precision f32 dot is
                # a single bf16 MXU pass on TPU (~3e-3 rel error vs the
                # gather path); the matmul is a minor cost next to the
                # A-build, so full f32 precision is nearly free. bf16
                # inputs are one pass either way, and Mosaic rejects
                # HIGHEST on them inside a cond branch.
                prec = (jax.lax.Precision.DEFAULT if adt == jnp.bfloat16
                        else jax.lax.Precision.HIGHEST)
                return acc + jax.lax.dot_general(
                    vc, a, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                    precision=prec)

            overlap = (max_py > y0f - 1.0) & (min_py < y0f + 16.0)
            return jax.lax.cond(overlap, live, lambda acc: acc, acc)

        out = jax.lax.fori_loop(0, hp // 16, chunk, out)
    out_ref[0] = out


def ms_deform_attn_pallas(value: jnp.ndarray,
                          spatial_shapes: Sequence[tuple[int, int]],
                          sampling_locations: jnp.ndarray,
                          attention_weights: jnp.ndarray,
                          q_tile: int = 256,
                          interpret: bool = False) -> jnp.ndarray:
    """Gather-free Pallas deformable attention (see kernel comment).

    Same contract as `ms_deform_attn`. Value dtype selects the matmul
    precision (bf16 values -> bf16 hat matrix, fp32 accumulation).
    """
    b, lv, h, d = value.shape
    _, lq, _, n_levels, n_points, _ = sampling_locations.shape
    meta, n_pad = _deform_level_meta(spatial_shapes)
    lq_pad = -(-lq // q_tile) * q_tile

    # Value rows in padded row-major level layout: [B*H, D, n_pad]
    chunks, start = [], 0
    for (hl, wl), (_, _, hp, wp, _) in zip(spatial_shapes, meta):
        v = value[:, start:start + hl * wl].reshape(b, hl, wl, h, d)
        v = jnp.pad(v, ((0, 0), (0, hp - hl), (0, wp - wl), (0, 0), (0, 0)))
        chunks.append(v.transpose(0, 3, 4, 1, 2).reshape(b, h, d, hp * wp))
        start += hl * wl
    vt = jnp.concatenate(chunks, axis=-1).reshape(b * h, d, n_pad)

    # Pixel-space coordinates and weights: [B*H, Lq_pad, L*P].
    # Coordinate math is ALWAYS f32, whatever dtype the caller passes:
    # bf16 normalized coordinates quantize sampling points by ~0.5 px at
    # a 100-wide level (8-bit mantissa), which is a sampling-geometry
    # error, not a feature-precision one — the model path supplies f32
    # locations already (DeformAttn promotes), this guards op-level
    # callers. Matches the CUDA MSDeformAttn's fp32 coordinate semantics.
    sizes = jnp.asarray([[wl, hl] for hl, wl in spatial_shapes],
                        jnp.float32)
    pix = (sampling_locations.astype(jnp.float32)
           * sizes[None, None, None, :, None, :] - 0.5)
    pix = pix.transpose(0, 2, 1, 3, 4, 5).reshape(
        b * h, lq, n_levels * n_points, 2)
    pad = ((0, 0), (0, lq_pad - lq), (0, 0))
    px = jnp.pad(pix[..., 0], pad)
    py = jnp.pad(pix[..., 1], pad)
    w = jnp.pad(attention_weights.transpose(0, 2, 1, 3, 4).reshape(
        b * h, lq, n_levels * n_points).astype(jnp.float32), pad)

    grid = (b * h, lq_pad // q_tile)
    out = pl.pallas_call(
        functools.partial(_deform_kernel, meta, q_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_tile, n_levels * n_points),
                         lambda bh, qt: (bh, qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_tile, n_levels * n_points),
                         lambda bh, qt: (bh, qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_tile, n_levels * n_points),
                         lambda bh, qt: (bh, qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, n_pad), lambda bh, qt: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, q_tile), lambda bh, qt: (bh, 0, qt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, d, lq_pad), jnp.float32),
        interpret=interpret,
    )(px, py, w, vt)

    out = out.reshape(b, h, d, lq_pad)[:, :, :, :lq]
    return out.transpose(0, 3, 1, 2).reshape(b, lq, h * d).astype(value.dtype)


def ms_deform_attn(value: jnp.ndarray,
                   spatial_shapes: Sequence[tuple[int, int]],
                   sampling_locations: jnp.ndarray,
                   attention_weights: jnp.ndarray,
                   impl: str = "patch") -> jnp.ndarray:
    """Core multi-scale deformable attention (shapes in module docstring).

    impl: "patch" gathers a [2,2,D] patch per sample; "patchrow"
    precomputes per-position patch rows (`_patch_table`) and gathers one
    [4*D] row per sample (fewer, wider, aligned slices); "pallas" uses
    the gather-free hat-matmul kernel (`ms_deform_attn_pallas`).
    """
    if impl == "pallas":
        return ms_deform_attn_pallas(value, spatial_shapes,
                                     sampling_locations, attention_weights)
    b, lv, h, d = value.shape
    _, lq, _, n_levels, n_points, _ = sampling_locations.shape
    assert n_levels == len(spatial_shapes)

    out = jnp.zeros((b, lq, h, d), jnp.float32)
    start = 0
    for lvl, (hl, wl) in enumerate(spatial_shapes):
        # [B, Hl*Wl, H, D] -> [B*H, Hl, Wl, D]
        v = value[:, start:start + hl * wl]
        v = v.transpose(0, 2, 1, 3).reshape(b * h, hl, wl, d)
        # locations for this level: [B, Lq, H, P, 2] -> [B*H, Lq*P];
        # f32 coordinate math regardless of caller dtype (see the pallas
        # path's comment — bf16 coords shift samples by ~0.5 px)
        loc = sampling_locations[:, :, :, lvl].astype(jnp.float32)
        loc = loc.transpose(0, 2, 1, 3, 4).reshape(b * h, lq * n_points, 2)
        px = loc[..., 0] * wl - 0.5
        py = loc[..., 1] * hl - 0.5
        if impl == "patchrow":
            sampled = _sample_patchrow(_patch_table(v), px, py, wl, hl)
        else:
            sampled = bilinear_sample(v, px, py)                # [B*H, Lq*P, D]
        sampled = sampled.reshape(b, h, lq, n_points, d)
        wgt = attention_weights[:, :, :, lvl]                   # [B, Lq, H, P]
        wgt = wgt.transpose(0, 2, 1, 3)[..., None]              # [B, H, Lq, P, 1]
        out = out + jnp.sum(sampled.astype(jnp.float32)
                            * wgt.astype(jnp.float32), axis=3).transpose(0, 2, 1, 3)
        start += hl * wl
    return out.reshape(b, lq, h * d).astype(value.dtype)
