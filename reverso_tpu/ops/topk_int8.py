"""int8-quantized exact-rescored cosine top-k (ScaNN-style two stage).

STATUS: retained experiment, SUPERSEDED by `ops.topk.cosine_topk_int8_exact`
(round 2). The two-digit exact kernel delivers the same 2x capacity with
exact scores and no overfetch/recall parameter, at the same scan speed —
so no engine/index path routes here anymore and the symbol is no longer
re-exported from `reverso_tpu.ops`. Kept (with its tests) as the
reference implementation of the rescore pattern in case per-ROW scales
ever become necessary (e.g. unnormalized corpora, where a single global
scale clips).

The bf16 streaming scan (`ops.topk`) is HBM-bound: 2 GB of database per
query batch at 1M x 1024. Storing the scan copy in int8 with per-row
scales halves the traffic and doubles the MXU rate; a final exact-fp32
rescore of an overfetched candidate set restores exact scores and the
deterministic (-score, idx) order. Recall loss happens only if row
quantization pushes a true top-k row out of the overfetched candidates
— with 4x overfetch it is negligible for embedding workloads (tested).

  quantize:  q_i8[r] = round(v[r] / s_r),  s_r = max|v[r]| / 127
  stage 1:   approx score = (q_int8 . v_int8) * s_row * s_query  (kernel)
  stage 2:   exact  score = q_f32 . v_f32 over top k*overfetch rows
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .topk import _round_up, _pad_dim, _insert_sorted, _INT_MAX, _Q_RESIDENT


def quantize_rows(v: np.ndarray):
    """fp32 [N, d] -> (int8 [N, d], scales f32 [N]) symmetric per-row."""
    v = np.asarray(v, np.float32)
    scales = np.abs(v).max(axis=1) / 127.0
    scales = np.maximum(scales, 1e-12)
    q = np.clip(np.rint(v / scales[:, None]), -127, 127).astype(np.int8)
    return q, scales.astype(np.float32)


def _topk_int8_kernel(n_valid_ref, q_hbm, qscale_hbm, db_hbm, scales_hbm,
                      scores_out, idx_out,
                      q_vmem, qscale_vmem, bufs, scale_bufs, s_scr, i_scr,
                      db_sems, sc_sems, q_sem, qs_sem,
                      *, k: int, kpad: int, db_tile: int, q_tile: int,
                      n_tiles: int, n_bufs: int):
    cq = pltpu.make_async_copy(q_hbm, q_vmem, q_sem)
    cq.start()
    cqs = pltpu.make_async_copy(qscale_hbm, qscale_vmem, qs_sem)
    cqs.start()
    cq.wait()
    cqs.wait()
    s_scr[:] = jnp.full_like(s_scr, -jnp.inf)
    i_scr[:] = jnp.full_like(i_scr, -1)

    qp = q_vmem.shape[0]
    n_qt = qp // q_tile
    n_valid = n_valid_ref[0]

    def db_dma(slot, i):
        return pltpu.make_async_copy(
            db_hbm.at[pl.ds(i * db_tile, db_tile), :],
            bufs.at[slot], db_sems.at[slot])

    def sc_dma(slot, i):
        return pltpu.make_async_copy(
            scales_hbm.at[i], scale_bufs.at[slot], sc_sems.at[slot])

    for i in range(min(n_bufs - 1, n_tiles)):
        db_dma(i, i).start()
        sc_dma(i, i).start()

    def body(i, _):
        slot = jax.lax.rem(i, n_bufs)
        prefetch = i + n_bufs - 1

        @pl.when(prefetch < n_tiles)
        def _():
            nxt = jax.lax.rem(prefetch, n_bufs)
            db_dma(nxt, prefetch).start()
            sc_dma(nxt, prefetch).start()

        db_dma(slot, i).wait()
        sc_dma(slot, i).wait()
        base = i * db_tile
        row_scale = scale_bufs[slot]                    # [1, TN] f32

        # int8 buys the DMA halving; the dot runs bf16 (Mosaic's s8 matmul
        # lowering measured ~4x slower than upcast+bf16 on this chip).
        # int8 -> bf16 is exact (|v| <= 127 << bf16 mantissa range).
        tile_bf16 = bufs[slot].astype(jnp.bfloat16)
        for qt in range(n_qt):
            lo = qt * q_tile
            s_raw = jax.lax.dot_general(
                q_vmem[lo:lo + q_tile, :].astype(jnp.bfloat16), tile_bf16,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = (s_raw
                 * qscale_vmem[lo:lo + q_tile]          # [TQ, 1]
                 * row_scale)                           # [1, TN]

            def mask_tail(s):
                col_m = jax.lax.broadcasted_iota(
                    jnp.int32, (q_tile, db_tile), 1) + base
                return jnp.where(col_m < n_valid, s, -jnp.inf)

            s = jax.lax.cond(base + db_tile > n_valid, mask_tail,
                             lambda s: s, s)
            m0 = jnp.max(s, axis=1, keepdims=True)
            kth0 = s_scr[lo:lo + q_tile, k - 1:k]

            def one_extract(s_cur, m):
                imp = m > s_scr[lo:lo + q_tile, k - 1:k]
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (q_tile, db_tile), 1) + base
                sel = jnp.min(jnp.where(s_cur == m, col, _INT_MAX),
                              axis=1, keepdims=True)
                cand_m = jnp.where(imp, m, -jnp.inf)
                new_S, new_I = _insert_sorted(
                    s_scr[lo:lo + q_tile, :], i_scr[lo:lo + q_tile, :],
                    cand_m, sel)
                s_scr[lo:lo + q_tile, :] = new_S
                i_scr[lo:lo + q_tile, :] = new_I
                s_cur = jnp.where((col == sel) & imp, -jnp.inf, s_cur)
                return s_cur, jnp.max(s_cur, axis=1, keepdims=True)

            @pl.when(jnp.any(m0 > kth0))
            def _():
                s1, m1 = one_extract(s, m0)

                def cond(carry):
                    _, m, kth = carry
                    return jnp.any(m > kth)

                def extract(carry):
                    s_cur, m, _ = carry
                    s_cur, m = one_extract(s_cur, m)
                    return s_cur, m, s_scr[lo:lo + q_tile, k - 1:k]

                @pl.when(jnp.any(m1 > s_scr[lo:lo + q_tile, k - 1:k]))
                def _():
                    jax.lax.while_loop(
                        cond, extract,
                        (s1, m1, s_scr[lo:lo + q_tile, k - 1:k]))
        return 0

    jax.lax.fori_loop(0, n_tiles, body, 0)
    scores_out[:] = s_scr[:]
    idx_out[:] = i_scr[:]


@functools.partial(jax.jit, static_argnames=(
    "k", "kpad", "q_tile", "db_tile", "interpret", "q_out", "n_bufs"))
def _topk_int8_jit(db_i8, scales, q_i8, q_scales, n_valid, *,
                   k: int, kpad: int, q_tile: int, db_tile: int,
                   interpret: bool, q_out: int, n_bufs: int):
    n, d = db_i8.shape
    q = q_i8.shape[0]
    d_p = _round_up(d, 128)
    n_p = _round_up(n, db_tile)
    q_p = _round_up(q, q_tile)

    db_p = _pad_dim(_pad_dim(db_i8, 1, d_p), 0, n_p)
    sc_p = _pad_dim(scales, 0, n_p).reshape(n_p // db_tile, 1, db_tile)
    qs_p = _pad_dim(_pad_dim(q_i8, 1, d_p), 0, q_p)
    qsc_p = _pad_dim(q_scales.reshape(-1, 1), 0, q_p)
    n_valid = jnp.asarray(n_valid, jnp.int32).reshape(1)
    n_tiles = n_p // db_tile

    kernel = functools.partial(
        _topk_int8_kernel, k=k, kpad=kpad, db_tile=db_tile, q_tile=q_tile,
        n_tiles=n_tiles, n_bufs=n_bufs)

    scores, idx = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_p, kpad), jnp.float32),
            jax.ShapeDtypeStruct((q_p, kpad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_p, d_p), jnp.int8),
            pltpu.VMEM((q_p, 1), jnp.float32),
            pltpu.VMEM((n_bufs, db_tile, d_p), jnp.int8),
            pltpu.VMEM((n_bufs, 1, db_tile), jnp.float32),
            pltpu.VMEM((q_p, kpad), jnp.float32),
            pltpu.VMEM((q_p, kpad), jnp.int32),
            pltpu.SemaphoreType.DMA((n_bufs,)),
            pltpu.SemaphoreType.DMA((n_bufs,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q_p * n_p * d_p,
            bytes_accessed=n_p * d_p + q_p * d_p + n_p * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(n_valid, qs_p, qsc_p, db_p, sc_p)
    scores, idx = scores[:q_out, :k], idx[:q_out, :k]
    idx = jnp.where(jnp.isneginf(scores), -1, idx)
    return scores, idx


@functools.partial(jax.jit, static_argnames=("k",))
def _rescore(db_full, queries, cand_idx, k: int):
    """Exact fp32 rescore of candidates; deterministic (-score, idx)."""
    safe = jnp.clip(cand_idx, 0, db_full.shape[0] - 1)
    rows = jnp.take(db_full, safe, axis=0)               # [Q, K', d]
    s = jnp.einsum("qkd,qd->qk", rows.astype(jnp.float32),
                   queries.astype(jnp.float32))
    s = jnp.where(cand_idx >= 0, s, -jnp.inf)
    order = jnp.lexsort((cand_idx, -s), axis=1)[:, :k]
    out_s = jnp.take_along_axis(s, order, axis=1)
    out_i = jnp.take_along_axis(cand_idx, order, axis=1)
    out_i = jnp.where(jnp.isneginf(out_s), -1, out_i)
    return out_s, out_i


def cosine_topk_int8(db_i8: jnp.ndarray, scales: jnp.ndarray,
                     db_full: jnp.ndarray, queries: jnp.ndarray, k: int, *,
                     overfetch: int = 4, q_tile: int = 256,
                     db_tile: int = 2048, n_valid=None,
                     interpret: Optional[bool] = None):
    """Two-stage int8 top-k. db_i8/scales from `quantize_rows`; db_full is
    the exact-dtype matrix used only for candidate rescoring (bf16/f32).
    Same output contract as cosine_topk_pallas, with exact final scores."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, d = db_i8.shape
    q = queries.shape[0]
    if queries.ndim == 1:
        queries = queries[None]
        q = 1
    if n_valid is None:
        n_valid = n
    k_fetch = min(max(k * overfetch, k), 128)
    kpad = _round_up(max(k_fetch, 8), 8)
    q_tile = min(q_tile, _round_up(q, 8))

    qf = jnp.asarray(queries, jnp.float32)
    q_scales = jnp.maximum(jnp.max(jnp.abs(qf), axis=1), 1e-12) / 127.0
    q_i8 = jnp.clip(jnp.round(qf / q_scales[:, None]), -127, 127).astype(jnp.int8)

    outs = []
    for lo in range(0, q, _Q_RESIDENT):
        hi = min(q, lo + _Q_RESIDENT)
        s_a, i_a = _topk_int8_jit(
            db_i8, scales, q_i8[lo:hi], q_scales[lo:hi], n_valid,
            k=k_fetch, kpad=kpad, q_tile=q_tile, db_tile=db_tile,
            interpret=interpret, q_out=hi - lo, n_bufs=4)
        outs.append(_rescore(db_full, qf[lo:hi], i_a, k))
    if len(outs) == 1:
        return outs[0]
    return (jnp.concatenate([s for s, _ in outs], axis=0),
            jnp.concatenate([i for _, i in outs], axis=0))
