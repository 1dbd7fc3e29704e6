"""Exact cosine top-k search: tiled matmul with fused k-selection.

This replaces the reference's retrieval engine — qdrant-client embedded
local mode, a brute-force Python/numpy cosine scan per query
(reference core_system.py:659-664, SURVEY.md §2.2) — with a TPU-native
design:

  * database is an on-device `[N, d]` matrix of L2-normalized vectors
    (bf16 storage, fp32 accumulation);
  * a Pallas kernel tiles queries x database rows onto the MXU and keeps a
    running per-query top-k in VMEM scratch across the (sequential) TPU
    grid, so the full `[Q, N]` score matrix never round-trips HBM;
  * across chips the database is row-sharded; each shard computes a local
    top-k and results merge with one `all_gather` + final k-select
    (SURVEY.md §2.3 "search-shard parallel").

Semantics are deterministic: results are ordered by (-score, index), i.e.
ties broken toward the lower database row index, matching a stable numpy
argsort — required for recall parity tests against the reference.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

_INT_MAX = 2**31 - 1  # python literal: pallas kernels may not capture traced constants


def _lcm(a: int, b: int) -> int:
    import math
    return a * b // math.gcd(a, b)


def _dot_precision(dtype) -> jax.lax.Precision:
    """bf16 inputs run native MXU passes (fp32 accumulate via
    preferred_element_type); fp32 inputs (exact-parity mode) need HIGHEST or
    XLA silently truncates operands to bf16. Mosaic rejects HIGHEST on bf16
    operands, so pick per-dtype."""
    return (jax.lax.Precision.DEFAULT if jnp.dtype(dtype) == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_dim(x: jnp.ndarray, axis: int, size: int) -> jnp.ndarray:
    if x.shape[axis] == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, size - x.shape[axis])
    return jnp.pad(x, pad)


# ---------------------------------------------------------------------------
# XLA reference implementation (also the CPU path for tests)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("k",))
def cosine_topk_xla(db: jnp.ndarray, queries: jnp.ndarray, k: int,
                    n_valid=None, row_mask=None):
    """Exact top-k by full score materialization + lax.top_k.

    db: [N, d] L2-normalized. queries: [Q, d] L2-normalized.
    Returns (scores [Q, k] f32, idx [Q, k] int32), ordered by (-score, idx).
    `row_mask` ([N] bool) excludes rows (payload-filtered search): masked
    rows score -inf, so the result equals the exact scan over the subset.
    """
    scores = jax.lax.dot_general(
        queries, db,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(db.dtype),
    )  # [Q, N]
    if n_valid is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < n_valid, scores, -jnp.inf)
    if row_mask is not None:
        scores = jnp.where(row_mask[None, :], scores, -jnp.inf)
    k_eff = min(k, db.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k_eff)  # lax.top_k is stable: ties -> lower idx
    # absent slots (masked padding rows when n_valid < k) are -1, the
    # repo-wide contract — matching the Pallas and int8-XLA paths
    top_idx = jnp.where(jnp.isneginf(top_scores), -1, top_idx)
    if k_eff < k:
        top_scores = _pad_dim(top_scores, 1, k)
        top_scores = top_scores.at[:, k_eff:].set(-jnp.inf)
        top_idx = _pad_dim(top_idx, 1, k)
        top_idx = top_idx.at[:, k_eff:].set(-1)
    return top_scores.astype(jnp.float32), top_idx.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Pallas fused kernel (manual multi-buffered HBM->VMEM streaming)
# ---------------------------------------------------------------------------
#
# The database stays in HBM; the kernel streams [db_tile, d] blocks through
# a ring of VMEM buffers with explicit async DMA, overlapping the next
# block's fetch with the current block's MXU matmul. The running per-query
# top-k lives in VMEM scratch for the whole scan, so the [Q, N] score
# matrix never exists. Measured on v5e this sustains ~460 GB/s of HBM read
# (vs ~190 GB/s for the auto-pipelined grid formulation) and is DMA-bound,
# i.e. at the hardware roofline for a single-pass exact scan.
#
# The k-selection merge is gated: a tile touches the running top-k only if
# some score in it beats some query's current kth-best, which for random
# score order happens for O(k log n_tiles) of the tiles. The merge itself
# is an iterative max-extract with ties broken toward the lower row index,
# matching a stable argsort by (-score, idx).


def _insert_sorted(S, I, m, sel):
    """Vectorized insertion of one (score m, idx sel) candidate per query
    into desc-sorted (by (-score, idx)) lists S [Q, KP] / I [Q, KP].

    Every existing equal-score entry has a lower index than the candidate
    (candidates arrive in ascending index order), so the insert position is
    count(S >= m). Non-improving queries pass m = -inf => position KP =>
    no-op. Cost is a few passes over KP lanes (tiny).
    """
    kp = S.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, S.shape, 1)
    pos = jnp.sum((S >= m).astype(jnp.int32), axis=1, keepdims=True)
    S_shift = pltpu.roll(S, 1, 1)
    I_shift = pltpu.roll(I, 1, 1)
    new_S = jnp.where(lane < pos, S, jnp.where(lane == pos, m, S_shift))
    new_I = jnp.where(lane < pos, I, jnp.where(lane == pos, sel, I_shift))
    return new_S, new_I


def _insert_replace_min(S, I, m, sel):
    """Replace-min insertion: evict the worst entry by (-score, idx) —
    the (min score, max idx) one — and overwrite it with the candidate.

    The state is UNSORTED (a final k-extraction pass sorts it once per
    scan, `_sort_state_desc`). MEASURED SLOWER than the sorted insert on
    v5e (5.8 vs 5.3 ms at 1M x 1024 x 256q, interleaved A/B round 3):
    the op COUNTS are nearly equal once the per-event kth-min (a slice
    read in sorted mode) is charged, and per-small-op overhead (~1 us)
    dominates either way. Kept as a knob (`state_mode="replace_min"`,
    bitwise-identical results) because the event-count levers may
    change the balance later. Requires entries to be
    unique by I (true: db row ids are unique and the state initializes
    I to distinct negatives). Non-improving queries pass m = -inf:
    m > minv is then false everywhere, a no-op. Lanes >= k hold
    S = +inf sentinels so min(S) over the full KP lanes equals the true
    kth-best — they are never evicted (+inf never equals minv) and are
    cleared after the scan."""
    minv = jnp.min(S, axis=1, keepdims=True)
    evict = (S == minv) & (m > minv)
    max_i = jnp.max(jnp.where(evict, I, -_INT_MAX), axis=1, keepdims=True)
    hit = evict & (I == max_i)
    return jnp.where(hit, m, S), jnp.where(hit, sel, I)


def _sort_state_desc(S, I, k: int):
    """Sort the replace-min state by (-score, idx) into the first k
    lanes (what the kernel contract returns); runs ONCE per scan per
    q_tile, so ~5k small ops total — negligible next to the per-event
    insert savings. +inf sentinel lanes were cleared to -inf before."""
    lane = jax.lax.broadcasted_iota(jnp.int32, S.shape, 1)
    out_S = jnp.full_like(S, -jnp.inf)
    out_I = jnp.full_like(I, -1)
    for j in range(k):
        m = jnp.max(S, axis=1, keepdims=True)
        sel = jnp.min(jnp.where((S == m) & jnp.isfinite(m), I, _INT_MAX),
                      axis=1, keepdims=True)
        take = jnp.isfinite(m)
        out_S = jnp.where((lane == j) & take, m, out_S)
        out_I = jnp.where((lane == j) & take, sel, out_I)
        S = jnp.where((S == m) & (I == sel), -jnp.inf, S)
    return out_S, out_I


def _topk_stream_kernel(n_valid_ref, q_hbm, db_hbm, *rest,
                        k: int, kpad: int, db_tile: int, q_tile: int,
                        n_tiles: int, n_bufs: int, group: int,
                        defer: bool = False, int8_mode: bool = False,
                        binary_mode: bool = False,
                        state_mode: str = "sorted", masked: bool = False):
    # binary mode (sign-packed candidate scan, ops/binary.py): the DMA
    # ring carries [db_tile, d8] uint8 tiles (16x smaller than bf16);
    # each tile unpacks ONCE into the u_scr [db_tile, 8*d8] ±1 bf16
    # scratch — 8 shifted plane stores into whole lane slices, no
    # interleave (planar pack layout) — and the matmul reads u_scr.
    if masked:
        # row-mask mode (payload-filtered search): a [n_tiles, 4, db_tile]
        # int8 mask streams through its own tiny buffer ring in lockstep
        # with the db tiles; masked rows score -inf before the k-select.
        # The 4 identical sublane rows exist because int8 VMEM tiling is
        # (4, 128): a 1-sublane slice can't be DMA'd, a 4-sublane one can
        if binary_mode:
            (mask_hbm, scores_out, idx_out,
             q_vmem, bufs, u_scr, mbufs, s_scr, i_scr, col_scr, sp_scr,
             db_sems, m_sems, q_sem) = rest
        else:
            (mask_hbm, scores_out, idx_out,
             q_vmem, bufs, mbufs, s_scr, i_scr, col_scr, sp_scr,
             db_sems, m_sems, q_sem) = rest
            u_scr = None
    else:
        if binary_mode:
            (scores_out, idx_out,
             q_vmem, bufs, u_scr, s_scr, i_scr, col_scr, sp_scr,
             db_sems, q_sem) = rest
        else:
            (scores_out, idx_out,
             q_vmem, bufs, s_scr, i_scr, col_scr, sp_scr,
             db_sems, q_sem) = rest
            u_scr = None
        mask_hbm = mbufs = m_sems = None
    # Queries HBM -> VMEM once; they stay resident for the whole scan.
    # int8 mode: q_vmem is [2, qp, d] — the query's two int8 digits
    # (q ~= c1*hi + c2*lo with c1 = 254*c2), giving ~15-bit effective
    # query precision (finer than the bf16 path's 8-bit mantissa).
    cq = pltpu.make_async_copy(q_hbm, q_vmem, q_sem)
    cq.start()
    cq.wait()
    replace_min = state_mode == "replace_min"
    if replace_min:
        # lanes >= k hold +inf sentinels so min(S) over ALL kpad lanes
        # equals the true kth-best (gate threshold); distinct negative
        # ids keep entries unique by I (eviction tie-break invariant)
        lane0 = jax.lax.broadcasted_iota(jnp.int32, s_scr.shape, 1)
        s_scr[:] = jnp.where(lane0 < k, -jnp.inf, jnp.inf)
        i_scr[:] = -1 - lane0
    else:
        s_scr[:] = jnp.full_like(s_scr, -jnp.inf)
        i_scr[:] = jnp.full_like(i_scr, -1)
    # Column iota over the whole extraction group, generated ONCE: every
    # extraction event reuses it instead of paying an iota pass per event.
    col_scr[:] = jax.lax.broadcasted_iota(jnp.int32, col_scr.shape, 1)

    qp = q_vmem.shape[1] if int8_mode else q_vmem.shape[0]
    n_qt = qp // q_tile
    gw = group * db_tile          # extraction width
    n_valid = n_valid_ref[0]
    # Deferred mode ping-pongs between two staging buffers; the parity
    # must be STATIC in the unrolled body (a traced buffer index would
    # re-serialize DMA against compute, see the ring-slot note below), so
    # the body unrolls by a whole number of parity periods. Non-defer
    # unrolls by lcm(ring depth, group) so the extraction group may be
    # WIDER than the ring (fewer extraction events, same wide-pass
    # bytes — round-3 event-count lever).
    unroll = _lcm(n_bufs, 2 * group) if defer else _lcm(n_bufs, group)

    def db_dma(slot, i):
        return pltpu.make_async_copy(
            db_hbm.at[pl.ds(i * db_tile, db_tile), :],
            bufs.at[slot],
            db_sems.at[slot],
        )

    def mask_dma(slot, i):
        return pltpu.make_async_copy(
            mask_hbm.at[i], mbufs.at[slot], m_sems.at[slot])

    # Warm the buffer ring.
    for i in range(min(n_bufs - 1, n_tiles)):
        db_dma(i, i).start()
        if masked:
            mask_dma(i, i).start()

    # The tile loop is unrolled by the ring depth so every buffer-slot
    # index is STATIC: with a traced `slot`, Mosaic cannot prove the
    # matmul's read of bufs[slot] is disjoint from the in-flight DMA
    # write of bufs[(i+n_bufs-1) % n_bufs] and serializes them --
    # measured 4.7 ms vs 2.6 ms for the bare scan at 1M x 1024
    # (scripts/bench_scan_overlap.py). Static slots restore full
    # DMA/MXU overlap. Extraction-group membership (j % group) also
    # becomes static, removing the per-tile scalar branch.
    def body(iu, _):
        for t in range(unroll):
            _tile_step(iu * unroll + t, t % n_bufs, t % group,
                       (t // group) % 2)
        return 0

    # Candidate extraction, once per group of `group` tiles. Each
    # event pulls at most one new top-k row per query out of the
    # group (total insert events over a scan are ~Q*k*ln(n_tiles)).
    # Strict > is exact: an equal score has a higher row index than
    # the incumbent kth (candidates arrive in index order), so
    # (-score, idx) ordering keeps the incumbent.
    #
    # Structure (round-2 rework): the dominant k-select cost was NOT
    # the wide VPU passes but the ~14 small [q_tile, kpad] ops of the
    # sorted insert paid once per 1024-row tile (measured ~1.5 ms of
    # the 1.9 ms extraction overhead at 1M x 1024). Grouping tiles
    # halves/quarters the number of insert calls while keeping the
    # same total wide-pass bytes. The FAST path inserts each query's
    # group max with three wide passes (max, min-select over the
    # resident column iota, candidate-count) and NO knockout/re-max;
    # `count = #(scores > old kth)` proves whether any query holds a
    # second candidate in the group, and only then does the knockout
    # + while_loop fallback run (count <= 1 for ~99% of events).
    # kth-best per query: sorted state keeps it at lane k-1; replace-min
    # state is unsorted, min over the lanes (+inf sentinels beyond k make
    # the full-width min correct) — one extra small op per use
    def _kth(lo):
        if replace_min:
            return jnp.min(s_scr[lo:lo + q_tile, :], axis=1, keepdims=True)
        return s_scr[lo:lo + q_tile, k - 1:k]

    _insert = _insert_replace_min if replace_min else _insert_sorted

    def _extract_group(sp_ref, i_last):
        """Drain staged scores of the group whose LAST tile is i_last."""
        gbase = (i_last - (group - 1)) * db_tile

        for qt in range(n_qt):
            lo = qt * q_tile
            sp = sp_ref[lo:lo + q_tile, :]
            m0 = jnp.max(sp, axis=1, keepdims=True)
            kth0 = _kth(lo)

            @pl.when(jnp.any(m0 > kth0))
            def _():
                imp = m0 > kth0
                # the compare stays inlined in the reduction (a
                # materialized eq mask costs a full write pass)
                sel = jnp.min(jnp.where(sp == m0, col_scr[:], _INT_MAX),
                              axis=1, keepdims=True)
                cand_m = jnp.where(imp, m0, -jnp.inf)
                new_S, new_I = _insert(
                    s_scr[lo:lo + q_tile, :], i_scr[lo:lo + q_tile, :],
                    cand_m, sel + gbase)
                s_scr[lo:lo + q_tile, :] = new_S
                i_scr[lo:lo + q_tile, :] = new_I
                count = jnp.sum((sp > kth0).astype(jnp.int32), axis=1,
                                keepdims=True)

                @pl.when(jnp.any(count > 1))
                def _():
                    # Knock out every inserted max, then drain the
                    # rest. The group scratch is clobbered in place
                    # (it is consumed after extraction) so the while
                    # carry stays [q_tile, 1] — carrying the scores
                    # blows the VMEM stack at group width.
                    sp_ref[lo:lo + q_tile, :] = jnp.where(
                        (sp == m0) & (col_scr[:] == sel) & imp,
                        -jnp.inf, sp)
                    m1 = jnp.max(sp_ref[lo:lo + q_tile, :], axis=1,
                                 keepdims=True)

                    def cond(carry):
                        m, kth = carry
                        return jnp.any(m > kth)

                    def extract(carry):
                        m, _ = carry
                        s_cur = sp_ref[lo:lo + q_tile, :]
                        imp = m > _kth(lo)
                        sel = jnp.min(
                            jnp.where(s_cur == m, col_scr[:], _INT_MAX),
                            axis=1, keepdims=True)
                        cand_m = jnp.where(imp, m, -jnp.inf)
                        new_S, new_I = _insert(
                            s_scr[lo:lo + q_tile, :],
                            i_scr[lo:lo + q_tile, :],
                            cand_m, sel + gbase)
                        s_scr[lo:lo + q_tile, :] = new_S
                        i_scr[lo:lo + q_tile, :] = new_I
                        s_next = jnp.where(
                            (col_scr[:] == sel) & imp, -jnp.inf, s_cur)
                        sp_ref[lo:lo + q_tile, :] = s_next
                        return (jnp.max(s_next, axis=1, keepdims=True),
                                _kth(lo))

                    jax.lax.while_loop(
                        cond, extract,
                        (m1, _kth(lo)))

    def _tile_step(i, j, g, par):
        """One DMA tile: i = tile index (traced offset + static phase),
        j = ring slot (static), g = phase within the extraction group
        (static), par = staging-buffer parity (static, defer mode)."""
        prefetch = i + n_bufs - 1

        @pl.when(prefetch < n_tiles)
        def _():
            db_dma((j + n_bufs - 1) % n_bufs, prefetch).start()
            if masked:
                mask_dma((j + n_bufs - 1) % n_bufs, prefetch).start()

        db_dma(j, i).wait()
        if masked:
            mask_dma(j, i).wait()
        base = i * db_tile
        sp_ref = sp_scr if not defer else sp_scr.at[par]

        if binary_mode:
            # unpack this tile once, before the query-tile loop: plane
            # jb (a full-width i32 shift+mask) lands in lane columns
            # [jb*d8, (jb+1)*d8) of the ±1 scratch — original dim order
            # by the planar pack contract
            d8c = bufs.shape[2]
            x = bufs[j][...].astype(jnp.int32)
            for jb in range(8):
                plane = (x >> jb) & 1
                u_scr[:, jb * d8c:(jb + 1) * d8c] = \
                    (2 * plane - 1).astype(jnp.bfloat16)

        for qt in range(n_qt):
            lo = qt * q_tile
            if binary_mode:
                # one bf16 MXU pass against the unpacked ±1 tile;
                # f32 accumulation (products are ±q_i, exact in bf16)
                s = jax.lax.dot_general(
                    q_vmem[lo:lo + q_tile, :], u_scr[...],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            elif int8_mode:
                # Two s8 MXU passes (hi/lo query digits), exact s32
                # accumulation, f32 combine. |dot| <= d*127^2 < 2^24 so
                # each partial is exactly representable in f32; the
                # combined score is a deterministic f32 value of
                # q_hat . (db_scale * v8).
                dims = (((1,), (1,)), ((), ()))
                s_hi = jax.lax.dot_general(
                    q_vmem[0, lo:lo + q_tile, :], bufs[j],
                    dimension_numbers=dims,
                    preferred_element_type=jnp.int32)
                s_lo = jax.lax.dot_general(
                    q_vmem[1, lo:lo + q_tile, :], bufs[j],
                    dimension_numbers=dims,
                    preferred_element_type=jnp.int32)
                # unscaled combined dots: per-query ordering is invariant
                # to the (positive, per-query) scale, which is applied
                # to the returned scores outside the kernel
                s = (s_hi.astype(jnp.float32) * 254.0
                     + s_lo.astype(jnp.float32))
            else:
                # [q_tile, db_tile] fp32 scores on the MXU.
                s = jax.lax.dot_general(
                    q_vmem[lo:lo + q_tile, :], bufs[j],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_dot_precision(q_vmem.dtype),
                )
            # Mask padding rows (score -> -inf). Only tiles overlapping the
            # padded tail pay for the iota+select passes; interior tiles
            # skip via the scalar branch.
            def mask_tail(s):
                col_m = jax.lax.broadcasted_iota(
                    jnp.int32, (q_tile, db_tile), 1) + base
                return jnp.where(col_m < n_valid, s, -jnp.inf)

            s = jax.lax.cond(base + db_tile > n_valid, mask_tail,
                             lambda s: s, s)
            if masked:
                # filtered rows score -inf (one wide select pass per
                # tile — the cost of exact filtering at kernel speed);
                # the 4 sublane rows are identical, max collapses them
                m = jnp.max(mbufs[j].astype(jnp.int32), axis=0,
                            keepdims=True)
                s = jnp.where(m != 0, s, -jnp.inf)
            # Stage this tile's scores into its slice of the group buffer;
            # extraction runs once per GROUP of tiles.
            sp_ref[lo:lo + q_tile, g * db_tile:(g + 1) * db_tile] = s

        if g == group - 1:
            if not defer:
                _extract_group(sp_scr, i)
            else:
                # Software pipeline: extract the PREVIOUS group (staged
                # in the other buffer) so its VPU passes are independent
                # of this group's just-issued matmuls — Mosaic can keep
                # the MXU busy under the extraction.
                @pl.when(i >= 2 * group - 1)
                def _():
                    _extract_group(sp_scr.at[1 - par], i - group)

    jax.lax.fori_loop(0, n_tiles // unroll, body, 0)
    if defer:
        # drain the final group (its extraction was deferred past the loop)
        _extract_group(sp_scr.at[((n_tiles - 1) // group) % 2],
                       n_tiles - 1)
    if replace_min:
        # one-time finish: clear the +inf sentinels, then sort the
        # unsorted state by (-score, idx) into the first k lanes
        S = s_scr[:]
        S = jnp.where(jnp.isposinf(S), -jnp.inf, S)
        out_S, out_I = _sort_state_desc(S, i_scr[:], k)
        scores_out[:] = out_S
        idx_out[:] = out_I
    else:
        scores_out[:] = s_scr[:]
        idx_out[:] = i_scr[:]


# Max queries resident in VMEM per kernel launch; larger batches stream the
# database once per chunk of this many queries.
_Q_RESIDENT = 1024


@functools.partial(jax.jit, static_argnames=("k", "kpad", "q_tile", "db_tile",
                                             "interpret", "q_out", "n_bufs",
                                             "group", "defer", "state_mode"))
def _topk_pallas_jit(db: jnp.ndarray, queries: jnp.ndarray, n_valid, *,
                     k: int, kpad: int, q_tile: int, db_tile: int,
                     interpret: bool, q_out: int, n_bufs: int,
                     group: int = 2, defer: bool = False,
                     db_scale=None, state_mode: str = "sorted",
                     db_mask=None):
    """Jit-cached core of cosine_topk_pallas (tracing a pallas_call per call
    would dominate runtime otherwise).

    int8 databases (`db.dtype == int8`, with `db_scale` the dequantization
    scale) are scanned with a two-digit int8 query decomposition: exact
    s32 dot products on the s8 MXU path, half the HBM traffic of bf16,
    and ~15-bit query precision. Scores are deterministic f32 values of
    q_hat . (db_scale * v8) — the same exactness contract as the bf16
    path (exact w.r.t. the stored representation)."""
    n, d = db.shape
    q = queries.shape[0]
    int8_mode = jnp.dtype(db.dtype) == jnp.int8
    # uint8 db = sign-packed binary candidate scan (ops/binary.py):
    # db columns are PACKED planes (d8 = plane width, a multiple of
    # 128), the query dim is 8*d8, and the kernel unpacks each tile
    # in VMEM
    binary_mode = jnp.dtype(db.dtype) == jnp.uint8
    if binary_mode:
        assert d % 128 == 0, ("binary plane width must be whole lane "
                              "tiles", d)
        assert queries.shape[1] == 8 * d, (queries.shape, d)
        d_p = d                  # packed columns move through the ring
    else:
        d_p = _round_up(d, 128)
    # whole unroll units (the kernel unrolls by lcm(ring, group) — or a
    # whole number of staging-parity periods in defer mode — for static
    # buffer slots AND static extraction-group phases)
    unroll = _lcm(n_bufs, 2 * group) if defer else _lcm(n_bufs, group)
    n_p = _round_up(n, unroll * db_tile)
    q_p = _round_up(q, q_tile)

    # NOTE: padding copies the whole database inside jit. Callers on the hot
    # path (DeviceIndex) pre-align rows to db_tile so this is a no-op.
    db_p = _pad_dim(_pad_dim(db, 1, d_p), 0, n_p)
    if int8_mode:
        assert db_scale is not None
        # PER-QUERY digit scales: a query's returned scores must not
        # depend on which other queries were coalesced into the same
        # launch (batch-global max|q| broke that). Per-query positive
        # scaling leaves each row's (-score, idx) order untouched, so
        # the kernel ranks UNscaled combined dots and the true scores
        # are restored outside by a per-row multiply.
        q_hi, q_lo, c2 = int8_query_digits(queries)
        qs_p = jnp.stack([
            _pad_dim(_pad_dim(q_hi, 1, d_p), 0, q_p),
            _pad_dim(_pad_dim(q_lo, 1, d_p), 0, q_p)])
        row_scale = c2 * jnp.asarray(db_scale, jnp.float32)   # [Q, 1]
    elif binary_mode:
        qs_p = _pad_dim(jnp.asarray(queries, jnp.bfloat16), 0, q_p)
    else:
        qs_p = _pad_dim(_pad_dim(queries, 1, d_p), 0, q_p)
    n_valid = jnp.asarray(n_valid, jnp.int32).reshape(1)
    n_tiles = n_p // db_tile
    masked = db_mask is not None

    kernel = functools.partial(
        _topk_stream_kernel, k=k, kpad=kpad, db_tile=db_tile, q_tile=q_tile,
        n_tiles=n_tiles, n_bufs=n_bufs, group=group, defer=defer,
        int8_mode=int8_mode, binary_mode=binary_mode,
        state_mode=state_mode, masked=masked)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [n_valid, qs_p, db_p]
    scratch_shapes = [
        pltpu.VMEM(((2, q_p, d_p) if int8_mode else
                    (q_p, 8 * d_p) if binary_mode else (q_p, d_p)),
                   qs_p.dtype),
        pltpu.VMEM((n_bufs, db_tile, d_p), db_p.dtype),
    ]
    if binary_mode:
        # the per-tile unpacked ±1 block the matmuls read
        scratch_shapes.append(pltpu.VMEM((db_tile, 8 * d_p),
                                         jnp.bfloat16))
    if masked:
        # [n_tiles, 4, db_tile] int8 (sublanes replicated to satisfy the
        # (4, 128) int8 tiling), DMA'd tile-by-tile beside the db ring
        mask_p = _pad_dim(jnp.asarray(db_mask, jnp.int8), 0, n_p)
        inputs.append(jnp.broadcast_to(
            mask_p.reshape(n_tiles, 1, db_tile),
            (n_tiles, 4, db_tile)) + jnp.int8(0))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch_shapes.append(pltpu.VMEM((n_bufs, 4, db_tile), jnp.int8))
    scratch_shapes += [
        pltpu.VMEM((q_p, kpad), jnp.float32),
        pltpu.VMEM((q_p, kpad), jnp.int32),
        pltpu.VMEM((q_tile, group * db_tile), jnp.int32),  # col iota
        pltpu.VMEM(((2, q_p, group * db_tile) if defer
                    else (q_p, group * db_tile)),
                   jnp.float32),                            # group scores
        pltpu.SemaphoreType.DMA((n_bufs,)),
    ]
    if masked:
        scratch_shapes.append(pltpu.SemaphoreType.DMA((n_bufs,)))
    scratch_shapes.append(pltpu.SemaphoreType.DMA(()))

    scores, idx = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_p, kpad), jnp.float32),
            jax.ShapeDtypeStruct((q_p, kpad), jnp.int32),
        ],
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=2 * q_p * n_p * d_p,
            bytes_accessed=(n_p * d_p + q_p * d_p) * db.dtype.itemsize
                           + q_p * kpad * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)
    scores, idx = scores[:q_out, :k], idx[:q_out, :k]
    if int8_mode:
        # restore true cosine scale per query (-inf stays -inf)
        scores = scores * row_scale[:q_out]
    # fewer than k valid rows: masked -inf slots must not leak pad row ids
    idx = jnp.where(jnp.isneginf(scores), -1, idx)
    return scores, idx


def cosine_topk_pallas(db: jnp.ndarray, queries: jnp.ndarray, k: int, *,
                       q_tile: int = 256, db_tile: int = 1024,
                       n_valid=None,
                       interpret: Optional[bool] = None,
                       defer: Optional[bool] = None,
                       state_mode: str = "sorted",
                       group: Optional[int] = None,
                       row_mask=None):
    """Fused exact cosine top-k. Same contract as `cosine_topk_xla`.

    k must be <= 128 (use impl="xla" in `sharded_cosine_topk` for more).
    `n_valid` (scalar, default db.shape[0]) masks trailing padding rows so a
    pre-padded database (rows padded to a mesh/tile multiple) never produces
    hits; for best performance pass a db whose rows are already a multiple
    of db_tile (otherwise the jit pads = copies it every call). Slots beyond
    the number of valid rows come back as (score=-inf, idx=-1).
    `row_mask` ([N] bool, payload-filtered search) excludes rows exactly —
    it streams through its own tiny DMA ring beside the db tiles, costing
    one wide select pass per tile (~7% at d=1024), so filtered searches
    keep kernel speed instead of falling back to the XLA scan.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, d = db.shape
    # queries must match the db dtype: the resident query block is a
    # straight HBM->VMEM DMA and current toolchains VERIFY element-type
    # equality (the old implicit f32->bf16 DMA conversion is rejected).
    # DeviceIndex casts before calling; this covers direct op users.
    queries = jnp.asarray(queries, db.dtype)
    q, dq = queries.shape
    assert d == dq, (db.shape, queries.shape)
    if k > 128:
        raise ValueError("fused kernel supports k <= 128")
    if n_valid is None:
        n_valid = n
    kpad = _round_up(max(k, 8), 8)         # scratch lane padding
    q_tile = min(q_tile, _round_up(q, 8))
    # VMEM budget (~16 MB/core): buffer ring + resident queries + merge
    # temporaries. Shrink the DMA ring until it fits ~11 MB alongside the
    # resident query block and per-tile working set.
    itemsize = jnp.dtype(db.dtype).itemsize
    d_p = _round_up(d, 128)
    q_res = min(_round_up(q, q_tile), _Q_RESIDENT)
    # Extraction groups: the sorted-insert call (NOT the wide passes) is
    # the dominant k-select cost; grouping `group` DMA tiles per
    # extraction halves the number of insert calls. 12 bytes per
    # (q_tile, group*db_tile) element: fp32 group-score scratch + int32
    # column iota + extraction temporaries. The group may exceed the
    # ring depth (body unrolls by lcm) — wider groups at smaller
    # db_tile trade matmul granularity for fewer extraction events.
    if group is None:
        group = 2
    if defer is None:
        defer = False
    # staging bytes per (q_tile, group*db_tile) element: fp32 group-score
    # scratch (x2 ping-pong buffers in defer mode) + int32 column iota +
    # extraction temporaries
    fixed = (q_res * d_p * itemsize + q_res * kpad * 8
             + q_tile * group * db_tile * (16 if defer else 12))
    n_bufs = 4 if itemsize <= 2 else 2
    while n_bufs > 2 and fixed + n_bufs * db_tile * d_p * itemsize > 11 * 2**20:
        n_bufs -= 1

    # TRUE-total chunk clamp: the n_bufs model above intentionally
    # keeps its historical accounting (the measured configs compile
    # identically), but it budgets the group-score staging at q_tile
    # rows while the kernel allocates it at the FULL resident q_p rows
    # — a >768-query chunk at d=1024 bf16 overflowed the 16 MB VMEM.
    # Correct accounting here only SHRINKS the resident chunk.
    q_factor = 2 if itemsize == 1 else 1          # int8: two query planes
    sp_factor = 2 if defer else 1

    def _vmem_total(q_rows: int) -> int:
        q_p_ = _round_up(q_rows, q_tile)
        return (q_factor * q_p_ * d_p * itemsize
                + n_bufs * db_tile * d_p * itemsize
                + q_p_ * kpad * 16                 # state + outputs
                + q_tile * group * db_tile * 4     # column iota
                + sp_factor * q_p_ * group * db_tile * 4)

    q_chunk = min(_Q_RESIDENT, _round_up(q, q_tile))
    while q_chunk > q_tile and _vmem_total(q_chunk) > 14 * 2 ** 20:
        q_chunk -= q_tile

    if row_mask is not None:
        row_mask = jnp.asarray(row_mask, jnp.int8)
        if row_mask.shape[0] < n:
            row_mask = _pad_dim(row_mask, 0, n)
        row_mask = row_mask[:n]
    if q <= q_chunk:
        return _topk_pallas_jit(db, queries, n_valid, k=k, kpad=kpad,
                                q_tile=q_tile, db_tile=db_tile,
                                interpret=interpret, q_out=q, n_bufs=n_bufs,
                                group=group, defer=defer,
                                state_mode=state_mode, db_mask=row_mask)
    # Chunk large query batches; each chunk streams the database once.
    outs = [
        _topk_pallas_jit(db, queries[lo:lo + q_chunk], n_valid,
                         k=k, kpad=kpad, q_tile=q_tile, db_tile=db_tile,
                         interpret=interpret,
                         q_out=min(q_chunk, q - lo), n_bufs=n_bufs,
                         group=group, defer=defer, state_mode=state_mode,
                         db_mask=row_mask)
        for lo in range(0, q, q_chunk)
    ]
    return (jnp.concatenate([s for s, _ in outs], axis=0),
            jnp.concatenate([i for _, i in outs], axis=0))


def cosine_topk(db: jnp.ndarray, queries: jnp.ndarray, k: int, **kw):
    """Dispatch: Pallas kernel when possible, XLA fallback otherwise."""
    if k <= 128:
        return cosine_topk_pallas(db, queries, k, **kw)
    # the XLA path must keep honoring n_valid (dropping it would score
    # tile-padding rows at 0.0 and surface their indices) and row_mask
    # (dropping it would silently un-filter a filtered search)
    return cosine_topk_xla(db, queries, k, n_valid=kw.get("n_valid"),
                           row_mask=kw.get("row_mask"))


# ---------------------------------------------------------------------------
# int8-stored exact search (2x capacity of bf16 at the same scan speed)
# ---------------------------------------------------------------------------

def quantize_db_int8(db):
    """Symmetric global int8 quantization of an embedding matrix.

    Returns (v8 [N, d] int8, scale f32) with db ~= scale * v8. The int8
    matrix IS the stored database — searches are exact with respect to
    it, the same contract as bf16 storage (which also rounds the
    embeddings, to an 8-bit mantissa). Halves HBM per vector again vs
    bf16: 100M x 1024 fits a v5e-8 at 12.8 GB/chip.
    """
    db32 = jnp.asarray(db, jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(db32)), 1e-30)
    # quantize by MULTIPLYING with 127/amax: f32 multiply is correctly
    # rounded on the TPU VPU, while f32 division lowers to a reciprocal
    # refinement that can be 1 ulp off IEEE — round(x / s) then differs
    # from host numpy at halfway points. Host mirrors (DeviceIndex,
    # IVFIndex) use the same multiply form with a host-f32 inverse.
    inv = 127.0 / amax
    v8 = jnp.clip(jnp.round(db32 * inv), -127, 127).astype(jnp.int8)
    return v8, amax / 127.0


def int8_clip_bound(values: np.ndarray, quantile: float) -> np.float32:
    """Host-side clipping bound for symmetric int8 quantization.

    `quantile == 0` (the default everywhere) returns the exact abs-max
    — nothing clips. With 0 < quantile < 1, returns that abs-value
    quantile over a deterministic stride sample of the matrix, the
    role of qdrant ScalarQuantization's `quantile` parameter: long-tail
    outliers saturate to +-127 and the remaining 254 steps resolve the
    bulk of the distribution more finely. The int8-exact search
    contract is unaffected either way — scores are exact with respect
    to the STORED int8 rows, however they were rounded. numpy f32
    math so the DeviceIndex host mirror stays deterministic across
    processes (no device round trip)."""
    a = np.abs(np.asarray(values, np.float32))
    if quantile and a.size:
        if not 0.0 < quantile < 1.0:
            raise ValueError(
                f"int8 quantile must be in (0, 1), got {quantile}")
        flat = a.reshape(-1)
        stride = max(1, flat.size // (1 << 22))   # deterministic sample
        bound = np.quantile(flat[::stride], quantile)
        return np.float32(max(bound, 1e-30))
    return np.float32(max(a.max(initial=0.0), 1e-30))


def int8_query_digits(queries):
    """Two-digit int8 query decomposition for the exact s8 MXU path.

    q ~= c1*q_hi + c2*q_lo with c1 = 254*c2 (c1 from the per-query
    abs-max, 1e-30 floored): two s8 dots combine to an exact ~15-bit-
    query-precision f32 score. Scales are PER-QUERY — positive scaling
    leaves each row's (-score, idx) order untouched, so kernels rank
    unscaled combined dots and the caller restores true scores with
    row_scale = c2 * db_scale. THE single definition of the exactness
    contract — shared by cosine_topk_int8_exact and IVFIndex.search so
    the two paths stay bitwise consistent.
    Returns (q_hi [Q, d] i8, q_lo [Q, d] i8, c2 [Q, 1] f32)."""
    qs32 = jnp.asarray(queries, jnp.float32)
    c1 = jnp.maximum(jnp.max(jnp.abs(qs32), axis=1, keepdims=True),
                     1e-30) / 127.0
    c2 = c1 / 254.0
    q_hi = jnp.clip(jnp.round(qs32 / c1), -127, 127).astype(jnp.int8)
    resid = qs32 - q_hi.astype(jnp.float32) * c1
    q_lo = jnp.clip(jnp.round(resid / c2), -127, 127).astype(jnp.int8)
    return q_hi, q_lo, c2


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def cosine_topk_int8_xla(db_i8: jnp.ndarray, db_scale,
                         queries: jnp.ndarray, k: int,
                         n_valid=None, *, chunk: int = 65536,
                         row_mask=None):
    """Exact top-k over an int8 database via XLA, any k.

    Scans row chunks with `lax.scan`, dequantizing each chunk on the
    fly and carrying a running (scores, ids) top-k — the full f32
    matrix never exists (a whole-database dequant would quadruple the
    int8 footprint and OOM exactly at the capacity int8 exists for).
    Tie order matches the stable single-shot scan: earlier (lower-id)
    candidates precede the chunk in the concat, and lax.top_k is
    stable. `row_mask` ([N] bool) excludes rows exactly (filtered
    search), chunked through the scan alongside the matrix.

    Chunks are DYNAMIC-SLICED out of the resident matrix (the former
    pad-to-chunk-multiple + reshape materialized a full padded COPY —
    a silent 2x HBM transient that OOM'd exact scans at exactly the
    capacity int8 exists for, observed at 8M x 1024). The tail chunk
    clamps its start and drops the re-read overlap rows, so results
    and tie order are identical to the padded formulation."""
    n, d = db_i8.shape
    q = queries.shape[0]
    if n_valid is None:
        n_valid = n
    n_valid = jnp.asarray(n_valid, jnp.int32)
    chunk = min(chunk, _round_up(n, 128))
    q32 = queries.astype(jnp.float32)
    scale = jnp.asarray(db_scale, jnp.float32)
    k_eff = min(k, n)
    mask_arr = (jnp.asarray(row_mask, jnp.bool_)
                if row_mask is not None else None)
    if mask_arr is not None and mask_arr.shape[0] < n:
        mask_arr = _pad_dim(mask_arr, 0, n)
    if n <= chunk:
        # single block: pad once (bounded by one chunk, no 2x copy)
        db_i8 = _pad_dim(db_i8, 0, chunk)
        if mask_arr is not None:
            mask_arr = _pad_dim(mask_arr, 0, chunk)
        n_rows, n_steps = chunk, 1
    else:
        n_rows, n_steps = n, -(-n // chunk)

    def body(carry, i):
        s_c, i_c = carry
        base = i * chunk
        start = jnp.minimum(base, n_rows - chunk)   # tail clamps
        block = jax.lax.dynamic_slice(db_i8, (start, 0), (chunk, d))
        s = jax.lax.dot_general(
            q32, block.astype(jnp.float32) * scale,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + start
        # col >= base drops the clamped tail's re-read rows exactly
        s = jnp.where((col >= base) & (col < n_valid), s, -jnp.inf)
        if mask_arr is not None:
            mblk = jax.lax.dynamic_slice(mask_arr, (start,), (chunk,))
            s = jnp.where(mblk[None, :], s, -jnp.inf)
        all_s = jnp.concatenate([s_c, s], axis=1)
        all_i = jnp.concatenate([i_c, col], axis=1)
        top_s, pos = jax.lax.top_k(all_s, k_eff)
        return (top_s, jnp.take_along_axis(all_i, pos, axis=1)), None

    init = (jnp.full((q, k_eff), -jnp.inf, jnp.float32),
            jnp.full((q, k_eff), -1, jnp.int32))
    (top_s, top_i), _ = jax.lax.scan(
        body, init, jnp.arange(n_steps, dtype=jnp.int32))
    if k_eff < k:
        top_s = _pad_dim(top_s, 1, k)
        top_s = top_s.at[:, k_eff:].set(-jnp.inf)
        top_i = _pad_dim(top_i, 1, k)
    top_i = jnp.where(jnp.isneginf(top_s), -1, top_i)
    return top_s, top_i


def cosine_topk_int8_exact(db_i8: jnp.ndarray, db_scale,
                           queries: jnp.ndarray,
                           k: int, *, q_tile: int = 256, db_tile: int = 1024,
                           n_valid=None, interpret: Optional[bool] = None,
                           state_mode: str = "sorted", row_mask=None):
    """Exact cosine top-k over an int8-stored database.

    Same contract as `cosine_topk_pallas`, with the database held as
    (int8 matrix, scale) from `quantize_db_int8`. The streaming kernel
    runs two s8 MXU passes per tile (hi/lo query digits -> exact s32
    dots) so query precision is ~15 bits — finer than the bf16 path —
    while the HBM stream is half the bytes. Scores are deterministic
    f32 cosines against the dequantized stored vectors. (Distinct from
    `ops.topk_int8.cosine_topk_int8`, the two-stage overfetch+rescore
    path whose recall is approximate.)
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, d = db_i8.shape
    q = queries.shape[0]
    assert jnp.dtype(db_i8.dtype) == jnp.int8, db_i8.dtype
    if k > 128:
        raise ValueError("fused kernel supports k <= 128")
    # Exactness contract: each digit's dot must be exactly representable
    # in f32, i.e. |dot| <= d * 127^2 < 2^24, which bounds d <= 1040.
    # Beyond that the combine is still deterministic but can round;
    # refuse rather than silently overclaim (use cosine_topk_int8_xla,
    # whose f32-HIGHEST dots carry no such bound).
    if d * 127 * 127 >= 2 ** 24:
        raise ValueError(
            f"int8-exact kernel requires d <= 1040 for exact f32 partials "
            f"(got d={d}); use cosine_topk_int8_xla for larger dims")
    if n_valid is None:
        n_valid = n
    kpad = _round_up(max(k, 8), 8)
    q_tile = min(q_tile, _round_up(q, 8))
    d_p = _round_up(d, 128)
    q_res = min(_round_up(q, q_tile), _Q_RESIDENT)
    group = 2
    # two resident int8 query planes + topk state + staging/iota
    fixed = (2 * q_res * d_p + q_res * kpad * 8
             + q_tile * group * db_tile * 12)
    n_bufs = 4
    while n_bufs > 2 and fixed + n_bufs * db_tile * d_p > 11 * 2**20:
        n_bufs -= 1

    # TRUE-total chunk clamp (same rationale as cosine_topk_pallas):
    # the staging scratch is q_p rows, not q_tile — bound the resident
    # chunk so large query batches cannot overflow VMEM
    def _vmem_total(q_rows: int) -> int:
        q_p_ = _round_up(q_rows, q_tile)
        return (2 * q_p_ * d_p + n_bufs * db_tile * d_p
                + q_p_ * kpad * 16 + q_tile * group * db_tile * 4
                + q_p_ * group * db_tile * 4)

    q_chunk = min(_Q_RESIDENT, _round_up(q, q_tile))
    while q_chunk > q_tile and _vmem_total(q_chunk) > 14 * 2 ** 20:
        q_chunk -= q_tile

    if row_mask is not None:
        row_mask = jnp.asarray(row_mask, jnp.int8)
        if row_mask.shape[0] < n:
            row_mask = _pad_dim(row_mask, 0, n)
        row_mask = row_mask[:n]

    def launch(qs, q_out):
        return _topk_pallas_jit(db_i8, qs, n_valid, k=k, kpad=kpad,
                                q_tile=q_tile, db_tile=db_tile,
                                interpret=interpret, q_out=q_out,
                                n_bufs=n_bufs, group=group,
                                db_scale=jnp.asarray(db_scale, jnp.float32),
                                state_mode=state_mode, db_mask=row_mask)

    if q <= q_chunk:
        return launch(queries, q)
    outs = [launch(queries[lo:lo + q_chunk], min(q_chunk, q - lo))
            for lo in range(0, q, q_chunk)]
    return (jnp.concatenate([s for s, _ in outs], axis=0),
            jnp.concatenate([i for _, i in outs], axis=0))


# ---------------------------------------------------------------------------
# Sharded search (row-sharded database across the mesh)
# ---------------------------------------------------------------------------

def sharded_cosine_topk(db: jnp.ndarray, queries: jnp.ndarray, k: int,
                        mesh: Mesh, axis: str = "data",
                        impl: str = "auto", n_valid=None, db_scale=None,
                        row_mask=None):
    """Top-k over a database row-sharded across `axis` of `mesh`.

    Each device scans its local shard with the fused kernel, then per-shard
    (score, global-id) candidates are merged with one all_gather + final
    k-select. Result is replicated. db rows must divide the axis size;
    `n_valid` (global count) masks trailing padding rows of the last shards.
    An int8-stored db passes its (global) dequantization scale via
    `db_scale` and is scanned with the int8-exact kernel per shard.
    `row_mask` ([n] bool, sharded with the rows) excludes rows exactly
    (payload-filtered search); masked shards scan via the XLA paths.

    Returns (scores [Q, k] f32, idx [Q, k] int32) identical to the
    single-device scan (deterministic tie-breaking by global row id).
    """
    n, d = db.shape
    n_shards = mesh.shape[axis]
    assert n % n_shards == 0, (n, n_shards)
    local_n = n // n_shards
    int8 = jnp.dtype(db.dtype) == jnp.int8
    # auto respects the int8-exact kernel's d <= 1040 exactness bound
    # (wider dims use the chunked int8 XLA scan per shard); the fused
    # kernels stream a row mask beside the db tiles, so filtered scans
    # stay on the kernel path
    use_pallas = impl == "pallas" or (
        impl == "auto" and k <= 128
        and not (int8 and d * 127 * 127 >= 2 ** 24))
    assert not int8 or db_scale is not None
    if n_valid is None:
        n_valid = n
    if row_mask is not None:
        assert row_mask.shape == (n,), (row_mask.shape, n)

    def local_scan(db_shard, qs, mask_shard):
        shard_id = jax.lax.axis_index(axis)
        local_valid = jnp.clip(jnp.asarray(n_valid) - shard_id * local_n, 0, local_n)
        if int8 and use_pallas:
            s, i = cosine_topk_int8_exact(db_shard, db_scale, qs, k,
                                          n_valid=local_valid,
                                          row_mask=mask_shard)
        elif int8:
            # chunked: never dequantizes the whole shard at once
            s, i = cosine_topk_int8_xla(db_shard, db_scale, qs, k,
                                        n_valid=local_valid,
                                        row_mask=mask_shard)
        elif use_pallas:
            s, i = cosine_topk_pallas(db_shard, qs, k, n_valid=local_valid,
                                      row_mask=mask_shard)
        else:
            s, i = cosine_topk_xla(db_shard, qs, k, n_valid=local_valid,
                                   row_mask=mask_shard)
        i = jnp.where(i >= 0, i + shard_id * local_n, i)
        # Gather all shards' candidates: [P, Q, k] -> [Q, P*k]
        all_s = jax.lax.all_gather(s, axis)
        all_i = jax.lax.all_gather(i, axis)
        qn = qs.shape[0]
        all_s = jnp.transpose(all_s, (1, 0, 2)).reshape(qn, -1)
        all_i = jnp.transpose(all_i, (1, 0, 2)).reshape(qn, -1)
        # Final merge with deterministic tie-breaks: sort by (-score, idx).
        order = jnp.lexsort((all_i, -all_s), axis=1)[:, :k]
        out_s = jnp.take_along_axis(all_s, order, axis=1)
        out_i = jnp.take_along_axis(all_i, order, axis=1)
        return out_s, out_i

    if row_mask is None:
        fn = shard_map(
            lambda db_, qs_: local_scan(db_, qs_, None), mesh=mesh,
            in_specs=(P(axis), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(db, queries)
    fn = shard_map(
        local_scan, mesh=mesh,
        in_specs=(P(axis), P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(db, queries, jnp.asarray(row_mask, jnp.bool_))


def tree_merge_topk(db: jnp.ndarray, queries: jnp.ndarray, k: int,
                    mesh: Mesh, *, ici_axis: str = "chip",
                    dcn_axis: str = "host", impl: str = "auto",
                    n_valid=None, db_scale=None):
    """Two-level top-k over a database row-sharded across BOTH mesh axes.

    The multi-host layout (BASELINE.md config #5): rows shard over
    (host, chip); each chip scans its shard, candidates first merge over
    the fast ICI axis (all_gather within a host's slice), then the much
    smaller per-host winners merge over the DCN axis. Bandwidth over DCN
    is k * hosts candidates instead of k * total_chips — the tree merge
    the reference's single-process design has no analog for
    (SURVEY.md §5.8).
    """
    n, d = db.shape
    n_host = mesh.shape[dcn_axis]
    n_chip = mesh.shape[ici_axis]
    shards = n_host * n_chip
    assert n % shards == 0, (n, shards)
    local_n = n // shards
    int8 = jnp.dtype(db.dtype) == jnp.int8
    use_pallas = impl == "pallas" or (
        impl == "auto" and k <= 128
        and not (int8 and d * 127 * 127 >= 2 ** 24))
    assert not int8 or db_scale is not None
    if n_valid is None:
        n_valid = n

    def local_scan(db_shard, qs):
        host = jax.lax.axis_index(dcn_axis)
        chip = jax.lax.axis_index(ici_axis)
        shard_id = host * n_chip + chip
        local_valid = jnp.clip(jnp.asarray(n_valid) - shard_id * local_n,
                               0, local_n)
        if int8 and use_pallas:
            s, i = cosine_topk_int8_exact(db_shard, db_scale, qs, k,
                                          n_valid=local_valid)
        elif int8:
            # chunked: never dequantizes the whole shard at once
            s, i = cosine_topk_int8_xla(db_shard, db_scale, qs, k,
                                        n_valid=local_valid)
        elif use_pallas:
            s, i = cosine_topk_pallas(db_shard, qs, k, n_valid=local_valid)
        else:
            s, i = cosine_topk_xla(db_shard, qs, k, n_valid=local_valid)
        i = jnp.where(i >= 0, i + shard_id * local_n, i)
        qn = qs.shape[0]

        def merge(all_s, all_i):
            all_s = jnp.transpose(all_s, (1, 0, 2)).reshape(qn, -1)
            all_i = jnp.transpose(all_i, (1, 0, 2)).reshape(qn, -1)
            order = jnp.lexsort((all_i, -all_s), axis=1)[:, :k]
            return (jnp.take_along_axis(all_s, order, axis=1),
                    jnp.take_along_axis(all_i, order, axis=1))

        # level 1: merge across chips of this host (ICI)
        s, i = merge(jax.lax.all_gather(s, ici_axis),
                     jax.lax.all_gather(i, ici_axis))
        # level 2: merge the k-per-host winners across hosts (DCN)
        s, i = merge(jax.lax.all_gather(s, dcn_axis),
                     jax.lax.all_gather(i, dcn_axis))
        return s, i

    fn = shard_map(
        local_scan, mesh=mesh,
        in_specs=(P((dcn_axis, ici_axis)), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(db, queries)


def apply_score_threshold(scores: jnp.ndarray, idx: jnp.ndarray,
                          threshold: float):
    """Invalidate hits below threshold (qdrant `score_threshold` semantics,
    reference core_system.py:659-664: keep score >= threshold).

    Returns (scores, idx, valid_mask); invalid idx slots become -1.
    """
    mask = scores >= threshold
    return scores, jnp.where(mask, idx, -1), mask
