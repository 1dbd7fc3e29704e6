"""Pallas probed-scan kernel for the IVF index (small-Q latency path).

Replaces the XLA probe loop of `store/ivf.py::_ivf_search` — the
retrieval engine the reference delegated to qdrant local mode
(reference core_system.py:659-664) — for single-device serving-size
query batches. The XLA formulation pays a dynamic_slice COPY of every
padded [cmax, d] cluster slice plus a fori_loop dispatch per probe: at
4M x 1024 int8 / nprobe 8 / Q 1 that is ~4-12 ms for ~40 MB of probed
rows — 30x the DMA roofline. This kernel streams ONLY the probed
cluster ranges HBM->VMEM through the exact search kernel's manual DMA
ring (ops/topk.py) and keeps the running top-k in VMEM, so per (query,
probe) the chip moves the cluster bytes exactly once.

Design (mirrors `_topk_stream_kernel`, specialized to probed ranges):

  * flat iteration over (query, probe) pairs; each probe's padded
    range is streamed in `db_tile`-row chunks through an `n_bufs`-deep
    ring with STATIC buffer slots (the chunk loop is fully unrolled and
    `chunks % n_bufs == 0`, so `slot = position % n_bufs` is a Python
    int — a traced slot re-serializes DMA against the matmul, the
    round-2 finding);
  * chunk DMAs start at `offsets[cluster] + chunk*db_tile` — an
    ARBITRARY row offset (cluster boundaries are not tile-aligned);
    HBM refs are linear, and an unaligned-start async_copy measures
    within noise of an aligned one on v5e (scripts/proto_dyn_dma.py);
  * chunks past a cluster's count are skipped (no DMA, staging slice
    filled -inf); the skip condition is read from SMEM scalars, and
    the PREFETCH of a position evaluates the same condition for its
    own position, so every DMA is started exactly once iff it is
    waited exactly once;
  * scores for the chunk are one [qp, db_tile] MXU dot against the
    resident query block; rows of queries other than the probing one
    are masked to -inf (their no-op inserts are free by construction);
  * candidates insert into the per-query sorted top-k state with flat
    index `probe_rank * group_width + column` — ascending in visit
    order, which both preserves `_insert_sorted`'s invariant and
    reproduces the XLA path's (-score, probe-major position) tie
    order bit-for-bit;
  * int8 databases use the exact two-digit query decomposition of
    `cosine_topk_int8_exact` (two s8 MXU passes, s32 accumulation,
    f32 combine, per-query scale applied outside the kernel).

The kernel returns (scores, flat candidate positions); `store/ivf.py`
maps positions back to sorted-matrix rows -> original ids and applies
the spill dedup, identically to the XLA path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .topk import (_INT_MAX, _dot_precision, _insert_sorted,
                   _pad_dim, _round_up)

# queries resident per launch; the wrapper chunks larger batches (the
# XLA path is preferred at large Q anyway — see ivf.py dispatch).
# Shrinks when the staged probe area (qp * group_width) would blow the
# VMEM budget — see _qp_for.
_Q_RESIDENT = 64

# Stay well under the 16 MB/core VMEM: Mosaic needs headroom for
# spills, iotas, and the compiler's own temporaries.
_VMEM_BUDGET = 12 * 2 ** 20


def _ivf_scan_kernel(base_ref, cnt_ref, q_hbm, mat_hbm,
                     scores_out, idx_out,
                     q_vmem, bufs, s_scr, i_scr, col_scr, sp_scr,
                     db_sems, q_sem,
                     *, k: int, kpad: int, db_tile: int, chunks: int,
                     n_bufs: int, nprobe: int, qp: int, n_iter: int,
                     int8_mode: bool, f32_mode: bool):
    gw = chunks * db_tile                       # staged width per probe

    cq = pltpu.make_async_copy(q_hbm, q_vmem, q_sem)
    cq.start()
    cq.wait()
    s_scr[:] = jnp.full_like(s_scr, -jnp.inf)
    i_scr[:] = jnp.full_like(i_scr, -1)
    col_scr[:] = jax.lax.broadcasted_iota(jnp.int32, col_scr.shape, 1)

    def dma(slot, it, c):
        # multiple_of: cluster starts are 8-aligned BY LAYOUT
        # (store/ivf.py::_aligned_layout) and db_tile is a multiple of
        # 8, but Mosaic cannot derive that from a runtime SMEM value —
        # current toolchains refuse any dynamic memref slice whose
        # dim-0 offset is not PROVABLY divisible by the (8, 128)
        # tiling (small matrices get promoted to VMEM where the rule
        # always held; newer compilers enforce it for HBM too).
        start = pl.multiple_of(base_ref[it] + c * db_tile, 8)
        return pltpu.make_async_copy(
            mat_hbm.at[pl.ds(start, db_tile), :],
            bufs.at[slot],
            db_sems.at[slot],
        )

    # Warm the ring: flat positions 0 .. n_bufs-2 all live in iteration
    # 0 (chunks >= n_bufs), each started iff its chunk is within count.
    for t in range(n_bufs - 1):
        @pl.when((0 < n_iter) & (t * db_tile < cnt_ref[0]))
        def _():
            dma(t % n_bufs, 0, t).start()

    def probe_step(it, _):
        q_idx = it // nprobe
        p_idx = it % nprobe
        cnt = cnt_ref[it]

        for c in range(chunks):                 # static unroll
            slot = c % n_bufs                   # static: chunks % n_bufs == 0
            # prefetch flat position + (n_bufs - 1); it lands either in
            # this iteration (static chunk tc) or the next (tc - chunks)
            tc = c + n_bufs - 1
            nxt = 1 if tc >= chunks else 0      # static
            t_c = tc - chunks if tc >= chunks else tc
            pit = it + nxt

            @pl.when((pit < n_iter) & (t_c * db_tile < cnt_ref[pit]))
            def _():
                dma((slot + n_bufs - 1) % n_bufs, pit, t_c).start()

            valid = c * db_tile < cnt

            @pl.when(valid)
            def _():
                dma(slot, it, c).wait()
                if int8_mode:
                    dims = (((1,), (1,)), ((), ()))
                    s_hi = jax.lax.dot_general(
                        q_vmem[0], bufs[slot], dims,
                        preferred_element_type=jnp.int32)
                    s_lo = jax.lax.dot_general(
                        q_vmem[1], bufs[slot], dims,
                        preferred_element_type=jnp.int32)
                    # unscaled two-digit combine: per-query positive
                    # scaling (applied outside) keeps the order
                    s = (s_hi.astype(jnp.float32) * 254.0
                         + s_lo.astype(jnp.float32))
                else:
                    s = jax.lax.dot_general(
                        q_vmem[:], bufs[slot],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        # the one per-dtype precision definition: f32
                        # needs HIGHEST or Mosaic runs one bf16 pass
                        precision=_dot_precision(
                            jnp.float32 if f32_mode else jnp.bfloat16))
                # only the probing query's row is real; other rows and
                # columns beyond the cluster count mask to -inf
                row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where((row == q_idx) & (col + c * db_tile < cnt),
                              s, -jnp.inf)
                sp_scr[:, c * db_tile:(c + 1) * db_tile] = s

            # -inf fill for the skipped tail, only when this probe
            # stages anything at all: an empty probe (a PAD query, or
            # a pad row of the flat tables) skips staging AND
            # extraction entirely, so its stale buffer is never read
            @pl.when((cnt > 0) & jnp.logical_not(valid))
            def _():
                sp_scr[:, c * db_tile:(c + 1) * db_tile] = jnp.full(
                    (qp, db_tile), -jnp.inf, jnp.float32)

        # ---- drain the staged probe into the top-k state ------------
        # (the exact kernel's grouped extraction, q_tile == qp, one
        # group per probe; see ops/topk.py for the event accounting)
        @pl.when(cnt > 0)
        def _extract():
            _extract_probe(p_idx)
        return 0

    def _extract_probe(p_idx):
        gbase = p_idx * gw
        sp = sp_scr[:]
        m0 = jnp.max(sp, axis=1, keepdims=True)
        kth0 = s_scr[:, k - 1:k]

        @pl.when(jnp.any(m0 > kth0))
        def _():
            imp = m0 > kth0
            sel = jnp.min(jnp.where(sp == m0, col_scr[:], _INT_MAX),
                          axis=1, keepdims=True)
            cand_m = jnp.where(imp, m0, -jnp.inf)
            new_S, new_I = _insert_sorted(s_scr[:], i_scr[:], cand_m,
                                          sel + gbase)
            s_scr[:] = new_S
            i_scr[:] = new_I
            count = jnp.sum((sp > kth0).astype(jnp.int32), axis=1,
                            keepdims=True)

            @pl.when(jnp.any(count > 1))
            def _():
                sp_scr[:] = jnp.where(
                    (sp == m0) & (col_scr[:] == sel) & imp, -jnp.inf, sp)
                m1 = jnp.max(sp_scr[:], axis=1, keepdims=True)

                def cond(carry):
                    m, kth = carry
                    return jnp.any(m > kth)

                def extract(carry):
                    m, _ = carry
                    s_cur = sp_scr[:]
                    imp = m > s_scr[:, k - 1:k]
                    sel = jnp.min(
                        jnp.where(s_cur == m, col_scr[:], _INT_MAX),
                        axis=1, keepdims=True)
                    cand_m = jnp.where(imp, m, -jnp.inf)
                    new_S, new_I = _insert_sorted(
                        s_scr[:], i_scr[:], cand_m, sel + gbase)
                    s_scr[:] = new_S
                    i_scr[:] = new_I
                    s_next = jnp.where((col_scr[:] == sel) & imp,
                                       -jnp.inf, s_cur)
                    sp_scr[:] = s_next
                    return (jnp.max(s_next, axis=1, keepdims=True),
                            s_scr[:, k - 1:k])

                jax.lax.while_loop(cond, extract, (m1, s_scr[:, k - 1:k]))

    jax.lax.fori_loop(0, n_iter, probe_step, 0)
    scores_out[:] = s_scr[:]
    idx_out[:] = i_scr[:]


@functools.partial(jax.jit, static_argnames=(
    "k", "kpad", "db_tile", "chunks", "n_bufs", "nprobe", "qp",
    "int8_mode", "f32_mode", "interpret"))
def _ivf_scan_jit(mat, queries, qdig, base, cnt, *, k: int, kpad: int,
                  db_tile: int, chunks: int, n_bufs: int, nprobe: int,
                  qp: int, int8_mode: bool, f32_mode: bool,
                  interpret: bool):
    """Jit-cached pallas_call wrapper. Returns (scores [qp, kpad] f32 —
    unscaled in int8 mode — and flat candidate positions [qp, kpad]
    int32: probe_rank * chunks * db_tile + within, or -1)."""
    d = mat.shape[1]
    n_iter = qp * nprobe
    # flat (q-major) probe tables; one pad entry so the steady-state
    # prefetch may read index n_iter
    base_f = jnp.concatenate([base.reshape(-1),
                              jnp.zeros((1,), jnp.int32)])
    cnt_f = jnp.concatenate([cnt.reshape(-1),
                             jnp.zeros((1,), jnp.int32)])
    qs = qdig if int8_mode else queries

    kernel = functools.partial(
        _ivf_scan_kernel, k=k, kpad=kpad, db_tile=db_tile, chunks=chunks,
        n_bufs=n_bufs, nprobe=nprobe, qp=qp, n_iter=n_iter,
        int8_mode=int8_mode, f32_mode=f32_mode)
    gw = chunks * db_tile

    scores, idx = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp, kpad), jnp.float32),
            jax.ShapeDtypeStruct((qp, kpad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM(((2, qp, d) if int8_mode else (qp, d)), mat.dtype),
            pltpu.VMEM((n_bufs, db_tile, d), mat.dtype),
            pltpu.VMEM((qp, kpad), jnp.float32),
            pltpu.VMEM((qp, kpad), jnp.int32),
            pltpu.VMEM((qp, gw), jnp.int32),
            pltpu.VMEM((qp, gw), jnp.float32),
            pltpu.SemaphoreType.DMA((n_bufs,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * n_iter * gw * d,
            bytes_accessed=n_iter * gw * d * mat.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(base_f, cnt_f, qs, mat)
    idx = jnp.where(jnp.isneginf(scores), -1, idx)
    return scores, idx


def ivf_probe_scan(mat, queries, qdig, row_scale, base, cnt, *,
                   k: int, nprobe: int, cmax_pad: int,
                   int8: bool, interpret=None):
    """Probed-scan top-k: candidates limited to each query's probed
    cluster ranges, ordered by (-score, probe-major position) — the
    contract of `_ivf_search`'s scores_all top_k.

    mat       [M + cmax_pad, d]  cluster-sorted rows (+ zero pad tail)
    queries   [Q, d]   storage dtype (bf16/f32 path)
    qdig      [2, Q, d] int8 query digits (int8 path)
    row_scale [Q, 1]   f32 per-query score scale (int8 path; 1.0 else)
    base/cnt  [Q, nprobe] int32 cluster start rows / counts
    Returns (scores [Q, k] f32, flat [Q, k] int32) with
    flat = probe_rank * group_width + within (or -1); group_width is
    returned... no — flat // gw = probe rank, flat % gw = within; the
    caller recovers gw via `probe_group_width(cmax_pad)`.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    qn, d = queries.shape
    itemsize = jnp.dtype(mat.dtype).itemsize
    if d % 128 != 0:
        raise ValueError(f"kernel needs d % 128 == 0, got {d}")
    if k > 128:
        # same bound as cosine_topk_pallas: the sorted top-k state is
        # VMEM-resident and k-wide per query. Spill dedup doubles the
        # fetch, so k=65..128 + spill already exceeds this.
        raise ValueError(
            f"ivf_probe_scan supports k <= 128 (got k={k}, possibly "
            f"2x from spill overfetch); use the XLA path (impl='xla')")
    db_tile, chunks, n_bufs = _probe_tiling(cmax_pad, d, itemsize)
    kpad = _round_up(max(k, 8), 8)
    qp_cap = _qp_for(db_tile, chunks, n_bufs, d, itemsize, kpad, int8)
    if qp_cap < 8:
        raise ValueError(
            f"probed-cluster width cmax_pad={cmax_pad} at d={d} "
            f"exceeds the kernel VMEM budget even at an 8-query block; "
            f"use the XLA path (impl='xla') or build with balance= to "
            f"cap cluster sizes")
    qp = _round_up(min(qn, qp_cap), 8)
    f32_mode = jnp.dtype(mat.dtype) == jnp.float32

    outs = []
    for lo in range(0, qn, qp):
        hi = min(lo + qp, qn)
        q_c = _pad_dim(queries[lo:hi], 0, qp)
        qd_c = jnp.zeros((2, qp, d), jnp.int8)
        if int8:
            qd_c = _pad_dim(qdig[:, lo:hi], 1, qp)
        b_c = _pad_dim(base[lo:hi], 0, qp)
        c_c = _pad_dim(cnt[lo:hi], 0, qp)   # pad queries: cnt 0 -> skipped
        s, f = _ivf_scan_jit(mat, q_c, qd_c, b_c, c_c, k=k, kpad=kpad,
                             db_tile=db_tile, chunks=chunks,
                             n_bufs=n_bufs, nprobe=nprobe, qp=qp,
                             int8_mode=int8, f32_mode=f32_mode,
                             interpret=interpret)
        outs.append((s[:hi - lo, :k], f[:hi - lo, :k]))
    scores = jnp.concatenate([s for s, _ in outs], axis=0)
    flat = jnp.concatenate([f for _, f in outs], axis=0)
    if int8:
        scores = jnp.where(jnp.isneginf(scores), scores,
                           scores * row_scale)
    return scores, flat


def probe_group_width(cmax_pad: int, d: int, itemsize: int) -> int:
    """Width of one staged probe group (flat index stride per probe)."""
    db_tile, chunks, _ = _probe_tiling(cmax_pad, d, itemsize)
    return chunks * db_tile


def _probe_tiling(cmax_pad: int, d: int, itemsize: int):
    """(db_tile, chunks, n_bufs) for a padded cluster width.

    chunks is rounded up to a multiple of n_bufs so ring slots stay
    static; trailing chunks are always skipped (their start is past
    every cluster's count). Reads stay in bounds: a started chunk has
    c*db_tile < cnt <= cmax <= cmax_pad, so the last byte read is
    before base + cnt + db_tile <= M + cmax_pad (the matrix carries
    cmax_pad zero pad rows, ivf.py's layout invariant).

    Deliberately independent of the query block size: the flat-index
    stride gw = chunks * db_tile is part of the output contract
    (`probe_group_width`), so it must be a pure function of
    (cmax_pad, d, itemsize). Shrinking db_tile only bounds the DMA
    RING; the staged probe area (>= cmax_pad per query) is bounded by
    shrinking the query block instead (`_qp_for`)."""
    n_bufs = 4 if itemsize <= 2 else 2
    db_tile = min(512, _round_up(cmax_pad, 8))
    chunks = _round_up(-(-cmax_pad // db_tile), n_bufs)
    while n_bufs * db_tile * d * itemsize > 4 * 2 ** 20 and db_tile > 128:
        db_tile //= 2
        chunks = _round_up(-(-cmax_pad // db_tile), n_bufs)
    return db_tile, chunks, n_bufs


def _qp_for(db_tile: int, chunks: int, n_bufs: int, d: int,
            itemsize: int, kpad: int, int8: bool) -> int:
    """Largest query-block size (multiple of 8, <= _Q_RESIDENT) whose
    scratches fit the VMEM budget; < 8 means the kernel cannot run at
    this cluster width at all. Per-query bytes: the staged probe area
    sp_scr+col_scr (gw * 8 — the term that is UNBOUNDED in cmax_pad
    and cannot be reduced by tiling), top-k state + outputs
    (2 * kpad * 8), and the resident query block."""
    gw = chunks * db_tile
    ring = n_bufs * db_tile * d * itemsize
    per_q = gw * 8 + 2 * kpad * 8 + (2 * d if int8 else d) * itemsize
    qp = (_VMEM_BUDGET - ring) // per_q if ring < _VMEM_BUDGET else 0
    return min(_Q_RESIDENT, (qp // 8) * 8)


def ivf_scan_supported(cmax_pad: int, d: int, itemsize: int,
                       k: int) -> bool:
    """True iff `ivf_probe_scan` can run this configuration: used by
    the `impl="auto"` dispatch (store/ivf.py) so unbalanced or very
    wide indexes fall back to the XLA probe loop instead of failing a
    Mosaic VMEM allocation at serve time."""
    if d % 128 != 0 or k > 128:
        return False
    db_tile, chunks, n_bufs = _probe_tiling(cmax_pad, d, itemsize)
    kpad = _round_up(max(k, 8), 8)
    return _qp_for(db_tile, chunks, n_bufs, d, itemsize, kpad,
                   int8=True) >= 8

