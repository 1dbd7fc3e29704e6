"""IVF (inverted-file) approximate search: k-means coarse quantizer.

The stretch config beyond the reference (BASELINE.md config #5: 100M
vectors on a multi-host slice) needs sublinear scan cost. Design:

  * k-means trains on device (Lloyd iterations: assignment is one
    matmul + argmax on the MXU, centroid update is a one-hot matmul);
  * database rows are stored sorted by cluster, so each cluster is one
    contiguous range — probing a cluster is a dynamic-slice matmul, not
    a scatter/gather of irregular rows (TPU-friendly, fully static
    shapes with per-cluster padding to the max cluster size);
  * a query batch scores `nprobe` clusters each: [Q, nprobe * Cmax]
    candidate scores -> lax.top_k -> map back to original row ids;
  * exact within probed clusters: recall loss comes only from probe
    misses, so nprobe == n_clusters reproduces the exact scan;
  * optional spilled assignments (`spill=f`, SOAR/replication-lite):
    the f fraction of rows with the smallest top-1/top-2 centroid
    margin get a second copy in their runner-up cluster, so boundary
    rows — the dominant probe-miss victims — are found from either
    side. Search fetches top-2k candidates and dedups by original id
    (keep-first, preserving the exact (-score, position) tie order),
    at ~f extra storage and the same probe shape;
  * optional capacity balancing (`balance=f`, f >= 1.0): clusters over
    ceil(f * n / clusters) rows are recursively SPLIT into child
    centroids trained on their own members (`_split_oversized`). The
    probed scan reads a padded [cmax, d] slice per (query, probe), so
    one skewed cluster taxes every probe — real corpora are lognormal-
    skewed (cmax 3.5x mean at 4M rows), and capping cmax bounds the
    per-probe DMA while keeping probes spatially selective (a finer
    quantizer exactly where data is dense). The cap is HARD: clusters
    spatial splitting cannot break (uneven k-means children, point
    masses of identical rows) fall back to even slices sharing the
    parent's exact centroid, which tie in ranking and get probed
    together. With spill active too, spilled copies respect the cap
    (a runner-up cluster at capacity declines copies, most-boundary
    rows admitted first) so the layout bound stays exact.

Multi-host scale-out (BASELINE.md config #5, exercised on the virtual
mesh by tests/test_ivf.py): pass `mesh=` — the cluster-sorted matrix is
row-sharded over the mesh axis with per-shard cluster-intersection
tables (each cluster's contiguous range clipped to the shard's rows),
every shard runs the same probe scan on its intersections and returns a
local top-k, and shard candidates merge with one all_gather + a
(-score, probe-position) lexsort, reproducing the single-device IVF
ordering exactly (the same merge family as `sharded_cosine_topk`).
"""
from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.topk import _round_up, _dot_precision


def _assign_all(rows_at, n: int, cent_d, want_spill: bool,
                chunk: int = 262144):
    """Assign every row to its nearest centroid, chunked.

    `rows_at(lo, hi)` returns rows [lo:hi] as a jnp array in the
    centroid dtype — a host slice staged to device (host build) or a
    device slice (from_device build); either way only the [chunk, C]
    score block and the O(chunk) results cross back to host. With
    `want_spill`, also records each row's runner-up cluster and
    top-1/top-2 margin."""
    assign = np.empty(n, np.int32)
    second = np.empty(n, np.int32) if want_spill else None
    margin = np.empty(n, np.float32) if want_spill else None
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        s = jax.lax.dot_general(
            rows_at(lo, hi), cent_d, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if want_spill:
            top2_s, top2_i = jax.lax.top_k(s, 2)
            top2_s, top2_i = np.asarray(top2_s), np.asarray(top2_i)
            assign[lo:hi] = top2_i[:, 0]
            second[lo:hi] = top2_i[:, 1]
            margin[lo:hi] = top2_s[:, 0] - top2_s[:, 1]
        else:
            assign[lo:hi] = np.asarray(jnp.argmax(s, axis=1))
    return assign, second, margin


def _split_oversized(take, n: int, assign, cent, cap: int, seed: int,
                     *, iters: int = 5, sub_sample: int = 16384,
                     max_rounds: int = 4, chunk: int = 262144,
                     max_children: int = 16):
    """Spatially split clusters over `cap` rows via recursive k-means.

    TPU-native rationale: the probed scan reads a PADDED [cmax, d]
    slice per (query, probe), so ONE skewed cluster taxes EVERY probe —
    at 4M rows / 1024 clusters the lognormal skew made cmax 3.5x the
    mean, i.e. 3.5x the DMA per probe. Moving boundary rows to their
    runner-up cluster cannot fix real skew (receivers fill instantly —
    it is a flow problem); splitting the heavy cluster into
    ceil(count/cap) children with their OWN trained centroids bounds
    cmax while keeping probes spatially selective (a finer quantizer
    exactly where the data is dense — what a hierarchical IVF does).

    `take(idx)` returns the given rows as a device array in centroid
    dtype (host slice or device gather — only O(cluster) data moves).
    Child 0 reuses the parent's centroid slot (so existing runner-up
    ids stay meaningful); children 1.. append to the table.
    Deterministic given `seed`: every draw comes from
    default_rng((seed, round, cluster)).

    Shape discipline: EVERY device call is bucketed to a power of two
    — training-sample rows, child count, and re-assign chunk rows all
    wrap-pad (np.resize) up — so the whole split pass reuses a
    handful of compiled shapes. The first cut of this loop used raw
    per-cluster shapes: ~300 oversized clusters x fresh
    gather/dot/k-means compiles turned a 27 s device-resident 4M
    build into 31 minutes through the remote-TPU tunnel (measured
    round 3). Wrap-pad duplicates are harmless: a duplicated row
    scores identically, and the original slot's write wins.
    Returns (assign, cent) with cent as a host f32 array.
    """
    cent = np.asarray(cent, np.float32).copy()
    assign = assign.copy()
    for rnd in range(max_rounds):
        counts = np.bincount(assign, minlength=len(cent))
        over = np.nonzero(counts > cap)[0]
        if len(over) == 0:
            break
        appended = []
        total = len(cent)
        for c in over:
            rows = np.nonzero(assign == c)[0]
            k_real = min(int(np.ceil(len(rows) / cap)), max_children)
            # pow2 child count (>= the needed split factor): bounds the
            # distinct (bucket, K) k-means shapes to ~4 per sample size
            k_child = 1 << int(np.ceil(np.log2(max(k_real, 2))))
            rng = np.random.default_rng((seed, rnd, int(c)))
            samp = (rng.choice(rows, sub_sample, replace=False)
                    if len(rows) > sub_sample else rows)
            bucket = 1 << int(np.ceil(np.log2(max(len(samp), k_child))))
            samp = np.resize(samp, bucket)         # wrap-pad: unbiased
            sample_d = take(samp)
            init = jnp.asarray(rng.choice(bucket, k_child, replace=False))
            child, _ = _kmeans_fit(sample_d, init, n_clusters=k_child,
                                   iters=iters)
            child = np.asarray(child, np.float32)
            # child 0 reuses the parent slot; children 1.. append
            ids = np.concatenate(
                [[c], total + np.arange(k_child - 1)]).astype(np.int32)
            total += k_child - 1
            cent[c] = child[0]
            appended.append(child[1:])
            # re-assign the cluster's rows to the children, in pow2-
            # bucketed chunks
            child_d = jnp.asarray(child, sample_d.dtype)
            blen = min(1 << int(np.ceil(np.log2(len(rows)))), chunk)
            for lo in range(0, len(rows), blen):
                sub = rows[lo:lo + blen]
                s = jax.lax.dot_general(
                    take(np.resize(sub, blen)), child_d,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                am = np.asarray(jnp.argmax(s, axis=1))
                assign[sub] = ids[am[:len(sub)]]
        cent = np.concatenate([cent] + appended)

    # Residual even split: spatial k-means cannot always reach the cap
    # (uneven children within max_rounds; a point mass of identical
    # rows is UNSPLITTABLE spatially — every round routes it whole).
    # Clusters still over cap are sliced evenly into children that
    # share the parent's EXACT centroid vector: the children tie in
    # centroid ranking, so a query that would probe the parent probes
    # the siblings at adjacent ranks (recall preserved at the cost of
    # probe slots), and the cap becomes hard — the probed scan's
    # per-probe DMA bound is a layout guarantee, not a heuristic.
    counts = np.bincount(assign, minlength=len(cent))
    over = np.nonzero(counts > cap)[0]
    if len(over):
        appended = []
        total = len(cent)
        for c in over:
            rows = np.nonzero(assign == c)[0]
            k_res = int(np.ceil(len(rows) / cap))
            ids = np.concatenate(
                [[c], total + np.arange(k_res - 1)]).astype(np.int32)
            total += k_res - 1
            appended.append(np.repeat(cent[c][None], k_res - 1, axis=0))
            # deterministic balanced contiguous slices (rows ascend by
            # original id), each of size <= ceil(len/k_res) <= cap
            assign[rows] = ids[np.arange(len(rows)) * k_res // len(rows)]
        cent = np.concatenate([cent] + appended)
    return assign, cent


def _plan_entries(n: int, n_clusters: int, assign, second, margin,
                  spill: float, cap: Optional[int] = None):
    """Entry table from assignments: spilled copies (SOAR-lite — the
    `spill` fraction of rows closest to their runner-up centroid get a
    second copy there), then the cluster-sorted order + per-cluster
    counts. Pure O(N) host math shared by every build path.

    With `cap` (the balance cap `_split_oversized` just enforced on
    base assignments), spill copies must not re-inflate a cluster past
    it — otherwise a popular runner-up cluster grows cmax unbounded
    and every probe's padded [cmax, d] DMA pays for it, defeating the
    hard-cap layout guarantee. Copies are admitted per runner-up
    cluster up to its remaining room, most-boundary rows (smallest
    margin) first; the overflow is simply not spilled (those rows keep
    their primary copy — recall falls back to the unspilled level for
    them, the layout bound stays exact)."""
    entry_id = np.arange(n, dtype=np.int64)
    entry_cl = assign
    n_spill = 0
    if spill > 0.0 and second is not None:
        extra = np.nonzero(margin <= np.quantile(margin, spill))[0]
        if cap is not None and len(extra):
            room = cap - np.bincount(assign, minlength=n_clusters)
            # admit by ascending margin (deterministic tiebreak: row id
            # — np.lexsort's last key is primary)
            by_margin = extra[np.lexsort((extra, margin[extra]))]
            tgt = second[by_margin]
            by_tgt = np.argsort(tgt, kind="stable")
            tgt_s = tgt[by_tgt]
            first = np.searchsorted(tgt_s, np.arange(n_clusters))
            rank = np.arange(len(tgt_s)) - first[tgt_s]
            keep_s = rank < np.maximum(room[tgt_s], 0)
            keep = np.zeros(len(by_margin), bool)
            keep[by_tgt] = keep_s
            extra = np.sort(by_margin[keep])   # row-id entry order
        n_spill = len(extra)
        entry_id = np.concatenate([entry_id, extra])
        entry_cl = np.concatenate([assign, second[extra]])
    order = entry_id[np.argsort(entry_cl, kind="stable")]
    counts = np.bincount(entry_cl, minlength=n_clusters)
    return order, counts, n_spill


def _aligned_layout(counts):
    """Cluster-aligned matrix layout: every cluster starts at a
    multiple of 8 rows. Mosaic will only compile a dynamic-offset HBM
    slice when the runtime start is PROVABLY divisible by the sublane
    tiling (8) — the probed-scan kernel slices
    `mat[base + c*db_tile :][:db_tile]` with base read from SMEM
    (ops/ivf_scan.py), so unaligned cluster starts fail the whole
    Pallas IVF path at compile time (current toolchains enforce this;
    the prototype measurements predate that). Gap rows (<= 7 per
    cluster) are zero, carry row_id -1, and sit past each cluster's
    count, so every scan masks them exactly like beyond-count pad
    columns.

    Returns (dest [sum(counts)] int64 — layout position of each entry
    of the compact cluster-grouped order —, starts [C] int64 aligned
    cluster starts, m_lay total layout rows)."""
    counts = np.asarray(counts, np.int64)
    spans = (counts + 7) // 8 * 8
    starts = np.zeros(len(counts), np.int64)
    if len(counts) > 1:
        np.cumsum(spans[:-1], out=starts[1:])
    m_lay = int(spans.sum())
    begins = np.cumsum(counts) - counts
    total = int(counts.sum())
    within = np.arange(total, dtype=np.int64) - np.repeat(begins, counts)
    dest = np.repeat(starts, counts) + within
    return dest, starts, m_lay


def _shard_tables(offsets, counts, n_entries: int, n_shards: int,
                  local_n: int):
    """Per-shard cluster-intersection tables: each cluster's contiguous
    global range clipped to shard p's window [p*local_n, (p+1)*local_n)."""
    ends = offsets + counts
    loc_off = np.zeros((n_shards, len(offsets)), np.int32)
    loc_cnt = np.zeros((n_shards, len(offsets)), np.int32)
    for p in range(n_shards):
        r0 = p * local_n
        r1 = max(r0, min((p + 1) * local_n, n_entries))
        lo = np.clip(offsets, r0, r1)
        hi = np.clip(ends, r0, r1)
        loc_off[p] = lo - r0
        loc_cnt[p] = hi - lo
    return loc_off, loc_cnt


@functools.partial(jax.jit, static_argnames=("n_clusters", "iters"))
def _kmeans_fit(data: jnp.ndarray, init_idx: jnp.ndarray, *,
                n_clusters: int, iters: int):
    """Spherical k-means (cosine): centroids stay L2-normalized."""
    cent = data[init_idx]                                   # [C, d]

    def step(cent, _):
        scores = jax.lax.dot_general(
            data, cent, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(data.dtype))           # [N, C]
        assign = jnp.argmax(scores, axis=1)
        onehot = jax.nn.one_hot(assign, n_clusters, dtype=jnp.float32)
        sums = jnp.einsum("nc,nd->cd", onehot,
                          data.astype(jnp.float32))
        norms = jnp.linalg.norm(sums, axis=1, keepdims=True)
        new = jnp.where(norms > 1e-6, sums / jnp.maximum(norms, 1e-6),
                        cent.astype(jnp.float32))
        return new.astype(data.dtype), None

    cent, _ = jax.lax.scan(step, cent, None, length=iters)
    scores = jax.lax.dot_general(
        data, cent, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(data.dtype))
    return cent, jnp.argmax(scores, axis=1)


@functools.partial(jax.jit, static_argnames=("int8", "out_dtype"))
def _gather_cluster_sorted(emb, ord_chunks, inv_scale, *, int8: bool,
                           out_dtype: str):
    """Device gather of `emb` rows into cluster-sorted order, one
    chunk of indices at a time (lax.map fills one output buffer
    progressively — peak HBM is the OUTPUT in its storage dtype plus a
    single [chunk, d] f32 intermediate, never a full f32 copy). Pad
    indices must be >= len(emb): gather mode "fill" zero-fills those
    (negative indices wrap — do not use -1). In int8 mode rows are
    globally-symmetric quantized by MULTIPLYING with the host-computed
    `inv_scale` (= 127/amax): f32 multiply is correctly rounded on the
    TPU VPU, whereas f32 division lowers to reciprocal+Newton and can
    land 1 ulp off IEEE — `round(x / s)` then crosses halfway points
    differently from the numpy host path (measured: 0.02% of elements
    at 20k x 512). Multiply matches the host bit-for-bit."""
    d = emb.shape[1]

    def one(idx):
        rows = jnp.take(emb, idx, axis=0, mode="fill",
                        fill_value=0).astype(jnp.float32)
        if int8:
            return jnp.clip(jnp.round(rows * inv_scale), -127,
                            127).astype(jnp.int8)
        return rows.astype(out_dtype)

    return jax.lax.map(one, ord_chunks).reshape(-1, d)


class IVFIndex:
    """Approximate cosine top-k over cluster-sorted rows."""

    def __init__(self, vectors: np.ndarray, *, n_clusters: int = 256,
                 train_iters: int = 10, train_sample: int = 131072,
                 dtype: str = "bfloat16", seed: int = 0, spill: float = 0.0,
                 balance: float = 0.0, mesh=None, axis: str = "data",
                 _precomputed=None):
        n, d = vectors.shape
        if n == 0:
            raise ValueError("empty index")
        if not 0.0 <= spill <= 1.0:
            raise ValueError(f"spill must be in [0, 1], got {spill}")
        if balance and balance < 1.0:
            raise ValueError(f"balance must be 0 or >= 1.0, got {balance}")
        n_clusters = min(n_clusters, n)
        rng = np.random.default_rng(seed)
        # int8 storage (2x capacity — the 100M stretch config stacks
        # IVF x int8): the cluster-sorted matrix is globally-symmetric
        # quantized (`quantize_db_int8`) and probed clusters are scanned
        # with the same two-digit int8 query decomposition as
        # `cosine_topk_int8_exact` — exact f32 scores w.r.t. the stored
        # int8 rows, ~15-bit query precision. k-means training and
        # centroid scoring stay bf16 (they only pick probe targets).
        self._int8 = jnp.dtype(dtype) == jnp.int8
        self._dtype = jnp.bfloat16 if self._int8 else jnp.dtype(dtype)
        self.db_scale = None
        if self._int8 and d * 127 * 127 >= 2 ** 24:
            raise ValueError(
                f"int8 IVF requires d <= 1040 for exact f32 partials "
                f"(got d={d})")

        vec32 = np.ascontiguousarray(vectors, np.float32)
        if _precomputed is not None:
            # cache hit (`load_cache`): skip k-means + full assignment —
            # the expensive, nondeterministic-duration part of a build
            cent_np, order, counts, n_spill = _precomputed
            cent_d = jnp.asarray(cent_np, self._dtype)
            order = np.asarray(order, np.int64)
            counts = np.asarray(counts)
        else:
            sample_idx = (rng.choice(n, min(train_sample, n), replace=False)
                          if n > train_sample else np.arange(n))
            sample = jnp.asarray(vec32[sample_idx], self._dtype)
            init = jnp.asarray(rng.choice(len(sample_idx), n_clusters,
                                          replace=False))
            cent, _ = _kmeans_fit(sample, init, n_clusters=n_clusters,
                                  iters=train_iters)

            # assign all rows (chunked); with spill also record each
            # row's runner-up cluster + assignment margin
            cent_d = cent
            want_spill = spill > 0.0 and n_clusters > 1
            assign, second, margin = _assign_all(
                lambda lo, hi: jnp.asarray(vec32[lo:hi], self._dtype),
                n, cent_d, want_spill)
            cap = None
            if balance > 0.0 and n_clusters > 1:
                # cap from the TRAINED granularity; splitting may then
                # grow n_clusters (children of oversized clusters)
                cap = int(np.ceil(balance * n / n_clusters))
                assign, cent_np = _split_oversized(
                    lambda idx: jnp.asarray(vec32[idx], self._dtype),
                    n, assign, cent, cap, seed)
                n_clusters = len(cent_np)
                cent_d = jnp.asarray(cent_np, self._dtype)
            order, counts, n_spill = _plan_entries(
                n, n_clusters, assign, second, margin, spill, cap)
        dest, starts, m_lay = _aligned_layout(counts)
        offsets = starts
        self.cmax = int(counts.max())
        cmax_pad = _round_up(max(self.cmax, 8), 8)

        m = m_lay                  # layout rows (entries + align gaps)
        self.n = n
        self.m = m
        self.n_entries = len(order)    # real entries (n + spilled copies)
        self.n_spill = int(n_spill)
        self.dim = d
        self.n_clusters = n_clusters
        self.centroids = cent_d
        row_ids = np.full(m_lay, -1, np.int64)
        row_ids[dest] = order                      # gaps stay -1
        self.row_ids = jnp.asarray(row_ids.astype(np.int32))
        self.offsets = jnp.asarray(offsets.astype(np.int32))
        self.counts = jnp.asarray(counts.astype(np.int32))
        self._cmax_pad = cmax_pad
        # sorted matrix, padded with an extra cmax_pad zero rows so
        # dynamic slices near the end never clamp into valid data
        sorted_m = np.zeros((m + cmax_pad, d), np.float32)
        sorted_m[dest] = vec32[order]
        self.mesh = mesh
        self.axis = axis
        if self._int8:
            # quantize ONCE on the full sorted matrix (a single global
            # scale keeps shard merges and the exactness contract
            # consistent); zero pad rows quantize to zero. Host-side
            # numpy mirror of `quantize_db_int8` (same f32 math): at
            # 100M rows the device round-trip would move 3x the full
            # matrix through host<->HBM just to round it.
            amax = np.float32(max(np.abs(sorted_m).max(),
                                  np.float32(1e-30)))
            self.db_scale = float(amax / np.float32(127.0))
            inv = np.float32(127.0) / amax
            sorted_m = np.clip(np.round(sorted_m * inv), -127,
                               127).astype(np.int8)
        if mesh is None:
            self.matrix = (jnp.asarray(sorted_m) if self._int8
                           else jnp.asarray(sorted_m, self._dtype))
        else:
            self._build_shards(sorted_m[:m], offsets, counts, mesh, axis)

    # -- device-resident build ------------------------------------------

    @classmethod
    def from_device(cls, emb, *, n_clusters: int = 256,
                    train_iters: int = 10, train_sample: int = 131072,
                    dtype: str = "bfloat16", seed: int = 0,
                    spill: float = 0.0, balance: float = 0.0, mesh=None,
                    axis: str = "data", _precomputed=None):
        """Build the index from a DEVICE-resident embedding matrix.

        Every O(N*d) step runs on device: the k-means sample gather,
        the full assignment matmuls, the cluster-sort row gather, and
        the int8 quantization. Only the O(N) entry tables (assignments,
        sort order, counts) cross to host. This is the build path when
        embeddings are already in HBM (ingest just embedded them, or a
        DeviceIndex is being converted) — the host-array `__init__`
        round-trips the full matrix through host RAM, which at 100M
        rows costs more wall-clock in memcpy than the k-means itself.

        Given the same values (e.g. `emb` is the f32 store matrix put
        on device) and the same seed, this produces bit-identical
        centroids, order, and search results to the host build: the
        same `_kmeans_fit`/`_assign_all`/`_plan_entries` math runs on
        the same backend either way. When `emb` is bf16, quantization
        and scoring see the bf16 values — the stored-row exactness
        contract is unchanged (scores are exact w.r.t. what's stored).

        With `mesh=`, the cluster-sorted rows are gathered directly
        into the sharded [n_shards, local_n + pad, d] layout on device
        and placed with a row sharding — no host-side shard assembly.
        """
        emb = jnp.asarray(emb)
        n, d = emb.shape
        if n == 0:
            raise ValueError("empty index")
        if not 0.0 <= spill <= 1.0:
            raise ValueError(f"spill must be in [0, 1], got {spill}")
        if balance and balance < 1.0:
            raise ValueError(f"balance must be 0 or >= 1.0, got {balance}")
        n_clusters = min(n_clusters, n)
        rng = np.random.default_rng(seed)
        self = object.__new__(cls)
        self._int8 = jnp.dtype(dtype) == jnp.int8
        self._dtype = jnp.bfloat16 if self._int8 else jnp.dtype(dtype)
        self.db_scale = None
        if self._int8 and d * 127 * 127 >= 2 ** 24:
            raise ValueError(
                f"int8 IVF requires d <= 1040 for exact f32 partials "
                f"(got d={d})")

        if _precomputed is not None:
            cent_np, order, counts, n_spill = _precomputed
            cent_d = jnp.asarray(cent_np, self._dtype)
            order = np.asarray(order, np.int64)
            counts = np.asarray(counts)
        else:
            sample_idx = (rng.choice(n, min(train_sample, n),
                                     replace=False)
                          if n > train_sample else np.arange(n))
            sample = jnp.take(emb, jnp.asarray(sample_idx, jnp.int32),
                              axis=0).astype(self._dtype)
            init = jnp.asarray(rng.choice(len(sample_idx), n_clusters,
                                          replace=False))
            cent_d, _ = _kmeans_fit(sample, init, n_clusters=n_clusters,
                                    iters=train_iters)
            want_spill = spill > 0.0 and n_clusters > 1
            assign, second, margin = _assign_all(
                lambda lo, hi: emb[lo:hi].astype(self._dtype),
                n, cent_d, want_spill)
            cap = None
            if balance > 0.0 and n_clusters > 1:
                cap = int(np.ceil(balance * n / n_clusters))
                assign, cent_np = _split_oversized(
                    lambda idx: jnp.take(
                        emb, jnp.asarray(idx, jnp.int32),
                        axis=0).astype(self._dtype),
                    n, assign, cent_d, cap, seed)
                n_clusters = len(cent_np)
                cent_d = jnp.asarray(cent_np, self._dtype)
            order, counts, n_spill = _plan_entries(
                n, n_clusters, assign, second, margin, spill, cap)

        dest, starts, m_lay = _aligned_layout(counts)
        offsets = starts
        self.cmax = int(counts.max())
        cmax_pad = _round_up(max(self.cmax, 8), 8)
        m = m_lay                  # layout rows (entries + align gaps)
        self.n = n
        self.m = m
        self.n_entries = len(order)    # real entries (n + spilled copies)
        self.n_spill = int(n_spill)
        self.dim = d
        self.n_clusters = n_clusters
        self.centroids = cent_d
        row_ids = np.full(m_lay, -1, np.int64)
        row_ids[dest] = order
        self.row_ids = jnp.asarray(row_ids.astype(np.int32))
        self.offsets = jnp.asarray(offsets.astype(np.int32))
        self.counts = jnp.asarray(counts.astype(np.int32))
        self._cmax_pad = cmax_pad
        self.mesh = mesh
        self.axis = axis
        # gather index per layout row: gaps index row n, which
        # mode="fill" maps to zero rows (matching the host path's
        # zero gap rows bit-for-bit)
        lay = np.full(m_lay, n, np.int64)
        lay[dest] = order

        inv = None
        if self._int8:
            # same f32 math as the host `__init__` path: abs-max pulled
            # to host, scale AND the quantizer's inverse both computed
            # in host f32 (device f32 division is not IEEE on TPU —
            # see _gather_cluster_sorted)
            # fused jit reduction: eager abs would materialize a full
            # copy of emb (16 GiB at 4M x 1024 f32) and OOM the chip.
            # abs/max are exact in the storage dtype; the bf16->f32
            # scalar widening is exact.
            amax = np.float32(jax.jit(lambda e: jnp.max(jnp.abs(e)))(emb))
            amax = np.float32(max(amax, np.float32(1e-30)))
            self.db_scale = float(amax / np.float32(127.0))
            inv = np.float32(127.0) / amax

        # gather rows into the cluster-sorted layout ON DEVICE, emitting
        # the storage dtype directly (the f32 intermediate only ever
        # exists one chunk at a time). Pad slots index row `n`, which
        # mode="fill" maps to zero rows (negative indices would WRAP).
        if mesh is None:
            gchunk = min(65536, _round_up(m + cmax_pad, 8))
            total = _round_up(m + cmax_pad, gchunk)
            ord_pad = np.full(total, n, np.int64)
            ord_pad[:m] = lay
            ord_chunks = jnp.asarray(
                ord_pad.reshape(-1, gchunk).astype(np.int32))
            self.matrix = _gather_cluster_sorted(
                emb, ord_chunks,
                jnp.float32(0.0 if inv is None else inv),
                int8=self._int8, out_dtype=jnp.dtype(self._dtype).name)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P
            n_shards = mesh.shape[axis]
            # local_n multiple of 8 keeps shard-local cluster starts
            # (global_start - p*local_n) 8-aligned for the kernel
            local_n = _round_up(-(-m // n_shards), 8)
            ord_pad = np.full((n_shards, local_n + cmax_pad), n, np.int64)
            for p in range(n_shards):
                r0, r1 = p * local_n, min((p + 1) * local_n, m)
                if r1 > r0:
                    ord_pad[p, :r1 - r0] = lay[r0:r1]
            mats = _gather_cluster_sorted(
                emb, jnp.asarray(ord_pad.astype(np.int32)),
                jnp.float32(0.0 if inv is None else inv),
                int8=self._int8, out_dtype=jnp.dtype(self._dtype).name)
            mats = mats.reshape(n_shards, local_n + cmax_pad, d)
            loc_off, loc_cnt = _shard_tables(offsets, counts, m,
                                             n_shards, local_n)
            spec = NamedSharding(mesh, P(axis))
            rep = NamedSharding(mesh, P())
            self.shard_mats = jax.device_put(mats, spec)
            self.shard_off = jax.device_put(jnp.asarray(loc_off), spec)
            self.shard_cnt = jax.device_put(jnp.asarray(loc_cnt), spec)
            self.centroids = jax.device_put(self.centroids, rep)
            self.offsets = jax.device_put(self.offsets, rep)
            self.row_ids = jax.device_put(self.row_ids, rep)
            self._local_n = local_n
        return self

    @classmethod
    def from_chunks(cls, chunk_fn, n: int, d: int, *,
                    chunk: int = 1 << 19, n_clusters: int = 256,
                    train_iters: int = 10, train_sample: int = 131072,
                    dtype: str = "bfloat16", seed: int = 0,
                    spill: float = 0.0):
        """Build from a VIRTUAL corpus: `chunk_fn(lo, rows)` returns a
        device [rows, d] float block for any in-range window — a seeded
        generator, a staged disk read — so the source never exists as
        one array anywhere. An 8M x 1024 bf16 source is 16 GB and
        cannot sit in HBM beside its own int8 index; this path streams
        it: k-means sample gather, chunked assignment (`_assign_all`),
        per-chunk abs-max, then a per-chunk quantize+scatter into the
        DONATED cluster-sorted buffer (pad slots scatter with
        mode="drop"). Same `_kmeans_fit`/`_plan_entries` math as every
        other build; int8 quantization uses the identical host-f32
        scale + device f32-multiply rounding as `from_device`
        (bitwise-pinned by tests/test_ivf.py). `balance` is not
        supported (its split step random-accesses source rows);
        single-device only — shard the SEARCH via the sharded scan
        instead. Capacity artifact: scripts/bench_capacity.py --ivf."""
        if n <= 0:
            raise ValueError("empty index")
        if not 0.0 <= spill <= 1.0:
            raise ValueError(f"spill must be in [0, 1], got {spill}")
        n_clusters = min(n_clusters, n)
        rng = np.random.default_rng(seed)
        self = object.__new__(cls)
        self._int8 = jnp.dtype(dtype) == jnp.int8
        self._dtype = jnp.bfloat16 if self._int8 else jnp.dtype(dtype)
        self.db_scale = None
        if self._int8 and d * 127 * 127 >= 2 ** 24:
            raise ValueError(
                f"int8 IVF requires d <= 1040 for exact f32 partials "
                f"(got d={d})")

        # k-means sample: the SAME unsorted draw as from_device (the
        # init picks positions INTO the sample, so sample-row order is
        # part of the k-means seed), assembled per chunk by scatter.
        # Index arrays pad to ONE static shape — per-chunk selection
        # counts vary, and a raw shape per chunk would remote-compile
        # the scatter once per chunk (minutes each on this toolchain).
        sample_idx = (rng.choice(n, min(train_sample, n),
                                 replace=False)
                      if n > train_sample else np.arange(n))
        s_total = len(sample_idx)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def _fill_sample(smp, blk, src_idx, pos):
            rows_g = jnp.take(blk, src_idx, axis=0, mode="fill",
                              fill_value=0).astype(smp.dtype)
            return smp.at[pos].set(rows_g, mode="drop")

        s_pad = min(s_total, chunk)
        sample = jnp.zeros((s_total, d), self._dtype)
        for lo in range(0, n, chunk):
            rows = min(chunk, n - lo)
            sel = np.nonzero((sample_idx >= lo)
                             & (sample_idx < lo + rows))[0]
            if len(sel):
                src = np.full(s_pad, rows, np.int32)   # fill -> 0 row
                # pad pos must be OUT OF BOUNDS HIGH: mode="drop"
                # drops only past-the-end indices; -1 would WRAP to
                # the last row and overwrite it with the fill row
                pos = np.full(s_pad, s_total, np.int32)
                src[:len(sel)] = sample_idx[sel] - lo
                pos[:len(sel)] = sel
                sample = _fill_sample(sample, chunk_fn(lo, rows),
                                      jnp.asarray(src),
                                      jnp.asarray(pos))
        init = jnp.asarray(rng.choice(len(sample_idx), n_clusters,
                                      replace=False))
        cent_d, _ = _kmeans_fit(sample, init, n_clusters=n_clusters,
                                iters=train_iters)

        # assignment + abs-max in one streamed pass over the chunks
        # (chunk_fn windows align to `chunk`; _assign_all's internal
        # ranges stay inside one window)
        amax_acc = [np.float32(0.0)]
        cache = {}

        def rows_at(lo, hi):
            base = (lo // chunk) * chunk
            if cache.get("base") != base:
                blk = chunk_fn(base, min(chunk, n - base))
                cache["base"] = base
                cache["blk"] = blk
                if self._int8:
                    amax_acc[0] = max(
                        amax_acc[0],
                        np.float32(jax.jit(
                            lambda e: jnp.max(jnp.abs(e)))(blk)))
            return cache["blk"][lo - base:hi - base].astype(self._dtype)

        want_spill = spill > 0.0 and n_clusters > 1
        assign, second, margin = _assign_all(
            rows_at, n, cent_d, want_spill,
            chunk=min(262144, chunk))
        cache.clear()
        order, counts, n_spill = _plan_entries(
            n, n_clusters, assign, second, margin, spill, None)

        dest, starts, m_lay = _aligned_layout(counts)
        self.cmax = int(counts.max())
        cmax_pad = _round_up(max(self.cmax, 8), 8)
        m = m_lay
        self.n = n
        self.m = m
        self.n_entries = len(order)
        self.n_spill = int(n_spill)
        self.dim = d
        self.n_clusters = n_clusters
        self.centroids = cent_d
        row_ids = np.full(m_lay, -1, np.int64)
        row_ids[dest] = order
        self.row_ids = jnp.asarray(row_ids.astype(np.int32))
        self.offsets = jnp.asarray(starts.astype(np.int32))
        self.counts = jnp.asarray(counts.astype(np.int32))
        self._cmax_pad = cmax_pad
        self.mesh = None
        self.axis = "data"

        inv = np.float32(0.0)
        if self._int8:
            amax = np.float32(max(amax_acc[0], np.float32(1e-30)))
            self.db_scale = float(amax / np.float32(127.0))
            inv = np.float32(127.0) / amax

        @functools.partial(jax.jit, donate_argnums=(0,),
                           static_argnames=("int8",))
        def scatter_block(buf, x, src_local, pos, inv_s, *, int8):
            rows = jnp.take(x, src_local, axis=0,
                            mode="fill", fill_value=0
                            ).astype(jnp.float32)
            if int8:
                rows = jnp.clip(jnp.round(rows * inv_s), -127,
                                127).astype(jnp.int8)
            else:
                rows = rows.astype(buf.dtype)
            return buf.at[pos].set(rows, mode="drop")

        store_dt = jnp.int8 if self._int8 else self._dtype
        buf = jnp.zeros((m + cmax_pad, d), store_dt)
        # per chunk: which layout entries source from this window
        ord64 = np.asarray(order, np.int64)
        pad_len = chunk if spill == 0.0 else 2 * chunk
        for lo in range(0, n, chunk):
            rows = min(chunk, n - lo)
            sel = np.nonzero((ord64 >= lo) & (ord64 < lo + rows))[0]
            src_local = np.full(pad_len, rows, np.int32)  # fill -> 0 row
            pos = np.full(pad_len, m + cmax_pad, np.int32)  # drop (OOB high)
            src_local[:len(sel)] = (ord64[sel] - lo).astype(np.int32)
            pos[:len(sel)] = dest[sel].astype(np.int32)
            buf = scatter_block(buf, chunk_fn(lo, rows),
                                jnp.asarray(src_local),
                                jnp.asarray(pos), jnp.float32(inv),
                                int8=self._int8)
        self.matrix = buf
        return self

    @classmethod
    def load_cache_device(cls, emb, path: str, *,
                          dtype: str = "bfloat16", mesh=None,
                          axis: str = "data"):
        """`load_cache`, but rebuilding from device-resident embeddings
        via `from_device` — one on-device gather, zero host O(N*d)
        traffic. Returns None on any cache/shape mismatch."""
        try:
            with np.load(path) as z:
                meta = z["meta"]
                if int(meta[0]) != emb.shape[0] or \
                        int(meta[1]) != emb.shape[1]:
                    return None
                n_spill = int(meta[3]) if len(meta) > 3 else 0
                pre = (z["centroids"], z["order"], z["counts"], n_spill)
                n_clusters = int(meta[2])
        except (OSError, KeyError, ValueError):
            return None
        return cls.from_device(emb, n_clusters=n_clusters, dtype=dtype,
                               mesh=mesh, axis=axis, _precomputed=pre)

    # -- persistence (skip k-means on reload) ---------------------------

    def save_cache(self, path: str) -> None:
        """Persist the training result (centroids + cluster order +
        counts) so a process restart rebuilds this index WITHOUT
        retraining k-means or re-assigning N rows — at 100M rows that
        is the difference between seconds (one fancy-index copy of the
        memmapped vectors) and minutes. The vectors themselves are NOT
        duplicated; the cache is O(N) int32 + O(C*d)."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp.npz"         # savez appends .npz if absent
        rid = np.asarray(self.row_ids, np.int32)
        np.savez_compressed(
            tmp,
            centroids=np.asarray(self.centroids, np.float32),
            # compact entry order (alignment gaps dropped: the aligned
            # layout is re-derived from counts at load, and the cache
            # format predates it)
            order=rid[rid >= 0],
            counts=np.asarray(self.counts, np.int32),
            meta=np.asarray([self.n, self.dim, self.n_clusters,
                             self.n_spill]))
        os.replace(tmp, path)

    @classmethod
    def load_cache(cls, vectors: np.ndarray, path: str, *,
                   dtype: str = "bfloat16", mesh=None, axis: str = "data"):
        """Rebuild an IVFIndex from `save_cache` output + the original
        vectors. Returns None on any mismatch (row count/dim changed:
        the store mutated since the cache was written) so callers fall
        back to a fresh build."""
        try:
            with np.load(path) as z:
                meta = z["meta"]
                if int(meta[0]) != vectors.shape[0] or \
                        int(meta[1]) != vectors.shape[1]:
                    return None
                n_spill = int(meta[3]) if len(meta) > 3 else 0
                pre = (z["centroids"], z["order"], z["counts"], n_spill)
                n_clusters = int(meta[2])
        except (OSError, KeyError, ValueError):
            return None
        return cls(vectors, n_clusters=n_clusters, dtype=dtype, mesh=mesh,
                   axis=axis, _precomputed=pre)

    @classmethod
    def extend_cache(cls, vectors: np.ndarray, path: str, *,
                     dtype: str = "bfloat16", mesh=None,
                     axis: str = "data", max_grow: float = 0.5):
        """Extend a cached index with newly-APPENDED rows: assign rows
        [n_old:] to the cached centroids (one chunked matmul pass, no
        k-means retrain) and merge them into the entry table. Only
        valid when the first n_old rows are unchanged — the engine
        guards that with the store's `mutation_epoch` (bumped by
        truncate, the one prefix-rewriting mutation). Returns None if
        the cache is not a strict prefix (n_old >= n), dims mismatch,
        or growth exceeds `max_grow` of the trained corpus — past that
        the frozen centroids drift from the data distribution and a
        full retrain is the right call. Spill (if the cache used it)
        is applied to the new rows at the same fraction, thresholded
        on the new rows' own margin quantile. A balance cap from the
        original build is NOT re-enforced on appends (no re-split
        without retraining); `max_grow` bounds the resulting cmax
        drift to 1.5x the trained cap in the worst case."""
        n, d = vectors.shape
        try:
            with np.load(path) as z:
                meta = z["meta"]
                n_old = int(meta[0])
                if int(meta[1]) != d or not 0 < n_old < n:
                    return None
                if (n - n_old) / n_old > max_grow:
                    return None
                cent = np.asarray(z["centroids"], np.float32)
                order = np.asarray(z["order"], np.int64)
                counts_old = np.asarray(z["counts"], np.int64)
                n_clusters = int(meta[2])
                n_spill_old = int(meta[3]) if len(meta) > 3 else 0
        except (OSError, KeyError, ValueError):
            return None

        dt = jnp.bfloat16 if jnp.dtype(dtype) == jnp.int8 \
            else jnp.dtype(dtype)
        cent_d = jnp.asarray(cent, dt)
        new32 = np.ascontiguousarray(vectors[n_old:], np.float32)
        n_new = n - n_old
        spill_frac = n_spill_old / n_old
        want_spill = spill_frac > 0 and n_clusters > 1
        assign, second, margin = _assign_all(
            lambda lo, hi: jnp.asarray(new32[lo:hi], dt),
            n_new, cent_d, want_spill)

        new_ids = np.arange(n_old, n, dtype=np.int64)
        new_cl = assign
        n_spill_new = 0
        if want_spill:
            extra = np.nonzero(margin <= np.quantile(margin,
                                                     spill_frac))[0]
            n_spill_new = len(extra)
            new_cl = np.concatenate([assign, second[extra]])
            new_ids = np.concatenate([new_ids,
                                      np.arange(n_old, n)[extra]])

        # merge: old entries keep their within-cluster order, new
        # entries append behind them (stable sort over concatenation)
        old_cl = np.repeat(np.arange(n_clusters), counts_old)
        ids_all = np.concatenate([order, new_ids])
        cl_all = np.concatenate([old_cl, new_cl])
        order_all = ids_all[np.argsort(cl_all, kind="stable")]
        counts_all = np.bincount(cl_all, minlength=n_clusters)
        pre = (cent, order_all, counts_all, n_spill_old + n_spill_new)
        return cls(vectors, n_clusters=n_clusters, dtype=dtype, mesh=mesh,
                   axis=axis, _precomputed=pre)

    def _build_shards(self, sorted_m: np.ndarray, offsets, counts,
                      mesh, axis: str) -> None:
        """Row-shard the cluster-sorted matrix + per-shard cluster tables.

        Shard p owns global sorted rows [p*local_n, (p+1)*local_n); each
        cluster's contiguous range is clipped to that window, so a probe
        on shard p scans exactly the probed cluster's rows that live
        there (clusters spanning a boundary are scanned partly by each
        neighbor — the merge reassembles them exactly).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        offsets = np.asarray(offsets)
        counts = np.asarray(counts)
        n, d = self.m, self.dim          # layout rows (entries + gaps)
        n_shards = mesh.shape[axis]
        # multiple of 8: shard-local cluster starts stay 8-aligned
        local_n = _round_up(-(-n // n_shards), 8)
        pad = self._cmax_pad
        mats = np.zeros((n_shards, local_n + pad, d), sorted_m.dtype)
        for p in range(n_shards):
            r0 = p * local_n
            r1 = max(r0, min((p + 1) * local_n, n))  # trailing shards may own 0 rows
            if r1 > r0:
                mats[p, :r1 - r0] = sorted_m[r0:r1]
        loc_off, loc_cnt = _shard_tables(offsets, counts, n, n_shards,
                                         local_n)
        spec = NamedSharding(mesh, P(axis))
        rep = NamedSharding(mesh, P())
        self.shard_mats = jax.device_put(
            jnp.asarray(mats) if self._int8
            else jnp.asarray(mats, self._dtype), spec)
        self.shard_off = jax.device_put(jnp.asarray(loc_off), spec)
        self.shard_cnt = jax.device_put(jnp.asarray(loc_cnt), spec)
        self.centroids = jax.device_put(self.centroids, rep)
        self.offsets = jax.device_put(self.offsets, rep)
        self.row_ids = jax.device_put(self.row_ids, rep)
        self._local_n = local_n

    def _sorted_mask(self, row_mask, rows: int):
        """[n] original-id mask -> bool over SORTED row positions,
        padded to `rows` (the slice target's length) with False, so
        per-probe dynamic slices never clamp. Spilled copies inherit
        their row's mask bit through the row_ids gather."""
        m = np.asarray(row_mask, bool)
        if m.shape[0] < self.n:
            m = np.pad(m, (0, self.n - m.shape[0]))
        marr = jnp.asarray(m[:self.n])
        rid = jnp.clip(self.row_ids, 0, self.n - 1)
        sorted_m = jnp.where(self.row_ids >= 0, marr[rid], False)
        pad = rows - sorted_m.shape[0]
        if pad > 0:
            sorted_m = jnp.pad(sorted_m, (0, pad))
        return sorted_m

    def search(self, queries, k: int, *, nprobe: int = 8,
               impl: str = "auto", row_mask=None):
        """Returns (scores [Q, k] f32, original row ids [Q, k] int32).

        impl: "auto" picks the Pallas probed-scan kernel
        (ops/ivf_scan.py) on a single TPU device — it streams only the
        probed cluster ranges through a manual DMA ring instead of the
        XLA path's per-probe dynamic-slice copies (~10x small-Q
        latency) — and the XLA probe loop otherwise ("xla"/"pallas"
        force one; "pallas" off-TPU runs in interpret mode, for
        tests).

        `row_mask` ([n] bool over ORIGINAL row ids) restricts results
        to matching rows (payload-filtered search). Probe selection is
        unchanged — the same nprobe clusters are scanned and masked
        rows score -inf — so filtered recall w.r.t. the filtered exact
        scan matches unfiltered recall semantics. Masked scans run the
        XLA probe loop (the Pallas kernel takes no mask)."""
        nprobe = min(nprobe, self.n_clusters)
        q32 = jnp.asarray(queries, jnp.float32)
        if q32.ndim == 1:
            q32 = q32[None]
        q = q32.astype(self._dtype)          # centroid-probe copy (bf16)
        if self._int8:
            # shared two-digit decomposition (ops.topk.int8_query_digits)
            # — ONE definition of the exactness contract for this path
            # and cosine_topk_int8_exact
            from ..ops.topk import int8_query_digits
            q_hi, q_lo, c2 = int8_query_digits(q32)
            qdig = jnp.stack([q_hi, q_lo])
            row_scale = c2 * self.db_scale
        else:
            qdig = jnp.zeros((2,) + q32.shape, jnp.int8)
            row_scale = jnp.ones((q32.shape[0], 1), jnp.float32)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(self.mesh, P())
            q = jax.device_put(q, rep)
            qdig = jax.device_put(qdig, rep)
            row_scale = jax.device_put(row_scale, rep)
            mask_sorted = None
            if row_mask is not None:
                n_shards = self.mesh.shape[self.axis]
                mask_sorted = jax.device_put(
                    self._sorted_mask(
                        row_mask,
                        n_shards * self._local_n + self._cmax_pad), rep)
            return _ivf_search_sharded(
                self.shard_mats, self.shard_off, self.shard_cnt,
                self.centroids, self.offsets, self.row_ids, q, qdig,
                row_scale, k=k, nprobe=nprobe, cmax=self._cmax_pad,
                m=self.m, local_n=self._local_n, mesh=self.mesh,
                axis=self.axis, int8=self._int8,
                dedup=self.n_spill > 0,
                impl="xla" if row_mask is not None else impl,
                dim=self.dim, mask_sorted=mask_sorted)
        dedup = self.n_spill > 0
        k_fetch = min(2 * k, nprobe * self._cmax_pad) if dedup \
            else min(k, nprobe * self._cmax_pad)
        # auto: the kernel only when it can actually run — d/k bounds
        # AND the VMEM feasibility check (an unbalanced index can have
        # cmax_pad wide enough that even an 8-query block cannot stage
        # a probe; ivf_scan_supported falls back to XLA instead of
        # failing a Mosaic allocation at serve time). Forcing "pallas"
        # bypasses auto's guards but hits ivf_probe_scan's own
        # validation, which raises a clear error rather than running
        # outside the kernel contract.
        from ..ops.ivf_scan import ivf_scan_supported
        use_pallas = row_mask is None and (impl == "pallas" or (
            impl == "auto" and jax.default_backend() == "tpu"
            and q.shape[0] <= 256
            and ivf_scan_supported(
                self._cmax_pad, self.dim,
                jnp.dtype(self.matrix.dtype).itemsize, k_fetch)))
        if use_pallas:
            return _ivf_search_pallas(
                self.matrix, self.centroids, self.offsets, self.counts,
                self.row_ids, q, qdig, row_scale, k=k, nprobe=nprobe,
                cmax=self._cmax_pad, m=self.m, int8=self._int8,
                dedup=dedup)
        mask_sorted = None
        if row_mask is not None:
            mask_sorted = self._sorted_mask(row_mask, self.matrix.shape[0])
        return _ivf_search(self.matrix, self.centroids, self.offsets,
                           self.counts, self.row_ids, q, qdig, row_scale,
                           k=k, nprobe=nprobe, cmax=self._cmax_pad,
                           m=self.m, int8=self._int8,
                           dedup=self.n_spill > 0,
                           mask_sorted=mask_sorted)


def _probe_scores(matrix, qvec, qhi, qlo, rs, b, cmax: int, int8: bool):
    """Scores of one probed cluster slice for one query: bf16 MXU dot
    with f32 accumulation, or two exact s8 passes + f32 combine in int8
    mode (the in-cluster analog of `cosine_topk_int8_exact`)."""
    rows = jax.lax.dynamic_slice_in_dim(matrix, b, cmax, axis=0)
    if int8:
        dims = (((1,), (0,)), ((), ()))
        s_hi = jax.lax.dot_general(rows, qhi, dims,
                                   preferred_element_type=jnp.int32)
        s_lo = jax.lax.dot_general(rows, qlo, dims,
                                   preferred_element_type=jnp.int32)
        return (s_hi.astype(jnp.float32) * 254.0
                + s_lo.astype(jnp.float32)) * rs
    # f32 accumulation + per-dtype precision: without these the bf16
    # matvec rounds scores to bf16 and an f32 matrix silently runs one
    # bf16 MXU pass (pallas-f32-dot-default-precision trap) — both
    # would break the "exact within probed clusters" contract and the
    # bitwise parity with the Pallas probed-scan kernel.
    return jax.lax.dot_general(
        rows, qvec.astype(rows.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(rows.dtype))


def _dedup_keep_first(scores, ids):
    """Mask later duplicates of an id (spilled rows can surface twice
    from two probed clusters). Candidates arrive sorted by
    (-score, position); keep-first therefore preserves the exact tie
    order. [Q, c] with c <= 2k, so the pairwise compare is tiny."""
    c = ids.shape[1]
    eq = ids[:, None, :] == ids[:, :, None]              # [Q, c, c]
    earlier = jnp.tril(jnp.ones((c, c), jnp.bool_), -1)  # j earlier than i
    dup = jnp.any(eq & earlier[None], axis=2)
    return (jnp.where(dup, -jnp.inf, scores),
            jnp.where(dup, -1, ids))


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "cmax", "m",
                                             "int8", "dedup"))
def _ivf_search(matrix, centroids, offsets, counts, row_ids, queries,
                qdig, row_scale, *, k: int, nprobe: int, cmax: int, m: int,
                int8: bool = False, dedup: bool = False, mask_sorted=None):
    qn, d = queries.shape
    cs = jax.lax.dot_general(
        queries, centroids, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(queries.dtype))              # [Q, C]
    _, top_c = jax.lax.top_k(cs, nprobe)                      # [Q, nprobe]

    base = offsets[top_c]                                     # [Q, nprobe]
    cnt = counts[top_c]

    def probe(p, carry):
        scores_all, idx_all = carry

        def one_query(qvec, qhi, qlo, rs, b, c):
            s = _probe_scores(matrix, qvec, qhi, qlo, rs, b, cmax, int8)
            within = jnp.arange(cmax)
            s = jnp.where(within < c, s, -jnp.inf)
            if mask_sorted is not None:
                # filtered search: masked rows score -inf (their ids
                # then surface as -1 via the isneginf rewrite below)
                mrows = jax.lax.dynamic_slice_in_dim(mask_sorted, b, cmax)
                s = jnp.where(mrows, s, -jnp.inf)
            sorted_idx = jnp.where(within < c, b + within, m)  # m -> pad row
            return s, sorted_idx

        s_p, i_p = jax.vmap(one_query)(queries, qdig[0], qdig[1],
                                       row_scale[:, 0], base[:, p],
                                       cnt[:, p])
        scores_all = jax.lax.dynamic_update_slice_in_dim(
            scores_all, s_p, p * cmax, axis=1)
        idx_all = jax.lax.dynamic_update_slice_in_dim(
            idx_all, i_p, p * cmax, axis=1)
        return scores_all, idx_all

    scores_all = jnp.full((qn, nprobe * cmax), -jnp.inf, jnp.float32)
    idx_all = jnp.full((qn, nprobe * cmax), m, jnp.int32)
    scores_all, idx_all = jax.lax.fori_loop(0, nprobe, probe,
                                            (scores_all, idx_all))

    k_eff = min(k, nprobe * cmax)
    # with spilled entries a row can appear in two probed clusters, so
    # fetch 2k candidates (<=2 copies/row -> >=k unique), dedup by id
    # keep-first, and re-select k (top_k picks leftmost on ties, so the
    # (-score, position) order is preserved through both passes)
    k_fetch = min(2 * k, nprobe * cmax) if dedup else k_eff
    top_s, pos = jax.lax.top_k(scores_all, k_fetch)
    top_sorted_idx = jnp.take_along_axis(idx_all, pos, axis=1)
    # map sorted positions back to original row ids (pad row -> -1)
    row_ids_pad = jnp.concatenate([row_ids, jnp.full((1,), -1, jnp.int32)])
    top_ids = row_ids_pad[jnp.clip(top_sorted_idx, 0, m)]
    top_ids = jnp.where(jnp.isneginf(top_s), -1, top_ids)
    if dedup:
        top_s, top_ids = _dedup_keep_first(top_s, top_ids)
        top_s, sel = jax.lax.top_k(top_s, k_eff)
        top_ids = jnp.take_along_axis(top_ids, sel, axis=1)
    if k_eff < k:
        pad = k - k_eff
        top_s = jnp.pad(top_s, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        top_ids = jnp.pad(top_ids, ((0, 0), (0, pad)), constant_values=-1)
    return top_s, top_ids


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "cmax", "m",
                                              "int8", "dedup"))
def _ivf_search_pallas(matrix, centroids, offsets, counts, row_ids,
                       queries, qdig, row_scale, *, k: int, nprobe: int,
                       cmax: int, m: int, int8: bool = False,
                       dedup: bool = False):
    """`_ivf_search` with the probe loop replaced by the Pallas
    probed-scan kernel (ops/ivf_scan.py). Same contract: candidates
    ordered by (-score, probe-major position); int8 scores are the
    identical f32 combine (exact s32 dots make the two paths bitwise
    equal there; bf16/f32 agree up to MXU accumulation order)."""
    from ..ops.ivf_scan import ivf_probe_scan, probe_group_width

    qn, d = queries.shape
    cs = jax.lax.dot_general(
        queries, centroids, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(queries.dtype))              # [Q, C]
    _, top_c = jax.lax.top_k(cs, nprobe)                      # [Q, nprobe]
    base = offsets[top_c].astype(jnp.int32)
    cnt = counts[top_c].astype(jnp.int32)

    k_eff = min(k, nprobe * cmax)
    k_fetch = min(2 * k, nprobe * cmax) if dedup else k_eff
    top_s, flat = ivf_probe_scan(matrix, queries, qdig, row_scale,
                                 base, cnt, k=k_fetch, nprobe=nprobe,
                                 cmax_pad=cmax, int8=int8)
    gw = probe_group_width(cmax, d, jnp.dtype(matrix.dtype).itemsize)
    pr = jnp.clip(flat // gw, 0, nprobe - 1)
    b_sel = jnp.take_along_axis(base, pr, axis=1)
    sorted_pos = jnp.where(flat < 0, m, b_sel + flat % gw)
    row_ids_pad = jnp.concatenate([row_ids, jnp.full((1,), -1, jnp.int32)])
    top_ids = row_ids_pad[jnp.clip(sorted_pos, 0, m)]
    top_ids = jnp.where(jnp.isneginf(top_s), -1, top_ids)
    if dedup:
        top_s, top_ids = _dedup_keep_first(top_s, top_ids)
        top_s, sel = jax.lax.top_k(top_s, k_eff)
        top_ids = jnp.take_along_axis(top_ids, sel, axis=1)
    if k_eff < k:
        pad = k - k_eff
        top_s = jnp.pad(top_s, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        top_ids = jnp.pad(top_ids, ((0, 0), (0, pad)), constant_values=-1)
    return top_s, top_ids


def _ivf_search_sharded(shard_mats, shard_off, shard_cnt, centroids,
                        g_offsets, row_ids, queries, qdig, row_scale, *,
                        k: int, nprobe: int, cmax: int, m: int,
                        local_n: int, mesh, axis: str, int8: bool = False,
                        dedup: bool = False, impl: str = "auto",
                        dim: int = 0, mask_sorted=None):
    """Row-sharded IVF probe scan + exact (score, probe-position) merge.

    Every shard probes the SAME nprobe clusters per query (the centroid
    scoring is replicated), scans only the probed rows it owns, and
    emits its local top-k with a (probe_rank, within_cluster_offset)
    tie key — exactly the position order the single-device
    `_ivf_search` resolves ties by (kept as two lexsort keys rather
    than probe_rank * (m+1) + offset, which overflows int32 once
    m x nprobe crosses 2^31 — the 100M-row config), so the
    all_gather lexsort merge reproduces it bit-for-bit. With spilled
    entries (dedup=True) every shard emits its top-2k so the global
    top-2k multiset is complete, and the dedup-by-id keep-first runs
    after the merge — the same order the single-device path dedups in.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    k_eff = min(k, nprobe * cmax)
    k_fetch = min(2 * k, nprobe * cmax) if dedup else k_eff
    # per-shard probe scan via the Pallas kernel (same guards as the
    # single-device dispatch, incl. the VMEM feasibility check); each
    # shard's local top-k_fetch has the identical (-score, probe-major
    # position) order either way
    from ..ops.ivf_scan import ivf_scan_supported
    use_pallas = mask_sorted is None and (impl == "pallas" or (
        impl == "auto" and jax.default_backend() == "tpu"
        and queries.shape[0] <= 256
        and ivf_scan_supported(
            cmax, dim, jnp.dtype(shard_mats.dtype).itemsize, k_fetch)))

    def local(mats, soff, scnt, cent, g_off, rids, qs, qdg, rsc,
              msk=None):
        mat, soff, scnt = mats[0], soff[0], scnt[0]
        qn = qs.shape[0]
        r0 = jax.lax.axis_index(axis) * local_n
        cs = jax.lax.dot_general(
            qs, cent, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(qs.dtype))
        _, top_c = jax.lax.top_k(cs, nprobe)                  # [Q, nprobe]
        base = soff[top_c]
        cnt = scnt[top_c]
        goff = g_off[top_c]

        def _merge(top_s, top_g, top_w, top_r):
            """all_gather the per-shard top-k_fetch candidates and
            lexsort-merge them into the single-device order."""
            def gather(x):  # [P, Q, k_fetch] -> [Q, P*k_fetch]
                return jnp.transpose(
                    jax.lax.all_gather(x, axis), (1, 0, 2)).reshape(qn, -1)

            all_s = gather(top_s)
            all_g = gather(top_g)
            all_w = gather(top_w)
            all_r = gather(top_r)
            order = jnp.lexsort((all_w, all_r, -all_s), axis=1)[:, :k_fetch]
            out_s = jnp.take_along_axis(all_s, order, axis=1)
            out_g = jnp.take_along_axis(all_g, order, axis=1)
            rids_pad = jnp.concatenate([rids,
                                        jnp.full((1,), -1, jnp.int32)])
            out_i = rids_pad[jnp.clip(out_g, 0, m)]
            out_i = jnp.where(jnp.isneginf(out_s), -1, out_i)
            if dedup:
                out_s, out_i = _dedup_keep_first(out_s, out_i)
                out_s, sel2 = jax.lax.top_k(out_s, k_eff)
                out_i = jnp.take_along_axis(out_i, sel2, axis=1)
            else:
                out_s, out_i = out_s[:, :k_eff], out_i[:, :k_eff]
            return out_s, out_i

        if use_pallas:
            from ..ops.ivf_scan import ivf_probe_scan, probe_group_width

            top_s, flat = ivf_probe_scan(
                mat, qs, qdg, rsc, base.astype(jnp.int32),
                cnt.astype(jnp.int32), k=k_fetch, nprobe=nprobe,
                cmax_pad=cmax, int8=int8)
            gw = probe_group_width(cmax, mat.shape[1],
                                   jnp.dtype(mat.dtype).itemsize)
            pr = jnp.clip(flat // gw, 0, nprobe - 1)
            lpos = jnp.take_along_axis(base, pr, axis=1) + flat % gw
            go_sel = jnp.take_along_axis(goff, pr, axis=1)
            invalid = flat < 0
            top_g = jnp.where(invalid, m, r0 + lpos)
            top_w = jnp.where(invalid, 2**31 - 1, r0 + lpos - go_sel)
            top_r = jnp.where(invalid, 2**31 - 1, pr)
            return _merge(top_s, top_g, top_w, top_r)

        def probe(p, carry):
            s_all, pos_all, woff_all, prnk_all = carry

            def one_query(qvec, qhi, qlo, rs, b, c, go):
                s = _probe_scores(mat, qvec, qhi, qlo, rs, b, cmax, int8)
                within = jnp.arange(cmax)
                valid = within < c
                s = jnp.where(valid, s, -jnp.inf)
                if msk is not None:
                    # the replicated mask is over GLOBAL sorted
                    # positions; this shard's local row j sits at
                    # r0 + j (padded past the last shard, so the
                    # slice never clamps)
                    mrows = jax.lax.dynamic_slice_in_dim(
                        msk, r0 + b, cmax)
                    s = jnp.where(mrows, s, -jnp.inf)
                gpos = jnp.where(valid, r0 + b + within, m)
                # (probe rank, within-cluster offset) tie keys; invalid
                # slots sort last
                woff = jnp.where(valid, r0 + b + within - go, 2**31 - 1)
                prnk = jnp.where(valid, p, 2**31 - 1)
                return s, gpos, woff, prnk

            s_p, g_p, w_p, r_p = jax.vmap(one_query)(
                qs, qdg[0], qdg[1], rsc[:, 0], base[:, p], cnt[:, p],
                goff[:, p])
            upd = lambda a, v: jax.lax.dynamic_update_slice_in_dim(
                a, v, p * cmax, axis=1)
            return (upd(s_all, s_p), upd(pos_all, g_p),
                    upd(woff_all, w_p), upd(prnk_all, r_p))

        s_all = jnp.full((qn, nprobe * cmax), -jnp.inf, jnp.float32)
        pos_all = jnp.full((qn, nprobe * cmax), m, jnp.int32)
        woff_all = jnp.full((qn, nprobe * cmax), 2**31 - 1, jnp.int32)
        prnk_all = jnp.full((qn, nprobe * cmax), 2**31 - 1, jnp.int32)
        s_all, pos_all, woff_all, prnk_all = jax.lax.fori_loop(
            0, nprobe, probe, (s_all, pos_all, woff_all, prnk_all))

        # local top-k (stable: position order == tie-key order here)
        top_s, sel = jax.lax.top_k(s_all, k_fetch)
        top_g = jnp.take_along_axis(pos_all, sel, axis=1)
        top_w = jnp.take_along_axis(woff_all, sel, axis=1)
        top_r = jnp.take_along_axis(prnk_all, sel, axis=1)
        return _merge(top_s, top_g, top_w, top_r)

    if mask_sorted is None:
        fn = shard_map(
            local, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis),
                      P(), P(), P(), P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        top_s, top_ids = fn(shard_mats, shard_off, shard_cnt, centroids,
                            g_offsets, row_ids, queries, qdig, row_scale)
    else:
        fn = shard_map(
            local, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis),
                      P(), P(), P(), P(), P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        top_s, top_ids = fn(shard_mats, shard_off, shard_cnt, centroids,
                            g_offsets, row_ids, queries, qdig, row_scale,
                            mask_sorted)
    if k_eff < k:
        pad = k - k_eff
        top_s = jnp.pad(top_s, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        top_ids = jnp.pad(top_ids, ((0, 0), (0, pad)), constant_values=-1)
    return top_s, top_ids
