"""Max-sim scoring for multivector spaces (qdrant multivectors /
ColBERT-style late interaction).

Each stored point holds a variable-length [T_i, d] matrix of
sub-vectors; a query (itself [Tq, d], or a single [d] vector) scores a
point as

    score(Q, P) = sum_t  max_m  <Q_t, P_m>      (MaxSim)

which is qdrant's MAX_SIM multivector comparator. This is the one
query model in the store family that is MORE TPU-friendly than its
reference counterpart: the dominant cost is one [Tq·Q, M] matmul over
the flat sub-vector matrix (pure MXU work, fp32 accumulation), followed
by a sorted segment-max back onto point ids and the standard
(-score, idx) top-k. No gathers, no ragged compute — the raggedness
lives entirely in the integer segment ids.

Exactness contract matches the dense scans: fp32 accumulated dots,
ties to the lower row id, -1 in absent slots; points with NO
sub-vectors never match (their segment max stays -inf).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .topk import _dot_precision, _round_up


@partial(jax.jit, static_argnames=("k", "n_rows"))
def _maxsim_topk_jit(subs, seg_ids, queries, k: int, n_rows: int,
                     row_mask=None):
    """subs [M, d]; seg_ids [M] i32 (SORTED point id per sub-vector,
    pad records -> n_rows); queries [Q, Tq, d] (pad query rows are
    all-zero and handled by the caller via t_valid); returns
    (scores [Q, k] f32, ids [Q, k] i32)."""
    q, tq, d = queries.shape
    flat = queries.reshape(q * tq, d)
    s = jax.lax.dot_general(
        flat, subs, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(subs.dtype))          # [Q*Tq, M]
    # sorted segment-max onto point ids; one pad segment (n_rows)
    # swallows alignment records
    seg = jax.ops.segment_max(s.T, seg_ids, num_segments=n_rows + 1,
                              indices_are_sorted=True)  # [N+1, Q*Tq]
    per_t = seg[:n_rows].T.reshape(q, tq, n_rows)
    per_t = jnp.where(jnp.isneginf(per_t), 0.0, per_t) \
        * (jnp.abs(queries).sum(-1, keepdims=False) > 0)[..., None]
    # ^ rows with no sub-vectors contribute 0 per query row here, but
    #   are masked out entirely below (empty-point mask); zero-padded
    #   query rows (Tq padding) also contribute exactly 0
    scores = per_t.sum(axis=1)                          # [Q, N]
    has_subs = jax.ops.segment_max(
        jnp.ones((len(seg_ids),), jnp.float32), seg_ids,
        num_segments=n_rows + 1, indices_are_sorted=True)[:n_rows] > 0
    valid = has_subs[None, :]
    if row_mask is not None:
        valid = valid & (row_mask > 0)[None, :n_rows]
    scores = jnp.where(valid, scores, -jnp.inf)
    k_eff = min(k, n_rows)
    top_s, top_i = jax.lax.top_k(scores, k_eff)  # stable: ties -> low idx
    top_i = jnp.where(jnp.isneginf(top_s), -1, top_i)
    if k_eff < k:
        pad = k - k_eff
        top_s = jnp.concatenate(
            [top_s, jnp.full((q, pad), -jnp.inf, top_s.dtype)], axis=1)
        top_i = jnp.concatenate(
            [top_i, jnp.full((q, pad), -1, top_i.dtype)], axis=1)
    return top_s.astype(jnp.float32), top_i.astype(jnp.int32)


def seg_ids_of(indptr) -> np.ndarray:
    """[M] int32 point id per sub-vector from the cumulative ends —
    precompute (and device_put) once per index; rebuilding it per
    search costs a host repeat + upload on every call."""
    indptr = np.asarray(indptr, np.int64)
    return np.repeat(np.arange(len(indptr), dtype=np.int32),
                     np.diff(np.concatenate([[0], indptr]))
                     ).astype(np.int32)


def maxsim_topk(subs, indptr, queries, k: int, *,
                row_mask: Optional[np.ndarray] = None, seg_ids=None):
    """Exact MaxSim top-k over a flat sub-vector matrix.

    subs:    [M, d] f32/bf16 sub-vectors, grouped by point in row order
    indptr:  [N] cumulative sub-vector ends (row r owns
             [indptr[r-1], indptr[r]))
    queries: [d], [Tq, d], or a list of such (one result row each;
             ragged Tq is zero-padded to the batch max — zero query
             rows score exactly 0 in the sum and don't perturb ranks)
    seg_ids: optional precomputed `seg_ids_of(indptr)` (host or device)
    Returns (scores [Q, k] f32, ids [Q, k] i32).
    """
    indptr = np.asarray(indptr, np.int64)
    n_rows = len(indptr)
    batch = _query_batch(queries, subs.shape[1] if len(subs) else 0)
    if n_rows == 0 or len(subs) == 0:
        return (np.full((len(batch), k), -np.inf, np.float32),
                np.full((len(batch), k), -1, np.int32))
    if seg_ids is None:
        seg_ids = seg_ids_of(indptr)
    mask = None
    if row_mask is not None:
        mask = np.asarray(row_mask, np.int8)[:n_rows]
    return _maxsim_topk_jit(jnp.asarray(subs), jnp.asarray(seg_ids),
                            jnp.asarray(batch), k, n_rows,
                            None if mask is None else jnp.asarray(mask))


def _query_batch(queries, d: int) -> np.ndarray:
    """Normalize the accepted query forms ([d], [Tq, d], or a list of
    such) into one zero-padded [Q, Tq, d] f32 batch (shared by the
    single-device and sharded entry points; zero pad rows score
    exactly 0 in the MaxSim sum)."""
    if not isinstance(queries, (list, tuple)):
        queries = [queries]
    qs = []
    for item in queries:
        a = np.asarray(item, np.float32)
        if a.ndim == 1:
            a = a[None]
        if a.ndim != 2 or (d and a.shape[1] != d):
            raise ValueError(f"query must be [Tq, {d}], got {a.shape}")
        qs.append(a)
    tq = max((len(a) for a in qs), default=1) or 1
    batch = np.zeros((len(qs), tq, d), np.float32)
    for r, a in enumerate(qs):
        batch[r, : len(a)] = a
    return batch


def shard_multivec_layout(subs, indptr, n_shards: int):
    """Host-side layout prep for `sharded_maxsim_topk`: contiguous
    point-range sharding (shard s owns points [s*local_rows,
    (s+1)*local_rows)), each shard's flat sub-vector slice zero-padded
    to the max per-shard sub count so dim 0 splits evenly over the
    mesh. Pad records carry the LOCAL swallow segment id `local_rows`
    (the same alignment-pad convention as `_maxsim_topk_jit`), so a
    point split never occurs and per-shard results are exact local
    MaxSim top-k — the merge is then the k-sized all_gather + lexsort
    contract every dense sharded scan here uses.

    Returns (subs_sh [n_shards*m_shard, d], seg_sh [n_shards*m_shard]
    i32 local point ids, local_rows)."""
    subs = np.asarray(subs)
    indptr = np.asarray(indptr, np.int64)
    n_rows = len(indptr)
    d = subs.shape[1] if subs.ndim == 2 and subs.size else 1
    local_rows = max(1, -(-n_rows // n_shards))
    counts = []
    for s in range(n_shards):
        lo, hi = s * local_rows, min((s + 1) * local_rows, n_rows)
        if lo >= hi:
            counts.append(0)
            continue
        a = 0 if lo == 0 else int(indptr[lo - 1])
        counts.append(int(indptr[hi - 1]) - a)
    # 8-row pad granularity keeps the per-shard matrix sublane-aligned
    m_shard = max(_round_up(max(counts, default=0), 8), 8)
    subs_sh = np.zeros((n_shards * m_shard, d), subs.dtype)
    seg_sh = np.full((n_shards * m_shard,), local_rows, np.int32)
    for s in range(n_shards):
        lo, hi = s * local_rows, min((s + 1) * local_rows, n_rows)
        if lo >= hi or counts[s] == 0:
            continue
        a = 0 if lo == 0 else int(indptr[lo - 1])
        subs_sh[s * m_shard: s * m_shard + counts[s]] = subs[a: a + counts[s]]
        seg_sh[s * m_shard: s * m_shard + counts[s]] = \
            seg_ids_of(indptr[lo:hi] - a)
    return subs_sh, seg_sh, local_rows


def sharded_maxsim_topk(subs_sh, seg_sh, queries, k: int, mesh: Mesh,
                        axis: str = "data", *, n_rows: int,
                        local_rows: int, row_mask=None):
    """Exact MaxSim top-k over a point-sharded multivector space:
    per-shard local MaxSim scan + one k-sized all_gather + lexsort
    merge, identical results to the single-device `maxsim_topk`
    (deterministic (-score, global id) tie order) — the same two-level
    shape as `sharded_cosine_topk`. Inputs come from
    `shard_multivec_layout`; `subs_sh`/`seg_sh` should be device_put
    with dim 0 sharded over `axis`. `row_mask` is a [n_rows] global
    presence/filter mask (padded and sharded here)."""
    n_shards = mesh.shape[axis]
    total_rows = n_shards * local_rows
    d = subs_sh.shape[1]
    batch = _query_batch(queries, d)
    if n_rows == 0:
        return (np.full((len(batch), k), -np.inf, np.float32),
                np.full((len(batch), k), -1, np.int32))
    mask_j = None
    if row_mask is not None:
        m = np.zeros(total_rows, np.int8)
        m[:n_rows] = np.asarray(row_mask).astype(np.int8)[:n_rows]
        mask_j = jnp.asarray(m)

    def local_scan(subs_l, seg_l, qs, mask_l):
        shard_id = jax.lax.axis_index(axis)
        s, i = _maxsim_topk_jit(subs_l, seg_l, qs, k, local_rows, mask_l)
        gi = jnp.where(i >= 0, i + shard_id * local_rows, i)
        ok = (gi >= 0) & (gi < n_rows)
        s = jnp.where(ok, s, -jnp.inf)
        gi = jnp.where(ok, gi, -1)
        all_s = jax.lax.all_gather(s, axis)
        all_i = jax.lax.all_gather(gi, axis)
        qn = qs.shape[0]
        all_s = jnp.transpose(all_s, (1, 0, 2)).reshape(qn, -1)
        all_i = jnp.transpose(all_i, (1, 0, 2)).reshape(qn, -1)
        order = jnp.lexsort((all_i, -all_s), axis=1)[:, :k]
        return (jnp.take_along_axis(all_s, order, axis=1),
                jnp.take_along_axis(all_i, order, axis=1))

    if mask_j is None:
        fn = shard_map(lambda a, b, c: local_scan(a, b, c, None),
                       mesh=mesh, in_specs=(P(axis), P(axis), P()),
                       out_specs=(P(), P()), check_vma=False)
        return fn(subs_sh, seg_sh, jnp.asarray(batch))
    fn = shard_map(local_scan, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(), P(axis)),
                   out_specs=(P(), P()), check_vma=False)
    return fn(subs_sh, seg_sh, jnp.asarray(batch), mask_j)


def maxsim_score_rows(sub_rows, query) -> np.ndarray:
    """Host-side exact MaxSim of `query` ([d] or [Tq, d]) against a
    list of per-point [T, d] matrices (None/empty -> -inf). Used for
    candidate rescoring in the universal query."""
    q = np.asarray(query, np.float32)
    if q.ndim == 1:
        q = q[None]
    out = np.full(len(sub_rows), -np.inf, np.float32)
    for r, m in enumerate(sub_rows):
        if m is None or len(m) == 0:
            continue
        s = q @ np.asarray(m, np.float32).T          # [Tq, T]
        out[r] = float(s.max(axis=1).sum())
    return out
