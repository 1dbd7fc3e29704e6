"""Recommendation search: query by positive / negative example points.

The reference's store is qdrant-client embedded local mode
(reference core_system.py:100,521,659-664); qdrant's points API exposes
`recommend`, which takes positive and negative example points and
searches with either of two strategies. This module rebuilds both for
the TPU store:

  * ``average`` — compose ONE query vector host-side
    (``avg(pos) + (avg(pos) - avg(neg))``, qdrant's average_vector
    formula) and run it through the ordinary fused top-k scan. Cheap:
    recommendation costs exactly one search, works on every index path
    (bf16 / int8 / sharded / IVF / host).

  * ``best_score`` — score every database row against EVERY example and
    rank by qdrant's best-score combine: a row scoring ``bp`` against
    its best positive and ``bn`` against its best negative gets
    ``bp if bp > bn else -(bn * bn)``. Only per-row scalars are kept
    (the [E, N] example-score block reduces immediately), then one
    ``lax.top_k``. The int8 database is dequantized chunk-by-chunk
    inside a ``lax.scan`` so the full f32 copy never exists — the same
    memory discipline as ``cosine_topk_int8_xla``.

qdrant's discovery API (the same points surface) is rebuilt here too:

  * ``discover`` — a target vector plus (positive, negative) context
    PAIRS. Each pair votes per row: +1 when the row scores higher
    against the pair's positive than its negative, else -1; rows are
    ranked by vote total first, target similarity second. The
    lexicographic order is exact as one f32 key: ``votes * 4 + sim``
    (votes are integers, ``|sim| <= 1 < 2``, and ``4 * n_pairs`` stays
    far inside the f32 24-bit integer range).

  * ``context`` — pairs only, no target: rows are ranked by
    ``sum_i min(0, s_pos_i - s_neg_i)`` (0 = inside every pair's
    positive zone; ties break to the lower row id, deterministic where
    qdrant's zero-loss zone is unordered).

Result contract matches the rest of the repo: ordered by
``(-score, idx)``, ties to the lower row id, ``-1`` marks absent slots.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .topk import _dot_precision, _pad_dim, _round_up


def sum_scores_query(positives, negatives=None) -> np.ndarray:
    """Compose qdrant's sum_scores recommend strategy into ONE query.

    score(row) = sum_p <row, p> - sum_n <row, n> = <row, sum(p) - sum(n)>
    by linearity of the dot product, so the strategy is exact through
    any dot/cosine index in a single fused-kernel search and the
    returned scores ARE the summed similarities. The composed vector is
    deliberately NOT normalized (that would rescale the scores).
    Returns a [d] float32 vector."""
    pos = np.asarray(positives, np.float32)
    if pos.ndim == 1:
        pos = pos[None]
    if pos.shape[0] == 0:
        raise ValueError("recommend needs at least one positive example")
    q = pos.sum(axis=0)
    if negatives is not None:
        neg = np.asarray(negatives, np.float32)
        if neg.ndim == 1:
            neg = neg[None]
        if neg.shape[0]:
            q = q - neg.sum(axis=0)
    return q.astype(np.float32)


def average_query(positives, negatives=None) -> np.ndarray:
    """Compose one L2-normalized query from example vectors (host-side).

    qdrant's average_vector strategy: ``avg(pos) + (avg(pos) - avg(neg))``
    — the positive centroid pushed away from the negative one. Examples
    are L2-normalized first so one long vector cannot dominate the
    average. Returns a [d] float32 unit vector.
    """
    pos = np.asarray(positives, np.float32)
    if pos.ndim == 1:
        pos = pos[None]
    if pos.shape[0] == 0:
        raise ValueError("recommend needs at least one positive example")

    def _unit_mean(x):
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        return x.mean(axis=0)

    q = _unit_mean(pos)
    if negatives is not None:
        neg = np.asarray(negatives, np.float32)
        if neg.ndim == 1:
            neg = neg[None]
        if neg.shape[0]:
            q = q + (q - _unit_mean(neg))
    return q / max(float(np.linalg.norm(q)), 1e-30)


def _combine(s: jnp.ndarray, n_pos: int) -> jnp.ndarray:
    """[E, C] example scores -> [C] best-score combine (positives first)."""
    bp = jnp.max(s[:n_pos], axis=0)
    if s.shape[0] == n_pos:
        return bp
    bn = jnp.max(s[n_pos:], axis=0)
    return jnp.where(bp > bn, bp, -(bn * bn))


def _combined_scan(db: jnp.ndarray, examples: jnp.ndarray, combine,
                   db_scale=None) -> jnp.ndarray:
    """[N] combined scores: ``combine([E, C] example dots) -> [C]``
    applied over the whole db. An int8 db (``db_scale`` set) is
    dequantized chunk-by-chunk inside a ``lax.scan`` so the full f32
    copy never exists; only the per-row combined scalar survives."""
    n, d = db.shape
    if jnp.dtype(db.dtype) == jnp.int8:
        ex32 = examples.astype(jnp.float32)
        scale = jnp.asarray(db_scale, jnp.float32)
        chunk = min(65536, _round_up(n, 128))
        n_p = _round_up(n, chunk)
        db_p = _pad_dim(db, 0, n_p).reshape(n_p // chunk, chunk, d)

        def body(_, block):
            s = jax.lax.dot_general(
                ex32, block.astype(jnp.float32) * scale,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            return None, combine(s)

        _, comb = jax.lax.scan(body, None, db_p)
        return comb.reshape(-1)[:n]
    ex = examples.astype(db.dtype)
    s = jax.lax.dot_general(
        ex, db, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(db.dtype))       # [E, N]
    return combine(s)


def _finalize_topk(combined: jnp.ndarray, k: int, n_valid, row_mask):
    """[N] combined scores -> ((1, k) f32 scores, (1, k) i32 idx) with
    the repo-wide (-score, idx) tie order and -1/-inf padding."""
    n = combined.shape[0]
    if n_valid is None:
        n_valid = n
    col = jax.lax.iota(jnp.int32, n)
    combined = jnp.where(col < jnp.asarray(n_valid, jnp.int32),
                         combined, -jnp.inf)
    if row_mask is not None:
        combined = jnp.where(row_mask, combined, -jnp.inf)
    k_eff = min(k, n)
    top_s, top_i = jax.lax.top_k(combined[None, :], k_eff)  # stable: ties -> lower idx
    top_i = jnp.where(jnp.isneginf(top_s), -1, top_i)
    if k_eff < k:
        top_s = _pad_dim(top_s, 1, k)
        top_s = top_s.at[:, k_eff:].set(-jnp.inf)
        top_i = _pad_dim(top_i, 1, k)
        top_i = top_i.at[:, k_eff:].set(-1)
    return top_s.astype(jnp.float32), top_i.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_pos", "k"))
def best_score_topk(db: jnp.ndarray, examples: jnp.ndarray, n_pos: int,
                    k: int, db_scale=None, n_valid=None, row_mask=None):
    """Exact best-score top-k over db [N, d].

    ``examples``: [E, d] L2-normalized, positives in rows [:n_pos],
    negatives after. ``db_scale`` marks an int8 database (scanned in
    dequantizing chunks). Returns (scores [1, k] f32, idx [1, k] int32).
    """
    combined = _combined_scan(db, examples, lambda s: _combine(s, n_pos),
                              db_scale)
    return _finalize_topk(combined, k, n_valid, row_mask)


def _discover_combine(s: jnp.ndarray, n_pairs: int) -> jnp.ndarray:
    """[1 + 2P, C] scores (target; pair positives; pair negatives) ->
    [C] discover keys: pair votes lexicographically over target sim."""
    if n_pairs == 0:
        return s[0]
    sp = s[1:1 + n_pairs]
    sn = s[1 + n_pairs:1 + 2 * n_pairs]
    votes = jnp.sum(jnp.where(sp > sn, jnp.float32(1), jnp.float32(-1)),
                    axis=0)
    return votes * 4.0 + s[0]


def _context_combine(s: jnp.ndarray, n_pairs: int) -> jnp.ndarray:
    """[2P, C] pair scores -> [C] context loss (<= 0, 0 = in-zone)."""
    sp, sn = s[:n_pairs], s[n_pairs:2 * n_pairs]
    return jnp.sum(jnp.minimum(sp - sn, 0.0), axis=0)


@functools.partial(jax.jit, static_argnames=("n_pairs", "k"))
def discover_topk(db: jnp.ndarray, examples: jnp.ndarray, n_pairs: int,
                  k: int, db_scale=None, n_valid=None, row_mask=None):
    """qdrant-discovery top-k: ``examples`` rows are [target;
    pair positives (P); pair negatives (P)]. Rows rank by pair-vote
    total (+1 per pair won, -1 per pair lost), target similarity
    breaking ties within a vote level. With ``n_pairs == 0`` this is a
    plain target search. Same result contract as ``best_score_topk``;
    scores are the composite ``votes * 4 + sim`` keys."""
    combined = _combined_scan(db, examples,
                              lambda s: _discover_combine(s, n_pairs),
                              db_scale)
    return _finalize_topk(combined, k, n_valid, row_mask)


@functools.partial(jax.jit, static_argnames=("n_pairs", "k"))
def context_topk(db: jnp.ndarray, examples: jnp.ndarray, n_pairs: int,
                 k: int, db_scale=None, n_valid=None, row_mask=None):
    """qdrant context search: no target, rows rank by
    ``sum_i min(0, s_pos_i - s_neg_i)`` (0 = inside every pair's
    positive zone). ``examples``: [2P, d], positives first."""
    combined = _combined_scan(db, examples,
                              lambda s: _context_combine(s, n_pairs),
                              db_scale)
    return _finalize_topk(combined, k, n_valid, row_mask)


def _sharded_merge(local_topk, db: jnp.ndarray, examples: jnp.ndarray,
                   k: int, mesh: Mesh, axis: str, n_valid, row_mask):
    """Run ``local_topk(db_shard, ex, local_valid, mask_shard)`` per
    shard of a row-sharded database, then one all_gather + lexsort
    merge — the same shape as `sharded_cosine_topk`. Result replicated
    and identical to the single-device scan (ties by global row id)."""
    n, d = db.shape
    n_shards = mesh.shape[axis]
    assert n % n_shards == 0, (n, n_shards)
    local_n = n // n_shards
    if n_valid is None:
        n_valid = n
    if row_mask is not None:
        assert row_mask.shape == (n,), (row_mask.shape, n)

    def local_scan(db_shard, ex, mask_shard):
        shard_id = jax.lax.axis_index(axis)
        local_valid = jnp.clip(jnp.asarray(n_valid) - shard_id * local_n,
                               0, local_n)
        s, i = local_topk(db_shard, ex, local_valid, mask_shard)
        i = jnp.where(i >= 0, i + shard_id * local_n, i)
        all_s = jax.lax.all_gather(s, axis)
        all_i = jax.lax.all_gather(i, axis)
        all_s = jnp.transpose(all_s, (1, 0, 2)).reshape(1, -1)
        all_i = jnp.transpose(all_i, (1, 0, 2)).reshape(1, -1)
        order = jnp.lexsort((all_i, -all_s), axis=1)[:, :k]
        return (jnp.take_along_axis(all_s, order, axis=1),
                jnp.take_along_axis(all_i, order, axis=1))

    if row_mask is None:
        fn = shard_map(
            lambda db_, ex_: local_scan(db_, ex_, None), mesh=mesh,
            in_specs=(P(axis), P()), out_specs=(P(), P()),
            check_vma=False)
        return fn(db, examples)
    fn = shard_map(
        local_scan, mesh=mesh,
        in_specs=(P(axis), P(), P(axis)), out_specs=(P(), P()),
        check_vma=False)
    return fn(db, examples, jnp.asarray(row_mask, jnp.bool_))


def sharded_best_score_topk(db: jnp.ndarray, examples: jnp.ndarray,
                            n_pos: int, k: int, mesh: Mesh,
                            axis: str = "data", n_valid=None,
                            db_scale=None, row_mask=None):
    """best_score_topk over a database row-sharded across `axis`."""
    return _sharded_merge(
        lambda dbs, ex, lv, ms: best_score_topk(
            dbs, ex, n_pos, k, db_scale=db_scale, n_valid=lv, row_mask=ms),
        db, examples, k, mesh, axis, n_valid, row_mask)


def sharded_discover_topk(db: jnp.ndarray, examples: jnp.ndarray,
                          n_pairs: int, k: int, mesh: Mesh,
                          axis: str = "data", n_valid=None,
                          db_scale=None, row_mask=None):
    """discover_topk over a database row-sharded across `axis`."""
    return _sharded_merge(
        lambda dbs, ex, lv, ms: discover_topk(
            dbs, ex, n_pairs, k, db_scale=db_scale, n_valid=lv, row_mask=ms),
        db, examples, k, mesh, axis, n_valid, row_mask)


def sharded_context_topk(db: jnp.ndarray, examples: jnp.ndarray,
                         n_pairs: int, k: int, mesh: Mesh,
                         axis: str = "data", n_valid=None,
                         db_scale=None, row_mask=None):
    """context_topk over a database row-sharded across `axis`."""
    return _sharded_merge(
        lambda dbs, ex, lv, ms: context_topk(
            dbs, ex, n_pairs, k, db_scale=db_scale, n_valid=lv, row_mask=ms),
        db, examples, k, mesh, axis, n_valid, row_mask)


@functools.partial(jax.jit, static_argnames=("limit",))
def matrix_topk(vectors: jnp.ndarray, limit: int, n_valid=None):
    """Pairwise nearest neighbors WITHIN a sample — the scoring core of
    qdrant's distance-matrix API (search_matrix_pairs / offsets; the
    same points surface the reference drove via plain search,
    reference core_system.py:659-664).

    ``vectors``: [S, d] f32 L2-normalized sample rows (S may be padded;
    ``n_valid`` marks the real prefix — pad rows are masked out of both
    axes). One [S, S] MXU block with fp32 accumulation, self-pairs
    masked. Returns (scores [S, limit] f32, cols [S, limit] i32): each
    row's most-similar OTHER sample rows in (-score, idx) order, -1 in
    absent slots (rows past n_valid are all -1). ``cols`` index into
    the sample, not the database."""
    s = vectors.shape[0]
    if n_valid is None:
        n_valid = s
    n_valid = jnp.asarray(n_valid, jnp.int32)
    g = jnp.dot(vectors, vectors.T,
                precision=jax.lax.Precision.HIGHEST)      # [S, S] f32
    col = jax.lax.iota(jnp.int32, s)
    g = jnp.where(col[None, :] == col[:, None], -jnp.inf, g)  # no self
    g = jnp.where(col[None, :] < n_valid, g, -jnp.inf)        # pad cols
    g = jnp.where(col[:, None] < n_valid, g, -jnp.inf)        # pad rows
    k_eff = min(limit, s)
    top_s, top_i = jax.lax.top_k(g, k_eff)   # stable: ties -> lower idx
    top_i = jnp.where(jnp.isneginf(top_s), -1, top_i)
    if k_eff < limit:
        top_s = _pad_dim(top_s, 1, limit)
        top_s = top_s.at[:, k_eff:].set(-jnp.inf)
        top_i = _pad_dim(top_i, 1, limit)
        top_i = top_i.at[:, k_eff:].set(-1)
    return top_s.astype(jnp.float32), top_i.astype(jnp.int32)


def _finalize_topk_host(combined: np.ndarray, k: int, row_mask):
    """Numpy twin of `_finalize_topk` (same contract, full lexsort)."""
    if row_mask is not None:
        combined = np.where(np.asarray(row_mask, bool), combined, -np.inf)
    order = np.lexsort((np.arange(len(combined)), -combined))[:k]
    scores = combined[order].astype(np.float32)
    idx = order.astype(np.int32)
    idx = np.where(np.isneginf(scores), -1, idx)
    pad = k - len(order)
    if pad > 0:
        scores = np.concatenate([scores, np.full(pad, -np.inf, np.float32)])
        idx = np.concatenate([idx, np.full(pad, -1, np.int32)])
    return scores[None], idx[None]


def best_score_topk_host(matrix: np.ndarray, positives, negatives,
                         k: int, row_mask=None):
    """Numpy best-score top-k for the host index (no accelerator).

    Same contract; f32 dots like the native scan."""
    ex = [np.asarray(positives, np.float32)]
    n_pos = len(ex[0])
    if negatives is not None and len(np.atleast_2d(negatives)):
        ex.append(np.atleast_2d(np.asarray(negatives, np.float32)))
    s = np.concatenate([np.atleast_2d(e) for e in ex]) @ matrix.T  # [E, N]
    bp = s[:n_pos].max(axis=0)
    if s.shape[0] > n_pos:
        bn = s[n_pos:].max(axis=0)
        combined = np.where(bp > bn, bp, -(bn * bn))
    else:
        combined = bp
    return _finalize_topk_host(combined, k, row_mask)


def discover_topk_host(matrix: np.ndarray, target, pairs_pos, pairs_neg,
                       k: int, row_mask=None):
    """Numpy discover top-k (votes * 4 + target sim; see discover_topk)."""
    t = np.asarray(target, np.float32).reshape(-1)
    sim = (matrix @ t).astype(np.float32)
    pos = np.atleast_2d(np.asarray(pairs_pos, np.float32)) if pairs_pos is not None else np.zeros((0, len(t)), np.float32)
    if len(pos):
        neg = np.atleast_2d(np.asarray(pairs_neg, np.float32))
        sp = pos @ matrix.T
        sn = neg @ matrix.T
        votes = np.where(sp > sn, np.float32(1), np.float32(-1)).sum(axis=0)
        combined = votes * 4.0 + sim
    else:
        combined = sim
    return _finalize_topk_host(combined, k, row_mask)


def context_topk_host(matrix: np.ndarray, pairs_pos, pairs_neg,
                      k: int, row_mask=None):
    """Numpy context top-k (sum of min(0, s_pos - s_neg) per pair)."""
    sp = np.atleast_2d(np.asarray(pairs_pos, np.float32)) @ matrix.T
    sn = np.atleast_2d(np.asarray(pairs_neg, np.float32)) @ matrix.T
    combined = np.minimum(sp - sn, 0.0).sum(axis=0)
    return _finalize_topk_host(combined, k, row_mask)
