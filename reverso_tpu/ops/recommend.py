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


@functools.partial(jax.jit, static_argnames=("n_pos", "k"))
def best_score_topk(db: jnp.ndarray, examples: jnp.ndarray, n_pos: int,
                    k: int, db_scale=None, n_valid=None, row_mask=None):
    """Exact best-score top-k over db [N, d].

    ``examples``: [E, d] L2-normalized, positives in rows [:n_pos],
    negatives after. ``db_scale`` marks an int8 database (scanned in
    dequantizing chunks). Returns (scores [1, k] f32, idx [1, k] int32).
    """
    n, d = db.shape
    int8 = jnp.dtype(db.dtype) == jnp.int8
    if n_valid is None:
        n_valid = n
    n_valid = jnp.asarray(n_valid, jnp.int32)

    if int8:
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
            return None, _combine(s, n_pos)

        _, comb = jax.lax.scan(body, None, db_p)
        combined = comb.reshape(-1)[:n]
    else:
        ex = examples.astype(db.dtype)
        s = jax.lax.dot_general(
            ex, db, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(db.dtype))       # [E, N]
        combined = _combine(s, n_pos)

    col = jax.lax.iota(jnp.int32, n)
    combined = jnp.where(col < n_valid, combined, -jnp.inf)
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


def sharded_best_score_topk(db: jnp.ndarray, examples: jnp.ndarray,
                            n_pos: int, k: int, mesh: Mesh,
                            axis: str = "data", n_valid=None,
                            db_scale=None, row_mask=None):
    """best_score_topk over a database row-sharded across `axis` of `mesh`.

    Per-shard combined-score top-k, then one all_gather + lexsort merge
    — the same shape as `sharded_cosine_topk`. Result replicated and
    identical to the single-device scan (ties by global row id).
    """
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
        s, i = best_score_topk(db_shard, ex, n_pos, k, db_scale=db_scale,
                               n_valid=local_valid, row_mask=mask_shard)
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
