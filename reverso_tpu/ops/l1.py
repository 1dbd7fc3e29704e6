"""Manhattan (L1) distance top-k scans.

Completes the qdrant `Distance` config for bring-your-own-vector
stores (COSINE / DOT / EUCLID / MANHATTAN; the reference app itself was
cosine-only — reference core_system.py:600-603 creates its collection
with COSINE). Cosine/dot ride the MXU dot kernels and euclid maps onto
them via the norm augmentation (store/index.py), but L1 has no inner-
product factorization: `sum |q - x|` is irreducibly elementwise, so
this scan is VPU/HBM-bound by construction — O(Q*N*d) vector ops with
no matmul to hide them behind. That cost is inherent to the metric
(qdrant's own L1 scan is the same loop on CPU SIMD); the TPU-native
move is to keep the score block tiled (`lax.scan` over row chunks with
a carried running top-k, the full [Q, N] matrix never exists), let XLA
fuse the |q - x| broadcast into the chunk reduction, and keep the exact
(-score, idx) result contract of every other scan in the repo.

Scores are reported as NEGATED distances (higher-is-better ordering
everywhere, like the euclid path); ties break to the lower row id; -1
marks absent slots.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .topk import _pad_dim, _round_up

# rows per scan step: bounds the fused [Q, chunk, d] broadcast XLA
# works through per step (at d=1024 / Q=64 this is ~2 GFLOP-equiv of
# VPU work and a few hundred MB of fused traffic per step)
_CHUNK_ELEMS = 4 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("k",))
def manhattan_topk_xla(db: jnp.ndarray, queries: jnp.ndarray, k: int,
                       n_valid=None, row_mask=None):
    """Exact Manhattan top-k: scores are -sum_i |q_i - x_i|, f32.

    db: [N, d] (any float dtype; upcast to f32 per chunk — bf16 storage
    rounds the rows, the same trade every dense scan here makes).
    queries: [Q, d]. Returns (scores [Q, k] f32, idx [Q, k] i32)
    ordered by (-score, idx); `row_mask` ([N] bool) excludes rows
    exactly; `n_valid` masks trailing padding rows.
    """
    n, d = db.shape
    q = queries.shape[0]
    if n == 0:
        return (jnp.full((q, k), -jnp.inf, jnp.float32),
                jnp.full((q, k), -1, jnp.int32))
    if n_valid is None:
        n_valid = n
    n_valid = jnp.asarray(n_valid, jnp.int32)
    chunk = max(128, _CHUNK_ELEMS // max(d, 1) // 128 * 128)
    chunk = min(chunk, _round_up(n, 128))
    n_p = _round_up(n, chunk)
    db_p = _pad_dim(db, 0, n_p).reshape(n_p // chunk, chunk, d)
    mask_p = None
    if row_mask is not None:
        mask_p = _pad_dim(jnp.asarray(row_mask, jnp.bool_),
                          0, n_p).reshape(n_p // chunk, chunk)
    q32 = queries.astype(jnp.float32)
    k_eff = min(k, n)

    def body(carry, xs):
        s_c, i_c = carry
        block, base, mask_c = xs
        diff = jnp.abs(q32[:, None, :] - block.astype(jnp.float32)[None])
        s = -jnp.sum(diff, axis=-1)                       # [Q, chunk]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + base
        s = jnp.where(col < n_valid, s, -jnp.inf)
        if mask_c is not None:
            s = jnp.where(mask_c[None, :], s, -jnp.inf)
        # stable merge: carry candidates (lower ids) precede the chunk,
        # lax.top_k keeps the leftmost of equal scores -> (-score, idx)
        all_s = jnp.concatenate([s_c, s], axis=1)
        all_i = jnp.concatenate([i_c, col], axis=1)
        top_s, pos = jax.lax.top_k(all_s, k_eff)
        return (top_s, jnp.take_along_axis(all_i, pos, axis=1)), None

    init = (jnp.full((q, k_eff), -jnp.inf, jnp.float32),
            jnp.full((q, k_eff), -1, jnp.int32))
    bases = jnp.arange(n_p // chunk, dtype=jnp.int32) * chunk
    (top_s, top_i), _ = jax.lax.scan(body, init, (db_p, bases, mask_p))
    if k_eff < k:
        top_s = _pad_dim(top_s, 1, k)
        top_s = top_s.at[:, k_eff:].set(-jnp.inf)
        top_i = _pad_dim(top_i, 1, k)
    top_i = jnp.where(jnp.isneginf(top_s), -1, top_i)
    return top_s, top_i.astype(jnp.int32)


def sharded_manhattan_topk(db: jnp.ndarray, queries: jnp.ndarray, k: int,
                           mesh: Mesh, axis: str = "data",
                           n_valid=None, row_mask=None):
    """Manhattan top-k over a row-sharded database: per-shard chunked
    scan + one all_gather + lexsort merge — the same two-level shape as
    `sharded_cosine_topk`, with identical-to-single-device results
    (deterministic (-score, global id) tie order)."""
    n, d = db.shape
    n_shards = mesh.shape[axis]
    assert n % n_shards == 0, (n, n_shards)
    local_n = n // n_shards
    if n_valid is None:
        n_valid = n
    if row_mask is not None:
        assert row_mask.shape == (n,), (row_mask.shape, n)

    def local_scan(db_shard, qs, mask_shard):
        shard_id = jax.lax.axis_index(axis)
        local_valid = jnp.clip(jnp.asarray(n_valid) - shard_id * local_n,
                               0, local_n)
        s, i = manhattan_topk_xla(db_shard, qs, k, n_valid=local_valid,
                                  row_mask=mask_shard)
        i = jnp.where(i >= 0, i + shard_id * local_n, i)
        all_s = jax.lax.all_gather(s, axis)
        all_i = jax.lax.all_gather(i, axis)
        qn = qs.shape[0]
        all_s = jnp.transpose(all_s, (1, 0, 2)).reshape(qn, -1)
        all_i = jnp.transpose(all_i, (1, 0, 2)).reshape(qn, -1)
        order = jnp.lexsort((all_i, -all_s), axis=1)[:, :k]
        return (jnp.take_along_axis(all_s, order, axis=1),
                jnp.take_along_axis(all_i, order, axis=1))

    if row_mask is None:
        fn = shard_map(lambda db_, qs_: local_scan(db_, qs_, None),
                       mesh=mesh, in_specs=(P(axis), P()),
                       out_specs=(P(), P()), check_vma=False)
        return fn(db, queries)
    fn = shard_map(local_scan, mesh=mesh,
                   in_specs=(P(axis), P(), P(axis)),
                   out_specs=(P(), P()), check_vma=False)
    return fn(db, queries, jnp.asarray(row_mask, jnp.bool_))


def manhattan_topk_host(vectors: np.ndarray, queries: np.ndarray, k: int,
                        *, row_mask=None, chunk: int = 16384):
    """Host (numpy) exact Manhattan top-k — the HostIndex counterpart
    for no-accelerator deployments. Same result contract. Carries a
    running top-k across row chunks (the [Q, N] score matrix never
    materializes — at 1M rows x 256 queries it would be a gigabyte;
    memory stays O(Q * (k + chunk)))."""
    v = np.asarray(vectors, np.float32)
    q = np.asarray(queries, np.float32)
    if q.ndim == 1:
        q = q[None]
    n = len(v)
    nq = len(q)
    keep = None
    if row_mask is not None:
        keep = np.asarray(row_mask, bool)[:n]
    k_eff = min(k, n)
    run_s = np.full((nq, k_eff), -np.inf, np.float32)
    run_i = np.full((nq, k_eff), -1, np.int64)
    for lo in range(0, n, chunk):
        block = v[lo:lo + chunk]
        s = -np.abs(q[:, None, :] - block[None]).sum(
            -1, dtype=np.float32)
        cols = np.arange(lo, lo + len(block))
        if keep is not None:
            s[:, ~keep[lo:lo + len(block)]] = -np.inf
        # merge: carry (lower ids) precedes the chunk; lexsort on
        # (-score, id) keeps the exact tie order
        all_s = np.concatenate([run_s, s], axis=1)
        all_i = np.concatenate(
            [run_i, cols[None].repeat(nq, 0)], axis=1)
        # absent carry slots (id -1) must sort last: their score is
        # -inf, and lexsort's id key only breaks FINITE ties
        order = np.lexsort(
            (np.where(all_i < 0, np.iinfo(np.int64).max, all_i),
             -all_s), axis=1)[:, :k_eff]
        run_s = np.take_along_axis(all_s, order, axis=1)
        run_i = np.take_along_axis(all_i, order, axis=1)
    out_s = np.full((nq, k), -np.inf, np.float32)
    out_i = np.full((nq, k), -1, np.int32)
    if n:
        out_s[:, :k_eff] = run_s
        out_i[:, :k_eff] = run_i.astype(np.int32)
        out_i[np.isneginf(out_s)] = -1
    return out_s, out_i
