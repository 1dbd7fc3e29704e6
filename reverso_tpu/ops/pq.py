"""Product-quantized candidate scan (qdrant ProductQuantization role).

qdrant's product quantization splits every vector into M subvectors,
replaces each with the id of its nearest codebook centroid (256 per
subspace -> one byte), and scans the code matrix for candidates that a
full-precision rescore then reorders — its highest-compression mode
(x16-x64 vs f32), always recommended with `rescore`/`oversampling`.
The reference app never enabled any quantization (cosine-only qdrant
local mode, reference core_system.py:600-622); here PQ completes the
capacity ladder next to int8 (2x, exact) and binary (16x, sign proxy):
at m = d/8 a PQ row costs the SAME d/8 bytes of HBM as a binary row
but approximates with 256-entry learned codebooks instead of 1-bit
signs.

STATUS (round 4, measured — EVAL.md "PQ vs binary at matched HBM"):
retained for qdrant API parity, NOT recommended. On the real chip at
matched HBM the binary scan dominates PQ on BOTH corpus shapes —
equal recall@10 (0.998) on near-duplicate data, HIGHER recall on the
tie-dense no-margin corpus (0.502 vs PQ's 0.409 — codebooks trained
on near-identical members collapse toward the centers and rank no
better than signs), at 3.2x less scan time (55 vs 175 ms @1M x 1024).
Use `--index-dtype binary` for capacity, `int8` for 2x-exact.

TPU-native shape of the scan: TPUs have no fast gather, so the classic
ADC table lookup is re-expressed as matmul work the MXU can run — each
code column one-hot-expands to [C, 256] bf16 and multiplies its
codebook [256, dsub], which IS the lookup (exactly one nonzero per
row), reconstructing the chunk to [C, d] bf16 in registers/VMEM; the
standard f32-accumulated MXU score matmul follows. Proxy scores are
`bf16(q) . bf16(decode(codes))` — the same asymmetric-scoring idea as
ops/binary.py (full-precision query against the compressed side).
Training runs ON DEVICE as one batched k-means over all M subspaces
simultaneously (assignment = batched matmul + argmin, update =
one-hot segment-sum matmul), with static shapes so the step compiles
once.

Result contract matches every other scan: ordered by (-score, idx),
ties to the lower row id, -1 in absent slots.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .topk import _pad_dim, _round_up

# code rows per scan step — the [C, d] bf16 reconstruction scratch is
# the transient (64k x 1024 = 128 MB), same budget as the bf16 scans
_CHUNK_ROWS = 65536
_K = 256                      # centroids per subspace = one uint8 code


def _check_cb(codebooks) -> tuple:
    cb = np.asarray(codebooks) if isinstance(codebooks, np.ndarray) \
        else codebooks
    m, k, dsub = cb.shape
    if k != _K:
        raise ValueError(f"codebooks must have {_K} centroids per "
                         f"subspace, got {k}")
    return m, dsub


@jax.jit
def _pq_kmeans_step(data, cent):
    """One Lloyd iteration over ALL subspaces at once.

    data [M, S, dsub] f32, cent [M, 256, dsub] f32 -> new centroids.
    Assignment is a batched matmul + argmin (ties to the lower
    centroid id); the update is a one-hot segment-sum matmul, slabbed
    under lax.scan so the [M, slab, 256] one-hot stays bounded. Empty
    clusters keep their previous centroid (deterministic)."""
    mm, s, dsub = data.shape
    slab = min(s, 1024)
    xs = data.reshape(mm, s // slab, slab, dsub).transpose(1, 0, 2, 3)
    cn = (cent * cent).sum(-1)                              # [M, K]

    def body(carry, x):
        sums, counts = carry
        dots = jnp.einsum("msd,mkd->msk", x, cent,
                          preferred_element_type=jnp.float32)
        a = jnp.argmin(cn[:, None, :] - 2.0 * dots, axis=2)
        oh = jax.nn.one_hot(a, _K, dtype=jnp.float32)       # [M, slab, K]
        sums = sums + jnp.einsum("msk,msd->mkd", oh, x,
                                 preferred_element_type=jnp.float32)
        counts = counts + oh.sum(axis=1)
        return (sums, counts), None

    init = (jnp.zeros((mm, _K, dsub), jnp.float32),
            jnp.zeros((mm, _K), jnp.float32))
    (sums, counts), _ = jax.lax.scan(body, init, xs)
    denom = jnp.maximum(counts[..., None], 1.0)
    return jnp.where(counts[..., None] > 0, sums / denom, cent)


def train_pq(vectors, m: int, *, iters: int = 25, sample: int = 65536,
             seed: int = 0) -> np.ndarray:
    """k-means codebooks [m, 256, d/m] f32 for a PQ index over
    `vectors` [n, d]. Trains on a deterministic sample (qdrant trains
    quantization on a sample too); all M subspaces iterate together on
    device in one batched k-means (static shapes: the step compiles
    once and runs `iters` times)."""
    v = np.asarray(vectors, np.float32)
    n, d = v.shape
    if m <= 0 or d % m != 0:
        raise ValueError(f"pq m={m} must divide d={d}")
    if n == 0:
        raise ValueError("cannot train PQ codebooks on an empty matrix")
    dsub = d // m
    rng = np.random.default_rng(seed)
    s = min(n, max(int(sample), _K))
    slab = min(s, 1024)
    s = max(slab, (s // slab) * slab)
    rows = np.arange(n) if s == n else rng.choice(n, size=s,
                                                  replace=False)
    data = v[np.sort(rows)].reshape(s, m, dsub).transpose(1, 0, 2)
    # init: one shared draw of sample rows (duplicate centroids from a
    # small corpus keep their init and simply go unused)
    init_rows = rng.choice(s, size=_K, replace=s < _K)
    cent = jnp.asarray(data[:, init_rows, :])
    data = jnp.asarray(data)
    for _ in range(max(1, int(iters))):
        cent = _pq_kmeans_step(data, cent)
    return np.asarray(jax.device_get(cent), np.float32)


@jax.jit
def _pq_assign(x, cb):
    """x [C, M, dsub] f32, cb [M, 256, dsub] f32 -> codes [C, M] uint8
    (nearest centroid per subspace, ties to the lower id)."""
    cn = (cb * cb).sum(-1)                                  # [M, K]
    cols = []
    for m_ in range(cb.shape[0]):   # static unroll: [C, K] transients
        dots = jax.lax.dot_general(
            x[:, m_, :], cb[m_], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # [C, K]
        cols.append(jnp.argmin(cn[m_][None, :] - 2.0 * dots, axis=1))
    return jnp.stack(cols, axis=1).astype(jnp.uint8)


def pq_encode(vectors, codebooks, *, chunk: int = _CHUNK_ROWS) -> np.ndarray:
    """[n, d] f32 -> [n, m] uint8 codes under `codebooks`
    [m, 256, d/m]. Chunked so every launch reuses one compiled shape."""
    m, dsub = _check_cb(codebooks)
    v = np.asarray(vectors, np.float32)
    n, d = v.shape
    if d != m * dsub:
        raise ValueError(f"d={d} does not match codebooks ({m}x{dsub})")
    if n == 0:
        return np.zeros((0, m), np.uint8)
    cb = jnp.asarray(np.asarray(codebooks, np.float32))
    chunk = min(chunk, _round_up(n, 128))
    out = np.empty((n, m), np.uint8)
    for lo in range(0, n, chunk):
        block = v[lo:lo + chunk]
        pad = chunk - len(block)
        if pad:
            block = np.pad(block, ((0, pad), (0, 0)))
        codes = jax.device_get(
            _pq_assign(jnp.asarray(block.reshape(chunk, m, dsub)), cb))
        take = min(chunk, n - lo)
        out[lo:lo + take] = codes[:take]
    return out


def pq_decode(codes, codebooks) -> np.ndarray:
    """[n, m] uint8 codes -> [n, d] f32 reconstruction (host numpy —
    the fp64-reference half of the parity tests and the centroid side
    of recall analyses)."""
    cb = np.asarray(codebooks, np.float32)
    m, dsub = _check_cb(cb)
    c = np.asarray(codes)
    return cb[np.arange(m)[None, :], c.astype(np.int64)] \
        .reshape(len(c), m * dsub)


def _decode_bf16(block, cb16, d: int):
    """[C, M] uint8 -> [C, d] bf16 reconstruction INSIDE jit: per
    subspace, the one-hot [C, 256] bf16 times its codebook [256, dsub]
    IS the table lookup (one nonzero per row -> the f32-accumulated
    matmul reproduces the bf16 centroid value exactly); TPUs have no
    fast gather, but they have an MXU."""
    m = cb16.shape[0]
    parts = []
    for m_ in range(m):       # static unroll: [C, 256] bf16 transients
        oh = jax.nn.one_hot(block[:, m_].astype(jnp.int32), _K,
                            dtype=jnp.bfloat16)
        parts.append(jax.lax.dot_general(
            oh, cb16[m_], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    return jnp.concatenate(parts, axis=1)[:, :d]


@functools.partial(jax.jit, static_argnames=("k", "d", "chunk"))
def pq_topk_xla(codes: jnp.ndarray, codebooks: jnp.ndarray,
                queries: jnp.ndarray, k: int, d: int, n_valid=None,
                row_mask=None, *, chunk: int = _CHUNK_ROWS):
    """Candidate top-k over a PQ code matrix.

    codes: [N, m] uint8 (pq_encode). codebooks: [m, 256, d/m] f32.
    queries: [Q, d] full precision. Returns (scores [Q, k] f32,
    idx [Q, k] i32) where scores are `bf16(q) . bf16(decode(codes))`
    accumulated in f32 — the asymmetric PQ proxy. `row_mask` ([N]
    bool) excludes rows exactly; `n_valid` masks trailing padding."""
    n = codes.shape[0]
    q = queries.shape[0]
    if n == 0:
        return (jnp.full((q, k), -jnp.inf, jnp.float32),
                jnp.full((q, k), -1, jnp.int32))
    if n_valid is None:
        n_valid = n
    n_valid = jnp.asarray(n_valid, jnp.int32)
    chunk = min(chunk, _round_up(n, 128))
    n_p = _round_up(n, chunk)
    db_p = _pad_dim(codes, 0, n_p).reshape(n_p // chunk, chunk, -1)
    mask_p = None
    if row_mask is not None:
        mask_p = _pad_dim(jnp.asarray(row_mask, jnp.bool_),
                          0, n_p).reshape(n_p // chunk, chunk)
    cb16 = jnp.asarray(codebooks, jnp.bfloat16)
    qb = queries.astype(jnp.bfloat16)
    k_eff = min(k, n)

    def body(carry, xs):
        s_c, i_c = carry
        block, base, mask_c = xs
        xhat = _decode_bf16(block, cb16, d)                # [C, d] bf16
        s = jax.lax.dot_general(
            qb, xhat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [Q, C]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + base
        s = jnp.where(col < n_valid, s, -jnp.inf)
        if mask_c is not None:
            s = jnp.where(mask_c[None, :], s, -jnp.inf)
        # stable merge: carry (lower ids) precedes the chunk, lax.top_k
        # keeps the leftmost of equal scores -> (-score, idx) order
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


def sharded_pq_topk(codes: jnp.ndarray, codebooks: jnp.ndarray,
                    queries: jnp.ndarray, k: int, d: int, mesh: Mesh,
                    axis: str = "data", n_valid=None, row_mask=None):
    """PQ candidate top-k over a row-sharded code matrix (codebooks
    replicated): per-shard scan + one all_gather + lexsort merge,
    identical results to the single-device scan — the same two-level
    shape as `sharded_cosine_topk`/`sharded_binary_topk`."""
    n = codes.shape[0]
    n_shards = mesh.shape[axis]
    assert n % n_shards == 0, (n, n_shards)
    local_n = n // n_shards
    if n_valid is None:
        n_valid = n
    if row_mask is not None:
        assert row_mask.shape == (n,), (row_mask.shape, n)

    def local_scan(db_shard, cb, qs, mask_shard):
        shard_id = jax.lax.axis_index(axis)
        local_valid = jnp.clip(jnp.asarray(n_valid) - shard_id * local_n,
                               0, local_n)
        s, i = pq_topk_xla(db_shard, cb, qs, k, d, n_valid=local_valid,
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
        fn = shard_map(lambda db_, cb_, qs_: local_scan(db_, cb_, qs_, None),
                       mesh=mesh, in_specs=(P(axis), P(), P()),
                       out_specs=(P(), P()), check_vma=False)
        return fn(codes, codebooks, queries)
    fn = shard_map(local_scan, mesh=mesh,
                   in_specs=(P(axis), P(), P(), P(axis)),
                   out_specs=(P(), P()), check_vma=False)
    return fn(codes, codebooks, queries, jnp.asarray(row_mask, jnp.bool_))
