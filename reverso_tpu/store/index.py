"""DeviceIndex: the on-device, mesh-sharded search index.

The reference keeps all vectors inside qdrant's embedded local store and
scans them in Python per query (core_system.py:659-664). Here the vector
matrix lives in HBM, row-sharded across the mesh's "data" axis, padded to
tile/shard multiples at build time (so the fused kernel never copies), and
searched with the Pallas streaming top-k kernel + an all_gather merge.
"""
from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..config import SearchConfig, StoreConfig
from ..ops.recommend import (
    best_score_topk,
    best_score_topk_host,
    context_topk,
    context_topk_host,
    discover_topk,
    discover_topk_host,
    sharded_best_score_topk,
    sharded_context_topk,
    sharded_discover_topk,
)
from ..ops.topk import (
    cosine_topk_int8_exact,
    cosine_topk_int8_xla,
    cosine_topk_pallas,
    cosine_topk_xla,
    int8_clip_bound,
    sharded_cosine_topk,
    _round_up,
)
from ..parallel.sharding import row_sharding, replicated_sharding


@dataclass
class SearchResult:
    """Device search output joined with host payloads."""
    scores: np.ndarray          # [Q, k] f32
    indices: np.ndarray         # [Q, k] int32, -1 = below threshold / absent
    payloads: list              # [Q][k] payload dict or None


class HostIndex:
    """Exact cosine top-k on the HOST via the native C++ scan
    (native/reverso_native.cpp; numpy fallback without a compiler).

    The no-accelerator search path — the role qdrant local mode's
    embedded numpy scan plays in the reference (core_system.py:659-664),
    at multithreaded C++ speed. Same (-score, idx) result contract as
    DeviceIndex.search; returns numpy arrays (jax.device_get passes
    them through), so engine/serving code is agnostic to which index
    answered. Selected with SearchConfig.index = "host".
    """

    def __init__(self, vectors: np.ndarray, *, distance: str = "cosine"):
        self.distance = distance
        if distance == "manhattan":
            # no dot factorization exists for L1 — plain f32 rows,
            # scanned by the chunked numpy L1 (ops/l1.py)
            self.matrix = np.ascontiguousarray(vectors, np.float32)
            self.n_valid = len(vectors)
            self.dim = self.matrix.shape[1] if self.matrix.ndim == 2 else 0
            return
        if distance == "euclid":
            # same [x, ||x||^2] augmentation as DeviceIndex — the
            # native dot scan then ranks by -distance exactly (f32)
            v = np.asarray(vectors, np.float32)
            vectors = np.concatenate(
                [v, (v * v).sum(axis=1, keepdims=True)], axis=1)
        self.matrix = np.ascontiguousarray(vectors, np.float32)
        self.n_valid = len(vectors)
        self.dim = self.matrix.shape[1] if self.matrix.ndim == 2 else 0

    def search(self, queries, k: int, *, row_mask=None, **_):
        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None]
        if self.distance == "manhattan":
            from ..ops.l1 import manhattan_topk_host
            return manhattan_topk_host(self.matrix, q, k,
                                       row_mask=row_mask)
        if self.distance != "euclid":
            return self._search_dot(q, k, row_mask=row_mask)
        qa = np.concatenate(
            [2.0 * q, -np.ones((len(q), 1), np.float32)], axis=1)
        s, i = self._search_dot(qa, k, row_mask=row_mask)
        dist2 = np.maximum((q * q).sum(axis=1, keepdims=True) - s, 0.0)
        return (np.where(i >= 0, -np.sqrt(dist2), -np.inf)
                .astype(np.float32), i)

    def _search_dot(self, q, k: int, *, row_mask=None):
        from ..native import cpu_topk

        matrix, remap = self.matrix, None
        if row_mask is not None:
            # subset scan: row order is preserved, so the native scan's
            # (-score, idx) tie order maps back through `remap` unchanged
            remap = np.nonzero(np.asarray(row_mask, bool)[:self.n_valid])[0]
            matrix = np.ascontiguousarray(self.matrix[remap])
        if len(matrix) == 0:
            return (np.full((q.shape[0], k), -np.inf, np.float32),
                    np.full((q.shape[0], k), -1, np.int32))
        scores, idx = cpu_topk(matrix, q, k)
        idx = idx.astype(np.int32)
        if remap is not None:
            idx = np.where(idx >= 0, remap.astype(np.int32)[np.clip(idx, 0, None)], -1)
        return scores, idx

    def _no_euclid(self):
        if self.distance in ("euclid", "manhattan"):
            raise ValueError(
                "best_score/discover/context need a cosine or dot "
                f"index (this store's distance is {self.distance})")

    def best_score(self, positives, negatives=None, k: int = 10, *,
                   row_mask=None):
        """qdrant best_score recommend combine over the host matrix."""
        self._no_euclid()
        if row_mask is not None:
            row_mask = np.asarray(row_mask, bool)[:self.n_valid]
        return best_score_topk_host(self.matrix, positives, negatives, k,
                                    row_mask=row_mask)

    def discover(self, target, pairs_pos=None, pairs_neg=None,
                 k: int = 10, *, row_mask=None):
        """qdrant discovery search over the host matrix."""
        self._no_euclid()
        if row_mask is not None:
            row_mask = np.asarray(row_mask, bool)[:self.n_valid]
        return discover_topk_host(self.matrix, target, pairs_pos, pairs_neg,
                                  k, row_mask=row_mask)

    def context(self, pairs_pos, pairs_neg, k: int = 10, *, row_mask=None):
        """qdrant context search over the host matrix."""
        self._no_euclid()
        if row_mask is not None:
            row_mask = np.asarray(row_mask, bool)[:self.n_valid]
        return context_topk_host(self.matrix, pairs_pos, pairs_neg, k,
                                 row_mask=row_mask)


class MultiVecIndex:
    """Device-resident MaxSim index over one MULTIVECTOR space
    (qdrant multivectors — each point holds a ragged [T, d] matrix of
    sub-vectors; see ops/multivec.py for the scoring model).

    The flat sub-vector matrix lives in HBM (bf16 by default, fp32
    accumulation — same storage/accuracy trade as DeviceIndex); the
    raggedness is an int32 segment-id vector. `search` accepts [d] /
    [Tq, d] queries or lists of them and chunks the query batch so the
    intermediate [Q·Tq, M] score block stays bounded.

    With a multi-device `mesh`, points shard in contiguous ranges over
    the "data" axis (`ops.multivec.shard_multivec_layout`) and every
    search runs the per-shard scan + k-sized all_gather merge
    (`sharded_maxsim_topk`), bitwise-identical ids to the single-device
    scan — the same contract as DeviceIndex's sharded mode."""

    # bound on the [Q·Tq, M] f32 intermediate per launch
    _BLOCK_BYTES = 512 * 1024 * 1024

    def __init__(self, sub_vectors: np.ndarray, indptr: np.ndarray, *,
                 dtype: str = "bfloat16", mesh: Optional[Mesh] = None,
                 axis: str = "data"):
        subs = np.asarray(sub_vectors, np.float32)
        self.indptr = np.asarray(indptr, np.int64)
        self.n_valid = len(self.indptr)
        self.dim = subs.shape[1] if subs.ndim == 2 and subs.size else 0
        self._dtype = jnp.dtype(dtype)
        if self._dtype == jnp.int8:        # int8 makes MaxSim inexact
            self._dtype = jnp.dtype(jnp.bfloat16)
        self.mesh = mesh if (mesh is not None and len(subs)
                             and mesh.devices.size > 1) else None
        self.axis = axis
        if self.mesh is not None:
            from ..parallel.sharding import row_sharding
            from ..ops.multivec import shard_multivec_layout
            subs_sh, seg_sh, self._local_rows = shard_multivec_layout(
                subs, self.indptr, self.mesh.shape[axis])
            sh = row_sharding(self.mesh, axis)
            self.matrix = jax.device_put(
                jnp.asarray(subs_sh, self._dtype), sh)
            self._seg_ids = jax.device_put(jnp.asarray(seg_sh), sh)
            return
        self.matrix = jnp.asarray(subs, self._dtype) if len(subs) else \
            jnp.zeros((0, max(self.dim, 1)), self._dtype)
        # device-resident segment ids: rebuilding + uploading [M] i32
        # per search measured ~50 ms of the 80 ms call at 400k subs
        from ..ops.multivec import seg_ids_of
        self._seg_ids = jnp.asarray(seg_ids_of(self.indptr)) \
            if len(subs) else None

    @property
    def nbytes(self) -> int:
        return self.matrix.size * self.matrix.dtype.itemsize

    def search(self, queries, k: int, *, row_mask=None, **_):
        from ..ops.multivec import maxsim_topk, sharded_maxsim_topk

        if isinstance(queries, (list, tuple)):
            qlist = list(queries)
        else:
            q = np.asarray(queries, np.float32)
            qlist = [q] if q.ndim <= 2 else list(q)
        if not qlist:
            return (np.zeros((0, k), np.float32),
                    np.zeros((0, k), np.int32))
        tq = max(1 if np.asarray(a).ndim == 1 else len(np.asarray(a))
                 for a in qlist)
        m = max(len(self.matrix), 1)
        per_q = max(1, self._BLOCK_BYTES // (4 * tq * m))
        outs = []
        for lo in range(0, len(qlist), per_q):
            if self.mesh is not None:
                outs.append(sharded_maxsim_topk(
                    self.matrix, self._seg_ids, qlist[lo:lo + per_q], k,
                    self.mesh, self.axis, n_rows=self.n_valid,
                    local_rows=self._local_rows, row_mask=row_mask))
            else:
                outs.append(maxsim_topk(self.matrix, self.indptr,
                                        qlist[lo:lo + per_q], k,
                                        row_mask=row_mask,
                                        seg_ids=self._seg_ids))
        scores = np.concatenate([jax.device_get(s) for s, _ in outs])
        ids = np.concatenate([jax.device_get(i) for _, i in outs])
        return scores, ids


class BinaryIndex:
    """Sign-packed candidate index — the device half of qdrant's
    binary quantization (1 bit/dimension in HBM, 16x the bf16
    capacity; ops/binary.py documents the asymmetric scoring model).

    `search` returns CANDIDATES under the binary proxy score
    `sum q_i * sign(x_i - mean_i)` — callers that need true scores
    rescore the top oversampling*k ids against the full-precision rows
    (the engine's rescore adapter does; qdrant's `rescore`/
    `oversampling` search params are exactly this split). Bits are
    packed against the PER-DIM MEAN, not zero: q.x = q.mean +
    q.(x - mean), the first term is constant per query (rank-neutral)
    and the second is what the sign bits approximate — centering makes
    the approximation exact-in-expectation even when dimensions carry
    consistent offsets (real embedding towers do). Quality scales with
    dimension; intended for d >= 512 unit-normalized embeddings."""

    def __init__(self, vectors: np.ndarray, *, mesh: Optional[Mesh] = None,
                 axis: str = "data"):
        from ..ops.binary import lane_plane_width, pack_signs

        v = np.asarray(vectors, np.float32)
        self.n_valid = len(v)
        self.dim = v.shape[1] if v.ndim == 2 and v.size else 0
        self.mesh = mesh
        self.axis = axis
        self.center = (v.mean(axis=0, dtype=np.float64).astype(np.float32)
                       if self.n_valid else
                       np.zeros((max(self.dim, 1),), np.float32))
        # lane-aligned plane width: the Pallas scan DMAs whole lane
        # tiles (<= one 128-byte tile of padding per plane)
        d8 = lane_plane_width(self.dim)
        n_shards = mesh.shape[axis] if mesh is not None else 1
        # pre-align rows to the kernel's unroll (lcm(ring 4, group 2) *
        # db_tile) so the in-jit pad is a no-op, like DeviceIndex
        padded = _round_up(max(self.n_valid, 1), 4096 * n_shards)
        host = np.zeros((padded, d8), np.uint8)
        if self.n_valid:
            host[:self.n_valid] = pack_signs(v - self.center[None, :],
                                             plane_width=d8)
        arr = jnp.asarray(host)
        if mesh is not None:
            arr = jax.device_put(arr, row_sharding(mesh, axis))
        self.matrix = arr

    @classmethod
    def from_chunks(cls, chunk_fn, n: int, d: int, *,
                    mesh: Optional[Mesh] = None, axis: str = "data",
                    chunk: int = 1 << 19, center=None) -> "BinaryIndex":
        """Device-side chunked build: pack a corpus that never exists
        as one host (or device) f32 array. `chunk_fn(lo, rows)` returns
        a DEVICE [rows, d] float block — a seeded generator, a staged
        disk read, anything. Two passes: per-dim mean (skipped when
        `center` is given), then centered sign-pack straight into the
        padded uint8 buffer via dynamic_update_slice. Bit layout and
        padding are IDENTICAL to the host constructor (pinned by
        tests/test_binary.py); 16M x 1024 packs into 2 GB of HBM while
        the f32 source would be 64 GB. The capacity artifact
        (scripts/bench_capacity.py, EVAL.md) builds through this."""
        from ..ops.binary import lane_plane_width

        self = cls.__new__(cls)
        self.n_valid = int(n)
        self.dim = int(d)
        self.mesh = mesh
        self.axis = axis
        d8 = lane_plane_width(d)
        n_shards = mesh.shape[axis] if mesh is not None else 1
        padded = _round_up(max(n, 1), 4096 * n_shards)

        if center is None:
            sums = np.zeros(d, np.float64)
            for lo in range(0, n, chunk):
                rows = min(chunk, n - lo)
                x = chunk_fn(lo, rows)
                sums += np.asarray(
                    jnp.sum(jnp.asarray(x, jnp.float32), axis=0),
                    np.float64)
            center = (sums / max(n, 1)).astype(np.float32)
        self.center = np.asarray(center, np.float32)

        w8 = jnp.asarray(1 << np.arange(8, dtype=np.uint32))
        cdev = jnp.asarray(self.center)

        # the buffer is DONATED: without aliasing, every update holds
        # input + output copies live — 2x the packed bytes, which is
        # exactly what OOMs a 32M x 1024 (4 GB) build on a 16 GB chip
        @functools.partial(jax.jit, donate_argnums=(0,))
        def pack_block(buf, x, lo):
            # planar pack, same layout as ops.binary.pack_signs: bit j
            # of byte b = dim j*d8 + b; dims >= d (lane pad) are zeros
            bits = (jnp.asarray(x, jnp.float32) - cdev) > 0
            bits = jnp.pad(bits, ((0, 0), (0, 8 * d8 - d)))
            planes = bits.reshape(bits.shape[0], 8, d8)
            pk = (planes.astype(jnp.uint32)
                  * w8[None, :, None]).sum(axis=1).astype(jnp.uint8)
            return jax.lax.dynamic_update_slice(buf, pk, (lo, 0))

        buf = jnp.zeros((padded, d8), jnp.uint8)
        for lo in range(0, n, chunk):
            rows = min(chunk, n - lo)
            buf = pack_block(buf, chunk_fn(lo, rows), jnp.int32(lo))
        if mesh is not None:
            buf = jax.device_put(buf, row_sharding(mesh, axis))
        self.matrix = buf
        return self

    @property
    def nbytes(self) -> int:
        return self.matrix.size * self.matrix.dtype.itemsize

    def _padded_mask(self, row_mask) -> jnp.ndarray:
        m = np.zeros((self.matrix.shape[0],), np.bool_)
        src = np.asarray(row_mask, bool)
        m[:min(len(src), self.n_valid)] = src[:self.n_valid]
        arr = jnp.asarray(m)
        if self.mesh is not None:
            arr = jax.device_put(arr, row_sharding(self.mesh, self.axis))
        return arr

    def search(self, queries, k: int, *, row_mask=None, **_):
        from ..ops.binary import binary_topk, sharded_binary_topk

        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        if self.n_valid == 0:
            qn = q.shape[0]
            return (jnp.full((qn, k), -jnp.inf, jnp.float32),
                    jnp.full((qn, k), -1, jnp.int32))
        mask = self._padded_mask(row_mask) if row_mask is not None else None
        if self.mesh is not None and self.mesh.devices.size > 1:
            q = jax.device_put(q, replicated_sharding(self.mesh))
            return sharded_binary_topk(self.matrix, q, k, self.dim,
                                       self.mesh, axis=self.axis,
                                       n_valid=self.n_valid, row_mask=mask)
        # fused streaming kernel when its contract holds, XLA otherwise
        return binary_topk(self.matrix, q, k, self.dim,
                           n_valid=self.n_valid, row_mask=mask)


class PQIndex:
    """Product-quantized candidate index — the device half of qdrant's
    ProductQuantization (m bytes per vector in HBM; ops/pq.py documents
    the one-hot-through-MXU decompress scan and the on-device batched
    k-means training).

    `search` returns CANDIDATES under the PQ proxy score
    `bf16(q) . bf16(decode(codes))` — callers that need true scores
    rescore the top oversampling*k ids against the full-precision rows
    (the engine's rescore adapter does; qdrant's `rescore`/
    `oversampling` search params are exactly this split). Default
    m = d/8: the SAME d/8 bytes per row as BinaryIndex, approximated
    by 256-entry learned codebooks instead of 1-bit signs. Pass cached
    `codebooks`/`codes` (save_cache/load_cache) to skip training;
    codes covering only a prefix of the rows extend by encoding the
    tail against the cached codebooks (append-friendly, like
    IVFIndex.extend_cache)."""

    def __init__(self, vectors: np.ndarray, *, m: int = 0,
                 mesh: Optional[Mesh] = None, axis: str = "data",
                 iters: int = 25, sample: int = 65536, seed: int = 0,
                 codebooks=None, codes=None):
        from ..ops.pq import pq_encode, train_pq

        v = np.asarray(vectors, np.float32)
        self.n_valid = len(v)
        self.dim = v.shape[1] if v.ndim == 2 and v.size else 0
        self.mesh = mesh
        self.axis = axis
        if m <= 0:
            m = default_pq_m(self.dim)
        if self.dim and self.dim % m != 0:
            raise ValueError(f"pq m={m} must divide d={self.dim}")
        self.m = int(m)
        dsub = max(self.dim // self.m, 1) if self.dim else 1
        if self.n_valid == 0:
            self.codebooks = np.zeros((self.m, 256, dsub), np.float32)
            host_codes = np.zeros((0, self.m), np.uint8)
        else:
            self.codebooks = (np.asarray(codebooks, np.float32)
                              if codebooks is not None else
                              train_pq(v, self.m, iters=iters,
                                       sample=sample, seed=seed))
            if self.codebooks.shape != (self.m, 256, dsub):
                raise ValueError(
                    f"codebooks shape {self.codebooks.shape} does not "
                    f"match (m={self.m}, 256, dsub={dsub})")
            done = 0
            if codes is not None:
                codes = np.asarray(codes, np.uint8)
                if codes.ndim != 2 or codes.shape[1] != self.m \
                        or len(codes) > self.n_valid:
                    raise ValueError(
                        f"cached codes {codes.shape} do not cover a "
                        f"prefix of [{self.n_valid}, {self.m}]")
                done = len(codes)
            tail = (pq_encode(v[done:], self.codebooks)
                    if done < self.n_valid
                    else np.zeros((0, self.m), np.uint8))
            host_codes = (np.concatenate([codes, tail]) if done
                          else tail)
        self._host_codes = host_codes
        n_shards = mesh.shape[axis] if mesh is not None else 1
        # pre-pad rows to the XLA scan's chunk so the in-jit _pad_dim
        # is a no-op on big stores (small stores pad to 4096 and the
        # scan shrinks its chunk to match)
        unit = 65536 if self.n_valid >= 65536 else 4096
        padded = _round_up(max(self.n_valid, 1), unit * n_shards)
        host = np.zeros((padded, self.m), np.uint8)
        host[:self.n_valid] = host_codes
        arr = jnp.asarray(host)
        if mesh is not None:
            arr = jax.device_put(arr, row_sharding(mesh, axis))
        self.matrix = arr
        self._cb_dev = jnp.asarray(self.codebooks)

    @property
    def nbytes(self) -> int:
        return (self.matrix.size * self.matrix.dtype.itemsize
                + self._cb_dev.size * self._cb_dev.dtype.itemsize)

    def save_cache(self, path: str) -> None:
        """Persist codebooks + codes (the slow-to-recompute halves)."""
        np.savez(path, codebooks=self.codebooks,
                 codes=self._host_codes, m=self.m, n=self.n_valid)

    @classmethod
    def load_cache(cls, vectors: np.ndarray, path: str, *,
                   m: int = 0, mesh: Optional[Mesh] = None,
                   axis: str = "data"):
        """Rebuild from a save_cache file; codes covering a PREFIX of
        `vectors` extend by encoding the tail (appends never retrain).
        Returns None when the cache does not fit (caller retrains)."""
        try:
            with np.load(path) as z:
                cb, codes = z["codebooks"], z["codes"]
        except (OSError, KeyError, ValueError):
            return None
        if m > 0 and cb.shape[0] != m:
            return None
        if len(codes) > len(vectors):
            return None
        try:
            return cls(vectors, m=cb.shape[0], mesh=mesh, axis=axis,
                       codebooks=cb, codes=codes)
        except ValueError:
            return None

    def _padded_mask(self, row_mask) -> jnp.ndarray:
        m = np.zeros((self.matrix.shape[0],), np.bool_)
        src = np.asarray(row_mask, bool)
        m[:min(len(src), self.n_valid)] = src[:self.n_valid]
        arr = jnp.asarray(m)
        if self.mesh is not None:
            arr = jax.device_put(arr, row_sharding(self.mesh, self.axis))
        return arr

    def search(self, queries, k: int, *, row_mask=None, **_):
        from ..ops.pq import pq_topk_xla, sharded_pq_topk

        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        if self.n_valid == 0:
            qn = q.shape[0]
            return (jnp.full((qn, k), -jnp.inf, jnp.float32),
                    jnp.full((qn, k), -1, jnp.int32))
        mask = self._padded_mask(row_mask) if row_mask is not None else None
        if self.mesh is not None and self.mesh.devices.size > 1:
            q = jax.device_put(q, replicated_sharding(self.mesh))
            return sharded_pq_topk(self.matrix, self._cb_dev, q, k,
                                   self.dim, self.mesh, axis=self.axis,
                                   n_valid=self.n_valid, row_mask=mask)
        return pq_topk_xla(self.matrix, self._cb_dev, q, k, self.dim,
                           n_valid=self.n_valid, row_mask=mask)


def default_pq_m(d: int) -> int:
    """Largest subspace count with dsub >= 8 that divides d — d/8 when
    8 | d (one byte per 8 dims: binary's HBM cost, codebook recall)."""
    if d <= 0:
        return 1
    for dsub in range(8, d + 1):
        if d % dsub == 0:
            return max(d // dsub, 1)
    return 1


class DeviceIndex:
    """Immutable snapshot of an embedding matrix, resident on device.

    Rows are padded up to a multiple of (db_tile * mesh_axis_size) so the
    kernel streams aligned tiles and every shard has equal rows; `n_valid`
    masks the padding. Rebuild (cheap: one host->device transfer) after
    appending to the backing store.
    """

    def __init__(self, vectors: np.ndarray, *, mesh: Optional[Mesh] = None,
                 axis: str = "data", dtype: str = "bfloat16",
                 db_tile: int = 1024, distance: str = "cosine",
                 int8_quantile: float = 0.0):
        self.distance = distance
        if distance == "manhattan":
            # L1 has no dot factorization — rows are stored plain and
            # scanned by the chunked XLA L1 (ops/l1.py, VPU-bound by
            # the metric itself). int8's global scale would make the
            # stored rows a different L1 space, so coerce to bf16
            # (same rounding trade as every dense scan).
            if jnp.dtype(dtype) == jnp.int8:
                dtype = "bfloat16"
        if distance == "euclid":
            # Euclid rides the SAME dot kernels via augmentation:
            # [x, ||x||^2] . [2q, -1] = 2<q, x> - ||x||^2, monotone in
            # -||q - x||^2 per query; search() maps the ranking score
            # back to -distance for the returned k hits. int8's single
            # global scale would be dominated by the norm^2 column, so
            # euclid coerces int8 -> bf16.
            v = np.asarray(vectors, np.float32)
            vectors = np.concatenate(
                [v, (v * v).sum(axis=1, keepdims=True)], axis=1)
            if jnp.dtype(dtype) == jnp.int8:
                dtype = "bfloat16"
        n, d = vectors.shape
        self.n_valid = n
        self.dim = d
        self.mesh = mesh
        self.axis = axis
        self.db_tile = db_tile
        self._dtype = jnp.dtype(dtype)

        n_shards = mesh.shape[axis] if mesh is not None else 1
        # x12: the streaming kernel unrolls by lcm(ring depth, extraction
        # group) and pads rows to whole unroll units. The ring depth is
        # VMEM-adaptive (4, 3, or 2 depending on dtype/d/query block), so
        # pre-align to lcm(4,6,2)*db_tile = 12*db_tile — covering every
        # ring the kernel can pick — to keep the in-jit pad a no-op for
        # ALL query batch shapes (a 4*db_tile pre-pad met only the
        # 4-buffer ring; a 3-buffer launch then copied the whole padded
        # matrix inside jit on every search and compiled a fresh shape).
        padded = _round_up(max(n, 1), 12 * db_tile * n_shards)
        host = np.zeros((padded, d), np.float32)
        host[:n] = np.asarray(vectors, np.float32)
        self.scale: Optional[float] = None
        if self._dtype == jnp.int8:
            # int8 device copy (2x the bf16 capacity, same scan speed,
            # exact w.r.t. the stored int8 — ops.topk int8-exact path).
            # Disk persistence stays f32; only the HBM copy quantizes.
            # The clipping bound comes from the REAL rows (host[:n]):
            # the zero padding rows would drag a quantile to ~0.
            amax = int8_clip_bound(host[:max(n, 1)], int8_quantile)
            host = np.clip(np.round(host * (np.float32(127.0) / amax)),
                           -127, 127)
            self.scale = float(amax / np.float32(127.0))
        arr = jnp.asarray(host, self._dtype)
        if mesh is not None:
            arr = jax.device_put(arr, row_sharding(mesh, axis))
        self.matrix = arr

    @property
    def nbytes(self) -> int:
        return self.matrix.size * self.matrix.dtype.itemsize

    def _padded_mask(self, row_mask) -> jnp.ndarray:
        """[n_valid]-or-longer host mask -> device bool of padded length
        (padding rows False), sharded with the matrix rows on a mesh."""
        m = np.zeros((self.matrix.shape[0],), np.bool_)
        src = np.asarray(row_mask, bool)
        m[:min(len(src), self.n_valid)] = src[:self.n_valid]
        arr = jnp.asarray(m)
        if self.mesh is not None:
            arr = jax.device_put(arr, row_sharding(self.mesh, self.axis))
        return arr

    def search(self, queries, k: int, *, impl: str = "auto", row_mask=None):
        """Exact top-k under the index distance. For "cosine"/"dot"
        this is `_search_dot` directly (cosine is a dot over the unit
        rows the store holds); for "euclid" queries are augmented to
        `[2q, -1]` against the `[x, ||x||^2]` matrix — the resulting
        ranking key is monotone in -distance, and the k returned
        scores are mapped to exact `-||q - x||` (higher-is-better
        ordering everywhere, qdrant-style Euclid results are just the
        negation). "manhattan" scans with the chunked XLA L1 kernel
        (ops/l1.py) — scores are exact -L1 distances."""
        if self.distance == "manhattan":
            return self._search_l1(queries, k, row_mask=row_mask)
        if self.distance != "euclid":
            return self._search_dot(queries, k, impl=impl,
                                    row_mask=row_mask)
        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None]
        qa = np.concatenate(
            [2.0 * q, -np.ones((len(q), 1), np.float32)], axis=1)
        s, i = self._search_dot(qa, k, impl=impl, row_mask=row_mask)
        s = np.asarray(jax.device_get(s))
        i = np.asarray(jax.device_get(i))
        dist2 = np.maximum((q * q).sum(axis=1, keepdims=True) - s, 0.0)
        s_out = np.where(i >= 0, -np.sqrt(dist2),
                         -np.inf).astype(np.float32)
        return s_out, i

    def _search_l1(self, queries, k: int, *, row_mask=None):
        """Manhattan top-k over the device matrix — single-device
        chunked XLA scan or the sharded scan+merge on a mesh."""
        from ..ops.l1 import manhattan_topk_xla, sharded_manhattan_topk

        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        if self.n_valid == 0:
            qn = q.shape[0]
            return (jnp.full((qn, k), -jnp.inf, jnp.float32),
                    jnp.full((qn, k), -1, jnp.int32))
        mask = self._padded_mask(row_mask) if row_mask is not None else None
        if self.mesh is not None and self.mesh.devices.size > 1:
            q = jax.device_put(q, replicated_sharding(self.mesh))
            return sharded_manhattan_topk(self.matrix, q, k, self.mesh,
                                          axis=self.axis,
                                          n_valid=self.n_valid,
                                          row_mask=mask)
        return manhattan_topk_xla(self.matrix, q, k, n_valid=self.n_valid,
                                  row_mask=mask)

    def _search_dot(self, queries, k: int, *, impl: str = "auto",
                    row_mask=None):
        """Exact cosine top-k. queries: [Q, d] L2-normalized (host or device).

        Returns device arrays (scores [Q, k] f32, idx [Q, k] int32); idx -1
        marks slots beyond the number of valid rows. `row_mask`
        ([n_valid] bool, host) restricts the scan to matching rows
        (payload-filtered search): exact w.r.t. the subset, same
        (-score, idx) order. The fused kernel streams the mask beside
        the db tiles, so filtered searches keep kernel speed; k > 128
        (or a too-wide int8 dim) falls back to the masked XLA scans,
        with per-query-chunk score materialization bounding memory in
        the bf16 case.
        """
        int8 = self._dtype == jnp.int8
        q = jnp.asarray(queries, jnp.float32 if int8 else self._dtype)
        if q.ndim == 1:
            q = q[None, :]
        if self.n_valid == 0:
            qn = q.shape[0]
            return (jnp.full((qn, k), -jnp.inf, jnp.float32),
                    jnp.full((qn, k), -1, jnp.int32))
        if self.mesh is not None and self.mesh.devices.size > 1:
            mask = self._padded_mask(row_mask) if row_mask is not None else None
            q = jax.device_put(q, replicated_sharding(self.mesh))
            return sharded_cosine_topk(self.matrix, q, k, self.mesh,
                                       axis=self.axis, impl=impl,
                                       n_valid=self.n_valid,
                                       db_scale=self.scale,
                                       row_mask=mask)
        mask = self._padded_mask(row_mask) if row_mask is not None else None
        # the int8-exact kernel's f32-partial exactness bounds d <= 1040;
        # "auto" routes wider embeddings to the chunked int8 XLA scan
        # (any d, exact f32-HIGHEST dots) instead of crashing
        int8_exact_ok = int8 and self.dim * 127 * 127 < 2 ** 24
        if impl == "xla" or (impl == "auto"
                             and (k > 128 or (int8 and not int8_exact_ok))):
            if int8:
                # chunked scan: never dequantizes the whole matrix (a
                # full f32 copy is 4x the int8 footprint — OOM at the
                # capacity int8 exists for)
                return cosine_topk_int8_xla(self.matrix, self.scale,
                                            q.astype(jnp.float32), k,
                                            n_valid=self.n_valid,
                                            row_mask=mask)
            if mask is not None:
                # chunk queries so the [Qc, N_padded] f32 score block
                # stays bounded (~256 MB at 1M rows) regardless of batch
                qc = 64
                outs = [cosine_topk_xla(self.matrix, q[lo:lo + qc], k,
                                        n_valid=self.n_valid, row_mask=mask)
                        for lo in range(0, q.shape[0], qc)]
                if len(outs) == 1:
                    return outs[0]
                return (jnp.concatenate([s for s, _ in outs], axis=0),
                        jnp.concatenate([i for _, i in outs], axis=0))
            return cosine_topk_xla(self.matrix, q, k, n_valid=self.n_valid)
        if int8:
            return cosine_topk_int8_exact(self.matrix, self.scale, q, k,
                                          db_tile=self.db_tile,
                                          n_valid=self.n_valid,
                                          row_mask=mask)
        return cosine_topk_pallas(self.matrix, q, k,
                                  db_tile=self.db_tile, n_valid=self.n_valid,
                                  row_mask=mask)

    def _combined_search(self, parts, n_static: int, k: int, row_mask,
                         single_fn, sharded_fn):
        """Shared launch path for the example-combine searches
        (best_score / discover / context): stack example rows, pick the
        sharded or single-device op, apply the padded row mask."""
        if self.distance in ("euclid", "manhattan"):
            # euclid's matrix is the [x, ||x||^2] augmentation (example
            # rows are plain [d] vectors), and the combine formulas are
            # defined on similarity scores, not distances
            raise ValueError(
                "best_score/discover/context need a cosine or dot "
                f"index (this store's distance is {self.distance})")
        int8 = self._dtype == jnp.int8
        ex_dtype = jnp.float32 if int8 else self._dtype
        ex = jnp.asarray(np.concatenate(parts), ex_dtype)
        if self.n_valid == 0:
            return (jnp.full((1, k), -jnp.inf, jnp.float32),
                    jnp.full((1, k), -1, jnp.int32))
        mask = self._padded_mask(row_mask) if row_mask is not None else None
        if self.mesh is not None and self.mesh.devices.size > 1:
            ex = jax.device_put(ex, replicated_sharding(self.mesh))
            return sharded_fn(self.matrix, ex, n_static, k,
                              self.mesh, axis=self.axis,
                              n_valid=self.n_valid, db_scale=self.scale,
                              row_mask=mask)
        return single_fn(ex, n_static, k, mask)

    def best_score(self, positives, negatives=None, k: int = 10, *,
                   row_mask=None):
        """qdrant best_score recommend: rank rows by their best positive
        example score unless some negative example scores higher, in
        which case they sink to -(best_neg^2). Exact over the whole
        matrix (int8 dequantizes chunk-by-chunk); same (-score, idx)
        contract as `search`. `row_mask` filters rows like `search`.
        """
        pos = np.atleast_2d(np.asarray(positives, np.float32))
        n_pos = len(pos)
        if n_pos == 0:
            raise ValueError("best_score needs at least one positive example")
        parts = [pos]
        if negatives is not None:
            neg = np.atleast_2d(np.asarray(negatives, np.float32))
            if len(neg):
                parts.append(neg)
        return self._combined_search(
            parts, n_pos, k, row_mask,
            lambda ex, n, kk, mask: best_score_topk(
                self.matrix, ex, n, kk, db_scale=self.scale,
                n_valid=self.n_valid, row_mask=mask),
            sharded_best_score_topk)

    def discover(self, target, pairs_pos=None, pairs_neg=None,
                 k: int = 10, *, row_mask=None):
        """qdrant discovery search: rank by context-pair votes, target
        similarity breaking ties (ops.recommend.discover_topk). With no
        pairs this degrades to a plain target search. Same contracts as
        `best_score`."""
        t = np.asarray(target, np.float32).reshape(1, -1)
        pos = (np.atleast_2d(np.asarray(pairs_pos, np.float32))
               if pairs_pos is not None else np.zeros((0, t.shape[1]),
                                                      np.float32))
        neg = (np.atleast_2d(np.asarray(pairs_neg, np.float32))
               if pairs_neg is not None else np.zeros((0, t.shape[1]),
                                                      np.float32))
        if len(pos) != len(neg):
            raise ValueError(
                f"discover pairs must match: {len(pos)} positives vs "
                f"{len(neg)} negatives")
        return self._combined_search(
            [t, pos, neg], len(pos), k, row_mask,
            lambda ex, n, kk, mask: discover_topk(
                self.matrix, ex, n, kk, db_scale=self.scale,
                n_valid=self.n_valid, row_mask=mask),
            sharded_discover_topk)

    def context(self, pairs_pos, pairs_neg, k: int = 10, *, row_mask=None):
        """qdrant context search: rank by sum of min(0, s_pos - s_neg)
        over the pairs (ops.recommend.context_topk)."""
        pos = np.atleast_2d(np.asarray(pairs_pos, np.float32))
        neg = np.atleast_2d(np.asarray(pairs_neg, np.float32))
        if len(pos) != len(neg) or len(pos) == 0:
            raise ValueError(
                f"context needs matching non-empty pairs: {len(pos)} "
                f"positives vs {len(neg)} negatives")
        return self._combined_search(
            [pos, neg], len(pos), k, row_mask,
            lambda ex, n, kk, mask: context_topk(
                self.matrix, ex, n, kk, db_scale=self.scale,
                n_valid=self.n_valid, row_mask=mask),
            sharded_context_topk)
