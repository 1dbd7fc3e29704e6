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
    misses, so nprobe == n_clusters reproduces the exact scan.

Multi-host scale-out (documented design, exercised on the virtual mesh):
row-shard the cluster-sorted matrix per host over ICI exactly like the
flat index, each shard returns its local IVF top-k, and the shard
candidates tree-merge over DCN with the same (score, global-id) merge
used by `sharded_cosine_topk`.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.topk import _round_up, _dot_precision


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


class IVFIndex:
    """Approximate cosine top-k over cluster-sorted rows."""

    def __init__(self, vectors: np.ndarray, *, n_clusters: int = 256,
                 train_iters: int = 10, train_sample: int = 131072,
                 dtype: str = "bfloat16", seed: int = 0):
        n, d = vectors.shape
        if n == 0:
            raise ValueError("empty index")
        n_clusters = min(n_clusters, n)
        rng = np.random.default_rng(seed)
        self._dtype = jnp.dtype(dtype)

        vec32 = np.ascontiguousarray(vectors, np.float32)
        sample_idx = (rng.choice(n, min(train_sample, n), replace=False)
                      if n > train_sample else np.arange(n))
        sample = jnp.asarray(vec32[sample_idx], self._dtype)
        init = jnp.asarray(rng.choice(len(sample_idx), n_clusters,
                                      replace=False))
        cent, _ = _kmeans_fit(sample, init, n_clusters=n_clusters,
                              iters=train_iters)

        # assign all rows (chunked), sort rows by cluster
        assign = np.empty(n, np.int32)
        cent_d = cent
        chunk = 262144
        for lo in range(0, n, chunk):
            blk = jnp.asarray(vec32[lo:lo + chunk], self._dtype)
            s = jax.lax.dot_general(
                blk, cent_d, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            assign[lo:lo + chunk] = np.asarray(jnp.argmax(s, axis=1))

        order = np.argsort(assign, kind="stable")
        counts = np.bincount(assign, minlength=n_clusters)
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
        self.cmax = int(counts.max())
        cmax_pad = _round_up(max(self.cmax, 8), 8)

        self.n = n
        self.dim = d
        self.n_clusters = n_clusters
        self.centroids = cent_d
        self.row_ids = jnp.asarray(order.astype(np.int32))   # sorted -> orig
        self.offsets = jnp.asarray(offsets.astype(np.int32))
        self.counts = jnp.asarray(counts.astype(np.int32))
        self._cmax_pad = cmax_pad
        # sorted matrix, padded with an extra cmax_pad zero rows so
        # dynamic slices near the end never clamp into valid data
        sorted_m = np.zeros((n + cmax_pad, d), np.float32)
        sorted_m[:n] = vec32[order]
        self.matrix = jnp.asarray(sorted_m, self._dtype)

    def search(self, queries, k: int, *, nprobe: int = 8):
        """Returns (scores [Q, k] f32, original row ids [Q, k] int32)."""
        nprobe = min(nprobe, self.n_clusters)
        q = jnp.asarray(queries, self._dtype)
        if q.ndim == 1:
            q = q[None]
        return _ivf_search(self.matrix, self.centroids, self.offsets,
                           self.counts, self.row_ids, q, k=k, nprobe=nprobe,
                           cmax=self._cmax_pad, n=self.n)


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "cmax", "n"))
def _ivf_search(matrix, centroids, offsets, counts, row_ids, queries, *,
                k: int, nprobe: int, cmax: int, n: int):
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

        def one_query(qvec, b, c):
            rows = jax.lax.dynamic_slice_in_dim(matrix, b, cmax, axis=0)
            s = rows @ qvec.astype(rows.dtype)
            within = jnp.arange(cmax)
            s = jnp.where(within < c, s.astype(jnp.float32), -jnp.inf)
            sorted_idx = jnp.where(within < c, b + within, n)  # n -> pad row
            return s, sorted_idx

        s_p, i_p = jax.vmap(one_query)(queries, base[:, p], cnt[:, p])
        scores_all = jax.lax.dynamic_update_slice_in_dim(
            scores_all, s_p, p * cmax, axis=1)
        idx_all = jax.lax.dynamic_update_slice_in_dim(
            idx_all, i_p, p * cmax, axis=1)
        return scores_all, idx_all

    scores_all = jnp.full((qn, nprobe * cmax), -jnp.inf, jnp.float32)
    idx_all = jnp.full((qn, nprobe * cmax), n, jnp.int32)
    scores_all, idx_all = jax.lax.fori_loop(0, nprobe, probe,
                                            (scores_all, idx_all))

    k_eff = min(k, nprobe * cmax)
    top_s, pos = jax.lax.top_k(scores_all, k_eff)
    top_sorted_idx = jnp.take_along_axis(idx_all, pos, axis=1)
    # map sorted positions back to original row ids (pad row -> -1)
    row_ids_pad = jnp.concatenate([row_ids, jnp.full((1,), -1, jnp.int32)])
    top_ids = row_ids_pad[jnp.clip(top_sorted_idx, 0, n)]
    top_ids = jnp.where(jnp.isneginf(top_s), -1, top_ids)
    if k_eff < k:
        pad = k - k_eff
        top_s = jnp.pad(top_s, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        top_ids = jnp.pad(top_ids, ((0, 0), (0, pad)), constant_values=-1)
    return top_s, top_ids
