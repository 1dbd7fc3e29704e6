"""Sparse-vector search: an inverted (term -> postings) index.

The role qdrant's sparse vectors play in the reference's store family
(the reference app itself never used them, reference
core_system.py:659-664 is dense-only; this completes the store's
query model so hybrid dense+sparse search works through the universal
query API). Sparse scoring is irregular scatter/gather — a VPU/MXU
anti-pattern — so unlike the dense scans this index is deliberately
HOST-side: postings live in numpy arrays sorted by term, and a query
is a handful of vectorized slices + one bincount accumulate. At
realistic shapes (1M rows x ~100 nnz, ~50-term queries) that is
sub-millisecond warm — far below the tunnel round-trip a device
launch would cost.

Measured (round 4, `scripts/bench_sparse.py`, PERF.md "Sparse
inverted-index scan"): cost is O(touched postings), so latency is set
by the VOCABULARY SHAPE, not row count alone — a long-tail vocabulary
(1M terms) touches thousands of postings per query (sub-ms); a hot
Zipf vocabulary (30k terms) touches millions (tens of ms in numpy).
The accumulate therefore routes through the native C++ scorer
(`native/reverso_native.cpp::reverso_sparse_score`) when available:
threads partition the ROW space and binary-search each postings
segment (rows are sorted within a segment), so it is race-free,
work-conserving, and BIT-identical to the sequential f64 numpy
reference it falls back to.

Exactness contract matches the dense paths: scores are f64 dot
products accumulated in deterministic term order, results ordered by
(-score, row id), `-1` marks absent slots. Rows sharing NO query term
are never returned (qdrant sparse semantics: no overlap = no hit,
even if another row scores negative).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .persist import StoreError, VectorStore, check_sparse_row


class SparseIndex:
    """Inverted index over one sparse vector space.

    Build cost is one argsort of the entry log; queries then slice the
    postings of each query term (searchsorted) and accumulate scores
    with one bincount. The index persists to
    `<db>/index/sparse_<space>_{count}_{vector_version}.npz` so later
    processes mmap/read it back instead of re-sorting (same pattern as
    the IVF k-means cache)."""

    def __init__(self, n_rows: int, terms: np.ndarray, starts: np.ndarray,
                 rows: np.ndarray, vals: np.ndarray):
        self.n_rows = int(n_rows)
        self.terms = terms      # [U] unique term ids, ascending (i64)
        self.starts = starts    # [U+1] posting ranges into rows/vals
        self.rows = rows        # [E] row id per posting (i32/i64)
        self.vals = vals        # [E] f32 value per posting

    # -- construction ----------------------------------------------------

    @classmethod
    def build(cls, entries: np.ndarray, indptr: np.ndarray) -> "SparseIndex":
        """From a store's entry log ([E] structured (i, v)) + per-row
        cumulative ends ([N] i64)."""
        n = len(indptr)
        e = len(entries)
        if e:
            nnz = np.diff(np.concatenate([[0], np.asarray(indptr)]))
            # int32 row ids: halves postings memory traffic (the scan
            # is bandwidth-bound) and is what the native scorer takes
            row_of = np.repeat(np.arange(n, dtype=np.int32), nnz)
            term = entries["i"].astype(np.int64)
            order = np.argsort(term, kind="stable")  # stable: row-id tie
            term = term[order]
            rows = row_of[order]
            vals = entries["v"][order].astype(np.float32)
            terms, first = np.unique(term, return_index=True)
            starts = np.concatenate([first, [e]]).astype(np.int64)
        else:
            terms = np.zeros(0, np.int64)
            starts = np.zeros(1, np.int64)
            rows = np.zeros(0, np.int32)
            vals = np.zeros(0, np.float32)
        return cls(n, terms, starts, rows, vals)

    @classmethod
    def from_store(cls, store: VectorStore, space: str, *,
                   cache: bool = True) -> "SparseIndex":
        """Build (or cache-load) the index for one sparse space of a
        store, keyed on (count, vector_version) like the device index."""
        path = cls._cache_path(store, space)
        if cache and path and os.path.exists(path):
            idx = cls._load(path, store.count)
            if idx is not None:
                return idx
        idx = cls.build(store.sparse_entries(space),
                        store.sparse_indptr(space))
        if cache and path:
            try:
                idx._save(path)
            except OSError:
                pass               # read-only filesystem: rebuild per process
        return idx

    @staticmethod
    def _cache_path(store: VectorStore, space: str) -> Optional[str]:
        return os.path.join(
            store.path, "index",
            f"sparse_{space}_{store.count}_{store.vector_version}.npz")

    def _save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp.npz"
        np.savez(tmp[:-4], n_rows=np.int64(self.n_rows), terms=self.terms,
                 starts=self.starts, rows=self.rows, vals=self.vals)
        os.replace(tmp, path)

    @classmethod
    def _load(cls, path: str, n_rows: int) -> Optional["SparseIndex"]:
        try:
            with np.load(path, allow_pickle=False) as z:
                if int(z["n_rows"]) != n_rows:
                    return None
                rows = np.asarray(z["rows"])
                if rows.dtype != np.int32:   # pre-round-4 i64 caches
                    rows = rows.astype(np.int32)
                return cls(n_rows, z["terms"], z["starts"],
                           rows, np.asarray(z["vals"]))
        except (OSError, ValueError, KeyError):
            return None

    # -- search ----------------------------------------------------------

    def search(self, query, k: int, *,
               row_mask: Optional[np.ndarray] = None,
               threshold: Optional[float] = None):
        """Top-k rows by sparse dot with `query` ({"indices","values"}
        dict or (indices, values) pair). Returns (scores [k] f32,
        ids [k] i32) with -1 marking absent slots — rows with no
        overlapping term never match (qdrant sparse semantics), and
        `row_mask`/`threshold` filter like the dense scans."""
        q_idx, q_val = check_sparse_row(query)
        k = int(k)
        if k < 1:
            raise StoreError(f"k must be >= 1, got {k}")
        scores = np.zeros(self.n_rows, np.float64)
        touched_u8 = np.zeros(self.n_rows, np.uint8)
        pos = np.searchsorted(self.terms, q_idx.astype(np.int64))
        seg_lo, seg_hi, seg_qv = [], [], []
        for p, t, qv in zip(pos.tolist(), q_idx.tolist(), q_val.tolist()):
            if p >= len(self.terms) or self.terms[p] != t:
                continue
            seg_lo.append(int(self.starts[p]))
            seg_hi.append(int(self.starts[p + 1]))
            seg_qv.append(qv)
        from ..native import sparse_score
        rows32 = self.rows if self.rows.dtype == np.int32 \
            else self.rows.astype(np.int32)
        if seg_lo and not sparse_score(
                rows32, self.vals, np.asarray(seg_lo), np.asarray(seg_hi),
                np.asarray(seg_qv, np.float32), self.n_rows,
                scores, touched_u8):
            # numpy reference (no native library): bit-identical —
            # the native path accumulates f64 in the same per-row
            # segment order
            for lo, hi, qv in zip(seg_lo, seg_hi, seg_qv):
                r = self.rows[lo:hi]
                scores[r] += self.vals[lo:hi].astype(np.float64) * qv
                touched_u8[r] = 1
        touched = touched_u8.astype(bool)
        if row_mask is not None:
            touched &= np.asarray(row_mask, bool)[: self.n_rows]
        if threshold is not None:
            touched &= scores >= float(threshold)
        cand = np.nonzero(touched)[0]
        out_s = np.full(k, -np.inf, np.float32)
        out_i = np.full(k, -1, np.int32)
        if len(cand):
            cs = scores[cand]
            if len(cand) > k:
                part = np.argpartition(-cs, k - 1)[:k]
                cand, cs = cand[part], cs[part]
            order = np.lexsort((cand, -cs))
            m = len(cand)
            out_s[:m] = cs[order].astype(np.float32)
            out_i[:m] = cand[order].astype(np.int32)
        return out_s, out_i
