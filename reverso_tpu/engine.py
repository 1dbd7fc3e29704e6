"""Reverso: the engine facade.

Public API mirroring the reference's `SimpleReverso`
(reference core_system.py:44-757) — detect_regions / extract_embeddings /
process_image_direct_pe / create_database / search_similar /
visualize_detections / list-load-delete-unlock — engineered properly:

  * the model forward is batched and jitted (not per-image, not
    re-initialized per call like the reference's detector,
    core_system.py:249);
  * the search index is the device-resident `DeviceIndex`, rebuilt lazily
    after store mutations, instead of a Python scan;
  * per-query state is returned to the caller AND kept on the engine for
    UI convenience, but the engine is explicitly not thread-safe for
    concurrent queries (the reference had a shared-state race across its
    Gradio callbacks, SURVEY.md §5.2 — the UI layer here serializes).

Status-message strings keep the reference's emoji format because the UI
surfaces them verbatim.
"""
from __future__ import annotations

import json
import os
import threading
from typing import Optional, Sequence

import numpy as np

from .config import EngineConfig, default_config
from .detect.regions import Regions, parse_prompts
from .ingest.images import preprocess_pil
from .ingest.pipeline import (
    build_database, direct_pe_metadata, region_metadata,
)
from .models.pe import PerceptionEncoder
from .parallel.sharding import make_mesh
from .store import (
    VectorStore, DeviceIndex, StoreError, StoreLockedError,
    list_databases as _list_databases,
    delete_database as _delete_database,
    unlock_database as _unlock_database,
)
from .utils.logging import get_logger
from .utils.profiling import Metrics
from .viz import visualize_detections as _viz, render_result_thumbnail, to_rgb_array

log = get_logger("engine")


def _sample_rows(rng: np.random.Generator, n: int, count: int,
                 mask=None) -> np.ndarray:
    """Up to `n` distinct row ids drawn uniformly without replacement
    (unsorted). Shared by `Reverso.query`'s `{"sample": "random"}` and
    `Reverso.search_matrix`.

    When no filter narrows the population and n << count, rejection
    sampling avoids materializing a [count]-sized id array (numpy's
    `choice(replace=False)` permutes the whole population — 32 MB of
    ids per draw at 4M rows)."""
    if mask is not None:
        valid = np.nonzero(mask)[0]
        if len(valid) <= n:
            rows = valid.copy()
            rng.shuffle(rows)
            return rows
        return rng.choice(valid, size=n, replace=False)
    if count <= n:
        rows = np.arange(count)
        rng.shuffle(rows)
        return rows
    if n * 32 <= count:
        out: list = []
        seen: set = set()
        while len(out) < n:
            for v in rng.integers(0, count, size=2 * (n - len(out))):
                v = int(v)
                if v not in seen:
                    seen.add(v)
                    out.append(v)
                    if len(out) == n:
                        break
        return np.asarray(out, np.int64)
    return rng.choice(count, size=n, replace=False)


def _resize_mask(mask: np.ndarray, size: int) -> np.ndarray:
    """Nearest-neighbor mask resize to the model input resolution."""
    h, w = mask.shape
    ys = (np.arange(size) * h // size).clip(0, h - 1)
    xs = (np.arange(size) * w // size).clip(0, w - 1)
    return mask[np.ix_(ys, xs)].astype(np.float32)


def load_or_build_ivf(store, vectors: np.ndarray, scfg, dtype: str,
                      *, mesh=None):
    """Load, extend, or build the store's IVF index, persisting the
    k-means result next to the store.

    The cache is keyed on (clusters, count, mutation_epoch, spill,
    balance): a process restart reloads in one fancy-index pass instead
    of retraining. The epoch only moves when existing rows are
    rewritten (truncate), so a cache whose epoch matches but whose
    count is SMALLER covers an intact prefix — new rows are assigned
    to the cached centroids (extend) instead of retraining k-means.
    Shared by the engine's `_get_index` and the CLI `tune` command (so
    tuning warms exactly the cache serving will use)."""
    from .store import IVFIndex

    count = store.count
    cache_dir = os.path.join(store.path, "index")
    sp = f"_sp{round(scfg.ivf_spill * 1000)}" if scfg.ivf_spill else ""
    if scfg.ivf_balance:
        sp += f"_b{round(scfg.ivf_balance * 100)}"
    stem = f"ivf_c{scfg.ivf_clusters}"
    tail = f"_{store.mutation_epoch}{sp}.npz"
    cache = os.path.join(cache_dir, f"{stem}_{count}{tail}")
    ivf = None
    if os.path.exists(cache):
        ivf = IVFIndex.load_cache(vectors, cache, dtype=dtype, mesh=mesh)
    dirty = ivf is None
    if ivf is None and os.path.isdir(cache_dir):
        for f in sorted(os.listdir(cache_dir), reverse=True):
            if f.startswith(stem + "_") and f.endswith(tail):
                ivf = IVFIndex.extend_cache(
                    vectors, os.path.join(cache_dir, f),
                    dtype=dtype, mesh=mesh)
                if ivf is not None:
                    break
    if ivf is None:
        ivf = IVFIndex(vectors, n_clusters=min(scfg.ivf_clusters, count),
                       dtype=dtype, spill=scfg.ivf_spill,
                       balance=scfg.ivf_balance, mesh=mesh)
    if dirty:
        # prune only THIS config's stale caches (any count/epoch):
        # sibling configs' caches — a different clusters/spill/balance
        # an A/B alternates with — stay valid and reloadable, so
        # flipping between two configs does not retrain k-means.
        def _same_cfg(f: str) -> bool:
            if not (f.startswith(stem + "_") and f.endswith(".npz")):
                return False
            parts = f[len(stem) + 1:-4].split("_", 2)
            if len(parts) < 2 or not (parts[0].isdigit()
                                      and parts[1].isdigit()):
                return False
            extra = parts[2] if len(parts) > 2 else ""
            return ("_" + extra if extra else "") == sp
        try:
            if os.path.isdir(cache_dir):
                for old in os.listdir(cache_dir):
                    if _same_cfg(old):
                        os.remove(os.path.join(cache_dir, old))
            ivf.save_cache(cache)
        except OSError:
            pass      # read-only store: rebuild per process
    return ivf


def load_or_build_pq(store, vectors: np.ndarray, scfg, *,
                     space: str = "", mesh=None):
    """Load, extend, or build the store's PQ index for one vector
    space, persisting the trained codebooks + codes next to the store
    (same cache scheme as load_or_build_ivf: keyed on (space, m,
    count, mutation_epoch); a cache with a SMALLER count at the same
    epoch covers an intact prefix, so appends encode only the tail
    instead of retraining k-means)."""
    from .store import PQIndex
    from .store.index import default_pq_m

    count = store.count
    dim = vectors.shape[1] if vectors.ndim == 2 and vectors.size else 0
    m = scfg.pq_m if scfg.pq_m > 0 else default_pq_m(dim)
    cache_dir = os.path.join(store.path, "index")
    # space names are already filename-safe (the store writes
    # vectors_<space>.bin)
    stem = f"pq_{space}_m{m}" if space else f"pq_m{m}"
    tail = f"_{store.mutation_epoch}.npz"
    cache = os.path.join(cache_dir, f"{stem}_{count}{tail}")
    pqi = None
    if os.path.exists(cache):
        pqi = PQIndex.load_cache(vectors, cache, m=m, mesh=mesh)
    dirty = pqi is None
    if pqi is None and os.path.isdir(cache_dir):
        for f in sorted(os.listdir(cache_dir), reverse=True):
            if f.startswith(stem + "_") and f.endswith(tail):
                pqi = PQIndex.load_cache(
                    vectors, os.path.join(cache_dir, f), m=m, mesh=mesh)
                if pqi is not None:
                    break
    if pqi is None:
        pqi = PQIndex(vectors, m=m, mesh=mesh)
    if dirty:
        def _same_cfg(f: str) -> bool:
            return (f.startswith(stem + "_") and f.endswith(".npz")
                    and f[len(stem) + 1:-4].replace("_", "").isdigit())
        try:
            os.makedirs(cache_dir, exist_ok=True)
            if os.path.isdir(cache_dir):
                for old in os.listdir(cache_dir):
                    if _same_cfg(old):
                        os.remove(os.path.join(cache_dir, old))
            pqi.save_cache(cache)
        except OSError:
            pass      # read-only store: rebuild per process
    return pqi


class _IVFSearchAdapter:
    """DeviceIndex-shaped facade over IVFIndex (approximate mode)."""

    def __init__(self, ivf, nprobe: int, impl: str = "auto"):
        self._ivf = ivf
        self.nprobe = nprobe
        self.impl = impl
        self.n_valid = ivf.n

    def search(self, queries, k: int, *, row_mask=None, **_):
        return self._ivf.search(queries, k, nprobe=self.nprobe,
                                impl=self.impl, row_mask=row_mask)


class _BinaryRescoreAdapter:
    """DeviceIndex-shaped facade over a quantized CANDIDATE index
    (BinaryIndex or PQIndex): oversampled compressed scan + exact f32
    rescore of the candidates against the full-precision rows —
    qdrant's quantization search semantics (`rescore`/`oversampling`
    params). Final results are the exact (-score, idx) order of the
    candidate set; with rescore disabled the raw proxy scores surface
    (qdrant rescore=False)."""

    def __init__(self, bindex, vectors: np.ndarray, *,
                 oversampling: float = 3.0, rescore: bool = True):
        self._b = bindex
        self._v = vectors          # host f32 rows (mmap-backed is fine)
        self.oversampling = max(1.0, float(oversampling))
        self.rescore = rescore
        self.n_valid = bindex.n_valid
        self.dim = bindex.dim

    @property
    def nbytes(self) -> int:
        return self._b.nbytes

    def search(self, queries, k: int, *, row_mask=None, **_):
        import math as _math

        import jax

        q = np.asarray(jax.device_get(queries), np.float32)
        if q.ndim == 1:
            q = q[None]
        if self.n_valid == 0:
            # empty store: the same clean -1 page every index returns
            # (the rescore gather below would index a [0, d] array)
            return (np.full((len(q), k), -np.inf, np.float32),
                    np.full((len(q), k), -1, np.int32))
        k_fetch = min(max(k, int(_math.ceil(k * self.oversampling))),
                      self.n_valid)
        s, i = (np.asarray(jax.device_get(a))
                for a in self._b.search(q, k_fetch, row_mask=row_mask))
        if not self.rescore:
            out_s = np.full((len(q), k), -np.inf, np.float32)
            out_i = np.full((len(q), k), -1, np.int32)
            w = min(k, k_fetch)
            out_s[:, :w] = s[:, :w]
            out_i[:, :w] = i[:, :w]
            return out_s, out_i
        safe = np.clip(i, 0, None)
        cand = np.asarray(self._v[safe.ravel()], np.float32) \
            .reshape(len(q), k_fetch, -1)                  # [Q, kf, d]
        scores = np.einsum("qkd,qd->qk", cand, q).astype(np.float32)
        scores[i < 0] = -np.inf
        tie_id = np.where(i < 0, np.iinfo(np.int32).max, i)
        order = np.lexsort((tie_id, -scores), axis=1)[:, :k]
        out_s = np.full((len(q), k), -np.inf, np.float32)
        out_i = np.full((len(q), k), -1, np.int32)
        w = order.shape[1]
        out_s[:, :w] = np.take_along_axis(scores, order, axis=1)
        out_i[:, :w] = np.take_along_axis(i, order, axis=1)
        out_i[np.isneginf(out_s)] = -1
        return out_s, out_i


class _PresenceMaskedIndex:
    """Facade over any dense index that excludes delete_vectors rows.

    qdrant's delete_vectors removes a named vector from a point
    without deleting the point; the store records those rows in a mask
    file (VectorStore.deleted_rows) and this wrapper folds the mask
    into every scan's `row_mask`, so the one choke point (_get_index)
    covers every caller — plain search, the batcher, recommend/
    discover/context, prefetch branches, groups, MMR pools. Capability
    probing stays honest: `best_score`/`discover`/`context` resolve
    through __getattr__, so hasattr() mirrors the wrapped index (the
    engine's "not supported on IVF" errors keep firing)."""

    _COMBINE = ("best_score", "discover", "context")

    def __init__(self, index, presence: np.ndarray):
        self._ix = index
        self._presence = presence            # [count] bool, False = deleted

    def _and(self, row_mask):
        if row_mask is None:
            return self._presence
        m = np.array(row_mask, dtype=bool, copy=True)
        n = min(len(m), len(self._presence))
        m[:n] &= self._presence[:n]
        return m

    def search(self, queries, k: int, **kw):
        kw["row_mask"] = self._and(kw.get("row_mask"))
        return self._ix.search(queries, k, **kw)

    def __getattr__(self, name):
        inner = getattr(self._ix, name)      # AttributeError passes through
        if name in self._COMBINE:
            def call(*args, row_mask=None, **kw):
                return inner(*args, row_mask=self._and(row_mask), **kw)
            return call
        return inner


class Reverso:
    """Visual investigation engine: detect -> embed -> store -> search."""

    # "caller did not pass this" sentinel: distinguishes an EXPLICIT
    # None (e.g. a UI session whose detect found nothing — must error,
    # not fall back to another session's engine state) from an omitted
    # argument (engine-singleton compat behavior).
    _USE_ENGINE_STATE = object()

    def __init__(self, config: Optional[EngineConfig] = None, *,
                 encoder: Optional[PerceptionEncoder] = None,
                 detector=None, text_embedder=None, use_mesh: bool = False):
        self.config = config or default_config()
        # encoder is LAZY: store-only flows (recommend by ids, scroll,
        # CLI points) never pay the model build/compile
        self._encoder = encoder
        self.detector = detector
        self.text_embedder = text_embedder
        self.mesh = make_mesh(self.config.mesh) if use_mesh else None
        self.metrics = Metrics()

        # current database
        self._store: Optional[VectorStore] = None
        # per-vector-space device indexes: {space: (key, index)} with
        # key = (count, vector_version) — see _get_index
        self._indexes: dict = {}
        # host-side inverted indexes for SPARSE spaces, same key shape
        self._sparse_indexes: dict = {}
        self.current_database: Optional[str] = None

        # last query state (single-session convenience, like the reference)
        self.detected_regions: Optional[Regions] = None
        self.region_embeddings: Optional[np.ndarray] = None
        self.region_metadata_list: list[dict] = []

        self._stop_event = threading.Event()
        self._searcher = None
        self._searcher_lock = threading.Lock()
        # payload-column cache for filtered search, keyed on
        # (count, data_version) — see _filter_mask
        self._filter_cols = None
        self._filter_cols_key = None
        # guards _indexes rebuild/assignment: the batcher's worker
        # thread calls _get_index concurrently with UI-locked callers,
        # and two simultaneous rebuilds would transiently hold 2x the
        # index's HBM footprint
        self._index_lock = threading.Lock()

    @property
    def encoder(self) -> PerceptionEncoder:
        if self._encoder is None:
            self._encoder = PerceptionEncoder(self.config.model)
        return self._encoder

    # -- database management (reference core_system.py:74-154) ----------

    @property
    def db_root(self) -> str:
        return self.config.store.root_dir

    def list_databases(self) -> list[str]:
        return _list_databases(self.db_root)

    def load_database(self, database_name: str) -> str:
        if not database_name:
            return "❌ Please provide a database name"
        from .store.persist import resolve_alias
        resolved = resolve_alias(self.db_root, database_name)
        try:
            store = VectorStore.open(self.db_root, resolved)
        except StoreError:
            if not os.path.isdir(os.path.join(self.db_root, resolved)):
                return f"❌ Database not found: {database_name}"
            return f"❌ Collection not found in database: {database_name}"
        self._set_store(store)
        if resolved != database_name:
            return (f"✅ Loaded database: {resolved} "
                    f"(alias {database_name})")
        return f"✅ Loaded database: {database_name}"

    def delete_database(self, database_name: str) -> str:
        if not database_name:
            return "❌ Please provide a database name"
        try:
            if self.current_database == database_name:
                self._set_store(None)
            _delete_database(self.db_root, database_name)
            return f"✅ Deleted database: {database_name}"
        except StoreLockedError:
            return (f"❌ Database '{database_name}' is locked (a build "
                    f"may be running); unlock it first")
        except StoreError:
            return f"❌ Database not found: {database_name}"
        except Exception as e:
            return f"❌ Error deleting database: {e}"

    def unlock_database(self, database_name: str) -> str:
        if not database_name:
            return "❌ Please provide a database name"
        try:
            removed = _unlock_database(self.db_root, database_name)
        except StoreError:
            return f"❌ Database not found: {database_name}"
        if removed:
            return f"✅ Removed lock file from database: {database_name}"
        return f"ℹ️ No lock file found for database: {database_name}"

    def _with_writable(self, fn):
        """Swap the read handle for a writable one, run `fn(writable)`,
        and ALWAYS reopen the read handle afterwards. Returns
        (error_message | None, fn_result | None). The device index is
        preserved across the swap whenever its (count, vector_version)
        key still holds — i.e. for payload-only mutations; anything
        that touched vectors bumps vector_version and rebuilds."""
        name = self.current_database
        with self._index_lock:
            saved = dict(self._indexes)
            saved_sp = dict(self._sparse_indexes)
        self._set_store(None)     # release the read handle before locking
        try:
            with VectorStore.open(self.db_root, name, writable=True) as w:
                result = fn(w)
        except StoreLockedError:
            return (f"❌ Database '{name}' is locked (a build may be "
                    f"running); unlock it first", None)
        except StoreError as e:
            return (f"❌ {e}", None)
        finally:
            try:
                store = VectorStore.open(self.db_root, name)
                self._set_store(store)
                live_key = (store.count, store.vector_version)
                keep = {sp: kv for sp, kv in saved.items()
                        if kv[0] == live_key}
                keep_sp = {sp: kv for sp, kv in saved_sp.items()
                           if kv[0] == live_key}
                if keep or keep_sp:
                    with self._index_lock:
                        self._indexes.update(keep)
                        self._sparse_indexes.update(keep_sp)
            except StoreError:
                pass
        return None, result

    def delete_points(self, filter=None, *, points=None) -> str:
        """Delete the selected rows — the delete role of qdrant's
        points API. Select via a payload `filter` (see `store.filter`)
        and/or `points` (row ids / `region_id` strings), same selector
        shape as the payload mutators. Rewrites the store via the
        crash-safe compaction pass (`VectorStore.compact`); the loaded
        handle and device index refresh to the compacted data."""
        from .store.filter import parse_filter, payload_mask

        if self._store is None:
            return "❌ No database loaded. Please create or load a database first."
        name = self.current_database
        has_filter = False
        try:
            if filter is not None and not parse_filter(filter).is_empty():
                has_filter = True
        except Exception as e:
            return f"❌ Bad filter: {e}"
        rows: set[int] = set()
        if points:
            rows.update(p["id"] for p in
                        self.retrieve(list(points), with_payload=False))
        if not rows and not has_filter:
            if points:
                return f"✅ Deleted 0 points from {name}"
            return ("❌ Refusing to delete with an empty selection "
                    "(use delete_database to drop everything)")

        def body(w):
            drop = np.zeros(w.count, bool)
            if has_filter:
                drop |= payload_mask(w, filter)
            if rows:
                idx = [r for r in rows if r < w.count]
                drop[idx] = True
            return w.compact(~drop)

        err, removed = self._with_writable(body)
        if err:
            return err
        return f"✅ Deleted {removed} points from {name}"

    def _mutate_payloads(self, mode: str, patch=None, keys=None, *,
                         points=None, filter=None) -> str:
        """Shared body of the payload mutation APIs: resolve the point
        selection (ids/region_ids and/or a payload filter), reopen the
        store writable, and run the crash-safe staged rewrite
        (`VectorStore.update_payloads`). Vectors and the device index
        are untouched."""
        from .store.filter import parse_filter, payload_mask

        if self._store is None:
            return ("❌ No database loaded. Please create or load a "
                    "database first.")
        name = self.current_database
        has_filter = False
        try:
            if filter is not None and not parse_filter(filter).is_empty():
                has_filter = True
        except Exception as e:
            return f"❌ Bad filter: {e}"
        rows: set[int] = set()
        if points:
            rows.update(p["id"] for p in
                        self.retrieve(list(points), with_payload=False))
        if not rows and not has_filter:
            return ("❌ Nothing selected: pass point ids and/or a "
                    "non-empty filter")

        # payload edits leave vectors untouched (vector_version holds
        # still), so _with_writable preserves the possibly multi-GB
        # device index instead of re-uploading
        def body(w):
            if has_filter:
                mask = payload_mask(w, filter)
                rows.update(np.nonzero(mask)[0].tolist())
            return w.update_payloads(sorted(rows), patch=patch,
                                     keys=keys, mode=mode)

        err, touched = self._with_writable(body)
        if err:
            return err
        verb = {"set": "Updated", "overwrite": "Overwrote",
                "delete": "Deleted keys on", "clear": "Cleared"}[mode]
        return f"✅ {verb} payload of {touched} points in {name}"

    def set_payload(self, patch: dict, *, points=None, filter=None) -> str:
        """Merge `patch` keys into the payloads of the selected points —
        qdrant's set_payload API role. Select via `points` (row ids
        and/or region_id strings) and/or a payload `filter`."""
        return self._mutate_payloads("set", patch=patch, points=points,
                                     filter=filter)

    def overwrite_payload(self, patch: dict, *, points=None,
                          filter=None) -> str:
        """Replace the whole payload of the selected points with `patch`
        — qdrant's overwrite payload API role."""
        return self._mutate_payloads("overwrite", patch=patch,
                                     points=points, filter=filter)

    def delete_payload(self, keys: Sequence[str], *, points=None,
                       filter=None) -> str:
        """Remove `keys` from the payloads of the selected points —
        qdrant's delete_payload API role."""
        return self._mutate_payloads("delete", keys=list(keys),
                                     points=points, filter=filter)

    def clear_payload(self, *, points=None, filter=None) -> str:
        """Empty the payloads of the selected points — qdrant's
        clear_payload API role."""
        return self._mutate_payloads("clear", points=points, filter=filter)

    def upsert_points(self, vectors, payloads=None) -> str:
        """Append raw points (vectors + payloads) to the loaded
        database — qdrant's upsert role for externally computed
        embeddings (the build pipeline is the model-driven path; this
        is the bring-your-own-vectors path). Vectors are L2-normalized
        here; dims must match the store. A store with NAMED vector
        spaces takes a `{space: [n, dim] array}` dict covering every
        space ('' = default). Row ids are assigned sequentially (the
        store is append-only — use delete_points / update_vectors /
        set_payload to mutate)."""
        if self._store is None:
            return ("❌ No database loaded. Please create or load a "
                    "database first.")
        name = self.current_database
        batch = dict(vectors) if isinstance(vectors, dict) \
            else {"": vectors}
        # SPARSE spaces travel in the same dict keyed by space name;
        # their rows are {"indices","values"} dicts, not arrays, and
        # are stored as-is (qdrant does not normalize sparse vectors).
        # MULTIVECTOR spaces likewise: rows are [T, d] matrices whose
        # sub-vectors ARE L2-normalized (cosine MaxSim).
        sparse_names = set(self._store.sparse)
        sparse_batch = {sp: list(batch.pop(sp))
                        for sp in list(batch) if sp in sparse_names}
        multi_batch = {}
        for sp in list(batch):
            if sp not in self._store.multi:
                continue
            rows = []
            for row in batch.pop(sp):
                if row is None:
                    rows.append(None)
                    continue
                m = np.asarray(row, np.float32)
                if m.ndim == 1:
                    m = m[None]
                norms = np.linalg.norm(m, axis=1, keepdims=True)
                if len(m) and not np.all(norms > 0):
                    return (f"❌ Zero sub-vectors in multivector space "
                            f"{sp!r} cannot be normalized")
                rows.append(m / np.maximum(norms, 1e-30))
            multi_batch[sp] = rows
        normed: dict = {}
        n = None
        cosine = self._store.distance == "cosine"
        for space, arr in batch.items():
            vecs = np.asarray(arr, np.float32)
            if vecs.ndim == 1:
                vecs = vecs[None]
            if n is None:
                n = len(vecs)
            elif len(vecs) != n:
                return (f"❌ space {space!r} has {len(vecs)} rows, "
                        f"expected {n}")
            if not cosine:
                # dot/euclid stores keep raw magnitudes — qdrant only
                # normalizes under Distance.COSINE
                normed[space] = vecs
                continue
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            if len(vecs) and not np.all(norms > 0):
                return "❌ Zero vectors cannot be normalized"
            normed[space] = vecs / np.maximum(norms, 1e-30)
        if n is None:
            return "❌ upsert needs vectors for the dense space(s)"
        for sp, rows in {**sparse_batch, **multi_batch}.items():
            if len(rows) != n:
                return (f"❌ space {sp!r} has {len(rows)} rows, "
                        f"expected {n}")
        if payloads is None:
            payloads = [{} for _ in range(n)]
        payloads = list(payloads)
        if len(payloads) != n:
            return f"❌ {n} vectors but {len(payloads)} payloads"
        if n == 0:
            return "✅ Upserted 0 points"
        arg = normed if isinstance(vectors, dict) else normed[""]

        def body(w):
            first = w.count
            w.append(arg, payloads, sparse_batch or None,
                     multi_batch or None)
            return first

        err, first = self._with_writable(body)
        if err:
            return err
        return (f"✅ Upserted {n} points into {name} "
                f"(ids {first}..{first + n - 1})")

    def update_vectors(self, points, vectors, *, using: str = "") -> str:
        """Overwrite the stored vectors of specific points — qdrant's
        update_vectors API role. `points` mixes row ids and region_id
        strings (order-aligned with `vectors` rows); vectors are
        L2-normalized here (the store holds unit fp32 rows); `using`
        selects a named vector space ('' = default). The device index
        refreshes on next search (vector content actually changed),
        and the IVF cache retrains (prefix immutability is broken by
        an in-place rewrite)."""
        if self._store is None:
            return ("❌ No database loaded. Please create or load a "
                    "database first.")
        name = self.current_database
        points = list(points)
        if using and using in self._store.sparse:
            # sparse side: `vectors` is a list of {"indices","values"}
            # rows (stored as-is; staged-rewrite journal in the store)
            rows_new = list(vectors)
            if len(points) != len(rows_new):
                return (f"❌ {len(points)} point ids but "
                        f"{len(rows_new)} sparse vectors")
            pts = self.retrieve(points, with_payload=False)
            if len(pts) != len(points):
                return (f"❌ Unknown point id(s): resolved {len(pts)} "
                        f"of {len(points)}")
            err, touched = self._with_writable(
                lambda w: w.update_sparse_vectors(
                    [p["id"] for p in pts], rows_new, using))
            if err:
                return err
            return f"✅ Updated vectors of {touched} points in {name}"
        if using and using in self._store.multi:
            # multivector side: [T, d] matrices, sub-vectors normalized
            rows_new = []
            for row in vectors:
                if row is None:
                    rows_new.append(None)
                    continue
                m = np.asarray(row, np.float32)
                if m.ndim == 1:
                    m = m[None]
                norms = np.linalg.norm(m, axis=1, keepdims=True)
                if len(m) and not np.all(norms > 0):
                    return "❌ Zero sub-vectors cannot be normalized"
                rows_new.append(m / np.maximum(norms, 1e-30))
            if len(points) != len(rows_new):
                return (f"❌ {len(points)} point ids but "
                        f"{len(rows_new)} multivectors")
            pts = self.retrieve(points, with_payload=False)
            if len(pts) != len(points):
                return (f"❌ Unknown point id(s): resolved {len(pts)} "
                        f"of {len(points)}")
            err, touched = self._with_writable(
                lambda w: w.update_multivectors(
                    [p["id"] for p in pts], rows_new, using))
            if err:
                return err
            return f"✅ Updated vectors of {touched} points in {name}"
        vecs = np.asarray(vectors, np.float32)
        if vecs.ndim == 1:
            vecs = vecs[None]
        if len(points) != len(vecs):
            return (f"❌ {len(points)} point ids but {len(vecs)} "
                    f"vectors")
        pts = self.retrieve(points, with_payload=False)
        if len(pts) != len(points):
            known = len(pts)
            return (f"❌ Unknown point id(s): resolved {known} of "
                    f"{len(points)}")
        rows = [p["id"] for p in pts]
        if self._store.distance == "cosine":
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            if not np.all(norms > 0):
                return "❌ Zero vectors cannot be normalized"
            vecs = vecs / norms
        err, touched = self._with_writable(
            lambda w: w.update_vectors(rows, vecs, space=using))
        if err:
            return err
        return f"✅ Updated vectors of {touched} points in {name}"

    def delete_vectors(self, points=None, spaces="", *,
                       filter=None) -> str:
        """Remove specific vectors from points WITHOUT deleting the
        points — qdrant's delete_vectors API role (the points keep
        their payloads and every other space; the reference app's
        single-vector collection had no analog, core_system.py:600-622).
        Select via `points` (row ids / region_id strings, unknown ids
        skipped like delete_points) and/or a payload `filter`; `spaces`
        is one space name or a list ('' = the default dense space).
        Dense deletions are mask-based (VectorStore.delete_vector_rows:
        every scan excludes the rows exactly, `has_vector` turns
        False, a later update_vectors resurrects); sparse/multivector
        deletions rewrite the ragged row empty through the staged
        journal."""
        from .store.filter import parse_filter, payload_mask

        if self._store is None:
            return ("❌ No database loaded. Please create or load a "
                    "database first.")
        name = self.current_database
        store = self._store
        if isinstance(spaces, str):
            spaces = [spaces]
        spaces = list(dict.fromkeys(spaces))
        if not spaces:
            return "❌ delete_vectors needs at least one vector space"
        unknown = [s for s in spaces
                   if s not in store.spaces() and s not in store.sparse
                   and s not in store.multi]
        if unknown:
            return (f"❌ Unknown vector space(s) "
                    f"{sorted(unknown)} (have "
                    f"{sorted(store.spaces()) + sorted(store.sparse) + sorted(store.multi)})")
        has_filter = False
        try:
            if filter is not None and not parse_filter(filter).is_empty():
                has_filter = True
        except Exception as e:
            return f"❌ Bad filter: {e}"
        rows: set = set()
        if points:
            rows.update(p["id"] for p in
                        self.retrieve(list(points), with_payload=False))
        if not points and not has_filter:
            return "❌ delete_vectors needs points and/or a filter"

        def body(w):
            sel = set(rows)
            if has_filter:
                w.flush()
                sel.update(np.nonzero(payload_mask(w, filter))[0].tolist())
            rl = sorted(sel)
            if not rl:
                return 0
            for s in spaces:
                if s in w.sparse:
                    w.update_sparse_vectors(rl, [None] * len(rl), s)
                elif s in w.multi:
                    w.update_multivectors(rl, [None] * len(rl), s)
                else:
                    w.delete_vector_rows(rl, s)
            return len(rl)

        err, touched = self._with_writable(body)
        if err:
            return err
        labels = ", ".join(repr(s) for s in spaces)
        return (f"✅ Deleted vectors ({labels}) of {touched} points "
                f"in {name}")

    _BATCH_OPS = ("upsert", "delete", "set_payload", "overwrite_payload",
                  "delete_payload", "clear_payload", "update_vectors",
                  "delete_vectors")

    def update_batch(self, operations) -> str:
        """Apply an ordered list of point mutations in ONE writable
        session — qdrant's batch-update API role (client
        `batch_update_points`; the reference only ever upserted,
        core_system.py:608-622). Each element is a one-key dict:

          {"upsert": {"vectors": [[..]], "payloads": [dict,..]|None}}
          {"delete": {"points": [..], "filter": spec}}   # either/both
          {"set_payload": {"payload": {..}, "points": .., "filter": ..}}
          {"overwrite_payload": {"payload": {..}, "points"/"filter"}}
          {"delete_payload": {"keys": [..], "points"/"filter"}}
          {"clear_payload": {"points": .., "filter": ..}}
          {"update_vectors": {"points": [..], "vectors": [[..]]}}
          {"delete_vectors": {"points"/"filter", "spaces": [..]}}

        The whole request validates up front (a malformed op rejects
        the batch before anything is touched), then ops apply strictly
        in order against the intermediate store state: integer row ids
        refer to the state AT THAT STEP — a preceding delete renumbers
        rows, so use region_id strings for cross-op stability. The
        read handle reopens (and the device index refreshes, if any op
        touched vectors) once, after the whole batch. Selector
        resolution inside the batch can't miss an op's own effects —
        unknown ids in delete/payload selectors are skipped (qdrant
        semantics), but `update_vectors` requires every id to resolve.
        Each op commits through its own crash-safe journal; a mid-batch
        failure keeps the ops already applied (same per-op durability
        as qdrant's batch, which is ordered but not transactional)."""
        from .store.filter import PayloadColumns, parse_filter, payload_mask

        if self._store is None:
            return ("❌ No database loaded. Please create or load a "
                    "database first.")
        name = self.current_database
        dim = self._store.dim

        cosine = self._store.distance == "cosine"

        def unit_rows(i: int, raw) -> np.ndarray:
            vecs = np.asarray(raw, np.float32)
            if vecs.ndim == 1:
                vecs = vecs[None]
            if vecs.ndim != 2 or vecs.shape[1] != dim:
                raise ValueError(f"op #{i}: vectors must be [n, {dim}], "
                                 f"got {vecs.shape}")
            if not cosine:      # dot/euclid: raw magnitudes are kept
                return vecs
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            if not np.all(norms > 0):
                raise ValueError(f"op #{i}: zero vectors cannot be "
                                 "normalized")
            return vecs / norms

        ops: list[tuple[str, dict]] = []
        try:
            for i, op in enumerate(list(operations)):
                if not isinstance(op, dict) or len(op) != 1:
                    raise ValueError(f"op #{i}: expected a one-key dict")
                kind, body = next(iter(op.items()))
                if kind not in self._BATCH_OPS:
                    raise ValueError(f"op #{i}: unknown operation "
                                     f"{kind!r} (one of "
                                     f"{', '.join(self._BATCH_OPS)})")
                if body is None:
                    body = {}
                if not isinstance(body, dict):
                    raise ValueError(f"op #{i}: {kind} body must be a dict")
                known = {"upsert": {"vectors", "payloads"},
                         "delete": {"points", "filter"},
                         "set_payload": {"payload", "points", "filter"},
                         "overwrite_payload": {"payload", "points",
                                               "filter"},
                         "delete_payload": {"keys", "points", "filter"},
                         "clear_payload": {"points", "filter"},
                         "update_vectors": {"points", "vectors"},
                         "delete_vectors": {"points", "filter",
                                            "spaces"}}[kind]
                extra = set(body) - known
                if extra:
                    raise ValueError(f"op #{i}: unknown {kind} key(s) "
                                     f"{sorted(extra)}")
                spec = body.get("filter")
                has_filter = (spec is not None
                              and not parse_filter(spec).is_empty())
                points = list(body.get("points") or [])
                b: dict = {"points": points, "filter": spec,
                           "has_filter": has_filter}
                if kind == "upsert":
                    b["vectors"] = unit_rows(i, body.get("vectors"))
                    pls = body.get("payloads")
                    pls = ([{} for _ in range(len(b["vectors"]))]
                           if pls is None else list(pls))
                    if len(pls) != len(b["vectors"]):
                        raise ValueError(
                            f"op #{i}: {len(b['vectors'])} vectors but "
                            f"{len(pls)} payloads")
                    if not all(isinstance(p, dict) for p in pls):
                        raise ValueError(f"op #{i}: payloads must be dicts")
                    b["payloads"] = pls
                elif kind == "update_vectors":
                    b["vectors"] = unit_rows(i, body.get("vectors"))
                    if len(points) != len(b["vectors"]):
                        raise ValueError(
                            f"op #{i}: {len(points)} point ids but "
                            f"{len(b['vectors'])} vectors")
                elif kind in ("set_payload", "overwrite_payload"):
                    if not isinstance(body.get("payload"), dict):
                        raise ValueError(f"op #{i}: {kind} needs a "
                                         "'payload' dict")
                    b["payload"] = body["payload"]
                elif kind == "delete_payload":
                    b["keys"] = list(body.get("keys") or [])
                    if not b["keys"]:
                        raise ValueError(f"op #{i}: delete_payload needs "
                                         "keys")
                elif kind == "delete_vectors":
                    sp = body.get("spaces", "")
                    sp = [sp] if isinstance(sp, str) else list(sp)
                    if "spaces" in body and not sp:
                        # an explicitly empty list is a mistake, not a
                        # request for the default space — match the
                        # public Reverso.delete_vectors rejection
                        raise ValueError(f"op #{i}: delete_vectors "
                                         "needs at least one vector "
                                         "space")
                    sp = list(dict.fromkeys(sp)) or [""]
                    bad_sp = [s for s in sp
                              if s not in self._store.spaces()
                              and s not in self._store.sparse
                              and s not in self._store.multi]
                    if bad_sp:
                        raise ValueError(f"op #{i}: unknown vector "
                                         f"space(s) {sorted(bad_sp)}")
                    b["spaces"] = sp
                if kind in ("delete", "set_payload", "overwrite_payload",
                            "delete_payload", "clear_payload",
                            "delete_vectors") \
                        and not points and not has_filter:
                    raise ValueError(f"op #{i}: {kind} needs points "
                                     "and/or a non-empty filter")
                ops.append((kind, b))
        except Exception as e:
            return f"❌ Bad batch: {e}"
        if not ops:
            return "✅ Applied 0 operations"

        def resolve(w, points) -> list:
            """Row for each selector (None if unknown) against the
            CURRENT writable state; region_id duplicates keep-first,
            matching `retrieve`."""
            view = None
            out = []
            for p in points:
                if isinstance(p, str):
                    if view is None:
                        w.flush()
                        view = PayloadColumns(w).view("region_id")
                    code = view.uindex.get(p, -2)
                    r = None
                    if code >= 0:
                        hits = np.nonzero(view.codes == code)[0]
                        if hits.size:
                            r = int(hits[0])
                    out.append(r)
                else:
                    r = int(p)
                    out.append(r if 0 <= r < w.count else None)
            return out

        applied: list[str] = []

        def body_fn(w):
            mode = {"set_payload": "set", "overwrite_payload": "overwrite",
                    "delete_payload": "delete", "clear_payload": "clear"}
            for n, (kind, b) in enumerate(ops):
                if kind == "upsert":
                    w.append(b["vectors"], b["payloads"])
                    applied.append(f"upsert {len(b['vectors'])}")
                    continue
                if kind == "update_vectors":
                    rows = resolve(w, b["points"])
                    if any(r is None for r in rows):
                        bad = [p for p, r in zip(b["points"], rows)
                               if r is None]
                        raise StoreError(f"op #{n}: unknown point id(s) "
                                         f"{bad[:5]}")
                    touched = w.update_vectors(rows, b["vectors"])
                    applied.append(f"update_vectors {touched}")
                    continue
                rows = {r for r in resolve(w, b["points"]) if r is not None}
                if b["has_filter"]:
                    w.flush()
                    rows.update(np.nonzero(
                        payload_mask(w, b["filter"]))[0].tolist())
                if kind == "delete":
                    drop = np.zeros(w.count, bool)
                    drop[sorted(rows)] = True
                    removed = w.compact(~drop) if rows else 0
                    applied.append(f"delete {removed}")
                elif kind == "delete_vectors":
                    rl = sorted(rows)
                    for s in b["spaces"]:
                        if not rl:
                            break
                        if s in w.sparse:
                            w.update_sparse_vectors(rl, [None] * len(rl), s)
                        elif s in w.multi:
                            w.update_multivectors(rl, [None] * len(rl), s)
                        else:
                            w.delete_vector_rows(rl, s)
                    applied.append(f"delete_vectors {len(rl)}")
                else:
                    touched = w.update_payloads(
                        sorted(rows), patch=b.get("payload"),
                        keys=b.get("keys"), mode=mode[kind]) if rows else 0
                    applied.append(f"{kind} {touched}")
            return len(ops)

        err, n = self._with_writable(body_fn)
        if err:
            return err
        return (f"✅ Applied {n} operations to {name} "
                f"({'; '.join(applied)})")

    def _set_store(self, store: Optional[VectorStore]) -> None:
        with self._index_lock:
            self._store = store
            self._indexes = {}
            self._sparse_indexes = {}
        self.current_database = store.name if store else None

    def _get_index(self, using: str = ""):
        # Read the handle ONCE: token/batcher searches run without the
        # UI engine lock, so a concurrent load/delete may swap
        # self._store mid-call — using a local keeps this consistent
        # (worst case the search answers against the previous snapshot
        # or raises a clear StoreError, never AttributeError).
        store = self._store
        if store is None:
            raise StoreError("no database loaded")
        scfg = self.config.search
        # Key on (count, vector_version), not count alone: a truncate-
        # then-reappend to the same size (resume) or an overwrite-same-
        # name must not serve stale device vectors — but payload-only
        # edits (set_payload) leave vector_version still, so they never
        # trigger a multi-GB HBM re-upload. refresh() makes external
        # mutations visible through this read-only handle.
        store.refresh()
        using = using or ""
        key = (store.count, store.vector_version)
        cached = self._indexes.get(using)
        if cached is not None and cached[0] == key:
            return cached[1]
        with self._index_lock:
            # re-check under the lock: a concurrent caller may have just
            # rebuilt; without this, two threads would each stage the
            # (possibly multi-GB) matrix to HBM and one copy leaks until
            # the next rebuild
            cached = self._indexes.get(using)
            if cached is not None and cached[0] == key:
                return cached[1]
            if using in store.sparse:
                raise StoreError(
                    f"vector space {using!r} is sparse — only plain "
                    f"search and universal-query branches support "
                    f"sparse spaces")
            if using in store.multi:
                # MaxSim over the flat sub-vector matrix (MXU matmul +
                # segment max — see ops/multivec.py). Same (scores,
                # ids) contract as DeviceIndex, so the plain search /
                # prefetch-branch callers are agnostic.
                from .store import MultiVecIndex
                subs, indptr = store.multivectors(using)
                # "binary"/"int8" are modes of the DENSE index; the
                # MaxSim matrix coerces to bf16 (jnp.dtype("binary")
                # would crash, and int8 makes MaxSim inexact)
                mv_dtype = self.config.store.dtype
                if mv_dtype in ("binary", "pq", "int8"):
                    mv_dtype = "bfloat16"
                index = MultiVecIndex(np.asarray(subs), indptr,
                                      dtype=mv_dtype)
                self._indexes[using] = (key, index)
                return index
            if using not in store.spaces():
                raise StoreError(
                    f"unknown vector space {using!r} (have "
                    f"{sorted(store.spaces()) + sorted(store.sparse) + sorted(store.multi)})")
            count = store.count
            vectors = np.asarray(store.vectors(using))
            if scfg.index == "host":
                # native C++ multithreaded host scan: the search path
                # for no-accelerator deployments (reference analog:
                # qdrant local mode's numpy scan, core_system.py:659)
                from .store import HostIndex
                index = HostIndex(vectors, distance=store.distance)
            elif (scfg.index == "ivf" and not using
                    and store.distance == "cosine"
                    and count > scfg.ivf_clusters * 4):
                # IVF applies to the DEFAULT space only (its k-means
                # cache is keyed per store); named spaces use the exact
                # device scan
                # IVF probes dense clusters: "binary" is a mode of the
                # exact index, not an IVF cell dtype — coerce to bf16
                ivf_dtype = self.config.store.dtype
                if ivf_dtype in ("binary", "pq"):
                    ivf_dtype = "bfloat16"
                ivf = load_or_build_ivf(store, vectors, scfg,
                                        ivf_dtype, mesh=self.mesh)
                index = _IVFSearchAdapter(ivf, scfg.ivf_nprobe,
                                          impl=scfg.ivf_impl)
            elif self.config.store.dtype == "binary":
                # qdrant binary quantization: packed candidate scan
                # (16x bf16 HBM capacity) + exact f32 rescore of the
                # top oversampling*k ids against the on-disk rows
                from .store import BinaryIndex
                if store.distance in ("euclid", "manhattan"):
                    raise StoreError(
                        "binary quantization ranks by sign dots — it "
                        "needs a cosine or dot store (this store's "
                        f"distance is {store.distance})")
                index = _BinaryRescoreAdapter(
                    BinaryIndex(vectors, mesh=self.mesh), vectors,
                    oversampling=scfg.binary_oversampling,
                    rescore=scfg.binary_rescore)
            elif self.config.store.dtype == "pq":
                # qdrant product quantization: m-byte learned-codebook
                # candidate scan (binary's HBM footprint at default m,
                # better rank retention) + the same exact f32 rescore;
                # codebooks/codes persist next to the store
                if store.distance in ("euclid", "manhattan"):
                    raise StoreError(
                        "product quantization ranks by codebook dots — "
                        "it needs a cosine or dot store (this store's "
                        f"distance is {store.distance})")
                pqi = load_or_build_pq(store, vectors, scfg,
                                       space=using, mesh=self.mesh)
                index = _BinaryRescoreAdapter(
                    pqi, vectors,
                    oversampling=scfg.pq_oversampling,
                    rescore=scfg.pq_rescore)
            else:
                index = DeviceIndex(
                    vectors, mesh=self.mesh,
                    dtype=self.config.store.dtype,
                    db_tile=scfg.db_tile,
                    distance=store.distance,
                    int8_quantile=scfg.int8_quantile)
            gone = store.deleted_rows(using)
            if gone.size:
                # per-point delete_vectors mask: fold into every scan
                # via the one wrapper (delete bumped vector_version, so
                # this cache entry rebuilds whenever the mask changes)
                presence = np.ones(count, np.bool_)
                presence[gone] = False
                index = _PresenceMaskedIndex(index, presence)
            self._indexes[using] = (key, index)
            return index

    def _get_sparse_index(self, space: str):
        """Cached host-side inverted index for a SPARSE vector space
        (keyed like _get_index; sparse scoring is host-native — see
        store/sparse.py)."""
        from .store import SparseIndex

        store = self._store
        if store is None:
            raise StoreError("no database loaded")
        store.refresh()
        if space not in store.sparse:
            raise StoreError(f"unknown sparse vector space {space!r} "
                             f"(have {sorted(store.sparse)})")
        key = (store.count, store.vector_version)
        cached = self._sparse_indexes.get(space)
        if cached is not None and cached[0] == key:
            return cached[1]
        with self._index_lock:
            cached = self._sparse_indexes.get(space)
            if cached is not None and cached[0] == key:
                return cached[1]
            index = SparseIndex.from_store(store, space)
            self._sparse_indexes[space] = (key, index)
            return index

    def _presence_and(self, mask, using: str = ""):
        """AND the dense delete_vectors presence of `using` into a row
        mask. Scans get this via _PresenceMaskedIndex; this helper is
        for the paths that pick rows WITHOUT scanning (random sampling,
        search_matrix) — a point whose vector was deleted must not be
        sampled in that space. Returns None unchanged when nothing is
        deleted (the no-mask fast paths stay intact)."""
        store = self._store
        if store is None or using not in store.spaces():
            return mask
        gone = store.deleted_rows(using)
        if not gone.size:
            return mask
        m = (np.ones(store.count, np.bool_) if mask is None
             else np.array(mask, dtype=bool, copy=True))
        m[gone[gone < len(m)]] = False
        return m

    def _drop_deleted(self, cand: list, using: str = "") -> list:
        """Drop candidate row ids whose `using` vector was deleted via
        delete_vectors. The exact-rescore / MMR prefetch-union paths
        read `store.vectors(using)[cand]` directly (no index, no
        presence mask), so a cross-space prefetch could otherwise score
        a deleted point with its stale on-disk bytes — qdrant skips a
        point with no vector in the rescoring space."""
        store = self._store
        if store is None or using not in store.spaces():
            return cand
        gone = store.deleted_rows(using)
        if not gone.size:
            return cand
        gone_set = set(int(g) for g in gone)
        return [c for c in cand if int(c) not in gone_set]

    def _payload_columns(self):
        """Cached columnar payload view for the loaded store.

        The extraction (one streaming JSONL pass per key set) is cached
        per (count, data_version); filters and group-by lookups against
        an unchanged store evaluate in vectorized numpy with no IO."""
        from .store.filter import PayloadColumns

        store = self._store
        if store is None:
            raise StoreError("no database loaded")
        store.refresh()
        key = (store.count, store.data_version)
        with self._index_lock:
            if self._filter_cols is None or self._filter_cols_key != key:
                self._filter_cols = PayloadColumns(store)
                self._filter_cols_key = key
            return self._filter_cols

    @staticmethod
    def _payloads_with(store, ids, with_payload):
        """Payloads for `ids` under a qdrant with_payload selector:
        bool, key string/list (include shorthand), or
        {"include"|"exclude": [paths]} — the PayloadSelector role
        (store.filter.compile_payload_selector). Malformed selectors
        raise before any store IO (FilterError -> UI 400)."""
        from .store.filter import compile_payload_selector

        sel = compile_payload_selector(with_payload)
        if sel is False:
            return [None] * len(ids)
        pays = store.payloads(ids)
        return pays if sel is True else [sel(p) for p in pays]

    def _filter_mask(self, filter_spec) -> Optional[np.ndarray]:
        """Evaluate a payload filter (dict/string/Filter; see
        `store.filter`) against the loaded store -> [count] bool mask.
        Returns None for an empty filter."""
        from .store.filter import evaluate_filter, parse_filter

        filt = parse_filter(filter_spec)
        if filt.is_empty():
            return None
        cols = self._payload_columns()
        cols.ensure(sorted(filt.keys()))
        return evaluate_filter(filt, cols)

    def index_payload(self, keys: Sequence[str]) -> str:
        """Extract + persist typed column views for `keys` — the
        create_payload_index role of qdrant's API. Later processes
        mmap-load the arrays instead of streaming the whole JSONL, so
        their first filtered search / facet / order_by is instant.
        (Big stores auto-persist keys on first use; this is the
        explicit, guard-free version.)"""
        if self._store is None:
            return ("❌ No database loaded. Please create or load a "
                    "database first.")
        keys = [str(k) for k in keys]
        if not keys:
            return "❌ No payload keys given"
        cols = self._payload_columns()
        cols.ensure(keys)
        path = cols.persist(keys, force=True)
        if path is None:
            return "❌ Could not write the column cache (read-only dir?)"
        return (f"✅ Indexed payload keys {', '.join(keys)} "
                f"({os.path.basename(path)})")

    def count(self, filter=None) -> int:
        """Number of stored points, optionally restricted to a payload
        filter (qdrant's count API role over the reference's store,
        core_system.py:659-664)."""
        store = self._store
        if store is None:
            raise StoreError("no database loaded")
        store.refresh()
        mask = self._filter_mask(filter) if filter is not None else None
        return store.count if mask is None else int(mask.sum())

    # -- serving ----------------------------------------------------------

    @property
    def searcher(self):
        """Micro-batching search front-end (`serve.BatchingSearcher`).

        Coalesces concurrent callers' queries into single device
        launches; created lazily, bound to `_get_index` so store
        rebuilds are picked up per launch. Callers must not run
        concurrently with a build on the same engine (the UI's build
        guard enforces that)."""
        if self._searcher is None:
            # Creation must be locked: concurrent first callers would each
            # build a private searcher and nothing would ever coalesce
            # (caught live on the TPU: 8 threads -> 8 searchers, served=1).
            with self._searcher_lock:
                if self._searcher is None:
                    from .serve import BatchingSearcher
                    self._searcher = BatchingSearcher(self._get_index)
        return self._searcher

    def warmup(self, *, include_detector: bool = False) -> str:
        """Pre-compile the serving-path jits (embed + search kernel, and
        optionally the detector) so the first real request doesn't pay
        the cold jit compile (30-180 s per shape over a remote-compile
        TPU host). Call after load_database; idempotent."""
        size = self.config.model.image_size
        warmed = []
        np.asarray(self.encoder.encode_image(
            np.zeros((1, size, size, 3), np.float32)))
        warmed.append("encoder")
        if self._store is not None and self._store.count > 0:
            # Warm THROUGH the batcher: its launches pad k to a multiple
            # of 8 and bucket the batch to a power of two, and k/batch
            # are static jit args — warming the raw top_k shape would
            # compile a kernel the serving path never reuses, leaving
            # the first real request to pay the 30-180 s remote compile
            # (and blow the batcher's default timeout). A single queued
            # request launches as (bucket=1, k_pad), exactly the
            # steady-state low-traffic shape.
            self.searcher.search(
                np.zeros(self.encoder.embed_dim, np.float32),
                k=self.config.search.top_k, timeout=900.0)
            warmed.append("search")
        if include_detector and self.detector is not None:
            self.detector.detect(np.zeros((64, 64, 3), np.uint8),
                                 ["object"])
            warmed.append("detector")
        return "warmed: " + ", ".join(warmed)

    def search_batch(self, embeddings, k: Optional[int] = None, *,
                     filter=None, using: str = ""):
        """Bulk search: [B, d] query embeddings in ONE kernel launch.

        Returns (scores [B, k], ids [B, k]) with the usual
        (-score, idx) order and -1 padding. The per-query cost of the
        streaming kernel is tiny next to the database scan, so always
        prefer this over a loop of single searches. `filter` restricts
        results to rows whose payload matches (see `store.filter` for
        the qdrant-shaped spec); filtered scans are exact over the
        matching subset. `using` selects a named vector space
        ('' = default)."""
        import jax
        k = self.config.search.top_k if k is None else int(k)
        q = np.asarray(embeddings, np.float32)
        if q.ndim == 1:
            q = q[None]
        mask = self._filter_mask(filter) if filter is not None else None
        return jax.device_get(
            self._get_index(using).search(q, k, row_mask=mask))

    # -- query path -----------------------------------------------------

    def _preprocess(self, image) -> tuple[np.ndarray, tuple[int, int]]:
        from PIL import Image as PILImage
        arr = to_rgb_array(image)
        h, w = arr.shape[:2]
        px = preprocess_pil(PILImage.fromarray(arr), self.config.model.image_size)
        return px[None], (w, h)

    def process_image_direct_pe(self, image):
        """Whole-image embedding (reference core_system.py:431-455)."""
        px, (w, h) = self._preprocess(image)
        emb = np.asarray(self.encoder.encode_image(px))
        meta = direct_pe_metadata(w, h)
        self.detected_regions = None
        self.region_embeddings = emb
        self.region_metadata_list = [meta]
        return emb, [meta]

    def detect_regions(self, image, text_prompt: Optional[str] = None) -> int:
        """Prompt-conditioned region detection (reference core_system.py:237-318)."""
        if self.detector is None:
            raise RuntimeError(
                "no detector configured; construct Reverso(detector=...) or "
                "use process_image_direct_pe")
        prompts = parse_prompts(text_prompt, self.config.detector.default_prompt)
        arr = to_rgb_array(image)
        self.detected_regions = self.detector.detect(arr, prompts)
        self.region_embeddings = None
        self.region_metadata_list = []
        log.info(f"found {len(self.detected_regions)} regions for prompts {prompts}")
        return len(self.detected_regions)

    def extract_embeddings(self, image):
        """Embed detected regions (reference core_system.py:320-429).

        ingest.region_embed_mode selects "compat" (every region carries
        the global image embedding — exactly what the reference does,
        core_system.py:406) or "region" (fused masked-ROI pooling)."""
        regions = self.detected_regions
        if regions is None or len(regions) == 0:
            return [], []
        px, (w, h) = self._preprocess(image)
        n = min(len(regions), self.config.ingest.max_regions)
        use_roi = (self.config.ingest.region_embed_mode == "region"
                   and regions.masks is not None and n > 0)
        if use_roi:
            size = self.config.model.image_size
            # pow2 region bucket: the jit specializes on R, so raw
            # per-query region counts would compile a fresh (remote,
            # 30-180 s) program per distinct count
            rb = 1 << (n - 1).bit_length()
            resized = np.zeros((rb, size, size), np.float32)
            for i in range(n):
                resized[i] = _resize_mask(regions.masks[i], size)
            _, region_embs = self.encoder.encode_regions(px, resized[None])
            region_embs = np.asarray(region_embs)[0][:n]
        else:
            emb = np.asarray(self.encoder.encode_image(px))[0]
        vecs, metas = [], []
        for i in range(n):
            meta = region_metadata(regions, i)
            if meta is None:
                continue
            if meta["bbox"] is None:
                meta["bbox"] = [0, 0, w, h]
            vecs.append(region_embs[i] if use_roi else emb)
            metas.append(meta)
        self.region_embeddings = (np.stack(vecs) if vecs
                                  else np.zeros((0, self.encoder.embed_dim),
                                                np.float32))
        self.region_metadata_list = metas
        return list(self.region_embeddings), metas

    def search_similar(self, similarity_threshold: Optional[float] = None,
                       max_results: Optional[int] = None,
                       query_index: int = 0, *,
                       embeddings=_USE_ENGINE_STATE,
                       use_batcher: bool = False,
                       filter=None, using: str = ""):
        """Search the loaded database with a previously extracted embedding
        (reference core_system.py:650-717). Returns (text, items).

        `embeddings` overrides the engine's last-query state with an
        explicit [R, d] array, making the call stateless — concurrent
        callers (the UI's per-session query state) pass their own.
        `use_batcher` routes the device launch through the micro-batching
        searcher so concurrent searches coalesce instead of serializing.
        `filter` (dict/string; see `store.filter`) restricts results to
        rows whose payload matches, e.g. `{"detected_class": "person"}`
        or `"confidence>=0.5"` — the capability qdrant's search filters
        provide in the reference's store. Filtered searches launch
        directly (masks don't coalesce in the batcher). `using` selects
        a named vector space ('' = default; the query embedding must
        match that space's dim).
        """
        cfg = self.config.search
        threshold = cfg.score_threshold if similarity_threshold is None else similarity_threshold
        k = cfg.top_k if max_results is None else max_results
        # explicit None (a session that detected 0 regions) must NOT
        # fall back to the engine singleton: that would answer one UI
        # session's search with another session's query state
        embs = (self.region_embeddings
                if embeddings is Reverso._USE_ENGINE_STATE
                else (None if embeddings is None
                      else np.asarray(embeddings)))
        if embs is None or len(embs) == 0:
            return ("❌ No query embeddings available. Please detect/process an image first.", [])
        store = self._store    # single read: see _get_index TOCTOU note
        if store is None:
            return ("❌ No database loaded. Please create or load a database first.", [])
        query_index = min(query_index, len(embs) - 1)
        query = embs[query_index]

        mask = self._filter_mask(filter) if filter is not None else None
        if mask is None and use_batcher and k <= 128:
            # k > 128 exceeds the batcher's fused-kernel cap; fall
            # through to a direct (XLA-path) index search instead of
            # silently truncating results
            scores, ids = self.searcher.search(query, k, space=using)
        else:
            index = self._get_index(using)
            import jax
            scores, ids = jax.device_get(
                index.search(query, k, row_mask=mask))
            scores, ids = scores[0], ids[0]
        hits = [(float(s), int(i)) for s, i in zip(scores, ids)
                if i >= 0 and s >= threshold]
        if not hits:
            return (f"❌ No similar regions found above threshold {threshold}", [])
        return self._render_hits(hits, store)

    def _render_hits(self, hits, store):
        """[(score, row_id)] -> the (text, items) result shape the UI
        renders (reference core_system.py:684-714)."""
        payloads = store.payloads([i for _, i in hits])
        text = f"🎯 Found {len(hits)} similar regions:\n\n"
        items = []
        for rank, ((score, row_id), payload) in enumerate(zip(hits, payloads)):
            payload = payload or {}
            filename = payload.get("filename", "Unknown")
            image_path = payload.get("image_source", "")
            bbox = payload.get("bbox", [0, 0, 0, 0])
            text += f"{rank + 1}. {filename} (Similarity: {score:.3f})\n"
            text += f"   Source: {image_path}\n"
            text += f"   📍 Bounding box: {bbox}\n\n"
            thumb = render_result_thumbnail(image_path, score) if image_path else None
            items.append({"image": thumb, "score": score, "id": row_id,
                          "filename": filename, "bbox": bbox,
                          "payload": payload})
        return text, items

    def search_by_text(self, text: str,
                       similarity_threshold: Optional[float] = None,
                       max_results: Optional[int] = None, *,
                       stateless: bool = False, use_batcher: bool = False,
                       filter=None):
        """Search the loaded database with a natural-language description
        via the CLIP/PE text tower (capability the reference's models had
        but its app never exposed). Returns (text, items) like
        search_similar.

        `stateless=True` leaves the engine's last-query state untouched
        (concurrent UI sessions); `use_batcher` coalesces the device
        launch with other in-flight searches."""
        if self.text_embedder is None:
            return ("❌ No text encoder configured. Load CLIP/PE text "
                    "weights to enable search-by-text.", [])
        if not text or not text.strip():
            return ("❌ Please provide a text description.", [])
        emb = np.asarray(self.text_embedder.embed(text))
        if not stateless:
            self.detected_regions = None
            self.region_embeddings = emb
            self.region_metadata_list = [{"query_text": text}]
        if similarity_threshold is None:
            # text-image cosine scores live on a different scale than
            # image-image ones; never fall through to the 0.7 default
            similarity_threshold = self.config.search.text_score_threshold
        return self.search_similar(similarity_threshold, max_results,
                                   embeddings=emb, use_batcher=use_batcher,
                                   filter=filter)

    def search_groups(self, similarity_threshold: Optional[float] = None,
                      max_groups: Optional[int] = None,
                      query_index: int = 0, *,
                      group_by: str = "filename", group_size: int = 3,
                      embeddings=_USE_ENGINE_STATE, filter=None,
                      using: str = "", with_lookup=None):
        """Grouped similarity search — qdrant's search_groups API role
        over the reference's store (core_system.py:659-664): results
        are bucketed by a payload field and each bucket reports its top
        `group_size` hits, so e.g. one image with many matching regions
        fills ONE group instead of the whole result page.

        Groups are ranked by their best hit; hits within a group keep
        global score order. Exact: the scan deepens (doubling k) until
        every selected group is full or candidates above the threshold
        are exhausted, so the output equals a brute-force group-by over
        the full masked scan. Rows without the `group_by` key are
        skipped (qdrant semantics). Returns (text, groups) where groups
        is a list of {"key", "hits"} with hits shaped like
        search_similar items. `with_lookup={"collection": name,
        "with_vectors": bool?}` (or just the name) joins each group key
        against a point of another collection — qdrant's with_lookup:
        int keys are row ids there, string keys match region_id; each
        group gains a "lookup" record (None when absent)."""
        import jax

        cfg = self.config.search
        threshold = (cfg.score_threshold if similarity_threshold is None
                     else similarity_threshold)
        n_groups = cfg.top_k if max_groups is None else int(max_groups)
        group_size = max(1, int(group_size))
        embs = (self.region_embeddings
                if embeddings is Reverso._USE_ENGINE_STATE
                else (None if embeddings is None else np.asarray(embeddings)))
        if embs is None or len(embs) == 0:
            return ("❌ No query embeddings available. Please detect/process an image first.", [])
        store = self._store
        if store is None:
            return ("❌ No database loaded. Please create or load a database first.", [])
        query = embs[min(query_index, len(embs) - 1)]

        try:
            fmask = self._filter_mask(filter) if filter is not None else None
            cols = self._payload_columns()
            key_col = cols.column(group_by)
            present = cols.present(group_by)
        except StoreError as e:
            return (f"❌ {e}", [])
        mask = present if fmask is None else (present & fmask)
        n_avail = int(mask.sum())
        if n_avail == 0:
            return (f"❌ No points carry payload key '{group_by}'"
                    + (" and match the filter" if fmask is not None else "")
                    + ".", [])
        index = self._get_index(using)

        k = min(n_avail, max(n_groups * group_size, 32))
        while True:
            scores, ids = jax.device_get(
                index.search(query[None], k, row_mask=mask))
            scores, ids = scores[0], ids[0]
            sel: dict = {}
            complete = False
            exhausted = True          # flips if we stop at k with room left
            for s, i in zip(scores, ids):
                s, i = float(s), int(i)
                if i < 0 or s < threshold:
                    break             # scores are sorted: nothing below counts
                kv = key_col[i]
                if not isinstance(kv, (str, int, float, bool)):
                    kv = json.dumps(kv, sort_keys=True)   # lists/dicts
                hits = sel.get(kv)
                if hits is None:
                    if len(sel) >= n_groups:
                        continue      # group set is final (best-hit order)
                    sel[kv] = [(s, i)]
                elif len(hits) < group_size:
                    hits.append((s, i))
                if (len(sel) == n_groups
                        and all(len(v) >= group_size for v in sel.values())):
                    complete = True
                    break
            else:
                # consumed all k rows without finishing: deeper rows may
                # still fill groups unless the scan already covered
                # every masked row
                exhausted = k >= n_avail
            if complete or exhausted or k >= n_avail:
                break
            k = min(n_avail, k * 2)

        if not sel:
            return (f"❌ No similar regions found above threshold {threshold}", [])
        all_ids = [i for hits in sel.values() for _, i in hits]
        payloads = dict(zip(all_ids, store.payloads(all_ids)))
        text = f"🎯 Found {len(sel)} groups (by {group_by}):\n\n"
        groups = []
        for rank, (kv, hits) in enumerate(sel.items()):
            text += f"{rank + 1}. {group_by}={kv} — best {hits[0][0]:.3f}, {len(hits)} hit(s)\n"
            items = []
            for s, i in hits:
                payload = payloads.get(i) or {}
                image_path = payload.get("image_source", "")
                thumb = (render_result_thumbnail(image_path, s)
                         if image_path else None)
                items.append({"image": thumb, "score": s, "id": i,
                              "filename": payload.get("filename", "Unknown"),
                              "bbox": payload.get("bbox", [0, 0, 0, 0]),
                              "payload": payload})
                text += f"     {payload.get('filename', 'Unknown')} (Similarity: {s:.3f})\n"
            text += "\n"
            groups.append({"key": kv, "hits": items})
        if with_lookup is not None:
            try:
                self._attach_group_lookups(groups, with_lookup)
            except (StoreError, ValueError) as e:
                return (f"❌ {e}", [])
        return text, groups

    def _attach_group_lookups(self, groups, with_lookup) -> None:
        """qdrant with_lookup: join each group key against a point of
        ANOTHER collection — int keys are row ids, string keys match
        region_id (one payload stream over the lookup collection
        builds the map; intended for modest document collections,
        qdrant's usage). Each group dict gains a "lookup" record
        (None when the key names no point). Shared by search_groups
        and query_groups."""
        spec = (with_lookup if isinstance(with_lookup, dict)
                else {"collection": with_lookup})
        lstore, _ = self._lookup_store(spec)
        try:
            rid_map = None
            for gdict in groups:
                kv = gdict["key"]
                row = None
                if isinstance(kv, bool):
                    row = None
                elif isinstance(kv, (int, np.integer)) or (
                        isinstance(kv, float) and
                        float(kv).is_integer()):
                    r = int(kv)
                    row = r if 0 <= r < lstore.count else None
                elif isinstance(kv, str):
                    if rid_map is None:
                        rid_map = {}
                        pays = lstore.payloads(
                            list(range(lstore.count)))
                        for r, p in enumerate(pays):
                            rid = (p or {}).get("region_id")
                            if isinstance(rid, str) \
                                    and rid not in rid_map:
                                rid_map[rid] = r
                    row = rid_map.get(kv)
                if row is None:
                    gdict["lookup"] = None
                    continue
                rec = {"id": row,
                       "payload": lstore.payloads([row])[0]}
                if spec.get("with_vectors"):
                    rec["vector"] = np.asarray(
                        lstore.vectors()[row], np.float32).tolist()
                gdict["lookup"] = rec
        finally:
            lstore.close()

    def _lookup_store(self, spec):
        """qdrant lookup_from: `{"collection": name, "vector": space?}`
        (or just the collection name) -> (read-only VectorStore,
        space). Point-id operands then resolve against THAT
        collection's vectors instead of the loaded one. Caller closes
        the store."""
        if isinstance(spec, str):
            spec = {"collection": spec}
        if not isinstance(spec, dict) or not spec.get("collection"):
            raise ValueError('lookup_from must be {"collection": name, '
                             '"vector": space?} or a collection name')
        from .store.persist import resolve_alias
        name = resolve_alias(self.db_root, str(spec["collection"]))
        store = VectorStore.open(self.db_root, name)
        space = str(spec.get("vector") or "")
        if space and space not in store.spaces():
            store.close()
            raise ValueError(f"lookup collection {name!r} has no vector "
                             f"space {space!r}")
        return store, space

    def _resolve_examples(self, examples, using: str = "",
                          lookup=None) -> Optional[np.ndarray]:
        """Recommend inputs -> [M, d] f32. Accepts stored point ids
        (ints), [d] vectors, [M, d] arrays, or a mixed list of those;
        point ids resolve in the `using` vector space — or, with
        `lookup=(store, space)` (qdrant lookup_from), in ANOTHER
        collection's space (dims must match the target space)."""
        if examples is None:
            return None
        if not isinstance(examples, (list, tuple)):
            examples = [examples]
        rows: list[np.ndarray] = []
        for e in examples:
            if isinstance(e, (int, np.integer)):
                store, space = ((self._store, using) if lookup is None
                                else lookup)
                if store is None:
                    raise StoreError("no database loaded")
                i = int(e)
                if not 0 <= i < store.count:
                    raise ValueError(
                        f"point id {i} out of range (store has "
                        f"{store.count} points)")
                rows.append(np.asarray(store.vectors(space)[i],
                                       np.float32))
            else:
                v = np.asarray(e, np.float32)
                if v.ndim == 1:
                    rows.append(v)
                elif v.ndim == 2:
                    rows.extend(v)
                else:
                    raise ValueError(f"bad example shape {v.shape}")
        if not rows:
            return None
        out = np.stack(rows)
        if lookup is not None and self._store is not None:
            expected = self._store.spaces().get(using)
            if expected and out.shape[1] != expected:
                raise ValueError(
                    f"lookup_from vectors are {out.shape[1]}-d but the "
                    f"target space {using or 'default'!r} is "
                    f"{expected}-d")
        return out

    def recommend(self, positive, negative=None,
                  max_results: Optional[int] = None,
                  similarity_threshold: Optional[float] = None, *,
                  strategy: str = "average", filter=None,
                  use_batcher: bool = False, using: str = "",
                  lookup_from=None):
        """Search by positive/negative example points — the role of
        qdrant's recommend API over the reference's store
        (core_system.py:659-664 is the search it feeds). Examples are
        stored point ids (row ids as returned in search results) or raw
        embedding vectors; `strategy` is "average" (ONE composed query
        through the fused kernel; works on every index incl. IVF),
        "sum_scores" (qdrant's summed-similarity strategy — also ONE
        composed query by dot linearity, scores are the summed sims;
        cosine/dot stores), or "best_score" (every row ranked against
        every example via qdrant's best-score combine; exact index
        only). Returns
        (text, items) like search_similar. Unlike search_similar there
        is no default score threshold (qdrant's recommend has none, and
        best_score values are not plain cosines once negatives bite).
        `lookup_from={"collection": name, "vector": space?}` resolves
        example point ids in ANOTHER collection (qdrant lookup_from);
        those ids then refer to that collection, so no example
        self-exclusion applies here.
        """
        import jax
        from .ops.recommend import average_query, sum_scores_query

        store = self._store
        if store is None:
            return ("❌ No database loaded. Please create or load a database first.", [])
        k = self.config.search.top_k if max_results is None else int(max_results)
        threshold = (-np.inf if similarity_threshold is None
                     else float(similarity_threshold))
        # example points never recommend themselves (qdrant semantics);
        # over-fetch so exclusion cannot shrink the page below k.
        # Ids under lookup_from name points of the OTHER collection —
        # nothing to exclude locally.
        exclude = set()
        if lookup_from is None:
            for group in (positive, negative):
                if group is None:
                    continue
                for e in (group if isinstance(group, (list, tuple))
                          else [group]):
                    if isinstance(e, (int, np.integer)):
                        exclude.add(int(e))
        k_fetch = k + len(exclude)
        lstore = None
        try:
            lookup = None
            if lookup_from is not None:
                lstore, lspace = self._lookup_store(lookup_from)
                lookup = (lstore, lspace)
            pos = self._resolve_examples(positive, using, lookup=lookup)
            neg = self._resolve_examples(negative, using, lookup=lookup)
            if pos is None or not len(pos):
                return ("❌ Recommend needs at least one positive example.", [])
            mask = self._filter_mask(filter) if filter is not None else None
            if strategy in ("average", "sum_scores"):
                if strategy == "sum_scores":
                    # qdrant sum_scores composes to one UNnormalized
                    # query by dot linearity (ops.recommend); the
                    # returned scores are the summed similarities,
                    # which only a dot-family metric defines
                    if store.distance in ("euclid", "manhattan"):
                        return ("❌ strategy='sum_scores' sums dot "
                                "similarities — not defined on a "
                                f"{store.distance}-distance store.", [])
                    q = sum_scores_query(pos, neg)
                else:
                    q = average_query(pos, neg)
                if mask is None and use_batcher and k_fetch <= 128:
                    # coalesce with in-flight searches: the composed
                    # query is just one more row in the launch batch
                    scores, ids = self.searcher.search(q, k_fetch,
                                                       space=using)
                    scores, ids = scores[None], ids[None]
                else:
                    scores, ids = jax.device_get(
                        self._get_index(using).search(q[None], k_fetch,
                                                      row_mask=mask))
            elif strategy == "best_score":
                index = self._get_index(using)
                if not hasattr(index, "best_score"):
                    return ("❌ strategy='best_score' needs the exact index "
                            "(the IVF index only supports strategy='average').", [])
                scores, ids = jax.device_get(
                    index.best_score(pos, neg, k_fetch, row_mask=mask))
            else:
                return (f"❌ Unknown strategy '{strategy}' (use "
                        "'average', 'sum_scores', or 'best_score').", [])
        except (StoreError, ValueError) as e:
            return (f"❌ {e}", [])
        finally:
            if lstore is not None:
                lstore.close()
        hits = [(float(s), int(i)) for s, i in zip(scores[0], ids[0])
                if i >= 0 and s >= threshold and int(i) not in exclude][:k]
        if not hits:
            return ("❌ No recommendations found.", [])
        return self._render_hits(hits, store)

    def discover(self, target=None, context=None,
                 max_results: Optional[int] = None, *, filter=None,
                 using: str = "", lookup_from=None):
        """qdrant's discovery API role over the reference's store
        (core_system.py:659-664 is the search it feeds). `context` is a
        list of (positive, negative) example pairs — stored point ids or
        raw vectors; each pair votes per row (+1 when the row sides with
        the pair's positive), and rows rank by vote total with target
        similarity breaking ties (`ops.recommend.discover_topk`). With
        `target=None` this is a pure context search (rank by summed
        pair loss; 0 = inside every positive zone). Example point ids
        never return themselves. Scores in the items are the composite
        ranking keys, not cosines. Exact index only (like
        strategy='best_score')."""
        import jax

        store = self._store
        if store is None:
            return ("❌ No database loaded. Please create or load a database first.", [])
        k = self.config.search.top_k if max_results is None else int(max_results)
        pairs = list(context) if context else []
        if target is None and not pairs:
            return ("❌ Discover needs a target and/or context pairs.", [])
        exclude = set()
        if lookup_from is None:
            for e in [target, *(x for p in pairs for x in p)]:
                if isinstance(e, (int, np.integer)):
                    exclude.add(int(e))
        k_fetch = k + len(exclude)
        lstore = None
        try:
            lookup = None
            if lookup_from is not None:
                lstore, lspace = self._lookup_store(lookup_from)
                lookup = (lstore, lspace)
            tgt = (self._resolve_examples(target, using, lookup=lookup)
                   if target is not None else None)
            if tgt is not None and len(tgt) != 1:
                raise ValueError("discover takes exactly one target")
            pos = neg = None
            if pairs:
                if not all(isinstance(p, (list, tuple)) and len(p) == 2
                           for p in pairs):
                    raise ValueError(
                        "context must be (positive, negative) pairs")
                pos = self._resolve_examples([p[0] for p in pairs],
                                             using, lookup=lookup)
                neg = self._resolve_examples([p[1] for p in pairs],
                                             using, lookup=lookup)
                if len(pos) != len(pairs) or len(neg) != len(pairs):
                    raise ValueError(
                        "each context pair needs exactly one positive and "
                        "one negative example")
            mask = self._filter_mask(filter) if filter is not None else None
            index = self._get_index(using)
            if not hasattr(index, "discover"):
                return ("❌ discover needs the exact index (not IVF).", [])
            if tgt is not None:
                scores, ids = jax.device_get(
                    index.discover(tgt[0], pos, neg, k_fetch, row_mask=mask))
            else:
                scores, ids = jax.device_get(
                    index.context(pos, neg, k_fetch, row_mask=mask))
        except (StoreError, ValueError) as e:
            return (f"❌ {e}", [])
        finally:
            if lstore is not None:
                lstore.close()
        hits = [(float(s), int(i)) for s, i in zip(scores[0], ids[0])
                if i >= 0 and int(i) not in exclude][:k]
        if not hits:
            return ("❌ No discovery results found.", [])
        return self._render_hits(hits, store)

    def _exact_scores(self, vecs: np.ndarray, qv: np.ndarray) -> np.ndarray:
        """Exact f32 similarity of rows against one query under the
        store's distance (distance metrics report -distance so
        higher-is-better holds everywhere)."""
        vecs = np.asarray(vecs, np.float32)
        if self._store.distance == "euclid":
            return -np.linalg.norm(vecs - qv[None, :], axis=1)
        if self._store.distance == "manhattan":
            return -np.abs(vecs - qv[None, :]).sum(axis=1)
        return vecs @ qv

    def _mmr_select(self, spec: dict, k: int, gmask, using: str,
                    cand=None) -> list:
        """Maximal Marginal Relevance result diversification — the
        qdrant 1.15 `mmr` query. Greedy: the first pick is the most
        relevant candidate; each later pick maximizes
        `(1 - diversity) * rel - diversity * max_sim_to_selected`
        (diversity 0 = plain top-k, 1 = pure diversity), ties to the
        lower point id. Returns [(relevance score, id)] in SELECTION
        order. `cand` (prefetch union) replaces the candidate scan;
        relevance is then the exact rescore against `nearest`.
        Candidate pool size is `candidates_limit` (default
        max(10*k, 100)) — MMR needs pairwise sims, so the pool is
        deliberately k-scale, qdrant's own shape."""
        import jax

        store = self._store
        mmr = spec.get("mmr")
        if not isinstance(mmr, dict):
            raise ValueError('mmr must be an object: {"diversity": ..., '
                             '"candidates_limit": ...}')
        diversity = float(mmr.get("diversity", 0.5))
        if not 0.0 <= diversity <= 1.0:
            raise ValueError(f"mmr diversity must be in [0, 1], got "
                             f"{diversity}")
        climit = int(mmr.get("candidates_limit", max(10 * k, 100)))
        if climit < 1:
            raise ValueError("mmr candidates_limit must be >= 1")
        if "nearest" not in spec:
            raise ValueError('an mmr query needs a "nearest" operand: '
                             '{"nearest": <vector|id>, "mmr": {...}}')
        if using and (using in store.sparse or using in store.multi):
            raise StoreError("mmr needs a dense vector space (pairwise "
                             "similarities of the candidates)")
        qv = self._resolve_query_vector(spec["nearest"], using)
        if cand is None:
            kf = min(climit, max(store.count, 1))
            s, i = jax.device_get(
                self._get_index(using).search(qv[None], kf,
                                              row_mask=gmask))
            valid = i[0] >= 0
            cand = [int(x) for x in i[0][valid]]
            rel = np.asarray(s[0][valid], np.float64)
            vecs = np.asarray(store.vectors(using)[cand], np.float32)
        else:
            # the prefetch union may cross spaces: a candidate found in
            # another branch can have a deleted vector HERE — drop it
            # before computing relevance (stale on-disk bytes must not
            # enter the MMR pool)
            cand = self._drop_deleted(list(cand), using)
            if not cand:
                return []
            vecs = np.asarray(store.vectors(using)[cand], np.float32)
            rel = self._exact_scores(vecs, qv).astype(np.float64)
            if len(cand) > climit:
                keep = np.lexsort((np.asarray(cand), -rel))[:climit]
                keep.sort()
                cand = [cand[j] for j in keep]
                vecs, rel = vecs[keep], rel[keep]
        if not cand:
            return []
        ids = np.asarray(cand, np.int64)
        max_sim = np.full(len(cand), -np.inf)
        remaining = np.ones(len(cand), bool)
        out = []
        for step in range(min(k, len(cand))):
            obj = rel if step == 0 else \
                (1.0 - diversity) * rel - diversity * max_sim
            obj = np.where(remaining, obj, -np.inf)
            j = int(np.lexsort((ids, -obj))[0])
            if np.isneginf(obj[j]):
                break
            out.append((float(rel[j]), int(ids[j])))
            remaining[j] = False
            max_sim = np.maximum(max_sim,
                                 self._exact_scores(vecs, vecs[j]))
        return out

    def _resolve_query_vector(self, q, using: str = "") -> np.ndarray:
        """A query operand -> [d] fp32 vector: int row id, region_id
        string, `{"text": ...}` (CLIP/PE text tower), or an explicit
        vector. Point ids resolve (and explicit vectors validate)
        against the `using` vector space."""
        store = self._store
        if isinstance(q, dict) and "text" in q:
            if self.text_embedder is None:
                raise StoreError("no text encoder configured; load "
                                 "CLIP/PE text weights for text queries")
            emb = np.asarray(self.text_embedder.embed(str(q["text"])),
                             np.float32)
            return emb.reshape(-1)
        if isinstance(q, (int, np.integer)):
            if not 0 <= int(q) < store.count:
                raise StoreError(f"point id {int(q)} out of range "
                                 f"[0, {store.count})")
            if using in store.multi:
                return store.multivector_rows(using, [int(q)])[0]
            if using in store.spaces() \
                    and int(q) in store.deleted_rows(using):
                raise StoreError(
                    f"point {int(q)} has no vector in space {using!r} "
                    f"(deleted via delete_vectors)")
            return np.asarray(store.vectors(using)[int(q)], np.float32)
        if isinstance(q, str):
            pts = self.retrieve([q], with_payload=False, with_vectors=True,
                                using=using)
            if not pts:
                raise StoreError(f"no point with region_id {q!r}")
            if "vector" not in pts[0]:   # delete_vectors removed it
                raise StoreError(
                    f"point {q!r} has no vector in space {using!r} "
                    f"(deleted via delete_vectors)")
            return pts[0]["vector"]
        if using in store.multi:
            # multivector space: [d] or [Tq, d] query operands
            d = store.multi[using]
            v = np.asarray(q, np.float32)
            if v.ndim == 1:
                v = v[None]
            if v.ndim != 2 or v.shape[1] != d:
                raise StoreError(f"multivector query must be [*, {d}], "
                                 f"got {v.shape}")
            return v
        d = store.spaces().get(using)
        if d is None:
            raise StoreError(f"unknown vector space {using!r} "
                             f"(have {sorted(store.spaces())})")
        v = np.asarray(q, np.float32).reshape(-1)
        if v.shape != (d,):
            raise StoreError(f"query vector must be [{d}], "
                             f"got {v.shape}")
        return v

    def _resolve_sparse_query(self, q, space: str):
        """A query operand against a SPARSE space -> {"indices",
        "values"} dict (or pair): int row id / region_id string
        resolve to the stored sparse vector; explicit sparse dicts
        pass through (validated at search time)."""
        store = self._store
        if isinstance(q, (int, np.integer)):
            if not 0 <= int(q) < store.count:
                raise StoreError(f"point id {int(q)} out of range "
                                 f"[0, {store.count})")
            return store.sparse_rows(space, [int(q)])[0]
        if isinstance(q, str):
            pts = self.retrieve([q], with_payload=False)
            if not pts:
                raise StoreError(f"no point with region_id {q!r}")
            return store.sparse_rows(space, [pts[0]["id"]])[0]
        if isinstance(q, dict) and "text" in q:
            raise StoreError("text queries need a dense space (no "
                             "sparse text encoder is configured)")
        return q

    _COMBINE_KINDS = ("recommend", "discover", "context")

    @staticmethod
    def _is_combine(q) -> bool:
        """One of qdrant's example-combine universal-query operand
        types: {"recommend": ...} / {"discover": ...} /
        {"context": ...} (exactly one key, qdrant's wrapper shape)."""
        return (isinstance(q, dict) and len(q) == 1
                and next(iter(q)) in Reverso._COMBINE_KINDS)

    @staticmethod
    def _is_order_by(q) -> bool:
        return isinstance(q, dict) and set(q) == {"order_by"}

    @staticmethod
    def _norm_pairs(context):
        """Context pairs in either accepted shape -> [(pos, neg), ...]:
        qdrant's [{"positive": p, "negative": n}, ...] or plain
        (p, n) 2-sequences."""
        if context is None:
            return []
        out = []
        for p in context:
            if isinstance(p, dict):
                if set(p) != {"positive", "negative"}:
                    raise ValueError(
                        'context pairs are {"positive": p, "negative":'
                        ' n} (or (p, n) tuples), got '
                        f'{sorted(p)!r}')
                out.append((p["positive"], p["negative"]))
            elif isinstance(p, (list, tuple)) and len(p) == 2:
                out.append((p[0], p[1]))
            else:
                raise ValueError(
                    "context must be (positive, negative) pairs, got "
                    f"{p!r}")
        return out

    def _combine_pairs(self, spec: dict, k: int, mask, using: str = ""):
        """qdrant's example-combine universal-query operand types —
        RecommendQuery / DiscoverQuery / ContextQuery inside
        query_points — as (score, id) pairs over `mask`. All three are
        masked index scans, so the SAME helper serves a standalone
        query, a prefetch branch, and a rescore of the candidate union
        (the caller passes the union as the mask). Example point ids
        never return themselves (their mask bits clear — exact, no
        over-fetch); ids pre-resolved to vectors by lookup_from are
        therefore NOT excluded, matching the other lookup paths."""
        import jax

        from .ops.recommend import average_query, sum_scores_query

        store = self._store
        if using and (using in store.sparse or using in store.multi):
            raise ValueError(
                "recommend/discover/context operands need a dense "
                f"vector space ({using!r} is not one)")
        (kind, body), = spec.items()

        def ids_of(x):
            if x is None:
                return []
            xs = x if isinstance(x, (list, tuple)) else [x]
            return [int(e) for e in xs if isinstance(e, (int, np.integer))]

        index = self._get_index(using)
        exclude: set = set()
        if kind == "recommend":
            if not isinstance(body, dict) or body.get("positive") is None:
                raise ValueError(
                    'recommend operand must be {"positive": [...], '
                    '"negative": [...]?, "strategy": ...?}')
            strategy = str(body.get("strategy") or "average")
            if strategy == "average_vector":     # qdrant's name
                strategy = "average"
            pos = self._resolve_examples(body["positive"], using)
            neg = self._resolve_examples(body.get("negative"), using)
            if pos is None or not len(pos):
                raise ValueError(
                    "recommend needs at least one positive example")
            exclude.update(ids_of(body["positive"]))
            exclude.update(ids_of(body.get("negative")))
            if strategy in ("average", "sum_scores"):
                if strategy == "sum_scores" and store.distance in (
                        "euclid", "manhattan"):
                    raise ValueError(
                        "strategy='sum_scores' sums dot similarities — "
                        "not defined on a "
                        f"{store.distance}-distance store")
                q = (sum_scores_query(pos, neg) if strategy == "sum_scores"
                     else average_query(pos, neg))
                run = lambda m: index.search(q[None], k, row_mask=m)
            elif strategy == "best_score":
                if not hasattr(index, "best_score"):
                    raise ValueError(
                        "strategy='best_score' needs the exact index")
                run = lambda m: index.best_score(pos, neg, k, row_mask=m)
            else:
                raise ValueError(
                    f"unknown recommend strategy {strategy!r} (use "
                    "'average', 'sum_scores', or 'best_score')")
        elif kind == "discover":
            if not isinstance(body, dict) or (
                    body.get("target") is None
                    and not body.get("context")):
                raise ValueError(
                    'discover operand must be {"target": op?, '
                    '"context": [pairs]?} with at least one of them')
            tgt = (self._resolve_examples(body.get("target"), using)
                   if body.get("target") is not None else None)
            if tgt is not None and len(tgt) != 1:
                raise ValueError("discover takes exactly one target")
            pairs = self._norm_pairs(body.get("context"))
            pos = self._resolve_examples([p for p, _ in pairs], using)
            neg = self._resolve_examples([n for _, n in pairs], using)
            exclude.update(ids_of(body.get("target")))
            for p, n in pairs:
                exclude.update(ids_of(p) + ids_of(n))
            if not hasattr(index, "discover"):
                raise ValueError(
                    "discover needs the exact index (not IVF)")
            if tgt is not None:
                t0 = tgt[0]
                run = lambda m: index.discover(t0, pos, neg, k,
                                               row_mask=m)
            else:
                run = lambda m: index.context(pos, neg, k, row_mask=m)
        else:                                    # context
            pairs = self._norm_pairs(body)
            if not pairs:
                raise ValueError("context needs at least one "
                                 "(positive, negative) pair")
            pos = self._resolve_examples([p for p, _ in pairs], using)
            neg = self._resolve_examples([n for _, n in pairs], using)
            for p, n in pairs:
                exclude.update(ids_of(p) + ids_of(n))
            if not hasattr(index, "context"):
                raise ValueError(
                    "context needs the exact index (not IVF)")
            run = lambda m: index.context(pos, neg, k, row_mask=m)

        m = mask
        rows = [i for i in exclude if 0 <= i < store.count]
        if rows:
            m = (np.ones(store.count, bool) if mask is None
                 else np.asarray(mask, bool)[:store.count].copy())
            m[rows] = False
        scores, ids = map(np.asarray, jax.device_get(run(m)))
        return [(float(s), int(i)) for s, i in zip(scores[0], ids[0])
                if i >= 0]

    def _order_by_pairs(self, body, k: int, mask):
        """qdrant's order_by universal-query operand: points sorted by
        a numeric/datetime payload key (the ordered-scroll semantics —
        missing/unordered rows drop, ties to the lower id). The
        returned "score" is the ordering value (qdrant returns null
        scores; the value is strictly more informative)."""
        from .store.filter import _parse_datetime

        if isinstance(body, str) and body:
            key, direction, start = body, "asc", None
        elif isinstance(body, dict) and body.get("key"):
            key = str(body["key"])
            direction = str(body.get("direction") or "asc")
            start = body.get("start_from")
        else:
            raise ValueError(
                'order_by operand must be a payload key or {"key": K, '
                '"direction": "asc"|"desc"?, "start_from": v?}, got '
                f"{body!r}")
        if direction not in ("asc", "desc"):
            raise ValueError(
                f"direction must be asc|desc, got {direction!r}")
        cols = self._payload_columns()
        view = cols.view(key)
        vals_all = view.num
        if len(view.uniq):          # datetime strings order too
            dt_rows, _ = cols.datetime_num(key)
            vals_all = np.where(np.isnan(vals_all), dt_rows, vals_all)
        keep = ~np.isnan(vals_all)
        if mask is not None:
            keep &= np.asarray(mask, bool)[:len(vals_all)]
        ids = np.nonzero(keep)[0]
        vals = vals_all[ids]
        sign = 1.0 if direction == "asc" else -1.0
        if start is not None:
            s0 = (float(start) if isinstance(start, (int, float))
                  and not isinstance(start, bool)
                  else _parse_datetime(start, what="start_from"))
            ok = sign * vals >= sign * s0
            ids, vals = ids[ok], vals[ok]
        order = np.lexsort((ids, sign * vals))[:k]
        return [(float(vals[j]), int(ids[j])) for j in order]

    def query(self, query=None, *, prefetch=None,
              fusion: Optional[str] = None, k: Optional[int] = None,
              filter=None, with_payload: bool = True, seed=None,
              use_batcher: bool = False, using: str = "",
              lookup_from=None):
        """Universal query API — the role of qdrant's query_points
        with prefetch + fusion / multi-stage rescoring (the modern
        face of the store the reference drove via plain `search`,
        core_system.py:659-664).

        Three shapes:
          * `query` alone — plain top-k search (vector, row id, or
            region_id string). `{"sample": "random"}` instead returns
            k uniformly sampled (filtered) points, score 0.0 — qdrant's
            random-sampling query; `seed` makes the draw reproducible.
            Random branches are legal in prefetch too (e.g. a random
            candidate pool feeding an exact rescore). The remaining
            qdrant query types work here AND as prefetch branches AND
            as the rescoring query: `{"recommend": {"positive": [...],
            "negative": [...]?, "strategy": "average"|"sum_scores"|
            "best_score"?}}`, `{"discover": {"target": op?, "context":
            [pairs]?}}`, `{"context": [pairs]}` (pairs as qdrant
            {"positive","negative"} dicts or (p, n) tuples; example
            point ids never return themselves), and `{"order_by": key
            | {"key", "direction"?, "start_from"?}}` (points in
            payload order, the value as the score).
          * `prefetch=[...]` + `fusion` ("rrf" default, or "dbsf") —
            each branch is a sub-search (`{"query": ..., "filter": ...,
            "limit": n}`, or just the query operand); branch result
            lists fuse by reciprocal rank (RRF, k=60) or by
            distribution-normalized score sum (DBSF: each branch's
            scores min-max scaled inside mean±3σ before summing).
          * `prefetch=[...]` + `query` — multi-stage: the union of
            branch candidates is rescored EXACTLY (fp32 dot, ties to
            the lower row id) against `query`; e.g. a cheap IVF/int8
            prefetch feeding an exact rerank. A `query` of
            `{"formula": <expr>, "defaults": {...}}` instead rescores
            the union with a qdrant score-boosting FORMULA over
            prefetch scores, payload values, filter conditions, geo
            distance and decay functions (grammar: store/formula.py).
            A `query` of `{"nearest": <operand>, "mmr": {"diversity":
            0..1, "candidates_limit": n}}` returns a DIVERSIFIED
            top-k (qdrant 1.15 MMR): greedy max of `(1-diversity)*rel
            - diversity*max_sim_to_selected` over the candidate pool
            (the prefetch union, or a plain scan when standalone),
            results in selection order with relevance scores.

        A top-level `filter` applies inside every branch scan (so
        branches return their full limit of valid candidates), exactly
        like qdrant's global filter. `use_batcher` routes a plain
        unfiltered query through the serving micro-batcher (same knob
        as search_similar/recommend): concurrent callers coalesce into
        one launch and the warmed (bucket, k_pad) compile is reused
        instead of tracing a fresh (1, k) shape.

        `using` selects the vector space of the top-level query (and
        of point-id resolution); each prefetch branch may carry its
        OWN `"using"` — qdrant's hybrid-search shape, e.g. a text-space
        branch and an image-space branch fused by RRF, or a named-space
        prefetch rescored exactly in the default space. Returns a list
        of {"id", "score", "payload"} dicts, best first.

        `with_payload` also accepts qdrant's selector forms — a key
        string/list (include shorthand) or {"include"|"exclude":
        [payload paths]} — applied per hit (see
        store.filter.compile_payload_selector); same on query_batch,
        scroll, and retrieve."""
        import jax

        store = self._store
        if store is None:
            raise StoreError("no database loaded")
        if prefetch is not None:
            prefetch = list(prefetch) or None  # empty = plain search
        k = self.config.search.top_k if k is None else int(k)
        store.refresh()
        gmask = self._filter_mask(filter) if filter is not None else None

        if lookup_from is not None:
            # qdrant lookup_from: point-id operands (top-level query,
            # mmr "nearest", prefetch branch queries) resolve against
            # ANOTHER collection's vectors. Resolved up front so the
            # lookup store closes before any scan runs.
            lstore, lspace = self._lookup_store(lookup_from)
            try:
                rid_rows: dict = {}

                def _rid_map() -> dict:
                    # region_id -> row of the LOOKUP collection, built
                    # once per call (string ids must not fall through
                    # to the local collection — they name the lookup
                    # one, like every other id under lookup_from)
                    if not rid_rows:
                        pays = lstore.payloads(list(range(lstore.count)))
                        for r, p in enumerate(pays):
                            rid = (p or {}).get("region_id")
                            if isinstance(rid, str) \
                                    and rid not in rid_rows:
                                rid_rows[rid] = r
                    return rid_rows

                def _lk_row(row: int) -> np.ndarray:
                    # same deleted-vector guard as the local-collection
                    # path (_resolve_query_vector): a point whose
                    # lspace vector was removed via delete_vectors must
                    # not silently operand with stale on-disk bytes
                    if lspace in lstore.spaces() \
                            and row in lstore.deleted_rows(lspace):
                        raise StoreError(
                            f"lookup point {row} has no vector in "
                            f"space {lspace!r} (deleted via "
                            f"delete_vectors)")
                    return np.asarray(lstore.vectors(lspace)[row],
                                      np.float32)

                def _lk(op):
                    if isinstance(op, (int, np.integer)):
                        i = int(op)
                        if not 0 <= i < lstore.count:
                            raise StoreError(
                                f"lookup point id {i} out of range "
                                f"[0, {lstore.count})")
                        return _lk_row(i)
                    if isinstance(op, str):
                        row = _rid_map().get(op)
                        if row is None:
                            raise StoreError(
                                f"no point with region_id {op!r} in "
                                f"the lookup collection")
                        return _lk_row(row)
                    return op
                def _lk_list(x):
                    return ([_lk(e) for e in x]
                            if isinstance(x, (list, tuple)) else _lk(x))

                def _lk_q(qq):
                    # resolve point-id operands INSIDE the qdrant query
                    # wrappers too (recommend examples, discover
                    # target/pairs, context pairs) — all against the
                    # lookup collection, so no local self-exclusion
                    if not isinstance(qq, dict):
                        return _lk(qq)
                    if "nearest" in qq:
                        return {**qq, "nearest": _lk(qq["nearest"])}
                    if set(qq) == {"recommend"} and isinstance(
                            qq["recommend"], dict):
                        body = dict(qq["recommend"])
                        for side in ("positive", "negative"):
                            if body.get(side) is not None:
                                body[side] = _lk_list(body[side])
                        return {"recommend": body}
                    if set(qq) == {"discover"} and isinstance(
                            qq["discover"], dict):
                        body = dict(qq["discover"])
                        if body.get("target") is not None:
                            body["target"] = _lk(body["target"])
                        if body.get("context"):
                            body["context"] = [
                                (_lk(p), _lk(n)) for p, n in
                                self._norm_pairs(body["context"])]
                        return {"discover": body}
                    if set(qq) == {"context"}:
                        return {"context": [
                            (_lk(p), _lk(n)) for p, n in
                            self._norm_pairs(qq["context"])]}
                    return qq       # sample / formula / order_by
                query = _lk_q(query)
                if prefetch is not None:
                    prefetch = [
                        {**spec, "query": _lk_q(spec["query"])}
                        if isinstance(spec, dict) and "query" in spec
                        else _lk_q(spec)
                        for spec in prefetch]
            finally:
                lstore.close()

        formula = None
        if isinstance(query, dict) and "formula" in query:
            # qdrant formula query (score boosting): validate the
            # expression BEFORE any scan so malformed specs fail fast
            from .store.formula import parse_formula
            if "mmr" in query:
                raise ValueError("pass either a formula or an mmr "
                                 "query, not both")
            formula = parse_formula(query["formula"])
            if prefetch is None:
                raise ValueError("formula queries rescore prefetch "
                                 "candidates — provide prefetch "
                                 "branches (qdrant requires this too)")
        is_mmr = isinstance(query, dict) and "mmr" in query

        def hits_out(pairs):
            ids = [pid for _, pid in pairs]
            payloads = self._payloads_with(store, ids, with_payload)
            return [{"id": pid, "score": float(sc), "payload": p}
                    for (sc, pid), p in zip(pairs, payloads)]

        def is_random(q) -> bool:
            return isinstance(q, dict) and q.get("sample") == "random"

        # one stream per query() call: with a fixed seed, two random
        # branches draw DIFFERENT (but reproducible) samples
        rng = np.random.default_rng(seed)

        def random_rows(n: int, bmask, space: str = "") -> list[int]:
            bmask = self._presence_and(bmask, space)
            return [int(r)
                    for r in _sample_rows(rng, n, store.count, bmask)]

        if prefetch is None:
            if query is None:
                raise ValueError("query() needs a query operand and/or "
                                 "prefetch branches")
            if is_random(query):
                return hits_out([(0.0, r)
                                 for r in random_rows(k, gmask, using)])
            if self._is_combine(query):
                # qdrant's example-combine query types ride the same
                # masked scans as Reverso.recommend/discover
                return hits_out(self._combine_pairs(query, k, gmask,
                                                    using))
            if self._is_order_by(query):
                return hits_out(self._order_by_pairs(query["order_by"],
                                                     k, gmask))
            if is_mmr:
                # qdrant mmr query: diversified top-k over the
                # candidate scan (selection order, relevance scores)
                return hits_out(self._mmr_select(query, k, gmask, using))
            if using and using in store.sparse:
                sq = self._resolve_sparse_query(query, using)
                s1, i1 = self._get_sparse_index(using).search(
                    sq, k, row_mask=gmask)
                return hits_out([(float(sv), int(iv))
                                 for sv, iv in zip(s1, i1) if iv >= 0])
            qv = self._resolve_query_vector(query, using)
            if gmask is None and use_batcher and k <= 128 \
                    and using not in store.multi:
                # coalesce with in-flight searches and reuse the warmed
                # (bucket, k_pad) compile; k > 128 exceeds the batcher's
                # fused-kernel cap — direct index search instead
                # (multivector queries are [Tq, d] and score through
                # their own MaxSim launch)
                s1, i1 = self.searcher.search(qv, k, space=using)
                return hits_out([(float(sv), int(iv))
                                 for sv, iv in zip(s1, i1) if iv >= 0])
            s, i = jax.device_get(
                self._get_index(using).search(qv[None], k,
                                              row_mask=gmask))
            return hits_out([(float(sv), int(iv))
                             for sv, iv in zip(s[0], i[0]) if iv >= 0])
        if query is not None and fusion is not None:
            raise ValueError("pass either a rescoring query or fusion, "
                             "not both")
        if is_random(query):
            raise ValueError("random sampling cannot rescore prefetch "
                             "branches (use it standalone or as a "
                             "branch)")

        branches = []
        for spec in prefetch:
            if isinstance(spec, dict) and (
                    "query" in spec or "filter" in spec or "limit" in spec
                    or "using" in spec):
                bq = spec.get("query")
                bf = spec.get("filter")
                bl = int(spec.get("limit", max(2 * k, 20)))
                bu = str(spec.get("using") or "")
            else:
                bq, bf, bl, bu = spec, None, max(2 * k, 20), ""
            if bq is None:
                raise ValueError("every prefetch branch needs a query")
            bmask = self._filter_mask(bf) if bf is not None else None
            if gmask is not None:
                bmask = gmask if bmask is None else (bmask & gmask)
            if is_random(bq):
                rows = random_rows(bl, bmask, bu)
                branches.append((rows, [0.0] * len(rows)))
                continue
            if self._is_combine(bq):
                prs = self._combine_pairs(bq, bl, bmask, bu)
                branches.append(([p for _, p in prs],
                                 [s for s, _ in prs]))
                continue
            if self._is_order_by(bq):
                # a payload-ordered candidate pool (e.g. newest-first
                # feeding an exact rescore)
                prs = self._order_by_pairs(bq["order_by"], bl, bmask)
                branches.append(([p for _, p in prs],
                                 [s for s, _ in prs]))
                continue
            if bu and bu in store.sparse:
                # hybrid search: a sparse branch beside dense ones,
                # fused by RRF/DBSF or rescored exactly downstream
                sq = self._resolve_sparse_query(bq, bu)
                s1, i1 = self._get_sparse_index(bu).search(
                    sq, bl, row_mask=bmask)
                valid = i1 >= 0
                branches.append(([int(x) for x in i1[valid]],
                                 [float(x) for x in s1[valid]]))
                continue
            qv = self._resolve_query_vector(bq, bu)
            s, i = jax.device_get(
                self._get_index(bu).search(qv[None], bl, row_mask=bmask))
            valid = i[0] >= 0
            branches.append(([int(x) for x in i[0][valid]],
                             [float(x) for x in s[0][valid]]))

        if query is None:
            fusion = fusion or "rrf"
            fused: dict[int, float] = {}
            if fusion == "rrf":
                for ids, _ in branches:
                    for r, pid in enumerate(ids):
                        fused[pid] = fused.get(pid, 0.0) + 1.0 / (60.0 + r + 1)
            elif fusion == "dbsf":
                for ids, scores in branches:
                    if not ids:
                        continue
                    a = np.asarray(scores, np.float64)
                    lo = a.mean() - 3.0 * a.std()
                    hi = a.mean() + 3.0 * a.std()
                    norm = ((a - lo) / (hi - lo) if hi > lo
                            else np.ones_like(a))
                    for pid, ns in zip(ids, norm):
                        fused[pid] = fused.get(pid, 0.0) + float(ns)
            else:
                raise ValueError(f"unknown fusion {fusion!r} "
                                 f"(expected rrf|dbsf)")
            top = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
            return hits_out([(sc, pid) for pid, sc in top])

        # multi-stage: exact rescore of the candidate union, in the
        # top-level query's vector space
        cand = sorted({pid for ids, _ in branches for pid in ids})
        if not cand:
            return []
        if self._is_combine(query) or self._is_order_by(query):
            # rescore the union under a combine objective / payload
            # order: the union IS the scan mask, so the same masked
            # scans serve this stage too
            cmask = np.zeros(store.count, bool)
            cmask[cand] = True
            if self._is_order_by(query):
                return hits_out(self._order_by_pairs(query["order_by"],
                                                     k, cmask))
            return hits_out(self._combine_pairs(query, k, cmask, using))
        if is_mmr:
            # diversified rerank of the prefetch union: relevance is
            # the exact rescore against the mmr "nearest" operand
            return hits_out(self._mmr_select(query, k, gmask, using,
                                             cand=cand))
        if formula is not None:
            # formula rescore (qdrant score boosting): host-side
            # expression over prefetch scores / payload values /
            # conditions — see store/formula.py for the grammar
            from .store.formula import FormulaContext, eval_formula
            ctx = FormulaContext(
                cand,
                [dict(zip(ids, scores)) for ids, scores in branches],
                payloads_of=store.payloads,
                condition_mask=self._filter_mask,
                defaults=query.get("defaults"))
            scores = eval_formula(formula, ctx)
            order = np.lexsort((np.asarray(cand), -scores))[:k]
            return hits_out([(float(scores[j]), int(cand[j]))
                             for j in order])
        if using and using in store.sparse:
            # sparse rescore: candidates with no overlapping term drop
            # (sparse semantics — no shared dimension means no score)
            sq = self._resolve_sparse_query(query, using)
            cmask = np.zeros(store.count, bool)
            cmask[cand] = True
            s1, i1 = self._get_sparse_index(using).search(
                sq, k, row_mask=cmask)
            return hits_out([(float(sv), int(iv))
                             for sv, iv in zip(s1, i1) if iv >= 0])
        qv = self._resolve_query_vector(query, using)
        if using and using in store.multi:
            # MaxSim rescore of the candidates (points with no
            # sub-vectors drop — they have no similarity)
            from .ops.multivec import maxsim_score_rows
            scores = maxsim_score_rows(
                store.multivector_rows(using, cand), qv)
            order = np.lexsort((np.asarray(cand), -scores))[:k]
            return hits_out([(float(scores[j]), int(cand[j]))
                             for j in order if np.isfinite(scores[j])])
        # cross-space prefetch union: a candidate whose vector was
        # deleted in THIS space has no score here (qdrant skips it) —
        # drop it before reading the stale on-disk bytes
        cand = self._drop_deleted(cand, using)
        if not cand:
            return []
        vecs = np.asarray(store.vectors(using)[cand], np.float32)
        scores = self._exact_scores(vecs, qv)
        order = np.lexsort((np.asarray(cand), -scores))[:k]
        return hits_out([(float(scores[j]), int(cand[j])) for j in order])

    def query_groups(self, query=None, *, group_by: str,
                     prefetch=None, fusion: Optional[str] = None,
                     group_size: int = 3, limit: Optional[int] = None,
                     filter=None, with_payload=True, seed=None,
                     using: str = "", lookup_from=None,
                     with_lookup=None):
        """Grouped universal query — qdrant's query_points_groups:
        any query() shape (plain/nearest, prefetch + RRF/DBSF fusion,
        exact/formula/MMR rescore, random sampling, named/sparse
        spaces, lookup_from) bucketed by a payload field, each bucket
        reporting its top `group_size` hits. Replaces the reference's
        one-image-floods-the-page search results
        (core_system.py:659-664) at the universal-query surface the
        way search_groups does for the plain engine search.

        Groups are ranked by their best hit (first appearance in the
        underlying result order — for MMR that is selection order);
        hits within a group keep result order. Rows without the
        `group_by` key are skipped (qdrant semantics); list/dict keys
        group by their canonical JSON (the search_groups convention).
        The scan deepens (doubling the internal limit, scaling
        explicit prefetch branch limits with it) until every selected
        group is full or the candidate pool is exhausted — exact for
        plain queries; for prefetch shapes the pool is the fused/
        rescored union, so deepening is best-effort exactly as in
        qdrant. Returns a list of {"key", "hits"} dicts, best group
        first; `with_lookup` joins each group key against a point of
        another collection (see search_groups)."""
        store = self._store
        if store is None:
            raise StoreError("no database loaded")
        if not group_by or not isinstance(group_by, str):
            raise ValueError("query_groups needs a group_by payload "
                             "key (qdrant requires one too)")
        limit = self.config.search.top_k if limit is None else int(limit)
        group_size = max(1, int(group_size))
        store.refresh()
        cols = self._payload_columns()
        key_col = cols.column(group_by)
        has_key = cols.present(group_by)

        def scaled(factor: int):
            # deepen explicit branch limits alongside the top-level k
            # (implicit limits already scale: query() defaults them
            # from k); non-dict branches keep their implicit limit
            if prefetch is None or factor == 1:
                return prefetch
            out = []
            for spec in prefetch:
                if isinstance(spec, dict) and "limit" in spec:
                    spec = {**spec,
                            "limit": int(spec["limit"]) * factor}
                out.append(spec)
            return out

        k0 = min(store.count, max(limit * group_size, 32))
        k = k0
        while True:
            hits = self.query(query, prefetch=scaled(max(1, k // k0)),
                              fusion=fusion, k=k, filter=filter,
                              with_payload=False, seed=seed,
                              using=using, lookup_from=lookup_from)
            sel: dict = {}
            complete = False
            for h in hits:
                i = h["id"]
                if not has_key[i]:
                    continue
                kv = key_col[i]
                if not isinstance(kv, (str, int, float, bool)):
                    kv = json.dumps(kv, sort_keys=True)
                got = sel.get(kv)
                if got is None:
                    if len(sel) >= limit:
                        continue
                    sel[kv] = [h]
                elif len(got) < group_size:
                    got.append(h)
                if (len(sel) == limit
                        and all(len(v) >= group_size
                                for v in sel.values())):
                    complete = True
                    break
            if complete or len(hits) < k or k >= store.count:
                break
            k = min(store.count, k * 2)

        ids = [h["id"] for hits in sel.values() for h in hits]
        pays = dict(zip(ids, self._payloads_with(store, ids,
                                                 with_payload)))
        groups = []
        for kv, hits in sel.items():
            for h in hits:
                h["payload"] = pays.get(h["id"])
            groups.append({"key": kv, "hits": hits})
        if with_lookup is not None:
            self._attach_group_lookups(groups, with_lookup)
        return groups

    def query_batch(self, requests, *, with_payload: bool = True):
        """Run several universal queries in ONE call — qdrant's
        query_batch_points role, TPU-shaped: plain vector requests
        sharing a filter coalesce into one batched kernel launch (the
        per-query cost of the streaming scan is tiny next to the
        database read, so B plain queries cost about one); requests
        with prefetch/fusion/random sampling fall back to query() per
        request. Each request is a dict of query() kwargs; returns a
        list of result lists in request order."""
        import jax
        import json as _json

        store = self._store
        if store is None:
            raise StoreError("no database loaded")
        store.refresh()
        reqs = [dict(r) for r in requests]
        allowed = {"query", "prefetch", "fusion", "k", "filter",
                   "with_payload", "seed", "using", "lookup_from"}
        for r in reqs:
            bad = set(r) - allowed
            if bad:
                raise ValueError(f"unknown request keys {sorted(bad)} "
                                 f"(allowed: {sorted(allowed)})")
        results: list = [None] * len(reqs)
        groups: dict[tuple, list[int]] = {}
        for n, r in enumerate(reqs):
            q = r.get("query")
            plain = (not r.get("prefetch") and r.get("fusion") is None
                     and q is not None
                     and not (isinstance(q, dict)
                              and ("sample" in q or "formula" in q
                                   or "mmr" in q or "order_by" in q
                                   or set(q) & {"recommend", "discover",
                                                "context"}))
                     # lookup_from ids resolve in another collection —
                     # the per-request query() path handles the open
                     and r.get("lookup_from") is None
                     # sparse spaces score host-side per request (no
                     # device launch to coalesce); multivector queries
                     # are ragged [Tq, d] operands with their own
                     # MaxSim launch — both fall back to query()
                     and str(r.get("using") or "") not in store.sparse
                     and str(r.get("using") or "") not in store.multi)
            if not plain:
                # carry the batch-level payload default into the
                # fallback call (per-request with_payload still wins)
                r.setdefault("with_payload", with_payload)
                results[n] = self.query(**r)
                continue
            try:
                fkey = _json.dumps(r.get("filter"), sort_keys=True,
                                   default=repr)
            except (TypeError, ValueError):
                fkey = repr(r.get("filter"))
            # same-space requests coalesce; spaces differ in dim/index
            groups.setdefault((str(r.get("using") or ""), fkey),
                              []).append(n)
        for (space, _), idxs in groups.items():
            vecs = np.stack(
                [self._resolve_query_vector(reqs[n]["query"], space)
                 for n in idxs])
            fspec = reqs[idxs[0]].get("filter")
            mask = self._filter_mask(fspec) if fspec is not None else None
            ks = [self.config.search.top_k if reqs[n].get("k") is None
                  else int(reqs[n]["k"]) for n in idxs]
            s, i = jax.device_get(
                self._get_index(space).search(vecs, max(ks),
                                              row_mask=mask))
            for row, (n, kk) in enumerate(zip(idxs, ks)):
                pairs = [(float(sv), int(iv))
                         for sv, iv in zip(s[row][:kk], i[row][:kk])
                         if iv >= 0]
                ids = [pid for _, pid in pairs]
                wp = reqs[n].get("with_payload", with_payload)
                payloads = self._payloads_with(store, ids, wp)
                results[n] = [{"id": pid, "score": sc, "payload": p}
                              for (sc, pid), p in zip(pairs, payloads)]
        return results

    def scroll(self, filter=None, *, offset=0, limit: int = 100,
               with_payload: bool = True, order_by: Optional[str] = None,
               direction: str = "asc", with_vectors: bool = False,
               using: str = ""):
        """Page through stored points (ids + payloads), optionally
        filtered — the role of qdrant's scroll API. Returns
        (points, next_offset): `points` is a list of {"id", "payload"}
        dicts (plus "vector" from the `using` space under
        `with_vectors=True`, qdrant's scroll selector); `next_offset`
        is the token to pass as `offset` for the next page, or None
        when exhausted.

        Default order is by row id; `offset` is then a row id, so pages
        stay stable under concurrent appends. With `order_by=<payload
        key>` points come sorted by that key's value — numbers by
        magnitude, RFC 3339 / ISO 8601 strings by timestamp (epoch
        seconds; a key mixing both interleaves on that shared numeric
        axis). Missing / unordered rows are excluded — qdrant's
        order_by is likewise integer/float/datetime only. Ties break
        by row id ascending; `offset` is then the opaque `(value, id)`
        token the previous page returned (pass 0/None to start)."""
        store = self._store
        if store is None:
            raise StoreError("no database loaded")
        limit = max(0, int(limit))
        mask = self._filter_mask(filter) if filter is not None else None
        store.refresh()
        if order_by is not None:
            if direction not in ("asc", "desc"):
                raise ValueError(f"direction must be asc|desc, got "
                                 f"{direction!r}")
            cols = self._payload_columns()
            view = cols.view(str(order_by))
            vals_all = view.num
            if len(view.uniq):        # datetime strings order too
                dt_rows, _ = cols.datetime_num(str(order_by))
                vals_all = np.where(np.isnan(vals_all), dt_rows,
                                    vals_all)
            keep = ~np.isnan(vals_all)
            if mask is not None:
                keep &= mask[:len(vals_all)]
            ids = np.nonzero(keep)[0]
            vals = vals_all[ids]
            sign = 1.0 if direction == "asc" else -1.0
            order = np.lexsort((ids, sign * vals))
            ids, vals = ids[order], vals[order]
            if offset not in (None, 0):
                try:
                    o_val, o_id = offset
                    o_val, o_id = float(o_val), int(o_id)
                except (TypeError, ValueError):
                    raise ValueError(
                        "with order_by, offset is the (value, id) "
                        f"token the previous page returned, got "
                        f"{offset!r}")
                after = (sign * vals > sign * o_val) | (
                    (vals == o_val) & (ids >= o_id))
                ids, vals = ids[after], vals[after]
            next_offset = ((float(vals[limit]), int(ids[limit]))
                           if len(ids) > limit else None)
            ids = ids[:limit + 1]
        elif mask is None:
            ids = np.arange(max(0, int(offset)),
                            min(store.count, max(0, int(offset)) + limit + 1))
            next_offset = int(ids[limit]) if len(ids) > limit else None
        else:
            ids = np.nonzero(mask)[0]
            ids = ids[ids >= int(offset)][:limit + 1]
            next_offset = int(ids[limit]) if len(ids) > limit else None
        page = [int(i) for i in ids[:limit]]
        payloads = self._payloads_with(store, page, with_payload)
        points = [{"id": i, "payload": p} for i, p in zip(page, payloads)]
        if with_vectors and page:
            vecs = np.asarray(store.vectors(using)[page], np.float32)
            gone = set(store.deleted_rows(using).tolist())
            for pt, v in zip(points, vecs):
                if pt["id"] not in gone:   # delete_vectors: absent
                    pt["vector"] = v.tolist()
        return points, next_offset

    def retrieve(self, ids, *, with_payload: bool = True,
                 with_vectors: bool = False, using: str = ""):
        """Fetch specific points — qdrant's retrieve API role. `ids`
        mixes integer row ids and `region_id` payload strings (the
        reference's per-point UUIDs, core_system.py:608-609). Unknown
        ids are silently skipped (qdrant semantics). Returns a list of
        {"id", "payload"[, "vector"]} dicts in request order;
        `with_vectors` reads the `using` vector space ('' = default)."""
        store = self._store
        if store is None:
            raise StoreError("no database loaded")
        store.refresh()
        rows: list[int] = []
        str_ids = [i for i in ids if isinstance(i, str)]
        by_region: dict[str, int] = {}
        if str_ids:
            cols = self._payload_columns()
            view = cols.view("region_id")
            col = cols.column("region_id")
            want = [c for c in (view.uindex.get(s, -2) for s in str_ids)
                    if c >= 0]
            hits = np.nonzero(np.isin(view.codes, want))[0]
            # keep-first on duplicate region_ids (store is append-only)
            for r in hits.tolist():
                by_region.setdefault(col[r], r)
        for i in ids:
            if isinstance(i, str):
                r = by_region.get(i)
                if r is not None:
                    rows.append(r)
            elif 0 <= int(i) < store.count:
                rows.append(int(i))
        payloads = self._payloads_with(store, rows, with_payload)
        points = [{"id": r, "payload": p} for r, p in zip(rows, payloads)]
        if with_vectors and rows:
            if using and using in store.sparse:
                for pt, sv in zip(points, store.sparse_rows(using, rows)):
                    pt["vector"] = sv
            elif using and using in store.multi:
                for pt, mv in zip(points,
                                  store.multivector_rows(using, rows)):
                    pt["vector"] = mv
            else:
                vecs = np.asarray(store.vectors(using)[rows], np.float32)
                gone = set(store.deleted_rows(using).tolist())
                for pt, v in zip(points, vecs):
                    if pt["id"] not in gone:   # delete_vectors: absent
                        pt["vector"] = v
        return points

    def facet(self, key: str, filter=None, *, limit: int = 10):
        """Value histogram of one payload key over (optionally
        filtered) points — qdrant's facet API role. Returns a list of
        {"value", "count"} dicts, count-descending (ties by value).
        Only hashable scalar values (str/int/float/bool) are counted;
        rows missing the key or holding lists/objects are skipped."""
        from collections import Counter

        store = self._store
        if store is None:
            raise StoreError("no database loaded")
        store.refresh()
        cols = self._payload_columns()
        col = cols.column(str(key))
        keep = cols.present(str(key))
        mask = self._filter_mask(filter) if filter is not None else None
        if mask is not None:
            keep = keep & mask[:len(col)]
        counts = Counter(
            v for v in col[keep].tolist()
            if isinstance(v, (str, int, float, bool)))
        top = sorted(counts.items(), key=lambda kv: (-kv[1], str(kv[0])))
        return [{"value": v, "count": int(n)}
                for v, n in top[:max(0, int(limit))]]

    def search_matrix(self, *, sample: int = 10, limit: int = 3,
                      filter=None, seed=None, offsets: bool = False,
                      using: str = ""):
        """Pairwise similarity matrix over a random sample of stored
        points — qdrant's search_matrix_pairs / search_matrix_offsets
        role (the clustering/dedup view of the store the reference
        drove via plain search, core_system.py:659-664).

        Samples up to `sample` points (without replacement, uniformly
        over the rows matching `filter`; `seed` makes the draw
        reproducible) and scores every sampled point against every
        other in ONE [S, S] fp32 MXU block. Each point reports its
        `limit` most-similar OTHER sampled points, (-score, idx) ties.

        Returns pairs format (default): a list of {"id_a", "id_b",
        "score"} dicts grouped by id_a ascending, best-first within a
        group — or, with offsets=True, qdrant's offsets format:
        {"ids", "offsets_row", "offsets_col", "scores"} where row/col
        are positions in the sorted `ids` list. The sample axis is
        padded to a power-of-two bucket so varying sample sizes reuse
        one compiled kernel."""
        import jax

        from .ops.recommend import matrix_topk

        store = self._store
        if store is None:
            raise StoreError("no database loaded")
        if store.distance in ("euclid", "manhattan"):
            raise StoreError("search_matrix scores by dot product — "
                             f"not supported on a {store.distance}-"
                             "distance store")
        sample, limit = int(sample), int(limit)
        if sample < 2:
            raise ValueError("sample must be >= 2 (a pair needs two points)")
        if sample > 8192:
            raise ValueError("sample is capped at 8192 (the [S, S] score "
                             "block is materialized)")
        if limit < 1:
            raise ValueError("limit must be >= 1")
        store.refresh()
        mask = self._filter_mask(filter) if filter is not None else None
        mask = self._presence_and(mask, using)   # delete_vectors rows out
        pop = int(np.count_nonzero(mask)) if mask is not None \
            else store.count
        empty = ({"ids": [], "offsets_row": [], "offsets_col": [],
                  "scores": []} if offsets else [])
        if pop < 2:
            return empty
        rng = np.random.default_rng(seed)
        ids = np.sort(_sample_rows(rng, sample, store.count, mask))
        vecs = np.asarray(store.vectors(using)[ids], np.float32)
        s_pad = max(8, 1 << (len(ids) - 1).bit_length())
        if s_pad > len(ids):
            vecs = np.concatenate(
                [vecs, np.zeros((s_pad - len(ids), vecs.shape[1]),
                                np.float32)])
        lim = min(limit, len(ids) - 1)
        scores, cols = jax.device_get(
            matrix_topk(vecs, lim, n_valid=len(ids)))
        scores, cols = scores[:len(ids)], cols[:len(ids)]
        if offsets:
            out = {"ids": [int(i) for i in ids], "offsets_row": [],
                   "offsets_col": [], "scores": []}
            for r in range(len(ids)):
                for sc, c in zip(scores[r], cols[r]):
                    if c >= 0:
                        out["offsets_row"].append(r)
                        out["offsets_col"].append(int(c))
                        out["scores"].append(float(sc))
            return out
        return [{"id_a": int(ids[r]), "id_b": int(ids[c]),
                 "score": float(sc)}
                for r in range(len(ids))
                for sc, c in zip(scores[r], cols[r]) if c >= 0]

    # -- index build ------------------------------------------------------

    def request_stop(self) -> None:
        """Cooperative cancellation (reference core_system.py:457-459)."""
        self._stop_event.set()

    def create_database(self, folder_path: str, database_name: str,
                        text_prompt: str = "person . car . building",
                        use_direct_pe: bool = False,
                        progress_callback=None,
                        resume_from_checkpoint: bool = False,
                        include_subfolders: bool = False) -> str:
        """Build a searchable database from a folder
        (reference core_system.py:461-648)."""
        self._set_store(None)  # release any handle on the target store
        result = build_database(
            self.encoder, folder_path, database_name,
            config=self.config, text_prompt=text_prompt,
            use_direct_pe=use_direct_pe, detector=self.detector,
            progress_callback=progress_callback,
            resume_from_checkpoint=resume_from_checkpoint,
            include_subfolders=include_subfolders,
            stop_event=self._stop_event, metrics=self.metrics)
        if result.total_embeddings > 0 and not result.stopped:
            try:
                self._set_store(VectorStore.open(self.db_root, database_name))
            except StoreError:
                pass
        return result.transcript

    # -- visualization ----------------------------------------------------

    def visualize_detections(self, image, selected_region_index=None,
                             regions=_USE_ENGINE_STATE):
        """Draw region contours (reference core_system.py:719-757).

        Pass `regions` (may be None for a direct-PE query) to render a
        specific detection set statelessly; default draws the engine's
        last-query state."""
        if regions is Reverso._USE_ENGINE_STATE:
            regions = self.detected_regions
        return _viz(image, regions, selected_region_index)
