"""Sparse inverted-index benchmark: earn store/sparse.py's numbers.

VERDICT r3 ask #4: `store/sparse.py` claimed "sub-millisecond warm at
1M rows x ~100 nnz" without a committed measurement. This measures, on
the host (sparse scoring is deliberately host-side — see the module
docstring):

 1. index build from the entry log (the one argsort) at 1M x 100 nnz;
 2. persisted-cache save + cold load;
 3. warm single-query latency across query widths (10/50/100 terms),
    Zipf-distributed vocabulary (hot terms have million-row postings —
    the adversarial case for the per-query O(N) accumulate);
 4. batched/interleaved queries (sequential loop — no batching layer
    exists host-side; the number shows per-query cost is stable);
 5. hybrid end-to-end: sparse branch + dense branch + RRF through
    `Reverso.query` on a store (engine-level latency, warm).

Interleaved best-of-N; absolute host numbers swing with tenant load.

Usage: python scripts/bench_sparse.py [--n 1000000] [--nnz 100]
"""
import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_entries(rng, n, nnz, vocab):
    """Zipf-ish term draw: term ids ~ floor(vocab * u^3) concentrates
    mass on low ids (hot terms) with a long tail. Terms are UNIQUE
    within each row (the store's check_sparse_row invariant — the
    scorers are only defined over deduplicated rows); rows end up with
    ~nnz terms (hot-term collisions drop a few)."""
    draw = int(nnz * 1.3) + 4
    t2 = (vocab * rng.random((n, draw)) ** 3).astype(np.int64)
    t2.sort(axis=1)
    keep = np.ones(t2.shape, bool)
    keep[:, 1:] = t2[:, 1:] != t2[:, :-1]
    keep &= np.cumsum(keep, axis=1) <= nnz
    counts = keep.sum(axis=1)
    e = int(counts.sum())
    entries = np.empty(e, dtype=[("i", np.uint32), ("v", np.float32)])
    entries["i"] = t2[keep].astype(np.uint32)
    entries["v"] = rng.random(e).astype(np.float32) + 0.1
    indptr = np.cumsum(counts, dtype=np.int64)
    return entries, indptr


def make_query(rng, vocab, width):
    idx = np.unique((vocab * rng.random(width * 2)**3).astype(np.int64))
    idx = idx[:width]
    return {"indices": idx.tolist(),
            "values": (rng.random(len(idx)) + 0.1).tolist()}


def best(fn, rounds=5):
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        r = fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--nnz", type=int, default=100)
    ap.add_argument("--vocab", type=int, default=30_000)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from reverso_tpu.store.sparse import SparseIndex

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    entries, indptr = synth_entries(rng, args.n, args.nnz, args.vocab)
    print(f"corpus: {args.n} rows x {args.nnz} nnz, vocab {args.vocab} "
          f"({entries.nbytes / 2**20:.0f} MB entry log), synth "
          f"{time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    idx = SparseIndex.build(entries, indptr)
    t_build = time.perf_counter() - t0
    print(f"index build (argsort of {len(entries):,} postings): "
          f"{t_build:.1f}s")

    with tempfile.TemporaryDirectory() as root:
        path = os.path.join(root, "sparse_cache.npz")
        t0 = time.perf_counter()
        idx._save(path)
        t_save = time.perf_counter() - t0
        t0 = time.perf_counter()
        idx2 = SparseIndex._load(path, args.n)
        # touch to fault the arrays in (np.load lazy-reads members)
        _ = int(idx2.rows[-1]) + float(idx2.vals[-1])
        t_load = time.perf_counter() - t0
        print(f"cache save {t_save:.1f}s "
              f"({os.path.getsize(path) / 2**20:.0f} MB), "
              f"cold load {t_load:.2f}s (vs {t_build:.1f}s rebuild)")

    # interleaved native-vs-numpy A/B (the host is time-shared; only
    # same-loop comparisons are trustworthy)
    from reverso_tpu import native as native_mod
    have_native = native_mod.native_available()

    def numpy_mode():
        native_mod._LIB, native_mod._TRIED = None, True

    def native_mode():
        native_mod._TRIED = False
        native_mod._load()

    print(f"\n{'query width':<12} {'numpy ms':>9} {'native ms':>10} "
          f"{'speedup':>8} {'postings':>11} {'batch32 ms/q':>13}")
    for width in (10, 50, 100):
        qs = [make_query(rng, args.vocab, width) for _ in range(32)]
        idx.search(qs[0], args.k)           # warm
        t_np, t_nat = float("inf"), float("inf")
        for _ in range(5):                  # interleave the minima
            numpy_mode()
            t0 = time.perf_counter()
            r_np = idx.search(qs[0], args.k)
            t_np = min(t_np, time.perf_counter() - t0)
            if have_native:
                native_mode()
                t0 = time.perf_counter()
                r_nat = idx.search(qs[0], args.k)
                t_nat = min(t_nat, time.perf_counter() - t0)
                assert np.array_equal(r_np[1], r_nat[1])
        pos = np.searchsorted(idx.terms, np.asarray(qs[0]["indices"]))
        touched = sum(
            int(idx.starts[p + 1] - idx.starts[p])
            for p, t in zip(pos, qs[0]["indices"])
            if p < len(idx.terms) and idx.terms[p] == t)
        t32, _ = best(lambda: [idx.search(q, args.k) for q in qs],
                      rounds=3)
        print(f"{width:<12} {t_np * 1e3:>9.2f} {t_nat * 1e3:>10.2f} "
              f"{t_np / t_nat:>7.1f}x {touched:>11,} "
              f"{t32 / 32 * 1e3:>13.2f}")

    # hybrid end-to-end through the engine (smaller store: the engine
    # path cost is per-query orchestration + the two branch scans)
    import dataclasses
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso
    from reverso_tpu.store import VectorStore

    hn, hd = 200_000, 64
    dense = rng.standard_normal((hn, hd)).astype(np.float32)
    dense /= np.linalg.norm(dense, axis=1, keepdims=True)
    he, hi = synth_entries(rng, hn, 32, args.vocab)
    rows = []
    lo = 0
    for r in range(hn):
        hi_r = int(hi[r])
        # store rows require unique indices per row (qdrant contract)
        uidx, upos = np.unique(he["i"][lo:hi_r], return_index=True)
        rows.append({"indices": uidx.tolist(),
                     "values": he["v"][lo:hi_r][upos].tolist()})
        lo = hi_r
    with tempfile.TemporaryDirectory() as root:
        t0 = time.perf_counter()
        with VectorStore.create(root, "hyb", hd,
                                sparse={"text": {}}) as s:
            B = 50_000
            for b in range(0, hn, B):
                s.append(dense[b:b + B],
                         [{"region_id": f"r{i}"}
                          for i in range(b, min(b + B, hn))],
                         {"text": rows[b:b + B]})
        print(f"\nhybrid store: {hn} rows x (dense {hd} + sparse 32nnz) "
              f"built {time.perf_counter() - t0:.1f}s")
        cfg = default_config()
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(MODEL_PRESETS["test-tiny"],
                                      dtype="float32"),
            store=dataclasses.replace(cfg.store, root_dir=root))
        eng = Reverso(cfg)
        eng.load_database("hyb")
        sq = make_query(rng, args.vocab, 50)
        dq = dense[17].tolist()
        prefetch = [{"query": sq, "using": "text", "limit": 30},
                    {"query": dq, "limit": 30}]
        eng.query(prefetch=prefetch, fusion="rrf", k=args.k)  # warm
        dt, hits = best(lambda: eng.query(prefetch=prefetch,
                                          fusion="rrf", k=args.k))
        print(f"hybrid query (sparse 50-term + dense branch + RRF): "
              f"{dt * 1e3:.1f} ms warm, {len(hits)} hits")
        # sparse-branch-only engine query for the split
        dt_s, _ = best(lambda: eng.query(sq, using="text", k=args.k))
        dt_d, _ = best(lambda: eng.query(dq, k=args.k))
        print(f"  branch split: sparse-only {dt_s * 1e3:.1f} ms, "
              f"dense-only {dt_d * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
