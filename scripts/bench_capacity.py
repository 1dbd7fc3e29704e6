"""Single-chip capacity artifact: 16-32M x 1024 binary index on device.

EVAL.md's "~100M x 1024 per chip" binary-capacity claim rested on
1M-row scans (VERDICT r4 weak #3). This builds a REAL 16M (or 32M)
x 1024 index in HBM — 2 (4) GB packed, where the f32 source would be
64 (128) GB and can therefore never exist as one array — via
`BinaryIndex.from_chunks`: the clustered corpus is GENERATED on device
chunk by chunk (seeded, reproducible), mean-centered and sign-packed
straight into the padded uint8 buffer. Measures:

  * build wall time (center pass + pack pass, chunked),
  * scan latency at Q in {1, 256}, k=10 (block-minima timing —
    bench._best_time — through the axon tunnel),
  * candidate recall@10 at 3x oversampling vs the EXACT bf16 scan of
    the same corpus (chunk-regenerated ground truth, host-merged).
    With oversampling, candidate recall IS recall-after-rescore: the
    engine's rescore adapter re-ranks candidates by true scores, so
    any true top-10 member among the candidates is retrieved.
  * HBM headroom: index bytes vs the chip's 16 GB.

Corpus: bench_binary.py's generator shape — 65,536 unit centers,
per-dim noise scaled 1/sqrt(d) for within-cluster cosine ~0.85,
queries perturbed from real rows (cos ~0.96) — the near-duplicate
class real embedding towers produce (EVAL.md binary section: recall
0.998 on this class at 1M; flat random is the documented tie-dense
worst case and is NOT what towers emit).

Run:  python scripts/bench_capacity.py [--n 16777216] [--chunk 524288]
Reference analog: qdrant's capacity role
(/root/reference/core_system.py:659-664), BASELINE config #5 per-chip
shard.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16 * 1024 * 1024)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--centers", type=int, default=65536)
    ap.add_argument("--chunk", type=int, default=512 * 1024)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--oversample", type=int, default=3)
    ap.add_argument("--ivf", action="store_true",
                    help="int8 IVF capacity run (IVFIndex.from_chunks) "
                         "instead of the binary index")
    ap.add_argument("--clusters", type=int, default=2048)
    ap.add_argument("--nprobes", default="8,16,32")
    args = ap.parse_args()

    from reverso_tpu.cli import _enable_compile_cache
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    import bench
    from reverso_tpu.store.index import BinaryIndex

    n, d, C = args.n, args.d, args.centers
    print(f"backend: {jax.default_backend()}  corpus {n}x{d}, "
          f"{C} centers", flush=True)
    ref = bench._contention_reference()
    print(f"contention ref: {ref}", flush=True)

    def _normalize(x):
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    centers = jax.jit(
        lambda: _normalize(jax.random.normal(
            jax.random.PRNGKey(7), (C, d), jnp.float32)))()

    # per-dim sigma scaled 1/sqrt(d) so |noise| is a real cosine knob
    # (bench_binary.py's generator: within-cluster cos ~0.85 — the
    # near-duplicate class real towers emit; a fixed per-dim sigma
    # would make |noise| ~ sigma*sqrt(d) >> 1 = flat tie-dense noise)
    within_cos = 0.85
    sigma = float(np.sqrt((1 - within_cos) / within_cos / d))

    @jax.jit
    def gen_chunk_j(cent, rows_arange, key):
        # `cent` is an ARGUMENT, not a closure capture: a captured
        # device array bakes 268 MB of literals into the HLO and the
        # remote-compile endpoint rejects the program (HTTP 413)
        cid = (rows_arange.astype(jnp.uint32) * jnp.uint32(2654435761)
               % jnp.uint32(C)).astype(jnp.int32)
        noise = jax.random.normal(key, (rows_arange.shape[0], d),
                                  jnp.float32)
        x = jnp.take(cent, cid, axis=0) + sigma * noise
        return _normalize(x)

    def chunk_fn(lo, rows):
        key = jax.random.fold_in(jax.random.PRNGKey(11),
                                 lo // args.chunk)
        ar = jnp.arange(lo, lo + rows)
        return gen_chunk_j(centers, ar, key)

    if args.ivf:
        return run_ivf(args, bench, chunk_fn, ref)

    t0 = time.perf_counter()
    idx = BinaryIndex.from_chunks(chunk_fn, n, d, chunk=args.chunk)
    np.asarray(idx.matrix[:1, :8])          # force completion
    t_build = time.perf_counter() - t0
    gb = idx.nbytes / 2**30
    print(f"build: {t_build:.1f}s  packed {gb:.2f} GiB "
          f"({100 * gb / 16:.0f}% of 16 GiB HBM)", flush=True)

    # queries: perturbed copies of real chunk-0 rows (near-duplicate
    # lookup, cos(q, source row) ~0.96 — bench_binary.py's recipe)
    qkey = jax.random.PRNGKey(23)
    rows0 = chunk_fn(0, min(args.chunk, n))
    qi = jnp.arange(args.queries) * (min(args.chunk, n)
                                     // args.queries)
    qsigma = 0.29 / float(np.sqrt(d))
    queries = _normalize(
        jnp.take(rows0, qi, axis=0)
        + qsigma * jax.random.normal(qkey, (args.queries, d),
                                     jnp.float32))
    del rows0
    queries_dev = jax.device_put(queries)

    # exact bf16 ground truth: chunk-regenerate + per-chunk top-k,
    # host merge (the full bf16 corpus would be 2n/1e9 GB and not fit)
    @jax.jit
    def chunk_topk(block, qs):
        s = jax.lax.dot_general(
            qs.astype(jnp.bfloat16), block.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jax.lax.top_k(s, args.k)

    t0 = time.perf_counter()
    all_s, all_i = [], []
    for lo in range(0, n, args.chunk):
        rows = min(args.chunk, n - lo)
        s, i = chunk_topk(chunk_fn(lo, rows), queries_dev)
        all_s.append(np.asarray(s))
        all_i.append(np.asarray(i) + lo)
    s_cat = np.concatenate(all_s, axis=1)
    i_cat = np.concatenate(all_i, axis=1)
    order = np.argsort(-s_cat, axis=1, kind="stable")[:, :args.k]
    true_i = np.take_along_axis(i_cat, order, axis=1)
    t_truth = time.perf_counter() - t0
    print(f"exact ground truth: {t_truth:.1f}s "
          f"({(n + args.chunk - 1) // args.chunk} chunks)", flush=True)

    # candidate recall at oversample*k
    kk = args.oversample * args.k
    _, cand = map(np.asarray, idx.search(np.asarray(queries), kk))
    rec = np.mean([len(set(c) & set(t)) / args.k
                   for c, t in zip(cand, true_i)])
    print(f"candidate recall@{args.k} at {args.oversample}x "
          f"oversample: {rec:.3f}", flush=True)

    # scan latency (block minima)
    host_q = np.asarray(queries)
    lat = {}
    for q in (1, 256):
        qs = host_q[:q]
        qdev = jax.device_put(qs)

        def run():
            return idx.search(qdev, args.k)

        np.asarray(run()[0][:1])
        dt = bench._best_time(run, lambda r: np.asarray(r[0][:1]),
                              budget_s=30.0, k=8)
        lat[q] = dt * 1e3
        print(f"scan Q={q}: {dt * 1e3:.2f} ms "
              f"({q / dt:.0f} QPS)", flush=True)

    ref2 = bench._contention_reference()
    print(f"contention ref (post): {ref2}", flush=True)
    print(json.dumps({
        "n": n, "d": d, "packed_gib": round(gb, 2),
        "build_s": round(t_build, 1),
        "recall_at_10_3x": round(float(rec), 4),
        "scan_ms_q1": round(lat[1], 2),
        "scan_ms_q256": round(lat[256], 2),
        "ref_pre": ref, "ref_post": ref2,
    }))
    return 0


def run_ivf(args, bench, chunk_fn, ref):
    """8-16M x 1024 int8 IVF: `IVFIndex.from_chunks` build (the bf16
    source would be 16-32 GB and cannot sit beside its own index —
    the virtual-corpus path streams it), recall vs the exact int8
    scan over the index's OWN sorted rows, latency at serving Q."""
    import jax
    import jax.numpy as jnp

    from reverso_tpu.ops.topk import cosine_topk_int8_xla
    from reverso_tpu.store.ivf import IVFIndex

    n, d = args.n, args.d
    t0 = time.perf_counter()
    ivf = IVFIndex.from_chunks(chunk_fn, n, d, chunk=args.chunk,
                               n_clusters=args.clusters, dtype="int8",
                               seed=0)
    np.asarray(ivf.matrix[:1, :8])
    t_build = time.perf_counter() - t0
    gb = ivf.matrix.nbytes / 2**30
    print(f"IVF build: {t_build:.1f}s  C={args.clusters} "
          f"cmax={ivf.cmax}  int8 {gb:.2f} GiB "
          f"({100 * gb / 16:.0f}% of 16 GiB HBM)", flush=True)

    # queries: perturbed chunk-0 rows (same recipe as the binary run)
    rows0 = chunk_fn(0, min(args.chunk, n))
    qi = jnp.arange(args.queries) * (min(args.chunk, n)
                                     // args.queries)
    qsigma = 0.29 / float(np.sqrt(d))
    queries = jnp.take(rows0, qi, axis=0) + qsigma * jax.random.normal(
        jax.random.PRNGKey(23), (args.queries, d), jnp.float32)
    queries = queries / jnp.linalg.norm(queries, axis=1,
                                        keepdims=True)
    del rows0
    host_q = np.asarray(queries)

    # exact ground truth over the index's OWN int8 rows (isolates
    # probe misses from quantization, which both paths share). The
    # matrix scans in 1M-row SLICES merged on host: the monolithic
    # scan would pad-copy the whole 8 GB matrix to a chunk multiple
    # and blow HBM at exactly the capacity int8 exists for.
    row_ids_h = np.concatenate([np.asarray(ivf.row_ids),
                                np.full(1, -1, np.int32)])
    mm = ivf.matrix.shape[0]
    piece = 1 << 20                      # multiple of the scan chunk

    def exact(q, k):
        ps, pi = [], []
        for lo in range(0, mm, piece):
            hi = min(lo + piece, mm)
            nv = max(0, min(hi, ivf.m) - lo)
            if nv == 0:
                continue
            s, pos = jax.device_get(cosine_topk_int8_xla(
                ivf.matrix[lo:hi], ivf.db_scale, q, k, n_valid=nv))
            ps.append(s)
            pi.append(np.where(pos < 0, -1, pos + lo))
        s_cat = np.concatenate(ps, axis=1)
        p_cat = np.concatenate(pi, axis=1)
        # (-score, layout position) == the monolithic stable order
        order = np.lexsort((p_cat, -s_cat), axis=1)[:, :k]
        pos_g = np.take_along_axis(p_cat, order, axis=1)
        ids = np.where(pos_g < 0, -1,
                       row_ids_h[np.clip(pos_g, 0, ivf.m)])
        return np.take_along_axis(s_cat, order, axis=1), ids

    t0 = time.perf_counter()
    _, i_true = exact(queries, args.k)
    print(f"exact int8 ground truth: {time.perf_counter() - t0:.1f}s",
          flush=True)

    nprobes = [int(x) for x in args.nprobes.split(",")]
    recall = {}
    for np_ in nprobes:
        _, ids = jax.device_get(ivf.search(queries, args.k,
                                           nprobe=np_))
        recall[np_] = float(np.mean(
            [len(set(p) & set(t)) / args.k
             for p, t in zip(ids, i_true)]))
        print(f"recall@{args.k} nprobe={np_}: {recall[np_]:.4f}",
              flush=True)

    lat = {}
    for q_n in (1, 8):
        q = host_q[:q_n]
        qdev = jax.device_put(q)
        for np_ in nprobes:
            def run():
                return ivf.search(qdev, args.k, nprobe=np_)
            np.asarray(run()[0][:1])
            dt = bench._best_time(run, lambda r: np.asarray(r[0][:1]),
                                  budget_s=20.0, k=8)
            lat[f"q{q_n}_np{np_}"] = round(dt * 1e3, 2)
            print(f"IVF Q={q_n} nprobe={np_}: {dt * 1e3:.2f} ms",
                  flush=True)
        # exact latency: one timed pass of the sliced scan (it syncs
        # per slice, so block-minima estimation does not apply; this
        # is an upper bound that includes the host merges)
        t0 = time.perf_counter()
        exact(q, args.k)
        lat[f"q{q_n}_exact"] = round((time.perf_counter() - t0) * 1e3,
                                     2)
        print(f"exact Q={q_n} (sliced, one pass): "
              f"{lat[f'q{q_n}_exact']:.2f} ms", flush=True)

    ref2 = bench._contention_reference()
    print(f"contention ref (post): {ref2}", flush=True)
    print(json.dumps({
        "mode": "ivf_int8", "n": n, "d": d,
        "clusters": args.clusters, "cmax": int(ivf.cmax),
        "int8_gib": round(gb, 2), "build_s": round(t_build, 1),
        "recall": recall, "latency_ms": lat,
        "ref_pre": ref, "ref_post": ref2,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
