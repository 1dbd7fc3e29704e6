"""Binary quantization — qdrant's BinaryQuantization role (1 bit per
dimension candidate index + rescore/oversampling search params). The
reference never enabled it (cosine-only qdrant local mode, reference
core_system.py:600-622); here it is the 16x-capacity mode of the
device index: ops/binary.py packed scan, store/index.py BinaryIndex,
engine._BinaryRescoreAdapter exact rescore.
"""
import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reverso_tpu.ops.binary import (
    binary_topk_pallas,
    binary_topk_xla,
    lane_plane_width,
    pack_signs,
    sharded_binary_topk,
)
from reverso_tpu.store import BinaryIndex, StoreError, VectorStore


def bf16(x):
    return np.asarray(jnp.asarray(x, jnp.bfloat16).astype(jnp.float32))


def brute_binary(vecs, q, k):
    """fp64 reference of the asymmetric proxy: bf16(q) . sign(x)."""
    u = np.where(np.asarray(vecs) > 0, 1.0, -1.0).astype(np.float64)
    s = u @ bf16(q).astype(np.float64)
    order = np.lexsort((np.arange(len(u)), -s))[:k]
    return [(int(i), float(s[i])) for i in order]


# ---------------------------------------------------------------------------
# ops layer
# ---------------------------------------------------------------------------

def test_pack_signs_layout_roundtrip():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(7, 19)).astype(np.float32)
    packed = pack_signs(v)
    assert packed.shape == (7, 3) and packed.dtype == np.uint8
    # planar layout: bit j of byte b = dimension j*d8 + b
    planes = np.stack([(packed >> j) & 1 for j in range(8)], axis=1)
    got = planes.reshape(7, 24)[:, :19]
    np.testing.assert_array_equal(got, (v > 0).astype(np.uint8))
    # device unpack agrees (through the public scan: a one-row db
    # scoring a one-hot query reads out each dimension's sign)
    eye = np.eye(19, dtype=np.float32)
    s, i = jax.device_get(binary_topk_xla(jnp.asarray(packed[:1]),
                                          jnp.asarray(eye), 1, 19))
    np.testing.assert_array_equal(
        (s[:, 0] > 0).astype(np.uint8), (v[0] > 0).astype(np.uint8))


def test_binary_topk_parity_and_ties():
    rng = np.random.default_rng(1)
    n, d, k = 300, 24, 8
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    vecs[57] = vecs[3]        # identical sign pattern -> exact tie
    # bf16-exact query values so the fp64 reference matches bitwise
    q = np.round(rng.normal(size=d) * 4).astype(np.float32) / 2
    packed = jnp.asarray(pack_signs(vecs))
    s, i = jax.device_get(binary_topk_xla(packed, jnp.asarray(q[None]),
                                          k, d))
    want = brute_binary(vecs, q, k)
    assert [int(x) for x in i[0]] == [w[0] for w in want]
    np.testing.assert_allclose(s[0], [w[1] for w in want], rtol=1e-6)


def test_binary_topk_mask_nvalid_and_kn():
    rng = np.random.default_rng(2)
    n, d = 200, 16
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    q = np.round(rng.normal(size=d) * 4).astype(np.float32) / 2
    packed = jnp.asarray(pack_signs(vecs))
    keep = np.arange(n) % 3 == 0
    s, i = jax.device_get(binary_topk_xla(
        packed, jnp.asarray(q[None]), 5, d, row_mask=jnp.asarray(keep)))
    u = np.where(vecs > 0, 1.0, -1.0).astype(np.float64)
    sc = u @ bf16(q).astype(np.float64)
    idx = np.arange(n)[keep]
    want = idx[np.lexsort((idx, -sc[idx]))][:5]
    assert [int(x) for x in i[0]] == [int(w) for w in want]
    # n_valid masks trailing rows
    s, i = jax.device_get(binary_topk_xla(packed, jnp.asarray(q[None]),
                                          5, d, n_valid=50))
    assert (i[0] < 50).all()
    # k > n pads with -1
    s, i = jax.device_get(binary_topk_xla(packed, jnp.asarray(q[None]),
                                          n + 10, d))
    assert (i[0, n:] == -1).all() and np.isneginf(s[0, n:]).all()


def test_binary_pallas_matches_xla_and_brute():
    """The fused streaming-kernel mode (interpret on CPU) must agree
    with the chunked XLA scan and the fp64 reference — incl. row
    masks, n_valid, and k > n padding. Query values are multiples of
    0.5 so every f32 partial sum is exact regardless of accumulation
    order (bitwise-comparable across impls)."""
    rng = np.random.default_rng(10)
    n, d, k = 700, 160, 9          # W = lane_plane_width(160) = 128
    w = lane_plane_width(d)
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    vecs[33] = vecs[4]             # exact tie
    packed = jnp.asarray(pack_signs(vecs, plane_width=w))
    qs = (np.round(rng.normal(size=(5, d)) * 4) / 2).astype(np.float32)
    sp, ip = jax.device_get(binary_topk_pallas(packed, jnp.asarray(qs),
                                               k, d))
    sx, ix = jax.device_get(binary_topk_xla(packed, jnp.asarray(qs),
                                            k, d))
    np.testing.assert_array_equal(ip, ix)
    np.testing.assert_array_equal(sp, sx)
    want = brute_binary(vecs, qs[0], k)
    assert [int(x) for x in ip[0]] == [w_[0] for w_ in want]
    # masked
    keep = rng.random(n) < 0.35
    sp, ip = jax.device_get(binary_topk_pallas(
        packed, jnp.asarray(qs), k, d, row_mask=jnp.asarray(keep)))
    sx, ix = jax.device_get(binary_topk_xla(
        packed, jnp.asarray(qs), k, d, row_mask=jnp.asarray(keep)))
    np.testing.assert_array_equal(ip, ix)
    # n_valid + k > n_valid padding
    sp, ip = jax.device_get(binary_topk_pallas(packed, jnp.asarray(qs),
                                               60, d, n_valid=50))
    assert (ip < 50).all() and (ip[:, 50:] == -1).all()


def test_sharded_binary_matches_single_device():
    from reverso_tpu.parallel import make_mesh, replicate, shard_rows

    rng = np.random.default_rng(3)
    n, d, k = 1024, 32, 9
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    qs = (np.round(rng.normal(size=(3, d)) * 4) / 2).astype(np.float32)
    packed = jnp.asarray(pack_signs(vecs))
    mesh = make_mesh()
    s1, i1 = jax.device_get(binary_topk_xla(packed, jnp.asarray(qs), k, d))
    s8, i8 = jax.device_get(sharded_binary_topk(
        shard_rows(packed, mesh), replicate(jnp.asarray(qs), mesh),
        k, d, mesh))
    np.testing.assert_array_equal(i1, i8)
    np.testing.assert_allclose(s1, s8, rtol=1e-6)
    keep = rng.random(n) < 0.4
    s1, i1 = jax.device_get(binary_topk_xla(
        packed, jnp.asarray(qs), k, d, row_mask=jnp.asarray(keep)))
    s8, i8 = jax.device_get(sharded_binary_topk(
        shard_rows(packed, mesh), replicate(jnp.asarray(qs), mesh),
        k, d, mesh, row_mask=jnp.asarray(keep)))
    np.testing.assert_array_equal(i1, i8)
    # lane-aligned planes route each shard through the fused kernel —
    # results must still equal the single-device XLA scan
    wl = lane_plane_width(d)
    packed_l = jnp.asarray(pack_signs(vecs, plane_width=wl))
    s1, i1 = jax.device_get(binary_topk_xla(packed_l, jnp.asarray(qs),
                                            k, d))
    s8, i8 = jax.device_get(sharded_binary_topk(
        shard_rows(packed_l, mesh), replicate(jnp.asarray(qs), mesh),
        k, d, mesh))
    np.testing.assert_array_equal(i1, i8)
    np.testing.assert_allclose(s1, s8, rtol=1e-6)


# ---------------------------------------------------------------------------
# index + adapter
# ---------------------------------------------------------------------------

def test_binary_index_candidates():
    rng = np.random.default_rng(4)
    # kernel-shaped: rows pre-padded to the unroll (4096), planes
    # lane-aligned — at realistic shapes the 16x capacity win holds
    vecs = rng.normal(size=(4096, 1024)).astype(np.float32)
    idx = BinaryIndex(vecs)
    assert idx.nbytes * 16 <= vecs.nbytes / 2   # vs the bf16 copy
    q = (np.round(rng.normal(size=1024) * 4) / 2).astype(np.float32)
    s, i = jax.device_get(idx.search(q, 6))
    # bits are packed against the per-dim mean (rank-neutral centering)
    want = brute_binary(vecs - vecs.mean(axis=0, dtype=np.float64
                                         ).astype(np.float32), q, 6)
    assert [int(x) for x in i[0]] == [w[0] for w in want]


def test_rescore_adapter_exact_when_oversampling_covers():
    from reverso_tpu.engine import _BinaryRescoreAdapter

    rng = np.random.default_rng(5)
    n, d, k = 120, 64, 5
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    q = rng.normal(size=d).astype(np.float32)
    q /= np.linalg.norm(q)
    # oversampling covering the whole store makes rescore == exact scan
    ad = _BinaryRescoreAdapter(BinaryIndex(vecs), vecs,
                               oversampling=n / k)
    s, i = ad.search(q, k)
    exact = vecs.astype(np.float64) @ q.astype(np.float64)
    want = np.lexsort((np.arange(n), -exact))[:k]
    assert [int(x) for x in i[0]] == [int(w) for w in want]
    np.testing.assert_allclose(s[0], exact[want], atol=1e-5)
    # rescore=False surfaces the raw (mean-centered) proxy scores
    ad2 = _BinaryRescoreAdapter(BinaryIndex(vecs), vecs,
                                oversampling=2.0, rescore=False)
    s2, i2 = ad2.search(q, k)
    want2 = brute_binary(vecs - vecs.mean(axis=0, dtype=np.float64
                                          ).astype(np.float32), q, k)
    assert [int(x) for x in i2[0]] == [w[0] for w in want2]


def test_rescore_adapter_recall_on_separable_data():
    """On clustered unit vectors the binary proxy keeps the true
    neighbors inside a 3x oversample — recall@10 must be high (this is
    the operating point the defaults advertise)."""
    from reverso_tpu.engine import _BinaryRescoreAdapter

    rng = np.random.default_rng(6)
    d, k = 1024, 10              # the d >= 512 regime BQ is meant for
    groups, per = 150, 10        # near-duplicate groups: within-group
    centers = rng.normal(size=(groups, d))   # cosine ~0.85, cross ~0.03
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = (np.repeat(centers, per, axis=0)
            + 0.017 * rng.normal(size=(groups * per, d)))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
            ).astype(np.float32)
    ad = _BinaryRescoreAdapter(BinaryIndex(vecs), vecs, oversampling=3.0)
    exact = vecs.astype(np.float64)
    recalls = []
    for g in range(0, 8):
        q = centers[g] + 0.017 * rng.normal(size=d)
        q = (q / np.linalg.norm(q)).astype(np.float32)
        s, i = ad.search(q, k)
        truth = np.argsort(-(exact @ q.astype(np.float64)))[:k]
        recalls.append(len(set(map(int, i[0])) & set(map(int, truth))) / k)
    assert np.mean(recalls) >= 0.95, recalls


def test_binary_index_k_exceeds_n_and_empty():
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(4, 16)).astype(np.float32)
    idx = BinaryIndex(vecs)
    s, i = jax.device_get(idx.search(vecs[0], 10))
    assert (np.asarray(i)[0, 4:] == -1).all()
    empty = BinaryIndex(np.zeros((0, 16), np.float32))
    s, i = jax.device_get(empty.search(vecs[0], 3))
    assert (np.asarray(i) == -1).all()


# ---------------------------------------------------------------------------
# engine + CLI
# ---------------------------------------------------------------------------

def make_engine(tmp_path, *, distance="cosine", n=300, d=64, seed=8,
                oversampling=3.0):
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(10, d))
    vecs = centers[rng.integers(0, 10, n)] + 0.3 * rng.normal(size=(n, d))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
            ).astype(np.float32)
    root = str(tmp_path / "db")
    VectorStore.create(root, "bq", d, distance=distance).close()
    model = dataclasses.replace(MODEL_PRESETS["test-tiny"],
                                dtype="float32")
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=model,
        store=dataclasses.replace(cfg.store, root_dir=root,
                                  dtype="binary"),
        search=dataclasses.replace(cfg.search,
                                   binary_oversampling=oversampling))
    engine = Reverso(cfg)
    engine.load_database("bq")
    msg = engine.upsert_points(
        vecs, [{"region_id": f"r{i}", "cls": "a" if i % 2 else "b"}
               for i in range(n)])
    assert msg.startswith("✅"), msg
    return engine, vecs, rng


def test_engine_binary_end_to_end(tmp_path):
    # oversampling covering the whole store -> exact results, so the
    # engine path is deterministic-testable
    engine, vecs, rng = make_engine(tmp_path, n=60, oversampling=60.0)
    q = vecs[7] + 0.01 * rng.normal(size=vecs.shape[1])
    q = (q / np.linalg.norm(q)).astype(np.float32)
    hits = engine.query(q.tolist(), k=5)
    exact = vecs.astype(np.float64) @ q.astype(np.float64)
    want = np.lexsort((np.arange(len(vecs)), -exact))[:5]
    assert [h["id"] for h in hits] == [int(w) for w in want]
    np.testing.assert_allclose([h["score"] for h in hits], exact[want],
                               atol=1e-5)
    # filtered search restricts the candidate scan exactly
    hits = engine.query(q.tolist(), k=5, filter="cls=a")
    keep = np.arange(len(vecs)) % 2 == 1
    idx = np.arange(len(vecs))[keep]
    want = idx[np.lexsort((idx, -exact[idx]))][:5]
    assert [h["id"] for h in hits] == [int(w) for w in want]
    # recommend average works (plain search through the adapter);
    # best_score needs the exact index and errors cleanly
    text, items = engine.recommend(positive=[1], strategy="average")
    assert text.startswith("🔍") or items, (text, items)
    text, items = engine.recommend(positive=[1], strategy="best_score")
    assert text.startswith("❌")


def test_engine_binary_empty_store_and_multivec_coexistence(tmp_path):
    """--index-dtype binary must not break the non-dense-index paths:
    an EMPTY store returns a clean empty page (the rescore gather used
    to index a [0, d] array), and a multivector space coerces its
    MaxSim matrix to bf16 instead of crashing on jnp.dtype('binary')."""
    import dataclasses as _dc

    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso

    rng = np.random.default_rng(12)
    d = 16
    root = str(tmp_path / "db")
    VectorStore.create(root, "bqm", d, multi={"tok": 8}).close()
    cfg = default_config()
    cfg = _dc.replace(
        cfg, model=_dc.replace(MODEL_PRESETS["test-tiny"],
                               dtype="float32"),
        store=_dc.replace(cfg.store, root_dir=root, dtype="binary"))
    engine = Reverso(cfg)
    engine.load_database("bqm")
    q = rng.normal(size=d).astype(np.float32)
    assert engine.query(q.tolist(), k=3) == []          # empty store
    mv = [(rng.normal(size=(2, 8))).astype(np.float32) for _ in range(6)]
    mv = [m / np.linalg.norm(m, axis=1, keepdims=True) for m in mv]
    dense = rng.normal(size=(6, d)).astype(np.float32)
    dense /= np.linalg.norm(dense, axis=1, keepdims=True)
    msg = engine.upsert_points(
        {"": dense, "tok": mv},
        [{"region_id": f"r{i}"} for i in range(6)])
    assert msg.startswith("✅"), msg
    hits = engine.query(mv[2].tolist(), k=2, using="tok")
    assert hits and hits[0]["id"] == 2


def test_engine_binary_rejects_distance_stores(tmp_path):
    engine, vecs, rng = make_engine(tmp_path, distance="euclid", n=20)
    q = vecs[0]
    with pytest.raises(StoreError, match="binary quantization"):
        engine.query(q.tolist(), k=3)


def test_cli_binary_index(tmp_path, capsys):
    from reverso_tpu.cli import main

    rng = np.random.default_rng(9)
    vecs = rng.normal(size=(40, 32)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    npz = str(tmp_path / "pts.npz")
    np.savez(npz, vectors=vecs, payloads=np.asarray(
        [json.dumps({"region_id": f"r{i}"}) for i in range(40)]))
    root = str(tmp_path / "db")
    rc = main(["--db-root", root, "--model", "test-tiny",
               "upsert", "clibq", npz])
    out = capsys.readouterr()
    assert rc == 0, out.err
    q = vecs[3]
    rc = main(["--db-root", root, "--model", "test-tiny",
               "--index-dtype", "binary", "--binary-oversampling", "40",
               "query", "clibq", "--target", json.dumps(q.tolist()),
               "--top-k", "3", "--json"])
    out = capsys.readouterr()
    assert rc == 0, out.err
    hits = json.loads(out.out)["hits"]
    exact = vecs.astype(np.float64) @ q.astype(np.float64)
    want = np.lexsort((np.arange(40), -exact))[:3]
    assert [h["id"] for h in hits] == [int(w) for w in want]


def test_from_chunks_matches_host_build():
    """Device-side chunked build == the host constructor: bitwise
    packed matrix at a shared center, matching padding, same search
    results; the auto-computed chunked center tracks the host f64
    mean."""
    import jax.numpy as jnp

    from reverso_tpu.store.index import BinaryIndex

    rng = np.random.default_rng(7)
    n, d = 5000, 256
    v = rng.standard_normal((n, d)).astype(np.float32) + 0.05
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    host = BinaryIndex(v)

    def chunk_fn(lo, rows):
        return jnp.asarray(v[lo:lo + rows])

    dev = BinaryIndex.from_chunks(chunk_fn, n, d, chunk=1024,
                                  center=host.center)
    assert dev.matrix.shape == host.matrix.shape
    np.testing.assert_array_equal(np.asarray(dev.matrix),
                                  np.asarray(host.matrix))
    auto = BinaryIndex.from_chunks(chunk_fn, n, d, chunk=1024)
    np.testing.assert_allclose(auto.center, host.center, atol=1e-5)
    q = v[:8]
    s1, i1 = map(np.asarray, host.search(q, 10))
    s2, i2 = map(np.asarray, dev.search(q, 10))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(s1, s2)
