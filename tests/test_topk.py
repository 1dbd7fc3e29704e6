"""Parity tests for the fused cosine top-k search kernels.

Ground truth is an fp64 numpy scan sorted by (-score, index) — the exact
semantics of the reference's brute-force qdrant local-mode scan
(reference core_system.py:659-664). Because fp32 matmul accumulation
order differs between numpy, XLA, and the tiled Pallas kernel, indices
are required to match exactly only where the fp64 score margins are
clear (> tol); scores must always match fp64 truth within tol.
SURVEY.md §4 items 1, 2, 4.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reverso_tpu.ops import (
    cosine_topk,
    cosine_topk_xla,
    cosine_topk_pallas,
    sharded_cosine_topk,
    apply_score_threshold,
    l2_normalize,
)
from reverso_tpu.parallel import make_mesh, shard_rows, replicate

TOL = 1e-4


def numpy_topk64(db, queries, k):
    scores = queries.astype(np.float64) @ db.astype(np.float64).T
    order = np.lexsort(
        (np.broadcast_to(np.arange(db.shape[0]), scores.shape), -scores), axis=1)
    idx = order[:, :k].astype(np.int32)
    return np.take_along_axis(scores, idx, axis=1), idx


def assert_topk_equiv(db, qs, s, i, k, tol=TOL):
    """s,i: [Q,k] results. Checks fp64-truth equivalence with tie tolerance."""
    k_eff = min(k, db.shape[0])
    true_s, true_i = numpy_topk64(db, qs, k_eff)
    s, i = np.asarray(s)[:, :k_eff], np.asarray(i)[:, :k_eff]
    assert (i >= 0).all() and (i < db.shape[0]).all()
    # no duplicate indices per query
    for q in range(i.shape[0]):
        assert len(set(i[q])) == k_eff, f"duplicate idx in query {q}: {i[q]}"
    # returned score must equal the true score of the returned index
    scores64 = qs.astype(np.float64) @ db.astype(np.float64).T
    got_true = np.take_along_axis(scores64, i, axis=1)
    np.testing.assert_allclose(s, got_true, atol=tol)
    # ranked scores must match the true ranked scores
    np.testing.assert_allclose(got_true, true_s, atol=tol)
    # indices must match exactly where margins are clear on both sides
    pad = np.full((true_s.shape[0], 1), np.inf)
    gap_up = np.concatenate([pad, -np.diff(true_s, axis=1)], axis=1)
    gap_dn = np.concatenate([-np.diff(true_s, axis=1), pad], axis=1)
    clear = (gap_up > tol) & (gap_dn > tol)
    np.testing.assert_array_equal(np.where(clear, i, -1), np.where(clear, true_i, -1))


def random_unit(rng, n, d, dtype=np.float32):
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(dtype)


@pytest.mark.parametrize("n,d,q,k", [
    (1000, 64, 7, 10),
    (2048, 128, 32, 5),
    (3000, 96, 16, 50),   # non-divisible n, d not multiple of 128
    (17, 32, 3, 20),      # k > n
])
def test_xla_matches_numpy(rng, n, d, q, k):
    db = random_unit(rng, n, d)
    qs = random_unit(rng, q, d)
    s, i = jax.device_get(cosine_topk_xla(jnp.asarray(db), jnp.asarray(qs), k))
    assert_topk_equiv(db, qs, s, i, k)
    if k > n:
        assert (i[:, n:] == -1).all()


@pytest.mark.parametrize("n,d,q,k,q_tile,db_tile", [
    (1000, 64, 7, 10, 8, 256),
    (2048, 128, 300, 5, 128, 512),
    (999, 100, 13, 16, 8, 128),
    (4096, 256, 64, 128, 64, 1024),
])
def test_pallas_matches_numpy(rng, n, d, q, k, q_tile, db_tile):
    db = random_unit(rng, n, d)
    qs = random_unit(rng, q, d)
    s, i = jax.device_get(cosine_topk_pallas(
        jnp.asarray(db), jnp.asarray(qs), k, q_tile=q_tile, db_tile=db_tile))
    assert_topk_equiv(db, qs, s, i, k)


def test_pallas_tie_breaking():
    # duplicate rows -> bit-identical scores; lower index must win.
    d = 16
    row = np.ones((1, d), np.float32) / np.sqrt(d)
    db = np.concatenate([np.tile(row, (3, 1)),
                         -np.tile(row, (5, 1))]).astype(np.float32)
    qs = row.copy()
    s, i = jax.device_get(cosine_topk_pallas(jnp.asarray(db), jnp.asarray(qs), 4,
                                             q_tile=8, db_tile=8))
    np.testing.assert_array_equal(i[0, :3], [0, 1, 2])
    np.testing.assert_allclose(s[0, :3], 1.0, atol=1e-6)
    assert i[0, 3] == 3  # ties among the negatives also break low


def test_sharded_matches_single_device(rng):
    mesh = make_mesh()
    assert mesh.devices.size == 8, "tests must run on the 8-device virtual CPU mesh"
    n, d, q, k = 8 * 300, 64, 24, 10
    db = random_unit(rng, n, d)
    qs = random_unit(rng, q, d)
    db_sh = shard_rows(jnp.asarray(db), mesh)
    qs_r = replicate(jnp.asarray(qs), mesh)
    s, i = jax.device_get(sharded_cosine_topk(db_sh, qs_r, k, mesh))
    assert_topk_equiv(db, qs, s, i, k)


def test_sharded_xla_impl(rng):
    mesh = make_mesh()
    n, d, q, k = 8 * 64, 32, 4, 200   # k > 128 path
    db = random_unit(rng, n, d)
    qs = random_unit(rng, q, d)
    s, i = jax.device_get(sharded_cosine_topk(
        shard_rows(jnp.asarray(db), mesh), jnp.asarray(qs), k, mesh, impl="xla"))
    assert_topk_equiv(db, qs, s, i, k)


def test_threshold():
    scores = jnp.asarray([[0.9, 0.71, 0.7, 0.69]])
    idx = jnp.asarray([[4, 2, 7, 1]], dtype=jnp.int32)
    s, i, m = apply_score_threshold(scores, idx, 0.7)
    np.testing.assert_array_equal(np.asarray(i), [[4, 2, 7, -1]])
    np.testing.assert_array_equal(np.asarray(m), [[True, True, True, False]])


def test_l2_normalize(rng):
    x = jnp.asarray(rng.standard_normal((5, 33)).astype(np.float32))
    y = np.asarray(l2_normalize(x))
    np.testing.assert_allclose(np.linalg.norm(y, axis=1), 1.0, atol=1e-5)


def test_tree_merge_matches_single_device(rng):
    """2-host x 4-chip virtual mesh: two-level (ICI then DCN) merge must
    reproduce the single-device scan exactly."""
    from jax.sharding import Mesh
    from reverso_tpu.ops.topk import tree_merge_topk
    import jax as _jax

    devs = np.array(_jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("host", "chip"))
    n, d, q, k = 8 * 200, 64, 16, 10
    db = random_unit(rng, n, d)
    qs = random_unit(rng, q, d)
    db_sh = jax.device_put(
        jnp.asarray(db),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(("host", "chip"))))
    s, i = jax.device_get(tree_merge_topk(db_sh, jnp.asarray(qs), k, mesh))
    assert_topk_equiv(db, qs, s, i, k)


def test_replace_min_state_bitwise_matches_sorted_state(rng):
    """The replace-min top-k state (round 3: ~6 small ops/insert vs 11)
    must return BIT-IDENTICAL (score, idx) results to the sorted-insert
    state, including exact-tie cases (duplicate db rows)."""
    from reverso_tpu.ops.topk import _topk_pallas_jit

    db = random_unit(rng, 3072, 64)
    db[100] = db[7]          # exact duplicates -> exact score ties
    db[2500] = db[7]
    db[1024] = db[1023]
    qs = np.concatenate([random_unit(rng, 13, 64), db[7:8], db[1023:1024]])
    for k in (1, 5, 10):
        kpad = ((max(k, 8) + 7) // 8) * 8
        outs = {}
        for mode in ("sorted", "replace_min"):
            outs[mode] = [np.asarray(x) for x in _topk_pallas_jit(
                jnp.asarray(db), jnp.asarray(qs), 3072, k=k, kpad=kpad,
                q_tile=16, db_tile=256, interpret=True, q_out=len(qs),
                n_bufs=4, group=2, state_mode=mode)]
        np.testing.assert_array_equal(outs["sorted"][1], outs["replace_min"][1])
        np.testing.assert_array_equal(outs["sorted"][0], outs["replace_min"][0])
        assert_topk_equiv(db, qs, *outs["replace_min"], k)


def test_cosine_topk_k_over_128_keeps_n_valid(rng):
    """The k>128 XLA fallback must keep honoring n_valid: dropping it
    scored tile-padding rows at 0.0 and surfaced their indices."""
    from reverso_tpu.ops.topk import cosine_topk
    db = random_unit(rng, 512, 16)
    s, i = jax.device_get(cosine_topk(db, db[:2], 200, n_valid=100))
    assert (i[i >= 0] < 100).all(), i
    assert (i[:, 100:] == -1).all()
    assert np.isneginf(s[:, 100:]).all()


def test_pallas_query_chunking_matches_xla(rng, monkeypatch):
    """Query batches beyond the resident chunk split into multiple
    launches; the concatenated result must equal the one-shot scan
    (exercises the VMEM-clamped chunk loop with a tiny chunk)."""
    import reverso_tpu.ops.topk as topk_mod
    db = random_unit(rng, 256, 32)
    q = random_unit(rng, 96, 32)
    want_s, want_i = jax.device_get(
        topk_mod.cosine_topk_xla(db, q, 7, n_valid=200))
    monkeypatch.setattr(topk_mod, "_Q_RESIDENT", 32)
    got_s, got_i = jax.device_get(
        topk_mod.cosine_topk_pallas(db, q, 7, q_tile=8, db_tile=64,
                                    n_valid=200))
    assert_topk_equiv(db[:200].astype(np.float64),
                      q.astype(np.float64), got_s, got_i, 7)
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_allclose(got_s, want_s, atol=1e-5)


@pytest.mark.slow
def test_randomized_shape_sweep_all_impls():
    """Seeded sweep over awkward shapes (d not a lane multiple, k at or
    past n_valid, tiny/odd q) — every implementation must satisfy the
    fp64-truth contract and agree with the XLA reference."""
    from reverso_tpu.ops.topk import (cosine_topk_int8_exact,
                                      cosine_topk_int8_xla,
                                      cosine_topk_pallas, cosine_topk_xla,
                                      quantize_db_int8)
    rng = np.random.default_rng(99)
    for trial in range(10):
        n = int(rng.integers(5, 400))
        d = int(rng.choice([8, 24, 96, 130, 200]))
        qn = int(rng.integers(1, 9))
        k = int(rng.choice([1, 3, 8, 17]))
        n_valid = int(rng.integers(1, n + 1))
        db = random_unit(rng, n, d)
        q = random_unit(rng, qn, d)
        ref_s, ref_i = jax.device_get(
            cosine_topk_xla(db, q, k, n_valid=n_valid))
        got_s, got_i = jax.device_get(
            cosine_topk_pallas(db, q, k, q_tile=8, db_tile=64,
                               n_valid=n_valid))
        np.testing.assert_array_equal(got_i, ref_i,
                                      err_msg=f"trial {trial}")
        np.testing.assert_allclose(got_s, ref_s, atol=2e-5)
        k_eff = min(k, n_valid)
        assert (ref_i[:, k_eff:] == -1).all()
        # int8 paths: each must satisfy the contract against the
        # DEQUANTIZED rows (the exact path quantizes the QUERY to
        # ~15 bits, the XLA path uses the raw f32 query — scores agree
        # only to the query-quantization error, not bitwise)
        db8, scale = quantize_db_int8(db)
        deq = np.asarray(db8, np.float64) * float(scale)
        s1, i1 = jax.device_get(cosine_topk_int8_exact(
            db8, scale, q, k, q_tile=8, db_tile=64, n_valid=n_valid))
        s2, i2 = jax.device_get(cosine_topk_int8_xla(
            db8, scale, q, k, n_valid=n_valid))
        k_eff8 = min(k, n_valid)
        for s8, i8 in ((s1, i1), (s2, i2)):
            assert (i8[:, k_eff8:] == -1).all()
            assert_topk_equiv(deq[:n_valid], q.astype(np.float64),
                              s8[:, :k_eff8], i8[:, :k_eff8], k_eff8,
                              tol=1e-4)
