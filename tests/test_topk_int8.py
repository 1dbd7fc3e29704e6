"""int8 two-stage search: recall vs exact, score exactness after rescore."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reverso_tpu.ops.topk_int8 import quantize_rows, cosine_topk_int8
from test_topk import numpy_topk64, random_unit


def test_quantize_roundtrip(rng):
    v = random_unit(rng, 100, 64)
    q, s = quantize_rows(v)
    back = q.astype(np.float32) * s[:, None]
    err = np.abs(back - v).max()
    assert err < 1.0 / 127  # within one quantization step


@pytest.mark.parametrize("n,d,q,k", [(3000, 128, 16, 10), (999, 64, 5, 8)])
def test_int8_topk_recall_and_exact_scores(rng, n, d, q, k):
    db = random_unit(rng, n, d)
    qs = db[rng.choice(n, q, replace=False)] + 0.01 * random_unit(rng, q, d)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    true_s, true_i = numpy_topk64(db, qs, k)

    db_i8, scales = quantize_rows(db)
    s, i = jax.device_get(cosine_topk_int8(
        jnp.asarray(db_i8), jnp.asarray(scales), jnp.asarray(db),
        jnp.asarray(qs), k, db_tile=256))
    # recall@k of the two-stage search
    rec = np.mean([len(set(i[r]) & set(true_i[r])) / k for r in range(q)])
    assert rec >= 0.95, rec
    # returned scores are EXACT fp32 scores of the returned ids
    scores64 = qs.astype(np.float64) @ db.astype(np.float64).T
    got = np.take_along_axis(scores64, np.clip(i, 0, n - 1), axis=1)
    np.testing.assert_allclose(s, got, atol=1e-5)
    # self-neighbors always found (large margins survive quantization)
    assert (i[:, 0] == true_i[:, 0]).all()


def test_int8_k_greater_than_n(rng):
    db = random_unit(rng, 12, 32)
    db_i8, scales = quantize_rows(db)
    s, i = jax.device_get(cosine_topk_int8(
        jnp.asarray(db_i8), jnp.asarray(scales), jnp.asarray(db),
        jnp.asarray(db[:2]), 20, db_tile=128))
    assert i.shape == (2, 20)
    assert (i[:, 12:] == -1).all()


# ---------------------------------------------------------------------------
# Exact int8-stored path (ops.topk.cosine_topk_int8_exact): single-stage
# streaming kernel, deterministic order vs an integer-exact reference.
# ---------------------------------------------------------------------------

def _int8_reference(v8, scale, qs, k):
    """Replicates the kernel's arithmetic with exact int64 dots + the
    same f32 combine, ordered by (-score, idx). Digit scales are
    PER-QUERY (a query's results must not depend on batch co-travellers);
    ranking happens on unscaled dots, true scores restored per row."""
    c1 = np.maximum(np.abs(qs).max(axis=1, keepdims=True), 1e-30) / 127.0
    c2 = (c1 / 254.0).astype(np.float32)
    q_hi = np.clip(np.round(qs / c1), -127, 127).astype(np.int8)
    resid = qs - q_hi.astype(np.float32) * c1.astype(np.float32)
    q_lo = np.clip(np.round(resid / c2), -127, 127).astype(np.int8)
    s_hi = q_hi.astype(np.int64) @ v8.astype(np.int64).T
    s_lo = q_lo.astype(np.int64) @ v8.astype(np.int64).T
    S = (s_hi.astype(np.float32) * np.float32(254.0)
         + s_lo.astype(np.float32))
    n = v8.shape[0]
    cols = np.broadcast_to(np.arange(n), S.shape)
    order = np.lexsort((cols, -S), axis=1)[:, :k]
    return (np.take_along_axis(S, order, axis=1)
            * (c2 * np.float32(scale)), order)


def test_int8_exact_matches_integer_reference():
    from reverso_tpu.ops.topk import cosine_topk_int8_exact, quantize_db_int8
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    n, d, q, k = 4096, 384, 48, 10
    db = rng.standard_normal((n, d)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    qs = db[:q] + 0.05 * rng.standard_normal((q, d)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    v8, scale = map(np.asarray, quantize_db_int8(jnp.asarray(db)))
    s, i = map(np.asarray, cosine_topk_int8_exact(
        jnp.asarray(v8), scale, jnp.asarray(qs), k, interpret=True))
    rs, ri = _int8_reference(v8, float(scale), qs, k)
    np.testing.assert_array_equal(i, ri)
    np.testing.assert_allclose(s, rs, atol=1e-6)
    assert (i[:, 0] == np.arange(q)).all()


def test_int8_exact_query_precision_beats_bf16():
    """The two-digit int8 query decomposition must reconstruct queries
    more accurately than bf16 rounding (the bf16 path's query error)."""
    rng = np.random.default_rng(5)
    qs = rng.standard_normal((32, 512)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    c1 = np.abs(qs).max() / 127.0
    c2 = c1 / 254.0
    q_hi = np.clip(np.round(qs / c1), -127, 127)
    q_lo = np.clip(np.round((qs - q_hi * c1) / c2), -127, 127)
    q_hat = (q_hi * c1 + q_lo * c2).astype(np.float32)
    import jax.numpy as jnp
    q_bf16 = np.asarray(jnp.asarray(qs, jnp.bfloat16).astype(jnp.float32))
    err_int8 = np.abs(q_hat - qs).max()
    err_bf16 = np.abs(q_bf16 - qs).max()
    assert err_int8 < err_bf16 / 4, (err_int8, err_bf16)


def test_int8_exact_nvalid_and_small_n():
    from reverso_tpu.ops.topk import cosine_topk_int8_exact, quantize_db_int8
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    db = rng.standard_normal((300, 128)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    v8, scale = map(np.asarray, quantize_db_int8(jnp.asarray(db)))
    qs = db[:5]
    # n_valid masks the tail: hits beyond 200 must never appear
    s, i = map(np.asarray, cosine_topk_int8_exact(
        jnp.asarray(v8), scale, jnp.asarray(qs), 8, n_valid=200,
        interpret=True))
    assert (i < 200).all() and (i >= -1).all()
    rs, ri = _int8_reference(v8[:200], float(scale), qs, 8)
    # reference over the first 200 rows only (same query scale: global
    # max|q| is unchanged)
    np.testing.assert_array_equal(i, ri)


@pytest.mark.slow
def test_device_index_int8_single_vs_sharded():
    """StoreConfig.dtype='int8' flows through DeviceIndex: the sharded
    int8 scan must equal the single-device int8 scan exactly, and both
    must rank the self-query first."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from reverso_tpu.store.index import DeviceIndex

    rng = np.random.default_rng(11)
    n, d, k = 3000, 256, 10
    db = rng.standard_normal((n, d)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    qs = db[:24]

    single = DeviceIndex(db, dtype="int8")
    assert single.scale is not None and single.matrix.dtype == jnp.int8
    s1, i1 = map(np.asarray, single.search(qs, k))
    assert (i1[:, 0] == np.arange(24)).all()

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    sharded = DeviceIndex(db, mesh=mesh, dtype="int8")
    s2, i2 = map(np.asarray, sharded.search(qs, k))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-6)

    # k > 128 falls back to the dequantized XLA path and stays ordered
    s3, i3 = map(np.asarray, single.search(qs[:2], 200))
    assert i3.shape == (2, 200) and (i3[:, 0] == np.arange(2)).all()


def test_tree_merge_int8_matches_single():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from reverso_tpu.ops.topk import (cosine_topk_int8_exact,
                                      quantize_db_int8, tree_merge_topk)

    rng = np.random.default_rng(13)
    n, d, q, k = 8 * 512, 128, 16, 10
    db = rng.standard_normal((n, d)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    qs = db[:q]
    v8, scale = map(np.asarray, quantize_db_int8(jnp.asarray(db)))
    ref_s, ref_i = map(np.asarray, cosine_topk_int8_exact(
        jnp.asarray(v8), scale, jnp.asarray(qs), k))
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("host", "chip"))
    db_sh = jax.device_put(jnp.asarray(v8),
                           NamedSharding(mesh, P(("host", "chip"))))
    qs_r = jax.device_put(jnp.asarray(qs), NamedSharding(mesh, P()))
    s, i = map(np.asarray, tree_merge_topk(db_sh, qs_r, k, mesh,
                                           db_scale=float(scale)))
    np.testing.assert_array_equal(i, ref_i)
    np.testing.assert_allclose(s, ref_s, atol=1e-6)


def test_int8_scores_independent_of_batch_cotravellers():
    """A query's scores/ids must be identical whether it is searched
    alone or coalesced with other (wildly scaled) queries — the digit
    scales are per-query."""
    from reverso_tpu.ops.topk import cosine_topk_int8_exact, quantize_db_int8
    import jax.numpy as jnp

    rng = np.random.default_rng(17)
    db = rng.standard_normal((2048, 128)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    v8, scale = map(np.asarray, quantize_db_int8(jnp.asarray(db)))
    q = db[5:6]
    s_alone, i_alone = map(np.asarray, cosine_topk_int8_exact(
        jnp.asarray(v8), scale, jnp.asarray(q), 10, interpret=True))
    big = np.concatenate([q, 50.0 * db[100:101], 1e-3 * db[200:201]])
    s_b, i_b = map(np.asarray, cosine_topk_int8_exact(
        jnp.asarray(v8), scale, jnp.asarray(big), 10, interpret=True))
    np.testing.assert_array_equal(i_alone[0], i_b[0])
    np.testing.assert_allclose(s_alone[0], s_b[0], rtol=0, atol=0)


def test_int8_chunked_xla_matches_dequant():
    """k > 128 path: chunked scan == full dequantized scan, exactly."""
    from reverso_tpu.ops.topk import (cosine_topk_int8_xla,
                                      cosine_topk_xla, quantize_db_int8)
    import jax.numpy as jnp

    rng = np.random.default_rng(19)
    n, d, k = 1000, 96, 200
    db = rng.standard_normal((n, d)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    v8, scale = map(np.asarray, quantize_db_int8(jnp.asarray(db)))
    qs = db[:8]
    s, i = map(np.asarray, cosine_topk_int8_xla(
        jnp.asarray(v8), scale, jnp.asarray(qs), k, n_valid=900,
        chunk=256))
    deq = jnp.asarray(v8, jnp.float32) * scale
    rs, ri = map(np.asarray, cosine_topk_xla(deq, jnp.asarray(qs), k,
                                             n_valid=900))
    np.testing.assert_array_equal(i, ri)
    np.testing.assert_allclose(s, rs, atol=1e-5)


def test_vmem_budget_never_breaks_group_alignment():
    """d=512 with a full 1024-query resident block used to pick
    n_bufs=3 and trip the kernel's n_bufs % group assertion."""
    from reverso_tpu.ops.topk import cosine_topk_pallas, cosine_topk_xla
    import jax.numpy as jnp

    rng = np.random.default_rng(23)
    db = rng.standard_normal((4096, 512)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    qs = np.ascontiguousarray(db[:1024])
    s, i = map(np.asarray, cosine_topk_pallas(
        jnp.asarray(db, jnp.bfloat16), jnp.asarray(qs, jnp.bfloat16),
        10, interpret=True))
    assert (i[:, 0] == np.arange(1024)).all()


def test_int8_quantile_clipping_keeps_exactness():
    """qdrant ScalarQuantization's `quantile`: the clipping bound comes
    from an abs-value quantile, the outlier tail saturates to +-127,
    and the int8-exact contract is untouched — search results equal the
    integer reference over the STORED (clipped) int8 rows."""
    import pytest
    from reverso_tpu.ops.topk import int8_clip_bound
    from reverso_tpu.store import DeviceIndex

    rng = np.random.default_rng(5)
    n, d, k = 400, 64, 10
    db = rng.standard_normal((n, d)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    db[7] *= 50.0                                  # one outlier row
    qs = db[:6] / np.linalg.norm(db[:6], axis=1, keepdims=True)

    bound = int8_clip_bound(db, 0.99)
    assert bound < np.abs(db).max()                # the tail clipped
    assert int8_clip_bound(db, 0.0) == np.float32(np.abs(db).max())
    with pytest.raises(ValueError):
        int8_clip_bound(db, 1.5)

    idx = DeviceIndex(db, dtype="int8", int8_quantile=0.99)
    base = DeviceIndex(db, dtype="int8")
    assert idx.scale < base.scale                  # finer bulk resolution
    v8 = np.asarray(idx.matrix)
    assert np.abs(v8).max() == 127                 # outlier saturated
    s, i = map(np.asarray, idx.search(qs, k))
    rs, ri = _int8_reference(v8[:n], idx.scale, qs, k)
    np.testing.assert_array_equal(i, ri)
    np.testing.assert_allclose(s, rs, atol=1e-6)
