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
