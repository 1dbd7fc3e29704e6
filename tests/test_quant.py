"""ops.quant: dynamic int8 linear building block."""
import numpy as np
import pytest

import jax.numpy as jnp

from reverso_tpu.ops.quant import (int8_linear, quantize_rows_int8,
                                   quantize_weight_int8)


def test_weight_quant_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 48)).astype(np.float32)
    w8, ws = map(np.asarray, quantize_weight_int8(w))
    assert w8.dtype == np.int8 and ws.shape == (1, 48)
    # per-column max hits 127 exactly; reconstruction within half a step
    assert (np.abs(w8).max(axis=0) == 127).all()
    np.testing.assert_allclose(w8 * ws, w, atol=float(ws.max()) / 2 + 1e-7)


def test_row_quant_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((32, 80)).astype(np.float32)
    x8, xs = map(np.asarray, quantize_rows_int8(x))
    assert x8.dtype == np.int8 and xs.shape == (32, 1)
    assert (np.abs(x8).max(axis=1) == 127).all()
    np.testing.assert_allclose(x8 * xs, x, atol=float(xs.max()) / 2 + 1e-7)


def test_int8_linear_matches_dequant_math_exactly():
    """The op IS its quantized math: s32 dot + f32 scale combine must
    equal the same math done by hand — no hidden rounding."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((16, 96)).astype(np.float32)
    w = rng.standard_normal((96, 24)).astype(np.float32)
    b = rng.standard_normal(24).astype(np.float32)
    w8, ws = quantize_weight_int8(w)
    x8, xs = quantize_rows_int8(x)
    expect = (np.asarray(x8, np.int64) @ np.asarray(w8, np.int64)
              ).astype(np.float32) * (np.asarray(xs) * np.asarray(ws))
    expect = expect + b
    got = np.asarray(int8_linear(jnp.asarray(x), w8, ws,
                                 b=jnp.asarray(b), out_dtype=jnp.float32))
    np.testing.assert_array_equal(got, expect.astype(np.float32))


def test_int8_linear_accuracy_at_vit_shape():
    """Relative error at d=1024 stays in the documented ~1% band
    (quantization noise from BOTH operands: sqrt(d) * amax/(127*sqrt12)
    each, ~0.75% per side for Gaussian data — measured 1.1%)."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((128, 1024)).astype(np.float32)
    w = (rng.standard_normal((1024, 256)) / 32.0).astype(np.float32)
    w8, ws = quantize_weight_int8(w)
    got = np.asarray(int8_linear(jnp.asarray(x), w8, ws,
                                 out_dtype=jnp.float32))
    ref = x @ w
    rel = np.abs(got - ref).mean() / np.abs(ref).mean()
    assert rel < 2e-2, rel


def test_int8_linear_bf16_in_out():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((8, 64)), jnp.bfloat16)
    w8, ws = quantize_weight_int8(rng.standard_normal((64, 32)))
    y = int8_linear(x, w8, ws)
    assert y.dtype == jnp.bfloat16 and y.shape == (8, 32)
    assert np.isfinite(np.asarray(y, np.float32)).all()
