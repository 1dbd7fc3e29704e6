"""Native C++ runtime tests: builds the library and checks exact parity
with the numpy semantics used across the framework."""
import time

import numpy as np
import pytest

from reverso_tpu.native import (
    cpu_topk, native_available, MappedVectors, f32_to_bf16_bits,
)
from test_topk import numpy_topk64, random_unit


def test_native_builds():
    assert native_available(), "g++ build of native/reverso_native.cpp failed"


def test_cpu_topk_parity(rng):
    db = random_unit(rng, 5000, 96)
    qs = random_unit(rng, 17, 96)
    s, i = cpu_topk(db, qs, 10, n_threads=4)
    true_s, true_i = numpy_topk64(db, qs, 10)
    np.testing.assert_array_equal(i, true_i)
    np.testing.assert_allclose(s, true_s, atol=2e-5)


def test_cpu_topk_ties_and_padding():
    row = np.ones((1, 8), np.float32) / np.sqrt(8)
    db = np.concatenate([np.tile(row, (3, 1)), -np.tile(row, (2, 1))])
    s, i = cpu_topk(db, row, 8)
    np.testing.assert_array_equal(i[0, :3], [0, 1, 2])   # ties -> lower idx
    np.testing.assert_array_equal(i[0, 5:], [-1, -1, -1])  # k > n padding
    assert np.isneginf(s[0, 5:]).all()


def test_mmap_roundtrip(tmp_path, rng):
    data = rng.standard_normal((100, 16)).astype(np.float32)
    path = tmp_path / "vectors.bin"
    data.tofile(path)
    with MappedVectors(str(path), 16) as mv:
        assert mv.array.shape == (100, 16)
        np.testing.assert_array_equal(mv.array, data)


def test_bf16_conversion(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    bits = f32_to_bf16_bits(x)
    import jax.numpy as jnp
    ref = np.asarray(jnp.asarray(x, jnp.bfloat16)).view(np.uint16)
    np.testing.assert_array_equal(bits, ref)


def test_bf16_nan_stays_nan():
    """NaNs with small mantissa payloads must not round into +/-Inf
    (round-1 advisor: the rounding carry overflowed the mantissa)."""
    special = np.array([0x7F800001, 0xFF800001,   # smallest-payload NaNs
                        0x7FC00000, 0xFFC00000,   # canonical quiet NaNs
                        0x7F800000, 0xFF800000],  # true infinities
                       dtype=np.uint32).view(np.float32)
    for convert in (f32_to_bf16_bits,
                    lambda a: __import__(
                        "reverso_tpu.native", fromlist=["f32_to_bf16_bits"]
                    ).f32_to_bf16_bits(a)):
        bits = convert(special).astype(np.uint16)
        exp = (bits >> 7) & 0xFF
        mant = bits & 0x7F
        assert np.all(exp == 0xFF)
        np.testing.assert_array_equal(mant != 0,
                                      [True, True, True, True, False, False])


def test_bf16_nan_numpy_fallback(monkeypatch):
    """Same NaN rule for the pure-numpy path used when the C++ lib is
    absent."""
    import reverso_tpu.native as rn
    monkeypatch.setattr(rn, "_load", lambda: None)
    special = np.array([0x7F800001, 0x7F800000, 0x3F800000],
                       dtype=np.uint32).view(np.float32)
    bits = rn.f32_to_bf16_bits(special)
    assert (bits[0] >> 7) & 0xFF == 0xFF and bits[0] & 0x7F != 0  # NaN
    assert bits[1] == 0x7F80                                      # +Inf
    assert bits[2] == 0x3F80                                      # 1.0


def test_cpu_topk_throughput(rng):
    """The C++ scan replaces the reference's numpy-per-query loop; assert
    it is at least as fast as a single-threaded numpy full scan."""
    db = random_unit(rng, 60_000, 256)
    qs = random_unit(rng, 16, 256)
    cpu_topk(db, qs, 10)  # warm (build)
    t0 = time.perf_counter()
    cpu_topk(db, qs, 10)
    native_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = numpy_topk64(db, qs, 10)
    numpy_t = time.perf_counter() - t0
    assert native_t < numpy_t * 1.5, (native_t, numpy_t)
