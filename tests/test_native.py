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


@pytest.mark.slow
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


def test_cpu_topk_row_split_matches_numpy():
    """Single-query scans row-split across threads: the merged result
    must be bit-identical to the one-thread scan and match numpy's
    (-score, idx) order (q=1 is the primary host-search shape and used
    to run on one thread)."""
    rng = np.random.default_rng(5)
    db = rng.standard_normal((200_000, 32)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = db[123:124]
    s1, i1 = cpu_topk(db, q, 10, n_threads=1)
    s8, i8 = cpu_topk(db, q, 10, n_threads=8)
    np.testing.assert_array_equal(i1, i8)
    np.testing.assert_array_equal(s1, s8)
    assert i1[0, 0] == 123
    # vs fp64 numpy reference (tie-tolerant score comparison)
    scores = (q.astype(np.float64) @ db.astype(np.float64).T)[0]
    ref = np.lexsort((np.arange(len(db)), -scores))[:10]
    np.testing.assert_allclose(s8[0], scores[ref], atol=1e-4)


def test_mapped_vectors_empty_file(tmp_path):
    """A freshly created store has a zero-byte vectors.bin; both the
    native mmap and the numpy fallback must return a (0, d) view
    instead of raising NULL-pointer/zero-length errors."""
    p = str(tmp_path / "vectors.bin")
    open(p, "wb").close()
    from reverso_tpu.native import MappedVectors
    with MappedVectors(p, 16) as mv:
        assert mv.array.shape == (0, 16)


def test_host_index_engine_path(tmp_path):
    """SearchConfig.index='host' routes searches through the native C++
    scan (numpy fallback) with the same result contract as the device
    path — the no-accelerator deployment story."""
    import dataclasses
    import sys
    sys.path.insert(0, "tests")
    from test_pipeline import make_corpus
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso
    from reverso_tpu.models.pe import PerceptionEncoder
    from reverso_tpu.store import HostIndex

    model = dataclasses.replace(MODEL_PRESETS["test-tiny"],
                                dtype="float32")
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=model,
        store=dataclasses.replace(cfg.store, root_dir=str(tmp_path / "db")),
        search=dataclasses.replace(cfg.search, index="host"))
    eng = Reverso(cfg, encoder=PerceptionEncoder(model))
    make_corpus(tmp_path / "imgs", n=8)
    eng.create_database(str(tmp_path / "imgs"), "hostdb",
                        use_direct_pe=True)
    assert isinstance(eng._get_index(), HostIndex)
    eng.process_image_direct_pe(
        str(tmp_path / "imgs" / "img_003.jpg"))
    text, items = eng.search_similar(similarity_threshold=-1.0,
                                     max_results=3)
    assert "Found" in text and len(items) == 3
    assert items[0]["filename"] == "img_003.jpg"
    # exact agreement with the device (XLA) scan
    cfg2 = dataclasses.replace(
        cfg, search=dataclasses.replace(cfg.search, index="exact"))
    eng2 = Reverso(cfg2, encoder=eng.encoder)
    eng2.load_database("hostdb")
    eng2.process_image_direct_pe(
        str(tmp_path / "imgs" / "img_003.jpg"))
    _, items2 = eng2.search_similar(similarity_threshold=-1.0,
                                    max_results=3)
    assert [it["filename"] for it in items] == \
        [it["filename"] for it in items2]
