"""Masked-ROI region embedding tests (the north-star improvement)."""
import dataclasses

import numpy as np
import pytest

from reverso_tpu.config import MODEL_PRESETS, default_config
from reverso_tpu.detect import StubDetector
from reverso_tpu.engine import Reverso
from reverso_tpu.models.pe import PerceptionEncoder

TINY = dataclasses.replace(MODEL_PRESETS["test-tiny"], dtype="float32")


@pytest.fixture(scope="module")
def encoder():
    return PerceptionEncoder(TINY)


def test_encode_regions_shapes(encoder, rng):
    b, r, s = 2, 3, TINY.image_size
    imgs = rng.standard_normal((b, s, s, 3)).astype(np.float32)
    masks = np.zeros((b, r, s, s), np.float32)
    masks[:, 0, :16, :16] = 1
    masks[:, 1, 16:, 16:] = 1
    masks[:, 2, 8:24, 8:24] = 1
    g, regions = encoder.encode_regions(imgs, masks)
    assert np.asarray(g).shape == (b, TINY.embed_dim)
    assert np.asarray(regions).shape == (b, r, TINY.embed_dim)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(regions), axis=-1), 1.0, atol=1e-5)


def test_regions_differ_from_global_and_each_other(encoder, rng):
    s = TINY.image_size
    imgs = rng.standard_normal((1, s, s, 3)).astype(np.float32)
    masks = np.zeros((1, 2, s, s), np.float32)
    masks[0, 0, :12, :12] = 1       # top-left corner
    masks[0, 1, 20:, 20:] = 1       # bottom-right corner
    g, regions = encoder.encode_regions(imgs, masks)
    g, regions = np.asarray(g), np.asarray(regions)[0]
    assert abs(float(regions[0] @ regions[1])) < 0.999
    assert abs(float(regions[0] @ g[0])) < 0.999
    # a full-image mask should be closer to... itself deterministic:
    full = np.ones((1, 1, s, s), np.float32)
    _, r_full = encoder.encode_regions(imgs, full)
    r_full2 = np.asarray(r_full)[0, 0]
    _, r_full_again = encoder.encode_regions(imgs, full)
    np.testing.assert_allclose(np.asarray(r_full_again)[0, 0], r_full2,
                               atol=1e-6)


def test_empty_mask_is_finite(encoder, rng):
    s = TINY.image_size
    imgs = rng.standard_normal((1, s, s, 3)).astype(np.float32)
    masks = np.zeros((1, 1, s, s), np.float32)   # empty
    _, regions = encoder.encode_regions(imgs, masks)
    assert np.isfinite(np.asarray(regions)).all()


def test_engine_region_mode(tmp_path, encoder, rng):
    from test_pipeline import make_corpus
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=TINY,
        store=dataclasses.replace(cfg.store, root_dir=str(tmp_path / "db")),
        ingest=dataclasses.replace(cfg.ingest, region_embed_mode="region"))
    engine = Reverso(cfg, encoder=encoder, detector=StubDetector())
    files = make_corpus(tmp_path / "imgs", n=4)
    transcript = engine.create_database(str(tmp_path / "imgs"), "roi",
                                        text_prompt="person . car")
    assert "ready for searching" in transcript
    engine.detect_regions(files[0], "person . car")
    embs, metas = engine.extract_embeddings(files[0])
    assert len(embs) == 4
    # distinct regions must now have distinct embeddings (compat mode
    # would make them identical)
    assert not np.allclose(embs[0], embs[1])
    text, items = engine.search_similar(similarity_threshold=0.3)
    assert items


def test_roi_beats_compat_region_recall():
    """The north-star claim, pinned with retrieval evidence: on a
    corpus where region-level retrieval is decidable at deterministic
    init (2x2 grids of distinct noise textures; queries = perturbed
    full-image copies of single patterns, embedded globally — the
    deployed query path), masked-ROI embeddings retrieve the correct
    REGION far better than the reference's global-per-region scheme
    (core_system.py:406). Full methodology + bigger-run numbers:
    scripts/eval_roi_quality.py and EVAL.md."""
    import sys as _sys
    _sys.path.insert(0, "scripts")
    from eval_roi_quality import run_eval

    res = run_eval(P=16, N=32, jitters=2, seed=0)
    c, r = res["compat"], res["roi"]
    assert r["recall@1"] >= c["recall@1"] + 0.2, res
    assert r["mrr"] >= c["mrr"] + 0.2, res
    assert r["recall@10"] >= c["recall@10"], res


def test_encode_regions_pooled_masks_match_pixel_masks(encoder, rng):
    """[B, R, g*g] host-pooled masks == [B, R, H, W] pixel masks
    through encode_regions (the pooled form is the ingest hot path:
    ~18 KB/img up the tunnel instead of ~3.6 MB — round 5)."""
    s = TINY.image_size
    g = TINY.image_size // TINY.patch_size
    p = TINY.patch_size
    b, r = 2, 3
    imgs = rng.standard_normal((b, s, s, 3)).astype(np.float32)
    masks = (rng.random((b, r, s, s)) < 0.4)
    ge1, re1 = encoder.encode_regions(imgs, masks)
    # exact block mean on host == the in-jit pixel pooling
    pooled = (masks.astype(np.float32)
              .reshape(b, r, g, p, g, p).mean(axis=(3, 5))
              .reshape(b, r, g * g))
    ge2, re2 = encoder.encode_regions(imgs, pooled)
    np.testing.assert_allclose(np.asarray(ge1), np.asarray(ge2),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(re1), np.asarray(re2),
                               atol=1e-6)


def test_pool_masks_area_average(encoder):
    """pool_masks pools masks at ANY source resolution: a full mask
    pools to all-ones, an empty one to zeros, a half-covering one to
    ~0.5 mean coverage; pad rows stay zero."""
    g = TINY.image_size // TINY.patch_size
    h, w = 97, 133          # deliberately not divisible by the grid
    full = np.ones((h, w), bool)
    empty = np.zeros((h, w), bool)
    half = np.zeros((h, w), bool)
    half[:, :w // 2] = True
    out = encoder.pool_masks([[full, empty, half]], 4)
    assert out.shape == (1, 4, g * g)
    np.testing.assert_allclose(out[0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(out[0, 1], 0.0, atol=1e-6)
    assert abs(out[0, 2].mean() - 0.5) < 0.02
    np.testing.assert_allclose(out[0, 3], 0.0, atol=1e-6)
