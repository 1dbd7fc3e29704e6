"""GroundedSAM orchestration tests (tiny random models, tiny vocab)."""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reverso_tpu.detect.grounded import GroundedSamDetector
from reverso_tpu.detect.wordpiece import WordPieceTokenizer
from reverso_tpu.config import DetectorConfig
from reverso_tpu.models.groundingdino import GroundingDino, tiny_test_config
from reverso_tpu.models.sam import Sam, tiny_sam_config

VOCAB = """[PAD]
[UNK]
[CLS]
[SEP]
.
?
person
car
build
##ing
red
a
"""


@pytest.fixture(scope="module")
def vocab_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("tok") / "vocab.txt"
    p.write_text(VOCAB)
    return str(p)


def test_wordpiece(vocab_path):
    tok = WordPieceTokenizer(vocab_path)
    ids = tok.encode("person building")
    # [CLS] person build ##ing [SEP]
    assert ids == [2, 6, 8, 9, 3]
    ids, spans = tok.token_spans(["person", "building"])
    assert ids[0] == 2 and ids[-1] == 3
    assert ids[spans[0][0]:spans[0][1]] == [6]
    assert ids[spans[1][0]:spans[1][1]] == [8, 9]
    # unknown word -> UNK
    assert tok.encode("xyzzy", add_special=False) == [1]


@pytest.fixture(scope="module")
def detector(vocab_path):
    dino_cfg = tiny_test_config()
    # tokenizer vocab is tiny; shrink bert vocab accordingly (ids < 1200 ok)
    sam_cfg = tiny_sam_config()
    tok = WordPieceTokenizer(vocab_path)
    dino = GroundingDino(dino_cfg)
    dparams = jax.jit(dino.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16, 16), bool),
        jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), bool))["params"]
    sam = Sam(sam_cfg)
    sparams = jax.jit(sam.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 1, 4)))["params"]
    cfg = DetectorConfig(box_threshold=0.0, text_threshold=0.0, max_regions=8)
    return GroundedSamDetector(dparams, sparams, tok, cfg=cfg,
                               dino_cfg=dino_cfg, sam_cfg=sam_cfg,
                               dino_size=64, text_len=16)


def test_detect_structure(detector):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (48, 72, 3), dtype=np.uint8)
    regions = detector.detect(img, ["person", "car"])
    # thresholds are 0 -> max_regions survive
    assert len(regions) == 8
    assert regions.boxes.shape == (8, 4)
    assert regions.masks.shape == (8, 48, 72)
    assert regions.masks.dtype == bool
    assert set(np.unique(regions.class_ids)) <= {0, 1}
    assert regions.class_names == ["person", "car"]
    assert (regions.boxes[:, 0] <= regions.boxes[:, 2]).all()
    assert (regions.confidences > 0).all()
    # determinism
    regions2 = detector.detect(img, ["person", "car"])
    np.testing.assert_array_equal(regions.boxes, regions2.boxes)


def test_detect_high_threshold(detector):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    strict = dataclasses.replace(detector.cfg, box_threshold=1.1)
    old = detector.cfg
    try:
        detector.cfg = strict
        regions = detector.detect(img, ["person"])
        assert len(regions) == 0
        assert regions.masks.shape == (0, 32, 32)
    finally:
        detector.cfg = old


def test_engine_pipeline_with_real_detector(detector, tmp_path):
    """End-to-end create_database + query through the real (tiny random)
    GroundedSAM detector class — catches interface drift between the
    detector, pipeline, and engine."""
    import dataclasses, sys
    sys.path.insert(0, "tests")
    from test_pipeline import make_corpus
    from reverso_tpu.config import MODEL_PRESETS, default_config
    from reverso_tpu.engine import Reverso
    from reverso_tpu.models.pe import PerceptionEncoder

    model = dataclasses.replace(MODEL_PRESETS["test-tiny"], dtype="float32")
    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=model,
        store=dataclasses.replace(cfg.store, root_dir=str(tmp_path / "db")),
        detector=detector.cfg)
    engine = Reverso(cfg, encoder=PerceptionEncoder(model), detector=detector)
    make_corpus(tmp_path / "imgs", n=3, size=56)
    transcript = engine.create_database(str(tmp_path / "imgs"), "real",
                                        text_prompt="person . car")
    assert "ready for searching" in transcript, transcript
    n = engine.detect_regions(str(tmp_path / "imgs" / "img_000.jpg"),
                              "person . car")
    assert n > 0
    embs, metas = engine.extract_embeddings(
        str(tmp_path / "imgs" / "img_000.jpg"))
    assert embs and metas[0]["mask_status"] in ("processed",
                                                "missing_or_unavailable")
    text, items = engine.search_similar(similarity_threshold=-1.0)
    assert items, text


def test_mask_bits_transfer_matches_logits(detector, monkeypatch):
    """The default bit-packed mask transfer (threshold at the decoder
    grid in-jit, 32x less download) reproduces the legacy fp32-logits
    path: identical boxes/classes, near-identical masks (boundary may
    shift sub-cell where the indicator's 0.5 level and the logits'
    zero crossing interpolate differently)."""
    rng = np.random.default_rng(9)
    imgs = [rng.integers(0, 256, (52, 44, 3), dtype=np.uint8)
            for _ in range(2)]
    assert detector.mask_bits           # default is the packed path
    got_bits = detector.detect_batch(imgs, ["person", "car"])

    monkeypatch.setenv("REVERSO_MASK_LOGITS", "1")
    legacy = GroundedSamDetector(
        detector.dino_params, detector.sam_params, detector.tokenizer,
        cfg=detector.cfg, dino_cfg=detector.dino_cfg,
        sam_cfg=detector.sam_cfg, dino_size=detector.dino_size,
        text_len=detector.text_len)
    assert not legacy.mask_bits
    got_logits = legacy.detect_batch(imgs, ["person", "car"])

    for rb, rl in zip(got_bits, got_logits):
        np.testing.assert_allclose(rb.boxes, rl.boxes, atol=1e-4)
        np.testing.assert_array_equal(rb.class_ids, rl.class_ids)
        assert rb.masks.shape == rl.masks.shape
        # random-init logits hover near zero with NO margin — the
        # worst case for early thresholding; the confident-logits
        # equivalence (the deployed regime) is pinned below
        agree = (rb.masks == rl.masks).mean()
        assert agree >= 0.70, agree


def test_mask_bits_postprocess_equivalence_confident_logits(detector):
    """On CONFIDENT logits (the real-weights regime: |logit| large
    away from the boundary), the packed-bits host transform and the
    legacy logits transform produce near-identical masks — the
    bilinear 0.5-level of the indicator tracks the logits' zero
    crossing to within a fraction of a decoder cell."""
    import os as _os

    rng = np.random.default_rng(4)
    s4 = detector.sam_cfg.vision.image_size // 4     # decoder grid
    size = detector.sam_cfg.vision.image_size
    nb, B = 3, 2
    yy, xx = np.mgrid[0:s4, 0:s4].astype(np.float32)
    logits = np.zeros((B, nb, 1, s4, s4), np.float32)
    for j in range(B):
        for i in range(nb):
            cy, cx = rng.uniform(3, s4 - 3, 2)
            r = rng.uniform(2, s4 / 2)
            # sharp blob: +/-8 a cell away from the boundary
            logits[j, i, 0] = 8.0 * (r - np.hypot(yy - cy, xx - cx))
    w8 = (1 << np.arange(8)[::-1]).astype(np.uint32)
    packed = ((logits[:, :, 0] > 0)
              .reshape(B, nb, s4, s4 // 8, 8)
              .astype(np.uint32) * w8).sum(-1).astype(np.uint8)

    imgs = [rng.integers(0, 256, (52, 44, 3), np.uint8)
            for _ in range(B)]
    preps = [detector._prep_sam_image(im) for im in imgs]
    boxes_list = [np.zeros((nb, 4), np.float32)] * B

    masks_bits = detector._segment_finish(
        (packed, imgs, boxes_list, preps))
    legacy = GroundedSamDetector(
        detector.dino_params, detector.sam_params, detector.tokenizer,
        cfg=detector.cfg, dino_cfg=detector.dino_cfg,
        sam_cfg=detector.sam_cfg, dino_size=detector.dino_size,
        text_len=detector.text_len)
    legacy.mask_bits = False     # host-side switch only (no jit here)
    masks_log = legacy._segment_finish(
        (logits, imgs, boxes_list, preps))
    for mb, ml in zip(masks_bits, masks_log):
        inter = (mb & ml).sum()
        union = (mb | ml).sum()
        assert union > 0
        assert inter / union >= 0.95, inter / union


def test_detect_batch_matches_single(detector):
    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)
            for _ in range(3)]
    batched = detector.detect_batch(imgs, ["person", "car"])
    assert len(batched) == 3
    for im, rb in zip(imgs, batched):
        rs = detector.detect(im, ["person", "car"])
        np.testing.assert_allclose(rb.boxes, rs.boxes, atol=1e-4)
        np.testing.assert_array_equal(rb.class_ids, rs.class_ids)
        np.testing.assert_array_equal(rb.masks, rs.masks)
    assert detector.detect_batch([], ["person"]) == []


def test_detector_dtype_threads_into_model_configs():
    """DetectorConfig.dtype reaches both towers unless cfgs are explicit."""
    from reverso_tpu.config import DetectorConfig
    from reverso_tpu.detect.grounded import GroundedSamDetector

    det = GroundedSamDetector(None, None, None,
                              cfg=DetectorConfig(dtype="bfloat16"))
    assert det.dino_cfg.dtype == "bfloat16"
    assert det.sam_cfg.dtype == "bfloat16"
    det32 = GroundedSamDetector(None, None, None)
    assert det32.dino_cfg.dtype == "float32"
    assert det32.sam_cfg.dtype == "float32"


def test_detect_reuses_batch_shapes(detector):
    """Single-image detect() must feed the SAME jit input shapes as a
    full-chunk build batch (DINO pads to dino_batch, SAM groups pad to
    sam_batch): a fresh single-image shape costs a 191-230 s remote
    compile on the first interactive query after a build (measured
    twice in round 4 — this test pins the fix)."""
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
            for _ in range(5)]
    shapes: set = set()
    orig_dino, orig_sam = detector._dino_fwd, detector._sam_fwd

    def spy_dino(params, images_u8, *rest):
        shapes.add(("dino", images_u8.shape[0]))
        return orig_dino(params, images_u8, *rest)

    def spy_sam(params, images_u8, *rest):
        shapes.add(("sam", images_u8.shape[0]))
        return orig_sam(params, images_u8, *rest)

    detector._dino_fwd, detector._sam_fwd = spy_dino, spy_sam
    try:
        detector.detect_batch(imgs, ["red", "blue"])   # build-style
        build_shapes = set(shapes)
        shapes.clear()
        detector.detect(imgs[0], ["red", "blue"])      # query-style
        query_shapes = set(shapes)
    finally:
        detector._dino_fwd, detector._sam_fwd = orig_dino, orig_sam
    assert query_shapes <= build_shapes, (query_shapes, build_shapes)
    # and the batch dims are exactly the configured micro-batches
    assert ("dino", detector.dino_batch) in build_shapes
