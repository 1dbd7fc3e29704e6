"""Host ingest loader: decode backends, draft decode, batch iteration.

The loader rebuilds the reference's serial PIL open/convert/resize loop
(reference core_system.py:552, :200) as a threaded prefetching pipeline.
These tests pin the backend contract: identical metadata across
backends, original-resolution sizes even under JPEG draft decode, and
pixel agreement between the "pil" (reference transform family) and
"cv2" (fast) paths.
"""
import os

import numpy as np
import pytest
from PIL import Image

from reverso_tpu.ingest.images import (
    _NORM_BIAS, _NORM_SCALE, iter_batches, normalize_u8, preprocess_pil,
    scan_images)
from reverso_tpu.models.pe import IMAGE_MEAN, IMAGE_STD


@pytest.fixture(scope="module")
def jpeg_folder(tmp_path_factory):
    """A folder of JPEGs larger than 2x the model size (draft fires)."""
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    # smooth content so JPEG round-trips cleanly
    for i in range(5):
        g = rng.standard_normal((12, 16, 3)).astype(np.float32)
        big = np.asarray(Image.fromarray(
            ((g - g.min()) / (np.ptp(g) + 1e-9) * 255).astype(np.uint8)
        ).resize((160, 120), Image.Resampling.BICUBIC))
        Image.fromarray(big).save(root / f"{i}.jpg", quality=92)
    # one PNG (draft is a JPEG-only feature; must still load)
    Image.fromarray(big).save(root / "5.png")
    # one unreadable file with an image extension
    (root / "bad.jpg").write_bytes(b"not a jpeg")
    return str(root)


def _collect(folder, size=32, **kw):
    files = scan_images(folder)
    batches = list(iter_batches(files, size, 4, **kw))
    paths = [p for b in batches for p in b.paths]
    pixels = np.concatenate([b.pixels for b in batches if len(b.paths)])
    sizes = [s for b in batches for s in b.sizes]
    failed = [f for b in batches for f in b.failed]
    return paths, pixels, sizes, failed, batches


def test_pil_backend_draft_keeps_original_sizes(jpeg_folder):
    paths, pixels, sizes, failed, _ = _collect(jpeg_folder)
    assert len(paths) == 6 and len(failed) == 1
    assert pixels.shape == (6, 32, 32, 3) and pixels.dtype == np.float32
    # sizes must be ORIGINAL dims even though draft decoded at 1/2
    assert all(s == (160, 120) for s in sizes)


def test_pil_draft_matches_full_decode(jpeg_folder):
    # keep_originals=True forces a full decode; the draft path must stay
    # within JPEG-noise of it after the resize
    _, px_draft, _, _, _ = _collect(jpeg_folder)
    _, px_full, sizes, _, batches = _collect(jpeg_folder,
                                             keep_originals=True)
    # normalized units: 1/255 of pixel range ~= 0.0175 after /std
    assert np.abs(px_draft - px_full).mean() < 0.05
    assert np.abs(px_draft - px_full).max() < 0.5
    # originals kept at full resolution
    for b in batches:
        for o in b.originals or []:
            assert o.shape == (120, 160, 3) and o.dtype == np.uint8


def test_cv2_backend_matches_pil(jpeg_folder):
    paths_p, px_p, sizes_p, failed_p, _ = _collect(jpeg_folder)
    paths_c, px_c, sizes_c, failed_c, _ = _collect(jpeg_folder,
                                                   backend="cv2")
    assert paths_p == paths_c
    assert sizes_p == sizes_c
    assert len(failed_c) == 1
    # different bicubic kernels; agreement within a few gray levels
    assert np.abs(px_p - px_c).mean() < 0.12

    # region mode (originals kept, full decode) also agrees
    _, _, _, _, bp = _collect(jpeg_folder, keep_originals=True)
    _, _, _, _, bc = _collect(jpeg_folder, keep_originals=True,
                              backend="cv2")
    op = np.stack([o for b in bp for o in b.originals])
    oc = np.stack([o for b in bc for o in b.originals])
    # full-resolution decodes of the same JPEG: identical up to IDCT
    # rounding (PIL and OpenCV both wrap libjpeg-turbo)
    assert np.abs(op.astype(int) - oc.astype(int)).max() <= 2


def test_unknown_backend_rejected(jpeg_folder):
    with pytest.raises(ValueError, match="backend"):
        list(iter_batches([os.path.join(jpeg_folder, "0.jpg")], 32, 4,
                          backend="turbo"))


def test_normalize_u8_matches_reference_formula():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    ref = (x.astype(np.float32) / 255.0 - IMAGE_MEAN) / IMAGE_STD
    np.testing.assert_allclose(normalize_u8(x), ref, rtol=0, atol=2e-6)
    assert _NORM_SCALE.dtype == np.float32 and _NORM_BIAS.dtype == np.float32


def test_preprocess_pil_unchanged_contract():
    rng = np.random.default_rng(2)
    im = Image.fromarray(rng.integers(0, 256, (50, 70, 3), dtype=np.uint8))
    out = preprocess_pil(im, 32)
    assert out.shape == (32, 32, 3) and out.dtype == np.float32
    crop = preprocess_pil(im, 32, mode="resize_crop")
    assert crop.shape == (32, 32, 3)


def test_cv2_backend_honors_mode(jpeg_folder):
    """mode= must reach the cv2 path: "resize_crop" produces the same
    center-crop geometry as PIL (previously the parameter was silently
    dropped and cv2 always squashed to a square)."""
    paths_p, px_p, sizes_p, _, _ = _collect(jpeg_folder,
                                            mode="resize_crop")
    paths_c, px_c, sizes_c, _, _ = _collect(jpeg_folder,
                                            mode="resize_crop",
                                            backend="cv2")
    assert paths_p == paths_c and sizes_p == sizes_c
    # same geometry, different bicubic kernels: close agreement
    assert np.abs(px_p - px_c).mean() < 0.12
    # and crop really differs from the squash on these 4:3 sources
    _, px_sq, _, _, _ = _collect(jpeg_folder, backend="cv2")
    assert np.abs(px_sq - px_c).mean() > 0.05


def test_cv2_unknown_mode_rejected(jpeg_folder):
    import pytest

    files = sorted(
        str(p) for p in __import__("pathlib").Path(jpeg_folder).iterdir())
    from reverso_tpu.ingest.images import iter_batches
    batches = list(iter_batches(files, 32, 4, mode="nope", backend="cv2"))
    # per-file fault tolerance routes the ValueError into failed
    assert all(not b.paths for b in batches)
    assert any("ValueError" in err for b in batches
               for _, err in b.failed)


def test_iter_batches_no_deadlock_small_worker_pool(jpeg_folder):
    """workers <= prefetch used to DEADLOCK: chunk-level pool tasks
    blocked on per-file tasks queued behind them in the same pool."""
    import pathlib
    files = sorted(str(p) for p in pathlib.Path(jpeg_folder).iterdir())
    from reverso_tpu.ingest.images import iter_batches
    batches = list(iter_batches(files, 32, 2, workers=1, prefetch=2))
    assert sum(len(b.paths) for b in batches) + \
        sum(len(b.failed) for b in batches) == len(files)


def test_scan_images_skips_directories(tmp_path):
    from PIL import Image
    import numpy as np
    from reverso_tpu.ingest.images import scan_images
    os.makedirs(tmp_path / "f" / "vacation.jpg")   # dir with image name
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
        tmp_path / "f" / "real.jpg")
    assert [os.path.basename(p) for p in scan_images(str(tmp_path / "f"))] \
        == ["real.jpg"]
