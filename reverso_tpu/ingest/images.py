"""Host-side image ingest: folder scanning, loading, preprocessing, batching.

Mirrors the reference's folder scan semantics (extensions list, optional
recursive walk — reference core_system.py:492-503) but replaces its
serial PIL-per-image loop with a threaded loader that keeps preprocessed
batches ready while the TPU embeds the previous one.
"""
from __future__ import annotations

import concurrent.futures as cf
import os
from dataclasses import dataclass
from typing import Iterator, Optional, Sequence

import numpy as np
from PIL import Image

from ..config import IMAGE_EXTENSIONS
from ..models.pe import IMAGE_MEAN, IMAGE_STD


def scan_images(folder: str, *, include_subfolders: bool = False,
                extensions: Sequence[str] = IMAGE_EXTENSIONS) -> list[str]:
    """List image files (reference core_system.py:494-503). Sorted for
    deterministic ingest order."""
    exts = tuple(e.lower() for e in extensions)
    files: list[str] = []
    if include_subfolders:
        for root, _, names in os.walk(folder):
            for name in names:
                if name.lower().endswith(exts):
                    files.append(os.path.join(root, name))
    else:
        if not os.path.isdir(folder):
            return []
        for name in os.listdir(folder):
            if name.lower().endswith(exts):
                files.append(os.path.join(folder, name))
    return sorted(files)


def load_image_rgb(path: str) -> Image.Image:
    """PIL open + RGB convert (reference core_system.py:552)."""
    with Image.open(path) as im:
        return im.convert("RGB")


def preprocess_pil(im: Image.Image, size: int, *,
                   mode: str = "resize_square") -> np.ndarray:
    """PIL -> normalized float32 [size, size, 3].

    "resize_square" resizes directly to (size, size) (PE transform family,
    reference core_system.py:200); "resize_crop" is the CLIP-style shortest
    -side resize + center crop.
    """
    if mode == "resize_square":
        im = im.resize((size, size), Image.Resampling.BICUBIC)
    elif mode == "resize_crop":
        w, h = im.size
        scale = size / min(w, h)
        im = im.resize((round(w * scale), round(h * scale)),
                       Image.Resampling.BICUBIC)
        w, h = im.size
        left, top = (w - size) // 2, (h - size) // 2
        im = im.crop((left, top, left + size, top + size))
    else:
        raise ValueError(mode)
    x = np.asarray(im, np.float32) / 255.0
    return (x - IMAGE_MEAN) / IMAGE_STD


@dataclass
class LoadedBatch:
    paths: list[str]            # successfully loaded files
    pixels: np.ndarray          # [B, size, size, 3] float32
    sizes: list[tuple[int, int]]  # original (width, height) per image
    failed: list[tuple[str, str]]  # (path, error) for unreadable files
    # original-resolution uint8 RGB arrays, kept only when the consumer
    # asked for them (region mode: the detector must see the ORIGINAL
    # image and report bboxes in original pixels, matching the reference
    # payload semantics — core_system.py:253-266,413-418)
    originals: Optional[list[np.ndarray]] = None


def iter_batches(paths: Sequence[str], size: int, batch_size: int, *,
                 mode: str = "resize_square", workers: int = 8,
                 prefetch: int = 2,
                 keep_originals: bool = False) -> Iterator[LoadedBatch]:
    """Yield preprocessed batches, loading ahead in a thread pool so the
    accelerator never waits on image decode."""

    def load_one(path: str):
        try:
            im = load_image_rgb(path)
            orig = np.asarray(im, np.uint8) if keep_originals else None
            return (path, preprocess_pil(im, size, mode=mode), im.size,
                    orig, None)
        except Exception as e:  # per-file fault tolerance
            return path, None, None, None, f"{type(e).__name__}: {e}"

    chunks = [list(paths[i:i + batch_size])
              for i in range(0, len(paths), batch_size)]

    def load_chunk(chunk):
        ok_paths, pixels, sizes, originals, failed = [], [], [], [], []
        for path, px, sz, orig, err in ex.map(load_one, chunk):
            if err is None:
                ok_paths.append(path)
                pixels.append(px)
                sizes.append(sz)
                originals.append(orig)
            else:
                failed.append((path, err))
        arr = (np.stack(pixels) if pixels
               else np.zeros((0, size, size, 3), np.float32))
        return LoadedBatch(ok_paths, arr, sizes, failed,
                           originals if keep_originals else None)

    with cf.ThreadPoolExecutor(max_workers=workers) as ex:
        pending: list[cf.Future] = []
        idx = 0
        while idx < len(chunks) and len(pending) < prefetch:
            pending.append(ex.submit(load_chunk, chunks[idx]))
            idx += 1
        while pending:
            batch = pending.pop(0).result()
            if idx < len(chunks):
                pending.append(ex.submit(load_chunk, chunks[idx]))
                idx += 1
            yield batch
