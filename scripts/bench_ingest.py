#!/usr/bin/env python
"""Host ingest loader A/B: decode backend x mode, img/s per host core.

Generates a synthetic folder of realistic JPEGs (default 1280x960 q90,
low-frequency content + noise so file sizes land near real photos) and
times `iter_batches` end-to-end — decode, resize-to-model, normalize,
original-retention — interleaved across configs with min-of-reps (the
numbers PERF.md's "Host ingest loader" table records).

The loader feeds the device embed path (reference's serial PIL loop:
core_system.py:552,200); per-core rates matter on small hosts, where
a slow loader starves the ~300 img/s TPU embed rate.

Run:  python scripts/bench_ingest.py [--n 128] [--res 1280x960] [--reps 3]
"""
import argparse
import os
import sys
import tempfile
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))


def make_corpus(folder: str, n: int, w: int, h: int, quality: int) -> None:
    from PIL import Image
    from scipy import ndimage

    rng = np.random.default_rng(0)
    base = ndimage.gaussian_filter(
        rng.standard_normal((h, w, 3)).astype(np.float32), (24, 24, 0))
    base = ((base - base.min()) / (np.ptp(base) + 1e-9) * 255).astype(np.uint8)
    for i in range(n):
        noise = rng.integers(-12, 12, base.shape, dtype=np.int16)
        img = np.clip(base.astype(np.int16) + noise, 0, 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(folder, f"{i:05d}.jpg"),
                                  quality=quality)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--res", default="1280x960")
    ap.add_argument("--quality", type=int, default=90)
    ap.add_argument("--size", type=int, default=336)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--folder", default=None,
                    help="use an existing image folder instead of synthesizing")
    args = ap.parse_args()

    from reverso_tpu.ingest.images import iter_batches, scan_images

    if args.folder:
        folder = args.folder
    else:
        folder = tempfile.mkdtemp(prefix="reverso_ingest_bench_")
        w, h = (int(x) for x in args.res.split("x"))
        make_corpus(folder, args.n, w, h, args.quality)
    files = scan_images(folder)[:args.n]
    kb = sum(os.path.getsize(f) for f in files) / len(files) / 1024
    print(f"{len(files)} images, avg {kb:.0f} KB, {os.cpu_count()} host cores")

    cfgs = [(backend, keep) for backend in ("pil", "cv2")
            for keep in (False, True)]
    best = {c: float("inf") for c in cfgs}
    for _ in range(args.reps):                     # interleaved min-of-reps
        for c in cfgs:
            backend, keep = c
            t0 = time.perf_counter()
            tot = 0
            for b in iter_batches(files, args.size, args.batch,
                                  keep_originals=keep, backend=backend):
                tot += len(b.paths)
            best[c] = min(best[c], time.perf_counter() - t0)
            assert tot == len(files), (tot, len(files))

    print("\n| backend | mode | img/s |")
    print("|---|---|---|")
    for (backend, keep), dt in best.items():
        mode = "region (originals kept)" if keep else "direct-PE"
        print(f"| {backend} | {mode} | {len(files) / dt:.0f} |")


if __name__ == "__main__":
    main()
