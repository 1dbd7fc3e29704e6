"""Region-level retrieval quality: ROI embeddings vs compat-global.

Earns the north-star claim with a number. The reference stores the
GLOBAL image embedding for every detected region
(/root/reference/core_system.py:406 — "Use global for now"), so two
regions of one image are indistinguishable at query time; this build's
`PerceptionEncoder.encode_regions` (models/pe.py) pools masked ROI
embeddings instead. This eval measures whether that actually retrieves
regions better, on a corpus where region-level retrieval is DECIDABLE
at deterministic random init (no pretrained weights exist in this
environment):

  * P distinct full-resolution noise textures ("patterns");
  * N images, each a 2x2 grid of 4 distinct patterns — each quadrant
    shows its pattern's OWN pixels at that location (textures are
    position-stationary by construction);
  * the store indexes one embedding per region, twice: compat = the
    image's global embedding repeated (reference behavior), roi = the
    masked-ROI pooled embedding (this build's --region-mode);
  * queries are perturbed full-image copies of single patterns,
    embedded GLOBALLY — exactly how a user-supplied query crop flows
    through the deployed pipeline in both modes;
  * a hit is correct iff the retrieved REGION's pattern matches the
    query pattern (region-level recall, not image-level).

Scoring is exact f64 cosine (host): the eval isolates embedding
quality; kernel parity is pinned elsewhere (tests/test_topk.py).

Run: python scripts/eval_roi_quality.py [--json] [--n N] [--patterns P]
A regression test pins roi > compat on this corpus:
tests/test_roi.py::test_roi_beats_compat_region_recall.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build_corpus(rng, P: int, N: int, S: int):
    """Patterns, grid images, labels, quadrant masks."""
    H = S // 2
    pats = rng.integers(0, 256, (P, S, S, 3)).astype(np.uint8)
    quads = [(0, 0), (0, 1), (1, 0), (1, 1)]
    imgs = np.zeros((N, S, S, 3), np.uint8)
    lab = np.zeros((N, 4), np.int32)
    for i in range(N):
        ps = rng.choice(P, 4, replace=False)
        lab[i] = ps
        for q, (r, c) in enumerate(quads):
            sl = (slice(r * H, (r + 1) * H), slice(c * H, (c + 1) * H))
            imgs[i][sl] = pats[ps[q]][sl]
    masks = np.zeros((N, 4, S, S), bool)
    for q, (r, c) in enumerate(quads):
        masks[:, q, r * H:(r + 1) * H, c * H:(c + 1) * H] = True
    return pats, imgs, lab, masks


def run_eval(P: int = 32, N: int = 64, jitters: int = 4, seed: int = 0,
             depth: int = 4, width: int = 128):
    from reverso_tpu.config import MODEL_PRESETS
    from reverso_tpu.models import PerceptionEncoder, preprocess_images

    cfg = dataclasses.replace(
        MODEL_PRESETS["test-tiny"], name="roi-eval", image_size=64,
        patch_size=8, width=width, depth=depth, num_heads=4,
        embed_dim=64)
    pe = PerceptionEncoder(cfg)
    rng = np.random.default_rng(seed)
    pats, imgs, lab, masks = build_corpus(rng, P, N, cfg.image_size)

    g, reg = pe.encode_regions(preprocess_images(imgs), masks)
    g = np.asarray(g, np.float64)
    reg = np.asarray(reg, np.float64)
    stores = {
        # reference behavior: every region carries the global embedding
        "compat": np.repeat(g, 4, axis=0),
        # this build: fused masked-ROI pooled embeddings
        "roi": reg.reshape(N * 4, -1),
    }
    flat_lab = lab.reshape(-1)

    qimgs = np.concatenate([
        np.clip(pats.astype(np.int32)
                + rng.integers(-12, 13, pats.shape), 0, 255)
        .astype(np.uint8) for _ in range(jitters)])
    qlab = np.tile(np.arange(P), jitters)
    qe = np.asarray(pe.encode_image(preprocess_images(qimgs)),
                    np.float64)
    qe /= np.linalg.norm(qe, axis=1, keepdims=True)

    out = {}
    for name, db in stores.items():
        dbn = db / np.linalg.norm(db, axis=1, keepdims=True)
        order = np.argsort(-(qe @ dbn.T), axis=1, kind="stable")
        hit = flat_lab[order] == qlab[:, None]
        out[name] = {
            "recall@1": float(hit[:, 0].mean()),
            "recall@10": float(hit[:, :10].any(axis=1).mean()),
            "mrr": float(np.mean(1.0 / (1 + hit.argmax(axis=1))
                                 * hit.any(axis=1))),
        }
    out["config"] = {"patterns": P, "images": N, "regions": N * 4,
                     "queries": P * jitters, "depth": depth,
                     "width": width, "seed": seed}
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--patterns", type=int, default=32)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--jitters", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)
    res = run_eval(P=args.patterns, N=args.n, jitters=args.jitters,
                   seed=args.seed)
    if args.json:
        print(json.dumps(res))
        return 0
    c, r = res["compat"], res["roi"]
    print(f"{'':8s} {'recall@1':>9s} {'recall@10':>10s} {'mrr':>7s}")
    for name, m in (("compat", c), ("roi", r)):
        print(f"{name:8s} {m['recall@1']:9.3f} {m['recall@10']:10.3f} "
              f"{m['mrr']:7.3f}")
    print("config:", res["config"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
