"""BASELINE config #2 end-to-end on the chip: region-mode create_database.

The reference's main hot loop (reference core_system.py:461-648:
per-image GroundedSAM detect -> SAM masks -> PE embed -> qdrant
upsert, with the detector RE-INITIALIZED per image) run here through
the public engine API: `Reverso.create_database(folder, name, prompt)`
with the full-size JAX stack — GroundingDINO-tiny (Swin-T, 6+6, 900
queries) at 800 px, SAM ViT-B at 1024 px, PE-Core-L14-336 — at
deterministic random init (zero-egress env: no pretrained weights
exist here; the full-size parity harness pins that the converters are
faithful, WEIGHTS_PARITY.md).

Detection thresholds are set so every image yields max_regions
regions (box_threshold=0 keeps the top-k query boxes at random init),
making the measured work per image the reference shape: 1 DINO
forward + 1 SAM forward (8 box prompts) + 1 PE forward + append.

Reports: total build wall, steady-state img/s (second build, jits
warm), per-stage split (detect / embed / append from engine.metrics),
and one search against the built store. Writes nothing outside a temp
dir. Timing through the axon tunnel: stage timers include the
host<->device transfer (that IS the e2e contract); the pure-compute
figure lives in scripts/bench_region_pipeline.py (74 ms/img).

Usage: python scripts/bench_region_e2e_tpu.py [--images 200]
       [--regions 8] [--size 1280x960]
"""
import argparse
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = """[PAD]
[UNK]
[CLS]
[SEP]
person
car
building
tree
dog
sign
"""


def make_corpus(folder: str, n: int, w: int, h: int) -> None:
    """Structured synthetic JPEGs (blobs + gradients — not flat noise,
    so Swin features vary per image and JPEG size is realistic)."""
    from PIL import Image, ImageDraw

    rng = np.random.default_rng(0)
    os.makedirs(folder, exist_ok=True)
    for i in range(n):
        base = rng.integers(0, 96, 3)
        img = np.zeros((h, w, 3), np.uint8) + base.astype(np.uint8)
        pil = Image.fromarray(img)
        draw = ImageDraw.Draw(pil)
        for _ in range(12):
            x0, y0 = rng.integers(0, w - 80), rng.integers(0, h - 80)
            x1, y1 = x0 + rng.integers(40, 300), y0 + rng.integers(40, 300)
            color = tuple(int(c) for c in rng.integers(0, 256, 3))
            if rng.random() < 0.5:
                draw.ellipse([x0, y0, min(x1, w), min(y1, h)], fill=color)
            else:
                draw.rectangle([x0, y0, min(x1, w), min(y1, h)],
                               fill=color)
        pil.save(os.path.join(folder, f"img_{i:04d}.jpg"), quality=90)


def build_detector(regions: int):
    import jax
    import jax.numpy as jnp

    from reverso_tpu.config import DetectorConfig
    from reverso_tpu.detect.grounded import GroundedSamDetector
    from reverso_tpu.detect.wordpiece import WordPieceTokenizer
    from reverso_tpu.models.groundingdino import (GroundingDino,
                                                  GroundingDinoConfig,
                                                  generate_text_masks)
    from reverso_tpu.models.sam import Sam, SamConfig

    dino_cfg = GroundingDinoConfig()            # full tiny config, fp32
    sam_cfg = SamConfig()                       # ViT-B
    vocab = os.path.join(tempfile.gettempdir(), "reverso_e2e_vocab.txt")
    with open(vocab, "w") as f:
        f.write(VOCAB)
    tok = WordPieceTokenizer(vocab)

    t0 = time.perf_counter()
    dino = GroundingDino(dino_cfg)
    ids = np.zeros((1, 8), np.int32)
    attn, pos = generate_text_masks(ids)
    dparams = jax.jit(dino.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 800, 800, 3)),
        jnp.asarray(ids), jnp.asarray(attn), jnp.asarray(pos),
        jnp.ones((1, 8), bool))["params"]
    sam = Sam(sam_cfg)
    sparams = jax.jit(sam.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 1024, 1024, 3)),
        jnp.zeros((1, 1, 4)))["params"]
    print(f"model init (random weights, full size): "
          f"{time.perf_counter() - t0:.0f}s", flush=True)

    # box_threshold 0: keep the top-scoring query boxes at random init
    # so region count is the stable reference shape, not luck
    cfg = DetectorConfig(box_threshold=0.0, text_threshold=0.0,
                         max_regions=regions)
    return GroundedSamDetector(dparams, sparams, tok, cfg=cfg,
                               dino_cfg=dino_cfg, sam_cfg=sam_cfg)


def run_build(eng, folder: str, name: str):
    from reverso_tpu.utils.profiling import Metrics

    eng.metrics = Metrics()
    t0 = time.perf_counter()
    transcript = eng.create_database(folder, name,
                                     text_prompt="person . car . building")
    wall = time.perf_counter() - t0
    return wall, transcript, eng.metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=200)
    ap.add_argument("--regions", type=int, default=8)
    ap.add_argument("--size", default="1280x960")
    ap.add_argument("--batch", type=int, default=4,
                    help="ingest batch (detector chunks to dino_batch)")
    ap.add_argument("--region-mode", action="store_true",
                    help="fused masked-ROI per-region embeddings (the "
                         "north-star mode) instead of the reference's "
                         "compat global-embedding-per-region")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))

    import dataclasses

    import jax

    from reverso_tpu.cli import _enable_compile_cache
    from reverso_tpu.config import default_config
    from reverso_tpu.engine import Reverso
    from reverso_tpu.models.pe import PerceptionEncoder

    _enable_compile_cache()
    print(f"backend: {jax.default_backend()}", flush=True)

    work = tempfile.mkdtemp(prefix="reverso_e2e_")
    folder = os.path.join(work, "imgs")
    t0 = time.perf_counter()
    make_corpus(folder, args.images, w, h)
    print(f"corpus: {args.images} JPEGs {w}x{h} "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)

    detector = build_detector(args.regions)
    t0 = time.perf_counter()
    pe = PerceptionEncoder.from_preset("PE-Core-L14-336")
    print(f"PE-Core-L14-336 init: {time.perf_counter() - t0:.0f}s",
          flush=True)

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg, model=pe.cfg,
        store=dataclasses.replace(cfg.store, root_dir=os.path.join(
            work, "db")),
        ingest=dataclasses.replace(
            cfg.ingest, batch_size=args.batch,
            max_regions=args.regions,
            region_embed_mode="region" if args.region_mode
            else "compat"))
    eng = Reverso(cfg, encoder=pe, detector=detector)

    wall1, transcript, m1 = run_build(eng, folder, "region_e2e_warm")
    print(f"\nbuild 1 (cold jits): {wall1:.0f}s total "
          f"({args.images / wall1:.2f} img/s)", flush=True)

    # same-session contention reference (the chip is time-shared;
    # bench.py's roofline co-measurement makes the img/s attributable)
    from bench import _contention_reference
    ref = _contention_reference(budget_s=15.0)
    print(f"contention ref: {ref['ref_matmul_tflops']} TFLOP/s bare "
          f"matmul = {ref['ref_matmul_frac_peak']:.2f} of uncontended "
          f"peak", flush=True)

    wall2, transcript, m2 = run_build(eng, folder, "region_e2e")
    n_emb = int(m2.counts.get("append", 0))
    print(f"build 2 (steady state): {wall2:.1f}s total = "
          f"{args.images / wall2:.2f} img/s end-to-end, "
          f"{n_emb} region embeddings", flush=True)
    for stage in sorted(m2.seconds):
        print(f"  stage {stage:<10} {m2.seconds[stage]:7.1f}s  "
              f"{m2.counts[stage]:5d} items  "
              f"{m2.seconds[stage] / max(args.images, 1) * 1e3:7.0f} "
              f"ms/img", flush=True)
    other = wall2 - sum(m2.seconds.values())
    print(f"  stage {'(loader/other)':<10} {other:7.1f}s  "
          f"{other / max(args.images, 1) * 1e3:16.0f} ms/img", flush=True)

    # search the result through the public API
    from PIL import Image
    img = Image.open(os.path.join(folder, "img_0003.jpg"))
    t0 = time.perf_counter()
    n = eng.detect_regions(img, "person . car")
    eng.extract_embeddings(img)
    text, items = eng.search_similar(similarity_threshold=0.2)
    t_q = time.perf_counter() - t0
    print(f"\nquery path: detect({n} regions) + embed + search = "
          f"{t_q * 1e3:.0f} ms; top hit "
          f"{items[0]['filename'] if items else 'NONE'}", flush=True)

    for line in transcript.splitlines()[-4:]:
        print(f"  transcript: {line}")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
