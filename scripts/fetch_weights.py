#!/usr/bin/env python
"""Fetch, convert, and parity-check real pretrained weights.

The reference's value is pretrained towers
(`pe.CLIP.from_config("PE-Core-L14-336", pretrained=True)` +
`GroundedSAM(...)`, reference core_system.py:181,220-266). This script
produces the TPU-native equivalents: torch checkpoints -> converted flax
msgpack params + a parity report, so the engine never needs torch or
network at serving time.

Online (default model ids):

    python scripts/fetch_weights.py --dest weights --models pe,text,dino,sam

Offline (zero-egress hosts like this TPU image): download on any
networked machine first —

    huggingface-cli download openai/clip-vit-large-patch14-336 --local-dir /ckpts/clip
    huggingface-cli download IDEA-Research/grounding-dino-tiny --local-dir /ckpts/dino
    huggingface-cli download facebook/sam-vit-base --local-dir /ckpts/sam

— copy /ckpts over, then run with local dirs (no network touched):

    python scripts/fetch_weights.py --dest weights \
        --local-pe /ckpts/clip --local-text /ckpts/clip \
        --local-dino /ckpts/dino --local-sam /ckpts/sam \
        --corpus /path/to/100_images

Outputs under --dest:
    pe_vision.msgpack(+.json)   converted vision tower (engine: set
                                REVERSO_PE_CKPT=weights/pe_vision.msgpack)
    clip_text.msgpack(+.json)   text tower (REVERSO_CLIP_TEXT_CKPT etc.)
    dino/ sam/                  raw checkpoint dirs for the detector
                                (REVERSO_DINO_CKPT / REVERSO_SAM_CKPT /
                                 REVERSO_BERT_VOCAB)
    WEIGHTS_PARITY.md           per-layer activation diffs, embedding
                                cosines, recall@10 neighbor-set parity
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PE_ID = "openai/clip-vit-large-patch14-336"   # PE-Core ckpts use the same
DINO_ID = "IDEA-Research/grounding-dino-tiny"
SAM_ID = "facebook/sam-vit-base"

REPORT: list[str] = []


def log(msg: str) -> None:
    print(msg, flush=True)
    REPORT.append(msg)


def _resolve(local: str | None, hf_id: str, dest: str, sub: str) -> str:
    """Return a local checkpoint dir: the --local-* path if given, else a
    huggingface snapshot download into dest/sub."""
    if local:
        return local
    from huggingface_hub import snapshot_download
    path = os.path.join(dest, sub)
    log(f"downloading {hf_id} -> {path}")
    snapshot_download(hf_id, local_dir=path)
    return path


def _model_config_from_hf(path: str):
    """Build a ModelConfig for an HF CLIP vision checkpoint dir."""
    from reverso_tpu.config import ModelConfig

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    v = hf.get("vision_config", hf)
    return ModelConfig(
        name=os.path.basename(path.rstrip("/")),
        image_size=v["image_size"], patch_size=v["patch_size"],
        width=v["hidden_size"], depth=v["num_hidden_layers"],
        num_heads=v["num_attention_heads"],
        mlp_ratio=v["intermediate_size"] / v["hidden_size"],
        embed_dim=hf.get("projection_dim", v.get("projection_dim", 768)),
        use_rope=False, pool_type="cls", layer_scale_init=None,
        dtype="float32")


def _load_images(corpus: str | None, size: int, n: int = 16) -> np.ndarray:
    """[N, size, size, 3] float32 normalized pixels: a real corpus folder
    when given, else seeded random images (still a valid numerical parity
    probe — every weight participates)."""
    from reverso_tpu.models.pe import IMAGE_MEAN, IMAGE_STD

    if corpus:
        from PIL import Image
        from reverso_tpu.ingest.images import preprocess_pil, scan_images
        files = scan_images(corpus)
        if not files:
            raise SystemExit(f"no images found in {corpus}")
        return np.stack([
            preprocess_pil(Image.open(f).convert("RGB"), size)
            for f in files])
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (n, size, size, 3)).astype(np.float32) / 255.0
    return ((u8 - IMAGE_MEAN) / IMAGE_STD).astype(np.float32)


def _per_layer_diffs(torch_model, flax_module, params, pixels) -> list[str]:
    """Max |activation| diff per encoder block: torch hooks vs flax
    capture_intermediates."""
    import torch

    torch_acts: list[np.ndarray] = []

    def hook(_m, _i, out):
        torch_acts.append(out[0].detach().numpy() if isinstance(out, tuple)
                          else out.detach().numpy())

    handles = [layer.register_forward_hook(hook)
               for layer in torch_model.vision_model.encoder.layers]
    with torch.no_grad():
        torch_model(pixel_values=torch.from_numpy(
            pixels.transpose(0, 3, 1, 2)))
    for h in handles:
        h.remove()

    import re

    import jax.numpy as jnp
    _, state = flax_module.apply(
        {"params": params}, jnp.asarray(pixels),
        capture_intermediates=lambda mdl, _: bool(
            re.fullmatch(r"block\d+", mdl.name or "")),
        mutable=["intermediates"])
    inter = state["intermediates"]
    lines = []
    for i, t_act in enumerate(torch_acts):
        node = inter.get(f"block{i}")
        f_act = np.asarray(node["__call__"][0]) if node else None
        if f_act is None or f_act.shape != t_act.shape:
            lines.append(f"| block {i} | (shape mismatch / not captured) |")
            continue
        lines.append(f"| block {i} | {np.abs(f_act - t_act).max():.3e} |")
    return lines


def _recall_at_k(a: np.ndarray, b: np.ndarray, k: int = 10) -> float:
    """Mean |top-k(a) ∩ top-k(b)| / k over all self-queries (BASELINE.md
    'recall@10 vs reference neighbor sets')."""
    def topk_sets(e):
        s = e @ e.T
        np.fill_diagonal(s, -np.inf)
        kk = min(k, e.shape[0] - 1)
        return np.argsort(-s, axis=1)[:, :kk]

    ta, tb = topk_sets(a), topk_sets(b)
    inter = [len(set(ra) & set(rb)) / ta.shape[1]
             for ra, rb in zip(ta, tb)]
    return float(np.mean(inter))


def do_pe(args, dest: str) -> None:
    from reverso_tpu.config import MODEL_PRESETS
    from reverso_tpu.models.checkpoint import save_params
    from reverso_tpu.models.pe import PerceptionEncoder

    path = _resolve(args.local_pe, args.pe_id, dest, "pe_src")
    if args.pe_preset:                       # native PE-Core checkpoint
        cfg = MODEL_PRESETS[args.pe_preset]
        cfg = dataclasses.replace(cfg, dtype="float32")
    else:
        cfg = _model_config_from_hf(path)
    log(f"\n## PE vision tower\n\nsource: {path}\narch: {cfg.name} "
        f"w={cfg.width} d={cfg.depth} h={cfg.num_heads} "
        f"embed={cfg.embed_dim}")
    pe = PerceptionEncoder.from_torch(path, cfg)
    out = os.path.join(dest, "pe_vision.msgpack")
    save_params(out, pe.params, meta={
        "config": dataclasses.asdict(cfg), "family": pe.family,
        "source": path, "converted": time.strftime("%Y-%m-%d")})
    log(f"saved: {out}")

    # ---- parity vs torch --------------------------------------------
    try:
        import torch
        from transformers import CLIPVisionModelWithProjection
        tm = CLIPVisionModelWithProjection.from_pretrained(path).eval()
    except Exception as e:
        log(f"parity: torch reference unavailable ({e}); conversion saved "
            "unchecked — rerun with transformers available to verify")
        return
    pixels = _load_images(args.corpus, cfg.image_size)
    with torch.no_grad():
        ref = tm(pixel_values=torch.from_numpy(
            pixels.transpose(0, 3, 1, 2))).image_embeds.numpy()
    ref_n = ref / np.linalg.norm(ref, axis=1, keepdims=True)
    ours = np.asarray(pe.encode_image(pixels))
    cos = (ours * ref_n).sum(1)
    log(f"\nembedding cosine vs torch over {len(pixels)} images: "
        f"min={cos.min():.6f} mean={cos.mean():.6f}")
    r10 = _recall_at_k(ours, ref_n, 10)
    log(f"recall@10 neighbor-set parity (self-queries): {r10:.4f}")
    log("\n| layer | max |act diff| |\n|---|---|")
    for line in _per_layer_diffs(tm, pe.module, pe.params, pixels[:2]):
        log(line)
    if cos.min() < 0.999:
        raise SystemExit(f"PARITY FAILURE: min cosine {cos.min()} < 0.999")
    log("\nPE parity: PASS (cosine >= 0.999)")


def do_text(args, dest: str) -> None:
    from reverso_tpu.models.checkpoint import save_params
    from reverso_tpu.models.cliptext import (ClipTextConfig, TextEmbedder,
                                             convert_clip_text)
    from reverso_tpu.detect.grounded import load_torch_state_dict

    path = _resolve(args.local_text, args.pe_id, dest, "pe_src")
    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    t = hf.get("text_config", hf)
    cfg = ClipTextConfig(
        vocab_size=t["vocab_size"], width=t["hidden_size"],
        depth=t["num_hidden_layers"], num_heads=t["num_attention_heads"],
        mlp_ratio=t["intermediate_size"] / t["hidden_size"],
        context_length=t["max_position_embeddings"],
        embed_dim=hf.get("projection_dim", 768),
        eot_token_id=t.get("eos_token_id", 49407))
    log(f"\n## CLIP text tower\n\nsource: {path}")
    params = convert_clip_text(load_torch_state_dict(path), cfg)
    out = os.path.join(dest, "clip_text.msgpack")
    save_params(out, params, meta={"config": dataclasses.asdict(cfg),
                                   "source": path})
    log(f"saved: {out} (vocab/merges: use {path}/vocab.json + merges.txt)")

    try:
        import torch
        from transformers import (CLIPTextModelWithProjection, CLIPTokenizer)
        tm = CLIPTextModelWithProjection.from_pretrained(path).eval()
        tok = CLIPTokenizer.from_pretrained(path)
    except Exception as e:
        log(f"parity: torch reference unavailable ({e})")
        return
    texts = ["a red car at night", "two people walking", "a building"]
    enc = tok(texts, padding="max_length",
              max_length=cfg.context_length, return_tensors="pt")
    with torch.no_grad():
        ref = tm(input_ids=enc.input_ids).text_embeds.numpy()
    ref /= np.linalg.norm(ref, axis=1, keepdims=True)
    from reverso_tpu.detect.clipbpe import ClipBPETokenizer
    bpe = ClipBPETokenizer(os.path.join(path, "vocab.json"),
                           os.path.join(path, "merges.txt"),
                           context_length=cfg.context_length)
    emb = TextEmbedder(cfg, params, bpe).embed(texts)
    cos = (emb * ref).sum(1)
    log(f"text embedding cosine vs torch: min={cos.min():.6f}")
    if cos.min() < 0.999:
        raise SystemExit(f"TEXT PARITY FAILURE: {cos.min()}")
    log("text parity: PASS")


def do_dino(args, dest: str) -> None:
    from reverso_tpu.detect.grounded import GroundedSamDetector

    dino = _resolve(args.local_dino, DINO_ID, dest, "dino")
    sam = _resolve(args.local_sam, SAM_ID, dest, "sam")
    vocab = os.path.join(dino, "vocab.txt")
    log(f"\n## GroundingDINO + SAM\n\ndino: {dino}\nsam: {sam}")
    det = GroundedSamDetector.from_pretrained(dino, sam, vocab)
    pixels = (_load_images(args.corpus, 320, n=1)[0] * 60 + 128)
    img = np.clip(pixels, 0, 255).astype(np.uint8)
    regions = det.detect(img, ["person", "car"])
    log(f"detector forward OK: {len(regions)} regions on probe image")
    log(f"engine env:\n  REVERSO_DINO_CKPT={dino}\n  REVERSO_SAM_CKPT={sam}"
        f"\n  REVERSO_BERT_VOCAB={vocab}")

    if not args.detect_parity:
        return
    try:
        import torch
        from transformers import (AutoProcessor,
                                  GroundingDinoForObjectDetection)
        tm = GroundingDinoForObjectDetection.from_pretrained(dino).eval()
        proc = AutoProcessor.from_pretrained(dino)
    except Exception as e:
        log(f"detect parity: torch reference unavailable ({e})")
        return
    from PIL import Image
    im = Image.open(args.detect_parity).convert("RGB")
    inputs = proc(images=im, text="person. car.", return_tensors="pt")
    with torch.no_grad():
        out = tm(**inputs)
    res = proc.post_process_grounded_object_detection(
        out, inputs.input_ids, threshold=det.cfg.box_threshold,
        target_sizes=[im.size[::-1]])[0]
    ours = det.detect(np.asarray(im), ["person", "car"])
    log(f"torch boxes: {len(res['boxes'])}, ours: {len(ours)}")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--parity-only", action="store_true",
                    help="no downloads/weights: run the FULL-SIZE "
                         "architecture parity gate at deterministic "
                         "random init (scripts/parity_fullsize.py) — "
                         "the strongest evidence obtainable without "
                         "network egress")
    ap.add_argument("--dest", default="weights")
    ap.add_argument("--models", default="pe,text,dino,sam")
    ap.add_argument("--pe-id", default=PE_ID)
    ap.add_argument("--pe-preset", default=None,
                    help="MODEL_PRESETS name for a native PE-Core ckpt "
                         "(openai fused-qkv naming), e.g. PE-Core-L14-336")
    ap.add_argument("--local-pe", default=None)
    ap.add_argument("--local-text", default=None)
    ap.add_argument("--local-dino", default=None)
    ap.add_argument("--local-sam", default=None)
    ap.add_argument("--corpus", default=None,
                    help="image folder for the recall@10 parity probe")
    ap.add_argument("--detect-parity", default=None,
                    help="image path for a torch-vs-ours detection compare")
    ap.add_argument("--report", default=None,
                    help="write the parity report here "
                         "(default <dest>/WEIGHTS_PARITY.md)")
    args = ap.parse_args()

    if args.parity_only:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import parity_fullsize
        sys.argv = [sys.argv[0]]
        return parity_fullsize.main()

    os.makedirs(args.dest, exist_ok=True)
    REPORT.append(f"# Weights parity report — {time.strftime('%Y-%m-%d %H:%M')}\n")
    models = {m.strip() for m in args.models.split(",")}
    try:
        if "pe" in models:
            do_pe(args, args.dest)
        if "text" in models:
            do_text(args, args.dest)
        if "dino" in models or "sam" in models:
            do_dino(args, args.dest)
    finally:
        report = args.report or os.path.join(args.dest, "WEIGHTS_PARITY.md")
        with open(report, "w") as f:
            f.write("\n".join(REPORT) + "\n")
        print(f"\nreport written to {report}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
