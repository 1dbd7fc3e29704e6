"""GroundedSAM: prompt-conditioned detection + segmentation.

The reference's detection path is `GroundedSAM(ontology, box_threshold=
0.35, text_threshold=0.25).predict(path)` (reference core_system.py:
220-224,266), which runs GroundingDINO for boxes then SAM for masks —
re-instantiating both models on every image (core_system.py:249). Here
both models load once, run as static-shape jits, and batch:

  image -> [resize 800x800, ImageNet norm] -> GroundingDINO -> boxes
        -> [longest-side-1024 SAM transform] -> SAM mask decoder -> masks

Thresholds follow the reference semantics: a query survives if its best
text-token sigmoid score exceeds `box_threshold`; its class is the
prompt whose token span scores highest, requiring > `text_threshold`.
Output is padded to `max_regions` (the reference caps at 50,
core_system.py:363) and unpadded into a `Regions` struct host-side.
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

try:
    import cv2
except ImportError:          # pragma: no cover
    cv2 = None

from ..config import DetectorConfig
from ..models.groundingdino import (
    GroundingDino, GroundingDinoConfig, convert_grounding_dino,
    generate_text_masks,
)
from ..models.sam import Sam, SamConfig, convert_sam
from .regions import Regions
from .wordpiece import WordPieceTokenizer

# GroundingDINO (DETR-family) image normalization
DINO_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
DINO_STD = np.array([0.229, 0.224, 0.225], np.float32)
# SAM pixel normalization (on 0-255 values)
SAM_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_STD = np.array([58.395, 57.12, 57.375], np.float32)


def load_torch_state_dict(path: str) -> dict:
    """Load a checkpoint directory or file (safetensors preferred)."""
    if os.path.isdir(path):
        for name in ("model.safetensors", "pytorch_model.bin"):
            p = os.path.join(path, name)
            if os.path.exists(p):
                path = p
                break
        else:
            raise FileNotFoundError(f"no checkpoint found under {path}")
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return dict(load_file(path))
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v for k, v in sd.items()}


class GroundedSamDetector:
    """BaseDetector backed by the JAX GroundingDINO + SAM stack."""

    def __init__(self, dino_params, sam_params, tokenizer: WordPieceTokenizer,
                 *, cfg: Optional[DetectorConfig] = None,
                 dino_cfg: Optional[GroundingDinoConfig] = None,
                 sam_cfg: Optional[SamConfig] = None,
                 dino_size: int = 800, text_len: int = 64):
        self.cfg = cfg or DetectorConfig()
        self.dino_cfg = dino_cfg or GroundingDinoConfig(dtype=self.cfg.dtype)
        self.sam_cfg = sam_cfg or SamConfig(dtype=self.cfg.dtype)
        self.dino = GroundingDino(self.dino_cfg)
        self.sam = Sam(self.sam_cfg)
        self.dino_params = dino_params
        self.sam_params = sam_params
        self.tokenizer = tokenizer
        self.dino_size = dino_size
        self.text_len = text_len

        @jax.jit
        def _dino_fwd(params, images, ids, attn, pos, token_mask):
            return self.dino.apply({"params": params}, images, ids, attn,
                                   pos, token_mask)

        @jax.jit
        def _sam_fwd(params, images, boxes):
            return self.sam.apply({"params": params}, images, boxes,
                                  multimask_output=False)

        self._dino_fwd = _dino_fwd
        self._sam_fwd = _sam_fwd

    @classmethod
    def from_pretrained(cls, dino_path: str, sam_path: str, vocab_path: str,
                        **kw) -> "GroundedSamDetector":
        """Load converted torch checkpoints from local directories
        (HF layout: model.safetensors / pytorch_model.bin + vocab.txt)."""
        cfg = kw.get("cfg") or DetectorConfig()
        dino_cfg = kw.pop("dino_cfg", None) or GroundingDinoConfig(
            dtype=cfg.dtype)
        sam_cfg = kw.pop("sam_cfg", None) or SamConfig(dtype=cfg.dtype)
        dino_params = convert_grounding_dino(
            load_torch_state_dict(dino_path), dino_cfg)
        sam_params = convert_sam(load_torch_state_dict(sam_path), sam_cfg)
        tok = WordPieceTokenizer(vocab_path)
        return cls(dino_params, sam_params, tok, dino_cfg=dino_cfg,
                   sam_cfg=sam_cfg, **kw)

    # ------------------------------------------------------------------

    def _prep_text(self, prompts: Sequence[str]):
        ids, spans = self.tokenizer.token_spans(prompts)
        n = self.text_len
        if len(ids) > n:
            ids = ids[:n - 1] + [self.tokenizer.sep_id]
            spans = [(s, min(e, n - 1)) for s, e in spans if s < n - 1]
        pad = n - len(ids)
        token_mask = np.zeros((1, n), bool)
        token_mask[0, :len(ids)] = True
        ids = np.asarray(ids + [0] * pad)[None]
        attn, pos = generate_text_masks(ids)
        # padding rows attend only to themselves (eye base) - fine
        return ids, attn, pos, token_mask, spans

    def _prep_dino_image(self, image: np.ndarray) -> np.ndarray:
        s = self.dino_size
        img = cv2.resize(image, (s, s), interpolation=cv2.INTER_LINEAR)
        x = img.astype(np.float32) / 255.0
        return ((x - DINO_MEAN) / DINO_STD)[None]

    def _prep_sam_image(self, image: np.ndarray):
        size = self.sam_cfg.vision.image_size
        h, w = image.shape[:2]
        scale = size / max(h, w)
        nh, nw = round(h * scale), round(w * scale)
        img = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
        x = (img.astype(np.float32) - SAM_MEAN) / SAM_STD
        out = np.zeros((size, size, 3), np.float32)
        out[:nh, :nw] = x
        return out[None], (nh, nw), scale

    def detect_batch(self, images: Sequence[np.ndarray],
                     prompts: Sequence[str]) -> list[Regions]:
        """Batched detection: one GroundingDINO forward for all images
        (bf16 batch-4 measured 40% faster per image than batch-1 fp32,
        PERF.md). SAM still runs per image (box counts vary)."""
        if not len(images):
            return []
        if cv2 is None:   # same clear error as detect(); this is the
            # path build_database takes, and a bare AttributeError from
            # _prep_dino_image gives the operator no hint
            raise RuntimeError("OpenCV required for detector preprocessing")
        ids, attn, pos, token_mask, spans = self._prep_text(prompts)
        b = len(images)
        dino_in = np.concatenate([self._prep_dino_image(im) for im in images])
        logits, boxes = self._dino_fwd(
            self.dino_params, jnp.asarray(dino_in),
            jnp.asarray(np.repeat(ids, b, axis=0)),
            jnp.asarray(np.repeat(attn, b, axis=0)),
            jnp.asarray(np.repeat(pos, b, axis=0)),
            jnp.asarray(np.repeat(token_mask, b, axis=0)))
        scores_b = jax.device_get(jax.nn.sigmoid(logits))
        boxes_b = jax.device_get(boxes)
        return [self._postprocess(images[j], scores_b[j], boxes_b[j],
                                  prompts, spans) for j in range(b)]

    def detect(self, image: np.ndarray, prompts: Sequence[str]) -> Regions:
        if cv2 is None:
            raise RuntimeError("OpenCV required for detector preprocessing")
        ids, attn, pos, token_mask, spans = self._prep_text(prompts)
        dino_in = self._prep_dino_image(image)

        logits, boxes = self._dino_fwd(
            self.dino_params, jnp.asarray(dino_in), jnp.asarray(ids),
            jnp.asarray(attn), jnp.asarray(pos), jnp.asarray(token_mask))
        scores = jax.device_get(jax.nn.sigmoid(logits))[0]   # [Q, T]
        boxes = jax.device_get(boxes)[0]                     # [Q, 4] cxcywh
        return self._postprocess(image, scores, boxes, prompts, spans)

    def _postprocess(self, image: np.ndarray, scores: np.ndarray,
                     boxes: np.ndarray, prompts: Sequence[str],
                     spans) -> Regions:
        h, w = image.shape[:2]

        best = np.nanmax(np.where(np.isfinite(scores), scores, 0.0), axis=-1)
        keep = np.nonzero(best > self.cfg.box_threshold)[0]
        keep = keep[np.argsort(-best[keep])][: self.cfg.max_regions]
        if keep.size == 0:
            return Regions.empty(h, w, list(prompts))

        # class per box: prompt whose token span scores highest
        cls_ids, confs, keep2 = [], [], []
        for q in keep:
            per_prompt = [scores[q, s:e].max() if e > s else 0.0
                          for s, e in spans]
            cid = int(np.argmax(per_prompt))
            if per_prompt[cid] <= self.cfg.text_threshold:
                continue
            cls_ids.append(cid)
            confs.append(float(best[q]))
            keep2.append(q)
        if not keep2:
            return Regions.empty(h, w, list(prompts))
        keep = np.asarray(keep2)

        # cxcywh [0,1] -> xyxy pixels in the original image
        b = boxes[keep]
        xy = np.stack([
            (b[:, 0] - b[:, 2] / 2) * w, (b[:, 1] - b[:, 3] / 2) * h,
            (b[:, 0] + b[:, 2] / 2) * w, (b[:, 1] + b[:, 3] / 2) * h,
        ], axis=1)
        xy[:, 0::2] = xy[:, 0::2].clip(0, w - 1)
        xy[:, 1::2] = xy[:, 1::2].clip(0, h - 1)

        masks = self._segment(image, xy)
        return Regions(
            boxes=xy.astype(np.float32),
            confidences=np.asarray(confs, np.float32),
            class_ids=np.asarray(cls_ids, np.int32),
            class_names=list(prompts),
            masks=masks,
        )

    def _segment(self, image: np.ndarray, boxes_xyxy: np.ndarray) -> np.ndarray:
        """SAM masks for xyxy boxes (original-image pixels)."""
        h, w = image.shape[:2]
        sam_in, (nh, nw), scale = self._prep_sam_image(image)
        # pad box count to a small set of static shapes to limit re-jits
        nb = len(boxes_xyxy)
        nb_pad = 1 << (nb - 1).bit_length() if nb > 1 else 1
        nb_pad = min(max(nb_pad, 1), self.cfg.max_regions)
        nb_pad = max(nb_pad, nb)
        boxes = np.zeros((1, nb_pad, 4), np.float32)
        boxes[0, :nb] = boxes_xyxy * scale

        mask_logits, _ = self._sam_fwd(self.sam_params, jnp.asarray(sam_in),
                                       jnp.asarray(boxes))
        mask_logits = jax.device_get(mask_logits)[0, :nb, 0]  # [NB, S/4, S/4]

        size = self.sam_cfg.vision.image_size
        out = np.zeros((nb, h, w), bool)
        for i, ml in enumerate(mask_logits):
            full = cv2.resize(ml, (size, size), interpolation=cv2.INTER_LINEAR)
            crop = full[:nh, :nw]
            m = cv2.resize(crop, (w, h), interpolation=cv2.INTER_LINEAR)
            out[i] = m > 0.0   # logit 0 == probability cfg.mask_threshold (0.5)
        return out
