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

        # Images cross host->device as RESIZED uint8; normalization
        # runs inside the jit (fp32, identical math to the former host
        # pass). This quarters the per-image transfer — ~20 MB/img of
        # f32 to ~5 MB (DINO 800px + SAM 1024px) — which is the
        # difference between PCIe noise on a real host and the
        # dominant cost through this environment's ~100 MB/s tunnel.
        @jax.jit
        def _dino_fwd(params, images_u8, ids, attn, pos, token_mask):
            x = images_u8.astype(jnp.float32) / 255.0
            x = (x - DINO_MEAN) / DINO_STD
            return self.dino.apply({"params": params}, x, ids, attn,
                                   pos, token_mask)

        # Mask transfer format: thresholded BITS by default. The old
        # path shipped fp32 logits [B, NB, 1, S/4, S/4] down the tunnel
        # (~2 MB/img at 8 boxes — the largest single download in the
        # region-ingest loop, EVAL.md accounting); thresholding at the
        # decoder's native S/4 grid in-jit and bit-packing cuts that
        # 32x (~64 KB/img). The boundary placed by bilinearly
        # upsampling the 0/1 indicator differs from the logits' true
        # zero crossing by at most half a decoder cell (~2 px on the
        # 1024 canvas, sub-pixel after the resize to image space);
        # tests pin IoU vs the logits path. REVERSO_MASK_LOGITS=1
        # restores the exact legacy transfer.
        # fixed at construction (the jit traces it as a constant —
        # flipping the attribute later would desync jit and host)
        self.mask_bits = os.environ.get("REVERSO_MASK_LOGITS", "0") != "1"
        mask_bits = self.mask_bits

        @jax.jit
        def _sam_fwd(params, images_u8, boxes, nh, nw):
            # normalize, then zero the pad ring AFTER normalization
            # (SAM's transform pads the normalized image with zeros);
            # nh/nw are [B] per-image valid extents
            x = (images_u8.astype(jnp.float32) - SAM_MEAN) / SAM_STD
            b, s = images_u8.shape[0], images_u8.shape[1]
            row = jax.lax.broadcasted_iota(jnp.int32, (b, s, s, 1), 1)
            col = jax.lax.broadcasted_iota(jnp.int32, (b, s, s, 1), 2)
            nh_ = nh.reshape(b, 1, 1, 1)
            nw_ = nw.reshape(b, 1, 1, 1)
            x = jnp.where((row < nh_) & (col < nw_), x, 0.0)
            logits, iou = self.sam.apply({"params": params}, x, boxes,
                                         multimask_output=False)
            if not mask_bits:
                return logits, iou
            # logit 0 == probability cfg.mask_threshold (0.5); pack 8
            # grid columns per byte, big-endian to match np.unpackbits
            m = logits[:, :, 0] > 0.0            # [B, NB, S4, S4]
            b_, nb, s4 = m.shape[0], m.shape[1], m.shape[2]
            w8 = jnp.asarray(1 << np.arange(8)[::-1], jnp.uint32)
            packed = (m.reshape(b_, nb, s4, s4 // 8, 8)
                      .astype(jnp.uint32) * w8).sum(-1).astype(jnp.uint8)
            return packed, iou

        # Score reduction in-jit: _select_boxes only ever consumes the
        # per-query best over tokens and the per-(query, prompt) span
        # max — downloading those ([B,Q] + [B,Q,P] + boxes, ~25 KB/img)
        # instead of the full sigmoid grid ([B,Q,L] fp32, ~230 KB/img)
        # is another ~10x off the region-ingest tunnel bill. Semantics
        # match the former host math exactly: best sanitizes non-finite
        # scores to 0, span maxes are raw (empty spans report 0.0).
        @jax.jit
        def _dino_reduce(logits, span_mask):
            s = jax.nn.sigmoid(logits)                       # [B, Q, L]
            sane = jnp.where(jnp.isfinite(s), s, 0.0)
            best = sane.max(-1)                              # [B, Q]
            sm = jnp.where(span_mask[None, None], s[:, :, None, :],
                           -jnp.inf).max(-1)                 # [B, Q, P]
            has = span_mask.any(-1)
            sm = jnp.where(has[None, None], sm, 0.0)
            return best, sm

        self._dino_fwd = _dino_fwd
        self._dino_reduce = _dino_reduce
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
        """Resized uint8 [1, S, S, 3] — normalization happens in-jit
        (see _dino_fwd) so only u8 bytes cross to the device."""
        s = self.dino_size
        img = cv2.resize(image, (s, s), interpolation=cv2.INTER_LINEAR)
        return np.ascontiguousarray(img, np.uint8)[None]

    def _prep_sam_image(self, image: np.ndarray):
        """Longest-side-resized uint8 in a [1, size, size, 3] zero
        canvas; normalization + pad-ring zeroing happen in-jit."""
        size = self.sam_cfg.vision.image_size
        h, w = image.shape[:2]
        scale = size / max(h, w)
        nh, nw = round(h * scale), round(w * scale)
        img = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
        out = np.zeros((size, size, 3), np.uint8)
        out[:nh, :nw] = img
        return out[None], (nh, nw), scale

    # DINO micro-batch: batch-4 was the measured sweet spot (PERF.md);
    # the ingest batch (64 images for the embed stage) chunks down to
    # this so detection never compiles giant batch shapes or stages
    # hundreds of MB per forward. Partial chunks pad by repeating the
    # first image (one compile shape) and drop the pad results.
    dino_batch: int = 4

    # SAM micro-batch: images segment in chunks of this many through
    # ONE forward (per-image nh/nw masking in-jit), quartering the
    # per-image dispatch+sync overhead vs the former per-image calls.
    sam_batch: int = 4

    def detect_batch(self, images: Sequence[np.ndarray],
                     prompts: Sequence[str]) -> list[Regions]:
        """Batched detection: GroundingDINO forwards in `dino_batch`
        chunks (bf16 batch-4 measured 40% faster per image than
        batch-1 fp32, PERF.md), then SAM forwards batched in
        `sam_batch` chunks over the images that kept boxes."""
        if not len(images):
            return []
        if cv2 is None:   # same clear error as detect(); this is the
            # path build_database takes, and a bare AttributeError from
            # _prep_dino_image gives the operator no hint
            raise RuntimeError("OpenCV required for detector preprocessing")
        ids, attn, pos, token_mask, spans = self._prep_text(prompts)
        sels: list = []
        cb = max(1, int(self.dino_batch))
        text = None
        # two-phase: dispatch every DINO chunk first (jax dispatch is
        # async — later chunks compute while earlier results drain),
        # then device_get + host postprocess in order
        pending = []
        for lo in range(0, len(images), cb):
            chunk = list(images[lo:lo + cb])
            b = len(chunk)
            # ALWAYS pad to the full chunk: one DINO compile shape
            # serves builds AND single-image queries (a separate b=1
            # shape would cost its own 30-180 s remote compile on the
            # first interactive query; ~3x redundant FLOPs on a lone
            # image is noise next to that)
            pad = cb - b
            dino_in = np.concatenate(
                [self._prep_dino_image(im) for im in chunk]
                + [self._prep_dino_image(chunk[0])] * pad)
            if text is None:
                text = tuple(jnp.asarray(np.repeat(a, cb, axis=0))
                             for a in (ids, attn, pos, token_mask))
                # logits pad to max_text_len (contrastive_logits), not
                # the tokenized length — mask at the padded width
                span_mask = np.zeros(
                    (len(spans), self.dino_cfg.max_text_len), bool)
                for p, (s0, e0) in enumerate(spans):
                    span_mask[p, s0:e0] = True
                span_mask = jnp.asarray(span_mask)
            logits, boxes = self._dino_fwd(
                self.dino_params, jnp.asarray(dino_in), *text)
            best, smax = self._dino_reduce(logits, span_mask)
            pending.append((chunk, best, smax, boxes))
        for chunk, best, smax, boxes in pending:
            best_b = jax.device_get(best)
            smax_b = jax.device_get(smax)
            boxes_b = jax.device_get(boxes)
            sels.extend(self._select_boxes(chunk[j], best_b[j],
                                           smax_b[j], boxes_b[j])
                        for j in range(len(chunk)))

        # SAM batched over the images that kept any box — same
        # two-phase dispatch/drain so mask upsampling of group g
        # overlaps group g+1's forward
        names = list(prompts)
        out: list[Optional[Regions]] = [None] * len(images)
        todo = [i for i, s in enumerate(sels) if s is not None]
        sb = max(1, int(self.sam_batch))
        handles = []
        for lo in range(0, len(todo), sb):
            grp = todo[lo:lo + sb]
            # always pad to the full SAM batch: one compile shape per
            # nb_pad bucket serves builds AND single-image queries
            # (same policy as the DINO chunks above)
            handles.append((grp, self._segment_dispatch(
                [images[i] for i in grp], [sels[i][0] for i in grp],
                pad_to=sb)))
        for grp, handle in handles:
            for i, masks in zip(grp, self._segment_finish(handle)):
                xy, confs, cls_ids = sels[i]
                # fresh list per image: results must not alias one
                # mutable class_names (a caller editing one would edit
                # all)
                out[i] = Regions(boxes=xy, confidences=confs,
                                 class_ids=cls_ids,
                                 class_names=list(names), masks=masks)
        for i, s in enumerate(sels):
            if s is None:
                h, w = images[i].shape[:2]
                out[i] = Regions.empty(h, w, list(names))
        return out

    def detect(self, image: np.ndarray, prompts: Sequence[str]) -> Regions:
        """Single-image detection — routed through detect_batch so the
        interactive query path reuses the exact compiled shapes the
        build path warmed (DINO pads to dino_batch)."""
        return self.detect_batch([image], prompts)[0]

    def _select_boxes(self, image: np.ndarray, best: np.ndarray,
                      span_max: np.ndarray, boxes: np.ndarray):
        """Threshold + class-assign DINO outputs for one image from
        the in-jit reductions (`_dino_reduce`): best [Q] = sanitized
        max sigmoid over tokens, span_max [Q, P] = raw per-prompt span
        maxes. Returns (xy [nb, 4] f32 pixel boxes, confs [nb] f32,
        cls_ids [nb] i32) or None when nothing survives. Split from
        _postprocess so detect_batch can run SAM batched across
        images."""
        h, w = image.shape[:2]

        keep = np.nonzero(best > self.cfg.box_threshold)[0]
        keep = keep[np.argsort(-best[keep])][: self.cfg.max_regions]
        if keep.size == 0:
            return None

        # class per box: prompt whose token span scores highest
        cls_ids, confs, keep2 = [], [], []
        for q in keep:
            cid = int(np.argmax(span_max[q]))
            if span_max[q, cid] <= self.cfg.text_threshold:
                continue
            cls_ids.append(cid)
            confs.append(float(best[q]))
            keep2.append(q)
        if not keep2:
            return None
        keep = np.asarray(keep2)

        # cxcywh [0,1] -> xyxy pixels in the original image
        b = boxes[keep]
        xy = np.stack([
            (b[:, 0] - b[:, 2] / 2) * w, (b[:, 1] - b[:, 3] / 2) * h,
            (b[:, 0] + b[:, 2] / 2) * w, (b[:, 1] + b[:, 3] / 2) * h,
        ], axis=1)
        xy[:, 0::2] = xy[:, 0::2].clip(0, w - 1)
        xy[:, 1::2] = xy[:, 1::2].clip(0, h - 1)
        return (xy.astype(np.float32), np.asarray(confs, np.float32),
                np.asarray(cls_ids, np.int32))

    def _segment_batch(self, images: Sequence[np.ndarray],
                       boxes_list: Sequence[np.ndarray], *,
                       pad_to: int = 0) -> list[np.ndarray]:
        """SAM masks for several images in ONE forward. `boxes_list[j]`
        is [nb_j, 4] xyxy in image-j pixels; box counts pad to a shared
        pow2 bucket (small static-shape set), partial image groups pad
        to `pad_to` by repeating image 0 (one compile shape per
        (batch, nb_pad) pair; pad results dropped). Returns one
        [nb_j, h_j, w_j] bool mask stack per image."""
        return self._segment_finish(
            self._segment_dispatch(images, boxes_list, pad_to=pad_to))

    def _segment_dispatch(self, images, boxes_list, *, pad_to: int = 0):
        """Async half of _segment_batch: prep + dispatch the SAM
        forward, return a handle for _segment_finish (dispatch is
        async, so several groups can be in flight)."""
        bs = len(images)
        pad = max(0, pad_to - bs)
        preps = [self._prep_sam_image(im) for im in images]
        nb_max = max((len(b) for b in boxes_list), default=1)
        # pad box count to a small set of static shapes to limit re-jits
        nb_pad = 1 << (nb_max - 1).bit_length() if nb_max > 1 else 1
        nb_pad = min(max(nb_pad, 1), max(self.cfg.max_regions, nb_max))
        nb_pad = max(nb_pad, nb_max)
        sam_in = np.concatenate([p[0] for p in preps]
                                + [preps[0][0]] * pad)
        boxes = np.zeros((bs + pad, nb_pad, 4), np.float32)
        for j, bx in enumerate(boxes_list):
            boxes[j, :len(bx)] = np.asarray(bx, np.float32) * preps[j][2]
        nh = np.asarray([p[1][0] for p in preps]
                        + [preps[0][1][0]] * pad, np.int32)
        nw = np.asarray([p[1][1] for p in preps]
                        + [preps[0][1][1]] * pad, np.int32)
        mask_logits, _ = self._sam_fwd(self.sam_params, jnp.asarray(sam_in),
                                       jnp.asarray(boxes),
                                       jnp.asarray(nh), jnp.asarray(nw))
        return (mask_logits, images, boxes_list, preps)

    def _segment_finish(self, handle) -> list[np.ndarray]:
        mask_dev, images, boxes_list, preps = handle
        mask_dev = jax.device_get(mask_dev)
        size = self.sam_cfg.vision.image_size
        if self.mask_bits:
            # [B, NB, S4, S4//8] packed bits -> 0/255 u8 grids (u8
            # bilinear resizes are also ~2-4x cheaper than f32 ones)
            grids = np.unpackbits(mask_dev, axis=-1) * np.uint8(255)
        out = []
        for j, image in enumerate(images):
            h, w = image.shape[:2]
            nh_j, nw_j = preps[j][1]
            nb = len(boxes_list[j])
            masks = np.zeros((nb, h, w), bool)
            for i in range(nb):
                if self.mask_bits:
                    full = cv2.resize(grids[j, i], (size, size),
                                      interpolation=cv2.INTER_LINEAR)
                    crop = full[:nh_j, :nw_j]
                    m = cv2.resize(crop, (w, h),
                                   interpolation=cv2.INTER_LINEAR)
                    # 127 == the indicator's 0.5 level == logit 0
                    masks[i] = m > 127
                else:
                    full = cv2.resize(mask_dev[j, i, 0], (size, size),
                                      interpolation=cv2.INTER_LINEAR)
                    crop = full[:nh_j, :nw_j]
                    m = cv2.resize(crop, (w, h),
                                   interpolation=cv2.INTER_LINEAR)
                    # logit 0 == probability cfg.mask_threshold (0.5)
                    masks[i] = m > 0.0
            out.append(masks)
        return out
