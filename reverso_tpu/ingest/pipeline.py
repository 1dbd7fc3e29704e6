"""The index-build pipeline: folder -> detect -> embed -> normalize -> append.

Rebuilds the reference's `create_database` hot loop
(reference core_system.py:461-648) the TPU way:

  * images load + preprocess in host threads while the device embeds the
    previous batch (the reference runs strictly serial, batch size 1);
  * embeddings append to the durable `VectorStore` as they are produced —
    no giant in-memory partial list, and resume actually works (the
    reference's checkpoint was broken: missing json/datetime imports and
    unserializable tensors, SURVEY.md §5.4);
  * cooperative stop via a flag checked between batches (reference
    `request_stop`, core_system.py:457-459,542-545);
  * per-image fault tolerance: unreadable files log and are marked
    processed (reference core_system.py:585-591).

Checkpoint design: a JSON manifest (processed file list + durable store
row count) under `<root>/checkpoints/<name>_checkpoint.json` (the
reference's path scheme, core_system.py:476). On resume the store is
truncated to the manifest count, rolling back any torn batch.
"""
from __future__ import annotations

import json
import os
import threading
import time
import uuid
from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import numpy as np

from ..config import EngineConfig
from ..detect.regions import Regions, parse_prompts
from ..store.persist import (StoreError, StoreLockedError, VectorStore,
                             lock_holder_alive, unlock_database)
from ..utils.logging import StatusLog
from ..utils.profiling import Metrics, StageTimer
from .images import scan_images, iter_batches


def checkpoint_path(root: str, name: str) -> str:
    return os.path.join(root, "checkpoints", f"{name}_checkpoint.json")


def _save_checkpoint(root: str, name: str, processed: Sequence[str],
                     store_count: int, folder: str) -> None:
    path = checkpoint_path(root, name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({
            "processed_files": sorted(processed),
            "store_count": store_count,
            "database_name": name,
            "folder_path": folder,
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }, f)
    os.replace(tmp, path)


def _load_checkpoint(root: str, name: str) -> Optional[dict]:
    path = checkpoint_path(root, name)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return None


def direct_pe_metadata(width: int, height: int) -> dict:
    """Whole-image metadata (reference core_system.py:450-453)."""
    return {
        "region_id": str(uuid.uuid4()),
        "bbox": [0, 0, width, height],
        "area_ratio": 1.0,
        "detection_index": 0,
        "confidence": 1.0,
        "detected_class": "full_image",
    }


def region_metadata(regions: Regions, i: int) -> Optional[dict]:
    """Per-region metadata from a mask (reference core_system.py:398-418).
    Returns None for empty masks (skipped, core_system.py:402-404)."""
    meta = {
        "region_id": str(uuid.uuid4()),
        "detection_index": i,
        "confidence": float(regions.confidences[i]),
        "detected_class": regions.class_name(i),
    }
    if regions.masks is None or i >= len(regions.masks):
        # missing mask -> global embedding fallback (core_system.py:368-389)
        meta.update({"bbox": None, "area_ratio": 1.0,
                     "mask_status": "missing_or_unavailable"})
        return meta
    mask = regions.masks[i]
    mask_b = mask > 0.5 if mask.dtype != bool else mask
    # bbox via row/col any + argmax from both ends: one vectorized
    # pass instead of np.where materializing every foreground
    # coordinate (75 -> ~8 ms/img at 8 full-res masks, PERF round 4);
    # results identical to the where/min/max formulation
    rows = mask_b.any(axis=1)
    if not rows.any():
        return None
    cols = mask_b.any(axis=0)
    y0 = int(np.argmax(rows)); y1 = len(rows) - 1 - int(np.argmax(rows[::-1]))
    x0 = int(np.argmax(cols)); x1 = len(cols) - 1 - int(np.argmax(cols[::-1]))
    meta.update({
        "bbox": [x0, y0, x1, y1],
        "area_ratio": float(int(mask_b.sum()) / mask_b.size),
        "mask_status": "processed",
    })
    return meta


@dataclass
class BuildResult:
    transcript: str
    processed: int
    failed: int
    total_embeddings: int
    stopped: bool = False


def build_database(
    encoder,                       # PerceptionEncoder
    folder_path: str,
    database_name: str,
    *,
    config: EngineConfig,
    text_prompt: str = "person . car . building",
    use_direct_pe: bool = False,
    detector=None,
    progress_callback: Optional[Callable] = None,
    resume_from_checkpoint: bool = False,
    include_subfolders: bool = False,
    stop_event: Optional[threading.Event] = None,
    metrics: Optional[Metrics] = None,
) -> BuildResult:
    """Build (or resume) a searchable database from an image folder."""
    log = StatusLog(progress_callback)
    stop_event = stop_event or threading.Event()
    stop_event.clear()   # a stale stop from a cancelled run must not abort
    timer = StageTimer(metrics or Metrics())
    root = config.store.root_dir
    os.makedirs(root, exist_ok=True)

    # --- resume / create store ------------------------------------------
    # Resume must NEVER fall through to the destructive create(overwrite=
    # True): a crashed build leaves .lock behind, and wiping the store on
    # the recovery path would discard exactly the work resume exists to
    # save. A lock whose owning PID is dead is taken over; a live owner
    # aborts with the reference's unlock message (core_system.py:137-154).
    processed_files: set[str] = set()
    store: Optional[VectorStore] = None
    if resume_from_checkpoint:
        ck = _load_checkpoint(root, database_name)
        if ck is None:
            # No checkpoint: either the previous build COMPLETED (the
            # checkpoint is removed on success) or none ever ran. If a
            # store exists, falling through to create(overwrite=True)
            # would rmtree the finished database — exactly the work
            # --resume exists to protect. Refuse; an explicit
            # non-resume run is the way to rebuild.
            try:
                existing = VectorStore.open(root, database_name)
            except StoreError:
                existing = None
            if existing is not None:
                log(f"ℹ️ Nothing to resume: no checkpoint, and "
                    f"database '{database_name}' already exists "
                    f"({existing.count} embeddings — the previous "
                    f"build completed). Run without resume to "
                    f"rebuild it from scratch.")
                return BuildResult(log.text, 0, 0, existing.count)
        if ck is not None:
            try:
                store = VectorStore.open(root, database_name, writable=True)
            except StoreLockedError:
                if lock_holder_alive(root, database_name) is False:
                    unlock_database(root, database_name)
                    log("🔓 Removed stale lock left by an interrupted build")
                    store = VectorStore.open(root, database_name,
                                             writable=True)
                else:
                    log(f"❌ Database '{database_name}' is locked by a "
                        "running process. Stop it or unlock the "
                        "database first.")
                    return BuildResult(log.text, 0, 0, 0)
            except StoreError as e:
                # Store dir missing/corrupt: nothing recoverable remains.
                log(f"⚠️ Checkpoint exists but store is unusable ({e}). "
                    "Starting fresh.")
                store = None
            if store is not None:
                try:
                    store.truncate(min(int(ck.get("store_count", 0)),
                                       store.count))
                    processed_files = set(ck.get("processed_files", []))
                except Exception as e:
                    store.close()
                    log(f"❌ Error applying checkpoint: {e}. The store "
                        "was left untouched; delete the checkpoint to "
                        "start fresh.")
                    return BuildResult(log.text, 0, 0, 0)
                log(f"📋 Resuming from checkpoint: {len(processed_files)} "
                    "files already processed")
    if store is None:
        try:
            store = VectorStore.create(root, database_name,
                                       encoder.embed_dim, overwrite=True)
        except StoreLockedError:
            log(f"❌ Database '{database_name}' is locked (a build may "
                "be running). Unlock it first to overwrite.")
            return BuildResult(log.text, 0, 0, 0)

    log(f"📁 Creating database '{database_name}' from {folder_path}")

    files = scan_images(folder_path, include_subfolders=include_subfolders,
                        extensions=config.ingest.image_extensions)
    if not files:
        store.close()
        log(f"❌ No images found in {folder_path}")
        return BuildResult(log.text, 0, 0, 0)

    todo = [f for f in files if f not in processed_files]
    if resume_from_checkpoint and not todo:
        store.close()
        log("✅ All files already processed. Database is complete.")
        return BuildResult(log.text, 0, 0, store.count)

    log(f"📊 Found {len(todo)} images to process", 0.1)
    if include_subfolders:
        log("📂 Including images from subfolders")
    log(f"🔧 Processing mode: {'Direct PE' if use_direct_pe else 'Detection + PE'}")
    log(f"📂 Database will be stored at: {store.path}")

    prompts = parse_prompts(text_prompt, config.detector.default_prompt)
    size = config.model.image_size
    batch_size = config.ingest.batch_size
    processed = failed = 0
    since_checkpoint = 0
    stopped = False

    def embed_dispatch(pixels):
        """Dispatch the embed at ONE fixed batch shape: tail batches
        and batches shrunk by unreadable files pad up to batch_size,
        so the whole build reuses a single jit compile (each fresh
        shape costs a 30-180 s remote compile on this setup — the IVF
        split loop learned this the hard way, CLAUDE.md). Returns the
        DEVICE array — dispatch is async, so in region mode the ViT
        forward runs underneath the detect stage and only the final
        np.asarray pays wall time."""
        b = pixels.shape[0]
        if b < batch_size:
            pad = np.zeros((batch_size - b,) + pixels.shape[1:],
                           pixels.dtype)
            pixels = np.concatenate([pixels, pad])
        return encoder.encode_image(pixels)[:b]

    def embed_padded(pixels):
        return np.asarray(embed_dispatch(pixels))

    def checkpoint():
        store.flush()
        _save_checkpoint(root, database_name, processed_files, store.count,
                         folder_path)

    try:
        for batch in iter_batches(todo, size, batch_size,
                                  keep_originals=not use_direct_pe,
                                  backend=config.ingest.decode_backend):
            if stop_event.is_set():
                log("🛑 Stop requested. Saving progress...")
                checkpoint()
                stopped = True
                break

            for path, err in batch.failed:
                log(f"❌ Error processing {os.path.basename(path)}: {err}")
                failed += 1
                processed_files.add(path)

            if not batch.paths:
                continue

            done_frac = 0.1 + 0.7 * (processed + failed) / max(len(todo), 1)
            log(f"🔄 Processing batch of {len(batch.paths)} "
                f"({processed + len(batch.paths)}/{len(todo)})", done_frac)

            if use_direct_pe:
                with timer.stage("embed", len(batch.paths)):
                    emb = embed_padded(batch.pixels)
                metas = []
                for j, path in enumerate(batch.paths):
                    w, h = batch.sizes[j]
                    m = direct_pe_metadata(w, h)
                    m["image_source"] = path
                    m["filename"] = os.path.basename(path)
                    m["original_region_id"] = m["region_id"]
                    m["region_id"] = str(uuid.uuid4())
                    metas.append(m)
                with timer.stage("append", len(metas)):
                    store.append(emb, metas)
            else:
                if detector is None:
                    store.close()
                    raise RuntimeError(
                        "Region mode needs a detector; pass detector= or "
                        "use_direct_pe=True")
                # compat mode: whole-image embedding shared per region
                # (reference core_system.py:406); region mode: fused
                # masked-ROI per-region embeddings.
                roi_mode = config.ingest.region_embed_mode == "region"
                emb = None
                emb_dev = None
                if not roi_mode:
                    # dispatch BEFORE detect: jax dispatch is async, so
                    # the whole-image ViT forward computes underneath
                    # the detect stage's tunnel/host time; the one
                    # np.asarray in global_emb then finds it finished
                    # (the "embed" stage records dispatch + that sync)
                    with timer.stage("embed", len(batch.paths)):
                        emb_dev = embed_dispatch(batch.pixels)

                def global_emb(j):
                    # roi mode needs the whole-image embedding only for
                    # the rare mask-less fallback rows; computing it
                    # lazily (once per batch, same padded shape) avoids
                    # a second full ViT forward per image when every
                    # region has a mask
                    nonlocal emb, emb_dev
                    if emb is None:
                        # compat mode already counted this batch's
                        # images at the dispatch-side stage; only the
                        # roi-mode lazy fallback counts here
                        n_items = 0 if emb_dev is not None \
                            else len(batch.paths)
                        with timer.stage("embed", n_items):
                            if emb_dev is None:
                                emb_dev = embed_dispatch(batch.pixels)
                            emb = np.asarray(emb_dev)
                    return emb[j]

                vecs, metas = [], []
                with timer.stage("detect", len(batch.paths)):
                    # Detect on the ORIGINAL-resolution images: bboxes,
                    # masks, and area_ratios land in original pixel space
                    # (reference payload semantics, core_system.py:253-266,
                    # 413-418) and ingest-time detection agrees with the
                    # query path (engine.detect_regions).
                    imgs_u8 = batch.originals
                    if hasattr(detector, "detect_batch"):
                        regions_list = detector.detect_batch(imgs_u8, prompts)
                    else:
                        regions_list = [detector.detect(im, prompts)
                                        for im in imgs_u8]
                # per-image embed/metadata assembly runs OUTSIDE the
                # detect stage so the nested embed/roi_embed timers
                # aren't double-counted into it
                roi_handle = None
                if roi_mode:
                    # ONE batched ROI forward for the whole ingest
                    # batch, with masks pooled onto the patch grid
                    # host-side: the former per-image launches each
                    # uploaded ~3.6 MB of f32 pixel masks and paid a
                    # dispatch+sync round trip — ~200 ms/img of the
                    # ROI e2e bill through the tunnel (EVAL.md);
                    # pooled grids are ~18 KB/img and one launch
                    # serves the batch. Region dim pads to a pow2
                    # bucket (the jit specializes on R; per-image
                    # counts would compile up to 50 remote shapes).
                    # The forward is DISPATCHED here (async) and
                    # synced once after metadata assembly, so the ViT
                    # computes underneath the host-side bbox/uuid
                    # work.
                    ns = [min(len(r), config.ingest.max_regions)
                          if r.masks is not None else 0
                          for r in regions_list]
                    nmax = max(ns, default=0)
                    if nmax > 0:
                        rb = 1 << (nmax - 1).bit_length()
                        with timer.stage("roi_embed", len(batch.paths)):
                            pooled = encoder.pool_masks(
                                [r.masks if r.masks is not None
                                 else [] for r in regions_list], rb)
                            _, roi_handle = encoder.encode_regions(
                                batch.pixels, pooled)
                roi_slots = []        # (vecs index, image j, region i)
                for j, path in enumerate(batch.paths):
                    regions = regions_list[j]
                    n = min(len(regions), config.ingest.max_regions)
                    use_roi = (roi_handle is not None
                               and regions.masks is not None and n > 0)
                    kept = 0
                    for i in range(n):
                        meta = region_metadata(regions, i)
                        if meta is None:
                            continue
                        if meta["bbox"] is None:
                            w, h = batch.sizes[j]
                            meta["bbox"] = [0, 0, w, h]
                        meta["image_source"] = path
                        meta["filename"] = os.path.basename(path)
                        meta["original_region_id"] = meta["region_id"]
                        meta["region_id"] = str(uuid.uuid4())
                        if use_roi:
                            vecs.append(None)
                            roi_slots.append((len(vecs) - 1, j, i))
                        else:
                            vecs.append(global_emb(j))
                        metas.append(meta)
                        kept += 1
                    if kept == 0:
                        log(f"⚠️ No regions found in {os.path.basename(path)}, skipping")
                if roi_slots:
                    with timer.stage("roi_embed", 0):   # the sync half
                        roi_all = np.asarray(roi_handle)
                    for vi, j, i in roi_slots:
                        vecs[vi] = roi_all[j][i]
                if metas:
                    with timer.stage("append", len(metas)):
                        store.append(np.stack(vecs), metas)

            processed += len(batch.paths)
            for path in batch.paths:
                processed_files.add(path)
            since_checkpoint += len(batch.paths)
            if since_checkpoint >= config.ingest.checkpoint_every:
                checkpoint()
                since_checkpoint = 0

        if not stopped:
            m = timer.metrics
            if m.seconds.get("embed"):
                log(f"⏱️ embed: {m.counts['embed']} images in "
                    f"{m.seconds['embed']:.1f}s ({m.rate('embed'):.1f} img/s)")
            if m.seconds.get("detect"):
                log(f"⏱️ detect: {m.counts['detect']} images in "
                    f"{m.seconds['detect']:.1f}s ({m.rate('detect'):.1f} img/s)")
            if store.count == 0:
                log("❌ No embeddings extracted from any images")
                result = BuildResult(log.text, processed, failed, 0)
                store.close()
                return result
            store.flush()
            ck = checkpoint_path(root, database_name)
            if os.path.exists(ck):
                os.remove(ck)
                log("🧹 Cleaned up checkpoint file")
            log("\n📊 Final Summary:", 0.9)
            log(f"✅ Successfully processed: {processed} images")
            if failed:
                log(f"⚠️ Failed to process: {failed} images")
            log(f"🔍 Total embeddings stored: {store.count}")
            log(f"🎯 Database '{database_name}' ready for searching!", 1.0)
    finally:
        total = store.count
        store.close()
        stop_event.clear()

    transcript = log.text
    if stopped:
        transcript += "\n\n⏸️ Processing stopped. You can resume later."
    return BuildResult(transcript, processed, failed, total, stopped)
