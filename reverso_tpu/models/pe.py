"""PerceptionEncoder: the engine-facing embedding model.

Wraps the flax VisionTransformer with the reference's `encode_image`
semantics (reference core_system.py:320-455): batched image -> embedding,
mean-pool fallback for token-format outputs, fp32 L2 normalization. The
forward is jitted once per (batch shape, config) and runs bf16 on TPU.
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    import cv2
except ImportError:          # pragma: no cover
    cv2 = None

from ..config import ModelConfig, MODEL_PRESETS
from ..ops.norm import l2_normalize
from .vit import VisionTransformer

# Per-family architectural quirks not captured by ModelConfig's size fields.
# pad_seq stays off by default: measured slower on v5e (the +11% padded
# LN/MLP rows cost more than the saved per-layer pad/slice, PERF.md).
_FAMILY_KW = {
    "pe": dict(act="gelu", use_ln_pre=False, patch_bias=True),
    "clip": dict(act="quick_gelu", use_ln_pre=True, patch_bias=False),
}

# CLIP/PE preprocessing constants (the reference uses perception_models'
# 336 px transform, core_system.py:200: resize + center crop + normalize).
IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class PerceptionEncoder:
    """Batched image -> embedding model.

    With `mesh=`, batches are data-parallel over the mesh's "data" axis
    (params replicated): the throughput scale-out the reference's serial
    batch-1 loop never had (SURVEY.md §2.3 DP row). Batches are padded up
    to a multiple of the axis size.
    """

    def __init__(self, cfg: ModelConfig, *, family: str = "pe",
                 params: Optional[Any] = None, seed: int = 0,
                 use_flash: Optional[bool] = None, mesh=None,
                 data_axis: str = "data", quant: Optional[str] = None):
        if quant is not None and quant != cfg.quant:
            # opt-in int8 compute knob (same param tree, so params from
            # a bf16 tower load unchanged) — see ModelConfig.quant
            import dataclasses as _dc
            cfg = _dc.replace(cfg, quant=quant)
        self.cfg = cfg
        self.family = family
        self.mesh = mesh
        self.data_axis = data_axis
        kw = dict(_FAMILY_KW[family])
        if use_flash is not None:
            kw["use_flash"] = use_flash
        self.module = VisionTransformer(cfg, **kw)
        if params is None:
            dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3),
                              jnp.float32)
            params = jax.jit(self.module.init)(
                jax.random.PRNGKey(seed), dummy)["params"]
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            params = jax.device_put(
                params, NamedSharding(mesh, P()))
            self._batch_sharding = NamedSharding(mesh, P(data_axis))
        else:
            self._batch_sharding = None
        self.params = params

        @functools.partial(jax.jit, static_argnames=("return_tokens",))
        def _fwd(params, images, return_tokens=False):
            out = self.module.apply({"params": params}, images,
                                    return_tokens=return_tokens)
            # The barrier stops XLA from fusing the fp32 normalize into the
            # bf16 projection (with --xla_allow_excess_precision the fused
            # form recomputes operands in bf16 and norms drift to ~5e-4).
            if return_tokens:
                pooled, tokens = out
                pooled = jax.lax.optimization_barrier(pooled)
                return l2_normalize(pooled.astype(jnp.float32)), tokens
            out = jax.lax.optimization_barrier(out)
            return l2_normalize(out.astype(jnp.float32))

        self._fwd = _fwd

        @jax.jit
        def _fwd_regions(params, images, patch_masks):
            pooled, regions = self.module.apply(
                {"params": params}, images, region_masks=patch_masks)
            pooled = jax.lax.optimization_barrier(pooled)
            regions = jax.lax.optimization_barrier(regions)
            return (l2_normalize(pooled.astype(jnp.float32)),
                    l2_normalize(regions.astype(jnp.float32)))

        self._fwd_regions = _fwd_regions

    @classmethod
    def from_preset(cls, name: str, **kw) -> "PerceptionEncoder":
        return cls(MODEL_PRESETS[name], **kw)

    @classmethod
    def from_torch(cls, path: str, cfg: ModelConfig, *,
                   scheme: str = "auto", family: Optional[str] = None,
                   **kw) -> "PerceptionEncoder":
        """Convert a torch CLIP/PE vision checkpoint (HF dir, .safetensors
        or .bin/.pt) and load it — the reference's pretrained=True path
        (core_system.py:181) without torch at serving time afterwards."""
        from ..detect.grounded import load_torch_state_dict
        from .convert import convert_vision_tower

        params = convert_vision_tower(load_torch_state_dict(path), cfg,
                                      scheme=scheme)
        if family is None:
            # PE-Core towers use 2D RoPE + plain gelu; CLIP towers use
            # abs-pos only + quick_gelu + pre-LN.
            family = "pe" if cfg.use_rope else "clip"
        return cls(cfg, family=family, params=params, **kw)

    @classmethod
    def from_checkpoint(cls, path: str, cfg: Optional[ModelConfig] = None,
                        **kw) -> "PerceptionEncoder":
        """Load converted params saved by scripts/fetch_weights.py
        (msgpack + sidecar meta json carrying the architecture)."""
        from ..config import ModelConfig as _MC
        from .checkpoint import load_meta, load_params

        meta = load_meta(path) or {}
        if cfg is None:
            if "config" in meta:
                cfg = _MC(**meta["config"])
            elif meta.get("preset") in MODEL_PRESETS:
                cfg = MODEL_PRESETS[meta["preset"]]
            else:
                raise ValueError(
                    f"no sidecar meta next to {path}; pass cfg= explicitly")
        kw.setdefault("family", meta.get(
            "family", "pe" if cfg.use_rope else "clip"))
        return cls(cfg, params=load_params(path), **kw)

    def _stage_batch(self, *arrays):
        """Mesh mode: pad every array's batch dim to a multiple of the
        data-axis size and place it with the DP sharding (one helper so
        encode_image / encode_with_tokens / encode_regions all scale
        out identically). Identity off-mesh. Returns (*staged, b)."""
        arrays = tuple(jnp.asarray(a) for a in arrays)
        b = arrays[0].shape[0]
        if self._batch_sharding is None:
            return (*arrays, b)
        n_shards = self.mesh.shape[self.data_axis]
        pad = (-b) % n_shards
        out = []
        for a in arrays:
            if pad:
                a = jnp.concatenate(
                    [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
            out.append(jax.device_put(a, self._batch_sharding))
        return (*out, b)

    def encode_image(self, images, *, normalized: bool = True):
        """images: [B, H, W, 3] float (already mean/std preprocessed).
        Returns L2-normalized [B, embed_dim] fp32 embeddings
        (reference core_system.py:341,407)."""
        if not normalized:
            raise ValueError("embeddings are always L2-normalized")
        images, b = self._stage_batch(images)
        return self._fwd(self.params, images)[:b]

    def encode_with_tokens(self, images):
        """Returns (embeddings [B, E], tokens [B, S, W]) for region pooling."""
        images, b = self._stage_batch(images)
        emb, tokens = self._fwd(self.params, images, return_tokens=True)
        return emb[:b], tokens[:b]

    def encode_regions(self, images, masks):
        """Fused masked-ROI region embeddings.

        images: [B, H, W, 3] preprocessed at the model resolution;
        masks: [B, R, H, W] bool/float region masks at the same
        resolution, OR [B, R, g*g] masks ALREADY average-pooled onto
        the patch grid (any coverage fraction in [0, 1]). The pooled
        form is what the ingest hot path ships: pooling full-res pixel
        masks host-side shrinks the per-image mask upload from ~3.6 MB
        of f32 pixels to ~18 KB of grid weights — through this
        environment's ~100 MB/s tunnel that is most of ROI mode's cost
        (EVAL.md region section). One ViT forward produces the
        whole-image embedding AND R per-region embeddings (masked
        attention pooling over the token grid) — the improvement over
        the reference, which stored the global embedding for every
        region (core_system.py:406). Returns (global [B, E],
        regions [B, R, E]), all L2-normalized.
        """
        masks = jnp.asarray(masks, jnp.float32)
        p = self.cfg.patch_size
        g = self.cfg.grid_size
        b, r = masks.shape[:2]
        if masks.ndim == 4:
            # average-pool pixel masks onto the patch grid
            mg = (masks.reshape(b, r, g, p, g, p).mean(axis=(3, 5))
                  .reshape(b, r, g * g))
        elif masks.ndim == 3:
            if masks.shape[2] != g * g:
                raise ValueError(
                    f"pooled masks must be [B, R, {g * g}], got "
                    f"{masks.shape}")
            mg = masks
        else:
            raise ValueError(f"masks must be [B, R, H, W] or "
                             f"[B, R, {g * g}], got {masks.shape}")
        images, mg, b = self._stage_batch(images, mg)
        emb, regions = self._fwd_regions(self.params, images, mg)
        return emb[:b], regions[:b]

    def pool_masks(self, masks_list, r_pad: int) -> np.ndarray:
        """Host-side patch-grid pooling for `encode_regions`'s [B, R,
        g*g] form: per image a list/array of [H, W] bool/float masks at
        ANY resolution (original image space included — no intermediate
        model-res resize needed), area-averaged onto the g x g grid.
        Returns [B, r_pad, g*g] float32 (pad regions all-zero = the
        empty-mask fallback the pooling already handles)."""
        g = self.cfg.grid_size
        out = np.zeros((len(masks_list), r_pad, g * g), np.float32)
        for j, masks in enumerate(masks_list):
            for i, m in enumerate(masks[:r_pad]):
                m = np.asarray(m)
                if cv2 is not None:
                    mg = cv2.resize(m.astype(np.uint8) * 255, (g, g),
                                    interpolation=cv2.INTER_AREA)
                    out[j, i] = mg.reshape(-1).astype(np.float32) / 255.0
                else:    # exact block mean when divisible, else strided
                    h, w = m.shape
                    ys = (np.arange(g + 1) * h // g)
                    xs = (np.arange(g + 1) * w // g)
                    mf = m.astype(np.float32)
                    for gy in range(g):
                        for gx in range(g):
                            blk = mf[ys[gy]:max(ys[gy + 1], ys[gy] + 1),
                                     xs[gx]:max(xs[gx + 1], xs[gx] + 1)]
                            out[j, i, gy * g + gx] = blk.mean()
        return out

    @property
    def embed_dim(self) -> int:
        return self.cfg.embed_dim


def preprocess_images(batch: np.ndarray) -> np.ndarray:
    """[B, H, W, 3] pixels -> normalized float32.

    Host-side equivalent of the reference's torchvision transform chain
    output (resize/crop happen in the ingest pipeline; this is the
    mean/std step). The 0-255 vs 0-1 convention comes from the DTYPE:
    integer arrays are 0-255 (divided by 255), float arrays must
    already be 0-1 (torchvision ToTensor semantics). A content
    heuristic (max() > 1.5) would mis-scale near-black uint8 batches
    255x and make one image's normalization depend on its batchmates.
    """
    batch = np.asarray(batch)
    if np.issubdtype(batch.dtype, np.integer):
        x = batch.astype(np.float32) / 255.0
    else:
        x = batch.astype(np.float32)
    return (x - IMAGE_MEAN) / IMAGE_STD
