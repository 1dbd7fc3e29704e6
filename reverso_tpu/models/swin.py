"""Swin Transformer backbone (GroundingDINO's image tower) in flax.

The reference's GroundedSAM wraps GroundingDINO, whose multi-scale image
features come from a Swin-T backbone (SURVEY.md §2.2). This implements
Swin v1 (windowed attention with relative position bias, shifted windows,
patch merging) with conversion from the transformers Swin naming, parity
-tested against `transformers.SwinModel` / `SwinBackbone`.

TPU notes: all window partitioning is static reshape/transpose (shapes
fixed by the input resolution); the shift is `jnp.roll`; no dynamic
control flow anywhere.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SwinConfig:
    image_size: int = 224        # only used for defaults; model is size-agnostic
    patch_size: int = 4
    in_channels: int = 3
    embed_dim: int = 96
    depths: tuple[int, ...] = (2, 2, 6, 2)
    num_heads: tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-5
    out_stages: tuple[int, ...] = (1, 2, 3)   # 0-indexed stages to emit
    dtype: str = "float32"

    def stage_dim(self, s: int) -> int:
        return self.embed_dim * (2 ** s)


@functools.lru_cache(maxsize=32)
def _rel_pos_index(window: int) -> np.ndarray:
    """[w^2, w^2] index into the (2w-1)^2 relative bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype(np.int32)


@functools.lru_cache(maxsize=64)
def _shift_attn_mask(hp: int, wp: int, window: int, shift: int) -> np.ndarray:
    """[nW, w^2, w^2] additive mask for shifted windows (0 / -100)."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(hp // window, window, wp // window, window)
    win = win.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff == 0, 0.0, -100.0).astype(np.float32)


def _window_partition(x, window):
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, c)


def _window_merge(win, window, h, w):
    b = win.shape[0] // (h // window * (w // window))
    x = win.reshape(b, h // window, w // window, window, window, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class WindowAttention(nn.Module):
    cfg: SwinConfig
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, bias_mask):
        """x: [nW*B, w^2, C]; bias_mask: [nW, w^2, w^2] or None."""
        c = self.cfg
        w2 = x.shape[1]
        hd = self.dim // self.heads
        dense = lambda name: nn.Dense(self.dim, name=name, dtype=x.dtype)
        q, k, v = dense("query")(x), dense("key")(x), dense("value")(x)

        def split(t):
            n = t.shape[0]
            return t.reshape(n, w2, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        s = jnp.einsum("nhqd,nhkd->nhqk", q, k).astype(jnp.float32) / np.sqrt(hd)

        table = self.param("relative_position_bias_table",
                           nn.initializers.normal(0.02),
                           ((2 * c.window_size - 1) ** 2, self.heads),
                           jnp.float32)
        idx = _rel_pos_index(c.window_size).reshape(-1)
        bias = table[idx].reshape(w2, w2, self.heads).transpose(2, 0, 1)
        s = s + bias[None]
        if bias_mask is not None:
            n_w = bias_mask.shape[0]
            b = s.shape[0] // n_w
            s = s.reshape(b, n_w, self.heads, w2, w2) + bias_mask[None, :, None]
            s = s.reshape(-1, self.heads, w2, w2)
        p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        o = jnp.einsum("nhqk,nhkd->nhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(x.shape[0], w2, self.dim)
        return nn.Dense(self.dim, name="proj", dtype=x.dtype)(o)


class SwinBlock(nn.Module):
    cfg: SwinConfig
    dim: int
    heads: int
    shift: int

    @nn.compact
    def __call__(self, x, h, w):
        c = self.cfg
        win = c.window_size
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps, name=name,
                                       dtype=jnp.float32)
        b = x.shape[0]
        shortcut = x
        y = ln("ln_before")(x).astype(x.dtype).reshape(b, h, w, self.dim)

        # Zero-pad partial windows, matching HF's maybe_pad (pad keys
        # participate in attention unmasked there too). For maps
        # SMALLER than the window this keeps working — the installed
        # transformers SwinLayer shrinks its window but not its
        # attention bias and CRASHES (verified empirically), so there
        # is no working HF reference for that regime; detector inputs
        # are sized so production maps never go sub-window.
        pad_h = (win - h % win) % win
        pad_w = (win - w % win) % win
        if pad_h or pad_w:
            y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w

        shift = self.shift if min(hp, wp) > win else 0
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(hp, wp, win, shift))
        else:
            mask = None

        y = _window_partition(y, win)
        y = WindowAttention(c, self.dim, self.heads, name="attn")(y, mask)
        y = _window_merge(y, win, hp, wp)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y[:, :h, :w].reshape(b, h * w, self.dim)
        x = shortcut + y

        z = ln("ln_after")(x).astype(x.dtype)
        z = nn.Dense(int(self.dim * c.mlp_ratio), name="fc1", dtype=x.dtype)(z)
        z = jax.nn.gelu(z, approximate=False)
        z = nn.Dense(self.dim, name="fc2", dtype=x.dtype)(z)
        return x + z


class PatchMerging(nn.Module):
    cfg: SwinConfig
    dim: int

    @nn.compact
    def __call__(self, x, h, w):
        b = x.shape[0]
        y = x.reshape(b, h, w, self.dim)
        if h % 2 or w % 2:
            y = jnp.pad(y, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = y[:, 0::2, 0::2]
        x1 = y[:, 1::2, 0::2]
        x2 = y[:, 0::2, 1::2]
        x3 = y[:, 1::2, 1::2]
        y = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        h2, w2 = y.shape[1], y.shape[2]
        y = y.reshape(b, h2 * w2, 4 * self.dim)
        y = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, name="norm",
                         dtype=jnp.float32)(y).astype(x.dtype)
        y = nn.Dense(2 * self.dim, use_bias=False, name="reduction",
                     dtype=x.dtype)(y)
        return y, h2, w2


class SwinBackbone(nn.Module):
    """images [B, H, W, 3] -> dict {stage: [B, Hs, Ws, Cs]} feature maps
    (LayerNormed per output stage, matching transformers SwinBackbone)."""
    cfg: SwinConfig

    @nn.compact
    def __call__(self, images):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        x = images.astype(dtype)
        if x.shape[1] == 3 and x.shape[-1] != 3:
            x = x.transpose(0, 2, 3, 1)
        b = x.shape[0]
        # pad image so H, W divisible by patch size
        ph = (-x.shape[1]) % c.patch_size
        pw = (-x.shape[2]) % c.patch_size
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        x = nn.Conv(c.embed_dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    name="patch_embed", dtype=dtype)(x)
        h, w = x.shape[1], x.shape[2]
        x = x.reshape(b, h * w, c.embed_dim)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="embed_norm",
                         dtype=jnp.float32)(x).astype(dtype)

        outputs = {}
        for s, depth in enumerate(c.depths):
            dim = c.stage_dim(s)
            for blk in range(depth):
                shift = 0 if blk % 2 == 0 else c.window_size // 2
                x = SwinBlock(c, dim, c.num_heads[s], shift,
                              name=f"stage{s}_block{blk}")(x, h, w)
            if s in c.out_stages:
                y = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                 name=f"out_norm{s}",
                                 dtype=jnp.float32)(x).astype(dtype)
                outputs[s] = y.reshape(b, h, w, dim)
            if s < len(c.depths) - 1:
                x, h, w = PatchMerging(c, dim, name=f"downsample{s}")(x, h, w)
        return outputs


# ---------------------------------------------------------------------------
# HF conversion (transformers Swin naming)
# ---------------------------------------------------------------------------

def convert_swin(sd: Mapping[str, Any], cfg: SwinConfig,
                 prefix: str = "") -> dict:
    from .convert import _np, _linear, _ln

    sub = ({k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
           if prefix else dict(sd))
    params: dict = {
        "patch_embed": {
            "kernel": _np(sub["embeddings.patch_embeddings.projection.weight"])
            .transpose(2, 3, 1, 0),
            "bias": _np(sub["embeddings.patch_embeddings.projection.bias"]),
        },
        "embed_norm": _ln(sub, "embeddings.norm"),
    }
    for s, depth in enumerate(cfg.depths):
        for b in range(depth):
            lp = f"encoder.layers.{s}.blocks.{b}"
            params[f"stage{s}_block{b}"] = {
                "ln_before": _ln(sub, f"{lp}.layernorm_before"),
                "ln_after": _ln(sub, f"{lp}.layernorm_after"),
                "attn": {
                    "query": _linear(sub, f"{lp}.attention.self.query"),
                    "key": _linear(sub, f"{lp}.attention.self.key"),
                    "value": _linear(sub, f"{lp}.attention.self.value"),
                    "proj": _linear(sub, f"{lp}.attention.output.dense"),
                    "relative_position_bias_table": _np(
                        sub[f"{lp}.attention.self.relative_position_bias_table"]),
                },
                "fc1": _linear(sub, f"{lp}.intermediate.dense"),
                "fc2": _linear(sub, f"{lp}.output.dense"),
            }
        if s < len(cfg.depths) - 1:
            dp = f"encoder.layers.{s}.downsample"
            params[f"downsample{s}"] = {
                "norm": _ln(sub, f"{dp}.norm"),
                "reduction": {"kernel": _np(sub[f"{dp}.reduction.weight"]).T},
            }
    for s in cfg.out_stages:
        # SwinBackbone: hidden_states_norms.stage{s+1}; SwinModel: layernorm
        key = f"hidden_states_norms.stage{s + 1}"
        if f"{key}.weight" in sub:
            params[f"out_norm{s}"] = _ln(sub, key)
        elif "layernorm.weight" in sub and s == len(cfg.depths) - 1:
            params[f"out_norm{s}"] = _ln(sub, "layernorm")
    return params
