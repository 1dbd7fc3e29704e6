"""SAM (Segment Anything) in JAX: promptable mask generation.

The reference's GroundedSAM pipes GroundingDINO boxes into SAM for masks
(reference core_system.py:266,277-308; SURVEY.md §2.2 SAM row). This
implements the full SAM stack — ViT image encoder with decomposed
relative positions and windowed attention, positional-fourier prompt
encoder (boxes + points), and the two-way-transformer mask decoder —
matching the transformers `SamModel` architecture and naming, so
official `facebook/sam-vit-*` checkpoints convert directly.

Static shapes throughout: image size and the number of box prompts per
call are fixed at trace time (pad boxes and mask outputs host-side).
"""
from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field
from typing import Any, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SamVisionCfg:
    image_size: int = 1024
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    window_size: int = 14
    global_attn_indexes: tuple[int, ...] = (2, 5, 8, 11)
    output_channels: int = 256
    layer_norm_eps: float = 1e-6

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


@dataclass(frozen=True)
class SamDecoderCfg:
    hidden_size: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    num_layers: int = 2
    attention_downsample_rate: int = 2
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    layer_norm_eps: float = 1e-6


@dataclass(frozen=True)
class SamConfig:
    vision: SamVisionCfg = field(default_factory=SamVisionCfg)
    decoder: SamDecoderCfg = field(default_factory=SamDecoderCfg)
    dtype: str = "float32"

    @property
    def prompt_hidden(self) -> int:
        return self.vision.output_channels

    @property
    def embed_size(self) -> int:
        return self.vision.grid


def tiny_sam_config() -> SamConfig:
    return SamConfig(
        vision=SamVisionCfg(image_size=64, patch_size=8, hidden_size=32,
                            num_layers=2, num_heads=2, window_size=4,
                            global_attn_indexes=(1,), output_channels=16),
        decoder=SamDecoderCfg(hidden_size=16, num_heads=2, mlp_dim=32,
                              iou_head_hidden_dim=16))


# ---------------------------------------------------------------------------
# Vision encoder
# ---------------------------------------------------------------------------

def _decomposed_rel_pos_parts(q, rel_h, rel_w, hw):
    """MViTv2 decomposed relative position bias, factored parts.

    q: [B*heads, H*W, d]; rel_h: [2H-1, d]; rel_w: [2W-1, d].
    Returns (bias_h [B, H*W, H], bias_w [B, H*W, W]); the full bias is
    bias_h[:, q, ky] + bias_w[:, q, kx]."""
    h, w = hw
    assert rel_h.shape[0] == 2 * h - 1 and rel_w.shape[0] == 2 * w - 1
    idx_h = (np.arange(h)[:, None] - np.arange(h)[None, :]) + (h - 1)
    idx_w = (np.arange(w)[:, None] - np.arange(w)[None, :]) + (w - 1)
    rh = rel_h[idx_h.reshape(-1)].reshape(h, h, -1)      # [H, H, d]
    rw = rel_w[idx_w.reshape(-1)].reshape(w, w, -1)      # [W, W, d]
    n = q.shape[0]
    qr = q.reshape(n, h, w, -1)
    bias_h = jnp.einsum("bhwc,hkc->bhwk", qr, rh)        # [B, H, W, H]
    bias_w = jnp.einsum("bhwc,wkc->bhwk", qr, rw)        # [B, H, W, W]
    return (bias_h.reshape(n, h * w, h), bias_w.reshape(n, h * w, w))


def _decomposed_rel_pos(q, rel_h, rel_w, hw):
    """Combined [B*heads, H*W, H*W] bias (q and k sizes equal, static)."""
    h, w = hw
    bias_h, bias_w = _decomposed_rel_pos_parts(q, rel_h, rel_w, hw)
    n = q.shape[0]
    bias = (bias_h.reshape(n, h * w, h, 1)
            + bias_w.reshape(n, h * w, 1, w))
    return bias.reshape(n, h * w, h * w)


class SamVisionAttention(nn.Module):
    cfg: SamVisionCfg
    input_size: int     # H==W of the attended map (window or full grid)

    @nn.compact
    def __call__(self, x):  # [N, H, W, C]
        c = self.cfg
        n, h, w, _ = x.shape
        hd = c.hidden_size // c.num_heads
        qkv = nn.Dense(3 * c.hidden_size, name="qkv", dtype=x.dtype)(x)
        qkv = qkv.reshape(n, h * w, 3, c.num_heads, hd).transpose(2, 0, 3, 1, 4)
        qkv = qkv.reshape(3, n * c.num_heads, h * w, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                           (2 * self.input_size - 1, hd), jnp.float32)
        rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                           (2 * self.input_size - 1, hd), jnp.float32)
        # 256 % h == 0: the flash path's kv_tile (256) must be a whole
        # number of grid rows or its rel-bias selector assert fires
        # (e.g. a 48x48 grid at image_size 768 falls back to XLA here)
        use_flash = (jax.default_backend() == "tpu" and h == w
                     and h * w > 2048 and (h * w) % 256 == 0
                     and 256 % h == 0)
        if use_flash:
            # Global layers (64x64 grid = 4096 tokens): the XLA path
            # materializes the [heads, 4096, 4096] score tensor, which
            # IS the cost of these layers. The flash kernel folds the
            # decomposed rel-pos bias in per kv-tile (one selector
            # matmul), so nothing [S, S] ever reaches HBM.
            from ..ops.attention import flash_attention
            bh, bw = _decomposed_rel_pos_parts(
                q, rel_h.astype(x.dtype), rel_w.astype(x.dtype), (h, w))
            q4 = q.reshape(n, c.num_heads, h * w, hd)
            k4 = k.reshape(n, c.num_heads, h * w, hd)
            v4 = v.reshape(n, c.num_heads, h * w, hd)
            bh4 = bh.reshape(n, c.num_heads, h * w, h)
            bw4 = bw.reshape(n, c.num_heads, h * w, w)
            o = flash_attention(q4, k4, v4, scale=hd ** -0.5,
                                rel_bias=(bh4, bw4, h))
            o = o.reshape(n * c.num_heads, h * w, hd)
        else:
            s = jnp.einsum("nqd,nkd->nqk", q * (hd ** -0.5), k)
            s = s + _decomposed_rel_pos(q, rel_h.astype(x.dtype),
                                        rel_w.astype(x.dtype), (h, w))
            p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(x.dtype)
            o = jnp.einsum("nqk,nkd->nqd", p, v)
        o = o.reshape(n, c.num_heads, h, w, hd).transpose(0, 2, 3, 1, 4)
        o = o.reshape(n, h, w, c.hidden_size)
        return nn.Dense(c.hidden_size, name="proj", dtype=x.dtype)(o)


class SamVisionLayer(nn.Module):
    cfg: SamVisionCfg
    window: int     # 0 = global

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        c = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps, name=name,
                                       dtype=jnp.float32)
        res = x
        y = ln("layer_norm1")(x).astype(x.dtype)
        b, h, w, ch = y.shape
        if self.window > 0:
            win = self.window
            ph = (win - h % win) % win
            pw = (win - w % win) % win
            if ph or pw:
                y = jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)))
            hp, wp = h + ph, w + pw
            y = y.reshape(b, hp // win, win, wp // win, win, ch)
            y = y.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win, win, ch)
            y = SamVisionAttention(c, win, name="attn")(y)
            y = y.reshape(b, hp // win, wp // win, win, win, ch)
            y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, ch)
            y = y[:, :h, :w]
        else:
            y = SamVisionAttention(c, c.grid, name="attn")(y)
        x = res + y
        y = ln("layer_norm2")(x).astype(x.dtype)
        y = nn.Dense(int(c.hidden_size * c.mlp_ratio), name="mlp_lin1",
                     dtype=x.dtype)(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(c.hidden_size, name="mlp_lin2", dtype=x.dtype)(y)
        return x + y


class ChannelLayerNorm(nn.Module):
    """SamLayerNorm over the channel axis of [B, H, W, C] (eps 1e-6)."""
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        x32 = x.astype(jnp.float32)
        mu = x32.mean(-1, keepdims=True)
        var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
        y = (x32 - mu) / jnp.sqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


class SamVisionEncoder(nn.Module):
    cfg: SamVisionCfg

    @nn.compact
    def __call__(self, images):  # [B, H, W, 3] -> [B, grid, grid, out_ch]
        c = self.cfg
        x = images
        if x.shape[1] == 3 and x.shape[-1] != 3:
            x = x.transpose(0, 2, 3, 1)
        x = nn.Conv(c.hidden_size, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    name="patch_embed", dtype=x.dtype)(x)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, c.grid, c.grid, c.hidden_size), jnp.float32)
        x = x + pos.astype(x.dtype)
        for i in range(c.num_layers):
            window = 0 if i in c.global_attn_indexes else c.window_size
            x = SamVisionLayer(c, window, name=f"layer{i}")(x)
        x = nn.Conv(c.output_channels, (1, 1), use_bias=False,
                    name="neck_conv1", dtype=x.dtype)(x)
        x = ChannelLayerNorm(name="neck_ln1")(x)
        x = nn.Conv(c.output_channels, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="neck_conv2", dtype=x.dtype)(x)
        x = ChannelLayerNorm(name="neck_ln2")(x)
        return x


# ---------------------------------------------------------------------------
# Prompt encoder + positional fourier embedding
# ---------------------------------------------------------------------------

class SamPositionalEmbedding(nn.Module):
    num_pos_feats: int

    @nn.compact
    def __call__(self, coords):  # [..., 2] in [0, 1] -> [..., 2*feats]
        table = self.param("positional_embedding",
                           nn.initializers.normal(1.0),
                           (2, self.num_pos_feats), jnp.float32)
        c = 2 * coords.astype(jnp.float32) - 1
        c = c @ table
        c = 2 * math.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


class SamPromptEncoder(nn.Module):
    """Box (and point) prompts -> sparse + dense embeddings."""
    cfg: SamConfig

    @nn.compact
    def __call__(self, input_boxes=None, input_points=None, input_labels=None):
        c = self.cfg
        hid = c.prompt_hidden
        shared = SamPositionalEmbedding(hid // 2, name="shared_embedding")
        point_embed = [
            self.param(f"point_embed_{i}", nn.initializers.normal(1.0),
                       (1, hid), jnp.float32) for i in range(4)]
        not_a_point = self.param("not_a_point_embed",
                                 nn.initializers.normal(1.0), (1, hid),
                                 jnp.float32)
        no_mask = self.param("no_mask_embed", nn.initializers.normal(1.0),
                             (1, hid), jnp.float32)
        size = float(c.vision.image_size)

        sparse = None
        batch = 1
        if input_points is not None:
            batch = input_points.shape[0]
            pts = (input_points + 0.5) / size
            if input_boxes is None:     # pad with a not-a-point slot
                pad_pt = jnp.zeros(pts.shape[:2] + (1, 2), pts.dtype)
                pts = jnp.concatenate([pts, pad_pt], axis=2)
                input_labels = jnp.concatenate(
                    [input_labels,
                     -jnp.ones(input_labels.shape[:2] + (1,),
                               input_labels.dtype)], axis=2)
            emb = shared(pts)
            lbl = input_labels[..., None]
            emb = jnp.where(lbl == -1, not_a_point[0], emb)
            emb = jnp.where(lbl == 0, emb + point_embed[0][0], emb)
            emb = jnp.where(lbl == 1, emb + point_embed[1][0], emb)
            sparse = emb
        if input_boxes is not None:
            batch = input_boxes.shape[0]
            nb = input_boxes.shape[1]
            corners = (input_boxes.reshape(batch, nb, 2, 2) + 0.5) / size
            emb = shared(corners)
            emb = emb.at[:, :, 0, :].add(point_embed[2][0])
            emb = emb.at[:, :, 1, :].add(point_embed[3][0])
            sparse = emb if sparse is None else jnp.concatenate(
                [sparse, emb], axis=2)

        es = c.embed_size
        dense = jnp.broadcast_to(no_mask.reshape(1, 1, 1, hid),
                                 (batch, es, es, hid))
        return sparse, dense


def image_wide_positional_embedding(table, cfg: SamConfig):
    """[1, grid, grid, C] image positional embedding from a [2, F] table."""
    size = cfg.embed_size
    g = (np.arange(size, dtype=np.float32) + 0.5) / size
    yx = np.stack(np.meshgrid(g, g, indexing="ij"), -1)  # [H, W, (y, x)]
    coords = jnp.asarray(yx[..., ::-1].copy())           # (x, y)
    c = 2 * coords - 1
    c = c @ table
    c = 2 * math.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)[None]


# ---------------------------------------------------------------------------
# Mask decoder (two-way transformer)
# ---------------------------------------------------------------------------

class SamAttention(nn.Module):
    cfg: SamDecoderCfg
    downsample: int = 1

    @nn.compact
    def __call__(self, q, k, v):  # [B, P, N, C]
        c = self.cfg
        inner = c.hidden_size // self.downsample
        heads = c.num_heads
        hd = inner // heads
        dense = lambda name, dim: nn.Dense(dim, name=name, dtype=q.dtype)
        q = dense("q_proj", inner)(q)
        k = dense("k_proj", inner)(k)
        v = dense("v_proj", inner)(v)

        def split(t):
            b, p, n_, _ = t.shape
            return t.reshape(b * p, n_, heads, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        s = jnp.einsum("nhqd,nhkd->nhqk", qh * (hd ** -0.5), kh)
        p_ = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
        o = jnp.einsum("nhqk,nhkd->nhqd", p_, vh)
        b, pb = q.shape[0], q.shape[1]
        o = o.transpose(0, 2, 1, 3).reshape(b, pb, -1, inner)
        return dense("out_proj", c.hidden_size)(o)


class TwoWayBlock(nn.Module):
    cfg: SamDecoderCfg
    skip_first_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, qpe, kpe):
        c = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps, name=name,
                                       dtype=jnp.float32)
        if self.skip_first_pe:
            attn = SamAttention(c, 1, name="self_attn")(queries, queries, queries)
            queries = attn
        else:
            q = queries + qpe
            queries = queries + SamAttention(c, 1, name="self_attn")(q, q, queries)
        queries = ln("layer_norm1")(queries).astype(keys.dtype)

        q = queries + qpe
        k = keys + kpe
        queries = queries + SamAttention(c, c.attention_downsample_rate,
                                         name="cross_attn_token_to_image")(q, k, keys)
        queries = ln("layer_norm2")(queries).astype(keys.dtype)

        h = nn.Dense(c.mlp_dim, name="mlp_lin1", dtype=queries.dtype)(queries)
        h = jax.nn.relu(h)
        h = nn.Dense(c.hidden_size, name="mlp_lin2", dtype=queries.dtype)(h)
        queries = ln("layer_norm3")(queries + h).astype(keys.dtype)

        q = queries + qpe
        k = keys + kpe
        keys = keys + SamAttention(c, c.attention_downsample_rate,
                                   name="cross_attn_image_to_token")(k, q, queries)
        keys = ln("layer_norm4")(keys).astype(queries.dtype)
        return queries, keys


class SamMaskDecoder(nn.Module):
    cfg: SamConfig

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompts, dense_prompts,
                 multimask_output: bool = True):
        """image_embeddings [B, H, W, C]; image_pe [1, H, W, C];
        sparse_prompts [B, P, N, C]; dense_prompts [B, H, W, C].
        Returns (masks [B, P, M, 4H, 4W], iou [B, P, M])."""
        c = self.cfg.decoder
        b, h, w, ch = image_embeddings.shape
        pb = sparse_prompts.shape[1]
        n_mask_tokens = c.num_multimask_outputs + 1

        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, c.hidden_size), jnp.float32)
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (n_mask_tokens, c.hidden_size), jnp.float32)
        out_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        out_tokens = jnp.broadcast_to(
            out_tokens[None, None],
            (b, pb, 1 + n_mask_tokens, c.hidden_size)).astype(image_embeddings.dtype)
        tokens = jnp.concatenate([out_tokens, sparse_prompts], axis=2)

        img = image_embeddings + dense_prompts
        img = jnp.repeat(img.reshape(b, 1, h * w, ch), pb, axis=1)
        pe = jnp.broadcast_to(image_pe.reshape(1, 1, h * w, ch),
                              (b, pb, h * w, ch)).astype(img.dtype)

        queries, keys = tokens, img
        for i in range(c.num_layers):
            queries, keys = TwoWayBlock(c, skip_first_pe=(i == 0),
                                        name=f"block{i}")(queries, keys,
                                                          tokens, pe)
        q = queries + tokens
        k = keys + pe
        queries = queries + SamAttention(c, c.attention_downsample_rate,
                                         name="final_attn")(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="final_ln",
                               dtype=jnp.float32)(queries).astype(img.dtype)

        iou_out = queries[:, :, 0]
        mask_out = queries[:, :, 1:1 + n_mask_tokens]

        up = keys.reshape(b * pb, h, w, ch)
        up = nn.ConvTranspose(c.hidden_size // 4, (2, 2), strides=(2, 2),
                              name="upscale_conv1", dtype=img.dtype)(up)
        up = ChannelLayerNorm(name="upscale_ln")(up)
        up = jax.nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(c.hidden_size // 8, (2, 2), strides=(2, 2),
                              name="upscale_conv2", dtype=img.dtype)(up)
        up = jax.nn.gelu(up, approximate=False)
        uh, uw = up.shape[1], up.shape[2]

        hyper = []
        for i in range(n_mask_tokens):
            x = mask_out[:, :, i]
            x = nn.Dense(c.hidden_size, name=f"hyper_{i}_proj_in", dtype=x.dtype)(x)
            x = jax.nn.relu(x)
            x = nn.Dense(c.hidden_size, name=f"hyper_{i}_mid_0", dtype=x.dtype)(x)
            x = jax.nn.relu(x)
            x = nn.Dense(c.hidden_size // 8, name=f"hyper_{i}_proj_out",
                         dtype=x.dtype)(x)
            hyper.append(x)
        hyper = jnp.stack(hyper, axis=2)                     # [B, P, M, C/8]
        up_flat = up.reshape(b, pb, uh * uw, c.hidden_size // 8)
        masks = jnp.einsum("bpmc,bpnc->bpmn", hyper, up_flat)
        masks = masks.reshape(b, pb, n_mask_tokens, uh, uw)

        x = iou_out
        x = nn.Dense(c.iou_head_hidden_dim, name="iou_proj_in", dtype=x.dtype)(x)
        x = jax.nn.relu(x)
        for i in range(c.iou_head_depth - 2):
            x = nn.Dense(c.iou_head_hidden_dim, name=f"iou_mid_{i}",
                         dtype=x.dtype)(x)
            x = jax.nn.relu(x)
        iou = nn.Dense(n_mask_tokens, name="iou_proj_out", dtype=x.dtype)(x)

        sl = slice(1, None) if multimask_output else slice(0, 1)
        return masks[:, :, sl], iou[:, :, sl]


class Sam(nn.Module):
    """Full SAM: (images, boxes) -> (mask logits, iou scores).

    images [B, S, S, 3] (SAM pixel normalization), boxes [B, NB, 4] xyxy
    in input-pixel coordinates. Returns masks [B, NB, M, S/4, S/4] and
    iou [B, NB, M] (M = 3 if multimask else 1).
    """
    cfg: SamConfig

    @nn.compact
    def __call__(self, images, input_boxes, multimask_output: bool = False):
        c = self.cfg
        img_emb = SamVisionEncoder(c.vision, name="vision_encoder")(images)
        sparse, dense = SamPromptEncoder(c, name="prompt_encoder")(
            input_boxes=input_boxes)
        pe_table = self.param("shared_image_embedding",
                              nn.initializers.normal(1.0),
                              (2, c.prompt_hidden // 2), jnp.float32)
        image_pe = image_wide_positional_embedding(pe_table, c).astype(img_emb.dtype)
        masks, iou = SamMaskDecoder(c, name="mask_decoder")(
            img_emb, image_pe, sparse, dense, multimask_output)
        return masks, iou


# ---------------------------------------------------------------------------
# Checkpoint conversion (transformers SamModel naming)
# ---------------------------------------------------------------------------

def convert_sam(sd: Mapping[str, Any], cfg: SamConfig) -> dict:
    from .convert import _np, _linear, _ln

    def chan_ln(prefix):
        return {"scale": _np(sd[f"{prefix}.weight"]),
                "bias": _np(sd[f"{prefix}.bias"])}

    vis: dict = {
        "patch_embed": {
            "kernel": _np(sd["vision_encoder.patch_embed.projection.weight"])
            .transpose(2, 3, 1, 0),
            "bias": _np(sd["vision_encoder.patch_embed.projection.bias"]),
        },
        "pos_embed": _np(sd["vision_encoder.pos_embed"]),
        "neck_conv1": {"kernel": _np(sd["vision_encoder.neck.conv1.weight"])
                       .transpose(2, 3, 1, 0)},
        "neck_ln1": chan_ln("vision_encoder.neck.layer_norm1"),
        "neck_conv2": {"kernel": _np(sd["vision_encoder.neck.conv2.weight"])
                       .transpose(2, 3, 1, 0)},
        "neck_ln2": chan_ln("vision_encoder.neck.layer_norm2"),
    }
    for i in range(cfg.vision.num_layers):
        lp = f"vision_encoder.layers.{i}"
        vis[f"layer{i}"] = {
            "layer_norm1": _ln(sd, f"{lp}.layer_norm1"),
            "layer_norm2": _ln(sd, f"{lp}.layer_norm2"),
            "attn": {
                "qkv": _linear(sd, f"{lp}.attn.qkv"),
                "proj": _linear(sd, f"{lp}.attn.proj"),
                "rel_pos_h": _np(sd[f"{lp}.attn.rel_pos_h"]),
                "rel_pos_w": _np(sd[f"{lp}.attn.rel_pos_w"]),
            },
            "mlp_lin1": _linear(sd, f"{lp}.mlp.lin1"),
            "mlp_lin2": _linear(sd, f"{lp}.mlp.lin2"),
        }

    prompt: dict = {
        "shared_embedding": {"positional_embedding": _np(
            sd["prompt_encoder.shared_embedding.positional_embedding"])},
        "not_a_point_embed": _np(sd["prompt_encoder.not_a_point_embed.weight"]),
        "no_mask_embed": _np(sd["prompt_encoder.no_mask_embed.weight"]),
    }
    for i in range(4):
        prompt[f"point_embed_{i}"] = _np(
            sd[f"prompt_encoder.point_embed.{i}.weight"])

    def sam_attn(prefix):
        return {n: _linear(sd, f"{prefix}.{n}")
                for n in ("q_proj", "k_proj", "v_proj", "out_proj")}

    dec: dict = {
        "iou_token": _np(sd["mask_decoder.iou_token.weight"]),
        "mask_tokens": _np(sd["mask_decoder.mask_tokens.weight"]),
        "final_attn": sam_attn("mask_decoder.transformer.final_attn_token_to_image"),
        "final_ln": _ln(sd, "mask_decoder.transformer.layer_norm_final_attn"),
        # torch ConvTranspose2d places weight[:, :, di, dj] at output
        # offset (di, dj); flax ConvTranspose (transpose_kernel=False)
        # runs a fractionally-strided conv with UNflipped HWIO kernel,
        # which mirrors the taps — so the spatial axes must be reversed
        # here. (Caught by the full-size parity gate: the tiny config's
        # 5e-3 mask tolerance hid the flip, round 3.)
        "upscale_conv1": {
            "kernel": _np(sd["mask_decoder.upscale_conv1.weight"]
                          ).transpose(2, 3, 0, 1)[::-1, ::-1].copy(),
            "bias": _np(sd["mask_decoder.upscale_conv1.bias"])},
        "upscale_conv2": {
            "kernel": _np(sd["mask_decoder.upscale_conv2.weight"]
                          ).transpose(2, 3, 0, 1)[::-1, ::-1].copy(),
            "bias": _np(sd["mask_decoder.upscale_conv2.bias"])},
        "upscale_ln": chan_ln("mask_decoder.upscale_layer_norm"),
        "iou_proj_in": _linear(sd, "mask_decoder.iou_prediction_head.proj_in"),
        "iou_proj_out": _linear(sd, "mask_decoder.iou_prediction_head.proj_out"),
    }
    for i in range(cfg.decoder.iou_head_depth - 2):
        dec[f"iou_mid_{i}"] = _linear(
            sd, f"mask_decoder.iou_prediction_head.layers.{i}")
    for i in range(cfg.decoder.num_multimask_outputs + 1):
        hp = f"mask_decoder.output_hypernetworks_mlps.{i}"
        dec[f"hyper_{i}_proj_in"] = _linear(sd, f"{hp}.proj_in")
        dec[f"hyper_{i}_mid_0"] = _linear(sd, f"{hp}.layers.0")
        dec[f"hyper_{i}_proj_out"] = _linear(sd, f"{hp}.proj_out")
    for i in range(cfg.decoder.num_layers):
        lp = f"mask_decoder.transformer.layers.{i}"
        dec[f"block{i}"] = {
            "self_attn": sam_attn(f"{lp}.self_attn"),
            "cross_attn_token_to_image": sam_attn(f"{lp}.cross_attn_token_to_image"),
            "cross_attn_image_to_token": sam_attn(f"{lp}.cross_attn_image_to_token"),
            "layer_norm1": _ln(sd, f"{lp}.layer_norm1"),
            "layer_norm2": _ln(sd, f"{lp}.layer_norm2"),
            "layer_norm3": _ln(sd, f"{lp}.layer_norm3"),
            "layer_norm4": _ln(sd, f"{lp}.layer_norm4"),
            "mlp_lin1": _linear(sd, f"{lp}.mlp.lin1"),
            "mlp_lin2": _linear(sd, f"{lp}.mlp.lin2"),
        }

    return {
        "shared_image_embedding": _np(
            sd["shared_image_embedding.positional_embedding"]),
        "vision_encoder": vis,
        "prompt_encoder": prompt,
        "mask_decoder": dec,
    }
