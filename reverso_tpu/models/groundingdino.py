"""GroundingDINO: open-vocabulary detection in JAX.

The reference's prompt-conditioned detector (inside autodistill's
GroundedSAM, reference core_system.py:220-224,266; SURVEY.md §2.2): a
Swin image backbone + BERT text tower feeding a DETR-style
encoder/decoder whose hot op is multi-scale deformable attention — here
lowered to XLA gathers (`ops.deformable`) instead of the reference
stack's custom CUDA kernel.

The architecture and parameter naming follow the transformers
`GroundingDinoForObjectDetection` implementation exactly, so official
checkpoints ("IDEA-Research/grounding-dino-tiny/-base") convert directly
and random-init parity is testable against torch. Inference-only; the
whole forward is one static-shape jit (fixed image size, fixed
`max_text_len`-padded text, fixed `num_queries`).
"""
from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field
from typing import Any, Mapping, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.deformable import ms_deform_attn
from .swin import SwinConfig, SwinBackbone, convert_swin
from .text import BertConfig, BertEncoder, convert_bert

# BERT special tokens delimiting phrases: [CLS], [SEP], '.', '?'
SPECIAL_TOKEN_IDS = (101, 102, 1012, 1029)


@dataclass(frozen=True)
class GroundingDinoConfig:
    d_model: int = 256
    encoder_layers: int = 6
    decoder_layers: int = 6
    num_heads: int = 8
    ffn_dim: int = 2048
    num_feature_levels: int = 4
    encoder_n_points: int = 4
    decoder_n_points: int = 4
    num_queries: int = 900
    max_text_len: int = 256
    position_embedding_temperature: float = 20.0
    layer_norm_eps: float = 1e-5
    # deformable-attention backend: "auto" picks the gather-free Pallas
    # hat-matmul kernel on TPU (2-3.5x the XLA gather path at 800 px)
    # and the XLA patch-gather elsewhere; see ops/deformable.py.
    deform_impl: str = "auto"
    swin: SwinConfig = field(default_factory=lambda: SwinConfig(
        embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
        window_size=7, out_stages=(1, 2, 3)))
    text: BertConfig = field(default_factory=BertConfig)
    dtype: str = "float32"


def tiny_test_config() -> GroundingDinoConfig:
    """Small config for CI parity tests."""
    return GroundingDinoConfig(
        d_model=32, encoder_layers=2, decoder_layers=2, num_heads=4,
        ffn_dim=64, num_queries=20, max_text_len=32,
        swin=SwinConfig(embed_dim=16, depths=(1, 1), num_heads=(2, 4),
                        window_size=4, out_stages=(0, 1)),
        text=BertConfig(vocab_size=1200, hidden_size=32, num_layers=2,
                        num_heads=4, intermediate_size=64,
                        max_position_embeddings=64))


# ---------------------------------------------------------------------------
# Host-side text preprocessing (not jitted; tokens are host data anyway)
# ---------------------------------------------------------------------------

def generate_text_masks(input_ids: np.ndarray):
    """Block-diagonal per-phrase self-attention mask + phrase-relative
    position ids (the GroundingDINO text-preprocessing contract)."""
    bsz, n = input_ids.shape
    special = np.isin(input_ids, SPECIAL_TOKEN_IDS)
    attn = np.tile(np.eye(n, dtype=bool)[None], (bsz, 1, 1))
    pos = np.zeros((bsz, n), np.int64)
    for b in range(bsz):
        prev = 0
        for col in np.nonzero(special[b])[0]:
            if col == 0 or col == n - 1:
                pos[b, col] = 0
            else:
                attn[b, prev + 1:col + 1, prev + 1:col + 1] = True
                pos[b, prev + 1:col + 1] = np.arange(0, col - prev)
            prev = col
    return attn, pos


# ---------------------------------------------------------------------------
# Position embeddings
# ---------------------------------------------------------------------------

def sine_position_2d(h: int, w: int, d_model: int, temperature: float) -> np.ndarray:
    """[H, W, d_model] sine position embedding (mask all-ones path of the
    torch GroundingDinoSinePositionEmbedding)."""
    half = d_model // 2
    y = (np.arange(h, dtype=np.float64) + 1)[:, None] / h * 2 * math.pi
    x = (np.arange(w, dtype=np.float64) + 1)[None, :] / w * 2 * math.pi
    y = np.broadcast_to(y, (h, w))
    x = np.broadcast_to(x, (h, w))
    dim_t = temperature ** (2 * (np.arange(half) // 2) / half)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = np.stack([np.sin(px[:, :, 0::2]), np.cos(px[:, :, 1::2])], -1).reshape(h, w, -1)
    py = np.stack([np.sin(py[:, :, 0::2]), np.cos(py[:, :, 1::2])], -1).reshape(h, w, -1)
    return np.concatenate([py, px], axis=-1).astype(np.float32)


def get_sine_pos_embed(pos, num_pos_feats: int, temperature: float = 10000.0,
                       exchange_xy: bool = True):
    """Sine embedding of arbitrary coordinates [..., n] -> [..., n*feats]."""
    scale = 2 * math.pi
    dim_t = temperature ** (2 * (jnp.arange(num_pos_feats) // 2) / num_pos_feats)

    def sine(x):  # [..., 1] -> [..., feats]
        sx = x * scale / dim_t
        return jnp.stack([jnp.sin(sx[..., 0::2]), jnp.cos(sx[..., 1::2])],
                         axis=-1).reshape(*x.shape[:-1], num_pos_feats)

    parts = [sine(pos[..., i:i + 1]) for i in range(pos.shape[-1])]
    if exchange_xy and len(parts) >= 2:
        parts[0], parts[1] = parts[1], parts[0]
    return jnp.concatenate(parts, axis=-1)


def inverse_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

class MHA(nn.Module):
    """Plain multi-head attention (torch GroundingDinoMultiheadAttention)."""
    d_model: int
    heads: int

    @nn.compact
    def __call__(self, queries, keys, values, mask_bias=None):
        hd = self.d_model // self.heads
        dense = lambda name: nn.Dense(self.d_model, name=name, dtype=queries.dtype)
        q, k, v = dense("query")(queries), dense("key")(keys), dense("value")(values)

        def split(t):
            b, s, _ = t.shape
            return t.reshape(b, s, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / math.sqrt(hd)
        if mask_bias is not None:
            s = s + mask_bias
        p = jax.nn.softmax(s, axis=-1).astype(queries.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        b, _, sl, _ = o.shape
        o = o.transpose(0, 2, 1, 3).reshape(b, sl, self.d_model)
        return dense("out_proj")(o)


class DeformAttn(nn.Module):
    """Learnable multi-scale deformable attention module."""
    cfg: GroundingDinoConfig
    heads: int
    points: int

    @nn.compact
    def __call__(self, hidden, value_states, reference_points, shapes,
                 position_embeddings=None):
        c = self.cfg
        if position_embeddings is not None:
            hidden = hidden + position_embeddings
        b, lq, _ = hidden.shape
        lv = value_states.shape[1]
        n_l = c.num_feature_levels
        value = nn.Dense(c.d_model, name="value_proj",
                         dtype=hidden.dtype)(value_states)
        value = value.reshape(b, lv, self.heads, c.d_model // self.heads)
        offsets = nn.Dense(self.heads * n_l * self.points * 2,
                           name="sampling_offsets", dtype=hidden.dtype)(hidden)
        offsets = offsets.reshape(b, lq, self.heads, n_l, self.points, 2)
        weights = nn.Dense(self.heads * n_l * self.points,
                           name="attention_weights", dtype=hidden.dtype)(hidden)
        weights = jax.nn.softmax(
            weights.reshape(b, lq, self.heads, n_l * self.points).astype(jnp.float32),
            axis=-1).reshape(b, lq, self.heads, n_l, self.points).astype(hidden.dtype)

        if reference_points.shape[-1] == 2:
            norm = jnp.asarray([[wl, hl] for hl, wl in shapes], jnp.float32)
            loc = (reference_points[:, :, None, :, None, :]
                   + offsets / norm[None, None, None, :, None, :])
        else:
            loc = (reference_points[:, :, None, :, None, :2]
                   + offsets / self.points
                   * reference_points[:, :, None, :, None, 2:] * 0.5)
        impl = c.deform_impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "patch"
        out = ms_deform_attn(value, shapes, loc, weights, impl=impl)
        return nn.Dense(c.d_model, name="output_proj", dtype=hidden.dtype)(out)


class TextEnhancerLayer(nn.Module):
    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(self, text, text_pos, self_attn_bias):
        c = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps, name=name,
                                       dtype=jnp.float32)
        qk = text + text_pos
        attn = MHA(c.d_model, c.num_heads // 2, name="self_attn")(
            qk, qk, text, self_attn_bias)
        text = ln("layer_norm_before")(text + attn).astype(text.dtype)
        h = nn.Dense(c.ffn_dim // 2, name="fc1", dtype=text.dtype)(text)
        h = jax.nn.relu(h)
        h = nn.Dense(c.d_model, name="fc2", dtype=text.dtype)(h)
        return ln("layer_norm_after")(text + h).astype(text.dtype)


class BiMultiHeadAttention(nn.Module):
    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(self, vision, text, text_pad_mask=None):
        c = self.cfg
        embed = c.ffn_dim // 2
        heads = c.num_heads // 2
        hd = embed // heads
        b, lv, _ = vision.shape
        lt = text.shape[1]
        dense = lambda n_, dim: nn.Dense(dim, name=n_, dtype=vision.dtype)

        vq = dense("vision_proj", embed)(vision) * (hd ** -0.5)
        tk = dense("text_proj", embed)(text)
        vv = dense("values_vision_proj", embed)(vision)
        tv = dense("values_text_proj", embed)(text)

        def split(t):
            return t.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)

        vq, tk, vv, tv = split(vq), split(tk), split(vv), split(tv)
        attn = jnp.einsum("bhvd,bhtd->bhvt", vq, tk).astype(jnp.float32)
        attn = attn - jnp.max(attn)
        attn = jnp.clip(attn, -50000, 50000)
        attn_t = jnp.swapaxes(attn, 2, 3)               # [B, H, T, V]
        attn_t = attn_t - jnp.max(attn_t, axis=-1, keepdims=True)
        attn_t = jnp.clip(attn_t, -50000, 50000)

        text_w = jax.nn.softmax(attn_t, axis=-1)        # text->vision
        if text_pad_mask is not None:                   # mask text for vision
            attn = jnp.where(text_pad_mask[:, None, None, :], -jnp.inf, attn)
        vision_w = jax.nn.softmax(attn, axis=-1)        # vision->text

        dv = jnp.einsum("bhvt,bhtd->bhvd", vision_w.astype(vision.dtype), tv)
        dt = jnp.einsum("bhtv,bhvd->bhtd", text_w.astype(vision.dtype), vv)
        dv = dv.transpose(0, 2, 1, 3).reshape(b, lv, embed)
        dt = dt.transpose(0, 2, 1, 3).reshape(b, lt, embed)
        return (dense("out_vision_proj", c.d_model)(dv),
                dense("out_text_proj", c.d_model)(dt))


class FusionLayer(nn.Module):
    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(self, vision, text, text_pad_mask=None):
        c = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps, name=name,
                                       dtype=jnp.float32)
        v = ln("layer_norm_vision")(vision).astype(vision.dtype)
        t = ln("layer_norm_text")(text).astype(text.dtype)
        dv, dt = BiMultiHeadAttention(c, name="attn")(v, t, text_pad_mask)
        gv = self.param("vision_param", nn.initializers.constant(1e-4),
                        (c.d_model,), jnp.float32)
        gt = self.param("text_param", nn.initializers.constant(1e-4),
                        (c.d_model,), jnp.float32)
        return v + gv.astype(v.dtype) * dv, t + gt.astype(t.dtype) * dt


class DeformableLayer(nn.Module):
    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(self, vision, pos, reference_points, shapes):
        c = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps, name=name,
                                       dtype=jnp.float32)
        h = DeformAttn(c, c.num_heads, c.encoder_n_points, name="self_attn")(
            vision, vision, reference_points, shapes, position_embeddings=pos)
        vision = ln("self_attn_layer_norm")(vision + h).astype(vision.dtype)
        h = nn.Dense(c.ffn_dim, name="fc1", dtype=vision.dtype)(vision)
        h = jax.nn.relu(h)
        h = nn.Dense(c.d_model, name="fc2", dtype=vision.dtype)(h)
        return ln("final_layer_norm")(vision + h).astype(vision.dtype)


class EncoderLayer(nn.Module):
    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(self, vision, text, vision_pos, text_pos, reference_points,
                 shapes, text_self_attn_bias, text_pad_mask):
        c = self.cfg
        vision, text = FusionLayer(c, name="fusion_layer")(
            vision, text, text_pad_mask)
        text = TextEnhancerLayer(c, name="text_enhancer_layer")(
            text, text_pos, text_self_attn_bias)
        vision = DeformableLayer(c, name="deformable_layer")(
            vision, vision_pos, reference_points, shapes)
        return vision, text


class DecoderLayer(nn.Module):
    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(self, queries, query_pos, reference_points, vision, text,
                 shapes, text_cross_bias):
        c = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps, name=name,
                                       dtype=jnp.float32)
        qk = queries + query_pos
        h = MHA(c.d_model, c.num_heads, name="self_attn")(qk, qk, queries)
        queries = ln("self_attn_layer_norm")(queries + h).astype(queries.dtype)

        h = MHA(c.d_model, c.num_heads, name="encoder_attn_text")(
            queries + query_pos, text, text, text_cross_bias)
        queries = ln("encoder_attn_text_layer_norm")(queries + h).astype(queries.dtype)

        h = DeformAttn(c, c.num_heads, c.decoder_n_points, name="encoder_attn")(
            queries, vision, reference_points, shapes,
            position_embeddings=query_pos)
        queries = ln("encoder_attn_layer_norm")(queries + h).astype(queries.dtype)

        h = nn.Dense(c.ffn_dim, name="fc1", dtype=queries.dtype)(queries)
        h = jax.nn.relu(h)
        h = nn.Dense(c.d_model, name="fc2", dtype=queries.dtype)(h)
        return ln("final_layer_norm")(queries + h).astype(queries.dtype)


class MLPHead(nn.Module):
    hidden: int
    out: int
    layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers):
            dim = self.out if i == self.layers - 1 else self.hidden
            x = nn.Dense(dim, name=f"layers_{i}", dtype=x.dtype)(x)
            if i < self.layers - 1:
                x = jax.nn.relu(x)
        return x


def contrastive_logits(query_states, text_states, text_token_mask,
                       max_text_len: int):
    """query @ text^T with padding masked to -inf, padded to max_text_len."""
    out = jnp.einsum("bqd,btd->bqt", query_states.astype(jnp.float32),
                     text_states.astype(jnp.float32))
    out = jnp.where(text_token_mask[:, None, :], out, -jnp.inf)
    pad = max_text_len - out.shape[-1]
    if pad > 0:
        out = jnp.pad(out, ((0, 0), (0, 0), (0, pad)),
                      constant_values=-jnp.inf)
    return out[..., :max_text_len]


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

class GroundingDino(nn.Module):
    """Detection forward: (images, tokens) -> (logits, boxes).

    images [B, H, W, 3] (already ImageNet-normalized), input_ids [B, L]
    with 3D text self-attention mask + position ids from
    `generate_text_masks`. Returns logits [B, Q, max_text_len] (pre-
    sigmoid) and boxes [B, Q, 4] (cx, cy, w, h in [0, 1]).
    """
    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(self, images, input_ids, text_self_attn_mask, position_ids,
                 text_token_mask=None):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        b = images.shape[0]
        if text_token_mask is None:
            text_token_mask = jnp.ones_like(input_ids, bool)

        # ---- text tower ------------------------------------------------
        text_feat = BertEncoder(c.text, name="text_backbone")(
            input_ids, text_self_attn_mask, None, position_ids)
        text_feat = nn.Dense(c.d_model, name="text_projection",
                             dtype=dtype)(text_feat)

        # ---- vision backbone + projections ----------------------------
        feats = SwinBackbone(c.swin, name="backbone")(images)
        stages = sorted(feats)
        maps = []
        for i, s in enumerate(stages):
            x = nn.Conv(c.d_model, (1, 1), name=f"input_proj_{i}_conv",
                        dtype=dtype)(feats[s])
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5,
                             name=f"input_proj_{i}_norm",
                             dtype=jnp.float32)(x).astype(dtype)
            maps.append(x)
        for i in range(len(stages), c.num_feature_levels):
            src = feats[stages[-1]] if i == len(stages) else maps[-1]
            x = nn.Conv(c.d_model, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        name=f"input_proj_{i}_conv", dtype=dtype)(src)
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5,
                             name=f"input_proj_{i}_norm",
                             dtype=jnp.float32)(x).astype(dtype)
            maps.append(x)

        shapes = tuple((m.shape[1], m.shape[2]) for m in maps)
        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (c.num_feature_levels, c.d_model), jnp.float32)
        srcs, poss = [], []
        for lvl, m in enumerate(maps):
            h, w = m.shape[1], m.shape[2]
            pos = jnp.asarray(sine_position_2d(
                h, w, c.d_model, c.position_embedding_temperature))
            srcs.append(m.reshape(b, h * w, c.d_model))
            poss.append(pos.reshape(1, h * w, c.d_model)
                        + level_embed[lvl][None, None].astype(jnp.float32))
        vision = jnp.concatenate(srcs, axis=1)
        vision_pos = jnp.concatenate(poss, axis=1).astype(dtype)

        # ---- encoder ----------------------------------------------------
        # reference grid per level (valid_ratios == 1: no padding masks)
        refs = []
        for hl, wl in shapes:
            ry = (jnp.arange(hl, dtype=jnp.float32) + 0.5) / hl
            rx = (jnp.arange(wl, dtype=jnp.float32) + 0.5) / wl
            gy, gx = jnp.meshgrid(ry, rx, indexing="ij")
            refs.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1))
        ref_grid = jnp.concatenate(refs, axis=0)            # [Lv, 2]
        enc_ref = jnp.broadcast_to(
            ref_grid[None, :, None, :],
            (b, ref_grid.shape[0], c.num_feature_levels, 2))

        text_pos = get_sine_pos_embed(
            position_ids[..., None].astype(jnp.float32),
            num_pos_feats=c.d_model, exchange_xy=False).astype(dtype)
        text_bias = jnp.where(text_self_attn_mask[:, None, :, :], 0.0,
                              -3.4e38).astype(jnp.float32)
        text_pad = ~(text_token_mask.astype(bool))

        for i in range(c.encoder_layers):
            vision, text_feat = EncoderLayer(c, name=f"encoder_layer{i}")(
                vision, text_feat, vision_pos, text_pos, enc_ref, shapes,
                text_bias, text_pad)

        # ---- two-stage query selection ---------------------------------
        proposals = []
        for lvl, (hl, wl) in enumerate(shapes):
            gy, gx = jnp.meshgrid(jnp.arange(hl, dtype=jnp.float32),
                                  jnp.arange(wl, dtype=jnp.float32),
                                  indexing="ij")
            grid = jnp.stack([gx, gy], -1)                  # [H, W, 2]
            center = (grid + 0.5) / jnp.asarray([wl, hl], jnp.float32)
            wh = jnp.full_like(center, 0.05 * (2.0 ** lvl))
            proposals.append(jnp.concatenate([center, wh], -1).reshape(-1, 4))
        proposals = jnp.concatenate(proposals, axis=0)[None]  # [1, Lv, 4]
        valid = jnp.all((proposals > 0.01) & (proposals < 0.99), -1,
                        keepdims=True)
        proposal_logits = jnp.where(valid, inverse_sigmoid(proposals), jnp.inf)

        obj_query = jnp.where(valid, vision, 0.0)
        obj_query = nn.Dense(c.d_model, name="enc_output",
                             dtype=dtype)(obj_query)
        obj_query = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                 name="enc_output_norm",
                                 dtype=jnp.float32)(obj_query).astype(dtype)

        enc_logits = contrastive_logits(obj_query, text_feat,
                                        text_token_mask, c.max_text_len)
        enc_boxes_head = MLPHead(c.d_model, 4, 3, name="encoder_output_bbox_embed")
        enc_delta = enc_boxes_head(obj_query)
        enc_coord_logits = enc_delta.astype(jnp.float32) + proposal_logits

        topk_scores = jnp.max(enc_logits, axis=-1)          # [B, Lv]
        _, topk_idx = jax.lax.top_k(topk_scores, c.num_queries)
        # expose the two-stage selection for parity tooling (no-op unless
        # applied with mutable=["intermediates"]): at random init final
        # boxes diverge chaotically through this top-Q cut for any two
        # numerically distinct impls, so selection OVERLAP is the
        # meaningful full-size e2e parity surface (PERF.md, parity gate)
        self.sow("intermediates", "topk_proposal_idx", topk_idx)
        topk_coords = jnp.take_along_axis(
            enc_coord_logits, topk_idx[..., None], axis=1)
        reference = jax.nn.sigmoid(topk_coords)             # [B, Q, 4]

        query_embeds = self.param("query_position_embeddings",
                                  nn.initializers.normal(1.0),
                                  (c.num_queries, c.d_model), jnp.float32)
        target = jnp.broadcast_to(query_embeds[None].astype(dtype),
                                  (b, c.num_queries, c.d_model))

        # ---- decoder ----------------------------------------------------
        bbox_head = MLPHead(c.d_model, 4, 3, name="bbox_embed")  # shared
        dec_ln = nn.LayerNorm(epsilon=c.layer_norm_eps, name="decoder_norm",
                              dtype=jnp.float32)
        ref_head = MLPHead(c.d_model, c.d_model, 2, name="reference_points_head")
        text_cross_bias = jnp.where(text_token_mask[:, None, None, :].astype(bool),
                                    0.0, -3.4e38).astype(jnp.float32)

        hidden = target
        intermediate_logits = []
        intermediate_boxes = []
        for i in range(c.decoder_layers):
            ref_input = jnp.broadcast_to(
                reference[:, :, None, :],
                (b, c.num_queries, c.num_feature_levels, 4))
            qpos = get_sine_pos_embed(reference, num_pos_feats=c.d_model // 2)
            qpos = ref_head(qpos.astype(dtype))
            hidden = DecoderLayer(c, name=f"decoder_layer{i}")(
                hidden, qpos, ref_input, vision, text_feat, shapes,
                text_cross_bias)
            hidden_ln = dec_ln(hidden).astype(dtype)
            # TWO delta chains, matching HF exactly (transformers
            # modeling_grounding_dino.py: decoder "hack implementation"
            # + GroundingDinoForObjectDetection level loop):
            #   * the OUTPUT boxes for level i apply bbox_embed to the
            #     LAYER-NORMED hidden against the PREVIOUS level's
            #     refined reference (level 0: the init reference);
            #   * the internal refinement chain feeding level i+1
            #     applies bbox_embed to the RAW layer output.
            # At random init decoder_norm is an affine identity over
            # already-normed outputs, so only trained checkpoints (with
            # gamma/beta != 1/0) distinguish the chains — collapsing
            # them diverges every level >= 1 from torch.
            delta_out = bbox_head(hidden_ln).astype(jnp.float32)
            intermediate_boxes.append(
                jax.nn.sigmoid(delta_out + inverse_sigmoid(reference)))
            intermediate_logits.append(contrastive_logits(
                hidden_ln, text_feat, text_token_mask, c.max_text_len))
            delta_raw = bbox_head(hidden).astype(jnp.float32)
            reference = jax.nn.sigmoid(delta_raw
                                       + inverse_sigmoid(reference))

        return intermediate_logits[-1], intermediate_boxes[-1]


# ---------------------------------------------------------------------------
# Checkpoint conversion (transformers GroundingDinoForObjectDetection)
# ---------------------------------------------------------------------------

def convert_grounding_dino(sd: Mapping[str, Any],
                           cfg: GroundingDinoConfig) -> dict:
    from .convert import _np, _linear, _ln

    sd = dict(sd)
    sub = lambda prefix: {k[len(prefix):]: v for k, v in sd.items()
                          if k.startswith(prefix)}

    def mha(prefix):
        return {
            "query": _linear(sd, f"{prefix}.query"),
            "key": _linear(sd, f"{prefix}.key"),
            "value": _linear(sd, f"{prefix}.value"),
            "out_proj": _linear(sd, f"{prefix}.out_proj"),
        }

    def deform(prefix):
        return {
            "sampling_offsets": _linear(sd, f"{prefix}.sampling_offsets"),
            "attention_weights": _linear(sd, f"{prefix}.attention_weights"),
            "value_proj": _linear(sd, f"{prefix}.value_proj"),
            "output_proj": _linear(sd, f"{prefix}.output_proj"),
        }

    def mlp_head(prefix, n):
        return {f"layers_{i}": _linear(sd, f"{prefix}.layers.{i}")
                for i in range(n)}

    params: dict = {
        "backbone": convert_swin(sd, cfg.swin,
                                 prefix="model.backbone.conv_encoder.model."),
        "text_backbone": convert_bert(sub("model.text_backbone."), cfg.text),
        "text_projection": _linear(sd, "model.text_projection"),
        "level_embed": _np(sd["model.level_embed"]),
        "query_position_embeddings": _np(
            sd["model.query_position_embeddings.weight"]),
        "enc_output": _linear(sd, "model.enc_output"),
        "enc_output_norm": _ln(sd, "model.enc_output_norm"),
        "encoder_output_bbox_embed": mlp_head(
            "model.encoder_output_bbox_embed", 3),
        "bbox_embed": mlp_head("bbox_embed.0", 3),
        "decoder_norm": _ln(sd, "model.decoder.layer_norm"),
        "reference_points_head": mlp_head(
            "model.decoder.reference_points_head", 2),
    }
    for i in range(cfg.num_feature_levels):
        params[f"input_proj_{i}_conv"] = {
            "kernel": _np(sd[f"model.input_proj_vision.{i}.0.weight"])
            .transpose(2, 3, 1, 0),
            "bias": _np(sd[f"model.input_proj_vision.{i}.0.bias"]),
        }
        params[f"input_proj_{i}_norm"] = {
            "scale": _np(sd[f"model.input_proj_vision.{i}.1.weight"]),
            "bias": _np(sd[f"model.input_proj_vision.{i}.1.bias"]),
        }
    for i in range(cfg.encoder_layers):
        lp = f"model.encoder.layers.{i}"
        params[f"encoder_layer{i}"] = {
            "fusion_layer": {
                "layer_norm_vision": _ln(sd, f"{lp}.fusion_layer.layer_norm_vision"),
                "layer_norm_text": _ln(sd, f"{lp}.fusion_layer.layer_norm_text"),
                "vision_param": _np(sd[f"{lp}.fusion_layer.vision_param"]),
                "text_param": _np(sd[f"{lp}.fusion_layer.text_param"]),
                "attn": {
                    name: _linear(sd, f"{lp}.fusion_layer.attn.{name}")
                    for name in ("vision_proj", "text_proj",
                                 "values_vision_proj", "values_text_proj",
                                 "out_vision_proj", "out_text_proj")
                },
            },
            "text_enhancer_layer": {
                "self_attn": mha(f"{lp}.text_enhancer_layer.self_attn"),
                "fc1": _linear(sd, f"{lp}.text_enhancer_layer.fc1"),
                "fc2": _linear(sd, f"{lp}.text_enhancer_layer.fc2"),
                "layer_norm_before": _ln(sd, f"{lp}.text_enhancer_layer.layer_norm_before"),
                "layer_norm_after": _ln(sd, f"{lp}.text_enhancer_layer.layer_norm_after"),
            },
            "deformable_layer": {
                "self_attn": deform(f"{lp}.deformable_layer.self_attn"),
                "self_attn_layer_norm": _ln(sd, f"{lp}.deformable_layer.self_attn_layer_norm"),
                "fc1": _linear(sd, f"{lp}.deformable_layer.fc1"),
                "fc2": _linear(sd, f"{lp}.deformable_layer.fc2"),
                "final_layer_norm": _ln(sd, f"{lp}.deformable_layer.final_layer_norm"),
            },
        }
    for i in range(cfg.decoder_layers):
        lp = f"model.decoder.layers.{i}"
        params[f"decoder_layer{i}"] = {
            "self_attn": mha(f"{lp}.self_attn"),
            "self_attn_layer_norm": _ln(sd, f"{lp}.self_attn_layer_norm"),
            "encoder_attn_text": mha(f"{lp}.encoder_attn_text"),
            "encoder_attn_text_layer_norm": _ln(sd, f"{lp}.encoder_attn_text_layer_norm"),
            "encoder_attn": deform(f"{lp}.encoder_attn"),
            "encoder_attn_layer_norm": _ln(sd, f"{lp}.encoder_attn_layer_norm"),
            "fc1": _linear(sd, f"{lp}.fc1"),
            "fc2": _linear(sd, f"{lp}.fc2"),
            "final_layer_norm": _ln(sd, f"{lp}.final_layer_norm"),
        }
    return params
