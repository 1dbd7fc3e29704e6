"""BERT text encoder (the GroundingDINO text tower) in flax.

The reference's GroundedSAM runs GroundingDINO, whose prompt conditioning
comes from a BERT-base text encoder (SURVEY.md §2.2 GroundingDINO row).
This is a faithful BERT encoder with HF-naming conversion; parity is
tested against `transformers.BertModel` at fp32.

TPU notes: static [B, L] token shapes with an attention mask; bf16
activations optional. Attention is plain XLA einsum — BERT sequences
here are <= 256 tokens, below any flash-kernel payoff.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.topk import _dot_precision


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dtype: str = "float32"


class BertSelfAttention(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, mask_bias):
        c = self.cfg
        hd = c.hidden_size // c.num_heads
        # per-dtype precision (the repo-wide trap): default-precision
        # f32 runs one bf16 MXU pass on TPU, so the fp32 exact-parity
        # text conditioning would silently not be exact on device
        prec = _dot_precision(x.dtype)
        dense = lambda name: nn.Dense(c.hidden_size, name=name,
                                      dtype=x.dtype, precision=prec)
        q, k, v = dense("query")(x), dense("key")(x), dense("value")(x)

        def split(t):
            b, s, _ = t.shape
            return t.reshape(b, s, c.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       precision=prec).astype(jnp.float32)
        s = s / np.sqrt(hd) + mask_bias           # [B, 1, 1, L] bias
        p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v, precision=prec)
        b, _, sl, _ = o.shape
        return o.transpose(0, 2, 1, 3).reshape(b, sl, c.hidden_size)


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, mask_bias):
        c = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps, name=name,
                                       dtype=jnp.float32)
        prec = _dot_precision(x.dtype)
        attn_out = BertSelfAttention(c, name="self")(x, mask_bias)
        attn_out = nn.Dense(c.hidden_size, name="attn_output",
                            dtype=x.dtype, precision=prec)(attn_out)
        x = ln("attn_ln")(x + attn_out).astype(x.dtype)
        h = nn.Dense(c.intermediate_size, name="intermediate",
                     dtype=x.dtype, precision=prec)(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, name="output", dtype=x.dtype,
                     precision=prec)(h)
        return ln("out_ln")(x + h).astype(x.dtype)


class BertEncoder(nn.Module):
    """BERT without pooler: token_ids -> [B, L, H] features.

    attention_mask may be [B, L] (padding mask) or [B, L, L] (the
    block-diagonal per-phrase mask GroundingDINO feeds its text tower);
    position_ids override the default arange (GroundingDINO restarts
    positions at each phrase).
    """
    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 position_ids=None):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)

        emb = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings",
                       dtype=dtype)(input_ids)
        pos = self.param("position_embeddings",
                         nn.initializers.normal(0.02),
                         (c.max_position_embeddings, c.hidden_size),
                         jnp.float32)
        if position_ids is None:
            emb = emb + pos[None, :input_ids.shape[1]].astype(dtype)
        else:
            emb = emb + jnp.take(pos, position_ids, axis=0).astype(dtype)
        emb = emb + nn.Embed(c.type_vocab_size, c.hidden_size,
                             name="token_type_embeddings",
                             dtype=dtype)(token_type_ids)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="emb_ln",
                         dtype=jnp.float32)(emb).astype(dtype)

        if attention_mask.ndim == 3:
            ext = attention_mask[:, None, :, :]
        else:
            ext = attention_mask[:, None, None, :]
        mask_bias = jnp.where(ext > 0, 0.0, -1e9).astype(jnp.float32)
        for i in range(c.num_layers):
            x = BertLayer(c, name=f"layer{i}")(x, mask_bias)
        return x


# ---------------------------------------------------------------------------
# HF conversion
# ---------------------------------------------------------------------------

def convert_bert(sd: Mapping[str, Any], cfg: BertConfig,
                 prefix: str = "") -> dict:
    """transformers BertModel state dict -> BertEncoder params."""
    from .convert import _np, _linear, _ln

    def g(key):
        return sd[prefix + key]

    params: dict = {
        "word_embeddings": {"embedding": _np(g("embeddings.word_embeddings.weight"))},
        "token_type_embeddings": {"embedding": _np(g("embeddings.token_type_embeddings.weight"))},
        "position_embeddings": _np(g("embeddings.position_embeddings.weight")),
        "emb_ln": {"scale": _np(g("embeddings.LayerNorm.weight")),
                   "bias": _np(g("embeddings.LayerNorm.bias"))},
    }
    # filter by prefix BEFORE stripping: blindly slicing every key would
    # mangle non-prefixed entries (cls heads, pooler) into junk names
    # that can collide with real parameter keys
    sub = ({k[len(prefix):]: v for k, v in sd.items()
            if k.startswith(prefix)} if prefix else dict(sd))
    for i in range(cfg.num_layers):
        lp = f"encoder.layer.{i}"
        params[f"layer{i}"] = {
            "self": {
                "query": _linear(sub, f"{lp}.attention.self.query"),
                "key": _linear(sub, f"{lp}.attention.self.key"),
                "value": _linear(sub, f"{lp}.attention.self.value"),
            },
            "attn_output": _linear(sub, f"{lp}.attention.output.dense"),
            "attn_ln": _ln(sub, f"{lp}.attention.output.LayerNorm"),
            "intermediate": _linear(sub, f"{lp}.intermediate.dense"),
            "output": _linear(sub, f"{lp}.output.dense"),
            "out_ln": _ln(sub, f"{lp}.output.LayerNorm"),
        }
    return params
