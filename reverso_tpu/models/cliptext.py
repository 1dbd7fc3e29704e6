"""CLIP text encoder: text -> joint-embedding-space vectors.

The reference loads full CLIP models (`pe.CLIP`, reference
core_system.py:181) but only ever calls `encode_image` — the text tower
sits unused. Exposing it enables search-by-description ("red car at
night") against the same image-embedding database, since PE/CLIP train
the two towers into one space.

Architecture = standard CLIP text transformer: token embedding +
learned positions, causal self-attention blocks, final LayerNorm,
features taken at the EOT token, linear projection. Conversion from the
transformers `CLIPTextModelWithProjection` naming (parity-tested) and
the OpenAI/PE `transformer.resblocks` naming.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.topk import _dot_precision


@dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    width: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    context_length: int = 77
    embed_dim: int = 1024        # joint space dim (matches the vision proj)
    act: str = "quick_gelu"
    eot_token_id: int = 49407
    dtype: str = "float32"


def _act(name):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return lambda x: jax.nn.gelu(x, approximate=False)


class TextBlock(nn.Module):
    cfg: ClipTextConfig

    @nn.compact
    def __call__(self, x, causal_bias):
        c = self.cfg
        hd = c.width // c.num_heads
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, name=name,
                                       dtype=jnp.float32)
        y = ln("ln1")(x).astype(x.dtype)
        # per-dtype precision everywhere a matmul runs: default-
        # precision f32 silently executes one bf16 MXU pass on TPU
        # (the repo-wide trap; see ops.topk._dot_precision)
        prec = _dot_precision(x.dtype)
        dense = lambda name: nn.Dense(c.width, name=name, dtype=x.dtype,
                                      precision=prec)
        q, k, v = dense("q_proj")(y), dense("k_proj")(y), dense("v_proj")(y)

        def split(t):
            b, s, _ = t.shape
            return t.reshape(b, s, c.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       precision=prec).astype(jnp.float32)
        s = s / np.sqrt(hd) + causal_bias
        p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v, precision=prec)
        b, _, sl, _ = o.shape
        o = o.transpose(0, 2, 1, 3).reshape(b, sl, c.width)
        x = x + dense("out_proj")(o)

        y = ln("ln2")(x).astype(x.dtype)
        y = nn.Dense(int(c.width * c.mlp_ratio), name="fc1",
                     dtype=x.dtype, precision=prec)(y)
        y = _act(self.cfg.act)(y)
        y = nn.Dense(c.width, name="fc2", dtype=x.dtype,
                     precision=prec)(y)
        return x + y


class ClipTextEncoder(nn.Module):
    """token ids [B, L] -> joint-space embeddings [B, embed_dim]
    (pre-normalization; callers L2-normalize)."""
    cfg: ClipTextConfig

    @nn.compact
    def __call__(self, input_ids):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        b, l = input_ids.shape
        x = nn.Embed(c.vocab_size, c.width, name="token_embedding",
                     dtype=dtype)(input_ids)
        pos = self.param("pos_embed", nn.initializers.normal(0.01),
                         (c.context_length, c.width), jnp.float32)
        x = x + pos[None, :l].astype(dtype)

        causal = jnp.triu(jnp.full((l, l), -1e9, jnp.float32), k=1)
        causal = causal[None, None]
        for i in range(c.depth):
            x = TextBlock(c, name=f"block{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final",
                         dtype=jnp.float32)(x).astype(dtype)
        # features at the EOT token (highest token id per sequence —
        # the standard CLIP pooling)
        eot = jnp.argmax(jnp.where(input_ids == c.eot_token_id,
                                   1, 0), axis=1)
        pooled = x[jnp.arange(b), eot]
        return nn.Dense(c.embed_dim, use_bias=False, name="proj",
                        dtype=dtype,
                        precision=_dot_precision(dtype))(pooled)


class TextEmbedder:
    """text -> L2-normalized joint-space embedding (jitted)."""

    def __init__(self, cfg: ClipTextConfig, params, tokenizer):
        from ..ops.norm import l2_normalize
        self.cfg = cfg
        self.tokenizer = tokenizer
        module = ClipTextEncoder(cfg)

        @jax.jit
        def fwd(params, ids):
            out = module.apply({"params": params}, ids)
            out = jax.lax.optimization_barrier(out)
            return l2_normalize(out.astype(jnp.float32))

        self._fwd = fwd
        self.params = params

    @classmethod
    def from_pretrained(cls, ckpt_path: str, vocab_path: str,
                        merges_path: str, cfg: ClipTextConfig | None = None):
        from ..detect.grounded import load_torch_state_dict
        from ..detect.clipbpe import ClipBPETokenizer
        if ckpt_path.endswith(".msgpack"):   # converted by fetch_weights.py
            from .checkpoint import load_meta, load_params
            meta = load_meta(ckpt_path) or {}
            cfg = cfg or (ClipTextConfig(**meta["config"])
                          if "config" in meta else ClipTextConfig())
            params = load_params(ckpt_path)
        else:
            cfg = cfg or ClipTextConfig()
            params = convert_clip_text(load_torch_state_dict(ckpt_path), cfg)
        tok = ClipBPETokenizer(vocab_path, merges_path,
                               context_length=cfg.context_length)
        return cls(cfg, params, tok)

    def embed(self, texts) -> np.ndarray:
        ids = self.tokenizer(texts)
        return np.asarray(self._fwd(self.params, jnp.asarray(ids)))


def convert_clip_text(sd: Mapping[str, Any], cfg: ClipTextConfig) -> dict:
    """transformers CLIPTextModelWithProjection or OpenAI `transformer.*`
    naming -> ClipTextEncoder params."""
    from .convert import _np, _linear, _ln, _split_qkv

    keys = list(sd.keys())
    params: dict = {}
    if any(k.startswith("text_model.") for k in keys):   # HF naming
        t = "text_model"
        params["token_embedding"] = {
            "embedding": _np(sd[f"{t}.embeddings.token_embedding.weight"])}
        params["pos_embed"] = _np(
            sd[f"{t}.embeddings.position_embedding.weight"])
        for i in range(cfg.depth):
            lp = f"{t}.encoder.layers.{i}"
            params[f"block{i}"] = {
                "ln1": _ln(sd, f"{lp}.layer_norm1"),
                "ln2": _ln(sd, f"{lp}.layer_norm2"),
                "q_proj": _linear(sd, f"{lp}.self_attn.q_proj"),
                "k_proj": _linear(sd, f"{lp}.self_attn.k_proj"),
                "v_proj": _linear(sd, f"{lp}.self_attn.v_proj"),
                "out_proj": _linear(sd, f"{lp}.self_attn.out_proj"),
                "fc1": _linear(sd, f"{lp}.mlp.fc1"),
                "fc2": _linear(sd, f"{lp}.mlp.fc2"),
            }
        params["ln_final"] = _ln(sd, f"{t}.final_layer_norm")
        params["proj"] = {"kernel": _np(sd["text_projection.weight"]).T}
    else:                                                # OpenAI/PE naming
        params["token_embedding"] = {
            "embedding": _np(sd["token_embedding.weight"])}
        params["pos_embed"] = _np(sd["positional_embedding"])
        for i in range(cfg.depth):
            lp = f"transformer.resblocks.{i}"
            blk = {
                "ln1": _ln(sd, f"{lp}.ln_1"),
                "ln2": _ln(sd, f"{lp}.ln_2"),
                "out_proj": _linear(sd, f"{lp}.attn.out_proj"),
                "fc1": _linear(sd, f"{lp}.mlp.c_fc"),
                "fc2": _linear(sd, f"{lp}.mlp.c_proj"),
            }
            blk.update(_split_qkv(_np(sd[f"{lp}.attn.in_proj_weight"]),
                                  _np(sd.get(f"{lp}.attn.in_proj_bias"))))
            params[f"block{i}"] = blk
        params["ln_final"] = _ln(sd, "ln_final")
        proj = _np(sd["text_projection"])
        params["proj"] = {"kernel": proj}
    return params
