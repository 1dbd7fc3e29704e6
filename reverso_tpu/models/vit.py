"""Vision transformer (PE-Core / CLIP family) in flax.

Rebuilds the reference's vision tower — `pe.CLIP.from_config("PE-Core-L14-336")`
running through torch (reference core_system.py:169-203, SURVEY.md §2.2) —
as a config-driven flax module covering both the PE-Core layout (2D RoPE,
attention pooling) and the HF CLIP layout (abs pos, CLS pooling,
quick-GELU), so converted torch checkpoints from either family load into
the same code path. TPU-native choices: NHWC inputs, bf16 activations with
fp32 params/layernorms, attention via the Pallas flash kernel.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.attention import attention
from ..ops.rope import rope_2d_tables, apply_rope_2d
from ..ops.topk import _dot_precision


def _act(name: str):
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "gelu_tanh":
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    raise ValueError(name)


class MHA(nn.Module):
    """Multi-head self-attention with optional 2D RoPE."""
    cfg: ModelConfig
    use_flash: Optional[bool] = None

    @nn.compact
    def __call__(self, x, kv_valid: Optional[int] = None):  # [B, S, W]
        cfg = self.cfg
        w, h = cfg.width, cfg.num_heads
        hd = w // h
        dense = lambda name: nn.Dense(w, dtype=x.dtype, param_dtype=jnp.dtype(cfg.param_dtype), name=name)
        # NOTE cfg.quant deliberately does NOT touch the projections: a
        # fused int8 q|k|v won its standalone micro-bench (1.66x,
        # bench_int8_linear.py) but measured 0.97x IN-MODEL — the three
        # bf16 dots fuse into the surrounding graph better than the
        # quantize+concat+split chain (bench_embed_quant_parts.py).
        q = dense("q_proj")(x)
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)

        import numpy as np
        cos = sin = None
        if cfg.use_rope:
            cos, sin = rope_2d_tables(cfg.grid_size, hd,
                                      cls_token=cfg.use_cls_token)
            pad = x.shape[1] - cos.shape[0]
            if pad > 0:     # padded-sequence mode: identity rotation rows
                cos = np.concatenate([cos, np.ones((pad, hd), np.float32)])
                sin = np.concatenate([sin, np.zeros((pad, hd), np.float32)])

        use_flash = self.use_flash
        if use_flash is None:
            use_flash = jax.default_backend() == "tpu"
        # heads-in-lanes holds the full sequence resident plus per-chunk
        # [S, S] fp32 score stacks; its VMEM envelope is validated up to
        # S_pad ~1032 at ViT-L width (ops/attention.py head-scheduling
        # note). Longer sequences take the tiled flash path below, which
        # streams KV and handles any S.
        if use_flash and x.shape[1] <= 1032 and hd % 4 == 0:
            # heads-in-lanes kernel: no head transposes, RoPE in-kernel
            from ..ops.attention import flash_attention_heads
            o = flash_attention_heads(q, k, v, heads=h, cos=cos, sin=sin,
                                      kv_valid=kv_valid)
            return dense("out_proj")(o)

        def split(t):  # [B, S, W] -> [B, H, S, hd]
            b, s, _ = t.shape
            return t.reshape(b, s, h, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        if cfg.use_rope:
            q = apply_rope_2d(q, cos, sin)
            k = apply_rope_2d(k, cos, sin)
        o = attention(q, k, v, kv_valid=kv_valid, use_flash=use_flash)
        b, _, s, _ = o.shape
        o = o.transpose(0, 2, 1, 3).reshape(b, s, w)
        return dense("out_proj")(o)


class _DenseParams(nn.Module):
    """Kernel/bias params with nn.Dense-compatible naming and inits, so
    the same parameter tree serves both the XLA path and the fused
    kernel (checkpoint converters are unaffected)."""
    in_dim: int
    out_dim: int
    param_dtype: Any

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_dim, self.out_dim), self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (self.out_dim,),
                       self.param_dtype)
        return k, b


class MLP(nn.Module):
    cfg: ModelConfig
    act: str = "gelu"
    use_fused: Optional[bool] = None   # None -> fused kernel on TPU

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        hidden = int(cfg.width * cfg.mlp_ratio)
        pd = jnp.dtype(cfg.param_dtype)
        w1, b1 = _DenseParams(cfg.width, hidden, pd, name="fc1")()
        w2, b2 = _DenseParams(hidden, cfg.width, pd, name="fc2")()
        use_fused = self.use_fused
        if use_fused is None:
            use_fused = jax.default_backend() == "tpu"
        if use_fused and self.act in ("gelu", "quick_gelu"):
            from ..ops.fused_mlp import fused_mlp
            return fused_mlp(x, w1.astype(x.dtype), b1.astype(x.dtype),
                             w2.astype(x.dtype), b2.astype(x.dtype),
                             act=self.act, quant=cfg.quant == "int8")
        prec = _dot_precision(x.dtype)
        h = jnp.dot(x, w1.astype(x.dtype), precision=prec) \
            + b1.astype(x.dtype)
        h = _act(self.act)(h)
        return jnp.dot(h, w2.astype(x.dtype), precision=prec) \
            + b2.astype(x.dtype)


class LayerScale(nn.Module):
    dim: int
    init: float

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(self.init),
                           (self.dim,), jnp.float32)
        return x * gamma.astype(x.dtype)


class Block(nn.Module):
    cfg: ModelConfig
    act: str = "gelu"
    use_flash: Optional[bool] = None

    @nn.compact
    def __call__(self, x, kv_valid: Optional[int] = None):
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=1e-5,
                                       dtype=jnp.dtype(cfg.norm_dtype),
                                       param_dtype=jnp.float32, name=name)
        y = ln("ln1")(x).astype(x.dtype)
        y = MHA(cfg, use_flash=self.use_flash, name="attn")(y, kv_valid)
        if cfg.layer_scale_init is not None:
            y = LayerScale(cfg.width, cfg.layer_scale_init, name="ls1")(y)
        x = x + y
        y = ln("ln2")(x).astype(x.dtype)
        y = MLP(cfg, act=self.act, name="mlp")(y)
        if cfg.layer_scale_init is not None:
            y = LayerScale(cfg.width, cfg.layer_scale_init, name="ls2")(y)
        return x + y


class AttentionPool(nn.Module):
    """Probe attention pooling (PE-Core head): a learned query attends
    over all tokens; output is the pooled feature.

    With `mask_bias` [B, R, S], the probe is broadcast to R query slots,
    each attending under its own additive bias — this is the fused masked
    ROI pooling path: R region embeddings in one attention call, sharing
    the pooling-head weights (SURVEY.md north star; the reference instead
    reused the global embedding per region, core_system.py:406)."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, mask_bias=None):  # [B, S, W] -> [B, W] | [B, R, W]
        cfg = self.cfg
        w, h = cfg.width, cfg.num_heads
        hd = w // h
        pd = jnp.dtype(cfg.param_dtype)
        probe = self.param("probe", nn.initializers.normal(0.02), (1, 1, w),
                           jnp.float32)
        ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="ln")
        r = 1 if mask_bias is None else mask_bias.shape[1]
        xq = jnp.broadcast_to(probe.astype(x.dtype), (x.shape[0], r, w))
        dense = lambda name: nn.Dense(w, dtype=x.dtype, param_dtype=pd, name=name)
        q = dense("q_proj")(xq)
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)

        def split(t):
            b, s, _ = t.shape
            return t.reshape(b, s, h, hd).transpose(0, 2, 1, 3)

        if mask_bias is None:
            # 1-query attention: XLA path (flash kernel pads 1 -> 128 queries)
            o = attention(split(q), split(k), split(v), use_flash=False)
        else:
            qh, kh, vh = split(q), split(k), split(v)
            # per-dtype precision: default-precision f32 dots run one
            # bf16 MXU pass on TPU (the documented trap), which would
            # silently degrade exact-parity f32 region pooling
            prec = _dot_precision(x.dtype)
            s = jnp.einsum("bhrd,bhsd->bhrs", qh, kh,
                           precision=prec).astype(jnp.float32)
            s = s * (hd ** -0.5) + mask_bias[:, None, :, :]
            p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
            o = jnp.einsum("bhrs,bhsd->bhrd", p, vh, precision=prec)
        o = o.transpose(0, 2, 1, 3).reshape(x.shape[0], r, w)
        o = dense("out_proj")(o)
        o = ln(o).astype(x.dtype)
        return o[:, 0, :] if mask_bias is None else o


class VisionTransformer(nn.Module):
    """Config-driven ViT producing image embeddings.

    __call__ returns the final embedding [B, embed_dim] (pre-normalization;
    the engine L2-normalizes, matching reference core_system.py:407,447).
    `features()` returns token features [B, S, width] for region pooling.
    """
    cfg: ModelConfig
    act: str = "gelu"
    use_ln_pre: bool = False
    patch_bias: bool = True
    use_flash: Optional[bool] = None
    # pad the token sequence once to a 128-multiple and carry it through
    # every block (masked attention): kills the per-layer pad/slice
    # relayouts the flash kernel would otherwise do 24x (PERF.md)
    pad_seq: bool = False

    @nn.compact
    def __call__(self, images, *, return_tokens: bool = False,
                 region_masks=None):
        """region_masks [B, R, P] (patch-grid weights, no CLS slot): also
        return fused masked-ROI region embeddings [B, R, embed_dim]."""
        cfg = self.cfg
        pd = jnp.dtype(cfg.param_dtype)
        dtype = jnp.dtype(cfg.dtype)
        x = images.astype(dtype)
        if x.shape[1] == 3 and x.shape[-1] != 3:
            x = x.transpose(0, 2, 3, 1)       # NCHW -> NHWC
        b = x.shape[0]

        x = nn.Conv(cfg.width, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    padding="VALID", use_bias=self.patch_bias,
                    dtype=dtype, param_dtype=pd, name="patch_embed")(x)
        x = x.reshape(b, -1, cfg.width)       # [B, P, W]

        if cfg.use_cls_token:
            cls = self.param("cls_token", nn.initializers.normal(0.02),
                             (1, 1, cfg.width), jnp.float32)
            x = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(dtype), (b, 1, cfg.width)), x],
                axis=1)

        if cfg.use_abs_pos:
            pos = self.param("pos_embed", nn.initializers.normal(0.02),
                             (1, cfg.seq_len, cfg.width), jnp.float32)
            x = x + pos.astype(dtype)

        if self.use_ln_pre:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                             param_dtype=jnp.float32,
                             name="ln_pre")(x).astype(dtype)

        s_valid = x.shape[1]
        kv_valid = None
        if self.pad_seq:
            s_pad = -(-s_valid // 128) * 128
            if s_pad != s_valid:
                x = jnp.pad(x, ((0, 0), (0, s_pad - s_valid), (0, 0)))
                kv_valid = s_valid

        for i in range(cfg.depth):
            x = Block(cfg, act=self.act, use_flash=self.use_flash,
                      name=f"block{i}")(x, kv_valid)

        tokens = x
        region_emb = None
        if cfg.pool_type == "attn":
            if cfg.use_ln_post:
                tokens_n = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                        param_dtype=jnp.float32,
                                        name="ln_post")(tokens).astype(dtype)
            else:
                tokens_n = tokens
            # no use_flash knob: the pool is 1 (or R) queries — the
            # flash kernel would pad to 128; the XLA/einsum paths are
            # the right shape here regardless of backend
            pool = AttentionPool(cfg, name="attn_pool")
            if kv_valid is None:
                pooled = pool(tokens_n)
            else:
                pos = jax.lax.broadcasted_iota(
                    jnp.int32, (1, 1, tokens_n.shape[1]), 2)
                vbias = jnp.where(pos < kv_valid, 0.0, -1e9)
                vbias = jnp.broadcast_to(
                    vbias, (tokens_n.shape[0], 1, tokens_n.shape[1]))
                pooled = pool(tokens_n, vbias)[:, 0, :]
            if region_masks is not None:
                rbias = self._region_bias(region_masks, cfg)
                pad = tokens_n.shape[1] - rbias.shape[-1]
                if pad > 0:
                    rbias = jnp.pad(rbias, ((0, 0), (0, 0), (0, pad)),
                                    constant_values=-1e9)
                region_emb = pool(tokens_n, rbias)
        elif cfg.pool_type == "cls":
            pooled = tokens[:, 0, :]   # pad rows never reach position 0
            if cfg.use_ln_post:
                pooled = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                      param_dtype=jnp.float32,
                                      name="ln_post")(pooled).astype(dtype)
            if region_masks is not None:
                region_emb = self._masked_mean(tokens[:, :s_valid],
                                               region_masks, cfg)
        elif cfg.pool_type == "mean":
            pooled = tokens[:, :s_valid].mean(axis=1)
            if cfg.use_ln_post:
                pooled = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                      param_dtype=jnp.float32,
                                      name="ln_post")(pooled).astype(dtype)
            if region_masks is not None:
                region_emb = self._masked_mean(tokens[:, :s_valid],
                                               region_masks, cfg)
        else:
            raise ValueError(cfg.pool_type)

        # both PE and CLIP end in a (bias-free) visual projection
        proj = nn.Dense(cfg.embed_dim, use_bias=False, dtype=dtype,
                        param_dtype=pd, name="proj")
        pooled = proj(pooled)
        if region_emb is not None:
            region_emb = proj(region_emb)
            if return_tokens:
                return pooled, region_emb, tokens[:, :s_valid]
            return pooled, region_emb
        if return_tokens:
            return pooled, tokens[:, :s_valid]
        return pooled

    @staticmethod
    def _region_bias(region_masks, cfg):
        """[B, R, P] weights -> additive attention bias over the token
        sequence (CLS slot masked out; empty masks fall back to uniform
        so pooling stays finite — callers drop empty regions anyway,
        matching reference core_system.py:402-404)."""
        empty = jnp.sum(region_masks, axis=-1, keepdims=True) <= 0
        m = jnp.where(empty, 1.0, region_masks)
        bias = jnp.where(m > 0, 0.0, -1e9)
        if cfg.use_cls_token:
            cls_bias = jnp.full(bias.shape[:2] + (1,), -1e9, bias.dtype)
            bias = jnp.concatenate([cls_bias, bias], axis=-1)
        return bias

    @staticmethod
    def _masked_mean(tokens, region_masks, cfg):
        if cfg.use_cls_token:
            tokens = tokens[:, 1:, :]
        w = region_masks.astype(jnp.float32)
        denom = jnp.maximum(w.sum(-1, keepdims=True), 1e-6)
        out = jnp.einsum("brp,bpw->brw", w / denom,
                         tokens.astype(jnp.float32))
        return out.astype(tokens.dtype)
