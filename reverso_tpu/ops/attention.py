"""Multi-head attention: Pallas flash kernel + XLA reference.

The reference's PE ViT forward runs through PyTorch SDPA inside
`pe_model.encode_image` (reference core_system.py:341). Here attention is
a first-class op with two interchangeable implementations:

  * `attention_xla` — plain dot-product attention, the parity reference
    and CPU path;
  * `flash_attention` — a Pallas kernel with online softmax: per (batch,
    head) the query tile loops over key/value tiles keeping running
    (max, sum, acc) in fp32, so the [S, S] probability matrix never hits
    HBM. Non-causal (ViT), with optional key-padding mask via `kv_valid`.

Both take [B, H, S, D] and return [B, H, S, D].
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .topk import _round_up, _pad_dim, _dot_precision


def attention_xla(q, k, v, *, kv_valid: Optional[int] = None, scale=None):
    """Reference attention. q,k,v: [B, H, S, D] (kv may have S_kv != S_q)."""
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   precision=_dot_precision(q.dtype)).astype(jnp.float32)
    s = s * scale
    if kv_valid is not None:
        kpos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
        s = jnp.where(kpos < kv_valid, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      precision=_dot_precision(q.dtype))


# ---------------------------------------------------------------------------
# Pallas flash attention (non-causal, inference)
# ---------------------------------------------------------------------------

def _flash_fullseq_kernel(q_ref, k_ref, v_ref, o_ref, *,
                          scale: float, kv_valid: int, heads: int):
    """One program handles `heads` head-instances with the WHOLE sequence
    resident in VMEM (ViT sequences are short: 577-1025 tokens, so the
    [S, S] score tile fits). Few large programs beat many tiny ones: the
    per-program pipeline overhead dominated the tiled variant at this
    size. Online softmax is unnecessary when S fits — single-shot
    max/exp/sum keeps everything in registers/VMEM."""
    for h in range(heads):
        q = q_ref[h]                   # [S, D]
        k = k_ref[h]
        v = v_ref[h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(q.dtype))          # [S, S] fp32
        s = s * scale
        if kv_valid < s.shape[1]:
            kpos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kpos < kv_valid, s, -jnp.inf)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(q.dtype))
        o_ref[h] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "kv_valid",
                                             "interpret", "heads_per_prog"))
def _flash_fullseq_jit(q, k, v, *, scale: float, kv_valid: int,
                       interpret: bool, heads_per_prog: int):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    d_p = _round_up(d, 128)
    s_p = _round_up(max(sq, skv), 128)

    def prep(x):
        return _pad_dim(_pad_dim(x, 3, d_p), 2, s_p).reshape(b * h, s_p, d_p)

    qp, kp, vp = prep(q), prep(k), prep(v)
    bh = b * h
    hp = heads_per_prog
    while bh % hp:
        hp -= 1

    kernel = functools.partial(_flash_fullseq_kernel, scale=scale,
                               kv_valid=kv_valid, heads=hp)
    out = pl.pallas_call(
        kernel,
        grid=(bh // hp,),
        in_specs=[
            pl.BlockSpec((hp, s_p, d_p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, s_p, d_p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, s_p, d_p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hp, s_p, d_p), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, s_p, d_p), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * s_p * s_p * d_p,
            bytes_accessed=4 * bh * s_p * d_p * q.dtype.itemsize,
            transcendentals=bh * s_p * s_p,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, s_p, d_p)[:, :, :sq, :d]


# VMEM budget: 4 arrays x hp x S x D bf16 + [S, S] fp32 scores must fit
# ~12 MB. For S=640, D=128: hp=8 -> 4*8*640*128*2 = 5.2 MB + 1.6 MB. For
# S~1024: hp=4.
_FULLSEQ_MAX_S = 2048


def _flash_kernel(q_ref, k_ref, v_ref, bh_ref, bw_ref, o_ref, *,
                  scale: float, kv_blocks: int, kv_tile: int,
                  kv_valid: int, kv_len: int, rel_grid: int):
    """One (batch*head, q_tile) program: online-softmax over kv tiles.

    rel_grid > 0 enables SAM-style decomposed relative-position bias:
    key position k on a G x G grid decomposes as (ky, kx) = (k//G, k%G)
    and bias[q, k] = bh[q, ky] + bw[q, kx]. The [TQ, TK] bias tile is
    built as two tiny matmuls against static 0/1 selection masks — the
    full [S, S] bias never exists anywhere (the XLA path materializes
    [heads, 4096, 4096] at SAM global shapes, the whole cost of those
    layers)."""
    q = q_ref[0]                       # [TQ, D]
    tq, d = q.shape
    m = jnp.full((tq, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((tq, 1), jnp.float32)
    acc = jnp.zeros((tq, d), jnp.float32)

    # rel-bias (SAM) path: DEFAULT precision on the big dots — one bf16
    # MXU pass for f32 inputs, which is exactly what the XLA einsum
    # baseline silently does on TPU (PERF.md precision trap); HIGHEST
    # would cost 6 passes for accuracy the baseline never had. The
    # non-bias path keeps the per-dtype HIGHEST contract (PE parity).
    dot_prec = (jax.lax.Precision.DEFAULT if rel_grid
                else _dot_precision(q.dtype))
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    if rel_grid:
        g = rel_grid
        assert kv_tile % g == 0, (kv_tile, g)
        # [TQ, 2G]: ky-bias columns then kx-bias columns (loop-invariant)
        b2 = jnp.concatenate([bh_ref[0], bw_ref[0]],
                             axis=1).astype(jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (2 * g, kv_tile), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (2 * g, kv_tile), 0)

    for i in range(kv_blocks):
        lo = i * kv_tile
        kb = k_ref[0, lo:lo + kv_tile, :]          # [TK, D]
        vb = v_ref[0, lo:lo + kv_tile, :]
        s = jax.lax.dot_general(
            qs, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_prec)                     # [TQ, TK]
        if rel_grid:
            # one [2G, TK] 0/1 selector: rows < G pick ky == r
            # ((lo+t)//G), rows >= G pick kx == r-G (t % G); the bias
            # tile lands in ONE 128-contraction MXU pass. (Casts go
            # bool->f32 per compare: Mosaic rejects an i1 select
            # followed by truncation.)
            sel_h = ((col + lo) // g == row).astype(jnp.float32)
            sel_w = (col % g == row - g).astype(jnp.float32)
            sel = jnp.where(row < g, sel_h, sel_w)
            s = s + jax.lax.dot_general(
                b2, sel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        if lo + kv_tile > kv_valid:                 # static: mask pad keys
            kpos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + lo
            s = jnp.where(kpos < kv_valid, s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(q.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_prec)
        m = m_new

    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "scale", "q_tile", "kv_tile", "kv_valid", "interpret", "rel_grid"))
def _flash_jit(q, k, v, bias_h, bias_w, *, scale: float, q_tile: int,
               kv_tile: int, kv_valid: int, interpret: bool,
               rel_grid: int = 0):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    d_p = _round_up(d, 128)
    sq_p = _round_up(sq, q_tile)
    skv_p = _round_up(skv, kv_tile)

    qp = _pad_dim(_pad_dim(q, 3, d_p), 2, sq_p).reshape(b * h, sq_p, d_p)
    kp = _pad_dim(_pad_dim(k, 3, d_p), 2, skv_p).reshape(b * h, skv_p, d_p)
    vp = _pad_dim(_pad_dim(v, 3, d_p), 2, skv_p).reshape(b * h, skv_p, d_p)
    if rel_grid:
        bh_p = _pad_dim(bias_h, 2, sq_p).reshape(b * h, sq_p, rel_grid)
        bw_p = _pad_dim(bias_w, 2, sq_p).reshape(b * h, sq_p, rel_grid)
    else:
        bh_p = bw_p = jnp.zeros((b * h, sq_p, 8), q.dtype)
    gdim = bh_p.shape[2]

    kernel = functools.partial(
        _flash_kernel, scale=scale, kv_blocks=skv_p // kv_tile,
        kv_tile=kv_tile, kv_valid=kv_valid, kv_len=skv_p,
        rel_grid=rel_grid)

    out = pl.pallas_call(
        kernel,
        grid=(b * h, sq_p // q_tile),
        in_specs=[
            pl.BlockSpec((1, q_tile, d_p), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_p, d_p), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_p, d_p), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_tile, gdim), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_tile, gdim), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_tile, d_p), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, d_p), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_p * skv_p * d_p,
            bytes_accessed=(qp.size + kp.size + vp.size + out_size(b, h, sq_p, d_p))
                           * q.dtype.itemsize,
            transcendentals=b * h * sq_p * skv_p,
        ),
        interpret=interpret,
    )(qp, kp, vp, bh_p, bw_p)
    return out.reshape(b, h, sq_p, d_p)[:, :, :sq, :d]


def out_size(b, h, s, d):
    return b * h * s * d


def flash_attention(q, k, v, *, kv_valid: Optional[int] = None,
                    scale: Optional[float] = None,
                    q_tile: int = 256, kv_tile: int = 256,
                    rel_bias=None,
                    interpret: Optional[bool] = None):
    """Flash attention over [B, H, S, D]. `kv_valid` masks trailing pad keys
    (static int — ViT sequences have fixed length).

    rel_bias=(bias_h [B, H, Sq, G], bias_w [B, H, Sq, G], G) adds
    SAM-style decomposed relative-position bias
    bias[q, (ky, kx)] = bias_h[q, ky] + bias_w[q, kx] for keys on a
    G x G grid (Skv == G*G), without ever materializing [Sq, Skv]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    d = q.shape[-1]
    skv = k.shape[2]
    scale = float(scale) if scale is not None else d ** -0.5
    kv_valid = int(kv_valid) if kv_valid is not None else skv
    if rel_bias is not None:
        bias_h, bias_w, grid = rel_bias
        assert skv == grid * grid, (skv, grid)
        kv_tile = min(kv_tile, _round_up(skv, 128))
        assert kv_tile % grid == 0, (kv_tile, grid)
        return _flash_jit(q, k, v, bias_h, bias_w, scale=scale,
                          q_tile=min(q_tile, _round_up(q.shape[2], 128)),
                          kv_tile=kv_tile, kv_valid=kv_valid,
                          interpret=interpret, rel_grid=grid)
    s_max = max(q.shape[2], skv)
    if s_max <= _FULLSEQ_MAX_S:
        s_p = _round_up(s_max, 128)
        d_p = _round_up(d, 128)
        # pick heads_per_prog to fit VMEM: 4 blocks (q, k, v, out), each
        # DOUBLE-buffered by the pipeline, plus the [S, S] fp32 score
        # temporaries (~2 live at once)
        budget = 12 * 2**20 - 2 * s_p * s_p * 4
        per_head = 2 * 4 * s_p * d_p * q.dtype.itemsize
        if budget >= per_head:
            hp = min(16, budget // per_head)
            return _flash_fullseq_jit(q, k, v, scale=scale,
                                      kv_valid=kv_valid,
                                      interpret=interpret,
                                      heads_per_prog=int(hp))
        # budget < one head: the [S, S] temporaries alone are too big
        # for fullseq (S roughly > 1250) — stream KV via the tiled
        # kernel instead of launching a VMEM-infeasible program
    q_tile = min(q_tile, _round_up(q.shape[2], 128))
    kv_tile = min(kv_tile, _round_up(skv, 128))
    return _flash_jit(q, k, v, None, None, scale=scale, q_tile=q_tile,
                      kv_tile=kv_tile, kv_valid=kv_valid,
                      interpret=interpret)


def attention(q, k, v, *, kv_valid: Optional[int] = None,
              scale: Optional[float] = None, use_flash: Optional[bool] = None):
    """Dispatch: flash kernel on TPU, XLA reference elsewhere."""
    if use_flash is None:
        use_flash = jax.default_backend() == "tpu"
    if use_flash:
        return flash_attention(q, k, v, kv_valid=kv_valid, scale=scale)
    return attention_xla(q, k, v, kv_valid=kv_valid, scale=scale)


# ---------------------------------------------------------------------------
# Heads-in-lanes flash attention: consumes [B, S, W] directly
# ---------------------------------------------------------------------------
#
# The [B,S,W] -> [B,H,S,hd] head transposes around attention cost ~4 HBM
# round trips of the activation per layer; this kernel slices heads out
# of the lane dimension inside VMEM instead, and applies 2D RoPE in-kernel
# (saving two more fp32 round trips). One program per batch element with
# the full (short) ViT sequence resident.

def _flash_heads_kernel(q_ref, k_ref, v_ref, cos_ref, sin_ref, o_ref, *,
                        heads: int, head_dim: int, scale: float,
                        kv_valid: int, s_real: int, use_rope: bool):
    # Per-[S,S] VPU passes are the cost here (the matmuls are cheap at
    # ViT sizes), so everything avoidable is folded off that matrix:
    #   * the softmax scale multiplies q (or its RoPE tables) pre-matmul
    #     — [S, hd] work instead of an [S, S] pass;
    #   * the kernel's own seq padding is NOT masked: padded K/V rows are
    #     exactly zero, so they contribute s=0 -> exp(-m) to the softmax
    #     denominator and 0 to o; one scalar-column correction on l
    #     replaces the iota+where passes. A caller-provided kv_valid <
    #     s_real still takes the exact masking path (pre-padded inputs
    #     may carry nonzero rows, e.g. LN bias over pad tokens).
    s_len = q_ref.shape[1]
    n_zero_pad = s_len - s_real
    lanes = 128
    hp = max(1, lanes // head_dim)      # heads per 128-lane group

    def one_head(q, k, v):
        if use_rope:
            cos = cos_ref[...]
            sin = sin_ref[...]

            def rot(x, scl):
                x32 = x.astype(jnp.float32)
                qh = head_dim // 4
                a = x32[:, :qh]
                b = x32[:, qh:2 * qh]
                c = x32[:, 2 * qh:3 * qh]
                e = x32[:, 3 * qh:]
                half = jnp.concatenate([-b, a, -e, c], axis=-1)
                return ((x32 * cos + half * sin) * scl).astype(x.dtype)

            q = rot(q, scale)
            k = rot(k, 1.0)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(q.dtype))
        if not use_rope:
            s = s * scale
        if kv_valid < s_real:
            kpos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kpos < kv_valid, s, -jnp.inf)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        if kv_valid >= s_real and n_zero_pad > 0:
            # Sum the REAL column range only (static slice — the same
            # single reduction pass, just narrower). The previous
            # l_total - n_pad*exp(-m) correction was mathematically
            # exact but cancelled catastrophically in f32 when every
            # real score was << 0 (pad columns pin m at 0), producing
            # Inf/NaN embeddings in that degenerate regime.
            # Known bound of this fast path: with pad columns pinning
            # m at 0, real-score probabilities pass through the
            # p.astype(q.dtype) cast below, so scores below ~-87
            # underflow bf16 exp and the output decays toward 0 (no
            # Inf/NaN). Softmax logits of trained towers are O(10);
            # reaching -87 means the inputs are already garbage.
            l = jnp.sum(p[:, :s_real], axis=1, keepdims=True)
        else:
            l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(q.dtype))
        return (o / l).astype(o_ref.dtype)

    # Head scheduling: a fully unrolled python loop lets Mosaic
    # interleave ALL heads' [S, S] fp32 score temporaries and blow the
    # VMEM stack at ViT-L sizes (28 MB for the no-RoPE tower), while a
    # strict per-head fori_loop serializes the MXU/VPU overlap away
    # (276 -> 61 img/s measured). Chunks of 4 heads — fori across
    # chunks (bounds liveness), unrolled within (keeps the overlap).
    # RoPE's per-head dependency chains keep the stack bounded at 8;
    # the no-RoPE tower needs 4 (8 OOMs the VMEM stack at ViT-L).
    max_chunk = 8 if use_rope else 4
    chunk_h = next((c for c in (max_chunk, 4, 2) if heads % c == 0), hp)
    chunk = chunk_h * head_dim
    if chunk % lanes == 0 and heads % chunk_h == 0:
        def group(j, _):
            lo = pl.multiple_of(j * chunk, lanes)
            qg = q_ref[0, :, pl.ds(lo, chunk)]
            kg = k_ref[0, :, pl.ds(lo, chunk)]
            vg = v_ref[0, :, pl.ds(lo, chunk)]
            outs = [one_head(qg[:, hh * head_dim:(hh + 1) * head_dim],
                             kg[:, hh * head_dim:(hh + 1) * head_dim],
                             vg[:, hh * head_dim:(hh + 1) * head_dim])
                    for hh in range(chunk_h)]
            o_ref[0, :, pl.ds(lo, chunk)] = (
                outs[0] if chunk_h == 1 else jnp.concatenate(outs, axis=1))
            return 0

        jax.lax.fori_loop(0, heads // chunk_h, group, 0)
    else:
        # odd head layout: static per-head slices (small models only)
        for h in range(heads):
            lo = h * head_dim
            o_ref[0, :, lo:lo + head_dim] = one_head(
                q_ref[0, :, lo:lo + head_dim],
                k_ref[0, :, lo:lo + head_dim],
                v_ref[0, :, lo:lo + head_dim])


# Sequence pad multiple for the heads-in-lanes kernel. Sublane (row)
# dims only need 8-alignment on TPU; padding S to 128 inflates the
# [S, S] softmax area by (640/584)^2 - 1 = 20% at ViT-L/14-336 shapes
# (S=577). Lane dims of intermediates still round to 128 vregs inside
# Mosaic either way. Module-level so A/B scripts can flip it.
_SEQ_PAD = 8


@functools.partial(jax.jit, static_argnames=("heads", "scale", "kv_valid",
                                             "use_rope", "interpret",
                                             "seq_pad"))
def _flash_heads_jit(q, k, v, cos, sin, *, heads: int, scale: float,
                     kv_valid: int, use_rope: bool, interpret: bool,
                     seq_pad: int = 8):
    b, s, w = q.shape
    hd = w // heads
    s_p = _round_up(s, seq_pad)
    qp = _pad_dim(q, 1, s_p)
    kp = _pad_dim(k, 1, s_p)
    vp = _pad_dim(v, 1, s_p)
    cos_p = _pad_dim(cos, 0, s_p) if use_rope else jnp.zeros((1, hd), jnp.float32)
    sin_p = _pad_dim(sin, 0, s_p) if use_rope else jnp.zeros((1, hd), jnp.float32)

    kernel = functools.partial(
        _flash_heads_kernel, heads=heads, head_dim=hd, scale=scale,
        kv_valid=min(kv_valid, s), s_real=s, use_rope=use_rope)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s_p, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_p, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_p, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_p, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_p, w), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * s_p * s_p * hd,
            bytes_accessed=4 * b * s_p * w * q.dtype.itemsize,
            transcendentals=b * heads * s_p * s_p,
        ),
        interpret=interpret,
    )(qp, kp, vp, cos_p, sin_p)
    return out[:, :s]


def flash_attention_heads(q, k, v, *, heads: int, cos=None, sin=None,
                          scale: Optional[float] = None,
                          kv_valid: Optional[int] = None,
                          interpret: Optional[bool] = None):
    """Flash attention over [B, S, W] with heads sliced from lanes and
    optional in-kernel 2D RoPE (cos/sin [S, head_dim] tables)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, s, w = q.shape
    hd = w // heads
    scale = float(scale) if scale is not None else hd ** -0.5
    use_rope = cos is not None
    cos_a = jnp.asarray(cos, jnp.float32) if use_rope else None
    sin_a = jnp.asarray(sin, jnp.float32) if use_rope else None
    # `is not None`, not truthiness: kv_valid=0 must mean "zero valid
    # keys" (fully masked), matching flash_attention's handling
    return _flash_heads_jit(q, k, v, cos_a, sin_a, heads=heads, scale=scale,
                            kv_valid=(int(kv_valid) if kv_valid is not None
                                      else s),
                            use_rope=use_rope, interpret=interpret,
                            seq_pad=_SEQ_PAD)
