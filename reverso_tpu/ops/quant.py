"""Dynamic int8 quantized linear layers (XLA path).

The v5e MXU runs s8 x s8 -> s32 at 2x its bf16 FLOPs (measured 397 vs
197 TOP/s, `scripts/bench_mxu.py`). For inference matmuls that are
MXU-bound — the ViT tower's q/k/v/out projections and the MLP — an
int8 pass with dynamic per-row activation scales trades a small,
measured accuracy cost for up to 2x on the matmul itself. This module
is the XLA building block: weights are quantized ONCE per-output-column
at load, activations per-row on the fly (one amax pass + one quantize
pass, both fused by XLA into neighbouring elementwise work).

Accuracy model: per-row int8 keeps ~7 signed bits against the row's
abs-max; LayerNorm'd transformer activations are well-conditioned
(amax/sigma ~ 4-6), so typical elements keep ~5 bits vs bf16's 8-bit
per-element mantissa. Quantization noise enters from BOTH operands:
sqrt(d) * amax/(127*sqrt(12)) per side, ~1.1% mean relative error per
dot at d=1024 for Gaussian data (measured, tests/test_quant.py) —
NOT free; callers must measure end-metric drift (embedding cosine /
neighbor overlap) before enabling. See PERF.md "int8 activations".

Exactness of the arithmetic itself: s32 accumulation is exact while
d * 127 * 127 < 2^31 (d <= 133k — every shape here), and the f32
dequant multiply is correctly rounded. All quantizers use the
multiply-by-inverse form (f32 divide is not IEEE on TPU — see
`store/ivf.py::_gather_cluster_sorted`).

Reference behavior rebuilt: the torch reference runs fp32 CPU matmuls
(/root/reference/core_system.py:335,341); this is a TPU-native
throughput option beyond it, not a parity target.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def quantize_weight_int8(w):
    """Per-output-column symmetric int8 weight quantization.

    Returns (w8 [in, out] int8, w_scale [1, out] f32) with
    w ~= w8 * w_scale. Run once at model load; keep w_scale f32.
    """
    w32 = jnp.asarray(w, jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(w32), axis=0, keepdims=True),
                       1e-30)
    w8 = jnp.clip(jnp.round(w32 * (127.0 / amax)), -127,
                  127).astype(jnp.int8)
    return w8, amax / 127.0


def quantize_rows_int8(x):
    """Per-row dynamic symmetric int8 activation quantization.

    Returns (x8 [..., d] int8, x_scale [..., 1] f32).
    """
    x32 = jnp.asarray(x, jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True),
                       1e-30)
    x8 = jnp.clip(jnp.round(x32 * (127.0 / amax)), -127,
                  127).astype(jnp.int8)
    return x8, amax * (1.0 / 127.0)


def int8_linear(x, w8, w_scale, b: Optional[jnp.ndarray] = None,
                out_dtype=None):
    """y = x @ dequant(w8) + b with a single s8 MXU pass.

    `x` is quantized per-row on the fly; the s32 dot is exact and the
    result is dequantized in f32 as (row_scale * col_scale) * dot.
    Output dtype defaults to x.dtype.
    """
    out_dtype = out_dtype or x.dtype
    x8, xs = quantize_rows_int8(x)
    y = jax.lax.dot_general(x8, w8, (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (xs * w_scale)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(out_dtype)
