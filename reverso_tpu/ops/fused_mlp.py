"""Fused transformer-MLP inference kernel.

y = gelu(x @ W1 + b1) @ W2 + b2, computed without materializing the 4x
hidden activations in HBM: the kernel tiles rows of x and streams the
hidden dimension in chunks, accumulating the second matmul in fp32 VMEM
scratch. At ViT-L batch sizes the hidden tensor is ~150 MB per layer
(~0.6 ms of HBM round-trip each at v5e bandwidth); fusing removes it.

Part of the north-star kernel set (BASELINE.json: "Pallas
flash-attention + fused-MLP inference kernel").
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .topk import _round_up, _pad_dim, _dot_precision
# shared quantization definitions (ops/quant.py) so the fused int8 path
# and int8_linear can never silently diverge; quantize_rows_int8 is
# plain jnp math and runs inside the kernel too
from .quant import quantize_rows_int8 as _quant_rows
from .quant import quantize_weight_int8 as _quant_weight


def mlp_xla(x, w1, b1, w2, b2, act: str = "gelu"):
    """Reference implementation (also the CPU path)."""
    h = jnp.dot(x, w1, preferred_element_type=jnp.float32,
                precision=_dot_precision(x.dtype))
    h = h + b1.astype(jnp.float32)
    if act == "gelu":
        h = jax.nn.gelu(h, approximate=False)
    elif act == "quick_gelu":
        h = h * jax.nn.sigmoid(1.702 * h)
    else:
        raise ValueError(act)
    h = h.astype(x.dtype)
    y = jnp.dot(h, w2, preferred_element_type=jnp.float32,
                precision=_dot_precision(x.dtype))
    return (y + b2.astype(jnp.float32)).astype(x.dtype)


def _erf_poly(x):
    """Abramowitz & Stegun 7.1.26 erf approximation (|err| <= 1.5e-7).
    Mosaic has no erf/erfc lowering; this composes from exp only."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
               + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exactish(x):
    """erf-based gelu matching jax.nn.gelu(approximate=False) to ~1e-6."""
    return 0.5 * x * (1.0 + _erf_poly(x * 0.7071067811865476))


def _fused_mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, acc,
                      *, act: str):
    ci = pl.program_id(1)
    n_c = pl.num_programs(1)

    @pl.when(ci == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    h = jax.lax.dot_general(
        x_ref[:], w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(x_ref.dtype))
    h = h + b1_ref[:].astype(jnp.float32)
    if act == "gelu":
        h = _gelu_exactish(h)
    else:  # quick_gelu
        h = h * jax.nn.sigmoid(1.702 * h)
    h = h.astype(x_ref.dtype)
    acc[:] += jax.lax.dot_general(
        h, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(x_ref.dtype))

    @pl.when(ci == n_c - 1)
    def _():
        o_ref[:] = (acc[:] + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _fused_mlp_int8_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                           b2_ref, o_ref, acc, x8, xs, *, act: str):
    """int8-dynamic variant: both matmuls run s8 x s8 -> s32 on the MXU
    (2x bf16 FLOPs, 397 vs 197 TOP/s measured). x is quantized per-row
    ONCE per row tile (ci == 0, kept in VMEM scratch); the hidden
    activation re-quantizes per (row, chunk) — each chunk's partial is
    dequantized in f32 before accumulation, so per-chunk scales are
    exact. Accuracy: ~1% relative noise per dot (ops/quant.py) — an
    opt-in speed knob, never a parity path.
    """
    ci = pl.program_id(1)
    n_c = pl.num_programs(1)

    @pl.when(ci == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        q, s = _quant_rows(x_ref[:].astype(jnp.float32))
        x8[:] = q
        xs[:] = s

    h32 = jax.lax.dot_general(
        x8[:], w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    h = h32.astype(jnp.float32) * (xs[:] * s1_ref[:])
    h = h + b1_ref[:].astype(jnp.float32)
    if act == "gelu":
        h = _gelu_exactish(h)
    else:  # quick_gelu
        h = h * jax.nn.sigmoid(1.702 * h)
    h8, hs = _quant_rows(h)
    y32 = jax.lax.dot_general(
        h8, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc[:] += y32.astype(jnp.float32) * (hs * s2_ref[:])

    @pl.when(ci == n_c - 1)
    def _():
        o_ref[:] = (acc[:] + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("act", "row_tile", "hidden_tile",
                                             "interpret", "t_out", "quant"))
def _fused_mlp_jit(x, w1, b1, w2, b2, *, act: str, row_tile: int,
                   hidden_tile: int, interpret: bool, t_out: int,
                   quant: bool = False):
    t, w = x.shape
    hid = w1.shape[1]
    w_p = _round_up(w, 128)
    hid_p = _round_up(hid, hidden_tile)
    t_p = _round_up(t, row_tile)

    x_p = _pad_dim(_pad_dim(x, 1, w_p), 0, t_p)
    w1_p = _pad_dim(_pad_dim(w1, 0, w_p), 1, hid_p)
    b1_p = _pad_dim(b1.reshape(1, -1), 1, hid_p)
    w2_p = _pad_dim(_pad_dim(w2, 0, hid_p), 1, w_p)
    b2_p = _pad_dim(b2.reshape(1, -1), 1, w_p)

    grid = (t_p // row_tile, hid_p // hidden_tile)
    x_spec = pl.BlockSpec((row_tile, w_p), lambda ti, ci: (ti, 0),
                          memory_space=pltpu.VMEM)
    w1_spec = pl.BlockSpec((w_p, hidden_tile), lambda ti, ci: (0, ci),
                           memory_space=pltpu.VMEM)
    b1_spec = pl.BlockSpec((1, hidden_tile), lambda ti, ci: (0, ci),
                           memory_space=pltpu.VMEM)
    w2_spec = pl.BlockSpec((hidden_tile, w_p), lambda ti, ci: (ci, 0),
                           memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, w_p), lambda ti, ci: (0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((row_tile, w_p), lambda ti, ci: (ti, 0),
                            memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=4 * t_p * w_p * hid_p,
        bytes_accessed=(t_p * w_p * 2 + w_p * hid_p * 2) * x.dtype.itemsize,
        transcendentals=t_p * hid_p,
    )
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"))

    if quant:
        # per-output-column weight quantization in XLA, once per call —
        # O(W*hid), noise vs the O(T*W*hid) matmuls; shared
        # quantize_weight_int8 so this path and int8_linear use ONE
        # quantization definition (pad columns are all-zero -> the
        # clamp keeps them finite)
        w1_8, s1 = _quant_weight(w1_p)
        w2_8, s2 = _quant_weight(w2_p)
        out = pl.pallas_call(
            functools.partial(_fused_mlp_int8_kernel, act=act),
            grid=grid,
            in_specs=[x_spec, w1_spec, b1_spec, b1_spec, w2_spec,
                      row_spec, row_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((t_p, w_p), x.dtype),
            scratch_shapes=[pltpu.VMEM((row_tile, w_p), jnp.float32),
                            pltpu.VMEM((row_tile, w_p), jnp.int8),
                            pltpu.VMEM((row_tile, 1), jnp.float32)],
            compiler_params=params, cost_estimate=cost,
            interpret=interpret,
        )(x_p, w1_8, s1, b1_p, w2_8, s2, b2_p)
        return out[:t_out, :w]

    kernel = functools.partial(_fused_mlp_kernel, act=act)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[x_spec, w1_spec, b1_spec, w2_spec, row_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((t_p, w_p), x.dtype),
        scratch_shapes=[pltpu.VMEM((row_tile, w_p), jnp.float32)],
        compiler_params=params,
        cost_estimate=cost,
        interpret=interpret,
    )(x_p, w1_p, b1_p, w2_p, b2_p)
    return out[:t_out, :w]


def fused_mlp(x, w1, b1, w2, b2, *, act: str = "gelu",
              row_tile: int = 512, hidden_tile: int = 512,
              interpret: Optional[bool] = None, quant: bool = False):
    """Fused MLP over [..., T, W] inputs (leading dims flattened).

    `quant=True` runs both matmuls s8 x s8 -> s32 on the MXU (2x bf16
    FLOPs): weights per-output-column quantized once per call,
    activations per-row dynamically in-kernel. ~1% relative noise per
    dot (ops/quant.py accuracy model) — opt-in throughput knob.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # the kernel's output block is sized from the INPUT width, so a
    # non-square MLP (w2 wider than x) would be silently truncated —
    # make the latent contract explicit
    if w1.shape[0] != x.shape[-1] or w2.shape[1] != x.shape[-1] \
            or w1.shape[1] != w2.shape[0]:
        raise ValueError(
            f"fused_mlp requires a square MLP (w1 [{x.shape[-1]}, H], "
            f"w2 [H, {x.shape[-1]}]); got w1 {w1.shape}, w2 {w2.shape}")
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    out = _fused_mlp_jit(x2, w1, b1, w2, b2, act=act, row_tile=row_tile,
                         hidden_tile=hidden_tile, interpret=interpret,
                         t_out=x2.shape[0], quant=quant)
    return out.reshape(shape)
