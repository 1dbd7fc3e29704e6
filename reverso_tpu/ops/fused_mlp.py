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


@functools.partial(jax.jit, static_argnames=("act", "row_tile", "hidden_tile",
                                             "interpret", "t_out"))
def _fused_mlp_jit(x, w1, b1, w2, b2, *, act: str, row_tile: int,
                   hidden_tile: int, interpret: bool, t_out: int):
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

    kernel = functools.partial(_fused_mlp_kernel, act=act)
    out = pl.pallas_call(
        kernel,
        grid=(t_p // row_tile, hid_p // hidden_tile),
        in_specs=[
            pl.BlockSpec((row_tile, w_p), lambda ti, ci: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_p, hidden_tile), lambda ti, ci: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden_tile), lambda ti, ci: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden_tile, w_p), lambda ti, ci: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w_p), lambda ti, ci: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, w_p), lambda ti, ci: (ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_p, w_p), x.dtype),
        scratch_shapes=[pltpu.VMEM((row_tile, w_p), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * t_p * w_p * hid_p,
            bytes_accessed=(t_p * w_p * 2 + w_p * hid_p * 2) * x.dtype.itemsize,
            transcendentals=t_p * hid_p,
        ),
        interpret=interpret,
    )(x_p, w1_p, b1_p, w2_p, b2_p)
    return out[:t_out, :w]


def fused_mlp(x, w1, b1, w2, b2, *, act: str = "gelu",
              row_tile: int = 512, hidden_tile: int = 512,
              interpret: Optional[bool] = None):
    """Fused MLP over [..., T, W] inputs (leading dims flattened)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    out = _fused_mlp_jit(x2, w1, b1, w2, b2, act=act, row_tile=row_tile,
                         hidden_tile=hidden_tile, interpret=interpret,
                         t_out=x2.shape[0])
    return out.reshape(shape)
