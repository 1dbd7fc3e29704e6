"""Normalization helpers shared by embed + search paths."""
from __future__ import annotations

import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along `axis` in fp32 then cast back.

    The reference normalizes every embedding before storage/search
    (core_system.py:407,447); cosine similarity then reduces to a dot
    product. fp32 norm accumulation keeps bf16 inputs stable.
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    n = jnp.sqrt(jnp.sum(x32 * x32, axis=axis, keepdims=True))
    return (x32 / jnp.maximum(n, eps)).astype(dtype)
