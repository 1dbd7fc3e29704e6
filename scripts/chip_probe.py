#!/usr/bin/env python
"""10-second chip duty-cycle probe for the time-shared tunnel TPU.

Times a fixed bf16 matmul (peak-known: ~197 TFLOP/s on v5e) and prints
achieved TFLOP/s + estimated duty cycle, so perf work can be scheduled
into quiet windows (see memory: tpu-timing-drift).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

M = K = N = 4096
a = jnp.zeros((M, K), jnp.bfloat16)
b = jnp.zeros((K, N), jnp.bfloat16)
f = jax.jit(lambda a, b: (a @ b)[:1, :8].astype(jnp.float32))
np.asarray(f(a, b))
best, t_end, n = 9e9, time.time() + 10, 0
while time.time() < t_end:
    t0 = time.perf_counter()
    np.asarray(f(a, b))
    best = min(best, time.perf_counter() - t0)
    n += 1
fl = 2 * M * K * N
tf = fl / best / 1e12
print(f"best {best*1e3:.2f} ms over {n} runs -> {tf:.0f} TFLOP/s "
      f"(~{min(100, tf/175*100):.0f}% duty)")
