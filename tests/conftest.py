"""Test harness configuration.

Runs the whole suite on CPU with 8 virtual XLA devices so that every
`shard_map`/`pjit` code path (the TPU mesh design) is exercised without TPU
hardware. This mirrors SURVEY.md §4 item 4: multi-device tests on a fake
8-device mesh, asserting sharded results match single-device results.

Must set env vars BEFORE jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"   # force: the session env presets JAX_PLATFORMS=axon (TPU)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The session environment presets JAX_PLATFORMS=axon (the TPU tunnel) and
# something pins jax_platforms to "axon,cpu" regardless of the env var, so
# force the config directly before any backend is initialized.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
assert jax.device_count() == 8, jax.devices()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
