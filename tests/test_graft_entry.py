"""Driver-contract regression tests for `__graft_entry__`.

Round-1 post-mortem: the driver runs `dryrun_multichip(8)` in its OWN
environment (one real axon TPU device, no virtual-device flags), and the
round-1 implementation assumed `jax.devices()` already had 8 devices —
so the one checked multi-chip artifact failed (MULTICHIP_r01.json rc=1)
while the CPU-forced test suite stayed green. These tests invoke the
entry the way the driver does: a fresh subprocess whose environment does
NOT pre-provision virtual devices.
"""
import os
import subprocess
import sys
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_clean(code: str, *, timeout: int = 600, extra_env=None):
    """Run `code` in a subprocess WITHOUT the conftest's CPU/8-device env."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # Keep the subprocess off the real TPU tunnel (slow, and tests must
    # not touch it) while still NOT pre-provisioning multiple devices:
    # one plain CPU device, exactly the shape of the driver's failure.
    env["JAX_PLATFORMS"] = "cpu"
    env.update(extra_env or {})
    return subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)


@pytest.mark.slow
def test_dryrun_multichip_bootstraps_devices():
    """dryrun_multichip(n) must succeed when the caller has ONE device."""
    proc = _run_clean(
        # Pin CPU via config (the axon plugin ignores the env var and
        # would touch — or hang on — the real tunnel): one plain CPU
        # device, exactly the shape of the driver's round-1 failure.
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "assert jax.device_count() == 1, jax.devices()\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(4)\n")
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    assert "DPxTP step ok" in out, out
    assert "sharded_cosine_topk over 4 shards == single-device scan" in out
    assert "tree_merge_topk on 2x2" in out, out
    assert "ALL OK on 4 cpu devices" in out, out


@pytest.mark.slow
def test_dryrun_multichip_inline_when_devices_exist():
    """When the caller already has >= n devices, run inline (no re-exec)."""
    proc = _run_clean(
        # The axon plugin overrides the JAX_PLATFORMS env var in this
        # image; force the platform the way conftest does.
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "assert jax.device_count() == 4, jax.devices()\n"
        "import __graft_entry__ as g\n"
        "assert g._have_devices(4)\n"
        "g.dryrun_multichip(4)\n",
        extra_env={"XLA_FLAGS": "--xla_force_host_platform_device_count=4"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ALL OK on 4 cpu devices" in proc.stdout, proc.stdout
