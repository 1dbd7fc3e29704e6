"""Multi-device training tests on the 8-device virtual CPU mesh
(SURVEY.md §4 item 4)."""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from reverso_tpu.config import MODEL_PRESETS, MeshConfig
from reverso_tpu.parallel import make_mesh
from reverso_tpu.train import ClipTrainer, siglip_loss, param_partition_spec

TINY = dataclasses.replace(MODEL_PRESETS["test-tiny"], dtype="float32")


def test_siglip_loss_basics():
    e = jnp.eye(4, 8)
    loss_match = siglip_loss(e, e, jnp.log(jnp.asarray(10.0)), jnp.asarray(-5.0))
    perm = e[::-1]
    loss_mismatch = siglip_loss(e, perm, jnp.log(jnp.asarray(10.0)), jnp.asarray(-5.0))
    assert float(loss_match) < float(loss_mismatch)


def test_param_partition_spec_shapes():
    import flax.linen  # noqa
    from reverso_tpu.models.vit import VisionTransformer
    m = VisionTransformer(TINY)
    params = m.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 32, 32, 3)))["params"]
    spec = param_partition_spec(params)
    q = spec["block0"]["attn"]["q_proj"]["kernel"]
    assert q == P(None, "model")
    o = spec["block0"]["attn"]["out_proj"]["kernel"]
    assert o == P("model", None)
    assert spec["patch_embed"]["kernel"] == P()
    assert spec["attn_pool"]["q_proj"]["kernel"] == P()


def test_dp_tp_train_step_runs_and_learns():
    mesh = make_mesh(MeshConfig(axis_sizes=(4, 2)))   # 4-way DP x 2-way TP
    trainer = ClipTrainer(TINY, mesh, learning_rate=1e-3)
    rng = np.random.default_rng(0)
    a = rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
    b = a + 0.01 * rng.standard_normal(a.shape).astype(np.float32)
    losses = [trainer.train_step(a, b) for _ in range(5)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(jax.device_get(trainer.state.step)) == 5


def test_tp_matches_single_device():
    """TP-sharded forward == replicated forward (bitwise-tolerant)."""
    mesh_tp = make_mesh(MeshConfig(axis_sizes=(1, 8)))
    mesh_1 = make_mesh(MeshConfig(axis_sizes=(1, 1)),
                       devices=jax.devices()[:1])
    t1 = ClipTrainer(TINY, mesh_1, seed=3)
    t8 = ClipTrainer(TINY, mesh_tp, seed=3)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 32, 32, 3)).astype(np.float32)
    f1 = jax.jit(lambda p, x: t1.module.apply({"params": p}, x))
    out1 = np.asarray(f1(t1.state.params, x))
    out8 = np.asarray(f1(t8.state.params, jax.device_put(x)))
    np.testing.assert_allclose(out1, out8, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    from reverso_tpu.train.checkpoint import save_train_state, restore_train_state
    mesh = make_mesh(MeshConfig(axis_sizes=(4, 2)))
    t = ClipTrainer(TINY, mesh, learning_rate=1e-3)
    a = np.random.default_rng(0).standard_normal((8, 32, 32, 3)).astype(np.float32)
    t.train_step(a, a)
    save_train_state(str(tmp_path / "ckpt"), t.state)

    t2 = ClipTrainer(TINY, mesh, learning_rate=1e-3, seed=99)
    t2.state = restore_train_state(str(tmp_path / "ckpt"), t2.state)
    assert int(jax.device_get(t2.state.step)) == 1
    l1 = jax.tree.leaves(t.state.params)
    l2 = jax.tree.leaves(t2.state.params)
    for x, y in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # restored state must keep the TP shardings of the current mesh
    q = t2.state.params["block0"]["attn"]["q_proj"]["kernel"]
    assert q.sharding.spec == P(None, "model")
