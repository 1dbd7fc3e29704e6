"""Contrastive fine-tuning of the vision tower (SigLIP pairwise loss).

The reference has no training capability at all (SURVEY.md §2.3) — this
is the framework's scale-out training path and the surface the driver's
multi-chip dryrun exercises: data-parallel batches over the "data" mesh
axis, tensor-parallel attention/MLP shards over "model", XLA inserting
the collectives (psum for gradients, all_gather for the pairwise logit
matrix).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..models.vit import VisionTransformer
from ..ops.norm import l2_normalize


def param_partition_spec(params: Any, tp_axis: str = "model") -> Any:
    """Tensor-parallel PartitionSpecs for the ViT parameter tree.

    Column-parallel: attention q/k/v (heads shard), MLP fc1.
    Row-parallel: attention out_proj, MLP fc2.
    Everything else (embeddings, norms, pooling, projection) replicated.
    """
    def spec_for(path: tuple[str, ...], leaf) -> P:
        names = [p for p in path]
        leafname = names[-1]
        joined = "/".join(names)
        col = any(s in joined for s in ("q_proj", "k_proj", "v_proj", "fc1"))
        row = any(s in joined for s in ("out_proj", "fc2"))
        if "attn_pool" in joined:
            return P()
        if col:
            if leafname == "kernel":
                return P(None, tp_axis)
            if leafname == "bias":
                return P(tp_axis)
        if row and leafname == "kernel":
            return P(tp_axis, None)
        return P()

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_names(kp):
        out = []
        for k in kp:
            if hasattr(k, "key"):
                out.append(str(k.key))
            elif hasattr(k, "name"):
                out.append(str(k.name))
            else:
                out.append(str(k))
        return tuple(out)

    specs = {path_names(kp): spec_for(path_names(kp), leaf) for kp, leaf in flat}
    return jax.tree_util.tree_map_with_path(
        lambda kp, _: specs[path_names(kp)], params)


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    t: jnp.ndarray          # log temperature
    b: jnp.ndarray          # logit bias (SigLIP)
    step: jnp.ndarray


def siglip_loss(emb_a: jnp.ndarray, emb_b: jnp.ndarray,
                t: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise sigmoid contrastive loss over the global batch."""
    logits = emb_a @ emb_b.T * jnp.exp(t) + b          # [B, B]
    n = emb_a.shape[0]
    labels = 2.0 * jnp.eye(n, dtype=logits.dtype) - 1.0  # +1 diag, -1 off
    return -jnp.mean(jax.nn.log_sigmoid(labels * logits))


class ClipTrainer:
    """DP x TP trainer for the vision tower on a mesh."""

    def __init__(self, cfg: ModelConfig, mesh: Mesh, *,
                 learning_rate: float = 1e-4, weight_decay: float = 1e-4,
                 data_axis: str = "data", model_axis: str = "model",
                 use_flash: Optional[bool] = None, seed: int = 0):
        self.cfg = cfg
        self.mesh = mesh
        self.data_axis = data_axis
        self.module = VisionTransformer(cfg, use_flash=use_flash)
        self.tx = optax.adamw(learning_rate, weight_decay=weight_decay)

        dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
        params = jax.jit(self.module.init)(jax.random.PRNGKey(seed), dummy)["params"]
        pspec = param_partition_spec(params, model_axis)
        shard = lambda tree, spec: jax.device_put(
            tree, jax.tree.map(lambda s: NamedSharding(mesh, s), spec))
        params = shard(params, pspec)
        opt_state = self.tx.init(params)
        self.state = TrainState(
            params=params,
            opt_state=opt_state,
            t=jnp.asarray(jnp.log(10.0), jnp.float32),
            b=jnp.asarray(-10.0, jnp.float32),
            step=jnp.zeros((), jnp.int32),
        )
        self.batch_sharding = NamedSharding(mesh, P(data_axis))

        def loss_fn(params, t, b, view_a, view_b):
            emb_a = l2_normalize(
                self.module.apply({"params": params}, view_a).astype(jnp.float32))
            emb_b = l2_normalize(
                self.module.apply({"params": params}, view_b).astype(jnp.float32))
            return siglip_loss(emb_a, emb_b, t, b)

        @jax.jit
        def step_fn(state: TrainState, view_a, view_b):
            loss, grads = jax.value_and_grad(
                lambda p: loss_fn(p, state.t, state.b, view_a, view_b))(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            return dataclasses.replace(
                state, params=params, opt_state=opt_state,
                step=state.step + 1), loss

        self._step = step_fn

    def shard_batch(self, batch):
        """Place a batch sharded over the data axis, tiling rows up to a
        multiple of the axis size (repeated pairs stay valid positives
        for the pairwise loss)."""
        batch = jnp.asarray(batch)
        n = self.mesh.shape[self.data_axis]
        pad = (-batch.shape[0]) % n
        if pad:
            batch = jnp.concatenate([batch, batch[:pad]], axis=0)
        return jax.device_put(batch, self.batch_sharding)

    def train_step(self, view_a, view_b):
        """One optimizer step on two augmented views [B, H, W, 3]."""
        view_a = self.shard_batch(view_a)
        view_b = self.shard_batch(view_b)
        self.state, loss = self._step(self.state, view_a, view_b)
        return float(jax.device_get(loss))


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "opt_state", "t", "b", "step"],
    meta_fields=[])
