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

    return jax.tree_util.tree_map_with_path(
        lambda kp, leaf: spec_for(path_names(kp), leaf), params)


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    t: jnp.ndarray          # log temperature
    b: jnp.ndarray          # logit bias (SigLIP)
    step: jnp.ndarray


def siglip_loss(emb_a: jnp.ndarray, emb_b: jnp.ndarray,
                t: jnp.ndarray, b: jnp.ndarray,
                valid=None) -> jnp.ndarray:
    """Pairwise sigmoid contrastive loss over the global batch.

    `valid` [B] (0/1 float) masks PAD rows out of the pair grid: a
    wrap-padded batch duplicates rows, and a duplicate's off-diagonal
    pair is a genuine positive that the identity labels would mark -1
    — without the mask every padded step actively pushes real pairs
    apart."""
    logits = emb_a @ emb_b.T * jnp.exp(t) + b          # [B, B]
    n = emb_a.shape[0]
    labels = 2.0 * jnp.eye(n, dtype=logits.dtype) - 1.0  # +1 diag, -1 off
    ll = jax.nn.log_sigmoid(labels * logits)
    if valid is None:
        return -jnp.mean(ll)
    w = valid[:, None] * valid[None, :]
    return -jnp.sum(ll * w) / jnp.maximum(jnp.sum(w), 1.0)


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
        # t/b are LEARNABLE (SigLIP trains its temperature and bias):
        # the optimizer runs over the combined {params, t, b} tree, with
        # weight decay masked off the scalars (decaying a temperature
        # toward zero is never what anyone wants)
        self.tx = optax.adamw(
            learning_rate, weight_decay=weight_decay,
            mask=lambda tree: {"params": jax.tree.map(lambda _: True,
                                                      tree["params"]),
                               "t": False, "b": False})

        dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
        params = jax.jit(self.module.init)(jax.random.PRNGKey(seed), dummy)["params"]
        pspec = param_partition_spec(params, model_axis)
        shard = lambda tree, spec: jax.device_put(
            tree, jax.tree.map(lambda s: NamedSharding(mesh, s), spec))
        params = shard(params, pspec)
        t0 = jnp.asarray(jnp.log(10.0), jnp.float32)
        b0 = jnp.asarray(-10.0, jnp.float32)
        opt_state = self.tx.init({"params": params, "t": t0, "b": b0})
        self.state = TrainState(
            params=params,
            opt_state=opt_state,
            t=t0,
            b=b0,
            step=jnp.zeros((), jnp.int32),
        )
        self.batch_sharding = NamedSharding(mesh, P(data_axis))

        def loss_fn(params, t, b, view_a, view_b, valid):
            # barrier before the fp32 normalize (CLAUDE.md convention;
            # same guard as pe.py): without it XLA fuses the normalize
            # into the bf16 projection and recomputes operands in bf16
            # under --xla_allow_excess_precision
            emb_a = jax.lax.optimization_barrier(
                self.module.apply({"params": params}, view_a))
            emb_b = jax.lax.optimization_barrier(
                self.module.apply({"params": params}, view_b))
            emb_a = l2_normalize(emb_a.astype(jnp.float32))
            emb_b = l2_normalize(emb_b.astype(jnp.float32))
            return siglip_loss(emb_a, emb_b, t, b, valid)

        @jax.jit
        def step_fn(state: TrainState, view_a, view_b, n_valid):
            valid = (jnp.arange(view_a.shape[0]) < n_valid).astype(
                jnp.float32)
            loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
                state.params, state.t, state.b, view_a, view_b, valid)
            combined = {"params": state.params, "t": state.t, "b": state.b}
            gtree = {"params": grads[0], "t": grads[1], "b": grads[2]}
            updates, opt_state = self.tx.update(gtree, state.opt_state,
                                                combined)
            new = optax.apply_updates(combined, updates)
            return dataclasses.replace(
                state, params=new["params"], t=new["t"], b=new["b"],
                opt_state=opt_state, step=state.step + 1), loss

        self._step = step_fn

    def shard_batch(self, batch):
        """Place a batch sharded over the data axis, WRAP-padding rows
        up to a multiple of the axis size (a short final batch may be
        smaller than the pad itself — a single [:pad] slice under-fills
        there). Pad rows are masked out of the loss by train_step."""
        batch = jnp.asarray(batch)
        n = self.mesh.shape[self.data_axis]
        pad = (-batch.shape[0]) % n
        if pad:
            idx = jnp.arange(batch.shape[0] + pad) % batch.shape[0]
            batch = batch[idx]
        return jax.device_put(batch, self.batch_sharding)

    def train_step(self, view_a, view_b):
        """One optimizer step on two augmented views [B, H, W, 3]."""
        view_a = jnp.asarray(view_a)
        n_valid = view_a.shape[0]
        view_a = self.shard_batch(view_a)
        view_b = self.shard_batch(view_b)
        self.state, loss = self._step(self.state, view_a, view_b,
                                      jnp.int32(n_valid))
        return float(jax.device_get(loss))


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "opt_state", "t", "b", "step"],
    meta_fields=[])
