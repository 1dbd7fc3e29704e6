"""Orbax checkpointing for training state.

The reference has no training and its only "checkpoint" (the ingest
manifest) was broken (SURVEY.md §5.4). This module persists the full
sharded TrainState — params, optimizer state, temperature/bias, step —
with orbax, restoring onto the current mesh's shardings (so a run can
resume on a different topology of the same device count).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def save_train_state(path: str, state: Any, *, force: bool = True) -> None:
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=force)


def restore_train_state(path: str, template: Any, mesh=None) -> Any:
    """Restore onto the template's shapes/dtypes/shardings (the template is
    the freshly-initialized TrainState of the current trainer). Leaves
    without an explicit sharding (optimizer scalars) come back committed
    to one device, which jit refuses to mix with mesh-committed params —
    re-place them replicated over `mesh` when given."""
    path = os.path.abspath(path)
    target = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(path, target)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep = NamedSharding(mesh, P())

        def fix(x):
            if hasattr(x, "sharding") and not isinstance(
                    x.sharding, NamedSharding):
                return jax.device_put(x, rep)
            return x

        state = jax.tree.map(fix, state)
    return state
