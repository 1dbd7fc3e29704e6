"""Mesh construction and sharding helpers.

The reference is single-process / single-device (SURVEY.md §2.3: zero
occurrences of any distributed API). Here the mesh is first-class: the
embedding store is row-sharded over the "data" axis, queries are
replicated, and search results are merged with XLA collectives
(`all_gather` inside `shard_map`), riding ICI on real hardware.
"""
from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig


def make_mesh(cfg: MeshConfig | None = None, devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Build a mesh over the given (default: all) devices."""
    cfg = cfg or MeshConfig()
    devs = list(devices) if devices is not None else jax.devices()
    sizes = cfg.resolved_sizes(len(devs))
    arr = np.array(devs).reshape(sizes)
    return Mesh(arr, cfg.axis_names)


def row_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 over `axis`, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rows(x, mesh: Mesh, axis: str = "data"):
    """Place array with dim 0 sharded across `axis`. dim0 must divide evenly."""
    n = mesh.shape[axis]
    if x.shape[0] % n:
        raise ValueError(f"rows {x.shape[0]} not divisible by mesh axis {axis}={n}")
    return jax.device_put(x, row_sharding(mesh, axis))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, replicated_sharding(mesh))


def local_row_count(total_rows: int, mesh: Mesh, axis: str = "data") -> int:
    n = mesh.shape[axis]
    if total_rows % n:
        raise ValueError(f"rows {total_rows} not divisible by {n}")
    return total_rows // n
