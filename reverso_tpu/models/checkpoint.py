"""Converted-parameter persistence (msgpack).

The reference loads pretrained towers directly from torch
(`pe.CLIP.from_config("PE-Core-L14-336", pretrained=True)`,
reference core_system.py:181). Here the torch -> flax conversion happens
once (scripts/fetch_weights.py) and the converted pytree is stored as a
single msgpack file, so engine start-up needs neither torch nor network.
"""
from __future__ import annotations

import json
import os
from typing import Any

import numpy as np


def save_params(path: str, params: Any, meta: dict | None = None) -> None:
    """Serialize a params pytree (nested dicts of arrays) + sidecar meta."""
    from flax import serialization
    import jax

    host = jax.tree_util.tree_map(np.asarray, params)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(host))
    os.replace(tmp, path)
    if meta is not None:
        # sidecar gets the same tmp+replace treatment as the params: a
        # crash mid-dump otherwise left a torn .json that fails every
        # later load (or stale meta applied to the new params)
        mtmp = path + ".json.tmp"
        with open(mtmp, "w") as f:
            json.dump(meta, f, indent=2)
            f.flush()
            os.fsync(f.fileno())
        os.replace(mtmp, path + ".json")


def load_params(path: str) -> Any:
    """Restore a params pytree saved by `save_params`."""
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_meta(path: str) -> dict | None:
    side = path + ".json"
    if os.path.exists(side):
        with open(side) as f:
            return json.load(f)
    return None
