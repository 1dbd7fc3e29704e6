"""Reverso-TPU: a TPU-native visual investigation framework.

A ground-up rebuild of the capabilities of kolenyo2099/revers-o
(prompt-conditioned region detection -> perception-encoder embeddings ->
vector store -> exact cosine search -> UI) designed for TPU hardware:
JAX/XLA for the compute graph, Pallas kernels for the hot paths
(flash attention, fused top-k), jax.sharding meshes for scale-out.
"""

__version__ = "0.1.0"

from .engine import Reverso
from .config import (
    EngineConfig,
    MeshConfig,
    ModelConfig,
    DetectorConfig,
    StoreConfig,
    SearchConfig,
    IngestConfig,
    MODEL_PRESETS,
    default_config,
)
