"""Per-stage timers and a metrics struct (SURVEY.md §5.1: the reference has
no profiling at all; this is the built-in replacement), plus jax.profiler
trace hooks for TPU timeline capture."""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, Iterator

import jax


@dataclass
class Metrics:
    """Accumulated per-stage wall time and counters."""
    seconds: Dict[str, float] = field(default_factory=lambda: defaultdict(float))
    counts: Dict[str, int] = field(default_factory=lambda: defaultdict(int))

    def add(self, stage: str, dt: float, n: int = 1) -> None:
        self.seconds[stage] += dt
        self.counts[stage] += n

    def rate(self, stage: str) -> float:
        dt = self.seconds.get(stage, 0.0)
        return self.counts.get(stage, 0) / dt if dt > 0 else 0.0

    def to_json(self) -> str:
        return json.dumps({
            "seconds": dict(self.seconds),
            "counts": dict(self.counts),
            "rates": {k: self.rate(k) for k in self.seconds},
        }, indent=2)


class StageTimer:
    """Context-manager stage timer feeding a Metrics struct.

    Blocks on device work (`block_until_ready` analog) are the caller's
    responsibility — JAX dispatch is async, so time only around explicit
    syncs or pass `sync=True` to insert one.
    """

    def __init__(self, metrics: Metrics | None = None):
        self.metrics = metrics or Metrics()

    @contextlib.contextmanager
    def stage(self, name: str, n: int = 1, sync: bool = False) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if sync:
            jax.effects_barrier()
        self.metrics.add(name, time.perf_counter() - t0, n)


@contextlib.contextmanager
def trace(dirname: str | None) -> Iterator[None]:
    """jax.profiler trace scope; no-op if dirname is None."""
    if dirname is None:
        yield
        return
    with jax.profiler.trace(dirname):
        yield
