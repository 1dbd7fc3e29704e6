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

    Syncing on device work is the CALLER's responsibility: JAX dispatch
    is async, and through the remote-TPU tunnel even block_until_ready
    returns early (CLAUDE.md) — the only reliable fence is forcing a
    small host transfer (`np.asarray` on an output) inside the block.
    There is deliberately no `sync=` knob: the former implementation
    called jax.effects_barrier(), which waits only for EFFECTFUL
    computations and returns immediately for pure jitted compute —
    a silent lie worse than no sync at all.
    """

    def __init__(self, metrics: Metrics | None = None):
        self.metrics = metrics or Metrics()

    @contextlib.contextmanager
    def stage(self, name: str, n: int = 1) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        self.metrics.add(name, time.perf_counter() - t0, n)


@contextlib.contextmanager
def trace(dirname: str | None) -> Iterator[None]:
    """jax.profiler trace scope; no-op if dirname is None."""
    if dirname is None:
        yield
        return
    with jax.profiler.trace(dirname):
        yield
