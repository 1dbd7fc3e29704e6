"""Structured logging + the reference-compatible accumulating status log.

The reference logs progress by appending emoji strings to a list and joining
them for the UI (core_system.py:464-468). `StatusLog` reproduces that
surface (callbacks get (message, progress)) on top of structured logging.
"""
from __future__ import annotations

import logging
import sys
from typing import Callable, Optional

_FORMAT = "%(asctime)s %(levelname).1s %(name)s: %(message)s"


def get_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(f"reverso.{name}")
    if not logging.getLogger("reverso").handlers:
        root = logging.getLogger("reverso")
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT))
        root.addHandler(handler)
        root.setLevel(logging.INFO)
        root.propagate = False
    return logger


class StatusLog:
    """Accumulating status transcript with optional progress callback.

    Mirrors the closure `log_status(message, progress_value)` the reference
    threads through `create_database` (core_system.py:464-468) and the video
    pipelines (video_processing.py:372-379).
    """

    def __init__(self, progress_callback: Optional[Callable[[str, Optional[float]], None]] = None,
                 logger: Optional[logging.Logger] = None):
        # transcript kept as one incrementally-extended string: joining
        # a growing message list on EVERY call (the old form) is O(n^2)
        # over a long ingest; CPython's in-place `str +=` keeps the
        # common discard-the-return case amortized O(len(message))
        self._text = ""
        self._cb = progress_callback
        self._logger = logger or get_logger("status")

    def __call__(self, message: str, progress: Optional[float] = None) -> str:
        if self._text:
            self._text += "\n" + message
        else:
            self._text = message
        self._logger.info(message)
        if self._cb is not None:
            try:
                self._cb(message, progress)
            except Exception:  # progress UI must never kill the pipeline
                pass
        return self._text

    @property
    def text(self) -> str:
        return self._text
