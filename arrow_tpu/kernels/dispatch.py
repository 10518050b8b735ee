"""Pallas kernel dispatch helpers.

Hot kernels (SURVEY.md §2 [HOT]) have two executions: Mosaic-compiled on a
TPU backend, and the Pallas interpreter elsewhere (the path unit tests
exercise on the CPU mesh; tests call kernels directly on small shapes).
Ops-layer callers route via config.use_pallas(), which defaults to
TPU-only — the pure-XLA implementations remain the fallback for dtypes or
shapes a kernel does not cover.
"""

from __future__ import annotations

from .. import config

__all__ = ["on_tpu", "interpret_mode", "use_pallas"]

on_tpu = config.on_tpu
use_pallas = config.use_pallas


def interpret_mode() -> bool:
    """Pallas interpret= flag: interpreter everywhere but real TPU."""
    return not config.on_tpu()
