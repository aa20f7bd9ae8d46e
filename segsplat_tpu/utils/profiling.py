"""Tracing / profiling helpers (SURVEY §5.1) — the TPU-native upgrade of the
reference's per-iteration CUDA event timing (train_unified_lift.py:310-311,431).

``step_timer`` gives host-side wall timing with EMA (the tqdm-postfix analog);
``trace`` wraps jax.profiler for Perfetto traces; ``annotate`` marks named
regions inside a trace.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


class StepTimer:
    """EMA step timer (the reference logs iter_time to wandb, :522)."""

    def __init__(self, ema: float = 0.6):
        self.ema = ema
        self.value: Optional[float] = None
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.value = dt if self.value is None else (
            self.ema * self.value + (1 - self.ema) * dt)
        return False

    @property
    def ms(self) -> float:
        return (self.value or 0.0) * 1e3


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in Perfetto/XProf
    (jax.profiler.start_trace)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region annotation inside an active trace."""
    import jax

    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def timed(label: str, results: Optional[dict] = None) -> Iterator[None]:
    """Simple block timer; appends seconds to results[label] when given."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if results is not None:
            results.setdefault(label, []).append(dt)
        else:
            print(f"[{label}] {dt * 1e3:.1f} ms")
