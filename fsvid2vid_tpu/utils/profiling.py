"""Tracing / profiling hooks (SURVEY §5: the reference has only wall-clock
iteration timing + optional nvidia-smi polling, trainer.py:43-44,69-70).

Here: xprof/TensorBoard-compatible device traces via jax.profiler, per-step
wall-clock timing, and a compiled-cost introspection helper.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a device trace viewable in TensorBoard/xprof; no-op when
    log_dir is None."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling per-step timing (reference trainer.py:43-44,58-61)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)


def compiled_cost(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """FLOPs / bytes-accessed of the compiled computation (XLA cost
    analysis), for speed-of-light comparisons."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return {k: float(v) for k, v in analysis.items()
            if k in ("flops", "transcendentals")
            or k.startswith("bytes accessed")}


def device_memory_stats() -> Dict[str, int]:
    """Live/peak device memory (replaces the nvidia-smi polling)."""
    stats = {}
    for d in jax.local_devices():
        ms = d.memory_stats() or {}
        stats[str(d)] = {k: ms.get(k, 0) for k in
                         ("bytes_in_use", "peak_bytes_in_use",
                          "bytes_limit")}
    return stats
