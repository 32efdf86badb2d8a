"""Tracing / profiling hooks.

The reference had only a wall-clock decorator (``get_duration``,
reference: vltk/future/decorators.py:15-23) and tqdm bars. Here:

  * ``get_duration``   — same decorator, kept by name;
  * ``trace``          — context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable trace directory (XLA op-level timeline);
  * ``StepTimer``      — blocking-aware step timer for train/extract loops
    (calls ``block_until_ready`` so XLA async dispatch doesn't hide cost);
  * ``annotate``       — named region that shows up inside profiler traces.
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Any, Callable, Dict, Optional


def get_duration(func: Callable) -> Callable:
    """Wall-clock decorator (reference: future/decorators.py:15-23)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        out = func(*args, **kwargs)
        wrapper.last_duration = time.perf_counter() - t0
        return out

    wrapper.last_duration = None
    return wrapper


@contextlib.contextmanager
def trace(logdir: str, with_host: bool = True):
    """Capture a JAX/XLA profiler trace into ``logdir`` (view with
    TensorBoard or xprof). No-op if the profiler can't start (e.g. a
    second concurrent trace)."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a profiler trace (host + device timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Throughput bookkeeping for device-step loops.

    ``tic()`` before the step; ``toc(n_items, result)`` blocks on
    ``result`` and records. ``summary()`` gives mean/p50/p99 seconds and
    items/sec, skipping the first (compile) step.
    """

    def __init__(self):
        self.times: list = []
        self.items: list = []
        self._t0: Optional[float] = None

    def tic(self) -> None:
        self._t0 = time.perf_counter()

    def toc(self, n_items: int = 1, result: Any = None) -> float:
        if result is not None:
            import jax

            jax.block_until_ready(result)
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self.times.append(dt)
        self.items.append(n_items)
        return dt

    def summary(self, skip_first: bool = True) -> Dict[str, float]:
        times = self.times[1:] if skip_first and len(self.times) > 1 else self.times
        items = self.items[1:] if skip_first and len(self.items) > 1 else self.items
        if not times:
            return {}
        total = sum(times)
        srt = sorted(times)
        return {
            "steps": len(times),
            "mean_s": total / len(times),
            "p50_s": srt[len(srt) // 2],
            "p99_s": srt[min(len(srt) - 1, int(len(srt) * 0.99))],
            "items_per_s": (sum(items) / total) if total > 0 else 0.0,
        }
