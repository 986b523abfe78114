"""Tracing/profiling hooks (SURVEY.md §5 tracing row; reference C21).

The reference times stages with CUDA events + printf (SURVEY.md C21).
Here: `trace()` wraps a benchmark window in a jax.profiler trace
(TensorBoard/Perfetto — Pallas kernel occupancy and collective traffic show
up per-op), and `StepTimer` produces the same steady-state timings the
benchmark harness records.  Hooks live OUTSIDE jitted code only.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str = "/tmp/fdes_trace", enabled: bool = True):
    """Profile a window: `with trace('/tmp/t'): run_steps()` then open the
    trace in TensorBoard (or xprof) to see per-op device time."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Steady-state step timer: skips the first (compile) call.

    >>> t = StepTimer()
    >>> for _ in range(n):
    ...     with t: out = step(...)  # block inside the with
    >>> t.mean_s
    """

    def __init__(self):
        self.times: list[float] = []
        self._t0 = 0.0

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.times.append(time.time() - self._t0)
        return False

    @property
    def mean_s(self) -> float:
        steady = self.times[1:] or self.times
        return sum(steady) / len(steady)


# Watchdog readback + complex-safe transfers live in tunnel.py (the round-1
# fetch loop graduated there once the failure mode was root-caused to the
# tunnel's missing complex-dtype transfer support); re-exported here for the
# existing call sites.
from .tunnel import fetch_array, fetch_scalar, safe_put  # noqa: E402,F401
