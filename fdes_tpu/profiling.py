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


def fetch_scalar(x, tries: int = 30, wait_s: float = 20.0) -> float:
    """Device->host readback with retries (the honest sync barrier).

    On remote-tunnel TPU runtimes `block_until_ready` is not a reliable
    completion barrier and readback itself fails transiently with
    UNIMPLEMENTED while queued work drains; the computation is fine, so
    retry the FETCH, never the work (BASELINE.md timing methodology).
    """
    return float(fetch_array(x, tries=tries, wait_s=wait_s).reshape(-1)[0])


def fetch_array(x, tries: int = 30, wait_s: float = 20.0):
    """Full device->host readback with the same retry discipline as
    fetch_scalar (returns np.ndarray).

    Two tunnel failure modes are handled: the readback RAISES transiently
    (UNIMPLEMENTED while the remote queue drains) or it BLOCKS outright
    (half-up tunnel: dispatch succeeds, fetch stalls forever).  Each attempt
    therefore runs in a watchdog thread joined with a `wait_s` timeout — a
    stalled attempt is abandoned (daemon thread; reads are side-effect-free)
    and retried, so a recovered tunnel turns a would-be infinite hang into a
    late success, and a dead one into TimeoutError instead of a silent hang.
    """
    import threading

    import numpy as np

    import jax.errors

    last_err = None
    for i in range(tries):
        box: dict = {}

        def work(box=box):
            try:
                box["value"] = np.asarray(x)
            except Exception as e:  # noqa: BLE001 — re-raised on the caller side
                box["error"] = e

        t = threading.Thread(target=work, daemon=True, name="fdes-fetch")
        t.start()
        t.join(wait_s)
        if "value" in box:
            return box["value"]
        last_err = box.get("error")
        if last_err is not None and not isinstance(last_err, jax.errors.JaxRuntimeError):
            raise last_err  # programming error, not a transient
        if i == tries - 1:
            break
        if last_err is not None:
            time.sleep(wait_s)  # fast-failing error: back off before retrying
        # stalled attempt: the join(wait_s) already WAS the backoff
    if last_err is not None:
        raise last_err
    raise TimeoutError(
        f"device->host readback stalled for {tries * wait_s:.0f}s (TPU tunnel down?)"
    )
