"""fetch_array watchdog: stalled and transiently-failing readbacks retry
(SURVEY.md §5 tracing row; the honest sync barrier used by bench.py).

The tunneled-TPU runtime has two transient readback failure modes: the fetch
raises JaxRuntimeError, or it blocks outright.  Both must convert into
retries, and a permanently stalled fetch into TimeoutError — never a hang.
"""

import threading
import time

import numpy as np
import pytest

from fdes_tpu.profiling import fetch_array, fetch_scalar


class _StallThenSucceed:
    """np.asarray(self) blocks well past wait_s on the first call, returns
    instantly on the second — models a tunnel that recovers."""

    def __init__(self):
        self.calls = 0
        self._lock = threading.Lock()

    def __array__(self, dtype=None, copy=None):
        with self._lock:
            self.calls += 1
            first = self.calls == 1
        if first:
            time.sleep(2.0)
        return np.array([3.5], dtype=np.float32)


class _RaiseThenSucceed:
    def __init__(self, err):
        self.calls = 0
        self._err = err

    def __array__(self, dtype=None, copy=None):
        self.calls += 1
        if self.calls == 1:
            raise self._err
        return np.array([[7.0]], dtype=np.float32)


class _StallForever:
    def __array__(self, dtype=None, copy=None):
        time.sleep(60.0)
        return np.zeros(1)


def test_stalled_fetch_is_retried_not_hung():
    obj = _StallThenSucceed()
    t0 = time.time()
    assert fetch_scalar(obj, tries=4, wait_s=0.2) == 3.5
    assert time.time() - t0 < 2.0  # returned via retry, not by outwaiting the stall
    assert obj.calls >= 2


def test_transient_runtime_error_is_retried():
    import jax.errors

    # jax.errors.JaxRuntimeError requires a message arg
    obj = _RaiseThenSucceed(jax.errors.JaxRuntimeError("UNIMPLEMENTED: draining"))
    out = fetch_array(obj, tries=3, wait_s=0.01)
    assert out.shape == (1, 1) and out[0, 0] == 7.0


def test_nontransient_error_raises_immediately():
    obj = _RaiseThenSucceed(ValueError("bad"))
    with pytest.raises(ValueError):
        fetch_array(obj, tries=5, wait_s=0.01)
    assert obj.calls == 1


def test_permanent_stall_times_out():
    t0 = time.time()
    with pytest.raises(TimeoutError):
        fetch_array(_StallForever(), tries=2, wait_s=0.2)
    assert time.time() - t0 < 5.0
