"""Tunnel-safe host<->device transfers for remote (axon) TPU runtimes.

The driver reaches the TPU chip through an experimental remote tunnel whose
transfer layer does NOT implement complex dtypes: a ``device_put`` or
readback of a complex64 buffer fails with ``UNIMPLEMENTED`` — and, worse,
the first such failure POISONS the client (every subsequent transfer in the
process fails the same way).  Round 1's benchmark died exactly this way:
one complex propagator upload, then six retries all failing at the first
float32 transfer (BENCH_r01.json).

Rules encoded here (measured on the real chip, 2026-08-20):

* float32/int32 transfers work both ways (~30-90 MB/s up, ~12-26 MB/s down,
  verified to 256 MiB).
* complex64 transfers fail both ways and poison the process.
* complex values CREATED ON DEVICE are fine — only the transfer is broken.

So: ship complex arrays as two float planes and combine with
``jax.lax.complex`` on device (``safe_put``); read complex back as two
float planes (``fetch_array``).  All benchmark/CLI code paths route host
constants (propagator, probe stencil, CTF) through ``safe_put``.

This module also owns the watchdog readback (``fetch_array`` /
``fetch_scalar``): on a half-up tunnel a readback can BLOCK forever rather
than raise, so each fetch runs in a daemon thread joined with a timeout
scaled to the transfer size.  The same thread is re-joined across attempts
(never duplicated) so a slow-but-healthy transfer is given its full budget
instead of being abandoned and restarted.
"""

from __future__ import annotations

import functools
import threading
import time

import numpy as np

__all__ = ["safe_put", "fetch_array", "fetch_scalar"]


@functools.lru_cache(maxsize=4)
def _combine_fn():
    import jax

    return jax.jit(jax.lax.complex)


@functools.lru_cache(maxsize=4)
def _real_fn():
    import jax
    import jax.numpy as jnp

    return jax.jit(jnp.real)


@functools.lru_cache(maxsize=4)
def _imag_fn():
    import jax
    import jax.numpy as jnp

    return jax.jit(jnp.imag)


def safe_put(x, device=None):
    """``jax.device_put`` that never ships a complex buffer through a TPU
    tunnel: complex input travels as two float planes combined on device
    (f64/c128 are downcast to f32/c64 — TPUs have no f64).  On CPU/GPU
    backends this is a plain device_put (dtypes preserved — the f64 golden
    tests depend on that)."""
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        return jax.device_put(x, device)
    x = np.asarray(x)
    if np.iscomplexobj(x):
        if x.dtype == np.complex128:
            _warn_downcast("complex128", "complex64")
        rdt = np.float32  # c128 host constants downcast (no f64 on TPU)
        re = jax.device_put(np.ascontiguousarray(x.real, dtype=rdt), device)
        im = jax.device_put(np.ascontiguousarray(x.imag, dtype=rdt), device)
        return _combine_fn()(re, im)
    if x.dtype == np.float64:
        _warn_downcast("float64", "float32")
        x = x.astype(np.float32)
    elif x.dtype == np.int64:
        _warn_downcast("int64", "int32")
        x = x.astype(np.int32)
    return jax.device_put(np.ascontiguousarray(x), device)


_warned_downcasts: set = set()


def _warn_downcast(src: str, dst: str) -> None:
    """One-time-per-dtype warning when safe_put silently narrows a host
    constant for the TPU — with jax_enable_x64 set this is a real precision
    loss the caller should know about (ADVICE.md round 2)."""
    if src in _warned_downcasts:
        return
    _warned_downcasts.add(src)
    import warnings

    warnings.warn(
        f"safe_put: downcasting {src} host buffer to {dst} for the TPU "
        "backend (no f64 on TPU); pre-cast with grids.host_cast to silence",
        stacklevel=3,
    )


def _fetch_real(x, tries: int, wait_s: float):
    """Watchdog readback of a REAL device array -> np.ndarray.

    Failure modes handled: the readback RAISES transiently, or it BLOCKS
    outright (half-up tunnel).  Each np.asarray attempt runs in a worker
    thread.  A stalled attempt is kept and RE-JOINED (a big-but-healthy
    transfer gets the whole tries*wait budget, which itself scales with the
    payload) while AT MOST ONE parallel fresh attempt probes whether a new
    RPC would succeed where the stuck one never will — so a recovered
    tunnel turns a hang into a late success without ever stacking more
    than two concurrent readbacks of the same buffer (ADVICE.md round 1).
    """
    import jax.errors

    # Per-attempt patience scales with the payload: at the measured worst
    # case ~10 MB/s down, a 256 MiB buffer needs ~26 s on a HEALTHY link.
    nbytes = getattr(x, "nbytes", 0) or 0
    wait_s = max(wait_s, nbytes / 10e6)

    def spawn():
        box: dict = {}

        def work():
            try:
                box["value"] = np.asarray(x)
            except Exception as e:  # noqa: BLE001 — re-raised caller-side
                box["error"] = e

        t = threading.Thread(target=work, daemon=True, name="fdes-fetch")
        t.start()
        return t, box

    def harvest(attempts, last_err):
        """Return (value-or-None, pruned attempts, last transient error)."""
        keep = []
        for t, box in attempts:
            if "value" in box:
                return box["value"], attempts, last_err
            err = box.get("error")
            if err is not None:
                if not isinstance(err, jax.errors.JaxRuntimeError):
                    raise err  # programming error, not a transient
                last_err = err  # transient: drop this attempt, retry later
            elif t.is_alive():
                keep.append((t, box))
        return None, keep, last_err

    attempts: list = []
    last_err = None
    for i in range(tries):
        value, attempts, last_err = harvest(attempts, last_err)
        if value is not None:
            return value
        if not attempts and last_err is not None and i > 0:
            time.sleep(min(wait_s, 20.0))  # fast-failing error: back off
        if len(attempts) < 2:
            attempts.append(spawn())
        attempts[-1][0].join(wait_s)
        value, attempts, last_err = harvest(attempts, last_err)
        if value is not None:
            return value
    # Last chance: surface a just-landing value/error from the live
    # attempts instead of a misleading TimeoutError (ADVICE.md round 1).
    for t, _ in attempts:
        t.join(2.0 / max(len(attempts), 1))
    value, attempts, last_err = harvest(attempts, last_err)
    if value is not None:
        return value
    if last_err is not None:
        raise last_err
    raise TimeoutError(
        f"device->host readback stalled for {tries * wait_s:.0f}s (TPU tunnel down?)"
    )


def fetch_array(x, tries: int = 30, wait_s: float = 20.0) -> np.ndarray:
    """Device->host readback with watchdog retries; complex-safe.

    Complex arrays are read as two float planes via tiny jitted real/imag
    extractions (a direct complex readback is UNIMPLEMENTED on the tunnel
    and poisons the process — module docstring).
    """
    if hasattr(x, "dtype") and np.issubdtype(np.dtype(x.dtype), np.complexfloating):
        re = _fetch_real(_real_fn()(x), tries, wait_s)
        im = _fetch_real(_imag_fn()(x), tries, wait_s)
        return re + 1j * im
    return _fetch_real(x, tries, wait_s)


def fetch_scalar(x, tries: int = 30, wait_s: float = 20.0) -> float:
    """Scalar readback — the honest completion barrier on tunneled TPUs
    (``block_until_ready`` is not reliable there; BASELINE.md methodology)."""
    return float(fetch_array(x, tries=tries, wait_s=wait_s).reshape(-1)[0])
