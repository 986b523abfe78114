"""Tunnel-safe transfers (fdes_tpu/tunnel.py).

The axon TPU tunnel cannot transfer complex buffers in either direction (a
single attempt poisons the process — measured, module docstring), so every
host->device path ships complex as two float planes.  These tests pin the
CPU-visible contract: values and dtypes round-trip exactly, and complex
fetches route through real/imag plane extraction.
"""

import numpy as np

from fdes_tpu.tunnel import fetch_array, safe_put


def test_safe_put_complex_roundtrip():
    rng = np.random.default_rng(0)
    a = (rng.random((16, 8)) + 1j * rng.random((16, 8))).astype(np.complex64)
    x = safe_put(a)
    assert x.dtype == np.complex64
    np.testing.assert_array_equal(fetch_array(x), a)


def test_safe_put_real_passthrough():
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    x = safe_put(a)
    assert x.dtype == np.float32
    np.testing.assert_array_equal(np.asarray(x), a)


def test_safe_put_preserves_f64_on_cpu():
    """CPU backends keep f64/c128 exactly (the golden tests depend on it);
    only TPU tunnels downcast."""
    import jax

    if jax.default_backend() != "cpu":
        return
    a = np.linspace(0, 1, 7)  # float64
    assert np.asarray(safe_put(a)).dtype == np.float64
    c = a + 1j * a
    assert fetch_array(safe_put(c)).dtype == np.complex128


def test_fetch_array_complex():
    import jax.numpy as jnp

    z = jnp.exp(1j * jnp.linspace(0.0, 1.0, 5).astype(jnp.float32))
    out = fetch_array(z)
    np.testing.assert_allclose(
        out, np.exp(1j * np.linspace(0, 1, 5)), rtol=1e-6
    )
