"""Incident-wave builders: tilted plane wave and STEM probe (SURVEY.md C9).

The reference builds the incident wave in a CUDA kernel per measurement
(SURVEY.md C9 [U?]).  Here the q-space probe STENCIL (aperture * aberration
phase, defocus included) is a host-side f64 constant; only the per-probe
position phase ramp is traced, so a 4096-probe raster (config 4) is a single
``vmap`` over two scalars per probe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .grids import Grid
from .optics import Aberrations, aperture, chi
from .tunnel import safe_put


def plane_wave(
    grid: Grid,
    wavelength_A: float,
    tilt_xy_rad: tuple[float, float] = (0.0, 0.0),
    dtype=jnp.complex64,
) -> jax.Array:
    """Unit-amplitude plane wave, optionally tilted by (tx, ty) rad.

    Beam tilt is the linear phase exp(2*pi*1j*(x*tan(tx) + y*tan(ty))/lambda)
    (SURVEY.md Appendix A tilt convention; built in f64, cast to dtype).

    The tilt frequency q0 = tan(t)/lambda is QUANTIZED to the nearest grid
    frequency k/L: on a periodic FFT grid a non-lattice ramp has a boundary
    discontinuity whose wrap-around artifact dwarfs the physical tilt
    signal (measured ~70% intensity artifact for an off-lattice 3 mrad vs
    ~8% physical effect for the nearest on-lattice tilt — caught in
    review).  The quantization step is lambda/L rad, i.e. sub-0.01 mrad
    for typical fields of view; the realised tilt is the documented one.
    """
    tx, ty = tilt_xy_rad
    if tx == 0.0 and ty == 0.0:
        # Built in NumPy; safe_put ships complex as two float planes (TPU
        # tunnels cannot transfer complex buffers — fdes_tpu/tunnel.py).
        return safe_put(np.ones(grid.shape, np.dtype(jnp.dtype(dtype).name)))
    ly, lx = grid.extent
    kx = np.round(np.tan(tx) / wavelength_A * lx)  # integer grid harmonics
    ky = np.round(np.tan(ty) / wavelength_A * ly)
    y, x = grid.xy_grids()
    phase = 2.0 * np.pi * (x * kx / lx + y * ky / ly)
    return safe_put(np.exp(1j * phase).astype(np.dtype(jnp.dtype(dtype).name)))


def probe_stencil(
    grid: Grid,
    wavelength_A: float,
    semiangle_rad: float,
    ab: Aberrations = Aberrations(),
) -> np.ndarray:
    """q-space STEM probe stencil A(q)*exp(-1j*chi(q)), unit real-space power.

    Normalised so that sum_r |IFFT[stencil]|^2 == 1 exactly (Parseval:
    sum_q |stencil|^2 == ny*nx).  complex128 on the host; shifting the probe
    only multiplies by a unit-modulus phase so normalisation is position-
    independent.
    """
    amp = aperture(grid, wavelength_A, semiangle_rad)
    st = amp * np.exp(-1j * chi(grid, wavelength_A, ab))
    power = np.sum(np.abs(st) ** 2)
    if power == 0.0:
        raise ValueError("probe aperture excludes all grid frequencies")
    return st * np.sqrt(grid.ny * grid.nx / power)


def probe_from_stencil(
    stencil: jax.Array,
    qy: jax.Array,
    qx: jax.Array,
    pos_yx_A: jax.Array,
    dtype=jnp.complex64,
) -> jax.Array:
    """Real-space probe at position (y, x) Å. Traced; vmap over pos_yx_A.

    psi_0 = IFFT[stencil * exp(-2*pi*1j*(qy*y + qx*x))].
    qy, qx: broadcastable (ny, 1) and (1, nx) frequency grids (1/Å).
    """
    rdt = jnp.float32 if dtype == jnp.complex64 else jnp.float64
    pos = pos_yx_A.astype(rdt)
    phase = -2.0 * jnp.pi * (qy.astype(rdt) * pos[0] + qx.astype(rdt) * pos[1])
    shift = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
    return jnp.fft.ifft2(stencil.astype(dtype) * shift)
