"""Diffraction-plane detectors for STEM (SURVEY.md C11 STEM row, §3.4).

The annular mask is a host-side f64 constant on the fft-layout frequency
grid; the traced part is one |FFT|^2 and a masked sum per probe.  The power
spectrum is normalised so that sum_q P(q) == sum_r |psi|^2 (Parseval), i.e.
for a unit-power probe the BF + ADF + ... fractions sum to <= 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .grids import Grid


def annular_mask(
    grid: Grid,
    wavelength_A: float,
    inner_rad: float,
    outer_rad: float,
) -> np.ndarray:
    """1 where inner <= lambda*|q| < outer (scattering semi-angles, rad)."""
    theta2 = grid.q2() * wavelength_A**2
    return ((theta2 >= inner_rad**2) & (theta2 < outer_rad**2)).astype(np.float64)


def detector_signal(psi_exit: jax.Array, mask: jax.Array) -> jax.Array:
    """Scalar masked power in the diffraction plane, Parseval-normalised."""
    f = jnp.fft.fft2(psi_exit)
    p = (jnp.abs(f) ** 2) / (psi_exit.shape[-2] * psi_exit.shape[-1])
    return jnp.sum(p * mask.astype(p.dtype), axis=(-2, -1))


def cbed_pattern(psi_exit: jax.Array) -> jax.Array:
    """Full diffraction-plane intensity (for 4D-STEM / ptychography export)."""
    f = jnp.fft.fft2(psi_exit)
    return (jnp.abs(f) ** 2) / (psi_exit.shape[-2] * psi_exit.shape[-1])
