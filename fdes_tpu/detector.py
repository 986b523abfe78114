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


def segmented_masks(
    grid: Grid,
    wavelength_A: float,
    inner_rad: float,
    outer_rad: float,
    nseg: int = 4,
    rotation_rad: float = 0.0,
) -> np.ndarray:
    """(nseg, ny, nx) azimuthal sectors of an annulus (DPC detector).

    Segment k covers azimuth [rotation + k*2pi/n, rotation + (k+1)*2pi/n) on
    the diffraction-plane frequency grid; the segments partition the annular
    mask exactly (sum of segments == annular_mask).  Beyond the reference's
    single annular detector (SURVEY.md C11) — segmented/DPC detectors are
    standard on current instruments.
    """
    qy, qx = grid.q_grids()
    theta2 = (qy * qy + qx * qx) * wavelength_A**2
    ann = (theta2 >= inner_rad**2) & (theta2 < outer_rad**2)
    phi = np.mod(np.arctan2(qy, qx) - rotation_rad, 2.0 * np.pi)
    seg = np.floor(phi / (2.0 * np.pi / nseg)).astype(np.int64)
    seg = np.clip(seg, 0, nseg - 1)  # phi == 2*pi edge case
    out = np.zeros((nseg,) + grid.shape, dtype=np.float64)
    for k in range(nseg):
        out[k] = (ann & (seg == k)).astype(np.float64)
    return out


def com_signal(psi_exit: jax.Array, qy: jax.Array, qx: jax.Array) -> jax.Array:
    """First moment (<q_y>, <q_x>) of the diffraction intensity (iCOM/DPC).

    qy, qx: broadcastable frequency grids (1/Å, fft layout — grids.Grid.qy/qx).
    Returns shape (..., 2).  For a weak phase object the COM is proportional
    to the probe-averaged gradient of the projected potential, so this is
    the differentiable forward model for iCOM/first-moment STEM.
    Normalised by total diffracted power (immune to dose scaling).
    """
    f = jnp.fft.fft2(psi_exit)
    p = jnp.abs(f) ** 2
    tot = jnp.sum(p, axis=(-2, -1))
    my = jnp.sum(p * qy.astype(p.dtype), axis=(-2, -1)) / tot
    mx = jnp.sum(p * qx.astype(p.dtype), axis=(-2, -1)) / tot
    return jnp.stack([my, mx], axis=-1)
