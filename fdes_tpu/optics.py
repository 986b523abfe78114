"""Aberrations, apertures and the contrast-transfer function (SURVEY.md C10).

Conventions (SURVEY.md Appendix A):
    chi(q) = pi*lambda*C1*q^2 + (pi/2)*C3*lambda^3*q^4 + (pi/3)*C5*lambda^5*q^6
             + pi*lambda*A1*q^2*cos(2*(phi - phi_A1))
    CTF(q) = A(q) * exp(-1j*chi(q)) * E_t(q) * E_s(q)
with C1 the defocus (positive = underfocus in this code's convention — the
sign only has to be consistent between forward and inverse paths, and is
pinned by tests), A(q) a hard circular aperture on the scattering semi-angle
theta = lambda*q, E_t the temporal-coherence envelope for defocus spread
``delta_A`` and E_s the source-spread envelope for semi-angle ``theta_c``:
    E_t = exp(-0.5*(pi*lambda*delta)^2 * q^4)
    E_s = exp(-(pi*theta_c)^2 * (C1*q + C3*lambda^2*q^3)^2)

Everything here is built on the host in float64 (phases exact before any
cast, SURVEY.md §7 precision risk) and returned as NumPy; jitted callers cast
to device dtype.  Defocus enters separately in ``ctf`` so a defocus SERIES is
one stacked host array (SURVEY.md C10/C11, vmapped in imaging.py).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .grids import Grid


@dataclasses.dataclass(frozen=True)
class Aberrations:
    """Axial aberration coefficients, all in Å except angles in rad.

    Rotationally symmetric: defocus C1, spherical cs=C3, fifth-order c5.
    Azimuthal (Krivanek C_{n,m} set through third order, each a magnitude
    in Å plus an azimuth in rad):

        a1 twofold astigmatism (n=1,m=2)    b2 axial coma        (n=2,m=1)
        a2 threefold astigmatism (n=2,m=3)  s3 star aberration   (n=3,m=2)
        a3 fourfold astigmatism (n=3,m=4)

    All enter chi via the standard expansion (see `chi`); the reference
    models C1/C3/C5 + twofold astigmatism only (SURVEY.md Appendix A) — the
    higher azimuthal orders are parity-plus coverage for corrected
    instruments, zero by default so reference configs are unchanged.
    """

    defocus: float = 0.0
    cs: float = 0.0
    c5: float = 0.0
    a1: float = 0.0
    a1_angle: float = 0.0
    b2: float = 0.0
    b2_angle: float = 0.0
    a2: float = 0.0
    a2_angle: float = 0.0
    s3: float = 0.0
    s3_angle: float = 0.0
    a3: float = 0.0
    a3_angle: float = 0.0


def chi(grid: Grid, wavelength_A: float, ab: Aberrations) -> np.ndarray:
    """Aberration phase chi(q) in rad, float64 (ny, nx).

    Krivanek convention: chi = (2*pi/lam) * sum_{n,m} C_{n,m} *
    (lam*q)^{n+1}/(n+1) * cos(m*(phi - phi_{n,m})); the C1/C3/C5/A1 terms
    below are algebraically identical to SURVEY.md Appendix A's form.
    """
    qy, qx = grid.q_grids()
    q2 = qy * qy + qx * qx
    lam = wavelength_A
    phase = np.pi * lam * ab.defocus * q2
    if ab.cs:
        phase = phase + 0.5 * np.pi * ab.cs * lam**3 * q2 * q2
    if ab.c5:
        phase = phase + (np.pi / 3.0) * ab.c5 * lam**5 * q2 * q2 * q2
    if ab.a1 or ab.b2 or ab.a2 or ab.s3 or ab.a3:
        phi = np.arctan2(qy, qx)
        if ab.a1:
            phase = phase + np.pi * lam * ab.a1 * q2 * np.cos(2.0 * (phi - ab.a1_angle))
        if ab.b2 or ab.a2:
            q3 = q2 * np.sqrt(q2)
            if ab.b2:
                phase = phase + (2.0 * np.pi / 3.0) * lam**2 * ab.b2 * q3 * np.cos(
                    phi - ab.b2_angle
                )
            if ab.a2:
                phase = phase + (2.0 * np.pi / 3.0) * lam**2 * ab.a2 * q3 * np.cos(
                    3.0 * (phi - ab.a2_angle)
                )
        if ab.s3:
            phase = phase + 0.5 * np.pi * lam**3 * ab.s3 * q2 * q2 * np.cos(
                2.0 * (phi - ab.s3_angle)
            )
        if ab.a3:
            phase = phase + 0.5 * np.pi * lam**3 * ab.a3 * q2 * q2 * np.cos(
                4.0 * (phi - ab.a3_angle)
            )
    return phase


def aperture(grid: Grid, wavelength_A: float, semiangle_rad: float) -> np.ndarray:
    """Hard circular objective aperture A(q): 1 where lambda*|q| <= alpha."""
    if semiangle_rad <= 0:
        return np.ones(grid.shape, dtype=np.float64)
    q2 = grid.q2()
    qmax = semiangle_rad / wavelength_A
    return (q2 <= qmax * qmax).astype(np.float64)


def envelopes(
    grid: Grid,
    wavelength_A: float,
    ab: Aberrations,
    defocus_spread_A: float = 0.0,
    source_semiangle_rad: float = 0.0,
) -> np.ndarray:
    """Partial-coherence damping E_t(q)*E_s(q), float64 (ny, nx)."""
    q2 = grid.q2()
    env = np.ones(grid.shape, dtype=np.float64)
    lam = wavelength_A
    if defocus_spread_A > 0.0:
        env = env * np.exp(-0.5 * (np.pi * lam * defocus_spread_A) ** 2 * q2 * q2)
    if source_semiangle_rad > 0.0:
        q = np.sqrt(q2)
        grad = ab.defocus * q + ab.cs * lam**2 * q2 * q
        env = env * np.exp(-((np.pi * source_semiangle_rad) ** 2) * grad * grad)
    return env


def ctf(
    grid: Grid,
    wavelength_A: float,
    ab: Aberrations,
    aperture_semiangle_rad: float = 0.0,
    defocus_spread_A: float = 0.0,
    source_semiangle_rad: float = 0.0,
) -> np.ndarray:
    """Complex CTF(q) = A * exp(-1j*chi) * E_t * E_s, complex128 (ny, nx)."""
    amp = aperture(grid, wavelength_A, aperture_semiangle_rad) * envelopes(
        grid, wavelength_A, ab, defocus_spread_A, source_semiangle_rad
    )
    return amp * np.exp(-1j * chi(grid, wavelength_A, ab))


def ctf_traced(
    qy,
    qx,
    wavelength_A: float,
    defocus,
    cs=0.0,
    c5=0.0,
    a1=0.0,
    a1_angle=0.0,
    aperture_mask=None,
    b2=0.0,
    b2_angle=0.0,
    a2=0.0,
    a2_angle=0.0,
    s3=0.0,
    s3_angle=0.0,
    a3=0.0,
    a3_angle=0.0,
):
    """Differentiable CTF: aberration coefficients as TRACED jnp scalars.

    The host-built `ctf`/`ctf_series` treat aberrations as constants; this
    variant keeps (defocus, cs, c5, a1, a1_angle) inside the jaxpr so
    `jax.grad` can refine the optics jointly with the potential (aberration
    self-calibration — beyond the reference's scope, where aberrations are
    fixed inputs).  qy, qx: broadcastable frequency grids (1/Å);
    aperture_mask: optional fixed (ny, nx) amplitude (hard apertures are
    not usefully differentiable).  Returns complex CTF(q) = A*exp(-1j*chi).
    """
    import jax
    import jax.numpy as jnp

    q2 = qy * qy + qx * qx
    lam = wavelength_A
    phase = jnp.pi * lam * defocus * q2
    phase = phase + 0.5 * jnp.pi * cs * lam**3 * q2 * q2
    phase = phase + (jnp.pi / 3.0) * c5 * lam**5 * q2 * q2 * q2
    phi = jnp.arctan2(qy, qx)
    phase = phase + jnp.pi * lam * a1 * q2 * jnp.cos(2.0 * (phi - a1_angle))
    q3 = q2 * jnp.sqrt(q2)
    phase = phase + (2.0 * jnp.pi / 3.0) * lam**2 * b2 * q3 * jnp.cos(phi - b2_angle)
    phase = phase + (2.0 * jnp.pi / 3.0) * lam**2 * a2 * q3 * jnp.cos(
        3.0 * (phi - a2_angle)
    )
    phase = phase + 0.5 * jnp.pi * lam**3 * s3 * q2 * q2 * jnp.cos(
        2.0 * (phi - s3_angle)
    )
    phase = phase + 0.5 * jnp.pi * lam**3 * a3 * q2 * q2 * jnp.cos(
        4.0 * (phi - a3_angle)
    )
    out = jax.lax.complex(jnp.cos(phase), -jnp.sin(phase))
    if aperture_mask is not None:
        out = out * aperture_mask.astype(out.dtype)
    return out


def ctf_series(
    grid: Grid,
    wavelength_A: float,
    defoci_A: np.ndarray,
    base: Aberrations = Aberrations(),
    aperture_semiangle_rad: float = 0.0,
    defocus_spread_A: float = 0.0,
    source_semiangle_rad: float = 0.0,
) -> np.ndarray:
    """Stacked CTFs for a defocus series: complex128 (ndefoci, ny, nx)."""
    out = np.empty((len(defoci_A),) + grid.shape, dtype=np.complex128)
    for i, df in enumerate(np.asarray(defoci_A, dtype=np.float64)):
        ab = dataclasses.replace(base, defocus=float(df))
        out[i] = ctf(
            grid,
            wavelength_A,
            ab,
            aperture_semiangle_rad,
            defocus_spread_A,
            source_semiangle_rad,
        )
    return out
