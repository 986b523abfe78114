"""PRISM scattering-matrix STEM (beyond-reference capability).

Exact STEM rasters (forward.stem_raster) run one full multislice per probe
position: 4096 probes x 128 slices = 524k FFT pairs per frame.  PRISM
(Ophus 2017, arXiv:1702.01904 — PAPERS.md) exploits the LINEARITY of
multislice in the incident wave: propagate each plane-wave Fourier
component of the probe-forming aperture through the specimen ONCE (the
scattering matrix S), then every probe's exit wave is a weighted sum

    psi_exit(r; x_p) = sum_b alpha_b(x_p) * S_b(r),
    alpha_b(x_p) = stencil(q_b) * exp(-2*pi*i q_b . x_p) / (ny*nx),

i.e. per probe a (B,) x (B, N^2) contraction — a dense matmul that runs on
the MXU, replacing S slices x 2 FFTs.  With interpolation factor f the
basis is subsampled to every f-th aperture beam (B/f^2 waves, the standard
PRISM accuracy/speed dial); f == 1 keeps EVERY aperture beam and is exact
to numerical precision, because the probe is band-limited to the aperture
and multislice is linear in psi_0 (pinned by tests against stem_raster).

TPU shaping: S-matrix construction is the existing batched multislice scan
(vmap over beams, lax.map chunks); probe synthesis batches positions into
(P, B) @ (B, N^2) matmuls at Precision.HIGHEST (dft.py precision note);
detection reuses the Parseval-normalised masks of detector.py but without
any per-probe FFT — S is stored in the DIFFRACTION plane (fft2 applied
once per beam), so synthesis lands directly on |psi_hat|^2.

At interp > 1 the subsampled basis tiles the field with probe replicas
spaced extent/interp apart (the PRISM approximation); keep the scan window
plus probe tails inside that tile, as in the paper (no real-space cropping
is applied here — chips have the HBM to hold full-field S).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from .grids import Grid
from .propagate import multislice


@dataclasses.dataclass(frozen=True)
class PrismPlan:
    """Host-side beam bookkeeping for one (grid, stencil, interp) choice.

    iy/ix: (B,) fft-layout integer indices of the kept beams; qy/qx their
    frequencies (1/A); alpha0 the position-independent coefficient
    stencil(q_b)/(ny*nx), renormalised so every synthesized probe has unit
    real-space power (sum_b |alpha0_b|^2 * ny*nx == 1).
    """

    iy: np.ndarray
    ix: np.ndarray
    qy: np.ndarray
    qx: np.ndarray
    alpha0: np.ndarray
    shape: tuple[int, int]
    interp: int

    @property
    def nbeams(self) -> int:
        return int(self.iy.size)


def plan_prism(grid: Grid, stencil: np.ndarray, interp: int = 1) -> PrismPlan:
    """Select the plane-wave basis: nonzero-stencil beams, every interp-th.

    stencil: the HOST q-space probe stencil from probe.probe_stencil (c128,
    fft layout).  interp subsamples the integer beam lattice in both axes
    (PRISM's f): B shrinks ~f^2, probe replicas appear at extent/f spacing.
    """
    if interp < 1:
        raise ValueError(f"interp must be >= 1, got {interp}")
    st = np.asarray(stencil)
    if st.shape != grid.shape:
        raise ValueError(f"stencil shape {st.shape} != grid {grid.shape}")
    iy, ix = np.nonzero(np.abs(st) > 0.0)
    ny_, nx_ = grid.shape
    # Subsample on SIGNED harmonics (iy >= n/2 means harmonic iy - n): raw
    # fft indices would put negative-frequency beams on a shifted lattice
    # whenever n % interp != 0, breaking the extent/f replica tiling that
    # justifies the PRISM approximation.
    hy = np.where(iy >= ny_ // 2 + ny_ % 2, iy - ny_, iy)
    hx = np.where(ix >= nx_ // 2 + nx_ % 2, ix - nx_, ix)
    keep = (hy % interp == 0) & (hx % interp == 0)
    iy, ix = iy[keep], ix[keep]
    if iy.size == 0:
        raise ValueError("no beams selected (aperture empty at this interp)")
    ny, nx = grid.shape
    alpha0 = st[iy, ix] / (ny * nx)
    # unit real-space probe power: sum_b |alpha_b|^2 * ny*nx == 1 (the
    # position ramp is unit-modulus, so this holds for every position)
    alpha0 = alpha0 / np.sqrt((ny * nx) * np.sum(np.abs(alpha0) ** 2))
    qy = np.fft.fftfreq(ny, grid.py)[iy]
    qx = np.fft.fftfreq(nx, grid.px)[ix]
    return PrismPlan(
        iy=iy, ix=ix, qy=qy, qx=qx, alpha0=alpha0, shape=(ny, nx), interp=interp
    )


def prism_smatrix(
    plan: PrismPlan,
    v_stack: jax.Array,
    propagator: jax.Array,
    sigma: float,
    *,
    beam_chunk: int | None = None,
    slice_step: Callable[..., jax.Array] | None = None,
    dtype=jnp.complex64,
    fourier: bool = True,
) -> jax.Array:
    """(B, ny, nx) scattering matrix: each beam multisliced through V.

    Beam b's incident wave is the unit plane wave exp(2*pi*i q_b . r) —
    built from integer harmonics so it is exactly periodic on the grid.
    ``fourier=True`` (default) returns fft2(S) (diffraction-plane layout,
    what prism_raster consumes); False returns real-space exit waves.
    beam_chunk bounds memory exactly like stem_raster's probe_chunk.
    """
    ny, nx = plan.shape
    rdt = jnp.float32 if dtype == jnp.complex64 else jnp.float64
    # Integer harmonic phases: (h*j) mod n is exact in int32 (h*j < n^2 <=
    # 2^31 for n <= 46k), so the f32 angle error is ~eps*2pi instead of the
    # ~1e-4 rad a raw f32 product h*j/n accumulates at n = 512.
    jy = jnp.arange(ny, dtype=jnp.int32)[:, None]
    jx = jnp.arange(nx, dtype=jnp.int32)[None, :]

    def one(harm):
        hy, hx = harm
        frac = ((hy * jy) % ny).astype(rdt) / ny + ((hx * jx) % nx).astype(rdt) / nx
        ph = (2.0 * jnp.pi) * frac
        psi0 = jax.lax.complex(jnp.cos(ph), jnp.sin(ph)).astype(dtype)
        psi = multislice(
            psi0, v_stack, propagator, sigma, slice_step=slice_step
        )
        return jnp.fft.fft2(psi) if fourier else psi

    harms = (
        jnp.asarray(plan.iy.astype(np.int32)),
        jnp.asarray(plan.ix.astype(np.int32)),
    )
    b = plan.nbeams
    if beam_chunk is None or beam_chunk >= b:
        return jax.vmap(one)(harms)
    if b % beam_chunk != 0:
        raise ValueError(f"beam_chunk {beam_chunk} must divide nbeams {b}")
    hy = harms[0].reshape(b // beam_chunk, beam_chunk)
    hx = harms[1].reshape(b // beam_chunk, beam_chunk)
    out = jax.lax.map(jax.vmap(one), (hy, hx))
    return out.reshape(b, ny, nx)


def _coeffs(plan_arrays, positions, rdt):
    """(P, B) probe coefficients alpha_b(x_p) for a position batch."""
    alpha0, qy, qx = plan_arrays
    pos = positions.astype(rdt)
    ph = -2.0 * jnp.pi * (
        pos[:, 0:1] * qy[None, :] + pos[:, 1:2] * qx[None, :]
    )
    return alpha0[None, :] * jax.lax.complex(jnp.cos(ph), jnp.sin(ph))


def _plan_device_arrays(plan: PrismPlan, dtype):
    rname = "float32" if dtype == jnp.complex64 else "float64"
    cname = jnp.dtype(dtype).name
    return (
        jnp.asarray(plan.alpha0.astype(cname)),
        jnp.asarray(plan.qy.astype(rname)),
        jnp.asarray(plan.qx.astype(rname)),
    )


def prism_raster(
    smatrix_hat: jax.Array,
    plan: PrismPlan,
    positions_yx: jax.Array,
    detector_masks: jax.Array,
    *,
    probe_chunk: int | None = None,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """STEM signals (ndet, npos) from a Fourier-layout S-matrix.

    Per chunk: coefficients (P, B), synthesis einsum 'pb,byx->pyx' (one MXU
    matmul), Parseval-normalised masked power — numerically the same
    detector model as detector.detector_signal, with zero per-probe FFTs.
    """
    ny, nx = plan.shape
    cdt = smatrix_hat.dtype
    rdt = jnp.float32 if cdt == jnp.complex64 else jnp.float64
    arrays = _plan_device_arrays(plan, cdt)

    def chunk_signals(pos):
        a = _coeffs(arrays, pos, rdt)
        psihat = jnp.einsum("pb,byx->pyx", a, smatrix_hat, precision=precision)
        p = (jnp.abs(psihat) ** 2) / (ny * nx)
        return jnp.einsum(
            "pyx,dyx->pd", p, detector_masks.astype(p.dtype), precision=precision
        )

    npos = positions_yx.shape[0]
    if probe_chunk is None or probe_chunk >= npos:
        return chunk_signals(positions_yx).T
    if npos % probe_chunk != 0:
        raise ValueError(f"probe_chunk {probe_chunk} must divide npos {npos}")
    chunks = positions_yx.reshape(npos // probe_chunk, probe_chunk, 2)
    out = jax.lax.map(chunk_signals, chunks)  # (nchunk, chunk, ndet)
    return out.reshape(npos, -1).T


def prism_raster_4d(
    smatrix_hat: jax.Array,
    plan: PrismPlan,
    positions_yx: jax.Array,
    *,
    probe_chunk: int | None = None,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """(npos, ny, nx) CBED stack (detector.cbed_pattern semantics)."""
    ny, nx = plan.shape
    cdt = smatrix_hat.dtype
    rdt = jnp.float32 if cdt == jnp.complex64 else jnp.float64
    arrays = _plan_device_arrays(plan, cdt)

    def chunk_cbed(pos):
        a = _coeffs(arrays, pos, rdt)
        psihat = jnp.einsum("pb,byx->pyx", a, smatrix_hat, precision=precision)
        return (jnp.abs(psihat) ** 2) / (ny * nx)

    npos = positions_yx.shape[0]
    if probe_chunk is None or probe_chunk >= npos:
        return chunk_cbed(positions_yx)
    if npos % probe_chunk != 0:
        raise ValueError(f"probe_chunk {probe_chunk} must divide npos {npos}")
    chunks = positions_yx.reshape(npos // probe_chunk, probe_chunk, 2)
    out = jax.lax.map(chunk_cbed, chunks)
    return out.reshape(npos, ny, nx)
