"""Measurement-series forward models (SURVEY.md L5, C11, §3.1/§3.4).

The reference loops over the measurement series on the host, one CUDA
launch-chain per image (SURVEY.md §3.1: `for m in measurements`).  Here a
whole series is ONE traced program: `vmap` over the per-measurement inputs
(CTFs for a defocus series, propagators/incident waves for a tilt series,
positions for a STEM raster), so XLA batches the FFT pipeline and the series
axis is directly shardable across a device mesh (sharding.py).

All functions are pure and jit/vmap/grad-safe; constants (propagator, CTF
stacks, probe stencil) are built on the host in f64 (grids/optics/probe) and
passed in as arrays, already cast to the device dtype.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .detector import detector_signal
from .imaging import hrtem_image, hrtem_incoherent
from .probe import probe_from_stencil
from .propagate import multislice


def hrtem_defocus_series(
    v_stack: jax.Array,
    psi0: jax.Array,
    propagator: jax.Array,
    sigma: float,
    ctf_stack: jax.Array,
    *,
    weights: jax.Array | None = None,
    remat_chunk: int | None = None,
    slice_step: Callable[..., jax.Array] | None = None,
) -> jax.Array:
    """(D, ny, nx) intensity series: one rollout, D imaging passes.

    The rollout is shared across defoci (the specimen does not change with
    defocus), so this is multislice once + vmap over the CTF stack — the
    reference recomputes the rollout per image (SURVEY.md §3.1); sharing it
    is both exact and D× cheaper.

    ``weights``: when given, ctf_stack is a (D, K, ny, nx) quadrature pack
    (optics.ctf_quadrature_series) and each image is the explicit
    partial-coherence average over the K nodes (imaging.hrtem_incoherent).
    """
    psi = multislice(
        psi0, v_stack, propagator, sigma, remat_chunk=remat_chunk,
        slice_step=slice_step,
    )
    if weights is not None:
        return jax.vmap(lambda cq: hrtem_incoherent(psi, cq, weights))(ctf_stack)
    return jax.vmap(lambda c: hrtem_image(psi, c))(ctf_stack)


def hrtem_tilt_series(
    v_stack: jax.Array,
    psi0_stack: jax.Array,
    propagator_stack: jax.Array,
    sigma: float,
    ctf: jax.Array,
    *,
    weights: jax.Array | None = None,
    remat_chunk: int | None = None,
    slice_step: Callable[..., jax.Array] | None = None,
    sequential: bool = False,
) -> jax.Array:
    """(T, ny, nx) tilt series: vmap of full rollouts over (psi0, P) pairs.

    Tilt changes the propagator (SURVEY.md Appendix A tilt term) and the
    incident wave, so each tilt is an independent rollout — this is the
    shardable "rollout batch" axis for inverse tilt tomography.

    ``weights``: when given, ``ctf`` is a (K, ny, nx) quadrature pack and
    each image is the explicit partial-coherence average over the K nodes.

    ``sequential``: run tilts through ``lax.map`` instead of ``vmap``.
    Both compositions work with every engine (round-5 measurement at
    2048²×32×4 tilts: vmapped panel adjoint 187.0 ms/iter vs sequential
    193.9 — a wash); the sequential map exists for MEMORY control at
    pod grids, where T simultaneous store-s s-stacks can outgrow HBM
    while the map keeps one tilt's pipeline live at a time.  Gradients
    are identical (the summed dV accumulates by autodiff linearity).
    """

    def one(psi0, prop):
        psi = multislice(
            psi0, v_stack, prop, sigma, remat_chunk=remat_chunk,
            slice_step=slice_step,
        )
        if weights is not None:
            return hrtem_incoherent(psi, ctf, weights)
        return hrtem_image(psi, ctf)

    if sequential:
        return jax.lax.map(
            lambda args: one(*args), (psi0_stack, propagator_stack)
        )
    return jax.vmap(one)(psi0_stack, propagator_stack)


def stem_raster(
    v_stack: jax.Array,
    stencil: jax.Array,
    qy: jax.Array,
    qx: jax.Array,
    positions_yx: jax.Array,
    propagator: jax.Array,
    sigma: float,
    detector_masks: jax.Array,
    *,
    probe_chunk: int | None = None,
    remat_chunk: int | None = None,
    slice_step: Callable[..., jax.Array] | None = None,
) -> jax.Array:
    """STEM signals (ndet, npos): independent rollouts per probe position.

    positions_yx: (npos, 2) probe centers in Å.  detector_masks: (ndet, ny,
    nx) fft-layout annular masks.  ``probe_chunk`` bounds memory by running
    the vmap in lax.map groups (SURVEY.md §7: "16k×rollout per step must be
    chunked"); npos must be a multiple of probe_chunk (pad positions and
    drop, or choose a divisor).
    """
    cdt = stencil.dtype

    def one(pos):
        psi0 = probe_from_stencil(stencil, qy, qx, pos, dtype=cdt)
        psi = multislice(
            psi0, v_stack, propagator, sigma, remat_chunk=remat_chunk,
            slice_step=slice_step,
        )
        return detector_signal(psi, detector_masks)  # (ndet,)

    npos = positions_yx.shape[0]
    if probe_chunk is None or probe_chunk >= npos:
        return jax.vmap(one)(positions_yx).T  # (ndet, npos)
    if npos % probe_chunk != 0:
        raise ValueError(f"probe_chunk {probe_chunk} must divide npos {npos}")
    chunks = positions_yx.reshape(npos // probe_chunk, probe_chunk, 2)
    out = jax.lax.map(jax.vmap(one), chunks)  # (nchunk, chunk, ndet)
    return out.reshape(npos, -1).T


def stem_raster_4d(
    v_stack: jax.Array,
    stencil: jax.Array,
    qy: jax.Array,
    qx: jax.Array,
    positions_yx: jax.Array,
    propagator: jax.Array,
    sigma: float,
    *,
    probe_chunk: int | None = None,
    remat_chunk: int | None = None,
    slice_step: Callable[..., jax.Array] | None = None,
) -> jax.Array:
    """4D-STEM: full CBED pattern per probe, (npos, ny, nx).

    The reference integrates annular detectors on-device and never stores
    the diffraction plane [U?]; the 4D export (for ptychography/COM/iDPC
    post-processing) falls out of the same rollout for free here.  Memory
    is npos*ny*nx floats — chunk the probe axis for large rasters.
    """
    from .detector import cbed_pattern

    cdt = stencil.dtype

    def one(pos):
        psi0 = probe_from_stencil(stencil, qy, qx, pos, dtype=cdt)
        psi = multislice(
            psi0, v_stack, propagator, sigma, remat_chunk=remat_chunk,
            slice_step=slice_step,
        )
        return cbed_pattern(psi)

    npos = positions_yx.shape[0]
    if probe_chunk is None or probe_chunk >= npos:
        return jax.vmap(one)(positions_yx)
    if npos % probe_chunk != 0:
        raise ValueError(f"probe_chunk {probe_chunk} must divide npos {npos}")
    chunks = positions_yx.reshape(npos // probe_chunk, probe_chunk, 2)
    out = jax.lax.map(jax.vmap(one), chunks)
    return out.reshape(npos, *out.shape[2:])


def stem_com_raster(
    v_stack: jax.Array,
    stencil: jax.Array,
    qy: jax.Array,
    qx: jax.Array,
    positions_yx: jax.Array,
    propagator: jax.Array,
    sigma: float,
    *,
    probe_chunk: int | None = None,
    remat_chunk: int | None = None,
    slice_step: Callable[..., jax.Array] | None = None,
) -> jax.Array:
    """iCOM raster: first moment (<q_y>, <q_x>) per probe, (npos, 2).

    Same rollout batch as stem_raster with detector.com_signal as the
    readout — the differentiable forward model for first-moment/DPC STEM
    (beyond the reference's annular-only detector, SURVEY.md C11).
    """
    from .detector import com_signal

    cdt = stencil.dtype

    def one(pos):
        psi0 = probe_from_stencil(stencil, qy, qx, pos, dtype=cdt)
        psi = multislice(
            psi0, v_stack, propagator, sigma, remat_chunk=remat_chunk,
            slice_step=slice_step,
        )
        return com_signal(psi, qy, qx)  # (2,)

    npos = positions_yx.shape[0]
    if probe_chunk is None or probe_chunk >= npos:
        return jax.vmap(one)(positions_yx)
    if npos % probe_chunk != 0:
        raise ValueError(f"probe_chunk {probe_chunk} must divide npos {npos}")
    chunks = positions_yx.reshape(npos // probe_chunk, probe_chunk, 2)
    out = jax.lax.map(jax.vmap(one), chunks)
    return out.reshape(npos, 2)
