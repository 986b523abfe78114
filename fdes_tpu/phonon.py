"""Frozen-phonon (thermal diffuse scattering) model (SURVEY.md C23).

The reference's thermal model is the Debye-Waller factor baked into the
scattering tables (C4); an explicit frozen-phonon loop is unconfirmed
upstream ([U?], SURVEY.md C23) but cheap and strictly more physical, so the
rebuild carries both:

* DWF mode (default elsewhere): f_e(q) * exp(-B q^2/4) damps each species'
  potential — models the TIME-AVERAGED potential, loses TDS intensity.
* Frozen-phonon mode (this module): average the INTENSITY over atom
  configurations displaced by the thermal RMS u = sqrt(B/(8*pi^2)) per
  Cartesian axis, each config simulated with B=0 (no double counting).
  The incoherent configuration average converges to DWF+TDS physics.

Configurations are generated on the host (z displacements re-bin atoms
into slices, which is host logic anyway); the per-config simulations are
independent rollouts — the same shardable "measurement" axis as tilts
(SURVEY.md §2.1 DP row), so phonon configs scale across the mesh for free.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import numpy as np

from .specimen import Specimen, SlicedAtoms, slice_specimen


def thermal_sigma_A(bfactor_A2: np.ndarray) -> np.ndarray:
    """Per-axis RMS displacement u (Å) from Debye-Waller B = 8*pi^2*<u^2>."""
    return np.sqrt(np.asarray(bfactor_A2) / (8.0 * math.pi**2))


def phonon_configs(
    spec: Specimen, nconfigs: int, seed: int = 0
) -> list[Specimen]:
    """Displaced copies of ``spec`` with bfactors zeroed.

    Each config displaces every atom by an isotropic Gaussian with the
    per-axis sigma from its B factor; the returned specimens carry B=0 so
    the scattering factors are not ALSO damped (no double counting).
    """
    rng = np.random.default_rng(seed)
    u = thermal_sigma_A(spec.bfactors)[:, None]  # (n, 1) per-axis sigma
    out = []
    for _ in range(nconfigs):
        disp = rng.normal(size=spec.positions.shape) * u
        out.append(
            Specimen(
                positions=spec.positions + disp,
                numbers=spec.numbers,
                bfactors=np.zeros_like(spec.bfactors),
                occupancies=spec.occupancies,
                box=spec.box,
            )
        )
    return out


def phonon_sliced(
    spec: Specimen,
    nconfigs: int,
    nslices: int,
    dz: float | None = None,
    seed: int = 0,
) -> list[SlicedAtoms]:
    """slice_specimen applied to each displaced config (z re-binned)."""
    return [
        slice_specimen(s, nslices, dz=dz)
        for s in phonon_configs(spec, nconfigs, seed)
    ]


def phonon_average(
    intensity_fn: Callable[[SlicedAtoms], np.ndarray],
    configs: Sequence[SlicedAtoms],
):
    """Mean INTENSITY over frozen-phonon configs (incoherent average).

    intensity_fn maps one sliced config to any intensity pytree/array
    (HRTEM image stack, STEM signals...).  Waves must not be averaged —
    the configuration average is incoherent by construction.
    """
    acc = None
    for c in configs:
        out = intensity_fn(c)
        acc = out if acc is None else jax_tree_add(acc, out)
    return jax_tree_scale(acc, 1.0 / len(configs))


def jax_tree_add(a, b):
    import jax

    return jax.tree.map(lambda x, y: x + y, a, b)


def jax_tree_scale(a, s):
    import jax

    return jax.tree.map(lambda x: x * s, a)
