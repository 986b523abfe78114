"""PRISM S-matrix STEM vs the exact per-probe rollouts (fdes_tpu/prism.py).

interp=1 keeps every aperture beam, so PRISM must equal forward.stem_raster
to numerical precision: the probe is band-limited to the aperture and
multislice is linear in the incident wave.  interp=2 is the standard PRISM
approximation — checked for plausibility (finite, close), not equality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fdes_tpu.constants import interaction_sigma, wavelength_A
from fdes_tpu.detector import annular_mask
from fdes_tpu.forward import stem_raster, stem_raster_4d
from fdes_tpu.grids import Grid, fresnel_propagator
from fdes_tpu.prism import plan_prism, prism_raster, prism_raster_4d, prism_smatrix
from fdes_tpu.probe import probe_stencil

KV = 300e3


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    n = 32
    grid = Grid(ny=n, nx=n, py=0.35, px=0.35)
    lam = wavelength_A(KV)
    sigma = interaction_sigma(KV)
    v = jnp.asarray(rng.normal(size=(4, n, n)) * 15.0)
    prop = jnp.asarray(fresnel_propagator(grid, lam, 1.5).astype(np.complex128))
    stencil = probe_stencil(grid, lam, 30e-3)
    masks = jnp.asarray(
        np.stack(
            [
                annular_mask(grid, lam, 0.0, 30e-3),
                annular_mask(grid, lam, 40e-3, 120e-3),
            ]
        )
    )
    pos = jnp.asarray(
        (rng.random((8, 2)) * np.array(grid.extent)).astype(np.float64)
    )
    return grid, lam, sigma, v, prop, stencil, masks, pos


def test_prism_f1_matches_exact_raster(setup):
    grid, lam, sigma, v, prop, stencil, masks, pos = setup
    plan = plan_prism(grid, stencil, interp=1)
    smat = prism_smatrix(plan, v, prop, sigma, dtype=jnp.complex128)
    sig_p = prism_raster(smat, plan, pos, masks)

    qy = jnp.asarray(grid.qy()[:, None])
    qx = jnp.asarray(grid.qx()[None, :])
    sig_e = stem_raster(
        v, jnp.asarray(stencil), qy, qx, pos, prop, sigma, masks
    )
    np.testing.assert_allclose(np.asarray(sig_p), np.asarray(sig_e), rtol=1e-9, atol=1e-12)


def test_prism_f1_cbed_matches_exact(setup):
    grid, lam, sigma, v, prop, stencil, masks, pos = setup
    plan = plan_prism(grid, stencil, interp=1)
    smat = prism_smatrix(plan, v, prop, sigma, dtype=jnp.complex128, beam_chunk=None)
    cbed_p = prism_raster_4d(smat, plan, pos[:4], probe_chunk=2)

    qy = jnp.asarray(grid.qy()[:, None])
    qx = jnp.asarray(grid.qx()[None, :])
    cbed_e = stem_raster_4d(
        v, jnp.asarray(stencil), qy, qx, pos[:4], prop, sigma, probe_chunk=2
    )
    np.testing.assert_allclose(
        np.asarray(cbed_p), np.asarray(cbed_e), rtol=1e-9, atol=1e-12
    )


def test_prism_probe_unit_power_any_interp(setup):
    """Total diffracted power (vacuum, band-unlimited propagator) == 1 for
    every interp (renormalised coefficients), and interp=2 keeps ~1/4 the
    beams.  The band-LIMITED propagator legitimately absorbs aperture beams
    beyond 2/3 Nyquist, so the conservation check must exclude it."""
    grid, lam, sigma, v, prop, stencil, masks, pos = setup
    vac = jnp.zeros_like(v)
    prop_free = jnp.asarray(
        fresnel_propagator(grid, lam, 0.0, bandlimit=None).astype(np.complex128)
    )
    for interp in (1, 2):
        plan = plan_prism(grid, stencil, interp=interp)
        smat = prism_smatrix(plan, vac, prop_free, sigma, dtype=jnp.complex128)
        cbed = prism_raster_4d(smat, plan, pos[:2])
        tot = np.asarray(jnp.sum(cbed, axis=(-2, -1)))
        np.testing.assert_allclose(tot, 1.0, rtol=1e-6)
    p1 = plan_prism(grid, stencil, interp=1).nbeams
    p2 = plan_prism(grid, stencil, interp=2).nbeams
    assert 0.15 * p1 <= p2 <= 0.4 * p1


def test_prism_beam_chunking_equal(setup):
    grid, lam, sigma, v, prop, stencil, masks, pos = setup
    plan = plan_prism(grid, stencil, interp=2)
    b = plan.nbeams
    chunk = next(c for c in range(2, b) if b % c == 0)
    full = prism_smatrix(plan, v, prop, sigma, dtype=jnp.complex128)
    chunked = prism_smatrix(
        plan, v, prop, sigma, dtype=jnp.complex128, beam_chunk=chunk
    )
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), atol=1e-12)
    with pytest.raises(ValueError):
        prism_smatrix(plan, v, prop, sigma, beam_chunk=chunk + 1)


def test_prism_gradient_matches_exact_path(setup):
    """jax.grad flows through S-matrix build + synthesis; at interp=1 it
    equals the gradient of the exact per-probe raster (same function)."""
    grid, lam, sigma, v, prop, stencil, masks, pos = setup
    plan = plan_prism(grid, stencil, interp=1)
    qy = jnp.asarray(grid.qy()[:, None])
    qx = jnp.asarray(grid.qx()[None, :])

    def loss_prism(vv):
        smat = prism_smatrix(plan, vv, prop, sigma, dtype=jnp.complex128)
        return jnp.sum(prism_raster(smat, plan, pos[:3], masks))

    def loss_exact(vv):
        return jnp.sum(
            stem_raster(vv, jnp.asarray(stencil), qy, qx, pos[:3], prop, sigma, masks)
        )

    gp = np.asarray(jax.grad(loss_prism)(v))
    ge = np.asarray(jax.grad(loss_exact)(v))
    np.testing.assert_allclose(gp, ge, rtol=1e-7, atol=1e-10)


def test_prism_plan_validation(setup):
    grid, lam, sigma, v, prop, stencil, masks, pos = setup
    with pytest.raises(ValueError):
        plan_prism(grid, stencil, interp=0)
    with pytest.raises(ValueError):
        plan_prism(grid, stencil[:-1], interp=1)
