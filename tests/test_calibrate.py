"""Differentiable instrument calibration (fdes_tpu/calibrate.py):
traced-CTF consistency with the host f64 optics path, and recovery of
unknown aberrations from a through-focus series by autodiff."""

import jax
import jax.numpy as jnp
import numpy as np

import fdes_tpu as f
from fdes_tpu.calibrate import (
    chi_device,
    ctf_device,
    default_params,
    fit_instrument,
    hrtem_series_device,
)
from fdes_tpu.optics import Aberrations, chi_on, ctf
from fdes_tpu.potential import build_potential
from fdes_tpu.propagate import multislice

KV = 300e3


def _qgrids(grid):
    qy = jnp.asarray(grid.qy()[:, None])
    qx = jnp.asarray(grid.qx()[None, :])
    return qy, qx


def test_chi_device_matches_host_optics(si110_small):
    _, grid, _ = si110_small
    lam = f.wavelength_A(KV)
    ab = Aberrations(defocus=123.0, cs=1.1e5, c5=2.0e7, a1=40.0, a1_angle=0.7)
    # f64 params built directly (default_params stores f32 — its rounding
    # of the angle would dominate this exactness check)
    p = {
        k: jnp.float64(v)
        for k, v in dict(
            defocus=ab.defocus, cs=ab.cs, c5=ab.c5, a1=ab.a1,
            a1_angle=ab.a1_angle,
        ).items()
    }
    qy, qx = _qgrids(grid)
    got = np.asarray(chi_device(qy, qx, lam, p))
    want = chi_on(np.asarray(qy), np.asarray(qx), lam, ab)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_ctf_device_matches_host_ctf(si110_small):
    _, grid, _ = si110_small
    lam = f.wavelength_A(KV)
    ab = Aberrations(defocus=-200.0, cs=5e4)
    want = ctf(
        grid, lam, ab,
        aperture_semiangle_rad=0.0,
        defocus_spread_A=30.0,
        source_semiangle_rad=2e-4,
    )
    qy, qx = _qgrids(grid)
    p = default_params(defocus=ab.defocus, cs=ab.cs)
    got = np.asarray(
        ctf_device(
            qy, qx, lam, jax.tree.map(jnp.float64, p),
            defocus_spread_A=30.0, source_semiangle_rad=2e-4,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_fit_recovers_defocus_and_astigmatism(si110_small):
    """Recover (base defocus, A1, A1 angle) from a synthetic through-focus
    series of a known exit wave — the autotuning workflow the reference's
    fixed-optics inverse cannot express (calibrate.py docstring)."""
    _, grid, sliced = si110_small
    lam = f.wavelength_A(KV)
    sigma = f.interaction_sigma(KV)
    v = build_potential(sliced, grid, dtype=jnp.float32)
    prop = jnp.asarray(
        f.fresnel_propagator(grid, lam, sliced.dz).astype(np.complex64)
    )
    psi = multislice(
        f.plane_wave(grid, lam, dtype=jnp.complex64), v, prop, sigma
    )
    qy, qx = _qgrids(grid)
    qy = qy.astype(jnp.float32)
    qx = qx.astype(jnp.float32)
    offs = jnp.asarray([-300.0, -150.0, 0.0, 150.0, 300.0], jnp.float32)
    true = default_params(defocus=87.0, a1=35.0, a1_angle=0.6)
    i_obs = hrtem_series_device(psi, qy, qx, lam, true, offs)

    import optax

    fit, losses = fit_instrument(
        psi, i_obs, qy, qx, lam,
        default_params(),  # cold start: all zeros
        defocus_offsets=offs,
        free=("defocus", "a1", "a1_angle"),
        iterations=600,
        optimizer=optax.adam(2.0),
    )
    assert losses[-1] < 1e-3 * float(losses[0]), losses[-1]
    assert abs(float(fit["defocus"]) - 87.0) < 1.0, fit
    # canonicalise the twofold-astigmatism symmetry (-A1, th+pi/2) ~ (A1, th)
    a1, ang = float(fit["a1"]), float(fit["a1_angle"])
    if a1 < 0:
        a1, ang = -a1, ang + np.pi / 2
    assert abs(a1 - 35.0) < 1.0, fit
    dang = (ang - 0.6) % np.pi
    assert min(dang, np.pi - dang) < 0.05, fit


def test_joint_refine_recovers_v_and_defocus(si110_small):
    """Joint V+optics refinement (calibrate.joint_refine): from zero
    potential AND a 60 Å base-defocus error, simultaneous descent recovers
    most of the defocus and a projected potential near the known-optics
    ceiling (VERDICT.md round-3 missing item 4: the advertised workflow,
    now a code path).  The toy is depth-underdetermined (5 images, 8
    slices), so gates compare against the measured known-optics ceiling
    (corr_proj 0.85 at this iteration budget), not 1.0."""
    from fdes_tpu.calibrate import joint_refine

    _, grid, sliced = si110_small
    lam = f.wavelength_A(KV)
    sigma = f.interaction_sigma(KV)
    v_true = build_potential(sliced, grid, dtype=jnp.float32)
    prop = jnp.asarray(
        f.fresnel_propagator(grid, lam, sliced.dz).astype(np.complex64)
    )
    psi0 = f.plane_wave(grid, lam, dtype=jnp.complex64)
    qy, qx = _qgrids(grid)
    qy = qy.astype(jnp.float32)
    qx = qx.astype(jnp.float32)
    offs = jnp.asarray([-300.0, -150.0, 0.0, 150.0, 300.0], jnp.float32)
    true = default_params(defocus=60.0)
    psi_true = multislice(psi0, v_true, prop, sigma)
    i_obs = hrtem_series_device(psi_true, qy, qx, lam, true, offs)

    v, theta, losses = joint_refine(
        jnp.zeros_like(v_true), psi0, prop, sigma, qy, qx, lam, i_obs,
        default_params(),  # cold start: zero defocus
        defocus_offsets=offs,
        free=("defocus",),
        iterations=800,
    )
    # most of the 60 Å error recovered (cold start sat at 0)
    assert abs(float(theta["defocus"]) - 60.0) < 16.0, theta
    # projected potential near the known-optics ceiling (0.85 measured)
    vt = np.asarray(v_true).sum(0).ravel()
    vr = np.asarray(v).sum(0).ravel()
    corr = float(np.dot(vt - vt.mean(), vr - vr.mean())
                 / (np.linalg.norm(vt - vt.mean()) * np.linalg.norm(vr - vr.mean())))
    assert corr > 0.7, corr
    # the data misfit fell by > 100x
    assert float(losses[-1]) < 1e-2 * float(losses[0]), losses[-1]
