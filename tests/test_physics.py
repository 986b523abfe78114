"""Unit tests for physics constants, grids, scattering, specimen (SURVEY §4
unit-physics tier). Anchor values are published electron-microscopy numbers:
Kirkland, "Advanced Computing in Electron Microscopy", Table of lambda/sigma.
"""

import numpy as np
import pytest

from fdes_tpu.constants import (
    POTENTIAL_PREFACTOR,
    interaction_sigma,
    lorentz_gamma,
    wavelength_A,
)
from fdes_tpu.grids import Grid, fresnel_propagator
from fdes_tpu.scattering import ScatteringTable, wentzel_fe
from fdes_tpu.specimen import make_si110_supercell, slice_specimen


@pytest.mark.parametrize(
    "kv,lam",
    [(100e3, 0.037014), (200e3, 0.025079), (300e3, 0.019687)],
)
def test_wavelength_published_values(kv, lam):
    assert wavelength_A(kv) == pytest.approx(lam, rel=1e-4)


@pytest.mark.parametrize(
    "kv,sig",
    [(100e3, 9.2440e-4), (200e3, 7.2884e-4), (300e3, 6.5262e-4)],
)
def test_sigma_published_values(kv, sig):
    # sigma in rad/(V*Å) — standard references tabulate the same mantissas
    # in rad/(V*nm): 0.92440, 0.72884, 0.65262 (x10 these values).
    assert interaction_sigma(kv) == pytest.approx(sig, rel=1e-3)


def test_gamma_300kv():
    assert lorentz_gamma(300e3) == pytest.approx(1.5871, rel=1e-4)


def test_potential_prefactor():
    # Kirkland's h^2/(2 pi m0 e) = 47.878 V*Å^2
    assert POTENTIAL_PREFACTOR == pytest.approx(47.878, rel=1e-4)


def test_wentzel_fe_properties():
    q2 = np.linspace(0.0, 100.0, 512)
    f = wentzel_fe(q2, 14)
    assert np.all(f > 0)
    assert np.all(np.diff(f) < 0)  # monotone decreasing in q^2
    # Coulomb limit: q^2 * f -> Z/(2 pi^2 a0) as q -> inf
    tail = q2[-1] * f[-1]
    assert tail == pytest.approx(14 / (2 * np.pi**2 * 0.5291772109), rel=1e-2)


def test_scattering_table_dispatch():
    t = ScatteringTable()
    q2 = np.asarray([0.0, 1.0])
    np.testing.assert_allclose(t.fe(q2, 6), wentzel_fe(q2, 6))
    with pytest.raises(ValueError):
        ScatteringTable(kind="nope").fe(q2, 6)


def test_grid_basics():
    g = Grid(ny=8, nx=16, py=0.5, px=0.25)
    assert g.shape == (8, 16)
    assert g.extent == (4.0, 4.0)
    assert g.q_nyquist() == pytest.approx(1.0)  # min(1/(2*0.5), 1/(2*0.25))
    q2 = g.q2()
    assert q2[0, 0] == 0.0
    assert q2.max() <= (1.0**2 + 2.0**2)
    m = g.bandlimit_mask()
    # DC passes, corner is blocked
    assert m[0, 0] == 1.0
    assert m[4, 8] == 0.0


def test_propagator_unitarity_inside_band():
    g = Grid(ny=32, nx=32, py=0.2, px=0.2)
    p = fresnel_propagator(g, wavelength_A(300e3), dz_A=2.0, bandlimit=None)
    np.testing.assert_allclose(np.abs(p), 1.0, atol=1e-12)
    p_bl = fresnel_propagator(g, wavelength_A(300e3), dz_A=2.0)
    mask = g.bandlimit_mask()
    np.testing.assert_allclose(np.abs(p_bl), mask, atol=1e-12)


def test_propagator_dz_zero_is_identity():
    g = Grid(ny=16, nx=16, py=0.3, px=0.3)
    p = fresnel_propagator(g, wavelength_A(300e3), dz_A=0.0, bandlimit=None)
    np.testing.assert_allclose(p, 1.0 + 0j, atol=1e-14)


def test_si110_supercell_structure():
    spec = make_si110_supercell(reps=(2, 2, 2))
    assert spec.natoms == 16 * 8
    a = 5.431
    np.testing.assert_allclose(
        spec.box, [2 * a, 2 * a * np.sqrt(2), 2 * a * np.sqrt(2)]
    )
    # all atoms inside the box
    assert np.all(spec.positions >= 0)
    assert np.all(spec.positions < spec.box)
    # atomic density of Si: 8 atoms per a^3
    vol = np.prod(spec.box)
    assert spec.natoms / vol == pytest.approx(8 / a**3, rel=1e-12)


def test_si110_deterministic():
    s1 = make_si110_supercell(reps=(2, 1, 1), jitter=0.01, seed=7)
    s2 = make_si110_supercell(reps=(2, 1, 1), jitter=0.01, seed=7)
    np.testing.assert_array_equal(s1.positions, s2.positions)


def test_slice_specimen_binning():
    spec = make_si110_supercell(reps=(1, 1, 2))
    sliced = slice_specimen(spec, nslices=4)
    assert sliced.nslices == 4
    assert sliced.dz == pytest.approx(spec.box[2] / 4)
    assert sliced.slice_idx.min() >= 0 and sliced.slice_idx.max() <= 3
    # every atom lands in the slice containing its z
    z = spec.positions[:, 2]
    np.testing.assert_array_equal(
        sliced.slice_idx, np.clip(np.floor(z / sliced.dz), 0, 3).astype(np.int32)
    )
    # single species (Si, one B)
    assert sliced.species == ((14, 0.45),)
    assert np.all(sliced.species_idx == 0)


def test_ctf_traced_matches_host_and_is_differentiable():
    """Traced CTF == host-built CTF; gradients wrt aberrations flow, and a
    tiny defocus-refinement problem recovers the true defocus."""
    import jax
    import jax.numpy as jnp

    from fdes_tpu.grids import Grid
    from fdes_tpu.optics import Aberrations, ctf, ctf_traced

    g = Grid(ny=32, nx=32, py=0.3, px=0.3)
    lam = wavelength_A(300e3)
    ab = Aberrations(defocus=150.0, cs=1.2e7, a1=30.0, a1_angle=0.4)
    host = ctf(g, lam, ab)
    qy = jnp.asarray(g.qy()[:, None])
    qx = jnp.asarray(g.qx()[None, :])
    traced = ctf_traced(
        qy, qx, lam, 150.0, cs=1.2e7, a1=30.0, a1_angle=0.4
    )
    np.testing.assert_allclose(np.asarray(traced), host, atol=1e-12)

    # defocus self-calibration: recover df from an image-intensity residual
    rng = np.random.default_rng(0)
    psi = jnp.asarray(rng.normal(size=g.shape) + 1j * rng.normal(size=g.shape))
    df_true = 180.0

    def image(df):
        c = ctf_traced(qy, qx, lam, df, cs=1.2e7)
        return jnp.abs(jnp.fft.ifft2(jnp.fft.fft2(psi) * c)) ** 2

    i_obs = image(df_true)

    def loss(df):
        r = image(df) - i_obs
        return jnp.sum(r * r)

    # local refinement from a nearby guess (the CTF loss is oscillatory in
    # defocus globally; self-calibration is a local polish in practice)
    import optax

    opt = optax.adam(1.0)
    df = jnp.asarray(170.0)
    st = opt.init(df)
    for _ in range(300):
        gr = jax.grad(loss)(df)
        up, st = opt.update(gr, st)
        df = optax.apply_updates(df, up)
    assert abs(float(df) - df_true) < 0.5, f"defocus refinement landed at {df}"
