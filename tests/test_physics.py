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


def test_higher_order_aberrations_symmetries():
    """Krivanek azimuthal terms: m-fold rotational symmetry of chi, parity
    under inversion (chi(-q) = (-1)^m chi(q) for a pure C_{n,m} term), and
    scaling with q^{n+1}."""
    from fdes_tpu.optics import Aberrations, chi

    g = Grid(ny=64, nx=64, py=0.2, px=0.2)
    lam = wavelength_A(300e3)
    qy, qx = g.q_grids()
    phi = np.arctan2(qy, qx)
    q = np.sqrt(g.q2())

    cases = [  # (kwargs, m, n)
        (dict(b2=5e4, b2_angle=0.3), 1, 2),
        (dict(a2=5e4, a2_angle=0.7), 3, 2),
        (dict(s3=2e6, s3_angle=0.2), 2, 3),
        (dict(a3=2e6, a3_angle=1.1), 4, 3),
    ]
    for kwargs, m, n in cases:
        ab = Aberrations(**kwargs)
        ph = chi(g, lam, ab)
        # analytic reconstruction from the documented expansion
        coeff = list(kwargs.values())[0]
        ang = list(kwargs.values())[1]
        expect = (
            2.0 * np.pi / lam * coeff * (lam * q) ** (n + 1) / (n + 1)
            * np.cos(m * (phi - ang))
        )
        np.testing.assert_allclose(ph, expect, atol=1e-9)
        # m-fold symmetry: rotating the azimuth origin by 2*pi/m is invisible
        ab_rot = Aberrations(**{**kwargs, list(kwargs)[1]: ang + 2 * np.pi / m})
        np.testing.assert_allclose(chi(g, lam, ab_rot), ph, atol=1e-9)
        # inversion parity: chi(-q) = (-1)^m chi(q) (cos(m(phi+pi-t)));
        # fftfreq grids are not inversion-aligned, so check analytically
        expect_inv = (
            2.0 * np.pi / lam * coeff * (lam * q) ** (n + 1) / (n + 1)
            * np.cos(m * (phi + np.pi - ang))
        )
        np.testing.assert_allclose(expect_inv, (-1) ** m * expect, atol=1e-9)


def test_ctf_traced_higher_orders_match_host_and_differentiate():
    import jax
    import jax.numpy as jnp

    from fdes_tpu.optics import Aberrations, ctf, ctf_traced

    g = Grid(ny=32, nx=32, py=0.3, px=0.3)
    lam = wavelength_A(300e3)
    kw = dict(
        defocus=120.0, cs=1.2e7, a1=30.0, a1_angle=0.4,
        b2=4e4, b2_angle=0.2, a2=3e4, a2_angle=0.9,
        s3=1.5e6, s3_angle=0.5, a3=1.1e6, a3_angle=1.3,
    )
    host = ctf(g, lam, Aberrations(**kw))
    qy = jnp.asarray(g.qy()[:, None])
    qx = jnp.asarray(g.qx()[None, :])
    traced = ctf_traced(qy, qx, lam, **kw)
    np.testing.assert_allclose(np.asarray(traced), host, atol=1e-12)

    # gradients wrt every higher-order coefficient are finite and nonzero
    def power(b2, a2, s3, a3):
        c = ctf_traced(qy, qx, lam, 120.0, b2=b2, a2=a2, s3=s3, a3=a3)
        w = jnp.fft.ifft2(c)
        return jnp.sum(jnp.abs(w.real) ** 3)  # phase-sensitive probe

    grads = jax.grad(power, argnums=(0, 1, 2, 3))(4e4, 3e4, 1.5e6, 1.1e6)
    for gv in grads:
        assert np.isfinite(float(gv)) and float(gv) != 0.0


def test_fresnel_gaussian_spreading_analytic():
    """Free-space propagation of a Gaussian beam matches the closed form.

    For psi_0 = exp(-r^2 / (2 w^2)) under the paraxial kernel
    exp(-i*pi*lambda*q^2*z), the intensity stays Gaussian with variance
    sigma^2(z) = (w^4 + (lambda*z / 2*pi)^2) / (2 w^2) per axis — a
    quantitative check of the propagator's lambda*z scaling, not just its
    unitarity/identity limits."""
    import jax.numpy as jnp

    n = 256
    px = 0.05
    grid = Grid(ny=n, nx=n, py=px, px=px)
    lam = wavelength_A(300e3)
    w = 0.6  # Å; safely sampled and far from the box edge
    y, x = grid.xy_grids()
    yc, xc = y - y.mean(), x - x.mean()
    psi0 = np.exp(-(yc**2 + xc**2) / (2 * w**2)).astype(np.complex128)

    for z in (0.0, 50.0, 200.0):
        prop = fresnel_propagator(grid, lam, z, bandlimit=None)
        psi = np.asarray(
            jnp.fft.ifft2(jnp.fft.fft2(jnp.asarray(psi0)) * jnp.asarray(prop))
        )
        inten = np.abs(psi) ** 2
        inten /= inten.sum()
        var_y = float((inten * yc**2).sum())
        var_x = float((inten * xc**2).sum())
        b = lam * z / (2 * np.pi)
        var_pred = (w**4 + b**2) / (2 * w**2)
        np.testing.assert_allclose(var_y, var_pred, rtol=1e-6)
        np.testing.assert_allclose(var_x, var_pred, rtol=1e-6)


def test_weak_phase_object_pctf_sine_transfer():
    """Linear imaging theory: for a weak phase object psi = exp(i*sigma*V)
    and CTF = exp(-i*chi), the image spectrum obeys the phase-contrast
    transfer function  FFT[I - 1](q) ~= 2*sigma*V_hat(q)*sin(chi(q))
    (Kirkland ch. 5) — checks hrtem_image + chi sign conventions jointly."""
    import jax.numpy as jnp

    from fdes_tpu.imaging import hrtem_image
    from fdes_tpu.optics import Aberrations, chi

    n = 64
    grid = Grid(ny=n, nx=n, py=0.25, px=0.25)
    lam = wavelength_A(300e3)
    rng = np.random.default_rng(23)
    # weak, band-limited, zero-DC phase: sigma*V ~ 1e-3 rad
    vq = (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
    mask = grid.bandlimit_mask(0.5)
    v = np.real(np.fft.ifft2(vq * mask))
    v -= v.mean()
    sigma_v = 1e-3 * v / np.abs(v).max()

    ab = Aberrations(defocus=300.0, cs=0.5e7)
    x = chi(grid, lam, ab)
    ctf = jnp.asarray(np.exp(-1j * x))
    psi = jnp.asarray(np.exp(1j * sigma_v))
    img = np.asarray(hrtem_image(psi, ctf))

    lhs = np.fft.fft2(img - 1.0)
    rhs = 2.0 * np.fft.fft2(sigma_v) * np.sin(x)
    # compare on the nonzero-transfer in-band modes, away from sin-chi zeros
    sel = (np.abs(np.sin(x)) > 0.3) & (mask > 0)
    sel[0, 0] = False
    np.testing.assert_allclose(lhs[sel], rhs[sel], rtol=0, atol=2e-3 * np.abs(rhs[sel]).max())


def test_ctf_quadrature_collapses_and_normalises():
    """Zero spreads -> single node equal to the coherent CTF; weights sum
    to 1 for every spread combination."""
    from fdes_tpu.optics import Aberrations, ctf, ctf_quadrature

    grid = Grid(ny=32, nx=32, py=0.3, px=0.3)
    lam = wavelength_A(300e3)
    ab = Aberrations(defocus=150.0, cs=0.2e7)

    c, w = ctf_quadrature(grid, lam, ab, aperture_semiangle_rad=25e-3)
    assert c.shape == (1, 32, 32)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-12)
    np.testing.assert_allclose(
        c[0], ctf(grid, lam, ab, aperture_semiangle_rad=25e-3), atol=1e-12
    )

    for dd, tc, k in [(30.0, 0.0, 7), (0.0, 0.5e-3, 25), (30.0, 0.5e-3, 175)]:
        c, w = ctf_quadrature(
            grid, lam, ab, defocus_spread_A=dd, source_semiangle_rad=tc,
            n_defocus=7, n_tilt=5,
        )
        assert c.shape[0] == k
        np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-12)
        assert np.all(w > 0)


def test_explicit_focal_average_matches_temporal_envelope_weak_phase():
    """Weak-phase limit: the explicit Gauss-Hermite focal average must
    reproduce the closed-form temporal envelope E_t (the envelope is EXACT
    there: E[exp(-i*pi*lam*delta*q^2)] over the Gaussian focal distribution
    IS E_t).  Pins the quadrature node/weight conventions to `envelopes`."""
    import jax.numpy as jnp

    from fdes_tpu.imaging import hrtem_image, hrtem_incoherent
    from fdes_tpu.optics import Aberrations, ctf, ctf_quadrature

    n = 64
    grid = Grid(ny=n, nx=n, py=0.4, px=0.4)
    lam = wavelength_A(300e3)
    rng = np.random.default_rng(7)
    v = np.real(np.fft.ifft2(np.fft.fft2(rng.normal(size=(n, n))) * grid.bandlimit_mask(0.6)))
    v -= v.mean()
    phase = 1e-3 * v / np.abs(v).max()
    psi = jnp.asarray(np.exp(1j * phase))

    ab = Aberrations(defocus=250.0, cs=0.3e7)
    spread = 40.0  # pi*lam*Delta*q^2 <= ~1.9 in-band: well inside GH reach
    env_img = np.asarray(
        hrtem_image(psi, jnp.asarray(ctf(grid, lam, ab, defocus_spread_A=spread)))
    )
    cq, w = ctf_quadrature(grid, lam, ab, defocus_spread_A=spread, n_defocus=15)
    exp_img = np.asarray(hrtem_incoherent(psi, jnp.asarray(cq), jnp.asarray(w)))

    # contrast fields agree to the linear-imaging error O(phase) ~ 1e-3 rel
    lhs, rhs = exp_img - exp_img.mean(), env_img - env_img.mean()
    scale = np.abs(rhs).max()
    np.testing.assert_allclose(lhs, rhs, rtol=0, atol=3e-3 * scale)
    # and the average genuinely damps contrast vs the coherent image
    coh = np.asarray(hrtem_image(psi, jnp.asarray(ctf(grid, lam, ab))))
    assert exp_img.std() < 0.98 * coh.std()


def test_explicit_source_average_matches_spatial_envelope_weak_phase():
    """Same pin for the source (beam-tilt) axis: with defocus-only chi the
    tilt-shifted transfer is exactly linear in the tilt, so the explicit
    average must match the E_s envelope in the weak-phase limit."""
    import jax.numpy as jnp

    from fdes_tpu.imaging import hrtem_image, hrtem_incoherent
    from fdes_tpu.optics import Aberrations, ctf, ctf_quadrature

    n = 64
    grid = Grid(ny=n, nx=n, py=0.4, px=0.4)
    lam = wavelength_A(300e3)
    rng = np.random.default_rng(11)
    v = np.real(np.fft.ifft2(np.fft.fft2(rng.normal(size=(n, n))) * grid.bandlimit_mask(0.6)))
    v -= v.mean()
    psi = jnp.asarray(np.exp(1j * (1e-3 * v / np.abs(v).max())))

    ab = Aberrations(defocus=400.0)  # defocus-only: kappa-shift exactly linear
    theta_c = 0.6e-3
    env_img = np.asarray(
        hrtem_image(psi, jnp.asarray(ctf(grid, lam, ab, source_semiangle_rad=theta_c)))
    )
    cq, w = ctf_quadrature(grid, lam, ab, source_semiangle_rad=theta_c, n_tilt=7)
    exp_img = np.asarray(hrtem_incoherent(psi, jnp.asarray(cq), jnp.asarray(w)))

    lhs, rhs = exp_img - exp_img.mean(), env_img - env_img.mean()
    np.testing.assert_allclose(lhs, rhs, rtol=0, atol=3e-3 * np.abs(rhs).max())

def test_moliere_fe_properties():
    """Moliere/TF 3-Yukawa model (scattering.moliere_fe): positive, monotone
    decreasing, exact Rutherford tail shared with every screened-Coulomb
    model, and the Fourier transform identity against a direct numerical
    radial integral of the screened potential."""
    from fdes_tpu.scattering import (
        MOLIERE_A,
        MOLIERE_B,
        TF_PREFACTOR,
        moliere_fe,
    )

    a0 = 0.5291772109
    z = 14
    q2 = np.linspace(0.0, 400.0, 1024)
    f = moliere_fe(q2, z)
    assert np.all(f > 0)
    assert np.all(np.diff(f) < 0)
    # Moliere's amplitudes partition unity (the screening function has
    # chi(0) = 1: full nuclear charge at r=0)
    assert sum(MOLIERE_A) == pytest.approx(1.0, abs=1e-12)
    # Rutherford limit: q^2 * f -> Z/(2 pi^2 a0), same as Wentzel
    assert q2[-1] * f[-1] == pytest.approx(z / (2 * np.pi**2 * a0), rel=1e-2)
    w = wentzel_fe(q2, z)
    assert w[-1] == pytest.approx(f[-1], rel=2e-2)

    # Fourier-pair identity (non-circular check of the analytic transform):
    # for the screened potential V(r) ~ (Z/r) chi(r/a_tf), the radial 3-D
    # transform with kernel exp(-2 pi i q.r) gives
    #     f_e(q) = Z/(2 pi a0) * (2/q) * Int_0^inf chi(r/a_tf) sin(2 pi q r) dr
    # in wentzel_fe's convention — evaluate the integral numerically.
    from scipy.integrate import quad

    a_tf = TF_PREFACTOR * a0 * z ** (-1.0 / 3.0)
    for q in (0.3, 1.0, 3.0):

        def chi_sin(r, q=q):
            chi = sum(
                a_i * np.exp(-b_i * r / a_tf)
                for a_i, b_i in zip(MOLIERE_A, MOLIERE_B)
            )
            return chi * np.sin(2 * np.pi * q * r)

        integral, _ = quad(chi_sin, 0.0, 80.0 * a_tf, limit=800)
        expected = z / (2 * np.pi * a0) * (2.0 / q) * integral
        got = moliere_fe(np.asarray([q * q]), z)[0]
        assert got == pytest.approx(expected, rel=1e-6), f"q={q}"


def test_moliere_table_dispatch_and_potential_build():
    """kind='moliere' flows through species_form_factors and the potential
    builder; the TF atom is more extended than single-Yukawa Wentzel, so its
    small-q form factor is LARGER while the Rutherford tail matches."""
    from fdes_tpu.scattering import moliere_fe, species_form_factors

    t = ScatteringTable(kind="moliere")
    q2 = np.asarray([0.0, 1.0])
    np.testing.assert_allclose(t.fe(q2, 6), moliere_fe(q2, 6))
    assert moliere_fe(np.asarray([1e-4]), 14)[0] > wentzel_fe(np.asarray([1e-4]), 14)[0]
    ff = species_form_factors(np.linspace(0, 10, 8), [(14, 0.45)], t)
    assert ff.shape == (1, 8) and np.all(np.isfinite(ff))
