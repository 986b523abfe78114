"""Inverse-engine tests (SURVEY §4 autodiff/integration tiers): FD gradient
check, analytic adjoint consistency, config-3-style recovery gate,
checkpoint/resume, metrics."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fdes_tpu.constants import interaction_sigma, wavelength_A
from fdes_tpu.forward import hrtem_defocus_series
from fdes_tpu.grids import Grid, fresnel_propagator
from fdes_tpu.loss import make_loss, total_variation
from fdes_tpu.optics import ctf_series
from fdes_tpu.probe import plane_wave
from fdes_tpu.reconstruct import (
    load_checkpoint,
    make_optimizer,
    reconstruct,
    save_checkpoint,
)

KV = 300e3


def _tiny(rng, n=16, s=3):
    grid = Grid(ny=n, nx=n, py=0.4, px=0.4)
    lam = wavelength_A(KV)
    sigma = interaction_sigma(KV)
    prop = jnp.asarray(fresnel_propagator(grid, lam, 1.5))
    psi0 = plane_wave(grid, lam, dtype=jnp.complex128)
    v_true = jnp.asarray(rng.normal(size=(s, n, n)) * 20.0)
    ctfs = jnp.asarray(ctf_series(grid, lam, np.array([-100.0, 100.0])))
    i_obs = hrtem_defocus_series(v_true, psi0, prop, sigma, ctfs)
    return grid, lam, sigma, prop, psi0, v_true, ctfs, i_obs


def test_gradient_matches_finite_differences(rng):
    grid, lam, sigma, prop, psi0, v_true, ctfs, i_obs = _tiny(rng)

    def fwd(v):
        return hrtem_defocus_series(v, psi0, prop, sigma, ctfs)

    loss_fn = make_loss(fwd, i_obs)
    v = jnp.asarray(rng.normal(size=v_true.shape) * 5.0)
    g = jax.grad(loss_fn)(v)
    eps = 1e-5
    for idx in [(0, 3, 4), (1, 7, 2), (2, 15, 15)]:
        dv = np.zeros(v.shape)
        dv[idx] = eps
        fp = float(loss_fn(v + dv))
        fm = float(loss_fn(v - dv))
        fd = (fp - fm) / (2 * eps)
        np.testing.assert_allclose(float(g[idx]), fd, rtol=1e-5, atol=1e-9)


def test_adjoint_consistency_two_slices(rng):
    """jax.grad == the reference's hand-derived adjoint (SURVEY §3.2) on a
    2-slice toy: error wave back-propagated with conj(P), per-slice gradient
    dL/dV_j = 2*sigma*Im(chi_out,j * conj(t_j*psi_j)) with psi_j the wave
    entering slice j and chi_out,j the adjoint wave pulled back through the
    conjugate propagator."""
    n = 8
    grid = Grid(ny=n, nx=n, py=0.5, px=0.5)
    lam = wavelength_A(KV)
    sigma = interaction_sigma(KV)
    prop = np.asarray(fresnel_propagator(grid, lam, 2.0, bandlimit=None))
    v = rng.normal(size=(2, n, n)) * 15.0
    i_obs = rng.random(size=(n, n))

    # forward, storing intermediates
    psi = [np.ones((n, n), np.complex128)]
    for j in range(2):
        t = np.exp(1j * sigma * v[j])
        psi.append(np.fft.ifft2(np.fft.fft2(t * psi[j]) * prop))
    i_sim = np.abs(psi[2]) ** 2
    # adjoint seed for L = 0.5 sum (I - I_obs)^2 with I = |psi_exit|^2:
    # chi = dL/dconj(psi_exit) = (I - I_obs) * psi_exit
    chi = (i_sim - i_obs) * psi[2]
    grads = np.zeros_like(v)
    for j in (1, 0):
        t = np.exp(1j * sigma * v[j])
        chi = np.fft.ifft2(np.fft.fft2(chi) * np.conj(prop))  # undo propagator
        # dL/dV_j = 2*Re[ sum dL/dpsi_out * dpsi_out/dV_j ] with
        # psi_out = t_j psi_j before propagation: d t/dV = i sigma t
        grads[j] = 2.0 * sigma * np.imag(chi * np.conj(t * psi[j]))
        chi = np.conj(t) * chi  # transport below slice j
    # autodiff
    def loss_fn(vv):
        p = jnp.asarray(psi[0])
        for j in range(2):
            t = jnp.exp(1j * sigma * vv[j])
            p = jnp.fft.ifft2(jnp.fft.fft2(t * p) * jnp.asarray(prop))
        return 0.5 * jnp.sum((jnp.abs(p) ** 2 - i_obs) ** 2)

    g = np.asarray(jax.grad(loss_fn)(jnp.asarray(v)))
    np.testing.assert_allclose(g, grads, rtol=1e-10, atol=1e-12)


def _smooth_potential(rng, grid, s, vamp, qwidth=0.3):
    """In-band zero-DC random potential (V*Å) for inverse fixtures.

    Two irreducible null spaces of the physical inverse problem are
    projected out of the TRUTH so the gates measure the recoverable part:
    per-slice DC (a constant V_j is a global phase, invisible to any
    intensity) and content beyond the 2/3-Nyquist propagator bandlimit
    (linearly clipped every slice).
    """
    n = grid.ny
    vq = rng.normal(size=(s, n, n)) + 1j * rng.normal(size=(s, n, n))
    qy = np.fft.fftfreq(n, grid.py)[:, None]
    qx = np.fft.fftfreq(n, grid.px)[None, :]
    filt = np.exp(-(qy**2 + qx**2) / (2 * qwidth**2)) * grid.bandlimit_mask()
    vr = np.real(np.fft.ifft2(vq * filt))
    vr -= vr.mean(axis=(1, 2), keepdims=True)
    return jnp.asarray(vr * vamp / np.abs(vr).max())


def test_tilt_series_reconstruction_recovers_potential(rng, tmp_path):
    """Config-3 miniature, posed the way the reference's companion papers
    pose it (tilt series, strong phase): gradient descent from zero recovers
    the 2-slice potential.  Intensity-only data leaves a shallow near-null
    space (weak-phase cos-CTF components) that stalls first-order methods;
    lbfgs resolves it and must hit the BASELINE 1e-3 potential gate."""
    n, s = 16, 2
    grid = Grid(ny=n, nx=n, py=0.4, px=0.4)
    lam = wavelength_A(KV)
    sigma = interaction_sigma(KV)
    v_true = _smooth_potential(rng, grid, s, 600.0)
    tmax = 0.05
    angs = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    tilts = [(tmax * np.cos(a), tmax * np.sin(a)) for a in angs]
    # specimen-tilt convention: untilted beam, tilt only in the propagator
    # (tilting both cancels the relative tilt -- the series degenerates)
    psi0s = jnp.stack([plane_wave(grid, lam, dtype=jnp.complex128) for _ in tilts])
    props = jnp.stack(
        [jnp.asarray(fresnel_propagator(grid, lam, 20.0, tilt_xy_rad=t)) for t in tilts]
    )
    # three defoci per tilt: a single CTF's sin-transfer zeros leave a
    # weak-phase near-null space that stalls the truth error ~5e-3
    ctfs = [
        jnp.asarray(ctf_series(grid, lam, np.array([d]))[0])
        for d in (0.0, 100.0, 300.0)
    ]
    from fdes_tpu.forward import hrtem_tilt_series

    def fwd(v):
        return jnp.stack(
            [hrtem_tilt_series(v, psi0s, props, sigma, c) for c in ctfs]
        )

    i_obs = fwd(v_true)
    loss_fn = make_loss(fwd, i_obs)
    metrics = str(tmp_path / "metrics.jsonl")
    res = reconstruct(
        loss_fn,
        jnp.zeros_like(v_true),
        iterations=1200,
        optimizer=make_optimizer("lbfgs", 0.0),
        metrics_path=metrics,
    )
    rel = np.linalg.norm(res.v - np.asarray(v_true)) / np.linalg.norm(
        np.asarray(v_true)
    )
    assert rel <= 1e-3, f"reconstruction rel-err {rel:.2e} > 1e-3"
    assert res.losses[-1] < res.losses[0] * 1e-8
    lines = [json.loads(l) for l in open(metrics)]
    assert len(lines) == 1200 and {"iter", "loss", "grad_norm", "step_s"} <= set(
        lines[0]
    )


def test_wave_matching_reconstruction_tight_gate(rng):
    """Exit-wave matching (complex data, information-complete): the same
    descent machinery must hit the BASELINE 1e-3 potential gate."""
    n, s = 16, 2
    grid = Grid(ny=n, nx=n, py=0.4, px=0.4)
    lam = wavelength_A(KV)
    sigma = interaction_sigma(KV)
    v_true = _smooth_potential(rng, grid, s, 800.0)
    tmax = 0.05
    angs = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    tilts = [(tmax * np.cos(a), tmax * np.sin(a)) for a in angs]
    psi0s = jnp.stack([plane_wave(grid, lam, dtype=jnp.complex128) for _ in tilts])
    props = jnp.stack(
        [jnp.asarray(fresnel_propagator(grid, lam, 20.0, tilt_xy_rad=t)) for t in tilts]
    )
    from fdes_tpu.propagate import multislice

    def waves(v):
        return jax.vmap(lambda p0, pr: multislice(p0, v, pr, sigma))(psi0s, props)

    w_obs = waves(v_true)

    def loss_fn(v):
        r = waves(v) - w_obs
        return 0.5 * jnp.sum(jnp.abs(r) ** 2)

    res = reconstruct(
        loss_fn,
        jnp.zeros_like(v_true),
        iterations=800,
        optimizer=make_optimizer("lbfgs", 0.0),
    )
    rel = np.linalg.norm(res.v - np.asarray(v_true)) / np.linalg.norm(
        np.asarray(v_true)
    )
    assert rel <= 1e-3, f"wave-matching rel-err {rel:.2e} > 1e-3"


def test_defocus_series_drives_data_residual_to_zero(rng):
    """The defocus-series inverse (config 3 shape) is ill-posed in potential
    space at thin depth (only ~sum_j V_j is constrained); the engine must
    still drive the DATA residual essentially to zero."""
    grid, lam, sigma, prop, psi0, v_true, ctfs, i_obs = _tiny(rng, n=16, s=2)

    def fwd(v):
        return hrtem_defocus_series(v, psi0, prop, sigma, ctfs, remat_chunk=2)

    loss_fn = make_loss(fwd, i_obs)
    res = reconstruct(
        loss_fn,
        jnp.zeros_like(v_true),
        iterations=500,
        optimizer=make_optimizer("lbfgs", 0.0),
    )
    assert res.losses[-1] < res.losses[0] * 1e-5
    i_rec = fwd(jnp.asarray(res.v))
    rel = float(
        jnp.linalg.norm(i_rec - i_obs) / jnp.linalg.norm(i_obs)
    )
    assert rel <= 1e-4, f"data-space rel-err {rel:.2e}"


def test_poisson_loss_gradient_and_ml_recovery(rng):
    """Poisson maximum-likelihood data term (beyond-reference, loss.py):
    grad matches finite differences on count data, and on noise-free counts
    the ML objective drives the data residual to zero like L2 does."""
    grid, lam, sigma, prop, psi0, v_true, ctfs, i_obs = _tiny(rng, n=16, s=2)
    dose = 200.0

    def fwd(v):
        return hrtem_defocus_series(v, psi0, prop, sigma, ctfs, remat_chunk=2)

    counts = jnp.asarray(
        rng.poisson(dose * np.asarray(i_obs)).astype(np.float64)
    )
    loss_fn = make_loss(fwd, counts, kind="poisson", dose=dose)
    v = jnp.asarray(rng.normal(size=v_true.shape) * 5.0)
    g = jax.grad(loss_fn)(v)
    eps = 1e-5
    for idx in [(0, 3, 4), (1, 15, 15)]:
        dv = np.zeros(v.shape)
        dv[idx] = eps
        fd = (float(loss_fn(v + dv)) - float(loss_fn(v - dv))) / (2 * eps)
        # rtol bounded by central-difference truncation of the log term
        np.testing.assert_allclose(float(g[idx]), fd, rtol=3e-3, atol=1e-7)

    # noise-free counts: the ML minimum is the true data; residual -> 0
    loss_clean = make_loss(fwd, dose * i_obs, kind="poisson", dose=dose)
    res = reconstruct(
        loss_clean,
        jnp.zeros_like(v_true),
        iterations=500,
        optimizer=make_optimizer("lbfgs", 0.0),
    )
    i_rec = fwd(jnp.asarray(res.v))
    rel = float(jnp.linalg.norm(i_rec - i_obs) / jnp.linalg.norm(i_obs))
    assert rel <= 1e-3, f"data-space rel-err {rel:.2e}"

    with pytest.raises(ValueError):
        make_loss(fwd, counts, kind="huber")


def test_checkpoint_roundtrip_and_resume(rng, tmp_path):
    grid, lam, sigma, prop, psi0, v_true, ctfs, i_obs = _tiny(rng, n=16, s=2)

    def fwd(v):
        return hrtem_defocus_series(v, psi0, prop, sigma, ctfs)

    loss_fn = make_loss(fwd, i_obs)
    ck = str(tmp_path / "ck.npz")
    opt = make_optimizer("adam", 1.0)
    # one continuous 40-iter run
    res_full = reconstruct(
        loss_fn, jnp.zeros_like(v_true), iterations=40, optimizer=opt
    )
    # 20 iters, checkpoint, then resume to 40
    reconstruct(
        loss_fn,
        jnp.zeros_like(v_true),
        iterations=20,
        optimizer=opt,
        checkpoint_path=ck,
        checkpoint_every=20,
    )
    res_resumed = reconstruct(
        loss_fn,
        jnp.zeros_like(v_true),
        iterations=40,
        optimizer=opt,
        checkpoint_path=ck,
        resume=True,
    )
    np.testing.assert_allclose(res_resumed.v, res_full.v, rtol=1e-10, atol=1e-12)

    # raw save/load roundtrip
    state = opt.init(jnp.zeros_like(v_true))
    save_checkpoint(ck, v_true, state, 7)
    v2, s2, it = load_checkpoint(ck, v_true, state)
    assert it == 7
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v_true))


def test_regularizers_differentiable(rng):
    v = jnp.asarray(rng.normal(size=(3, 8, 8)))
    g = jax.grad(lambda x: total_variation(x, 0.1))(v)
    assert np.all(np.isfinite(np.asarray(g)))
    g0 = jax.grad(lambda x: total_variation(x, 0.1))(jnp.zeros((3, 8, 8)))
    assert np.all(np.isfinite(np.asarray(g0)))


def test_make_optimizer_names():
    for name in ("sgd", "momentum", "adam", "adamw"):
        make_optimizer(name, 0.1)
    import pytest

    with pytest.raises(ValueError):
        make_optimizer("nope", 0.1)


def test_fault_injection_mid_run_then_resume(rng, tmp_path):
    """SURVEY §5 failure row: kill the loop mid-run via a raising callback
    (the test-only fault hook), then --resume-style restart loses at most
    checkpoint_every iterations and converges to the uninterrupted result."""
    grid, lam, sigma, prop, psi0, v_true, ctfs, i_obs = _tiny(rng, n=16, s=2)

    def fwd(v):
        return hrtem_defocus_series(v, psi0, prop, sigma, ctfs)

    loss_fn = make_loss(fwd, i_obs)
    ck = str(tmp_path / "ck.npz")
    opt = make_optimizer("adam", 1.0)

    class Boom(RuntimeError):
        pass

    def fault(it, loss, v):
        if it == 29:  # after the 20-iter checkpoint was written
            raise Boom("injected fault")

    with pytest.raises(Boom):
        reconstruct(
            loss_fn,
            jnp.zeros_like(v_true),
            iterations=40,
            optimizer=opt,
            checkpoint_path=ck,
            checkpoint_every=20,
            callback=fault,
        )
    # checkpoint from iteration 20 survived the crash
    _, _, it = load_checkpoint(ck, jnp.zeros_like(v_true), opt.init(jnp.zeros_like(v_true)))
    assert it == 20
    res_resumed = reconstruct(
        loss_fn,
        jnp.zeros_like(v_true),
        iterations=40,
        optimizer=opt,
        checkpoint_path=ck,
        resume=True,
    )
    res_full = reconstruct(
        loss_fn, jnp.zeros_like(v_true), iterations=40, optimizer=opt
    )
    np.testing.assert_allclose(res_resumed.v, res_full.v, rtol=1e-10, atol=1e-12)


def test_positivity_projection_keeps_v_nonnegative(rng):
    """Projected gradient with V>=0: iterates stay in the feasible set and
    the data residual still falls (reconstruct(project=...))."""
    import jax

    from fdes_tpu.forward import hrtem_defocus_series
    from fdes_tpu.grids import Grid, fresnel_propagator, host_cast
    from fdes_tpu.loss import make_loss
    from fdes_tpu.optics import ctf_series
    from fdes_tpu.probe import plane_wave
    from fdes_tpu.reconstruct import (
        make_optimizer,
        positive_projection,
        reconstruct,
    )

    kv = 300e3
    lam = wavelength_A(kv)
    sigma = interaction_sigma(kv)
    grid = Grid(ny=32, nx=32, py=0.25, px=0.25)
    nsl = 3
    v_true = jnp.asarray(np.abs(rng.normal(size=(nsl, 32, 32))).astype(np.float32) * 40.0)
    prop = jnp.asarray(host_cast(fresnel_propagator(grid, lam, 6.0), jnp.complex64))
    psi0 = plane_wave(grid, lam, dtype=jnp.complex64)
    ctfs = jnp.asarray(host_cast(
        ctf_series(grid, lam, np.array([-120.0, 0.0, 120.0])), jnp.complex64
    ))

    def fwd(v):
        return hrtem_defocus_series(v, psi0, prop, sigma, ctfs)

    i_obs = fwd(v_true)
    seen_min = []

    res = reconstruct(
        make_loss(fwd, i_obs),
        jnp.zeros_like(v_true),
        iterations=40,
        optimizer=make_optimizer("lbfgs"),
        project=positive_projection,
        callback=lambda it, loss, v: seen_min.append(float(v.min())),
    )
    assert min(seen_min) >= 0.0, f"iterate left the feasible set: {min(seen_min)}"
    assert res.losses[-1] < res.losses[0] * 1e-3
    # complex-potential branch clips both channels
    vc = jnp.asarray(np.array([[-1.0 + 1.0j, 2.0 - 3.0j]], np.complex64))
    out = np.asarray(positive_projection(vc))
    np.testing.assert_allclose(out, [[0.0 + 1.0j, 2.0 + 0.0j]])


def test_4dstem_ptychographic_recovery(rng):
    """Inverse from 4D-STEM data: recover the potential from CBED stacks at
    a few probe positions (the ptychography-style modality; the reference's
    inverse consumes only integrated images, SURVEY.md §3.2)."""
    from fdes_tpu.forward import stem_raster_4d
    from fdes_tpu.probe import probe_stencil

    n, s = 24, 2
    grid = Grid(ny=n, nx=n, py=0.35, px=0.35)
    lam = wavelength_A(KV)
    sigma = interaction_sigma(KV)
    prop = jnp.asarray(fresnel_propagator(grid, lam, 2.0))
    stencil = jnp.asarray(probe_stencil(grid, lam, 40e-3))
    qy = jnp.asarray(grid.qy()[:, None])
    qx = jnp.asarray(grid.qx()[None, :])
    # overlapping 3x3 raster: overlap is what makes ptychography well-posed
    ys = np.linspace(2.0, n * 0.35 - 2.0, 3)
    pos = jnp.asarray(
        np.stack(np.meshgrid(ys, ys, indexing="ij"), -1).reshape(-1, 2)
    )
    v_true = jnp.asarray(rng.normal(size=(s, n, n)) * 25.0)

    def fwd(v):
        return stem_raster_4d(v, stencil, qy, qx, pos, prop, sigma)

    i_obs = fwd(v_true)

    res = reconstruct(
        make_loss(fwd, i_obs),
        jnp.zeros_like(v_true),
        iterations=150,
        optimizer=make_optimizer("lbfgs"),
    )
    # data residual collapses (the potential itself is only determined up to
    # the probe's support/overlap, so gate the fit, not pointwise V)
    assert res.losses[-1] < res.losses[0] * 1e-3, res.losses[-1]
    sim = np.asarray(fwd(jnp.asarray(res.v)))
    rel = np.linalg.norm(sim - np.asarray(i_obs)) / np.linalg.norm(np.asarray(i_obs))
    assert rel < 1e-3, rel
