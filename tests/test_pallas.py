"""Pallas slice-step kernels vs the jnp path (SURVEY §7 M6), run in
interpreter mode on CPU — the compiled path is exercised on real TPU by
bench.py / benchmarks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fdes_tpu.constants import interaction_sigma, wavelength_A
from fdes_tpu.grids import Grid, fresnel_propagator
from fdes_tpu.pallas.slice_step import (
    pallas_slice_step,
    pallas_transmit,
    propagator_multiply,
)
from fdes_tpu.propagate import default_slice_step, multislice, transmit

KV = 300e3


@pytest.fixture(scope="module")
def fields():
    rng = np.random.default_rng(3)
    n = 128  # lane-aligned
    grid = Grid(ny=n, nx=n, py=0.3, px=0.3)
    psi = jnp.asarray(
        (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))).astype(np.complex64)
    )
    v = jnp.asarray((rng.normal(size=(n, n)) * 30.0).astype(np.float32))
    prop = jnp.asarray(
        fresnel_propagator(grid, wavelength_A(KV), 1.8).astype(np.complex64)
    )
    return psi, v, prop


def test_pallas_transmit_matches_jnp(fields):
    psi, v, _ = fields
    sigma = interaction_sigma(KV)
    out = pallas_transmit(psi, v, sigma, True)
    ref = transmit(psi, v, sigma)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_pallas_transmit_grad_matches_jnp(fields):
    psi, v, _ = fields
    sigma = interaction_sigma(KV)

    def loss_p(psi, v):
        return jnp.sum(jnp.abs(pallas_transmit(psi, v, sigma, True) ** 2) ** 2)

    def loss_j(psi, v):
        return jnp.sum(jnp.abs(transmit(psi, v, sigma) ** 2) ** 2)

    gp_psi, gp_v = jax.grad(loss_p, argnums=(0, 1))(psi, v)
    gj_psi, gj_v = jax.grad(loss_j, argnums=(0, 1))(psi, v)
    np.testing.assert_allclose(np.asarray(gp_v), np.asarray(gj_v), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(gp_psi), np.asarray(gj_psi), rtol=2e-4, atol=2e-4
    )


def test_propagator_multiply_and_grad(fields):
    psi, _, prop = fields

    def loss_p(psi):
        return jnp.sum(jnp.abs(propagator_multiply(psi, prop, True)) ** 2)

    def loss_j(psi):
        return jnp.sum(jnp.abs(psi * prop) ** 2)

    np.testing.assert_allclose(
        np.asarray(propagator_multiply(psi, prop, True)),
        np.asarray(psi * prop),
        atol=2e-6,
    )
    gp = jax.grad(loss_p)(psi)
    gj = jax.grad(loss_j)(psi)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gj), rtol=2e-4, atol=2e-4)


def test_pallas_slice_step_in_multislice(fields):
    """Full rollout with the Pallas slice step == jnp rollout, fwd + grad."""
    psi, v, prop = fields
    sigma = interaction_sigma(KV)
    v_stack = jnp.stack([v, -0.5 * v, 2.0 * v])

    def step(psi, vs, prop, sigma):
        return pallas_slice_step(psi, vs, prop, sigma, interpret=True)

    out_p = multislice(psi, v_stack, prop, sigma, slice_step=step)
    out_j = multislice(psi, v_stack, prop, sigma)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_j), atol=5e-6)

    def loss(vs, stepper):
        out = multislice(psi, v_stack * 0 + vs, prop, sigma, slice_step=stepper)
        return jnp.sum(jnp.abs(out) ** 2)

    gp = jax.grad(loss)(v_stack, step)
    gj = jax.grad(loss)(v_stack, None)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gj), rtol=3e-3, atol=3e-3)


def test_rowgrid_nonmultiple_rows():
    """ny not divisible by the preferred stripe still works (stripe shrinks)."""
    rng = np.random.default_rng(5)
    n_y, n_x = 24, 128
    psi = jnp.asarray(
        (rng.normal(size=(n_y, n_x)) + 1j * rng.normal(size=(n_y, n_x))).astype(
            np.complex64
        )
    )
    v = jnp.asarray(rng.normal(size=(n_y, n_x)).astype(np.float32))
    out = pallas_transmit(psi, v, 0.01, True)
    ref = transmit(psi, v, 0.01)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_mxu_matmul_fft_step_matches(fields):
    """DFT-as-matmul slice step == FFT slice step, fwd + grad (dft.py)."""
    from fdes_tpu.propagate import make_slice_step

    psi, v, prop = fields
    sigma = interaction_sigma(KV)
    v_stack = jnp.stack([v, -0.3 * v])
    step = make_slice_step("mxu", shape=psi.shape, dtype=psi.dtype)
    out_m = multislice(psi, v_stack, prop, sigma, slice_step=step)
    out_j = multislice(psi, v_stack, prop, sigma)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_j), atol=1e-4)

    def loss(vs, stepper):
        out = multislice(psi, vs, prop, sigma, slice_step=stepper)
        return jnp.sum(jnp.abs(out) ** 2)

    gm = jax.grad(loss)(v_stack, step)
    gj = jax.grad(loss)(v_stack, None)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gj), rtol=5e-3, atol=5e-3)


def test_mxu_fast_step_matches(fields):
    """'mxu_fast' (Precision.HIGH bf16x3 on TPU; plain f32 on CPU) resolves
    and matches the FFT step on CPU; its TPU accuracy bound is documented in
    dft.py and measured on-chip by benchmarks/tpu_steps.py."""
    from fdes_tpu.propagate import make_slice_step

    psi, v, prop = fields
    sigma = interaction_sigma(KV)
    step = make_slice_step("mxu_fast", shape=psi.shape, dtype=psi.dtype)
    out_m = multislice(psi, jnp.stack([v]), prop, sigma, slice_step=step)
    out_j = multislice(psi, jnp.stack([v]), prop, sigma)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_j), atol=1e-4)


def test_mxu_fft_matrices_roundtrip():
    from fdes_tpu.dft import dft_matrices, fft2_mm, ifft2_mm

    rng = np.random.default_rng(9)
    x = jnp.asarray(
        (rng.normal(size=(64, 32)) + 1j * rng.normal(size=(64, 32))).astype(
            np.complex128
        )
    )
    (fy, fx), (fy_i, fx_i) = dft_matrices(64, 32, jnp.complex128)
    np.testing.assert_allclose(
        np.asarray(fft2_mm(x, fy, fx)), np.fft.fft2(np.asarray(x)), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(ifft2_mm(fft2_mm(x, fy, fx), fy_i, fx_i)),
        np.asarray(x),
        atol=1e-10,
    )


def test_pallas_absorptive_transmit_matches_jnp(fields):
    """Complex (absorptive) V through the pallas step == jnp path, fwd+grad."""
    psi, v, prop = fields
    sigma = interaction_sigma(KV)
    v_abs = jnp.abs(v) * 0.2
    v_c = v + 1j * v_abs
    from fdes_tpu.pallas.slice_step import pallas_slice_step as step

    out_p = step(psi, v_c, prop, sigma, interpret=True)
    out_j = default_slice_step(psi, v_c, prop, sigma)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_j), atol=5e-6)

    def loss_p(vr, va):
        return jnp.sum(
            jnp.abs(step(psi, vr + 1j * va, prop, sigma, interpret=True)) ** 2
        )

    def loss_j(vr, va):
        return jnp.sum(jnp.abs(default_slice_step(psi, vr + 1j * va, prop, sigma)) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1))(v, v_abs)
    gj = jax.grad(loss_j, argnums=(0, 1))(v, v_abs)
    for a, b in zip(gp, gj):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4)


def test_four_step_dft_matches_fft2():
    """fft2_4step/ifft2_4step == jnp.fft up to the documented digit-split
    layout, f64-exact; batch dims broadcast (dft.py four-step section)."""
    from fdes_tpu.dft import (
        fft2_4step,
        four_step_factors,
        ifft2_4step,
        permute_spectrum,
        split_radix,
    )

    rng = np.random.default_rng(11)
    ny, nx = 48, 64
    x = jnp.asarray(
        (rng.normal(size=(3, ny, nx)) + 1j * rng.normal(size=(3, ny, nx))).astype(
            np.complex128
        )
    )
    sy, sx = split_radix(ny), split_radix(nx)
    fwd_y, inv_y = four_step_factors(ny, sy, jnp.complex128)
    fwd_x, inv_x = four_step_factors(nx, sx, jnp.complex128)
    spec = fft2_4step(x, fwd_y, fwd_x)
    ref = np.fft.fft2(np.asarray(x))
    # layout: spec[..., ky1, ky2, kx1, kx2] == X[ky2*M1+ky1, kx2*K1+kx1]
    ref_split = np.stack(
        [np.asarray(permute_spectrum(jnp.asarray(r), sy, sx)) for r in ref]
    )
    np.testing.assert_allclose(np.asarray(spec), ref_split, atol=1e-9)
    # round trip back to natural layout
    np.testing.assert_allclose(
        np.asarray(ifft2_4step(spec, inv_y, inv_x)), np.asarray(x), atol=1e-10
    )


def test_mxu4_step_matches(fields):
    """Four-step MXU slice step == FFT slice step, fwd + grad."""
    from fdes_tpu.propagate import make_slice_step

    psi, v, prop = fields
    sigma = interaction_sigma(KV)
    v_stack = jnp.stack([v, -0.3 * v])
    step = make_slice_step("mxu4", shape=psi.shape, dtype=psi.dtype)
    out_m = multislice(psi, v_stack, prop, sigma, slice_step=step)
    out_j = multislice(psi, v_stack, prop, sigma)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_j), atol=1e-4)

    def loss(vs, stepper):
        out = multislice(psi, vs, prop, sigma, slice_step=stepper)
        return jnp.sum(jnp.abs(out) ** 2)

    gm = jax.grad(loss)(v_stack, step)
    gj = jax.grad(loss)(v_stack, None)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gj), rtol=5e-3, atol=5e-3)


def test_mxu4_batched_matches(fields):
    """mxu4 under vmap (the production STEM batch shape) == xla path."""
    from fdes_tpu.propagate import make_slice_step

    psi, v, prop = fields
    sigma = interaction_sigma(KV)
    v_stack = jnp.stack([v, -0.3 * v])
    psi_b = jnp.stack([psi, psi * (0.5 + 0.1j)])
    step = make_slice_step("mxu4_fast", shape=psi.shape, dtype=psi.dtype)
    roll = lambda p, s: multislice(p, v_stack, prop, sigma, slice_step=s)
    out_m = jax.vmap(lambda p: roll(p, step))(psi_b)
    out_j = jax.vmap(lambda p: roll(p, None))(psi_b)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_j), atol=1e-4)


def test_radix_step_matches(fields):
    """Mixed-radix MXU FFT slice step == FFT slice step, fwd + grad
    (radix.py; 128^2 exercises the pure matmul base)."""
    from fdes_tpu.propagate import make_slice_step

    psi, v, prop = fields
    sigma = interaction_sigma(KV)
    v_stack = jnp.stack([v, -0.3 * v])
    step = make_slice_step("radix", shape=psi.shape, dtype=psi.dtype)
    out_m = multislice(psi, v_stack, prop, sigma, slice_step=step)
    out_j = multislice(psi, v_stack, prop, sigma)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_j), atol=1e-4)

    def loss(vs, stepper):
        out = multislice(psi, vs, prop, sigma, slice_step=stepper)
        return jnp.sum(jnp.abs(out) ** 2)

    gm = jax.grad(loss)(v_stack, step)
    gj = jax.grad(loss)(v_stack, None)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gj), rtol=5e-3, atol=5e-3)


def test_radix_step_butterfly_grid():
    """Radix engine on a rectangular 256x512 grid (radix-2 and radix-4
    butterfly stages) under vmap == the xla path."""
    from fdes_tpu.propagate import make_slice_step

    rng = np.random.default_rng(7)
    ny, nx = 256, 512
    grid = Grid(ny=ny, nx=nx, py=0.3, px=0.3)
    psi = jnp.asarray(
        (rng.normal(size=(2, ny, nx)) + 1j * rng.normal(size=(2, ny, nx))).astype(
            np.complex64
        )
    )
    v_stack = jnp.asarray((rng.normal(size=(3, ny, nx)) * 30.0).astype(np.float32))
    prop = jnp.asarray(
        fresnel_propagator(grid, wavelength_A(KV), 1.8).astype(np.complex64)
    )
    sigma = interaction_sigma(KV)
    step = make_slice_step("radix_fast", shape=(ny, nx), dtype=psi.dtype)
    roll = lambda p, s: multislice(p, v_stack, prop, sigma, slice_step=s)
    out_m = jax.vmap(lambda p: roll(p, step))(psi)
    out_j = jax.vmap(lambda p: roll(p, None))(psi)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_j), atol=1e-4)


def test_radix_fft_exact_f64():
    """fft2_radix == np.fft.fft2 (digit-split layout) and round-trips,
    f64-exact, on a grid with both radix-4 and radix-2 stages."""
    from fdes_tpu.radix import (
        axis_constants,
        fft2_radix,
        ifft2_radix,
        permute_spectrum_radix,
    )

    rng = np.random.default_rng(11)
    ny, nx = 1024, 256
    x = jnp.asarray(rng.normal(size=(ny, nx)) + 1j * rng.normal(size=(ny, nx)))
    cy = axis_constants(ny, jnp.complex128)
    cx = axis_constants(nx, jnp.complex128)
    spec = fft2_radix(x, cy, cx)
    ref = permute_spectrum_radix(jnp.asarray(np.fft.fft2(np.asarray(x))), ny, nx)
    scale = np.abs(np.asarray(ref)).max()
    np.testing.assert_allclose(np.asarray(spec) / scale, np.asarray(ref) / scale, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(ifft2_radix(spec, cy, cx)), np.asarray(x), atol=1e-11
    )


def test_fused_step_matches(fields):
    """Fully-fused VMEM slice step (pallas/fused_step.py) == xla path,
    fwd + grad.  The grad loss includes a target: with real V and a pure
    phase propagator the step is UNITARY, so sum|out|^2 is conserved and
    its true V-gradient is zero — comparing noise to noise."""
    from fdes_tpu.propagate import make_slice_step

    psi, v, prop = fields
    sigma = interaction_sigma(KV)
    v_stack = jnp.stack([v, -0.3 * v, 0.7 * v])
    rng = np.random.default_rng(13)
    tgt = jnp.asarray(
        (rng.random(psi.shape) + 1j * rng.random(psi.shape)).astype(np.complex64)
    )
    step = make_slice_step("fused", shape=psi.shape, dtype=psi.dtype)
    out_f = multislice(psi, v_stack, prop, sigma, slice_step=step)
    out_j = multislice(psi, v_stack, prop, sigma)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_j), atol=2e-5)

    def loss(vs, stepper):
        out = multislice(psi, vs, prop, sigma, slice_step=stepper)
        return jnp.sum(jnp.abs(out - tgt) ** 2)

    gf = np.asarray(jax.grad(loss)(v_stack, step))
    gj = np.asarray(jax.grad(loss)(v_stack, None))
    np.testing.assert_allclose(gf, gj, rtol=2e-4, atol=2e-4 * np.abs(gj).max())

    # grad wrt the wave (the adjoint error-wave channel, SURVEY.md §3.2)
    def loss_p(p, stepper):
        out = multislice(p, v_stack, prop, sigma, slice_step=stepper)
        return jnp.sum(jnp.abs(out - tgt) ** 2)

    gpf = np.asarray(jax.grad(loss_p)(psi, step))
    gpj = np.asarray(jax.grad(loss_p)(psi, None))
    np.testing.assert_allclose(gpf, gpj, rtol=2e-4, atol=2e-4 * np.abs(gpj).max())


def test_fused_step_vmap_256():
    """Fused step under vmap (STEM batch) at 256^2 (radix-2 stage) == xla."""
    from fdes_tpu.propagate import make_slice_step

    rng = np.random.default_rng(17)
    n = 256
    grid = Grid(ny=n, nx=n, py=0.3, px=0.3)
    psi = jnp.asarray(
        (rng.normal(size=(2, n, n)) + 1j * rng.normal(size=(2, n, n))).astype(
            np.complex64
        )
    )
    v_stack = jnp.asarray((rng.normal(size=(3, n, n)) * 30.0).astype(np.float32))
    prop = jnp.asarray(
        fresnel_propagator(grid, wavelength_A(KV), 1.8).astype(np.complex64)
    )
    sigma = interaction_sigma(KV)
    step = make_slice_step("fused_fast", shape=(n, n), dtype=psi.dtype)
    roll = lambda p, s: multislice(p, v_stack, prop, sigma, slice_step=s)
    out_f = jax.vmap(lambda p: roll(p, step))(psi)
    out_j = jax.vmap(lambda p: roll(p, None))(psi)
    # fused_fast runs the hand-rolled Karatsuba x bf16-split dots (~1e-7
    # per product, amplified over 3 strong slices): the HIGH-equivalent
    # tier, not f32-exact.
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_j), atol=2e-4)


def test_fscan_whole_loop_matches(fields):
    """Cross-slice fused scan (pallas/fused_scan.py): the whole slice loop
    in one kernel, psi VMEM-resident == xla multislice. Unbatched, native
    batch, and vmap (the STEM probe path) all hit the same grid kernel."""
    from fdes_tpu.propagate import make_slice_step

    psi, v, prop = fields
    sigma = interaction_sigma(KV)
    v_stack = jnp.stack([v, -0.3 * v, 0.7 * v, 0.1 * v])
    step = make_slice_step("fscan", shape=psi.shape, dtype=psi.dtype)
    want = np.asarray(multislice(psi, v_stack, prop, sigma))

    got = multislice(psi, v_stack, prop, sigma, slice_step=step)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    # native batch: (B, n, n) straight through propagate.multislice
    psi_b = jnp.stack([psi, 1j * psi, psi.conj()])
    got_b = multislice(psi_b, v_stack, prop, sigma, slice_step=step)
    want_b = np.stack(
        [np.asarray(multislice(p, v_stack, prop, sigma)) for p in psi_b]
    )
    np.testing.assert_allclose(np.asarray(got_b), want_b, atol=2e-5)

    # vmap over the wave (forward.stem_raster's batching)
    got_v = jax.vmap(
        lambda p: multislice(p, v_stack, prop, sigma, slice_step=step)
    )(psi_b)
    np.testing.assert_allclose(np.asarray(got_v), want_b, atol=2e-5)


def test_fscan_batched_propagator_and_v(fields):
    """Tilt series (per-wave propagator) and phonon stacks (per-wave V)
    dispatch as ONE batched kernel launch through the custom_vmap rule
    (VERDICT.md round-3 weak 3), matching per-item xla rollouts."""
    from fdes_tpu.propagate import make_slice_step

    psi, v, prop = fields
    sigma = interaction_sigma(KV)
    v_stack = jnp.stack([v, -0.3 * v, 0.7 * v])
    # three "tilts": phase-ramped propagators
    props = jnp.stack([prop, prop * jnp.exp(0.01j), prop * jnp.exp(-0.02j)])
    psi_b = jnp.stack([psi, 1j * psi, psi.conj()])
    step = make_slice_step("fscan", shape=psi.shape, dtype=psi.dtype, grad=False)

    # tilt pattern: vmap over (psi, propagator), shared V
    got = jax.vmap(
        lambda p0, pr: multislice(p0, v_stack, pr, sigma, slice_step=step)
    )(psi_b, props)
    want = np.stack(
        [
            np.asarray(multislice(p0, v_stack, pr, sigma))
            for p0, pr in zip(psi_b, props)
        ]
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    # phonon pattern: vmap over V with the wave and propagator shared
    v_cfgs = jnp.stack([v_stack, 0.9 * v_stack, 1.1 * v_stack])
    got_p = jax.vmap(
        lambda vs: multislice(psi, vs, prop, sigma, slice_step=step)
    )(v_cfgs)
    want_p = np.stack(
        [np.asarray(multislice(psi, vs, prop, sigma)) for vs in v_cfgs]
    )
    np.testing.assert_allclose(np.asarray(got_p), want_p, atol=2e-5)


def test_panel_scan_matches_xla(fields, monkeypatch):
    """Panel-streamed engine (pallas/panel_scan.py, the 2048^2 tier) vs
    the xla scan, exercised with MULTIPLE row and column panels (the
    panel extents are patched down so a CPU-sized grid streams 4 row
    panels and 2 column panels per pass, the structure the real 2048^2
    run has) plus the single-panel and batched paths."""
    import fdes_tpu.pallas.panel_scan as ps
    from fdes_tpu.propagate import make_slice_step

    monkeypatch.setattr(ps, "_ROWS", 64)
    monkeypatch.setattr(ps, "_COLS", 128)
    n = 256
    rng = np.random.default_rng(9)
    grid = Grid(ny=n, nx=n, py=0.3, px=0.3)
    psi = jnp.asarray(
        (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))).astype(
            np.complex64
        )
    )
    v_stack = jnp.asarray((rng.normal(size=(3, n, n)) * 25.0).astype(np.float32))
    prop = jnp.asarray(
        fresnel_propagator(grid, wavelength_A(KV), 1.8).astype(np.complex64)
    )
    sigma = interaction_sigma(KV)
    ref = multislice(psi, v_stack, prop, sigma)
    step = make_slice_step("panel", shape=(n, n), dtype=psi.dtype, grad=False)
    assert step.kind == "panel" and not step.grad_capable
    out = multislice(psi, v_stack, prop, sigma, slice_step=step)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-6 * float(jnp.max(jnp.abs(ref)))
    )
    # batched (B, n, n): sequential lax.map, same result as vmapped xla
    psi_b = jnp.stack([psi, 1j * psi])
    out_b = multislice(psi_b, v_stack, prop, sigma, slice_step=step)
    ref_b = jax.vmap(lambda p: multislice(p, v_stack, prop, sigma))(psi_b)
    np.testing.assert_allclose(
        np.asarray(out_b),
        np.asarray(ref_b),
        atol=5e-6 * float(jnp.max(jnp.abs(ref_b))),
    )


def test_panel_scan_tilt_series_vmap(fields, monkeypatch):
    """vmap over (wave, propagator) — the tilt-series shape — composes
    with the panel whole-loop engine via pallas auto-batching."""
    import fdes_tpu.pallas.panel_scan as ps
    from fdes_tpu.propagate import make_slice_step

    monkeypatch.setattr(ps, "_ROWS", 64)
    monkeypatch.setattr(ps, "_COLS", 128)
    psi, v, prop = fields
    n = psi.shape[-1]
    sigma = interaction_sigma(KV)
    rng = np.random.default_rng(13)
    v_stack = jnp.asarray((rng.normal(size=(2, n, n)) * 25.0).astype(np.float32))
    grid = Grid(ny=n, nx=n, py=0.3, px=0.3)
    props = jnp.stack(
        [
            jnp.asarray(
                fresnel_propagator(
                    grid, wavelength_A(KV), 1.8, tilt_xy_rad=(t, 0.01)
                ).astype(np.complex64)
            )
            for t in (0.0, 0.01, 0.02)
        ]
    )
    psi_b = jnp.stack([psi, 1j * psi, psi.conj()])
    step = make_slice_step("panel", shape=(n, n), dtype=psi.dtype, grad=False)
    out = jax.vmap(
        lambda p0, pr: multislice(p0, v_stack, pr, sigma, slice_step=step)
    )(psi_b, props)
    ref = jax.vmap(lambda p0, pr: multislice(p0, v_stack, pr, sigma))(
        psi_b, props
    )
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(ref),
        atol=5e-6 * float(jnp.max(jnp.abs(ref))),
    )


def test_panel_grad_matches_xla(fields, monkeypatch):
    """The panel grad engine (the 2048^2 inverse path) vs XLA autodiff
    through the scan: dV and bar_psi0, multi-panel, BOTH routes — the
    whole-loop store-s custom VJP (2+2 passes/slice) and the per-slice
    panel VJP + sqrt-S remat fallback past the store budget."""
    import fdes_tpu.pallas.adjoint_scan as adj
    import fdes_tpu.pallas.panel_scan as ps
    from fdes_tpu.propagate import make_slice_step

    monkeypatch.setattr(ps, "_ROWS", 64)
    monkeypatch.setattr(ps, "_COLS", 128)
    psi, v, prop = fields
    n = psi.shape[-1]
    sigma = interaction_sigma(KV)
    rng = np.random.default_rng(21)
    v_stack = jnp.asarray(
        (rng.normal(size=(3, n, n)) * 25.0).astype(np.float32)
    )
    step = make_slice_step("panel", shape=(n, n), dtype=psi.dtype, grad=True)
    assert step.grad_capable and hasattr(step, "whole_scan")

    def loss_p(vv, p0):
        out = multislice(p0, vv, prop, sigma, slice_step=step)
        return jnp.sum(jnp.abs(out) ** 2 * jnp.real(out))

    def loss_x(vv, p0):
        out = multislice(p0, vv, prop, sigma)
        return jnp.sum(jnp.abs(out) ** 2 * jnp.real(out))

    (lp, (gv_p, gp_p)) = jax.value_and_grad(loss_p, argnums=(0, 1))(v_stack, psi)
    (lx, (gv_x, gp_x)) = jax.value_and_grad(loss_x, argnums=(0, 1))(v_stack, psi)
    np.testing.assert_allclose(float(lp), float(lx), rtol=1e-5)
    scale = float(jnp.max(jnp.abs(gv_x)))
    np.testing.assert_allclose(
        np.asarray(gv_p), np.asarray(gv_x), atol=2e-5 * scale
    )
    pscale = float(jnp.max(jnp.abs(gp_x)))
    np.testing.assert_allclose(
        np.asarray(gp_p), np.asarray(gp_x), atol=2e-5 * pscale
    )
    # past the store budget the engine falls back to the per-slice panel
    # VJP + sqrt-S remat — same gradients
    monkeypatch.setattr(adj, "_STORE_CAP_BYTES", 1)
    (lp2, (gv_p2, gp_p2)) = jax.value_and_grad(loss_p, argnums=(0, 1))(
        v_stack, psi
    )
    np.testing.assert_allclose(float(lp2), float(lx), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gv_p2), np.asarray(gv_x), atol=2e-5 * scale
    )
    np.testing.assert_allclose(
        np.asarray(gp_p2), np.asarray(gp_x), atol=2e-5 * pscale
    )


def test_panel_scan_single_slice_and_complex_v(fields):
    """S=1 (empty steady-state scan) and the complex absorptive-V
    fallback route of the panel engine."""
    from fdes_tpu.propagate import make_slice_step

    psi, v, prop = fields
    sigma = interaction_sigma(KV)
    step = make_slice_step("panel", shape=psi.shape, dtype=psi.dtype, grad=False)
    v1 = jnp.stack([v])
    out = multislice(psi, v1, prop, sigma, slice_step=step)
    ref = multislice(psi, v1, prop, sigma)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-6 * float(jnp.max(jnp.abs(ref)))
    )
    vc = jnp.stack([v + 0.2j * jnp.abs(v)])
    out_c = multislice(psi, vc, prop, sigma, slice_step=step)
    ref_c = multislice(psi, vc, prop, sigma)
    np.testing.assert_allclose(
        np.asarray(out_c),
        np.asarray(ref_c),
        atol=5e-6 * float(jnp.max(jnp.abs(ref_c))),
    )


def test_fscan_complex_v_falls_back(fields):
    """engine='auto' may promote fscan without knowing the V dtype; an
    absorptive (complex) potential must fall back to the per-slice Pallas
    path instead of erroring at runtime (ADVICE.md round 3 medium)."""
    from fdes_tpu.propagate import make_slice_step

    psi, v, prop = fields
    sigma = interaction_sigma(KV)
    v_stack = jnp.stack([v, 0.5 * v]) + 1j * 0.02 * jnp.abs(
        jnp.stack([v, 0.5 * v])
    )
    step = make_slice_step("fscan", shape=psi.shape, dtype=psi.dtype)
    got = multislice(psi, v_stack, prop, sigma, slice_step=step)
    want = multislice(psi, v_stack, prop, sigma)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    # batched psi takes the same fallback
    psi_b = jnp.stack([psi, 1j * psi])
    got_b = multislice(psi_b, v_stack, prop, sigma, slice_step=step)
    want_b = np.stack(
        [np.asarray(multislice(p, v_stack, prop, sigma)) for p in psi_b]
    )
    np.testing.assert_allclose(np.asarray(got_b), want_b, atol=2e-5)


def test_fscan_draft_selection_warns(fields):
    """The preview tier (~1e-1 exit err) must warn on selection, symmetric
    with the mxu4 negative-result warning (VERDICT.md round 3 weak 4)."""
    from fdes_tpu.propagate import make_slice_step

    psi, _, _ = fields
    with pytest.warns(UserWarning, match="PREVIEW"):
        make_slice_step("fscan_draft", shape=psi.shape, dtype=psi.dtype)


def test_fscan_rejects_remat_and_per_slice_call(fields):
    from fdes_tpu.propagate import make_slice_step

    psi, v, prop = fields
    sigma = interaction_sigma(KV)
    v_stack = jnp.stack([v, v])
    # grad=False requests the forward-only variant, which still rejects
    # remat loudly; the grad-capable default subsumes remat instead
    step = make_slice_step("fscan", shape=psi.shape, dtype=psi.dtype, grad=False)
    assert not step.grad_capable
    with pytest.raises(ValueError, match="forward-only"):
        multislice(psi, v_stack, prop, sigma, slice_step=step, remat_chunk=1)
    with pytest.raises(TypeError, match="whole slice loop"):
        step(psi, v, prop, sigma)


def _fscan_grad_case(fields, kind, nslices, seg, atol, batched=False):
    """value_and_grad through the whole-loop adjoint kernel vs xla autodiff."""
    from fdes_tpu.pallas.adjoint_scan import scan_diff_apply
    from fdes_tpu.propagate import make_slice_step

    psi, v, prop = fields
    sigma = interaction_sigma(KV)
    rng = np.random.default_rng(11)
    v_stack = jnp.asarray(
        (rng.normal(size=(nslices, *v.shape)) * 25.0).astype(np.float32)
    )
    if batched:
        psi = jnp.stack([psi, 1j * psi, psi.conj()])

    def loss_fscan(vv, p0):
        out = scan_diff_apply(p0, vv, prop, sigma, None, seg=seg)
        return jnp.sum(jnp.abs(out) ** 2 * jnp.real(out))

    def loss_xla(vv, p0):
        roll = lambda p: multislice(p, vv, prop, sigma)  # noqa: E731
        out = jax.vmap(roll)(p0) if batched else roll(p0)
        return jnp.sum(jnp.abs(out) ** 2 * jnp.real(out))

    (lf, (gv_f, gp_f)) = jax.value_and_grad(loss_fscan, argnums=(0, 1))(
        v_stack, psi
    )
    (lx, (gv_x, gp_x)) = jax.value_and_grad(loss_xla, argnums=(0, 1))(
        v_stack, psi
    )
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-5)
    scale = float(jnp.max(jnp.abs(gv_x)))
    np.testing.assert_allclose(
        np.asarray(gv_f), np.asarray(gv_x), atol=atol * scale
    )
    pscale = float(jnp.max(jnp.abs(gp_x)))
    np.testing.assert_allclose(
        np.asarray(gp_f), np.asarray(gp_x), atol=atol * pscale
    )


def test_fscan_adjoint_grad_matches_xla(fields):
    """Whole-loop adjoint (pallas/adjoint_scan.py), multi-segment: dV and
    bar_psi0 against XLA autodiff through the scan."""
    _fscan_grad_case(fields, "fscan", nslices=8, seg=4, atol=2e-5)


def test_fscan_adjoint_store_s_variant(fields):
    """seg=0 forces the store-s backward (forward stores the
    post-transmit wave every slice; backward runs one adjoint pipeline
    per slice with zero recompute) — same gradients as xla autodiff."""
    _fscan_grad_case(fields, "fscan", nslices=8, seg=0, atol=2e-5)
    _fscan_grad_case(fields, "fscan", nslices=8, seg=0, atol=2e-5, batched=True)


def test_fscan_adjoint_grad_single_segment(fields):
    """nseg == 1 edge: the whole loop is one checkpoint segment."""
    _fscan_grad_case(fields, "fscan", nslices=6, seg=6, atol=2e-5)


def test_fscan_adjoint_grad_batched(fields):
    """Native (B, n, n) grad: dV accumulates across the batch inside the
    kernel (inner-axis block accumulation)."""
    _fscan_grad_case(fields, "fscan", nslices=8, seg=4, atol=2e-5, batched=True)


def test_fscan_adjoint_autochunks_over_batch_cap(fields, monkeypatch):
    """A native (B, n, n) grad batch past the VMEM carry cap no longer
    raises: scan_diff_apply chunks it internally into capped sequential
    kernel calls (VERDICT.md round-4 item 4).  Caps are patched down to 2
    so the B=3 case exercises the chunk loop (2+1 split, uneven tail) on
    both backward variants; gradients must match unchunked xla autodiff
    including the cross-chunk dV sum."""
    import fdes_tpu.pallas.adjoint_scan as adj

    monkeypatch.setitem(adj._BATCH_CAP_STORE, 128, 2)
    monkeypatch.setitem(adj._BATCH_CAP, 128, 2)
    _fscan_grad_case(fields, "fscan", nslices=8, seg=0, atol=2e-5, batched=True)
    _fscan_grad_case(fields, "fscan", nslices=8, seg=4, atol=2e-5, batched=True)


def test_fscan_adjoint_grad_of_vmap(fields):
    """grad THROUGH vmap over the wave (the ptycho/stem4d inverse shape):
    pallas auto-batching of the custom-VJP kernels, dV summed over lanes
    by the vmap transpose."""
    from fdes_tpu.pallas.adjoint_scan import scan_diff_apply

    psi, v, prop = fields
    sigma = interaction_sigma(KV)
    rng = np.random.default_rng(5)
    v_stack = jnp.asarray(
        (rng.normal(size=(4, *v.shape)) * 25.0).astype(np.float32)
    )
    psi_b = jnp.stack([psi, 1j * psi, psi.conj()])

    def loss_f(vv):
        o = jax.vmap(lambda p: scan_diff_apply(p, vv, prop, sigma, None, seg=2))(psi_b)
        return jnp.sum(jnp.abs(o) ** 2)

    def loss_x(vv):
        o = jax.vmap(lambda p: multislice(p, vv, prop, sigma))(psi_b)
        return jnp.sum(jnp.abs(o) ** 2)

    gf = jax.grad(loss_f)(v_stack)
    gx = jax.grad(loss_x)(v_stack)
    scale = float(jnp.max(jnp.abs(gx)))
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), atol=2e-5 * scale)


def test_fscan_grad_engine_through_multislice(fields):
    """make_slice_step('fscan', grad=True) engine: value_and_grad through
    propagate.multislice; remat_chunk is accepted and subsumed."""
    from fdes_tpu.propagate import make_slice_step

    psi, v, prop = fields
    sigma = interaction_sigma(KV)
    v_stack = jnp.stack([v, -0.4 * v, 0.8 * v, 0.2 * v])
    step = make_slice_step("fscan", shape=psi.shape, dtype=psi.dtype, grad=True)
    assert step.grad_capable

    def loss(vv, s, rc):
        out = multislice(psi, vv, prop, sigma, slice_step=s, remat_chunk=rc)
        return jnp.sum(jnp.abs(out) ** 2)

    lf, gf = jax.value_and_grad(lambda vv: loss(vv, step, 2))(v_stack)
    lx, gx = jax.value_and_grad(lambda vv: loss(vv, None, None))(v_stack)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-5)
    scale = float(jnp.max(jnp.abs(gx)))
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), atol=2e-5 * scale)
    # the forward value through the grad-capable engine still matches
    out = multislice(psi, v_stack, prop, sigma, slice_step=step)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(multislice(psi, v_stack, prop, sigma)),
        atol=2e-5,
    )


def test_fscan_thickness_series(fields):
    """Thickness series through a whole-loop engine: one fused kernel per
    output chunk (previously a per-slice call -> TypeError)."""
    from fdes_tpu.propagate import make_slice_step, multislice_thickness_series

    psi, v, prop = fields
    sigma = interaction_sigma(KV)
    v_stack = jnp.stack([v, -0.3 * v, 0.7 * v, 0.1 * v])
    step = make_slice_step("fscan", shape=psi.shape, dtype=psi.dtype, grad=False)
    got = multislice_thickness_series(
        psi, v_stack, prop, sigma, every=2, slice_step=step
    )
    want = multislice_thickness_series(psi, v_stack, prop, sigma, every=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fscan_1024_radix8(fields):
    """1024^2 whole-loop kernel (single in-kernel radix-8 stage per axis,
    round 4): forward and adjoint vs xla, interpret mode."""
    del fields
    rng = np.random.default_rng(21)
    n = 1024
    grid = Grid(ny=n, nx=n, py=0.1, px=0.1)
    psi = jnp.asarray(
        (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))).astype(
            np.complex64
        )
    )
    v = jnp.asarray((rng.normal(size=(2, n, n)) * 20.0).astype(np.float32))
    prop = jnp.asarray(
        fresnel_propagator(grid, wavelength_A(KV), 2.0).astype(np.complex64)
    )
    sigma = interaction_sigma(KV)
    from fdes_tpu.propagate import make_slice_step

    step = make_slice_step("fscan", shape=(n, n), grad=True)
    got = multislice(psi, v, prop, sigma, slice_step=step)
    want = multislice(psi, v, prop, sigma)
    scale = float(jnp.max(jnp.abs(want)))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5 * scale
    )
    gf = jax.grad(
        lambda vv: jnp.sum(jnp.real(multislice(psi, vv, prop, sigma, slice_step=step)) ** 2)
    )(v)
    gx = jax.grad(
        lambda vv: jnp.sum(jnp.real(multislice(psi, vv, prop, sigma)) ** 2)
    )(v)
    gscale = float(jnp.max(jnp.abs(gx)))
    np.testing.assert_allclose(
        np.asarray(gf), np.asarray(gx), atol=2e-5 * gscale
    )


def test_fscan_adjoint_tilt_series_grad(fields):
    """Inverse tilt tomography shape: grad wrt the shared V THROUGH a
    vmap over (wave, per-tilt propagator) — pallas auto-batching of the
    store-s adjoint with a batched propagator operand."""
    from fdes_tpu.propagate import make_slice_step

    psi, v, prop = fields
    sigma = interaction_sigma(KV)
    v_stack = jnp.stack([v, -0.4 * v, 0.8 * v])
    props = jnp.stack([prop, prop * jnp.exp(0.01j), prop * jnp.exp(-0.02j)])
    psi_b = jnp.stack([psi, 1j * psi, psi.conj()])
    step = make_slice_step("fscan", shape=psi.shape, dtype=psi.dtype, grad=True)

    def loss(vv, s):
        out = jax.vmap(
            lambda p0, pr: multislice(p0, vv, pr, sigma, slice_step=s)
        )(psi_b, props)
        return jnp.sum(jnp.abs(out) ** 2 * jnp.real(out))

    lf, gf = jax.value_and_grad(lambda vv: loss(vv, step))(v_stack)
    lx, gx = jax.value_and_grad(lambda vv: loss(vv, None))(v_stack)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-5)
    scale = float(jnp.max(jnp.abs(gx)))
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), atol=2e-5 * scale)
