"""Multislice engine tests (SURVEY §4): unitarity, free space, pure phase
object, remat equivalence, and the BASELINE config-1 golden gate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fdes_tpu.constants import interaction_sigma, wavelength_A
from fdes_tpu.golden import golden_multislice
from fdes_tpu.grids import Grid, fresnel_propagator
from fdes_tpu.potential import build_potential
from fdes_tpu.probe import plane_wave
from fdes_tpu.propagate import multislice, pick_remat_chunk

KV = 300e3


def _setup(grid, dz, bandlimit=2.0 / 3.0):
    lam = wavelength_A(KV)
    sigma = interaction_sigma(KV)
    prop = fresnel_propagator(grid, lam, dz, bandlimit=bandlimit)
    return sigma, prop


def test_free_space_is_bandlimited_identity():
    g = Grid(ny=32, nx=32, py=0.2, px=0.2)
    sigma, prop = _setup(g, dz=2.0)
    v = jnp.zeros((5, 32, 32))
    psi0 = plane_wave(g, wavelength_A(KV), dtype=jnp.complex128)
    out = multislice(psi0, v, jnp.asarray(prop), sigma)
    # plane wave at q=0 passes the band limit untouched
    np.testing.assert_allclose(np.asarray(out), np.ones((32, 32)), atol=1e-12)


def test_norm_conserved_without_bandlimit(rng):
    g = Grid(ny=32, nx=32, py=0.2, px=0.2)
    sigma, prop = _setup(g, dz=1.5, bandlimit=None)
    v = jnp.asarray(rng.normal(size=(6, 32, 32)) * 10.0)
    psi0 = jnp.asarray(
        rng.normal(size=(32, 32)) + 1j * rng.normal(size=(32, 32))
    ).astype(jnp.complex128)
    out = multislice(psi0, v, jnp.asarray(prop), sigma)
    np.testing.assert_allclose(
        float(jnp.sum(jnp.abs(out) ** 2)),
        float(jnp.sum(jnp.abs(psi0) ** 2)),
        rtol=1e-12,
    )


def test_pure_phase_object_dz0(rng):
    """dz=0 propagator (no band limit) makes multislice an exact phase
    object: psi = exp(i sigma sum_j V_j)."""
    g = Grid(ny=16, nx=16, py=0.3, px=0.3)
    sigma, prop = _setup(g, dz=0.0, bandlimit=None)
    v = jnp.asarray(rng.normal(size=(4, 16, 16)))
    psi0 = plane_wave(g, wavelength_A(KV), dtype=jnp.complex128)
    out = multislice(psi0, v, jnp.asarray(prop), sigma)
    expect = np.exp(1j * sigma * np.asarray(v).sum(0))
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-12)


def test_thickness_series_matches_prefix_rollouts(rng):
    """multislice_thickness_series(every=k)[i] == multislice over the first
    (i+1)*k slices, and the last frame equals the full exit wave."""
    from fdes_tpu.propagate import multislice_thickness_series

    g = Grid(ny=16, nx=16, py=0.3, px=0.3)
    sigma, prop = _setup(g, dz=1.0)
    v = jnp.asarray(rng.normal(size=(12, 16, 16)) * 5.0)
    psi0 = plane_wave(g, wavelength_A(KV), dtype=jnp.complex128)
    prop = jnp.asarray(prop)
    series = multislice_thickness_series(psi0, v, prop, sigma, every=3)
    assert series.shape == (4, 16, 16)
    for i in range(4):
        ref = multislice(psi0, v[: 3 * (i + 1)], prop, sigma)
        np.testing.assert_allclose(np.asarray(series[i]), np.asarray(ref), atol=1e-13)
    with pytest.raises(ValueError):
        multislice_thickness_series(psi0, v, prop, sigma, every=5)


def test_pick_remat_chunk():
    assert pick_remat_chunk(512) in (16, 32)
    assert 512 % pick_remat_chunk(512) == 0
    assert pick_remat_chunk(16) == 4
    assert pick_remat_chunk(1) == 1
    assert pick_remat_chunk(13) in (1, 13)


def test_remat_chunks_bitwise_equivalent(rng):
    g = Grid(ny=16, nx=16, py=0.3, px=0.3)
    sigma, prop = _setup(g, dz=1.0)
    v = jnp.asarray(rng.normal(size=(12, 16, 16)) * 5.0)
    psi0 = plane_wave(g, wavelength_A(KV), dtype=jnp.complex128)
    prop = jnp.asarray(prop)
    full = multislice(psi0, v, prop, sigma)
    for chunk in (2, 3, 4, 6):
        out = multislice(psi0, v, prop, sigma, remat_chunk=chunk)
        np.testing.assert_allclose(np.asarray(out), np.asarray(full), atol=1e-13)
    with pytest.raises(ValueError):
        multislice(psi0, v, prop, sigma, remat_chunk=5)


def test_beam_tilt_plane_wave_phase_matches_golden():
    g = Grid(ny=32, nx=32, py=0.25, px=0.25)
    lam = wavelength_A(KV)
    # tilt quantum on this 8 Å field is lambda/L ~ 2.5 mrad; pick tilts
    # that round to nonzero harmonics (k=1 and k=-2)
    tilt = (3e-3, -5e-3)
    psi = np.asarray(plane_wave(g, lam, tilt, dtype=jnp.complex128))
    np.testing.assert_allclose(np.abs(psi), 1.0, atol=1e-12)
    # the ramp is QUANTIZED to the nearest grid harmonic k/L (a non-lattice
    # ramp on a periodic grid injects wrap-around artifacts, see plane_wave
    # docstring); phase step = 2*pi*k/n with k the nearest integer
    ly, lx = g.extent
    kx = np.round(np.tan(tilt[0]) / lam * lx)
    ky = np.round(np.tan(tilt[1]) / lam * ly)
    assert kx != 0 and ky != 0  # tilts large enough to be representable
    np.testing.assert_allclose(
        np.angle(psi[0, 1] / psi[0, 0]), 2 * np.pi * kx / g.nx, rtol=1e-9
    )
    np.testing.assert_allclose(
        np.angle(psi[1, 0] / psi[0, 0]), 2 * np.pi * ky / g.ny, rtol=1e-9
    )
    # quantized ramp is exactly periodic: no boundary discontinuity
    np.testing.assert_allclose(
        np.angle(psi[0, -1] * psi[0, 1] / psi[0, 0] ** 2), 0.0, atol=1e-9
    )


def test_config1_exit_wave_vs_golden_f64(si110_config1):
    """BASELINE config 1 (both impls at f64): independent-code agreement."""
    _, grid, sliced = si110_config1
    v64 = build_potential(sliced, grid, dtype=jnp.float64)
    sigma, prop = _setup(grid, sliced.dz)
    psi0 = plane_wave(grid, wavelength_A(KV), dtype=jnp.complex128)
    dev = np.asarray(multislice(psi0, v64, jnp.asarray(prop), sigma))
    gold = golden_multislice(
        np.ones(grid.shape, np.complex128), np.asarray(v64), grid, KV, sliced.dz
    )
    rel = np.linalg.norm(dev - gold) / np.linalg.norm(gold)
    assert rel < 1e-12


def test_config1_exit_wave_c64_gate(si110_config1):
    """BASELINE gate: exit-wave rel-err <= 1e-5 at device precision (c64)
    against the f64 golden pipeline (BASELINE.md row 3)."""
    _, grid, sliced = si110_config1
    v_gold = build_potential(sliced, grid, dtype=jnp.float64)
    gold = golden_multislice(
        np.ones(grid.shape, np.complex128),
        np.asarray(v_gold),
        grid,
        KV,
        sliced.dz,
    )
    v32 = build_potential(sliced, grid, dtype=jnp.float32)
    sigma, prop = _setup(grid, sliced.dz)
    psi0 = plane_wave(grid, wavelength_A(KV), dtype=jnp.complex64)
    dev = np.asarray(
        multislice(psi0, v32, jnp.asarray(prop, jnp.complex64), sigma)
    )
    rel = np.linalg.norm(dev - gold) / np.linalg.norm(gold)
    assert rel < 1e-5, f"config-1 c64 exit-wave rel-err {rel:.2e} exceeds 1e-5"


def test_multislice_jit_and_grad_smoke(rng):
    """value_and_grad through the scan compiles and is finite (M3 preview)."""
    g = Grid(ny=16, nx=16, py=0.3, px=0.3)
    sigma, prop = _setup(g, dz=1.0)
    prop = jnp.asarray(prop, jnp.complex64)
    psi0 = plane_wave(g, wavelength_A(KV))
    v = jnp.asarray(rng.normal(size=(4, 16, 16)), jnp.float32)

    @jax.jit
    def loss(v):
        out = multislice(psi0, v, prop, sigma, remat_chunk=2)
        return jnp.sum(jnp.abs(out) ** 2 * jnp.arange(16.0)[None, :])

    val, grad = jax.value_and_grad(loss)(v)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))
    assert float(jnp.abs(grad).max()) > 0


def test_frozen_golden_pack_drift():
    """The committed golden pack still matches a fresh golden run — detects
    accidental drift in physics conventions (SURVEY §4 fixtures row;
    regenerate deliberately with scripts/regen_golden.py)."""
    import os
    import sys

    pack_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "golden",
        "si110_golden_pack.npz",
    )
    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
    )
    import regen_golden

    fresh = regen_golden.build()
    with np.load(pack_path) as pack:
        for key in fresh:
            np.testing.assert_allclose(
                pack[key], fresh[key], rtol=1e-12, atol=1e-13, err_msg=key
            )

def test_make_slice_step_auto_tiers():
    """auto/auto_fast encode the measured per-grid-size winners
    (BASELINE.md round-3 table): mxu tiers at 256², radix tiers at 512²
    (the post-precision-fix winners), mxu_fast holding 1024² fast tier,
    xla at pod grids."""
    from fdes_tpu.propagate import _resolve_auto, default_slice_step, make_slice_step

    import pytest

    # batched grad up to b16 rides the store-s whole-loop adjoint too
    # (fscan_fast 51.2 ms vs radix_fast 70.1 at 512^2 x 64 b16); larger
    # batches keep the per-slice tiers
    assert _resolve_auto("auto", (256, 256), True, 16) == "fscan"
    assert _resolve_auto("auto", (512, 512), True, 16) == "fscan"
    assert _resolve_auto("auto", (512, 512), True, 64) == "fscan"
    assert _resolve_auto("auto", (2048, 2048), True, 16) == "xla"
    assert _resolve_auto("auto_fast", (256, 256), True, 16) == "fscan_fast"
    assert _resolve_auto("auto_fast", (512, 512), True, 64) == "fscan_fast"
    assert _resolve_auto("auto_fast", (1024, 1024), True, 16) == "mxu_fast"
    assert _resolve_auto("auto_fast", (2048, 2048), True, 16) == "xla"
    # forward-only contexts at the measured 256^2/512^2 shapes take the
    # whole-loop VMEM kernels (fscan_fast wins at EVERY measured batch)
    assert _resolve_auto("auto", (512, 512), False, 16) == "fscan"
    assert _resolve_auto("auto", (256, 256), False, 16) == "fscan"
    assert _resolve_auto("auto", (512, 512), False, 1) == "fscan"
    assert _resolve_auto("auto_fast", (512, 512), False, 1) == "fscan_fast"
    assert _resolve_auto("auto_fast", (512, 512), False, 64) == "fscan_fast"
    assert _resolve_auto("auto_fast", (256, 256), False, 16) == "fscan_fast"
    assert _resolve_auto("auto", (128, 128), False, 16) == "mxu"
    # UNBATCHED grad rollouts promote the whole-loop adjoint (round 4:
    # fscan_fast 7.7 ms vs mxu 19.6 ms value_and_grad at 512^2x64;
    # grad-err 1.4e-5/1.3e-4 certified on chip); batched grad contexts
    # keep the per-slice engines (asserted above)
    assert _resolve_auto("auto", (512, 512), True, 1) == "fscan"
    assert _resolve_auto("auto_fast", (512, 512), True, 1) == "fscan_fast"
    assert _resolve_auto("auto", (256, 256), True, 1) == "fscan"
    # 1024^2 FORWARD promotes the radix-8 whole-loop kernel at measured
    # batches (fscan 4.0k b1 / fscan_fast 8.8k b8 vs xla 2.6k / mxu_fast
    # 2.4k); >8 batches and grad contexts keep the previous winners
    assert _resolve_auto("auto", (1024, 1024), False, 1) == "fscan"
    assert _resolve_auto("auto_fast", (1024, 1024), False, 32) == "fscan_fast"
    assert _resolve_auto("auto_fast", (1024, 1024), False, 64) == "mxu_fast"
    # 1024^2 unbatched grad: the store-s whole-loop backward fits via
    # the out-block carry and wins (29.7 vs 47.5 fused / 53.4 xla ms)
    assert _resolve_auto("auto", (1024, 1024), True, 1) == "fscan"
    assert _resolve_auto("auto_fast", (1024, 1024), True, 1) == "fscan_fast"
    # batched grad at 1024^2: fast tier rides the vmapped store-s adjoint
    # (117 vs xla 417 ms at b8); the HIGHEST variant VMEM-fails batched
    assert _resolve_auto("auto_fast", (1024, 1024), True, 8) == "fscan_fast"
    assert _resolve_auto("auto", (1024, 1024), True, 8) == "xla"
    # 2048^2 (round 5): the panel-streamed engine takes the pod grid —
    # forward at any batch (1,003/1,761 vs xla 678; batched waves run as
    # a sequential lax.map since batching HURTS at pod grids), grad
    # unbatched only (166 ms vs xla 213; panel vmap unmeasured)
    assert _resolve_auto("auto", (2048, 2048), True, 1) == "panel"
    assert _resolve_auto("auto_fast", (2048, 2048), True, 1) == "panel_fast"
    assert _resolve_auto("auto", (2048, 2048), False, 1) == "panel"
    assert _resolve_auto("auto_fast", (2048, 2048), False, 8) == "panel_fast"
    # 4096^2 promoted too (forward certified 1.9e-6 / 3.6e-5, 4.4x;
    # grad 8.3e-6 / 6.3e-5, 2.9x / 4.4x — whole-loop panel adjoint)
    assert _resolve_auto("auto", (4096, 4096), False, 1) == "panel"
    assert _resolve_auto("auto_fast", (4096, 4096), False, 1) == "panel_fast"
    assert _resolve_auto("auto", (4096, 4096), True, 1) == "panel"
    assert _resolve_auto("auto_fast", (4096, 4096), True, 1) == "panel_fast"
    assert _resolve_auto("auto", (4096, 4096), True, 8) == "xla"
    # non-128*2^m axes cannot take the radix engines: fall back, never crash
    assert _resolve_auto("auto", (384, 384), True, 16) == "mxu"
    assert _resolve_auto("auto_fast", (384, 384), True, 16) == "mxu_fast"
    assert make_slice_step("auto", shape=(512, 512)) is not None
    assert make_slice_step("auto", shape=(2048, 2048)) is None  # xla default
    # off-TPU, 1024^2 grad (the default) resolves fused tiers -> xla
    # fallback (interpret mode at that grid is pathological on CPUs);
    # forward contexts keep a real step off-TPU
    assert make_slice_step("auto_fast", shape=(1024, 1024)) is None
    assert (
        make_slice_step("auto_fast", shape=(1024, 1024), grad=False, batch=16)
        is not None
    )
    assert make_slice_step("auto_fast", shape=(2048, 2048)) is None
    with pytest.raises(ValueError):
        make_slice_step("auto")  # needs shape

    # the selected mxu step matches the xla step numerically (CPU, c64)
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(3)
    n = 32
    psi = jnp.asarray((rng.random((n, n)) + 1j * rng.random((n, n))).astype(np.complex64))
    v = jnp.asarray(rng.random((n, n)).astype(np.float32) * 30)
    prop = jnp.asarray(np.exp(1j * rng.random((n, n))).astype(np.complex64))
    step = make_slice_step("auto", shape=(n, n))
    a = step(psi, v, prop, 6.5e-4)
    b = default_slice_step(psi, v, prop, 6.5e-4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
