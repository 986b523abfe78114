"""Forward orchestration tests (SURVEY §4): defocus/tilt series vs golden,
STEM raster chunking equivalence, probe placement."""

import jax.numpy as jnp
import numpy as np
import pytest

from fdes_tpu.constants import interaction_sigma, wavelength_A
from fdes_tpu.detector import annular_mask, detector_signal
from fdes_tpu.forward import (
    hrtem_defocus_series,
    hrtem_tilt_series,
    stem_raster,
)
from fdes_tpu.golden import golden_hrtem, golden_multislice, golden_stem_signal
from fdes_tpu.grids import Grid, fresnel_propagator
from fdes_tpu.optics import Aberrations, ctf_series
from fdes_tpu.potential import build_potential
from fdes_tpu.probe import plane_wave, probe_from_stencil, probe_stencil

KV = 300e3


@pytest.fixture(scope="module")
def small_sim(si110_small_module):
    return si110_small_module


@pytest.fixture(scope="module")
def si110_small_module():
    from fdes_tpu.specimen import make_si110_supercell, slice_specimen

    spec = make_si110_supercell(reps=(2, 2, 2))
    lx, ly, _ = spec.box
    grid = Grid(ny=64, nx=64, py=ly / 64, px=lx / 64)
    sliced = slice_specimen(spec, nslices=8)
    v = build_potential(sliced, grid, dtype=jnp.float64)
    lam = wavelength_A(KV)
    sigma = interaction_sigma(KV)
    prop = jnp.asarray(fresnel_propagator(grid, lam, sliced.dz))
    return grid, sliced, v, lam, sigma, prop


def test_defocus_series_matches_golden(small_sim):
    grid, sliced, v, lam, sigma, prop = small_sim
    psi0 = plane_wave(grid, lam, dtype=jnp.complex128)
    defoci = np.array([-150.0, 0.0, 150.0])
    ctfs = ctf_series(grid, lam, defoci, Aberrations(cs=1.2e7), 25e-3)
    imgs = hrtem_defocus_series(v, psi0, prop, sigma, jnp.asarray(ctfs))
    psig = golden_multislice(
        np.ones(grid.shape, np.complex128), np.asarray(v), grid, KV, sliced.dz
    )
    for d in range(3):
        expect = golden_hrtem(psig, ctfs[d])
        np.testing.assert_allclose(np.asarray(imgs[d]), expect, atol=1e-10)


def test_tilt_series_matches_golden(small_sim):
    grid, sliced, v, lam, sigma, prop = small_sim
    tilts = [(0.0, 0.0), (2e-3, -1e-3)]
    psi0s = jnp.stack(
        [plane_wave(grid, lam, t, dtype=jnp.complex128) for t in tilts]
    )
    props = jnp.stack(
        [
            jnp.asarray(fresnel_propagator(grid, lam, sliced.dz, tilt_xy_rad=t))
            for t in tilts
        ]
    )
    ctf1 = jnp.asarray(ctf_series(grid, lam, np.array([0.0]))[0])
    imgs = hrtem_tilt_series(v, psi0s, props, sigma, ctf1)
    for i, t in enumerate(tilts):
        psig = golden_multislice(
            np.asarray(psi0s[i]), np.asarray(v), grid, KV, sliced.dz, tilt_xy_rad=t
        )
        expect = golden_hrtem(psig, np.asarray(ctf1))
        np.testing.assert_allclose(np.asarray(imgs[i]), expect, atol=1e-10)


def test_stem_raster_chunked_equals_unchunked(small_sim):
    grid, sliced, v, lam, sigma, prop = small_sim
    stencil = jnp.asarray(probe_stencil(grid, lam, 25e-3))
    qy = jnp.asarray(grid.qy()[:, None])
    qx = jnp.asarray(grid.qx()[None, :])
    pos = jnp.asarray(
        np.stack(
            np.meshgrid(
                np.linspace(2.0, 8.0, 2), np.linspace(2.0, 8.0, 4), indexing="ij"
            ),
            axis=-1,
        ).reshape(-1, 2)
    )
    masks = jnp.asarray(
        np.stack(
            [
                annular_mask(grid, lam, 0.0, 25e-3),
                annular_mask(grid, lam, 50e-3, 200e-3),
            ]
        )
    )
    full = stem_raster(v, stencil, qy, qx, pos, prop, sigma, masks)
    chunked = stem_raster(
        v, stencil, qy, qx, pos, prop, sigma, masks, probe_chunk=4
    )
    assert full.shape == (2, 8)
    # atol floors out denormal (~1e-32) ADF signals where lax.map vs vmap
    # reassociation changes bit-level rounding
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(chunked), rtol=1e-12, atol=1e-25
    )
    with pytest.raises(ValueError):
        stem_raster(v, stencil, qy, qx, pos, prop, sigma, masks, probe_chunk=3)


def test_stem_signal_matches_golden(small_sim):
    grid, sliced, v, lam, sigma, prop = small_sim
    stencil = jnp.asarray(probe_stencil(grid, lam, 25e-3))
    qy = jnp.asarray(grid.qy()[:, None])
    qx = jnp.asarray(grid.qx()[None, :])
    pos = jnp.asarray([[5.0, 5.0]])
    # bright-field disc: carries O(1) signal (an ADF ring at 50+ mrad sees
    # only denormal-level power on this weak 8-slice fixture)
    mask = annular_mask(grid, lam, 0.0, 30e-3)
    sig = stem_raster(v, stencil, qy, qx, pos, prop, sigma, mask[None])
    psi0 = probe_from_stencil(stencil, qy, qx, pos[0], dtype=jnp.complex128)
    psig = golden_multislice(
        np.asarray(psi0), np.asarray(v), grid, KV, sliced.dz
    )
    expect = golden_stem_signal(psig, mask)
    np.testing.assert_allclose(float(sig[0, 0]), expect, rtol=1e-10)


def test_probe_is_centered_and_normalized(small_sim):
    grid, sliced, v, lam, sigma, prop = small_sim
    stencil = jnp.asarray(probe_stencil(grid, lam, 30e-3))
    qy = jnp.asarray(grid.qy()[:, None])
    qx = jnp.asarray(grid.qx()[None, :])
    pos = jnp.asarray([6.4, 3.2])
    psi = probe_from_stencil(stencil, qy, qx, pos, dtype=jnp.complex128)
    # unit power
    np.testing.assert_allclose(float(jnp.sum(jnp.abs(psi) ** 2)), 1.0, rtol=1e-12)
    # intensity peak at the requested position
    iy, ix = np.unravel_index(int(jnp.argmax(jnp.abs(psi))), grid.shape)
    assert abs(iy * grid.py - 6.4) <= grid.py
    assert abs(ix * grid.px - 3.2) <= grid.px


def test_stem_4d_export_and_gradients(small_sim):
    """4D-STEM CBED stack: Parseval-consistent with detector signals, and
    the STEM inverse path (grad of a detector-signal loss wrt V) flows."""
    from fdes_tpu.forward import stem_raster_4d
    import jax

    grid, sliced, v, lam, sigma, prop = small_sim
    stencil = jnp.asarray(probe_stencil(grid, lam, 25e-3))
    qy = jnp.asarray(grid.qy()[:, None])
    qx = jnp.asarray(grid.qx()[None, :])
    pos = jnp.asarray([[3.0, 3.0], [6.0, 6.0]])
    cbed = stem_raster_4d(v, stencil, qy, qx, pos, prop, sigma)
    assert cbed.shape == (2, 64, 64)
    # total CBED power == probe power (unit) within bandlimit loss
    total = np.asarray(jnp.sum(cbed, axis=(1, 2)))
    assert np.all(total <= 1.0 + 1e-9) and np.all(total > 0.9)
    # masked integral of the CBED == detector_signal
    mask = annular_mask(grid, lam, 0.0, 30e-3)
    sig = stem_raster(v, stencil, qy, qx, pos, prop, sigma, mask[None])
    np.testing.assert_allclose(
        np.asarray(jnp.sum(cbed * mask[None], axis=(1, 2))),
        np.asarray(sig[0]),
        rtol=1e-10,
    )
    # chunked == unchunked
    cbed_c = stem_raster_4d(v, stencil, qy, qx, pos, prop, sigma, probe_chunk=1)
    # atol floors denormal (~1e-34) out-of-disc CBED pixels (vmap/lax.map
    # rounding reassociation, as in the raster chunk test)
    np.testing.assert_allclose(
        np.asarray(cbed_c), np.asarray(cbed), rtol=1e-12, atol=1e-28
    )

    # STEM inverse: gradient of an ADF-signal mismatch wrt the potential
    target = sig + 0.01

    def loss(vv):
        s = stem_raster(vv, stencil, qy, qx, pos, prop, sigma, mask[None])
        return jnp.sum((s - target) ** 2)

    g = jax.grad(loss)(v)
    assert g.shape == v.shape
    assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.linalg.norm(g)) > 0


def test_segmented_masks_partition_annulus():
    from fdes_tpu.detector import segmented_masks

    grid = Grid(ny=64, nx=64, py=0.2, px=0.2)
    lam = wavelength_A(KV)
    segs = segmented_masks(grid, lam, 20e-3, 80e-3, nseg=4, rotation_rad=0.3)
    assert segs.shape == (4, 64, 64)
    ann = annular_mask(grid, lam, 20e-3, 80e-3)
    # exact partition: segments are disjoint and cover the annulus
    np.testing.assert_array_equal(segs.sum(axis=0), ann)
    assert (segs.max(axis=0) <= 1.0).all()
    # every segment is non-empty for a centred annulus
    assert (segs.sum(axis=(1, 2)) > 0).all()


def test_com_signal_reads_plane_wave_tilt():
    from fdes_tpu.detector import com_signal

    grid = Grid(ny=64, nx=64, py=0.2, px=0.2)
    lam = wavelength_A(KV)
    qy = jnp.asarray(grid.qy()[:, None])
    qx = jnp.asarray(grid.qx()[None, :])
    # a plane wave exp(2*pi*i*(ky*y + kx*x)) has all diffracted power at
    # (ky, kx): the first moment must read back exactly that frequency
    ky, kx = grid.qy()[5], grid.qx()[9]
    y = np.arange(64)[:, None] * 0.2
    x = np.arange(64)[None, :] * 0.2
    psi = jnp.asarray(np.exp(2j * np.pi * (ky * y + kx * x)).astype(np.complex64))
    com = np.asarray(com_signal(psi, qy, qx))
    np.testing.assert_allclose(com, [ky, kx], atol=1e-5)
    # batch axis passes through
    com2 = np.asarray(com_signal(jnp.stack([psi, psi]), qy, qx))
    assert com2.shape == (2, 2)


def test_com_signal_differentiable_wrt_potential(small_sim):
    import jax

    from fdes_tpu.detector import com_signal
    from fdes_tpu.propagate import multislice

    grid, sliced, v, lam, sigma, prop = small_sim
    psi0 = plane_wave(grid, lam, dtype=jnp.complex128)
    qy = jnp.asarray(grid.qy()[:, None])
    qx = jnp.asarray(grid.qx()[None, :])

    def fy(vv):
        psi = multislice(psi0, vv, prop, sigma)
        return com_signal(psi, qy, qx)[0]

    g = jax.grad(fy)(v)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0.0


def test_stem_com_raster_chunked_matches_unchunked(small_sim):
    from fdes_tpu.forward import stem_com_raster
    from fdes_tpu.probe import probe_stencil

    grid, sliced, v, lam, sigma, prop, *_ = small_sim
    stencil = jnp.asarray(probe_stencil(grid, lam, 25e-3))
    qy = jnp.asarray(grid.qy()[:, None])
    qx = jnp.asarray(grid.qx()[None, :])
    pos = jnp.asarray(
        np.array([[2.0, 2.0], [3.0, 5.0], [6.0, 1.0], [4.0, 4.0]])
    )
    full = np.asarray(
        stem_com_raster(v, stencil, qy, qx, pos, prop, sigma)
    )
    chunked = np.asarray(
        stem_com_raster(v, stencil, qy, qx, pos, prop, sigma, probe_chunk=2)
    )
    assert full.shape == (4, 2)
    np.testing.assert_allclose(full, chunked, rtol=1e-6, atol=1e-9)
    assert np.isfinite(full).all()


def test_pick_probe_chunk_measured_defaults():
    """Shape-aware probe chunking (VERDICT.md round-3 weak 2): 16-wave
    chunks at <=512^2, unbatched at >=1024^2, 256 for PRISM; always a
    divisor of npos."""
    from fdes_tpu.propagate import pick_probe_chunk

    assert pick_probe_chunk((512, 512), 4096) == 16
    assert pick_probe_chunk((256, 256), 4096) == 16
    assert pick_probe_chunk((1024, 1024), 4096) == 1
    assert pick_probe_chunk((2048, 2048), 4096) == 1
    assert pick_probe_chunk((512, 512), 4096, method="prism") == 256
    # divisor rule: npos not divisible by the target degrades gracefully
    assert pick_probe_chunk((512, 512), 24) == 12
    assert pick_probe_chunk((512, 512), 10) == 10
    assert pick_probe_chunk((512, 512), 7) == 7
