"""Grid (tensor-parallel) sharding tier: distributed FFT + row-sharded
multislice equal the single-device engine, values and gradients, on the
8-fake-device CPU mesh (SURVEY.md §2.1 TP row, §4 distributed tier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fdes_tpu as f
from fdes_tpu.gridshard import (
    exit_intensity_gridsharded,
    fft2_distributed,
    ifft2_distributed,
    multislice_gridsharded,
    shard_field_inputs,
)
from fdes_tpu.potential import build_potential
from fdes_tpu.propagate import multislice
from fdes_tpu.sharding import make_mesh


@pytest.fixture(scope="module")
def grid_mesh():
    return make_mesh(axis_names=("grid",))


def test_distributed_fft2_matches_fft2(grid_mesh):
    rng = np.random.default_rng(3)
    x = (rng.normal(size=(64, 48)) + 1j * rng.normal(size=(64, 48))).astype(
        np.complex128
    )
    xs = jax.device_put(
        x, jax.sharding.NamedSharding(grid_mesh, jax.sharding.PartitionSpec("grid", None))
    )
    got = np.asarray(fft2_distributed(xs, grid_mesh))
    want = np.fft.fft2(x)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
    # and the round trip through the inverse
    back = np.asarray(ifft2_distributed(fft2_distributed(xs, grid_mesh), grid_mesh))
    np.testing.assert_allclose(back, x, rtol=1e-12, atol=1e-12)


def test_grid_shape_must_divide_mesh(grid_mesh):
    x = jnp.zeros((60, 64), jnp.complex128)  # 60 % 8 != 0
    with pytest.raises(ValueError, match="not divisible"):
        fft2_distributed(x, grid_mesh)


def _problem(si110_small):
    _, grid, sliced = si110_small
    kv = 300e3
    lam, sigma = f.wavelength_A(kv), f.interaction_sigma(kv)
    v = build_potential(sliced, grid, dtype=jnp.float64)
    prop = jnp.asarray(f.fresnel_propagator(grid, lam, sliced.dz))
    psi0 = f.plane_wave(grid, lam, dtype=jnp.complex128)
    return psi0, v, prop, sigma


def test_gridsharded_multislice_equals_single_device(si110_small, grid_mesh):
    psi0, v, prop, sigma = _problem(si110_small)
    want = np.asarray(multislice(psi0, v, prop, sigma))
    psi0s, vs, props = shard_field_inputs(grid_mesh, psi0, v, prop)
    got = multislice_gridsharded(psi0s, vs, props, sigma, grid_mesh)
    assert got.sharding.spec == jax.sharding.PartitionSpec("grid", None)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10, atol=1e-12)


def test_gridsharded_streamed_equals_streamed(si110_small, grid_mesh):
    """streamed x 'grid' mesh (VERDICT.md round-4 item 7): the on-the-fly
    potential build with the halo scatter + distributed FFTs equals the
    single-device streamed path."""
    from fdes_tpu.gridshard import multislice_gridsharded_streamed
    from fdes_tpu.potential import (
        pad_atoms_per_slice,
        species_factors_full,
        species_factors_rfft,
    )
    from fdes_tpu.propagate import multislice_streamed

    _, grid, sliced = si110_small
    kv = 300e3
    lam, sigma = f.wavelength_A(kv), f.interaction_sigma(kv)
    prop = jnp.asarray(f.fresnel_propagator(grid, lam, sliced.dz))
    psi0 = f.plane_wave(grid, lam, dtype=jnp.complex128)
    x, y, sp, w, _ = pad_atoms_per_slice(sliced, dtype=np.float64)
    atoms = tuple(jnp.asarray(a) for a in (x, y, sp, w))
    ff_r = jnp.asarray(species_factors_rfft(grid, sliced.species))
    want = np.asarray(
        multislice_streamed(
            psi0, atoms, ff_r, prop, sigma, shape=grid.shape,
            pixel=(grid.py, grid.px),
        )
    )
    P = jax.sharding.PartitionSpec
    NS = jax.sharding.NamedSharding
    ff_full = jnp.asarray(species_factors_full(grid, sliced.species))
    psi0s = jax.device_put(psi0, NS(grid_mesh, P("grid", None)))
    ffs = jax.device_put(ff_full, NS(grid_mesh, P(None, None, "grid")))
    props = jax.device_put(prop, NS(grid_mesh, P(None, "grid")))
    got = jax.jit(
        lambda p0, at, ff_, pr: multislice_gridsharded_streamed(
            p0, at, ff_, pr, sigma, grid_mesh,
            shape=grid.shape, pixel=(grid.py, grid.px),
        )
    )(psi0s, atoms, ffs, props)
    assert got.sharding.spec == P("grid", None)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9, atol=1e-11)


def test_gridsharded_remat_equals_no_remat(si110_small, grid_mesh):
    psi0, v, prop, sigma = _problem(si110_small)
    psi0s, vs, props = shard_field_inputs(grid_mesh, psi0, v, prop)
    a = np.asarray(multislice_gridsharded(psi0s, vs, props, sigma, grid_mesh))
    b = np.asarray(
        multislice_gridsharded(psi0s, vs, props, sigma, grid_mesh, remat_chunk=2)
    )
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-13)


def test_gridsharded_gradient_equals_single_device(si110_small, grid_mesh):
    """dL/dV through the distributed-FFT scan == single-device autodiff:
    the all_to_all transposes are linear, so the adjoint is exact."""
    psi0, v, prop, sigma = _problem(si110_small)

    def loss_single(v_):
        return jnp.sum(jnp.abs(multislice(psi0, v_, prop, sigma)) ** 2 * tgt)

    rng = np.random.default_rng(0)
    tgt = jnp.asarray(rng.normal(size=psi0.shape))
    g_want = np.asarray(jax.grad(loss_single)(v))

    psi0s, vs, props = shard_field_inputs(grid_mesh, psi0, v, prop)
    tgts = jax.device_put(
        tgt, jax.sharding.NamedSharding(grid_mesh, jax.sharding.PartitionSpec("grid", None))
    )

    def loss_sharded(v_):
        i = exit_intensity_gridsharded(psi0s, v_, props, sigma, grid_mesh, remat_chunk=2)
        return jnp.sum(i * tgts)

    # remat inside shard_map needs the enclosing jit (as in any real step fn)
    g_got = np.asarray(jax.jit(jax.grad(loss_sharded))(vs))
    np.testing.assert_allclose(g_got, g_want, rtol=1e-9, atol=1e-11)


def _ctf_stack(grid, lam, defoci):
    from fdes_tpu.optics import Aberrations, ctf_series

    return jnp.asarray(ctf_series(grid, lam, np.asarray(defoci, np.float64)))


def test_gridsharded_defocus_series_equals_forward(si110_small, grid_mesh):
    """hrtem_defocus_series_gridsharded == forward.hrtem_defocus_series on
    the 8-fake-device mesh (values; full imaging chain inside shard_map)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fdes_tpu.forward import hrtem_defocus_series
    from fdes_tpu.gridshard import hrtem_defocus_series_gridsharded

    _, grid, sliced = si110_small
    psi0, v, prop, sigma = _problem(si110_small)
    lam = f.wavelength_A(300e3)
    ctfs = _ctf_stack(grid, lam, [-200.0, -100.0, 100.0, 200.0])
    want = np.asarray(hrtem_defocus_series(v, psi0, prop, sigma, ctfs))

    gput = lambda x, *s: jax.device_put(  # noqa: E731
        x, NamedSharding(grid_mesh, P(*s))
    )
    got = hrtem_defocus_series_gridsharded(
        gput(v, None, "grid", None),
        gput(psi0, "grid", None),
        gput(prop, None, "grid"),
        sigma,
        gput(ctfs, None, None, "grid"),
        grid_mesh,
    )
    assert got.sharding.spec == P(None, "grid", None)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10, atol=1e-12)


def test_gridsharded_tilt_series_equals_forward(si110_small, grid_mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fdes_tpu.forward import hrtem_tilt_series
    from fdes_tpu.gridshard import hrtem_tilt_series_gridsharded

    _, grid, sliced = si110_small
    psi0, v, prop, sigma = _problem(si110_small)
    lam = f.wavelength_A(300e3)
    tilts = [(0.0, 0.0), (5e-3, 0.0), (0.0, -5e-3), (3e-3, 3e-3)]
    psi0_stack = jnp.stack([psi0] * len(tilts))
    prop_stack = jnp.stack(
        [
            jnp.asarray(f.fresnel_propagator(grid, lam, sliced.dz, tilt_xy_rad=t))
            for t in tilts
        ]
    )
    ctf = _ctf_stack(grid, lam, [-150.0])[0]
    want = np.asarray(hrtem_tilt_series(v, psi0_stack, prop_stack, sigma, ctf))

    gput = lambda x, *s: jax.device_put(  # noqa: E731
        x, NamedSharding(grid_mesh, P(*s))
    )
    got = hrtem_tilt_series_gridsharded(
        gput(v, None, "grid", None),
        gput(psi0_stack, None, "grid", None),
        gput(prop_stack, None, None, "grid"),
        sigma,
        gput(ctf, None, "grid"),
        grid_mesh,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10, atol=1e-12)


def test_gridsharded_inverse_step_equals_single_device(si110_small, grid_mesh):
    """loss + dL/dV through the grid-sharded defocus series == single-device
    autodiff, with the gradient coming back ROW-SHARDED (the pod-scale
    memory contract: V+grad never replicate; VERDICT round-2 item 1)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fdes_tpu.forward import hrtem_defocus_series
    from fdes_tpu.gridshard import hrtem_defocus_series_gridsharded
    from fdes_tpu.loss import make_loss

    _, grid, sliced = si110_small
    psi0, v, prop, sigma = _problem(si110_small)
    lam = f.wavelength_A(300e3)
    ctfs = _ctf_stack(grid, lam, [-200.0, 100.0])
    i_obs = hrtem_defocus_series(v, psi0, prop, sigma, ctfs) * 1.05

    def fwd_single(v_, psi0_, prop_, ctfs_):
        return hrtem_defocus_series(v_, psi0_, prop_, sigma, ctfs_)

    loss_single = make_loss(fwd_single, None)
    l_want, g_want = jax.value_and_grad(loss_single)(v, i_obs, psi0, prop, ctfs)

    gput = lambda x, *s: jax.device_put(  # noqa: E731
        x, NamedSharding(grid_mesh, P(*s))
    )

    def fwd_sharded(v_, psi0_, prop_, ctfs_):
        return hrtem_defocus_series_gridsharded(
            v_, psi0_, prop_, sigma, ctfs_, grid_mesh, remat_chunk=2
        )

    loss_sharded = make_loss(fwd_sharded, None)
    l_got, g_got = jax.jit(jax.value_and_grad(loss_sharded))(
        gput(v, None, "grid", None),
        gput(i_obs, None, "grid", None),
        gput(psi0, "grid", None),
        gput(prop, None, "grid"),
        gput(ctfs, None, None, "grid"),
    )
    assert g_got.sharding.spec == P(None, "grid", None)
    np.testing.assert_allclose(float(l_got), float(l_want), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(g_got), np.asarray(g_want), rtol=1e-9, atol=1e-11
    )


def test_data_grid_mesh_composition(si110_small):
    """('data', 'grid') 2-D mesh: defocus series sharded over 'data', field
    rows over 'grid'; values AND dL/dV equal single-device (the config-5
    composition — VERDICT round-2 missing item 1)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fdes_tpu.forward import hrtem_defocus_series
    from fdes_tpu.gridshard import hrtem_defocus_series_gridsharded
    from fdes_tpu.loss import make_loss

    mesh = make_mesh(axis_names=("data", "grid"), shape=(2, 4))
    _, grid, sliced = si110_small
    psi0, v, prop, sigma = _problem(si110_small)
    lam = f.wavelength_A(300e3)
    ctfs = _ctf_stack(grid, lam, [-200.0, -100.0, 100.0, 200.0])
    i_obs = hrtem_defocus_series(v, psi0, prop, sigma, ctfs) * 0.97

    def fwd_single(v_, psi0_, prop_, ctfs_):
        return hrtem_defocus_series(v_, psi0_, prop_, sigma, ctfs_)

    l_want, g_want = jax.value_and_grad(make_loss(fwd_single, None))(
        v, i_obs, psi0, prop, ctfs
    )

    gput = lambda x, *s: jax.device_put(x, NamedSharding(mesh, P(*s)))  # noqa: E731

    def fwd_sharded(v_, psi0_, prop_, ctfs_):
        return hrtem_defocus_series_gridsharded(
            v_, psi0_, prop_, sigma, ctfs_, mesh, data_axis="data",
            remat_chunk=2,
        )

    vs = gput(v, None, "grid", None)
    got = fwd_sharded(
        vs, gput(psi0, "grid", None), gput(prop, None, "grid"),
        gput(ctfs, "data", None, "grid"),
    )
    assert got.sharding.spec == P("data", "grid", None)
    np.testing.assert_allclose(
        np.asarray(got),
        np.asarray(hrtem_defocus_series(v, psi0, prop, sigma, ctfs)),
        rtol=1e-10, atol=1e-12,
    )

    l_got, g_got = jax.jit(jax.value_and_grad(make_loss(fwd_sharded, None)))(
        vs,
        gput(i_obs, "data", "grid", None),
        gput(psi0, "grid", None),
        gput(prop, None, "grid"),
        gput(ctfs, "data", None, "grid"),
    )
    np.testing.assert_allclose(float(l_got), float(l_want), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(g_got), np.asarray(g_want), rtol=1e-9, atol=1e-11
    )


def test_gridsharded_defocus_quadrature_weights(si110_small, grid_mesh):
    """Explicit partial-coherence (quadrature CTF pack + weights) through
    the grid-sharded imaging path == forward.hrtem_defocus_series."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fdes_tpu.forward import hrtem_defocus_series
    from fdes_tpu.gridshard import hrtem_defocus_series_gridsharded
    from fdes_tpu.optics import Aberrations, ctf_quadrature_series

    _, grid, sliced = si110_small
    psi0, v, prop, sigma = _problem(si110_small)
    lam = f.wavelength_A(300e3)
    quads, weights = ctf_quadrature_series(
        grid, lam, np.asarray([-150.0, 150.0]), base=Aberrations(),
        defocus_spread_A=30.0, source_semiangle_rad=2e-4,
        n_defocus=3, n_tilt=3,
    )
    quads = jnp.asarray(quads)
    weights = jnp.asarray(weights)
    want = np.asarray(
        hrtem_defocus_series(v, psi0, prop, sigma, quads, weights=weights)
    )
    gput = lambda x, *s: jax.device_put(  # noqa: E731
        x, NamedSharding(grid_mesh, P(*s))
    )
    got = hrtem_defocus_series_gridsharded(
        gput(v, None, "grid", None),
        gput(psi0, "grid", None),
        gput(prop, None, "grid"),
        sigma,
        gput(quads, None, None, None, "grid"),
        grid_mesh,
        weights=weights,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10, atol=1e-12)
