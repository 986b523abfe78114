"""Distributed-tier tests on the 8-device fake CPU mesh (SURVEY §4):
shard_map/psum gradient == single-device gradient, GSPMD sharded-input path
== replicated path, mesh/axis plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from fdes_tpu.constants import interaction_sigma, wavelength_A
from fdes_tpu.forward import hrtem_tilt_series
from fdes_tpu.grids import Grid, fresnel_propagator
from fdes_tpu.loss import make_loss
from fdes_tpu.probe import plane_wave
from fdes_tpu.sharding import (
    data_axis_size,
    make_mesh,
    shard_measurements,
    sharded_value_and_grad,
)

KV = 300e3


def test_fake_mesh_has_8_devices():
    mesh = make_mesh()
    assert data_axis_size(mesh) == 8


def test_two_axis_mesh():
    mesh = make_mesh(axis_names=("host", "chip"), shape=(2, 4))
    assert mesh.devices.shape == (2, 4)
    with pytest.raises(ValueError):
        make_mesh(axis_names=("a", "b"))  # no shape


@pytest.fixture(scope="module")
def tilt_problem():
    """8-tilt series: the measurement axis matches the fake mesh size."""
    rng = np.random.default_rng(7)
    n = 32
    grid = Grid(ny=n, nx=n, py=0.4, px=0.4)
    lam = wavelength_A(KV)
    sigma = interaction_sigma(KV)
    v = jnp.asarray(rng.normal(size=(4, n, n)) * 20.0)
    tilts = [(1e-3 * i, -5e-4 * i) for i in range(8)]
    psi0s = jnp.stack([plane_wave(grid, lam, dtype=jnp.complex128) for _ in tilts])
    props = jnp.stack(
        [jnp.asarray(fresnel_propagator(grid, lam, 1.8, tilt_xy_rad=t)) for t in tilts]
    )
    ctf1 = jnp.ones(grid.shape, jnp.complex128)
    i_obs = hrtem_tilt_series(v, psi0s, props, sigma, ctf1)
    return v, psi0s, props, sigma, ctf1, i_obs


def _loss(v, psi0s, props, sigma, ctf1, i_obs):
    fwd = lambda vv, p0, pr: hrtem_tilt_series(vv, p0, pr, sigma, ctf1)  # noqa: E731

    def fn(vv, p0, pr, obs):
        r = fwd(vv, p0, pr) - obs
        return 0.5 * jnp.sum(r * r)

    return fn


def test_shard_map_grad_equals_single_device(tilt_problem):
    v, psi0s, props, sigma, ctf1, i_obs = tilt_problem
    loss_fn = _loss(v, psi0s, props, sigma, ctf1, i_obs)
    v0 = jnp.zeros_like(v)

    ref_loss, ref_grad = jax.value_and_grad(loss_fn)(v0, psi0s, props, i_obs)

    mesh = make_mesh()
    f = sharded_value_and_grad(loss_fn, mesh, batch_argnums=(0, 1, 2))
    p0_s, pr_s, obs_s = shard_measurements(mesh, psi0s, props, i_obs)
    sh_loss, sh_grad = jax.jit(f)(v0, p0_s, pr_s, obs_s)

    np.testing.assert_allclose(float(sh_loss), float(ref_loss), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(sh_grad), np.asarray(ref_grad), rtol=1e-10, atol=1e-12
    )


def test_gspmd_sharded_inputs_equal_replicated(tilt_problem):
    """The partitioner path: jit a loss whose batch inputs carry a 'data'
    NamedSharding; GSPMD inserts the gradient psum. Values must match the
    unsharded run."""
    v, psi0s, props, sigma, ctf1, i_obs = tilt_problem
    loss_fn = _loss(v, psi0s, props, sigma, ctf1, i_obs)
    v0 = jnp.zeros_like(v)
    ref_loss, ref_grad = jax.value_and_grad(loss_fn)(v0, psi0s, props, i_obs)

    mesh = make_mesh()
    p0_s, pr_s, obs_s = shard_measurements(mesh, psi0s, props, i_obs)
    v_rep = jax.device_put(v0, NamedSharding(mesh, P()))
    g_loss, g_grad = jax.jit(jax.value_and_grad(loss_fn))(v_rep, p0_s, pr_s, obs_s)
    np.testing.assert_allclose(float(g_loss), float(ref_loss), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(g_grad), np.asarray(ref_grad), rtol=1e-10, atol=1e-12
    )
    # the gradient comes back replicated, not sharded
    assert g_grad.sharding.is_fully_replicated


def test_shard_measurements_rejects_indivisible(tilt_problem):
    v, psi0s, *_ = tilt_problem
    mesh = make_mesh()
    with pytest.raises(ValueError):
        shard_measurements(mesh, psi0s[:5])


def test_stem_probe_axis_sharded_equals_replicated():
    """Config-4 pod story: probe positions sharded over the mesh, potential
    replicated — GSPMD partitions the vmap'ed rollouts; signals match the
    single-device raster bit-for-bit tolerance."""
    from fdes_tpu.detector import annular_mask
    from fdes_tpu.forward import stem_raster
    from fdes_tpu.probe import probe_stencil
    from fdes_tpu.sharding import replicated, shard_measurements

    rng = np.random.default_rng(13)
    n = 32
    grid = Grid(ny=n, nx=n, py=0.4, px=0.4)
    lam = wavelength_A(KV)
    sigma = interaction_sigma(KV)
    v = jnp.asarray(rng.normal(size=(3, n, n)) * 15.0)
    prop = jnp.asarray(fresnel_propagator(grid, lam, 1.8))
    stencil = jnp.asarray(probe_stencil(grid, lam, 25e-3))
    qy = jnp.asarray(grid.qy()[:, None])
    qx = jnp.asarray(grid.qx()[None, :])
    pos = jnp.asarray(
        (rng.random((16, 2)) * np.array(grid.extent)).astype(np.float64)
    )
    masks = jnp.asarray(
        np.stack([annular_mask(grid, lam, 0.0, 25e-3),
                  annular_mask(grid, lam, 40e-3, 150e-3)])
    )

    fn = jax.jit(
        lambda vv, p: stem_raster(vv, stencil, qy, qx, p, prop, sigma, masks)
    )
    ref = fn(v, pos)

    mesh = make_mesh()
    pos_sh = shard_measurements(mesh, pos)
    v_rep = jax.device_put(v, replicated(mesh))
    out = fn(v_rep, pos_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-12, atol=1e-13)


def test_prism_raster_probe_axis_sharded_equals_replicated():
    """PRISM pod story: S-matrix replicated, probe positions sharded — the
    (P,B)@(B,N^2) synthesis partitions on P with zero collectives."""
    from fdes_tpu.detector import annular_mask
    from fdes_tpu.prism import plan_prism, prism_raster, prism_smatrix
    from fdes_tpu.probe import probe_stencil
    from fdes_tpu.sharding import replicated, shard_measurements

    rng = np.random.default_rng(17)
    n = 32
    grid = Grid(ny=n, nx=n, py=0.4, px=0.4)
    lam = wavelength_A(KV)
    sigma = interaction_sigma(KV)
    v = jnp.asarray(rng.normal(size=(3, n, n)) * 15.0)
    prop = jnp.asarray(fresnel_propagator(grid, lam, 1.8))
    stencil = probe_stencil(grid, lam, 25e-3)
    plan = plan_prism(grid, stencil, interp=1)
    pos = jnp.asarray(
        (rng.random((16, 2)) * np.array(grid.extent)).astype(np.float64)
    )
    masks = jnp.asarray(
        np.stack([annular_mask(grid, lam, 0.0, 25e-3),
                  annular_mask(grid, lam, 40e-3, 150e-3)])
    )
    smat = prism_smatrix(plan, v, prop, sigma, dtype=jnp.complex128)
    fn = jax.jit(lambda sm, p: prism_raster(sm, plan, p, masks))
    ref = fn(smat, pos)

    mesh = make_mesh()
    pos_sh = shard_measurements(mesh, pos)
    smat_rep = jax.device_put(smat, replicated(mesh))
    out = fn(smat_rep, pos_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-12, atol=1e-13)
