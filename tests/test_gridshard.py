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
