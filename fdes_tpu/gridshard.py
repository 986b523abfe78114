"""Spatial (tensor-parallel) sharding of the (y, x) field grid.

SURVEY.md §2.1 TP row: the reference has no tensor parallelism; the rebuild
plans "optional spatial sharding of the (x,y) grid for fields >16k²" — a
wave too large for one chip's HBM (a 32k² c64 field is 8 GiB before the
adjoint).  This module makes that row real:

* the field ψ lives ROW-sharded over a 1-D mesh axis (``P('grid', None)``);
  the potential stack carries the same row split per slice;
* each multislice step runs a **distributed 2-D FFT** inside one
  `shard_map`: local FFT along x (the locally-contiguous axis), an
  `all_to_all` transpose over ICI, local FFT along y — the classic
  transpose/"pencil" decomposition (and the Ulysses-analog all-to-all the
  survey names).  The spectrum comes out COLUMN-sharded in natural FFT
  order, so the band-limited Fresnel propagator simply travels pre-sharded
  in that layout and the multiply stays local;
* the inverse FFT transposes back, so transmission (elementwise in real
  space) is local too.  Per slice: 4 `all_to_all` collectives, each moving
  N²/n elements per device — the price of not fitting on one chip.

Everything is differentiable: `shard_map`'s transpose of `all_to_all` is
`all_to_all`, so `jax.value_and_grad` through `multislice_gridsharded`
yields a row-sharded dL/dV with no host gathers — inverse reconstruction at
grid sizes where the DP path (fdes_tpu.sharding) cannot even allocate the
field.  DP over measurements remains the default (SURVEY.md §2.1); compose
both with a 2-D ('data', 'grid') mesh when the series AND the field are
large.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .propagate import transmit

AXIS = "grid"


def _check(
    mesh: Mesh,
    axis: str,
    ny: int,
    nx: int,
    v_shape: tuple[int, ...] | None = None,
    prop_shape: tuple[int, ...] | None = None,
) -> int:
    n = mesh.shape[axis]
    if ny % n or nx % n:
        raise ValueError(
            f"grid {ny}x{nx} not divisible by mesh axis '{axis}' size {n}"
        )
    # Mismatched companion arrays would otherwise reach shard_map and die
    # with an opaque partitioning error (ADVICE.md round 1).
    if v_shape is not None and tuple(v_shape[-2:]) != (ny, nx):
        raise ValueError(f"v_stack grid {v_shape[-2:]} != psi0 grid {(ny, nx)}")
    if prop_shape is not None and tuple(prop_shape[-2:]) != (ny, nx):
        raise ValueError(
            f"propagator grid {prop_shape[-2:]} != psi0 grid {(ny, nx)}"
        )
    return n


def _fft2_local(blk: jax.Array, axis: str) -> jax.Array:
    """Row-sharded (ny/n, nx) block -> column-sharded (ny, nx/n) spectrum.

    fft along x is local; the all_to_all sends column-chunk j to device j
    while concatenating the row blocks in device order, so the y fft then
    sees full, correctly-ordered columns.
    """
    blk = jnp.fft.fft(blk, axis=1)
    blk = jax.lax.all_to_all(blk, axis, split_axis=1, concat_axis=0, tiled=True)
    return jnp.fft.fft(blk, axis=0)


def _ifft2_local(blk: jax.Array, axis: str) -> jax.Array:
    """Inverse of _fft2_local: column-sharded spectrum -> row-sharded field."""
    blk = jnp.fft.ifft(blk, axis=0)
    blk = jax.lax.all_to_all(blk, axis, split_axis=0, concat_axis=1, tiled=True)
    return jnp.fft.ifft(blk, axis=1)


def fft2_distributed(psi: jax.Array, mesh: Mesh, axis: str = AXIS) -> jax.Array:
    """2-D FFT of a row-sharded (ny, nx) field; returns the column-sharded
    spectrum (natural jnp.fft.fft2 ordering).  Thin shard_map wrapper over
    the local stages — multislice_gridsharded inlines them instead so the
    whole slice loop is ONE shard_map region."""
    _check(mesh, axis, *psi.shape)
    return jax.shard_map(
        lambda b: _fft2_local(b, axis),
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=P(None, axis),
    )(psi)


def ifft2_distributed(spec: jax.Array, mesh: Mesh, axis: str = AXIS) -> jax.Array:
    _check(mesh, axis, *spec.shape)
    return jax.shard_map(
        lambda b: _ifft2_local(b, axis),
        mesh=mesh,
        in_specs=P(None, axis),
        out_specs=P(axis, None),
    )(spec)


def shard_field_inputs(
    mesh: Mesh,
    psi0: jax.Array,
    v_stack: jax.Array,
    propagator: jax.Array,
    axis: str = AXIS,
):
    """device_put the multislice inputs in the layouts the engine expects:
    ψ0 row-sharded, V row-sharded per slice, propagator column-sharded
    (it is consumed in the spectral layout)."""
    psi0 = jax.device_put(psi0, NamedSharding(mesh, P(axis, None)))
    v_stack = jax.device_put(v_stack, NamedSharding(mesh, P(None, axis, None)))
    propagator = jax.device_put(propagator, NamedSharding(mesh, P(None, axis)))
    return psi0, v_stack, propagator


def multislice_gridsharded(
    psi0: jax.Array,
    v_stack: jax.Array,
    propagator: jax.Array,
    sigma: float,
    mesh: Mesh,
    *,
    axis: str = AXIS,
    remat_chunk: int | None = None,
) -> jax.Array:
    """Row-sharded multislice: ψ ← IFFT(P·FFT(t_j ψ)) with distributed FFTs.

    Same contract as propagate.multislice (psi0 (ny, nx), v_stack (S, ny, nx)
    real or complex-absorptive, propagator (ny, nx), exit wave (ny, nx)) but
    every array is sharded over ``mesh[axis]`` per shard_field_inputs, and
    the whole scan (all S slices, all collectives) compiles into one XLA
    program per device.  Differentiable; remat_chunk bounds adjoint memory
    exactly as in the single-device engine (remat_chunk requires the caller
    to jit the enclosing step — shard_map cannot evaluate jax.checkpoint
    eagerly, and every real step function is jitted anyway).
    """
    _check(
        mesh, axis, *psi0.shape,
        v_shape=v_stack.shape, prop_shape=propagator.shape,
    )

    def local(psi_blk, v_blks, prop_blk):
        def body(psi, v):
            psi = transmit(psi, v, sigma)
            s = _fft2_local(psi, axis) * prop_blk.astype(psi.dtype)
            return _ifft2_local(s, axis), None

        s = v_blks.shape[0]
        if not remat_chunk or remat_chunk >= s:
            return jax.lax.scan(body, psi_blk, v_blks)[0]
        if s % remat_chunk != 0:
            raise ValueError(f"remat_chunk {remat_chunk} must divide nslices {s}")
        chunks = v_blks.reshape(s // remat_chunk, remat_chunk, *v_blks.shape[1:])

        @jax.checkpoint
        def inner(psi, v_chunk):
            return jax.lax.scan(body, psi, v_chunk)[0]

        return jax.lax.scan(lambda p, c: (inner(p, c), None), psi_blk, chunks)[0]

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(None, axis, None), P(None, axis)),
        out_specs=P(axis, None),
    )(psi0, v_stack, propagator)


def exit_intensity_gridsharded(
    psi0: jax.Array,
    v_stack: jax.Array,
    propagator: jax.Array,
    sigma: float,
    mesh: Mesh,
    *,
    axis: str = AXIS,
    remat_chunk: int | None = None,
) -> jax.Array:
    """|ψ_exit|² with the exit wave kept sharded end-to-end (row-sharded
    intensity out) — the building block for a grid-sharded inverse loss."""
    psi = multislice_gridsharded(
        psi0, v_stack, propagator, sigma, mesh, axis=axis, remat_chunk=remat_chunk
    )
    return jnp.abs(psi) ** 2
