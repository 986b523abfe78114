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


def _multislice_local(
    psi_blk: jax.Array,
    v_blks: jax.Array,
    prop_blk: jax.Array,
    sigma: float,
    axis: str,
    remat_chunk: int | None,
) -> jax.Array:
    """The per-device multislice scan body shared by every grid-sharded
    entry point: row-sharded ψ block in, row-sharded exit-wave block out,
    4 all_to_all collectives per slice (module docstring)."""

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


def _image_local(
    psi_blk: jax.Array,
    ctf_blk: jax.Array,
    axis: str,
    weights: jax.Array | None,
) -> jax.Array:
    """HRTEM image of a row-sharded exit-wave block with a COLUMN-sharded
    CTF block ((ny, nx/n) — the CTF multiply happens in the spectral layout
    the distributed FFT emits); row-sharded intensity block out.

    weights: (K,) quadrature weights — then ctf_blk is (K, ny, nx/n) and
    the image is the explicit partial-coherence average (one forward FFT of
    ψ shared over the K nodes, as in imaging.hrtem_incoherent)."""
    spec = _fft2_local(psi_blk, axis)
    if weights is None:
        img = _ifft2_local(spec * ctf_blk.astype(spec.dtype), axis)
        return jnp.abs(img) ** 2
    imgs = jax.vmap(
        lambda c: jnp.abs(_ifft2_local(spec * c.astype(spec.dtype), axis)) ** 2
    )(ctf_blk)
    return jnp.tensordot(weights.astype(imgs.dtype), imgs, axes=1)


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

    return jax.shard_map(
        lambda p, v, pr: _multislice_local(p, v, pr, sigma, axis, remat_chunk),
        mesh=mesh,
        in_specs=(P(axis, None), P(None, axis, None), P(None, axis)),
        out_specs=P(axis, None),
    )(psi0, v_stack, propagator)


def _slice_scatter_rows(
    xs, ys, sps, ws, *, nsp, ny, nx, pixel, row0, rows, rdt
):
    """Bilinear periodic scatter of ONE slice's (padded) atoms onto this
    device's LOCAL row block, plus one halo row.

    Each device owns the atoms whose base pixel row floor(y/py) mod ny
    falls in [row0, row0+rows); the dy=1 bilinear corner of the last
    owned row lands in the halo row (index ``rows``), which the caller
    ships to the next device with a cyclic ppermute — the wrap from the
    last device to row 0 of the first is the same permutation.  Returns
    (nsp, rows+1, nx)."""
    py, px = pixel
    fy = ys.astype(rdt) / rdt.type(py)
    fx = xs.astype(rdt) / rdt.type(px)
    iy0 = jnp.floor(fy)
    ix0 = jnp.floor(fx)
    wy1 = fy - iy0
    wx1 = fx - ix0
    iy0g = jnp.mod(iy0.astype(jnp.int32), ny)
    ix0 = ix0.astype(jnp.int32)
    own = (iy0g >= row0) & (iy0g < row0 + rows)
    w_ = jnp.where(own, ws.astype(rdt), rdt.type(0.0))
    loc0 = jnp.clip(iy0g - row0, 0, rows - 1)  # valid wherever own
    idxs = []
    vals = []
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        iy = loc0 + dy  # in [0, rows]; rows == the halo row
        ix = jnp.mod(ix0 + dx, nx)
        cw = (wy1 if dy else 1.0 - wy1) * (wx1 if dx else 1.0 - wx1)
        idxs.append((sps * (rows + 1) + iy) * nx + ix)
        vals.append(w_ * cw)
    g = jnp.zeros((nsp * (rows + 1) * nx,), rdt)
    g = g.at[jnp.concatenate(idxs)].add(jnp.concatenate(vals))
    return g.reshape(nsp, rows + 1, nx)


def multislice_gridsharded_streamed(
    psi0: jax.Array,
    atoms_xyspw: tuple[jax.Array, jax.Array, jax.Array, jax.Array],
    ff_full: jax.Array,
    propagator: jax.Array,
    sigma: float,
    mesh: Mesh,
    *,
    shape: tuple[int, int],
    pixel: tuple[float, float],
    axis: str = AXIS,
) -> jax.Array:
    """Grid-sharded multislice with the potential built ON THE FLY — the
    composition VERDICT.md round-4 item 7 names: the (S, ny, nx) stack
    never exists AND the field/V work is row-sharded over the mesh.

    Per slice, inside one shard_map region: each device scatters its own
    rows' atoms locally (one cyclic ppermute ships the bilinear halo
    row), the species delta blocks go through the DISTRIBUTED fft2 (the
    same all_to_all transpose the propagation uses), the column-sharded
    full-grid factors (potential.species_factors_full, P(None, None,
    axis)) multiply locally, one distributed ifft2 returns the local V
    block, and the propagation body follows.  Cost per slice vs the
    non-streamed grid-sharded scan: +(nspecies+1) distributed transforms
    — the same trade multislice_streamed makes on one chip.

    atoms_xyspw (per-slice padded host arrays, pad_atoms_per_slice)
    travel REPLICATED (a few MB of coordinates); psi0 row-sharded
    P(axis, None); propagator column-sharded P(None, axis).
    Forward-only, like every streamed path (the inverse optimises V
    itself)."""
    ny, nx = shape
    ndev = _check(mesh, axis, *psi0.shape, prop_shape=propagator.shape)
    rows = ny // ndev
    perm = tuple((i, (i + 1) % ndev) for i in range(ndev))
    nsp = ff_full.shape[0]
    rdt = jnp.real(psi0).dtype

    def local(psi_blk, x, y, sp, w, ff_blk, prop_blk):
        idx = jax.lax.axis_index(axis)
        row0 = (idx * rows).astype(jnp.int32)

        def body(psi, slice_atoms):
            xs, ys, sps, ws = slice_atoms
            g = _slice_scatter_rows(
                xs, ys, sps, ws, nsp=nsp, ny=ny, nx=nx, pixel=pixel,
                row0=row0, rows=rows, rdt=rdt,
            )
            halo = jax.lax.ppermute(g[:, rows], axis, perm)
            g = g[:, :rows].at[:, 0].add(halo)
            spec = jax.vmap(
                lambda b: _fft2_local(b.astype(psi.dtype), axis)
            )(g)
            vq = jnp.sum(spec * ff_blk.astype(spec.dtype), axis=0)
            # 1/(py*px): the scatter places unit deltas; the continuous
            # FT normalisation is the same as slice_potential's inv_area
            v_blk = jnp.real(_ifft2_local(vq, axis)).astype(rdt) * rdt.type(
                1.0 / (pixel[0] * pixel[1])
            )
            psi = transmit(psi, v_blk, sigma)
            s = _fft2_local(psi, axis) * prop_blk.astype(psi.dtype)
            return _ifft2_local(s, axis), None

        return jax.lax.scan(body, psi_blk, (x, y, sp, w))[0]

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(axis, None), P(), P(), P(), P(),
            P(None, None, axis), P(None, axis),
        ),
        out_specs=P(axis, None),
    )(psi0, *atoms_xyspw, ff_full, propagator)


def hrtem_defocus_series_gridsharded(
    v_stack: jax.Array,
    psi0: jax.Array,
    propagator: jax.Array,
    sigma: float,
    ctf_stack: jax.Array,
    mesh: Mesh,
    *,
    weights: jax.Array | None = None,
    axis: str = AXIS,
    data_axis: str | None = None,
    remat_chunk: int | None = None,
) -> jax.Array:
    """Grid-sharded forward.hrtem_defocus_series: (D, ny, nx) intensities.

    The rollout is shared across defoci (one scan), then each local defocus
    applies its CTF in the distributed spectral layout — the whole series is
    ONE shard_map region, so XLA schedules the slice-loop collectives and
    the imaging collectives in a single program.

    Shardings: ψ0 row-sharded P(axis, None); V P(None, axis, None);
    propagator and CTFs COLUMN-sharded (consumed in the spectral layout);
    images come back P(data_axis, axis, None).  ``data_axis``: optional
    second mesh axis sharding the defocus series — the ('data', 'grid')
    composition for runs where the series AND the field are large
    (BASELINE.md config 5).  The gradient wrt V is row-sharded over
    ``axis`` and summed over ``data_axis`` automatically by shard_map's
    transpose — the 16 GiB pod-scale V+grad never replicates (VERDICT.md
    round-2 missing item 1).

    ``weights``: (K,) quadrature weights; ctf_stack then is (D, K, ny, nx)
    (optics.ctf_quadrature_series) and each image is the explicit
    partial-coherence average.
    """
    _check(
        mesh, axis, *psi0.shape,
        v_shape=v_stack.shape, prop_shape=propagator.shape,
    )
    quad = weights is not None
    ctf_spec = (
        P(data_axis, None, None, axis) if quad else P(data_axis, None, axis)
    )

    def local(v_blks, psi_blk, prop_blk, ctf_blks, w):
        psi = _multislice_local(psi_blk, v_blks, prop_blk, sigma, axis, remat_chunk)
        return jax.vmap(lambda c: _image_local(psi, c, axis, w))(ctf_blks)

    in_specs = (P(None, axis, None), P(axis, None), P(None, axis), ctf_spec)
    args = (v_stack, psi0, propagator, ctf_stack)
    if quad:
        in_specs = in_specs + (P(),)
        args = args + (weights,)
        fn = local
    else:
        fn = lambda v, p, pr, c: local(v, p, pr, c, None)  # noqa: E731
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(data_axis, axis, None),
    )(*args)


def hrtem_tilt_series_gridsharded(
    v_stack: jax.Array,
    psi0_stack: jax.Array,
    propagator_stack: jax.Array,
    sigma: float,
    ctf: jax.Array,
    mesh: Mesh,
    *,
    weights: jax.Array | None = None,
    axis: str = AXIS,
    data_axis: str | None = None,
    remat_chunk: int | None = None,
) -> jax.Array:
    """Grid-sharded forward.hrtem_tilt_series: (T, ny, nx) intensities.

    Each tilt is an independent full rollout (tilt changes the propagator),
    vmapped over the local tilt shard inside one shard_map region.  ctf:
    (ny, nx) — or (K, ny, nx) with ``weights`` for explicit partial
    coherence — consumed column-sharded.  Shardings as in
    hrtem_defocus_series_gridsharded, with the (ψ0, P) stacks carrying the
    tilt axis on ``data_axis``: P(data_axis, axis, None) /
    P(data_axis, None, axis).
    """
    ny, nx = psi0_stack.shape[-2:]
    _check(mesh, axis, ny, nx, v_shape=v_stack.shape)
    if tuple(propagator_stack.shape[-2:]) != (ny, nx):
        raise ValueError(
            f"propagator grid {propagator_stack.shape[-2:]} != psi0 grid "
            f"{(ny, nx)}"
        )
    quad = weights is not None
    ctf_spec = P(None, None, axis) if quad else P(None, axis)

    def local(v_blks, psi0_blks, prop_blks, ctf_blk, w):
        def one(psi_blk, prop_blk):
            psi = _multislice_local(
                psi_blk, v_blks, prop_blk, sigma, axis, remat_chunk
            )
            return _image_local(psi, ctf_blk, axis, w)

        return jax.vmap(one)(psi0_blks, prop_blks)

    in_specs = (
        P(None, axis, None),
        P(data_axis, axis, None),
        P(data_axis, None, axis),
        ctf_spec,
    )
    args = (v_stack, psi0_stack, propagator_stack, ctf)
    if quad:
        in_specs = in_specs + (P(),)
        args = args + (weights,)
        fn = local
    else:
        fn = lambda v, p0, pr, c: local(v, p0, pr, c, None)  # noqa: E731
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(data_axis, axis, None),
    )(*args)


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
