"""FFT-based projected-potential builder (SURVEY.md C5, §3.3).

This is the reference paper's headline algorithm (Van den Broek, Jiang &
Koch, Ultramicroscopy 158 (2015)): instead of summing every atom's potential
over every pixel (O(atoms * N^2)), scatter atoms as weighted deltas onto the
grid, FFT once per species, multiply by the species' Fourier-space potential
factor, and inverse-FFT — O(N^2 log N + atoms) per slice.

TPU-native realisation (vs the reference's atomicAdd scatter kernel + cuFFT,
SURVEY.md §3.3):

* ONE ``jnp.zeros(...).at[flat_idx].add(w)`` XLA scatter-add places all four
  bilinear corners of every atom of every slice/species at once — flat
  static-shape arrays from `specimen.slice_specimen`, no per-slice padding,
  no atomics (XLA scatter-add is well-defined; SURVEY.md §5 race row).
* The delta grids are real, so the per-species transform is an ``rfft2``
  (half the FFT work of the reference's C2C plan).
* Sub-pixel placement is bilinear interpolation of the delta onto its four
  neighbouring pixels with periodic wrap.  Under the 2/3-Nyquist band limit
  the resulting error is O((q*px)^2) and is validated against an
  exact-phase-summation golden builder in tests (golden.py).

Units: the returned potential stack is the PROJECTED potential per slice in
V*Å, so the slice phase is simply sigma * V (constants.py conventions).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .grids import Grid
from .scattering import ScatteringTable, species_form_factors
from .specimen import SlicedAtoms


def rfft_q2(grid: Grid) -> np.ndarray:
    """|q|^2 on the rfft2 output grid (ny, nx//2 + 1), float64, 1/Å^2."""
    qy = np.fft.fftfreq(grid.ny, d=grid.py)[:, None]
    qx = np.fft.rfftfreq(grid.nx, d=grid.px)[None, :]
    return qy * qy + qx * qx


def species_factors_rfft(
    grid: Grid,
    species: tuple[tuple[int, float], ...],
    table: ScatteringTable | None = None,
) -> np.ndarray:
    """(nspecies, ny, nx//2+1) float64 Fourier factors, V*Å^3 (host, f64)."""
    return species_form_factors(rfft_q2(grid), list(species), table)


def species_factors_full(
    grid: Grid,
    species: tuple[tuple[int, float], ...],
    table: ScatteringTable | None = None,
) -> np.ndarray:
    """(nspecies, ny, nx) float64 Fourier factors on the FULL fft2 grid.

    The grid-sharded streamed builder (gridshard.multislice_gridsharded_
    streamed) consumes the factors COLUMN-sharded in the distributed
    spectral layout, which is the natural full-C2C fft2 ordering — the
    rfft2 half-grid of species_factors_rfft does not shard that way."""
    return species_form_factors(grid.q2(), list(species), table)


@functools.partial(
    jax.jit,
    static_argnames=("nslices", "nspecies", "shape", "pixel", "dtype"),
)
def scatter_deltas(
    x: jax.Array,
    y: jax.Array,
    slice_idx: jax.Array,
    species_idx: jax.Array,
    weight: jax.Array,
    *,
    nslices: int,
    nspecies: int,
    shape: tuple[int, int],
    pixel: tuple[float, float],
    dtype=jnp.float32,
) -> jax.Array:
    """Bilinear periodic scatter of atoms onto (S, nspecies, ny, nx) grids."""
    ny, nx = shape
    py, px = pixel
    fy = jnp.asarray(y, dtype) / dtype(py)
    fx = jnp.asarray(x, dtype) / dtype(px)
    iy0 = jnp.floor(fy)
    ix0 = jnp.floor(fx)
    wy1 = fy - iy0
    wx1 = fx - ix0
    iy0 = iy0.astype(jnp.int32)
    ix0 = ix0.astype(jnp.int32)
    w = jnp.asarray(weight, dtype)
    plane = jnp.asarray(slice_idx, jnp.int32) * nspecies + jnp.asarray(
        species_idx, jnp.int32
    )

    idxs = []
    vals = []
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        iy = jnp.mod(iy0 + dy, ny)
        ix = jnp.mod(ix0 + dx, nx)
        cw = (wy1 if dy else 1.0 - wy1) * (wx1 if dx else 1.0 - wx1)
        idxs.append((plane * ny + iy) * nx + ix)
        vals.append(w * cw)
    flat_idx = jnp.concatenate(idxs)
    flat_val = jnp.concatenate(vals)
    g = jnp.zeros((nslices * nspecies * ny * nx,), dtype)
    g = g.at[flat_idx].add(flat_val)
    return g.reshape(nslices, nspecies, ny, nx)


@functools.partial(jax.jit, static_argnames=("shape", "pixel", "slice_chunk"))
def deltas_to_potential(
    deltas: jax.Array,
    ff_r: jax.Array,
    *,
    shape: tuple[int, int],
    pixel: tuple[float, float],
    slice_chunk: int | None = None,
) -> jax.Array:
    """FFT * form-factor * IFFT: (S, nsp, ny, nx) deltas -> (S, ny, nx) V*Å.

    slice_chunk bounds peak memory by mapping the batched FFT over groups of
    slices (lax.map), for large S*N^2 (pod config, SURVEY.md §7).
    """
    ny, nx = shape
    py, px = pixel
    inv_area = 1.0 / (py * px)

    def one_chunk(d):
        vq = jnp.fft.rfft2(d)  # (chunk, nsp, ny, nxr)
        vq = jnp.sum(vq * ff_r[None].astype(vq.dtype), axis=1)
        return jnp.fft.irfft2(vq, s=(ny, nx)) * jnp.asarray(inv_area, d.dtype)

    if slice_chunk is None or deltas.shape[0] <= slice_chunk:
        return one_chunk(deltas)
    s = deltas.shape[0]
    nchunk = -(-s // slice_chunk)
    pad = nchunk * slice_chunk - s
    d = jnp.pad(deltas, ((0, pad), (0, 0), (0, 0), (0, 0)))
    d = d.reshape(nchunk, slice_chunk, *deltas.shape[1:])
    v = jax.lax.map(one_chunk, d)
    return v.reshape(nchunk * slice_chunk, ny, nx)[:s]


def build_potential_exact(
    sliced: SlicedAtoms,
    grid: Grid,
    table: ScatteringTable | None = None,
    dtype=jnp.float32,
) -> jax.Array:
    """EXACT-phase projected potential as MXU matmuls (no interpolation).

    The per-atom Fourier phase sum of §3.3,
        F(q) = sum_a w_a exp(-2*pi*i*(qy*y_a + qx*x_a)),
    is separable: with Ay[j,a] = exp(-2*pi*i*qy_j*y_a) and
    Bx[a,k] = exp(-2*pi*i*x_a*qx_k) it is the dense product
    Ay @ diag(w) @ Bx — two complex matmuls per slice/species that run on
    the systolic array.  This removes the bilinear scatter's O((q*px)^2)
    interpolation error entirely (the device-side equivalent of
    golden_potential_exact) at O(atoms*N^2) MXU FLOPs; prefer it when
    sub-pixel fidelity at high q matters more than build time, and the
    default scatter+FFT builder when atoms >> N.

    Phase note: the arguments q*r can reach 1e3 rad; they are reduced
    mod 1 cycle in the working precision before the trig, so f32 phase
    error stays ~1e-5 cycles instead of growing with |r|.
    """
    rdt = np.dtype(jnp.dtype(dtype).name)
    cdt = jnp.complex64 if rdt == np.float32 else jnp.complex128
    x, y, sp, w, m = pad_atoms_per_slice(sliced, rdt)
    nsp = len(sliced.species)
    ff = species_form_factors(grid.q2(), list(sliced.species), table).astype(rdt)
    qy = grid.qy().astype(rdt)
    qx = grid.qx().astype(rdt)
    inv_area = 1.0 / grid.pixel_area

    @functools.partial(jax.jit, static_argnames=("nsp",))
    def run(x, y, sp, w, qy, qx, ff, *, nsp):
        def ramp(prod):  # exp(-2*pi*i*prod), prod in cycles, range-reduced
            frac = prod - jnp.round(prod)
            ang = (-2.0 * np.pi) * frac
            return jax.lax.complex(jnp.cos(ang), jnp.sin(ang))

        def one_slice(xs, ys, sps, ws):
            ay = ramp(qy[:, None] * ys[None, :])  # (ny, M)
            bx = ramp(xs[:, None] * qx[None, :])  # (M, nx)
            wsp = (
                (sps[None, :] == jnp.arange(nsp)[:, None]).astype(ay.real.dtype)
                * ws[None, :]
            )  # (nsp, M)
            # Precision.HIGHEST: TPU matmuls default to one bf16 pass per
            # f32 operand (~3e-3 rounding) — this builder exists for exact
            # sub-pixel phases, so pin true-f32 MXU emulation (dft.py doc).
            f = jnp.einsum(
                "ym,sm,mx->syx", ay, wsp.astype(ay.dtype), bx,
                precision=jax.lax.Precision.HIGHEST,
            )  # per-species structure factors
            vq = jnp.sum(f * ff.astype(ay.dtype), axis=0)
            return jnp.fft.ifft2(vq).real * jnp.asarray(inv_area, ay.real.dtype)

        return jax.vmap(one_slice)(x, y, sp, w)

    return run(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(sp), jnp.asarray(w),
        jnp.asarray(qy), jnp.asarray(qx), jnp.asarray(ff), nsp=nsp,
    )


def pad_atoms_per_slice(sliced: SlicedAtoms, dtype=np.float32):
    """Rearrange flat atoms into per-slice padded arrays (S, max_atoms).

    The scan-fused builder (slice_potential / propagate.multislice_streamed)
    needs a STATIC per-slice atom count; atoms are padded to the max over
    slices with zero weight (classic JAX shape discipline, SURVEY.md §7).
    Returns (x, y, species_idx, weight) host arrays plus max_atoms.
    """
    s = sliced.nslices
    counts = np.bincount(sliced.slice_idx, minlength=s)
    m = int(counts.max()) if counts.size else 0
    x = np.zeros((s, m), dtype)
    y = np.zeros((s, m), dtype)
    sp = np.zeros((s, m), np.int32)
    w = np.zeros((s, m), dtype)
    # Vectorised group-fill (no per-atom Python loop — tomography-scale
    # specimens have 1e6+ atoms): stable-sort by slice, then each atom's
    # column is its rank within its slice.
    order = np.argsort(sliced.slice_idx, kind="stable")
    j = sliced.slice_idx[order]
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    k = np.arange(j.shape[0], dtype=np.int64) - starts[j]
    x[j, k] = sliced.x[order]
    y[j, k] = sliced.y[order]
    sp[j, k] = sliced.species_idx[order]
    w[j, k] = sliced.weight[order]
    return x, y, sp, w, m


def scatter_slice_deltas(
    x: jax.Array,
    y: jax.Array,
    species_idx: jax.Array,
    weight: jax.Array,
    *,
    nspecies: int,
    shape: tuple[int, int],
    pixel: tuple[float, float],
    rdt,
) -> jax.Array:
    """Bilinear periodic scatter of ONE slice's (padded) atoms onto
    per-species (nspecies, ny, nx) delta grids — the shared front half of
    slice_potential, also consumed by the panel-staged streamed build
    (pallas/panel_scan.py), which replaces the rfft2 back half with MXU
    panel transforms."""
    ny, nx = shape
    py, px = pixel
    fy = y.astype(rdt) / rdt.type(py)
    fx = x.astype(rdt) / rdt.type(px)
    iy0 = jnp.floor(fy)
    ix0 = jnp.floor(fx)
    wy1 = fy - iy0
    wx1 = fx - ix0
    iy0 = iy0.astype(jnp.int32)
    ix0 = ix0.astype(jnp.int32)
    w = weight.astype(rdt)
    idxs = []
    vals = []
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        iy = jnp.mod(iy0 + dy, ny)
        ix = jnp.mod(ix0 + dx, nx)
        cw = (wy1 if dy else 1.0 - wy1) * (wx1 if dx else 1.0 - wx1)
        idxs.append((species_idx * ny + iy) * nx + ix)
        vals.append(w * cw)
    g = jnp.zeros((nspecies * ny * nx,), rdt)
    g = g.at[jnp.concatenate(idxs)].add(jnp.concatenate(vals))
    return g.reshape(nspecies, ny, nx)


def slice_potential(
    x: jax.Array,
    y: jax.Array,
    species_idx: jax.Array,
    weight: jax.Array,
    ff_r: jax.Array,
    *,
    shape: tuple[int, int],
    pixel: tuple[float, float],
) -> jax.Array:
    """One slice's projected potential from its (padded) atoms — traced.

    Same bilinear-scatter + rfft2 pipeline as the batched builder, for ONE
    slice; used inside the propagation scan so the (S, ny, nx) stack never
    materialises (pod-scale forward runs, SURVEY.md §7 memory risk).
    """
    ny, nx = shape
    py, px = pixel
    rdt = ff_r.dtype
    g = scatter_slice_deltas(
        x, y, species_idx, weight, nspecies=ff_r.shape[0], shape=shape,
        pixel=pixel, rdt=rdt,
    )
    vq = jnp.sum(jnp.fft.rfft2(g) * ff_r.astype(jnp.fft.rfft2(g).dtype), axis=0)
    inv_area = rdt.type(1.0 / (py * px))
    return jnp.fft.irfft2(vq, s=(ny, nx)) * inv_area


def build_potential(
    sliced: SlicedAtoms,
    grid: Grid,
    table: ScatteringTable | None = None,
    dtype=jnp.float32,
    slice_chunk: int | None = None,
) -> jax.Array:
    """Host-facing wrapper: SlicedAtoms -> (S, ny, nx) projected potential.

    Form factors are evaluated on the host in f64 (scattering.py) and cast;
    the scatter + FFT pipeline runs jitted on device.
    """
    # Host-side f64 -> device dtype casts happen in NumPy BEFORE transfer:
    # the TPU has no f64, and an eager on-device convert_element_type from a
    # shipped f64 buffer fails at runtime.
    rdt = np.dtype(jnp.dtype(dtype).name)
    ff = species_factors_rfft(grid, sliced.species, table).astype(rdt)
    deltas = scatter_deltas(
        jnp.asarray(sliced.x.astype(rdt)),
        jnp.asarray(sliced.y.astype(rdt)),
        jnp.asarray(sliced.slice_idx),
        jnp.asarray(sliced.species_idx),
        jnp.asarray(sliced.weight.astype(rdt)),
        nslices=sliced.nslices,
        nspecies=len(sliced.species),
        shape=grid.shape,
        pixel=(grid.py, grid.px),
        dtype=dtype,
    )
    return deltas_to_potential(
        deltas,
        jnp.asarray(ff),
        shape=grid.shape,
        pixel=(grid.py, grid.px),
        slice_chunk=slice_chunk,
    )
