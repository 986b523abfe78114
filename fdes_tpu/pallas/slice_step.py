"""Fused Pallas TPU stages for the multislice slice step (SURVEY.md C6-C8).

The reference runs ~4 separate CUDA kernels per slice around its two cuFFT
calls: build t = exp(i*sigma*V), complex-multiply t*psi, complex-multiply
P*psi_hat, plus launch overhead (SURVEY.md §3.1).  Here each elementwise
stage is ONE Pallas VMEM pass on float32 planes:

* ``pallas_transmit``: psi <- exp(1j*sigma*V) * psi computed as cos/sin of
  the real phase and a 4-multiply complex rotation — the transmission
  function is never materialised in HBM (the reference materialises t per
  slice; XLA usually fuses this too, which is why propagate.py benchmarks
  the Pallas path against plain XLA fusion and ships the winner, M6).
* ``propagator_multiply``: psi_hat <- P * psi_hat, the band-limited Fresnel
  multiply in Fourier space.

Both carry custom VJPs (the guide's Custom VJP pattern) so ``jax.grad``
flows through the Pallas path exactly as through the jnp path:

    transmit:  d_psi = g * t,   d_V = -sigma * Im(g * t * psi)
    cmul by P: d_psi_hat = g * P

(JAX's vjp pairing for complex primals is BILINEAR — the transpose of the
jvp with no conjugation, with real inputs taking the real projection; the
familiar conj(t)*g adjoint belongs to the sesquichannel convention and is
WRONG here — pinned empirically and by tests against jnp autodiff).

Complex arrays are carried as (real, imag) float32 planes inside kernels —
Pallas TPU vector memory works on real lanes; the complex64 view exists
only at the jnp boundary.  Blocks are (ROWS, nx) row stripes: the lane
(last) dimension keeps the full row (nx is a multiple of 128 for every
supported grid), the sublane dimension is chunked to bound VMEM for 2048^2
fields (4 planes x 2048 x 2048 x 4 B = 64 MiB >> 16 MiB VMEM).

FFTs stay in XLA: on TPU the FFT is an optimized library op; Pallas wins
only the elementwise stages around it (SURVEY.md §7 M6 ships
whichever of Pallas/XLA measures faster per grid size).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Row-stripe height per grid step.  8 is the f32 sublane quantum.  The
# stripe height is bounded by the per-kernel VMEM budget ACROSS ALL LIVE
# PLANES: the 10-plane absorptive-backward kernel at nx=2048 with 256-row
# stripes wants 20 MiB > the 16 MiB scoped-vmem limit (Mosaic compile OOM,
# caught on hardware in round 2) — so _row_grid sizes the stripe from the
# plane count instead of a fixed constant.
_ROWS = 256
# Mosaic DOUBLE-BUFFERS every in/out block for the grid pipeline, so the
# scoped-vmem cost is ~2x nplanes*rows*nx*4; budget 5 MiB of single-buffer
# bytes => ~10 MiB scoped, under the 16 MiB limit (the 256-row/5-plane
# config at nx=2048 measured 17.97 MiB scoped and failed to compile).
_VMEM_BUDGET_BYTES = 5 * 1024 * 1024


def _row_grid(shape, nplanes=6):
    """(grid, BlockSpec) for row-stripe processing of ``nplanes`` f32 planes."""
    ny, nx = shape
    rows = min(_ROWS, ny, max(_VMEM_BUDGET_BYTES // (nplanes * nx * 4), 8))
    # Largest power of two <= budget that divides ny: Mosaic requires the
    # sublane block dimension be a multiple of 8 (or == ny), and a raw
    # budget like 213 rows would decay to 1 in the divisibility loop.
    rows = 1 << (rows.bit_length() - 1)
    while ny % rows:
        rows //= 2
    rows = max(rows, 1)
    spec = pl.BlockSpec((rows, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return (ny // rows,), spec


def _transmit_fwd_kernel(v_ref, pr_ref, pi_ref, or_ref, oi_ref, *, sigma):
    phase = sigma * v_ref[:]
    c = jnp.cos(phase)
    s = jnp.sin(phase)
    pr = pr_ref[:]
    pi = pi_ref[:]
    or_ref[:] = pr * c - pi * s
    oi_ref[:] = pr * s + pi * c


def _transmit_bwd_kernel(
    v_ref, pr_ref, pi_ref, gr_ref, gi_ref, dr_ref, di_ref, dv_ref, *, sigma
):
    phase = sigma * v_ref[:]
    c = jnp.cos(phase)
    s = jnp.sin(phase)
    gr = gr_ref[:]
    gi = gi_ref[:]
    # d_psi = g * t  with t = c + i s (bilinear vjp pairing, see module doc)
    dr_ref[:] = gr * c - gi * s
    di_ref[:] = gr * s + gi * c
    # t*psi (recomputed - cheaper than stashing it through the FFT pipeline)
    pr = pr_ref[:]
    pi = pi_ref[:]
    tpr = pr * c - pi * s
    tpi = pr * s + pi * c
    # d_V = -sigma * Im(g * t*psi) = -sigma * (gr*tpi + gi*tpr)
    dv_ref[:] = -sigma * (gr * tpi + gi * tpr)


def _transmit_abs_fwd_kernel(
    vr_ref, va_ref, pr_ref, pi_ref, or_ref, oi_ref, *, sigma
):
    phase = sigma * vr_ref[:]
    damp = jnp.exp(-sigma * va_ref[:])
    c = damp * jnp.cos(phase)
    s = damp * jnp.sin(phase)
    pr = pr_ref[:]
    pi = pi_ref[:]
    or_ref[:] = pr * c - pi * s
    oi_ref[:] = pr * s + pi * c


def _transmit_abs_bwd_kernel(
    vr_ref, va_ref, pr_ref, pi_ref, gr_ref, gi_ref,
    dr_ref, di_ref, dvr_ref, dva_ref, *, sigma
):
    phase = sigma * vr_ref[:]
    damp = jnp.exp(-sigma * va_ref[:])
    c = damp * jnp.cos(phase)
    s = damp * jnp.sin(phase)
    gr = gr_ref[:]
    gi = gi_ref[:]
    dr_ref[:] = gr * c - gi * s  # d_psi = g * t
    di_ref[:] = gr * s + gi * c
    pr = pr_ref[:]
    pi = pi_ref[:]
    tpr = pr * c - pi * s
    tpi = pr * s + pi * c
    # real-input projections (bilinear pairing, module doc):
    # d_Vre = Re(g * i*sigma*t*psi) = -sigma*Im(g*t*psi)
    dvr_ref[:] = -sigma * (gr * tpi + gi * tpr)
    # d_Vabs = Re(g * (-sigma)*t*psi) = -sigma*Re(g*t*psi)
    dva_ref[:] = -sigma * (gr * tpr - gi * tpi)


def _cmul_kernel(ar_ref, ai_ref, br_ref, bi_ref, cr_ref, ci_ref, *, conj_b):
    ar = ar_ref[:]
    ai = ai_ref[:]
    br = br_ref[:]
    bi = bi_ref[:] if not conj_b else -bi_ref[:]
    cr_ref[:] = ar * br - ai * bi
    ci_ref[:] = ar * bi + ai * br


def _resolve_interpret(interpret):
    """None -> interpret on CPU (no Mosaic backend), compiled on TPU."""
    if interpret is None:
        return jax.default_backend() == "cpu"
    return bool(interpret)


def _planes(z):
    return jnp.real(z), jnp.imag(z)


def _complex(r, i):
    return jax.lax.complex(r, i)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def pallas_transmit(psi, v_slice, sigma: float, interpret: bool | None = None):
    """psi * exp(1j*sigma*v_slice) as one fused Pallas pass (c64 in/out)."""
    out_r, out_i = _transmit_fwd(psi, v_slice, sigma, interpret)
    return _complex(out_r, out_i)


def _transmit_fwd(psi, v_slice, sigma, interpret):
    interpret = _resolve_interpret(interpret)
    pr, pi = _planes(psi)
    rdt = pr.dtype
    grid, spec = _row_grid(v_slice.shape, nplanes=5)
    return pl.pallas_call(
        functools.partial(_transmit_fwd_kernel, sigma=rdt.type(sigma)),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct(v_slice.shape, rdt),
            jax.ShapeDtypeStruct(v_slice.shape, rdt),
        ],
        interpret=interpret,
    )(v_slice.astype(rdt), pr, pi)


def _pallas_transmit_fwd(psi, v_slice, sigma, interpret):
    out = pallas_transmit(psi, v_slice, sigma, interpret)
    return out, (psi, v_slice)


def _pallas_transmit_bwd(sigma, interpret, res, g):
    interpret = _resolve_interpret(interpret)
    psi, v_slice = res
    pr, pi = _planes(psi)
    gr, gi = _planes(g)
    rdt = pr.dtype
    grid, spec = _row_grid(v_slice.shape, nplanes=8)
    dr, di, dv = pl.pallas_call(
        functools.partial(_transmit_bwd_kernel, sigma=rdt.type(sigma)),
        grid=grid,
        in_specs=[spec] * 5,
        out_specs=[spec] * 3,
        out_shape=[
            jax.ShapeDtypeStruct(v_slice.shape, rdt),
            jax.ShapeDtypeStruct(v_slice.shape, rdt),
            jax.ShapeDtypeStruct(v_slice.shape, rdt),
        ],
        interpret=interpret,
    )(v_slice.astype(rdt), pr, pi, gr, gi)
    return _complex(dr, di), dv.astype(v_slice.dtype)


pallas_transmit.defvjp(_pallas_transmit_fwd, _pallas_transmit_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def propagator_multiply(psi_hat, prop, interpret: bool | None = None):
    """psi_hat * P as one fused Pallas pass; P is constant (not diff'ed)."""
    return _cmul(psi_hat, prop, conj_b=False, interpret=interpret)


def _cmul(a, b, conj_b, interpret):
    interpret = _resolve_interpret(interpret)
    ar, ai = _planes(a)
    br, bi = _planes(b)
    rdt = ar.dtype
    grid, spec = _row_grid(ar.shape, nplanes=6)
    cr, ci = pl.pallas_call(
        functools.partial(_cmul_kernel, conj_b=conj_b),
        grid=grid,
        in_specs=[spec] * 4,
        out_specs=[spec] * 2,
        out_shape=[
            jax.ShapeDtypeStruct(ar.shape, rdt),
            jax.ShapeDtypeStruct(ar.shape, rdt),
        ],
        interpret=interpret,
    )(ar, ai, br, bi)
    return _complex(cr, ci)


def _propmul_fwd(psi_hat, prop, interpret):
    return _cmul(psi_hat, prop, conj_b=False, interpret=interpret), prop


def _propmul_bwd(interpret, prop, g):
    # d_psi_hat = g * P (bilinear vjp pairing, see module doc); P gets no
    # cotangent (precomputed constant)
    return (_cmul(g, prop, conj_b=False, interpret=interpret), None)


propagator_multiply.defvjp(_propmul_fwd, _propmul_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pallas_transmit_abs(psi, v_re, v_abs, sigma: float, interpret: bool | None = None):
    """psi * exp(1j*sigma*v_re - sigma*v_abs): absorptive transmission."""
    out_r, out_i = _transmit_abs_fwd(psi, v_re, v_abs, sigma, interpret)
    return _complex(out_r, out_i)


def _transmit_abs_fwd(psi, v_re, v_abs, sigma, interpret):
    interpret = _resolve_interpret(interpret)
    pr, pi = _planes(psi)
    rdt = pr.dtype
    grid, spec = _row_grid(v_re.shape, nplanes=6)
    return pl.pallas_call(
        functools.partial(_transmit_abs_fwd_kernel, sigma=rdt.type(sigma)),
        grid=grid,
        in_specs=[spec] * 4,
        out_specs=[spec] * 2,
        out_shape=[
            jax.ShapeDtypeStruct(v_re.shape, rdt),
            jax.ShapeDtypeStruct(v_re.shape, rdt),
        ],
        interpret=interpret,
    )(v_re.astype(rdt), v_abs.astype(rdt), pr, pi)


def _pallas_transmit_abs_fwd(psi, v_re, v_abs, sigma, interpret):
    return pallas_transmit_abs(psi, v_re, v_abs, sigma, interpret), (
        psi,
        v_re,
        v_abs,
    )


def _pallas_transmit_abs_bwd(sigma, interpret, res, g):
    interpret = _resolve_interpret(interpret)
    psi, v_re, v_abs = res
    pr, pi = _planes(psi)
    gr, gi = _planes(g)
    rdt = pr.dtype
    grid, spec = _row_grid(v_re.shape, nplanes=10)
    dr, di, dvr, dva = pl.pallas_call(
        functools.partial(_transmit_abs_bwd_kernel, sigma=rdt.type(sigma)),
        grid=grid,
        in_specs=[spec] * 6,
        out_specs=[spec] * 4,
        out_shape=[jax.ShapeDtypeStruct(v_re.shape, rdt)] * 4,
        interpret=interpret,
    )(v_re.astype(rdt), v_abs.astype(rdt), pr, pi, gr, gi)
    return _complex(dr, di), dvr.astype(v_re.dtype), dva.astype(v_abs.dtype)


pallas_transmit_abs.defvjp(_pallas_transmit_abs_fwd, _pallas_transmit_abs_bwd)


def pallas_slice_step(psi, v_slice, propagator, sigma, *, interpret: bool | None = None):
    """Drop-in ``slice_step`` for propagate.multislice using Pallas stages.

    psi <- IFFT[ P * FFT[ exp(1j*sigma*V) * psi ] ] with both elementwise
    stages as fused Pallas kernels and the FFTs in XLA.  Complex V routes
    through the absorptive kernel (imaginary part = optical potential), the
    same semantics as propagate.transmit.
    """
    if jnp.iscomplexobj(v_slice):
        psi = pallas_transmit_abs(
            psi, v_slice.real, v_slice.imag, sigma, interpret
        )
    else:
        psi = pallas_transmit(psi, v_slice, sigma, interpret)
    psi_hat = jnp.fft.fft2(psi)
    psi_hat = propagator_multiply(psi_hat, propagator.astype(psi_hat.dtype), interpret)
    return jnp.fft.ifft2(psi_hat)
