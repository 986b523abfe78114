"""Fully-fused Pallas slice step: transmit + mixed-radix MXU FFT + Fresnel
multiply + inverse FFT in ONE VMEM-resident kernel (SURVEY.md §7 M6
stretch goal — the Pallas FFT).

Why: at 512^2 the dense matmul-DFT engine (dft.py) is MXU-compute-bound at
~89% of peak, and the XLA-level mixed-radix engine (radix.py) cuts the
matmul FLOPs 4x but loses the win to unfused stack/relayout HBM passes
(measured 2026-08-20: 19.3k vs the theoretical ~50k slice-props/s).  Here
the whole slice step runs on VMEM-resident planes — HBM traffic is one
read of (psi, V) and one write of psi per step, every butterfly/twiddle/
matmul intermediate lives on-chip.

Transform scheme per axis (length N = R * 128, R in {1..8} whole-plane, {16, 32} panel-staged):

    DIF radix-R butterfly + twiddle   (VPU, VMEM-resident)
    128-point DFT as (rows, 128) @ (128, 128) complex matmul
                                      (MXU, full 128-lane utilization)

Spectrum layout and the permuted-propagator trick are radix.py's: position
(q, k1) holds logical k = q + R*k1; the propagator arrives pre-permuted
(and pre-scaled by 1/(ny*nx) — the whole inverse normalisation) so the
in-kernel inverse is the pure conjugate-adjoint chain.

Backward pass: the step is LINEAR in psi after the transmission, and JAX's
complex vjp pairing is bilinear (see pallas/slice_step.py), so

    bar_s = conj( R_inv( P_l * R_fwd( conj(bar_out) ) ) )
    bar_psi = t * bar_s
    bar_V   = -sigma * Im(bar_s * t * psi)

(the propagator is NOT conjugated — the bilinear pairing passes the
cotangent through diag(P) untouched, exactly as slice_step.py's
propagator-multiply backward does).

— the SAME kernel pipeline run on conjugated planes (imag-negation is
free at load/store) with the transmit-cotangent tail fused in.

Square grids with N in {128, 256, 512, 1024}: the transform transients
must fit VMEM (the 16 MiB default cap is raised per-kernel; at 1024^2 —
one in-kernel radix-8 stage per axis, round 4 — the kernel gets nearly
the whole 128 MiB physical VMEM).  2048^2 grids keep the XLA FFT engine
(BASELINE.md engine table).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BASE = 128


@functools.lru_cache(maxsize=16)
def _axis_consts(n: int):
    """Host (R, twiddle_re, twiddle_im, F_re, F_im) for one axis.

    r=16/32 (N=2048/4096) exist for the PANEL-staged engine
    (panel_scan.py), whose per-panel transforms reuse this pipeline; the
    whole-plane kernels (this file, fused_scan.py) cap at 1024 — their
    entry points validate separately."""
    r = n // BASE
    if n != r * BASE or r not in (1, 2, 4, 8, 16, 32):
        raise ValueError(
            f"mixed-radix axis supports N = 128*{{1,2,4,8,16,32}}, got {n}"
        )
    tw = np.exp(
        -2.0j * np.pi * np.arange(r)[:, None] * np.arange(BASE)[None, :] / n
    )
    j = np.arange(BASE)
    f = np.exp(-2.0j * np.pi * j[:, None] * j[None, :] / BASE)
    return (
        r,
        tw.real.astype(np.float32),
        tw.imag.astype(np.float32),
        f.real.astype(np.float32),
        f.imag.astype(np.float32),
    )


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _butterfly(parts, r: int, sign: float):
    """Unscaled radix-2/4/8/16/32 DFT across a list of (re, im) plane
    pairs; sign=-1.0 forward (W4 = -i), +1.0 conjugate/adjoint."""
    if r == 1:
        return parts
    if r == 2:
        (ar, ai), (br, bi) = parts
        return [(ar + br, ai + bi), (ar - br, ai - bi)]
    if r in (8, 16, 32):
        # Even/odd decimation: r-point DFT = two (r/2)-point DFTs + W_r
        # twiddle: X[q] = E[q%h] + W_r^q O[q%h] with W_r^q = cos(2πq/r) +
        # sign·i·sin(2πq/r); W_r^{q+h} = -W_r^q handles the upper half
        # automatically.  Quarter-period q (W = ±1, ±sign·i) are exact
        # add/swaps — no rounded cos/sin constants on those spokes.
        import math

        h = r // 2
        e = _butterfly(parts[0::2], h, sign)
        o = _butterfly(parts[1::2], h, sign)
        out = []
        for q in range(r):
            er, ei = e[q % h]
            orr, oi = o[q % h]
            if q % (r // 4) == 0:
                quarter = q // (r // 4)  # W = 1, sign·i, -1, -sign·i
                if quarter % 2 == 0:
                    tr, ti = orr, oi
                else:
                    tr, ti = -sign * oi, sign * orr
                if quarter >= 2:
                    tr, ti = -tr, -ti
            else:
                c = math.cos(2.0 * math.pi * q / r)
                s = sign * math.sin(2.0 * math.pi * q / r)
                tr = orr * c - oi * s
                ti = orr * s + oi * c
            out.append((er + tr, ei + ti))
        return out
    (ar, ai), (br, bi), (cr, ci), (dr, di) = parts
    s0r, s0i = ar + cr, ai + ci
    s1r, s1i = ar - cr, ai - ci
    s2r, s2i = br + dr, bi + di
    s3r, s3i = br - dr, bi - di
    # (sign*i) * s3
    i3r, i3i = -sign * s3i, sign * s3r
    return [
        (s0r + s2r, s0i + s2i),
        (s1r + i3r, s1i + i3i),
        (s0r - s2r, s0i - s2i),
        (s1r - i3r, s1i - i3i),
    ]


_DOT_DIMS = (((1,), (0,)), ((), ()))


def _split_bf16(x):
    """f32 -> (hi, lo) bf16 planes with x ~= hi + lo (error ~2^-16 rel)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a, b):
    """f32-accurate-to-~1e-7 matmul from 3 single-pass bf16 MXU dots —
    the Precision.HIGH emulation XLA uses, done by hand because Mosaic
    only lowers DEFAULT and HIGHEST dot precisions."""
    ah, al = _split_bf16(a)
    bh, bl = _split_bf16(b)
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=_DOT_DIMS,
        preferred_element_type=jnp.float32,
    )
    return dot(ah, bh) + (dot(ah, bl) + dot(al, bh))


def _cdot(ar, ai, br, bi, precision):
    """Complex matmul on planes: (M, K) @ (K, N).

    precision='bf16x3' (the 'fused_fast' tier): Karatsuba 3-multiply
    complex arithmetic x bf16x3 per real product = 9 single-pass MXU dots.
    precision='bf16x1' (the 'fscan_draft' tier): Karatsuba x ONE bf16 pass
    per real product = 3 dots (~3e-3/op rounding — the mxu_fast accuracy
    class at a third of the MXU passes).
    Otherwise (HIGHEST): 4 true-f32 dots — no Karatsuba, its imaginary-
    part cancellation would cost the accuracy tier a digit.
    """
    if precision == "bf16x1":
        dot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=_DOT_DIMS,
            preferred_element_type=jnp.float32,
        )
        b16 = jnp.bfloat16
        m1 = dot(ar.astype(b16), br.astype(b16))
        m2 = dot(ai.astype(b16), bi.astype(b16))
        m3 = dot((ar + ai).astype(b16), (br + bi).astype(b16))
        return m1 - m2, m3 - m1 - m2
    if precision == "bf16x3":
        m1 = _dot3(ar, br)
        m2 = _dot3(ai, bi)
        m3 = _dot3(ar + ai, br + bi)
        return m1 - m2, m3 - m1 - m2
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=_DOT_DIMS,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return dot(ar, br) - dot(ai, bi), dot(ar, bi) + dot(ai, br)


def _fft_x(zr, zi, r, twr, twi, fr, fi, precision, adjoint: bool):
    """Transform the LAST axis of (ny, N) planes; natural -> digit layout
    (adjoint=False) or layout -> natural (adjoint=True, conj constants
    applied in here — pass the UNCONJUGATED tables).

    Digit blocks are LANE SLICES of the (ny, N) planes and results
    reassemble by lane CONCATENATION — no (ny, r, BASE) stack/reshape
    interleaves, which lower to whole-plane copies (the round-3 radix
    trace measured those at ~47% of engine time; same fix here)."""
    ny, n = zr.shape
    if r == 1:
        if adjoint:
            return _cdot(zr, zi, fr, -fi, precision)
        return _cdot(zr, zi, fr, fi, precision)
    blk = lambda z, q: z[:, q * BASE : (q + 1) * BASE]  # noqa: E731
    if adjoint:
        parts = []
        for q in range(r):
            mr, mi = _cdot(blk(zr, q), blk(zi, q), fr, -fi, precision)
            parts.append(_cmul(mr, mi, twr[q][None, :], -twi[q][None, :]))
        outs = _butterfly(parts, r, +1.0)
    else:
        parts = [(blk(zr, p), blk(zi, p)) for p in range(r)]
        outs = _butterfly(parts, r, -1.0)
        outs = [
            _cmul(pr_, pi_, twr[q][None, :], twi[q][None, :])
            for q, (pr_, pi_) in enumerate(outs)
        ]
        outs = [_cdot(pr_, pi_, fr, fi, precision) for pr_, pi_ in outs]
    return (
        jnp.concatenate([p[0] for p in outs], axis=1),
        jnp.concatenate([p[1] for p in outs], axis=1),
    )


def _fft_y(zr, zi, r, twr, twi, fr, fi, precision, adjoint: bool):
    """Same transform along the FIRST axis of (N, nx) planes.

    The r digit blocks are CONCATENATED along lanes so the base transform
    is ONE (128, 128) @ (128, r*nx) matmul instead of r small ones — the
    MXU runs a single wide dot at full utilization where per-digit dots
    serialized (measured round 3: the per-slice kernel spent most of its
    60 µs/wave-slice outside the dots)."""
    n, nx = zr.shape
    blk = lambda z, q: z[q * BASE : (q + 1) * BASE, :]  # noqa: E731

    def base_wide(parts, conj_f):
        """One wide dot over the lane-concatenated digit blocks."""
        fi_ = -fi if conj_f else fi
        if len(parts) == 1:
            mr, mi = _cdot(fr, fi_, parts[0][0], parts[0][1], precision)
            return [(mr, mi)]
        cr = jnp.concatenate([p[0] for p in parts], axis=1)
        ci = jnp.concatenate([p[1] for p in parts], axis=1)
        mr, mi = _cdot(fr, fi_, cr, ci, precision)
        return [
            (mr[:, q * nx : (q + 1) * nx], mi[:, q * nx : (q + 1) * nx])
            for q in range(len(parts))
        ]

    if adjoint:
        mm = base_wide([(blk(zr, q), blk(zi, q)) for q in range(r)], True)
        parts = [
            _cmul(mr_, mi_, twr[q][:, None], -twi[q][:, None])
            for q, (mr_, mi_) in enumerate(mm)
        ]
        outs = _butterfly(parts, r, +1.0)
    else:
        parts = [(blk(zr, p), blk(zi, p)) for p in range(r)]
        outs = _butterfly(parts, r, -1.0)
        outs = [
            _cmul(pr_, pi_, twr[q][:, None], twi[q][:, None])
            for q, (pr_, pi_) in enumerate(outs)
        ]
        outs = base_wide(outs, False)
    # row-concat == stack(axis=0)+reshape, minus the copies (see _fft_x)
    return (
        jnp.concatenate([p[0] for p in outs], axis=0),
        jnp.concatenate([p[1] for p in outs], axis=0),
    )


def _pipeline(sr, si, plr, pli, consts, precision):
    """VMEM transform pipeline: fwd 2-D FFT, propagator multiply (P already
    permuted + 1/N^2-scaled), inverse 2-D FFT.  Planes in, planes out."""
    r, twr, twi, fr, fi = consts
    sr, si = _fft_x(sr, si, r, twr, twi, fr, fi, precision, adjoint=False)
    sr, si = _fft_y(sr, si, r, twr, twi, fr, fi, precision, adjoint=False)
    sr, si = _cmul(sr, si, plr, pli)
    sr, si = _fft_y(sr, si, r, twr, twi, fr, fi, precision, adjoint=True)
    sr, si = _fft_x(sr, si, r, twr, twi, fr, fi, precision, adjoint=True)
    return sr, si


def _fwd_kernel(
    v_ref, pr_ref, pi_ref, plr_ref, pli_ref, twr_ref, twi_ref, fr_ref, fi_ref,
    or_ref, oi_ref, *, sigma, radix, precision,
):
    phase = sigma * v_ref[:]
    c = jnp.cos(phase)
    s = jnp.sin(phase)
    pr = pr_ref[:]
    pi = pi_ref[:]
    sr = pr * c - pi * s
    si = pr * s + pi * c
    consts = (radix, twr_ref[:], twi_ref[:], fr_ref[:], fi_ref[:])
    sr, si = _pipeline(sr, si, plr_ref[:], pli_ref[:], consts, precision)
    or_ref[:] = sr
    oi_ref[:] = si


def _bwd_kernel(
    v_ref, pr_ref, pi_ref, gr_ref, gi_ref, plr_ref, pli_ref,
    twr_ref, twi_ref, fr_ref, fi_ref,
    dr_ref, di_ref, dv_ref, *, sigma, radix, precision,
):
    # bar_s = conj(pipeline(conj(g))) with the UNCONJUGATED P_l: under
    # JAX's bilinear vjp pairing the cotangent passes through diag(P)
    # untouched (slice_step.py module doc), and conj-fwd/conj-inv swap
    # roles around it: bar_s = F P^-1_pi (P_l . P_pi F* g)/Ntot
    #               = conj( inv(P_l . fwd(conj(g))) ).
    consts = (radix, twr_ref[:], twi_ref[:], fr_ref[:], fi_ref[:])
    ur, ui = _pipeline(
        gr_ref[:], -gi_ref[:], plr_ref[:], -pli_ref[:], consts, precision
    )
    bsr, bsi = ur, -ui
    phase = sigma * v_ref[:]
    c = jnp.cos(phase)
    s = jnp.sin(phase)
    # bar_psi = bar_s * t (bilinear pairing)
    dr_ref[:] = bsr * c - bsi * s
    di_ref[:] = bsr * s + bsi * c
    # bar_V = -sigma * Im(bar_s * t * psi)
    pr = pr_ref[:]
    pi = pi_ref[:]
    tpr = pr * c - pi * s
    tpi = pr * s + pi * c
    dv_ref[:] = -sigma * (bsr * tpi + bsi * tpr)


def _vspec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _params(n):
    # The default Mosaic scoped-vmem cap is 16 MiB; the 512^2 kernel's
    # transient planes need ~24 MiB of stack.  v5e VMEM is 128 MiB —
    # raise the cap for this kernel only (measured to compile and run).
    # 1024^2 planes are 4 MiB each; the transform transients scale with
    # them, so that grid gets (nearly) the whole physical VMEM.
    cap = 120 if n >= 1024 else 96
    return pltpu.CompilerParams(vmem_limit_bytes=cap * 1024 * 1024)


def _resolve_interpret(interpret):
    if interpret is None:
        return jax.default_backend() == "cpu"
    return bool(interpret)


def _prepared_prop(prop, n):
    """Natural (n, n) propagator -> this kernel's digit-split layout,
    scaled by 1/n^2 (the fused inverse transform is the unscaled
    conjugate chain).

    The kernel runs ONE radix-R stage per axis (R = n/128), so spectrum
    index k = q + R*k1 lives at position q*128 + k1.  For R <= 4 this is
    identical to radix.permute_spectrum_radix (radix_plan is single-stage
    there); at 1024 radix.py's plan is two-stage (4, 2) with a different
    digit order, hence the direct form here."""
    r = n // BASE
    p = prop
    if r > 1:
        # x axis: k = k1*r + q -> [.., q, k1]
        p = p.reshape(n, BASE, r).transpose(0, 2, 1).reshape(n, n)
        # y axis: same split on the leading axis
        p = p.reshape(BASE, r, n).transpose(1, 0, 2).reshape(n, n)
    return p * (1.0 / (n * n))


def _tables(n):
    r, twr, twi, fr, fi = _axis_consts(n)
    return r, jnp.asarray(twr), jnp.asarray(twi), jnp.asarray(fr), jnp.asarray(fi)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_slice_step(
    psi, v_slice, propagator, sigma: float, precision=None, interpret: bool | None = None
):
    """One multislice step, fully fused in VMEM (c64 in/out; real V).

    propagator is the NATURAL-layout Fresnel factor; its digit permutation
    and 1/N^2 fold happen outside the kernel (scan-invariant — XLA hoists
    them out of the slice loop)."""
    return _fwd(psi, v_slice, propagator, sigma, precision, interpret)


def _fwd(psi, v_slice, propagator, sigma, precision, interpret):
    n = psi.shape[-1]
    interp = _resolve_interpret(interpret)
    precision = precision or jax.lax.Precision.HIGHEST
    r, twr, twi, fr, fi = _tables(n)
    pl_c = _prepared_prop(propagator.astype(psi.dtype), n)
    rdt = jnp.real(psi).dtype
    outr, outi = pl.pallas_call(
        functools.partial(
            _fwd_kernel, sigma=rdt.type(sigma), radix=r, precision=precision
        ),
        in_specs=[_vspec()] * 9,
        out_specs=[_vspec()] * 2,
        out_shape=[jax.ShapeDtypeStruct((n, n), rdt)] * 2,
        compiler_params=_params(n),
        interpret=interp,
    )(
        v_slice.astype(rdt), jnp.real(psi), jnp.imag(psi),
        jnp.real(pl_c), jnp.imag(pl_c), twr, twi, fr, fi,
    )
    return jax.lax.complex(outr, outi)


def _fused_fwd(psi, v_slice, propagator, sigma, precision, interpret):
    out = fused_slice_step(psi, v_slice, propagator, sigma, precision, interpret)
    return out, (psi, v_slice, propagator)


def _fused_bwd(sigma, precision, interpret, res, g):
    psi, v_slice, propagator = res
    n = psi.shape[-1]
    interp = _resolve_interpret(interpret)
    precision = precision or jax.lax.Precision.HIGHEST
    r, twr, twi, fr, fi = _tables(n)
    pl_c = _prepared_prop(propagator.astype(psi.dtype), n)
    rdt = jnp.real(psi).dtype
    dr, di, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel, sigma=rdt.type(sigma), radix=r, precision=precision
        ),
        in_specs=[_vspec()] * 11,
        out_specs=[_vspec()] * 3,
        out_shape=[jax.ShapeDtypeStruct((n, n), rdt)] * 3,
        compiler_params=_params(n),
        interpret=interp,
    )(
        v_slice.astype(rdt), jnp.real(psi), jnp.imag(psi),
        jnp.real(g), jnp.imag(g),
        jnp.real(pl_c), jnp.imag(pl_c), twr, twi, fr, fi,
    )
    return jax.lax.complex(dr, di), dv.astype(v_slice.dtype), None


fused_slice_step.defvjp(_fused_fwd, _fused_bwd)


def make_fused_slice_step(ny: int, nx: int, dtype=jnp.complex64, precision=None):
    """A propagate.multislice ``slice_step`` on the fused VMEM kernel.

    Square 128/256/512 grids, real V.  Complex (absorptive) V falls back
    to the unfused Pallas path at call time."""
    if ny != nx:
        raise ValueError(f"fused step needs a square grid, got ({ny}, {nx})")
    if ny > 1024:
        raise ValueError(
            "the whole-plane fused kernel cannot hold a 2048^2 plane set in "
            "VMEM (BASELINE.md floor note) — use the panel-staged engine "
            "('panel', pallas/panel_scan.py) or 'xla' there"
        )
    _axis_consts(ny)  # validate size

    def step(psi, v_slice, propagator, sigma):
        if jnp.iscomplexobj(v_slice):
            from .slice_step import pallas_slice_step

            return pallas_slice_step(psi, v_slice, propagator, sigma)
        return fused_slice_step(psi, v_slice, propagator, sigma, precision)

    return step
