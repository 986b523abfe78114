"""Mixed-radix MXU FFT: radix-2/4 butterflies + 128-point matmul base.

The dense matmul-DFT (dft.py) runs near MXU peak but pays O(N^3) FLOPs;
the four-step factorization cuts FLOPs but its small-digit contractions
lower to ~3%-utilization convolutions (measured 2026-08-20 — see
BASELINE.md).  This module keeps ONLY matmuls the MXU runs at full
utilization: each axis transform of length N = r_0 * r_1 * ... * 128 is

    DIF radix-r butterfly stages     (VPU adds + twiddle multiplies,
                                      O(N^2 log R) FLOPs, XLA-fused)
    one 128-point DFT matmul         ((128,128) @ (128, big) — the same
                                      full-width shape the dense engine
                                      runs at ~89% of MXU peak)

for O(N^2 * 128) MXU FLOPs per axis instead of O(N^3): 4x fewer at
512^2, 16x at 2048^2.

Layout contract (the permuted-propagator trick, as in dft.py's four-step):
the forward transform emits the spectrum in DIGIT-SPLIT order — position
(q_0, q_1, ..., k_base) holds logical frequency

    k = q_0 + r_0*q_1 + r_0*r_1*q_2 + ... + (r_0*...*r_{m-1})*k_base

(q_s is DIF stage s's output digit, the LSD-first order).  The slice step
permutes the PROPAGATOR into this layout (a scan-invariant
reshape+transpose XLA hoists out of the slice loop) and the inverse
transform — the exact Hermitian adjoint of the forward stages, reversed
and conjugated, with the 1/N fold in the base matrix — consumes the
digit-split layout and emits natural row-major order.  The hot loop has
zero runtime transposes.

Provenance: replaces the reference's cuFFT calls (SURVEY.md C16/C8) on
the TPU's systolic array; the butterfly/twiddle algebra is the standard
decimation-in-frequency Cooley-Tukey factorization.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

BASE = 128  # MXU systolic width: the matmul base transform length


def radix_plan(n: int) -> tuple[int, ...] | None:
    """DIF stage radices (r_0, r_1, ...) with n = prod(r) * 128, preferring
    radix 4 (8 butterfly adds / 4 outputs); None when n is not 128*2^m."""
    if n < BASE or n % BASE:
        return None
    r = n // BASE
    if r & (r - 1):
        return None  # cofactor must be a power of two
    radices = []
    while r >= 4:
        radices.append(4)
        r //= 4
    if r == 2:
        radices.append(2)
    return tuple(radices)


@functools.lru_cache(maxsize=64)
def _axis_constants_host(n: int, dtype_name: str):
    """Host (twiddles, F_base, G_base, G_folded, H_folded) for one axis.

    twiddles[s] has shape (r_s, L_s // r_s) with L_s the sub-transform
    length at stage s: T_s[q, m] = W_{L_s}^{q m}.  G_base = conj(F_base)/n
    (the WHOLE 1/n inverse fold lives here — butterfly/twiddle adjoints
    are pure conjugates).

    For SINGLE-stage plans (n <= 512) the twiddle is folded into per-digit
    base matrices instead: G_folded[q] = diag(tw[q]) @ F_base (right-side
    application), H_folded[q] = conj(G_folded[q]).T / n — one elementwise
    pass and one pre-matmul stack fewer per transform (the twiddle pass
    measured ~15%% of the radix engine's device time at 512^2).
    """
    radices = radix_plan(n)
    if radices is None:
        raise ValueError(f"axis length {n} is not 128 * 2^m")
    tws = []
    length = n
    for r in radices:
        m = length // r
        tw = np.exp(
            -2.0j * np.pi * np.arange(r)[:, None] * np.arange(m)[None, :] / length
        )
        tws.append(tw.astype(dtype_name))
        length = m
    j = np.arange(BASE)
    f = np.exp(-2.0j * np.pi * j[:, None] * j[None, :] / BASE)
    gq = hq = None
    if len(radices) == 1:
        g64 = tws[0].astype(np.complex128)[:, :, None] * f[None, :, :]
        gq = g64.astype(dtype_name)
        hq = (np.conj(np.transpose(g64, (0, 2, 1))) / n).astype(dtype_name)
    return (
        tuple(tws),
        f.astype(dtype_name),
        (np.conj(f) / n).astype(dtype_name),
        gq,
        hq,
    )


def _butterfly(parts: list, radix: int, sign: float):
    """Unscaled radix-2/4 DFT across ``parts`` (a list of equal-shape
    arrays); sign=-1 forward (W = -i), +1 adjoint (conjugate)."""
    if radix == 2:
        a, b = parts
        return [a + b, a - b]
    a, c, b, d = parts[0], parts[2], parts[1], parts[3]
    s0, s1 = a + c, a - c
    s2, s3 = b + d, b - d
    i_s3 = (1j * sign) * s3
    return [s0 + s2, s1 + i_s3, s0 - s2, s1 - i_s3]


def _fft_last_axis(x, c, precision, adjoint: bool):
    """Forward (adjoint=False): natural last axis -> digit-split layout.
    Adjoint=True: digit-split -> natural.

    The last axis is reshaped to (r_0, r_1, ..., 128); butterflies act on
    the leading digits (slice + add — XLA fuses), the base transform is
    one (merged_rows, 128) @ (128, 128) matmul — or, single-stage plans,
    one (rows, 128) @ G_folded[q] matmul per digit with the twiddle
    pre-folded into the matrix (no separate twiddle pass).
    """
    tws, f, g, gq, hq = c
    lead = x.shape[:-1]
    n = x.shape[-1]
    if gq is not None:
        r0 = gq.shape[0]
        r3 = x.reshape(*lead, r0, BASE)
        if adjoint:
            # precision= is LOAD-BEARING: the bare @ operator ran this one
            # matmul at Precision.DEFAULT (single-pass bf16, ~3e-3/op) and
            # silently degraded the whole engine to 3e-2 exit error over 64
            # slices on hardware, invisible on CPU (round-3 tpu_accuracy
            # measurement; the trace-level precision test now pins this).
            parts = [
                jnp.matmul(r3[..., q, :], jnp.asarray(hq[q]), precision=precision)
                for q in range(r0)
            ]
            outs = _butterfly(parts, r0, +1.0)
        else:
            parts = [r3[..., p, :] for p in range(r0)]
            outs = _butterfly(parts, r0, -1.0)
            outs = [
                jnp.matmul(o, jnp.asarray(gq[q]), precision=precision)
                for q, o in enumerate(outs)
            ]
        # concatenate along LANES, not stack+reshape: identical row-major
        # layout (digit-major (q, k_base) flattening) but the profiler
        # showed the stack+reshape pair lowering to explicit whole-plane
        # copies (~47% of the engine's device time, round-3 trace)
        return jnp.concatenate(outs, axis=-1).reshape(*lead, n)
    f_base = g if adjoint else f
    radices = tuple(t.shape[0] for t in tws)
    dims = (*radices, BASE)
    r = x.reshape(*lead, *dims)
    nd = len(dims)

    def stage(r, s):
        axis = r.ndim - nd + s
        parts = [jax.lax.index_in_dim(r, p, axis, keepdims=False) for p in range(radices[s])]
        tw = tws[s].reshape(radices[s], *dims[s + 1 :])
        outs = _butterfly(parts, radices[s], -1.0)
        outs = [o * tw[q] for q, o in zip(range(radices[s]), outs)]
        return jnp.stack(outs, axis=axis)

    if adjoint:
        # base matmul first (contract the 128 axis), then stages reversed
        r = jnp.matmul(r, f_base, precision=precision)
        for s in reversed(range(len(radices))):
            # adjoint of forward stage s: conj-twiddle then conj-butterfly
            axis = r.ndim - nd + s
            tw = tws[s].reshape(radices[s], *dims[s + 1 :])
            parts = [
                jax.lax.index_in_dim(r, p, axis, keepdims=False) * jnp.conj(tw)[p]
                for p in range(radices[s])
            ]
            outs = _butterfly(parts, radices[s], +1.0)
            r = jnp.stack(outs, axis=axis)
        return r.reshape(*lead, n)

    for s in range(len(radices)):
        r = stage(r, s)
    r = jnp.matmul(r, f_base, precision=precision)
    return r.reshape(*lead, n)


def _fft_y_axis(x, c, precision, adjoint: bool):
    """Same transform along axis -2 of (..., ny, nx); nx rides along as
    the trailing block so the base matmul is (128,128) @ (128, nx) batched
    over the leading dims — the proven full-utilization MXU pattern."""
    tws, f, g, gq, hq = c
    lead = x.shape[:-2]
    ny, nx = x.shape[-2:]
    if gq is not None:
        r0 = gq.shape[0]
        r3 = x.reshape(*lead, r0, BASE, nx)
        if adjoint:
            # left-adjoint of G_q^T is conj(G_q) = n * H_q^T
            parts = [
                jnp.einsum(
                    "ij,...jx->...ix",
                    jnp.asarray(np.transpose(hq[q])),
                    r3[..., q, :, :],
                    precision=precision,
                )
                for q in range(r0)
            ]
            outs = _butterfly(parts, r0, +1.0)
        else:
            parts = [r3[..., p, :, :] for p in range(r0)]
            outs = _butterfly(parts, r0, -1.0)
            outs = [
                jnp.einsum(
                    "ij,...jx->...ix",
                    jnp.asarray(np.transpose(gq[q])),
                    o,
                    precision=precision,
                )
                for q, o in enumerate(outs)
            ]
        # concat along rows == stack(axis=-3)+reshape, minus the profiled
        # whole-plane copies (see _fft_last_axis)
        return jnp.concatenate(outs, axis=-2).reshape(*lead, ny, nx)
    f_base = g if adjoint else f
    radices = tuple(t.shape[0] for t in tws)
    dims = (*radices, BASE)
    nd = len(dims) + 1  # + trailing nx
    r = x.reshape(*lead, *dims, nx)

    def fwd_stage(r, s):
        axis = r.ndim - nd + s
        parts = [jax.lax.index_in_dim(r, p, axis, keepdims=False) for p in range(radices[s])]
        tw = tws[s].reshape(radices[s], *dims[s + 1 :], 1)
        outs = _butterfly(parts, radices[s], -1.0)
        outs = [o * tw[q] for q, o in zip(range(radices[s]), outs)]
        return jnp.stack(outs, axis=axis)

    if adjoint:
        r = jnp.einsum("ij,...jx->...ix", f_base, r, precision=precision)
        for s in reversed(range(len(radices))):
            axis = r.ndim - nd + s
            tw = tws[s].reshape(radices[s], *dims[s + 1 :], 1)
            parts = [
                jax.lax.index_in_dim(r, p, axis, keepdims=False) * jnp.conj(tw)[p]
                for p in range(radices[s])
            ]
            outs = _butterfly(parts, radices[s], +1.0)
            r = jnp.stack(outs, axis=axis)
        return r.reshape(*lead, ny, nx)

    for s in range(len(radices)):
        r = fwd_stage(r, s)
    r = jnp.einsum("ij,...jx->...ix", f_base, r, precision=precision)
    return r.reshape(*lead, ny, nx)


def axis_constants(n: int, dtype=jnp.complex64):
    """(twiddles, F_base, G_base) HOST constants for one axis (NumPy on
    purpose — jit embeds them with no device round-trip, dft.py rationale)."""
    return _axis_constants_host(n, jnp.dtype(dtype).name)


def fft2_radix(x, cy, cx, precision=jax.lax.Precision.HIGHEST):
    """2-D FFT of (..., ny, nx), BOTH axes in digit-split layout (module
    docstring).  Matches jnp.fft.fft2 up to the per-axis permutation."""
    x = _fft_last_axis(x, cx, precision, adjoint=False)
    return _fft_y_axis(x, cy, precision, adjoint=False)


def ifft2_radix(spec, cy, cx, precision=jax.lax.Precision.HIGHEST):
    """Inverse of fft2_radix: digit-split spectrum -> natural (..., ny, nx)."""
    spec = _fft_y_axis(spec, cy, precision, adjoint=True)
    return _fft_last_axis(spec, cx, precision, adjoint=True)


def digit_permutation(n: int) -> np.ndarray:
    """perm with layout_position -> logical frequency: layout flat index p
    (over dims (r_0, ..., r_{m-1}, 128), row-major) holds logical
    k = q_0 + r_0 q_1 + ... + (prod r) * k_base."""
    radices = radix_plan(n)
    dims = (*radices, BASE)
    k = np.zeros(dims, dtype=np.int64)
    scale = 1
    for axis, r in enumerate(radices):
        idx = np.arange(r).reshape((r,) + (1,) * (len(dims) - axis - 1))
        k = k + scale * idx
        scale *= r
    k = k + scale * np.arange(BASE).reshape((1,) * len(radices) + (BASE,))
    return k.reshape(-1)


def permute_spectrum_radix(p, ny: int, nx: int):
    """Natural (ny, nx) spectrum -> fft2_radix's digit-split layout.

    Pure reshape+transpose (the digit-split order is a digit reversal:
    natural k = q_0 + r_0 q_1 + ... + prod(r) k_base means
    p.reshape(128, r_{m-1}, ..., r_0) indexes [k_base, q_{m-1}, ..., q_0]),
    so on a scan-invariant propagator XLA's loop-invariant code motion
    hoists it out of the slice loop."""
    ry = radix_plan(ny)
    rx = radix_plan(nx)
    my, mx = len(ry), len(rx)
    shape = (BASE, *reversed(ry), BASE, *reversed(rx))
    axes_y = tuple(range(my, -1, -1))  # (q_0, ..., q_{m-1}, k_base)
    axes_x = tuple(range(my + mx + 1, my, -1))
    return p.reshape(shape).transpose(*axes_y, *axes_x).reshape(ny, nx)


def make_radix_slice_step(
    ny: int,
    nx: int,
    dtype=jnp.complex64,
    precision=jax.lax.Precision.HIGHEST,
):
    """A propagate.multislice ``slice_step`` on mixed-radix MXU FFTs.

    Same contract as dft.make_mxu_slice_step with O(N^2 * 128) MXU FLOPs
    per axis; requires both axes = 128 * 2^m (radix_plan)."""
    if radix_plan(ny) is None or radix_plan(nx) is None:
        raise ValueError(
            f"grid ({ny}, {nx}) needs axes of 128 * 2^m for the radix engine"
        )
    cy = axis_constants(ny, dtype)
    cx = axis_constants(nx, dtype)

    def step(psi, v_slice, propagator, sigma):
        from .propagate import transmit

        psi = transmit(psi, v_slice, sigma)
        spec = fft2_radix(psi, cy, cx, precision)
        # scan-invariant reshape+transpose: hoisted out of the slice loop
        p4 = permute_spectrum_radix(propagator.astype(spec.dtype), ny, nx)
        return ifft2_radix(spec * p4, cy, cx, precision)

    return step
