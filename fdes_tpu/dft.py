"""2-D FFTs as MXU matmuls (SURVEY.md §7 M6 stretch: XLA-FFT alternative).

XLA's TPU FFT runs on the VPU; at multislice grid sizes (256^2-2048^2) the
MXU can evaluate the same transform as two dense DFT matmuls

    FFT2[X] = F_n @ X @ F_m^T,     F_n[j,k] = exp(-2*pi*i*j*k/n)

at O(N^3) FLOPs instead of O(N^2 log N) — a ~N/log N FLOP overhead that the
systolic array's ~2 orders of magnitude FLOP advantage over the VPU can
absorb.  Which backend wins is measured per grid size on hardware
(benchmarks/run_configs.py --step mxu vs xla); propagate.make_slice_step
ships the winner.

Precision: on TPU a f32 matmul's PRECISION IS A CHOICE — the MXU natively
multiplies bf16 and emulates f32 operands with 1/3/6 bf16 passes
(``jax.lax.Precision`` DEFAULT/HIGH/HIGHEST).  DEFAULT (one pass, ~3e-3
per-op rounding) breaks the 1e-5 exit-wave gate outright, so it is not
offered.  ``make_mxu_slice_step`` pins HIGHEST by default (true-f32
operands + f32 accumulation: the N-term dot accumulates ~sqrt(N)*eps_f32 ~
5e-6 relative at N=2048 — same order as the c64 FFT itself); callers can
drop to HIGH (bf16x3, ~2x fewer MXU passes, ~5e-7 per-op) where a ~1e-5
exit-wave error is acceptable — exposed as the ``mxu_fast`` engine kind in
propagate.make_slice_step and benchmark-selected like every other engine.

Matrices are O(N^2) constants per axis length — 2048^2 c64 is 32 MiB,
built once per grid and reused by every slice of every rollout.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=32)
def _dft_matrix_host(n: int, inverse: bool, dtype_name: str) -> np.ndarray:
    """Host-built (n, n) DFT matrix in f64, cast to dtype (fft2 convention:
    forward unnormalised, inverse carries 1/n)."""
    j = np.arange(n)[:, None]
    k = np.arange(n)[None, :]
    sign = 2.0j if inverse else -2.0j
    f = np.exp(sign * np.pi * j * k / n)
    if inverse:
        f = f / n
    return f.astype(dtype_name)


def dft_matrices(ny: int, nx: int, dtype=jnp.complex64):
    """((Fy, Fx), (Fy_inv, Fx_inv)) HOST numpy constants for fft2_mm.

    Returned as NumPy, not device arrays: a jitted function that closes
    over them embeds them as compile-time constants directly from host
    memory.  Closing over a DEVICE array instead forces a device->host
    readback at trace time — a path some remote TPU runtimes do not
    implement (and a gratuitous transfer everywhere else).
    """
    name = jnp.dtype(dtype).name
    fy = _dft_matrix_host(ny, False, name)
    fx = _dft_matrix_host(nx, False, name)
    fy_i = _dft_matrix_host(ny, True, name)
    fx_i = _dft_matrix_host(nx, True, name)
    return (fy, fx), (fy_i, fx_i)


def fft2_mm(x, fy, fx, precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """fft2(x) as Fy @ x @ Fx^T (leading batch dims broadcast)."""
    # Fx is symmetric (F^T = F) but the explicit transpose documents intent
    # and costs nothing under XLA.
    return jnp.matmul(fy, jnp.matmul(x, fx.T, precision=precision), precision=precision)


def ifft2_mm(x, fy_i, fx_i, precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """ifft2(x) as Fy_inv @ x @ Fx_inv^T."""
    return jnp.matmul(
        fy_i, jnp.matmul(x, fx_i.T, precision=precision), precision=precision
    )


# ---------------------------------------------------------------------------
# Four-step (Bailey) factorized DFT: O(N^2 (N1+N2)) instead of O(N^3)
# ---------------------------------------------------------------------------
#
# The dense matmul-DFT above runs at ~89% of MXU peak (BASELINE.md round 2)
# but pays O(N^3) FLOPs, so the VPU FFT overtakes it at >=1024^2.  The
# classic fix is the four-step factorization: with N = N1*N2,
# n = n1*N2 + n2, k = k2*N1 + k1,
#
#   X[k2*N1+k1] = sum_{n2} [ sum_{n1} A[n1,n2] W_N1^{n1 k1} ]   (matmul F1)
#                 * W_N^{k1 n2}                                  (twiddle)
#                 * W_N2^{n2 k2}                                 (matmul F2)
#
# — two SMALL matmuls + one elementwise twiddle per axis, cutting the MXU
# FLOPs by N/(N1+N2) (~21x at 2048^2, balanced split).  The spectrum lands
# in the digit-split layout D[k1,k2] (logical k = k2*N1+k1); rather than
# transpose it back per step, the slice step PERMUTES THE PROPAGATOR into
# the same layout (a scan-invariant reshape+transpose that XLA's
# loop-invariant code motion hoists out of the slice scan) and the inverse
# four-step consumes D-layout directly, emitting natural row-major order —
# the hot loop is 8 small matmuls + 5 elementwise stages, zero transposes.


def split_radix(n: int) -> tuple[int, int] | None:
    """Balanced (n1, n2) with n1*n2 = n and n1 >= n2, n1 nearest sqrt(n);
    None when n is prime (no useful split — use the dense DFT)."""
    best = None
    d = 1
    while d * d <= n:
        if n % d == 0:
            best = (n // d, d)
        d += 1
    return None if best is None or best[1] == 1 else best


@functools.lru_cache(maxsize=64)
def _four_step_factors_host(
    n: int, n1: int, n2: int, inverse: bool, dtype_name: str
):
    """Host (stage1, twiddle, stage2) f64-built constants for one axis.

    Forward:  D = F1 @ A * T @ F2          (F1 (n1,n1), T (n1,n2), F2 (n2,n2))
    Inverse:  y = G1 @ (D @ G2 * conj(T))  with the 1/n fold in G1.
    """
    if n1 * n2 != n:
        raise ValueError(f"split {n1}x{n2} != {n}")
    sign = 2.0j if inverse else -2.0j
    w1 = np.exp(sign * np.pi * np.arange(n1)[:, None] * np.arange(n1)[None, :] / n1)
    w2 = np.exp(sign * np.pi * np.arange(n2)[:, None] * np.arange(n2)[None, :] / n2)
    tw = np.exp(sign * np.pi * np.arange(n1)[:, None] * np.arange(n2)[None, :] / n)
    if inverse:
        w1 = w1 / n
    return (
        w1.astype(dtype_name),
        tw.astype(dtype_name),
        w2.astype(dtype_name),
    )


def four_step_factors(n: int, split: tuple[int, int] | None = None, dtype=jnp.complex64):
    """((F1, T, F2), (G1, Tc, G2)) HOST constants for one axis of length n.

    NumPy on purpose (see dft_matrices): jit closes over them as
    compile-time constants with no device round-trip.
    """
    n1, n2 = split or (split_radix(n) or (None, None))
    if n1 is None:
        raise ValueError(f"axis length {n} is prime; use the dense DFT")
    name = jnp.dtype(dtype).name
    fwd = _four_step_factors_host(n, n1, n2, False, name)
    inv = _four_step_factors_host(n, n1, n2, True, name)
    return fwd, inv


def fft2_4step(x, fac_y, fac_x, precision=jax.lax.Precision.HIGHEST):
    """2-D DFT of (..., ny, nx) via the four-step factorization.

    Returns the spectrum in DIGIT-SPLIT layout (..., M1, M2, K1, K2) where
    logical ky = ky2*M1 + ky1, kx = kx2*K1 + kx1 (use spectrum_to_natural /
    permute_spectrum to convert).  Matches jnp.fft.fft2 up to layout.
    """
    f1y, ty, f2y = fac_y
    f1x, tx, f2x = fac_x
    m1, m2 = f1y.shape[0], f2y.shape[0]
    k1, k2 = f1x.shape[0], f2x.shape[0]
    lead = x.shape[:-2]
    ny = x.shape[-2]
    # x axis
    r = x.reshape(*lead, ny, k1, k2)
    s = jnp.einsum("pa,...ab->...pb", f1x, r, precision=precision)
    s = s * tx
    s = jnp.einsum("...ab,bq->...aq", s, f2x, precision=precision)
    # y axis
    r = s.reshape(*lead, m1, m2, k1, k2)
    t = jnp.einsum("pa,...abcd->...pbcd", f1y, r, precision=precision)
    t = t * ty[:, :, None, None]
    return jnp.einsum("...abcd,bq->...aqcd", t, f2y, precision=precision)


def ifft2_4step(spec, fac_y_inv, fac_x_inv, precision=jax.lax.Precision.HIGHEST):
    """Inverse of fft2_4step: digit-split spectrum -> natural (..., ny, nx)."""
    g1y, tyc, g2y = fac_y_inv
    g1x, txc, g2x = fac_x_inv
    m1, m2 = g1y.shape[0], g2y.shape[0]
    k1, k2 = g1x.shape[0], g2x.shape[0]
    lead = spec.shape[:-4]
    # y axis (contract ky2 then ky1; output row-major (n1, n2) = natural y)
    e = jnp.einsum("...abcd,bq->...aqcd", spec, g2y, precision=precision)
    e = e * tyc[:, :, None, None]
    e = jnp.einsum("na,...abcd->...nbcd", g1y, e, precision=precision)
    e = e.reshape(*lead, m1 * m2, k1, k2)
    # x axis
    f = jnp.einsum("...ab,bq->...aq", e, g2x, precision=precision)
    f = f * txc
    f = jnp.einsum("na,...ab->...nb", g1x, f, precision=precision)
    return f.reshape(*lead, m1 * m2, k1 * k2)


def permute_spectrum(p, split_y: tuple[int, int], split_x: tuple[int, int]):
    """Natural-layout (ny, nx) spectrum -> fft2_4step's digit-split layout.

    Pure reshape+transpose, so when applied to a scan-invariant array
    (the Fresnel propagator) inside a jitted slice scan, XLA hoists it out
    of the loop (runs once per rollout).
    """
    m1, m2 = split_y
    k1, k2 = split_x
    return p.reshape(m2, m1, k2, k1).transpose(1, 0, 3, 2)


def make_mxu4_slice_step(
    ny: int,
    nx: int,
    dtype=jnp.complex64,
    precision=jax.lax.Precision.HIGHEST,
    split_y: tuple[int, int] | None = None,
    split_x: tuple[int, int] | None = None,
):
    """A propagate.multislice ``slice_step`` using four-step MXU DFTs.

    Same contract as make_mxu_slice_step but O(N^2 (N1+N2)) matmul FLOPs
    instead of O(N^3); the propagator permutation into the digit-split
    spectrum layout happens inside the step on purpose — it is
    scan-invariant and XLA hoists it (module comment above).
    """
    split_y = split_y or split_radix(ny)
    split_x = split_x or split_radix(nx)
    if split_y is None or split_x is None:
        raise ValueError(
            f"grid ({ny}, {nx}) has a prime axis; use kind='mxu' instead"
        )
    fwd_y, inv_y = four_step_factors(ny, split_y, dtype)
    fwd_x, inv_x = four_step_factors(nx, split_x, dtype)

    def step(psi, v_slice, propagator, sigma):
        from .propagate import transmit

        psi = transmit(psi, v_slice, sigma)
        spec = fft2_4step(psi, fwd_y, fwd_x, precision)
        p4 = permute_spectrum(propagator.astype(spec.dtype), split_y, split_x)
        return ifft2_4step(spec * p4, inv_y, inv_x, precision)

    return step


def make_mxu_slice_step(
    ny: int, nx: int, dtype=jnp.complex64, precision=jax.lax.Precision.HIGHEST
):
    """A propagate.multislice ``slice_step`` using MXU matmul FFTs.

    psi <- IDFT[ P * DFT[ exp(1j*sigma*V) * psi ] ] with both transforms as
    dense matmuls; the elementwise stages stay jnp (XLA fuses them into the
    matmul epilogues).  ``precision`` selects the MXU bf16-pass emulation
    tier for the f32 operands (module docstring); HIGHEST = true f32.
    """
    (fy, fx), (fy_i, fx_i) = dft_matrices(ny, nx, dtype)

    def step(psi, v_slice, propagator, sigma):
        from .propagate import transmit

        psi = transmit(psi, v_slice, sigma)
        psi_hat = fft2_mm(psi, fy, fx, precision)
        psi_hat = psi_hat * propagator.astype(psi_hat.dtype)
        return ifft2_mm(psi_hat, fy_i, fx_i, precision)

    return step
