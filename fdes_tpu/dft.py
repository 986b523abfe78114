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
