"""HRTEM image formation and detector model (SURVEY.md C11).

I = |IFFT[CTF * FFT[psi_exit]]|^2, then optional detector MTF convolution,
dose scaling and Poisson noise (noise is for synthetic-data generation only
and is OUTSIDE the differentiated path).  All functions are jit/vmap-safe;
a defocus series is a vmap over the stacked CTF (SURVEY.md §7 M2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hrtem_image(psi_exit: jax.Array, ctf: jax.Array) -> jax.Array:
    """One HRTEM intensity image from the exit wave and a complex CTF grid."""
    psi_img = jnp.fft.ifft2(jnp.fft.fft2(psi_exit) * ctf.astype(psi_exit.dtype))
    return jnp.abs(psi_img) ** 2


def hrtem_series(psi_exit: jax.Array, ctf_stack: jax.Array) -> jax.Array:
    """(D, ny, nx) defocus series via vmap over the CTF stack."""
    return jax.vmap(lambda c: hrtem_image(psi_exit, c))(ctf_stack)


def hrtem_incoherent(
    psi_exit: jax.Array, ctf_quad: jax.Array, weights: jax.Array
) -> jax.Array:
    """Explicit partial-coherence image: sum_k w_k |IFFT[CTF_k FFT psi]|^2.

    ctf_quad: (K, ny, nx) coherent quadrature CTFs and (K,) weights from
    optics.ctf_quadrature — exact beyond the linear-imaging regime where the
    closed-form envelopes (optics.envelopes) stop being valid.  One FFT of
    psi is shared across all K nodes.
    """
    spec = jnp.fft.fft2(psi_exit)
    imgs = jax.vmap(
        lambda c: jnp.abs(jnp.fft.ifft2(spec * c.astype(spec.dtype))) ** 2
    )(ctf_quad)
    return jnp.tensordot(weights.astype(imgs.dtype), imgs, axes=1)


def apply_mtf(image: jax.Array, mtf: jax.Array) -> jax.Array:
    """Detector modulation-transfer function: real-space convolution as a
    Fourier multiply. mtf is a real (ny, nx) grid in fft layout."""
    return jnp.fft.ifft2(jnp.fft.fft2(image) * mtf).real


def gaussian_mtf(shape: tuple[int, int], sigma_px: float):
    """Simple Gaussian detector MTF on an fft-layout pixel-frequency grid."""
    import numpy as np

    ny, nx = shape
    fy = np.fft.fftfreq(ny)[:, None]
    fx = np.fft.fftfreq(nx)[None, :]
    return np.exp(-2.0 * (np.pi * sigma_px) ** 2 * (fy * fy + fx * fx))


def add_dose_noise(key: jax.Array, image: jax.Array, dose_per_px: float) -> jax.Array:
    """Poisson shot noise at the given mean dose (counts/pixel), returned in
    the same normalised units as the input image."""
    lam = jnp.clip(image * dose_per_px, 0.0)
    return jax.random.poisson(key, lam).astype(image.dtype) / dose_per_px
