"""Differentiable instrument calibration: fit aberrations from images.

Beyond-reference capability on the reference's own machinery: FDES inverts
the SPECIMEN potential with fixed, known optics (SURVEY.md §3.2, C13); in
practice the instrument parameters (defocus, Cs, astigmatism, coherence)
are themselves uncertain and routinely fitted.  Because this rebuild's
whole forward model is jax-differentiable, the same `value_and_grad` that
recovers V also recovers the OPTICS — the only missing piece was a CTF
built INSIDE jit from traced scalars (optics.py builds its CTFs on the
host in f64 as compile-time constants, which is exact but not
differentiable).  This module provides that traced CTF path and a small
fitting loop.

Conventions match optics.py exactly (chi expansion, envelope forms,
aperture): `chi_device` against `optics.chi_on` is pinned by tests.

Typical use — recover defocus/astigmatism from a through-focus series of
a known specimen (or alternate with `reconstruct` for joint V+optics
refinement):

    params = default_params(defocus=0.0)           # unknown starting point
    fit, losses = fit_instrument(
        psi_exit, i_obs, qy, qx, lam, params,
        defocus_offsets=jnp.asarray(nominal_offsets),
        free=("defocus", "a1", "a1_angle"),
    )
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import optax

#: fittable parameter keys (chi terms as in optics.Aberrations; the
#: reference's C1/C3/C5 + twofold-astigmatism set)
PARAM_KEYS = ("defocus", "cs", "c5", "a1", "a1_angle")


def default_params(**overrides) -> dict:
    """All-zero parameter dict (f32 scalars) with keyword overrides."""
    p = {k: jnp.float32(0.0) for k in PARAM_KEYS}
    for k, v in overrides.items():
        if k not in PARAM_KEYS:
            raise KeyError(f"unknown aberration parameter {k!r}; options {PARAM_KEYS}")
        p[k] = jnp.asarray(v, jnp.float32)
    return p


def chi_device(qy: jax.Array, qx: jax.Array, wavelength_A: float, p: dict) -> jax.Array:
    """Traced chi(q) in rad — the jnp twin of optics.chi_on for the
    C1/C3/C5/A1 subset, differentiable wrt every entry of ``p``."""
    lam = wavelength_A
    q2 = qy * qy + qx * qx
    phase = jnp.pi * lam * p["defocus"] * q2
    phase = phase + 0.5 * jnp.pi * lam**3 * p["cs"] * q2 * q2
    phase = phase + (jnp.pi / 3.0) * lam**5 * p["c5"] * q2 * q2 * q2
    phi = jnp.arctan2(qy, qx)
    phase = phase + jnp.pi * lam * p["a1"] * q2 * jnp.cos(2.0 * (phi - p["a1_angle"]))
    return phase


def ctf_device(
    qy: jax.Array,
    qx: jax.Array,
    wavelength_A: float,
    p: dict,
    *,
    aperture_mask: jax.Array | None = None,
    defocus_spread_A: float = 0.0,
    source_semiangle_rad: float = 0.0,
) -> jax.Array:
    """Traced CTF(q) = A(q) exp(-i chi) E_t E_s (optics.py envelope forms;
    E_s depends on the traced defocus/Cs, so coherence damping is fitted
    consistently with the aberrations)."""
    lam = wavelength_A
    q2 = qy * qy + qx * qx
    ph = chi_device(qy, qx, lam, p)
    ctf = jax.lax.complex(jnp.cos(ph), -jnp.sin(ph))
    if defocus_spread_A > 0.0:
        ctf = ctf * jnp.exp(
            -0.5 * (jnp.pi * lam * defocus_spread_A) ** 2 * q2 * q2
        ).astype(ctf.dtype)
    if source_semiangle_rad > 0.0:
        q = jnp.sqrt(q2)
        grad_chi = p["defocus"] * q + p["cs"] * lam**2 * q2 * q
        ctf = ctf * jnp.exp(
            -((jnp.pi * source_semiangle_rad) ** 2) * grad_chi * grad_chi
        ).astype(ctf.dtype)
    if aperture_mask is not None:
        ctf = ctf * aperture_mask.astype(ctf.dtype)
    return ctf


def hrtem_series_device(
    psi_exit: jax.Array,
    qy: jax.Array,
    qx: jax.Array,
    wavelength_A: float,
    p: dict,
    defocus_offsets: jax.Array,
    **ctf_kwargs,
) -> jax.Array:
    """(D, ny, nx) through-focus intensity series from one exit wave with
    TRACED optics: image d uses defocus p['defocus'] + defocus_offsets[d]
    (the nominal focal steps are known; the common base focus is fitted).
    One FFT of ψ is shared across the series."""
    spec = jnp.fft.fft2(psi_exit)

    def one(off):
        pd = dict(p, defocus=p["defocus"] + off)
        c = ctf_device(qy, qx, wavelength_A, pd, **ctf_kwargs)
        return jnp.abs(jnp.fft.ifft2(spec * c.astype(spec.dtype))) ** 2

    return jax.vmap(one)(defocus_offsets.astype(jnp.float32))


def fit_instrument(
    psi_exit: jax.Array,
    i_obs: jax.Array,
    qy: jax.Array,
    qx: jax.Array,
    wavelength_A: float,
    init: dict,
    *,
    defocus_offsets: jax.Array,
    free: Iterable[str] = ("defocus",),
    iterations: int = 300,
    optimizer: optax.GradientTransformation | None = None,
    **ctf_kwargs,
) -> tuple[dict, jnp.ndarray]:
    """Recover instrument parameters from an observed through-focus series.

    Minimises 0.5*sum((I_sim - I_obs)^2) over the ``free`` parameter subset
    (the rest stay fixed at ``init``) with one jitted, donated update step.
    Returns (fitted full parameter dict, per-iteration losses).
    """
    free = tuple(free)
    unknown = set(free) - set(PARAM_KEYS)
    if unknown:
        raise KeyError(f"unknown free parameters {sorted(unknown)}")
    frozen = {k: v for k, v in init.items() if k not in free}
    # jnp.array (copy), not asarray: the jitted step donates theta, and an
    # aliased caller array in ``init`` would be invalidated by the first
    # iteration (ADVICE.md round 3)
    theta0 = {k: jnp.array(init[k], jnp.float32) for k in free}
    # Default adam, NOT lbfgs: the through-focus loss is oscillatory in
    # defocus (CTF fringes), and lbfgs's zoom linesearch hops between
    # fringe basins (measured: diverges where adam(2.0) converges).
    # with_extra_args_support still lets callers pass linesearch
    # optimizers for warm-started refinement.
    opt = optax.with_extra_args_support(optimizer or optax.adam(1.0))

    def loss_fn(theta, psi_exit, i_obs, offs):
        p = dict(frozen, **theta)
        sim = hrtem_series_device(
            psi_exit, qy, qx, wavelength_A, p, offs, **ctf_kwargs
        )
        r = sim - i_obs
        return 0.5 * jnp.sum(r * r)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(theta, opt_state, psi_exit, i_obs, offs):
        lf = lambda t: loss_fn(t, psi_exit, i_obs, offs)  # noqa: E731
        loss, g = jax.value_and_grad(lf)(theta)
        updates, opt_state = opt.update(
            g, opt_state, theta, value=loss, grad=g, value_fn=lf
        )
        return optax.apply_updates(theta, updates), opt_state, loss

    theta = theta0
    opt_state = jax.jit(opt.init)(theta)
    losses = []
    from .tunnel import fetch_scalar

    for _ in range(iterations):
        theta, opt_state, loss = step(
            theta, opt_state, psi_exit, i_obs, defocus_offsets
        )
        losses.append(fetch_scalar(loss))
    return dict(frozen, **{k: theta[k] for k in free}), jnp.asarray(losses)
