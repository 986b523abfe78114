"""Image-mismatch cost for inverse scattering (SURVEY.md C12, L6).

The reference's cost is the least-squares image mismatch
L = sum_m ||I_sim,m - I_obs,m||^2 computed with CUDA reduction kernels
(SURVEY.md C12).  Here it is one jnp expression inside the differentiated
function; `jax.value_and_grad` replaces the hand-rolled adjoint chain
(SURVEY.md C13, §3.2) exactly — the adjoint-consistency unit tests pin the
equivalence on toy problems.

An optional Tikhonov/TV regulariser on the potential stack covers the
reference's (uncertain, [U?]) C14 regularization row.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2_mismatch(i_sim: jax.Array, i_obs: jax.Array) -> jax.Array:
    """0.5 * sum((I_sim - I_obs)^2), summed over ALL axes -> scalar.

    The 0.5 makes dL/dI = (I_sim - I_obs), matching the reference's error
    wave seed 2*(I-I_obs) up to its missing 1/2 (SURVEY.md §3.2) — the
    constant only rescales the step size.
    """
    r = i_sim - i_obs
    return 0.5 * jnp.sum(r * r)


def poisson_nll(
    i_sim: jax.Array, i_obs: jax.Array, dose: float = 1.0, eps: float = 1e-12
) -> jax.Array:
    """Poisson negative log-likelihood for dose-limited (counting) data.

    Beyond-reference capability (the reference's cost is least-squares
    only, SURVEY.md C12): for images recorded as counts n = Poisson(dose*I)
    the maximum-likelihood mismatch is

        L = sum( dose*I_sim - n*log(dose*I_sim) )          (+ const in n)

    with i_obs given in COUNTS (e.g. imaging.add_dose_noise output when
    dose_per_px scaling was applied, or raw detector counts) and i_sim the
    noise-free model intensity.  eps clamps the log away from I=0 pixels;
    at large dose the curvature matches l2_mismatch weighted by 1/I (the
    usual Gaussian limit), so optimizer step sizes transfer.
    """
    lam = dose * i_sim + eps
    return jnp.sum(lam - i_obs * jnp.log(lam))


def tikhonov(v_stack: jax.Array, weight: float) -> jax.Array:
    """weight * 0.5 * ||V||^2 — ridge regulariser on the potential."""
    return weight * 0.5 * jnp.sum(v_stack * v_stack)


def total_variation(v_stack: jax.Array, weight: float, eps: float = 1e-6) -> jax.Array:
    """Isotropic 3-D total variation (smoothed), periodic differences.

    Promotes piecewise-constant reconstructions; eps keeps the sqrt smooth
    at zero so jax.grad is well-defined everywhere.
    """
    dz = v_stack - jnp.roll(v_stack, 1, axis=0)
    dy = v_stack - jnp.roll(v_stack, 1, axis=1)
    dx = v_stack - jnp.roll(v_stack, 1, axis=2)
    return weight * jnp.sum(jnp.sqrt(dz * dz + dy * dy + dx * dx + eps * eps))


def make_loss(
    forward,
    i_obs: jax.Array | None,
    l2_weight: float = 0.0,
    tv_weight: float = 0.0,
    kind: str = "l2",
    dose: float = 1.0,
):
    """loss(V, *fwd_args) = mismatch(forward(V, *fwd_args), I_obs) + reg.

    ``forward`` is any of the forward.py series functions partially applied
    down to (v_stack, *args) -> images.  ``kind`` selects the data term:
    'l2' (the reference's least-squares) or 'poisson' (counting-statistics
    maximum likelihood; i_obs in counts, ``dose`` the counts-per-unit-
    intensity scale).  Returns a scalar-valued function ready for
    jax.value_and_grad.

    ``i_obs=None`` returns a loss with signature (v, i_obs, *fwd_args):
    the observed data travels as an ARGUMENT instead of a closure.  Use
    this (with reconstruct's ``loss_args``) whenever i_obs is a device
    array — a jitted step that closes over a device array forces a
    trace-time device->host readback, which tunneled TPU runtimes do not
    implement (fdes_tpu/tunnel.py; caught live in round 2).
    """
    if kind not in ("l2", "poisson"):
        raise ValueError(f"unknown loss kind {kind!r}")

    def data_term(v_stack, sim, obs):
        if kind == "poisson":
            data = poisson_nll(sim, obs, dose)
        else:
            data = l2_mismatch(sim, obs)
        if l2_weight:
            data = data + tikhonov(v_stack, l2_weight)
        if tv_weight:
            data = data + total_variation(v_stack, tv_weight)
        return data

    if i_obs is None:

        def loss_fn_arg(v_stack, i_obs, *fwd_args):
            return data_term(v_stack, forward(v_stack, *fwd_args), i_obs)

        return loss_fn_arg

    def loss_fn(v_stack, *fwd_args):
        return data_term(v_stack, forward(v_stack, *fwd_args), i_obs)

    return loss_fn
