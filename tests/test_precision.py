"""Trace-level precision audit of the MXU engines (SURVEY §4 unit tier).

On TPU a f32 matmul's precision is a CHOICE (DEFAULT = one bf16 pass,
~3e-3 per-op rounding) and a single dropped ``precision=`` kwarg silently
degrades an engine by three orders of magnitude ON HARDWARE ONLY — CPU
ignores the flag, so value-comparison tests cannot catch it.  Round 3
found exactly this: the radix engine's adjoint base matmul used the bare
``@`` operator and measured 3e-2 exit error at 512² on the chip while
every CPU test passed (benchmarks/results/tpu_accuracy.jsonl).

This test walks the traced jaxpr of every MXU-matmul engine and asserts
NO dot_general runs at Precision.DEFAULT.
"""

import jax
import jax.extend.core as jex_core
import jax.numpy as jnp
import pytest

from fdes_tpu.propagate import make_slice_step


def _iter_dot_precisions(jaxpr):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "dot_general":
            yield eqn.params.get("precision")
        for v in eqn.params.values():
            for sub in _subjaxprs(v):
                yield from _iter_dot_precisions(sub)


def _subjaxprs(v):
    if isinstance(v, jex_core.ClosedJaxpr):
        yield v.jaxpr
    elif isinstance(v, jex_core.Jaxpr):
        yield v
    elif isinstance(v, (tuple, list)):
        for x in v:
            yield from _subjaxprs(x)


@pytest.mark.parametrize(
    "kind,n,expect",
    [
        ("mxu", 512, jax.lax.Precision.HIGHEST),
        ("mxu_fast", 512, jax.lax.Precision.HIGH),
        ("radix", 512, jax.lax.Precision.HIGHEST),   # single-stage folded path
        ("radix_fast", 512, jax.lax.Precision.HIGH),
        ("radix", 1024, jax.lax.Precision.HIGHEST),  # multi-stage butterfly path
        ("mxu4", 512, jax.lax.Precision.HIGHEST),
    ],
)
def test_engine_dots_never_default_precision(kind, n, expect):
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # mxu4's hardware-loser warning
        step = make_slice_step(kind, shape=(n, n))
    psi = jnp.zeros((n, n), jnp.complex64)
    v = jnp.zeros((n, n), jnp.float32)
    prop = jnp.zeros((n, n), jnp.complex64)
    jaxpr = jax.make_jaxpr(lambda p, vv, pr: step(p, vv, pr, 0.01))(psi, v, prop)
    precisions = list(_iter_dot_precisions(jaxpr.jaxpr))
    assert precisions, f"{kind}: no dot_general found (engine changed?)"
    for p in precisions:
        assert p is not None and jax.lax.Precision.DEFAULT not in tuple(
            p if isinstance(p, (tuple, list)) else (p, p)
        ), f"{kind}@{n}: dot_general at DEFAULT precision (expected {expect})"
        got = tuple(p if isinstance(p, (tuple, list)) else (p, p))
        assert all(x == expect for x in got), (
            f"{kind}@{n}: dot precision {got} != requested {expect}"
        )


def _iter_dots_with_dtypes(jaxpr):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "dot_general":
            yield (
                eqn.params.get("precision"),
                tuple(getattr(v.aval, "dtype", None) for v in eqn.invars),
            )
        for v in eqn.params.values():
            for sub in _subjaxprs(v):
                yield from _iter_dots_with_dtypes(sub)


@pytest.mark.parametrize("seg", [0, 2])
def test_whole_loop_adjoint_dots_never_default_precision(seg):
    """Audit the fscan forward AND backward kernels (both store-s and
    segment-recompute variants) for the round-3 bug class: an f32 dot at
    DEFAULT precision inside a Pallas kernel is invisible to CPU value
    tests and costs three digits on hardware.  Bare-bf16 dots (the
    hand-rolled Karatsuba fast tiers) are exempt — single-pass bf16 IS
    their contract."""
    import numpy as np

    from fdes_tpu.pallas.adjoint_scan import scan_diff_apply

    n = 128
    psi = jnp.zeros((n, n), jnp.complex64)
    v = jnp.zeros((4, n, n), jnp.float32)
    prop = jnp.ones((n, n), jnp.complex64)

    def loss(vv):
        out = scan_diff_apply(psi, vv, prop, 0.01, None, seg=seg)
        return jnp.sum(jnp.real(out) ** 2)

    jaxpr = jax.make_jaxpr(jax.grad(loss))(v)
    dots = list(_iter_dots_with_dtypes(jaxpr.jaxpr))
    assert dots, "no dot_general found in the adjoint path (kernel changed?)"
    bad = []
    for p, dtypes in dots:
        if all(dt == np.dtype("bfloat16") for dt in dtypes if dt is not None):
            continue
        got = tuple(p if isinstance(p, (tuple, list)) else (p, p))
        if any(x in (None, jax.lax.Precision.DEFAULT) for x in got):
            bad.append((p, dtypes))
    assert not bad, f"f32 dots at DEFAULT precision in adjoint kernels: {bad}"
