"""Panel-streamed MXU multislice for pod grids (2048^2) — the HBM-staged
four-step transform the round-4 floor analysis called for (VERDICT.md
round-4 item 1; BASELINE.md "The 2048^2 floor").

Why a third kernel family: at 2048^2 one f32 plane is 16 MiB, so no
whole-plane VMEM kernel fits (fused_step/fused_scan cap at 1024^2), and
the XLA VPU FFT runs at a measured ~7% of the HBM roofline (676
slice-props/s, 1,480 us/slice-prop).  The floor analysis: an HBM-staged
MXU transform that touches each plane a bounded number of times per slice
is bandwidth-bound at a few hundred us/slice-prop — 4.7x headroom.  The
two measured MXU failures in this regime (mxu4 small-digit einsums; the
XLA-level radix engine: 153-211 slice-props/s) never staged panels: their
intermediates round-trip whole planes through HBM once per STAGE of the
transform, not once per PASS over the data.

Scheme — the slice loop keeps the field ROW-TRANSFORMED between slices.
Let Fx/Fy be the 1-D mixed-radix transforms of fused_step.py (digit
layout; 2048 = 16 * 128, one in-kernel radix-16 stage + the 128-point
matmul base) applied along lanes/sublanes.  With a_j = Fx(t_j psi_j):

    init  (row panels):  a_0 = Fx(t_0 . psi_0)            [transmit + Fx]
    per slice (col panels): b_j = Fy^H(P_l . Fy(a_j))     [Fy, xP, Fy^H]
    per slice (row panels): a_{j+1} = Fx(t_{j+1} . Fx^H(b_j))
    final (col+row):      psi_S = Fx^H(b_{S-1})

Every pass streams (R, N) row panels or (N, C) column panels through VMEM
(Pallas double-buffers the panel DMA against the in-VMEM butterflies and
base matmuls), so the steady-state HBM traffic per slice is TWO
read+write round trips of the (re, im) plane pair + one read each of V
and P_l: 2*64 + 16 + 32 = 144 MiB ~= 176 us at 819 GB/s — against xla's
measured 1,480 us.  The propagator multiply rides the column pass (P_l
pre-permuted in both axes and 1/N^2-folded, fused_step._prepared_prop),
and the inverse-row + next-transmit + forward-row fusion makes the row
work of two adjacent slices ONE pass.

Square grids, N = r*128 with r in {2, 4, 8, 16, 32}; real V, or
complex absorptive V through damped-transmit kernel variants (forward
whole-loop only — absorptive GRAD falls back per-slice).  The
whole-loop engine (make_panel_scan) is forward-only; GRAD contexts ride
the whole-loop store-s panel adjoint (2+2 passes/slice — 2048^2
value_and_grad 109.8/73.7 ms vs xla 213 at 64 slices; 4096^2 125.5/81.8
vs 361.6; grad-err 1.9e-5/1.26e-4 and 8.3e-6/6.3e-5 certified on chip),
with panel_slice_step (per-slice custom VJP, composes with remat) as the
long-horizon fallback.  The building blocks
(panel_init / panel_colpass / panel_rowpass / panel_final) are
module-level so the streamed forward (potential built on the fly,
panel_streamed — including a panel-staged BUILD) composes with them.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_step import (
    BASE,
    _axis_consts,
    _fft_x,
    _fft_y,
    _prepared_prop,
    _resolve_interpret,
    _tables,
)
from .fused_scan import WholeScanEngine

#: default panel extents (rows per row-panel, lanes per column-panel),
#: MEASURED at 2048^2 x 64 on v5e (tpu_steps.jsonl 2026-08-21):
#: 128-extent panels 1,761 slice-props/s vs 256's 1,673-1,685 and 512's
#: 1,463 — smaller panels pipeline the HBM DMA against compute better,
#: and the (128, r*C) base matmuls still fill the MXU at C=128.  64-lane
#: column panels are INVALID (the f32 lane tile is 128).  Env overrides
#: exist for the tuning benchmark (benchmarks/ panel experiments).
_ROWS = int(os.environ.get("FDES_PANEL_ROWS", "128"))
_COLS = int(os.environ.get("FDES_PANEL_COLS", "128"))


def _row_init_kernel(
    v_ref, pr_ref, pi_ref, twr, twi, fr, fi, or_ref, oi_ref,
    *, sigma, radix, precision,
):
    """(R, N) panel: transmit with V_0, then forward x-transform."""
    phase = sigma * v_ref[:]
    c = jnp.cos(phase)
    s = jnp.sin(phase)
    pr = pr_ref[:]
    pi = pi_ref[:]
    zr = pr * c - pi * s
    zi = pr * s + pi * c
    zr, zi = _fft_x(
        zr, zi, radix, twr[:], twi[:], fr[:], fi[:], precision, adjoint=False
    )
    or_ref[:] = zr
    oi_ref[:] = zi


def _row_mid_kernel(
    v_ref, ar_ref, ai_ref, twr, twi, fr, fi, or_ref, oi_ref,
    *, sigma, radix, precision,
):
    """(R, N) panel: inverse x-transform, transmit with V_{j+1}, forward
    x-transform — the row work of two adjacent slices fused into ONE
    HBM pass (the 1/N^2 inverse scale lives in P_l, so the x-roundtrip
    here is exactly unitary-up-to-layout)."""
    zr, zi = _fft_x(
        ar_ref[:], ai_ref[:], radix, twr[:], twi[:], fr[:], fi[:],
        precision, adjoint=True,
    )
    phase = sigma * v_ref[:]
    c = jnp.cos(phase)
    s = jnp.sin(phase)
    tr = zr * c - zi * s
    ti = zr * s + zi * c
    zr, zi = _fft_x(
        tr, ti, radix, twr[:], twi[:], fr[:], fi[:], precision, adjoint=False
    )
    or_ref[:] = zr
    oi_ref[:] = zi


def _row_mid_stack_kernel(
    j_ref, v_ref, ar_ref, ai_ref, twr, twi, fr, fi, or_ref, oi_ref,
    *, sigma, radix, precision,
):
    """_row_mid_kernel with V panels DMA'd straight out of the full
    (S, n, n) stack via a scalar-prefetched slice index: the lax.scan
    over slices otherwise materialises a dynamic-slice COPY of each
    16 MiB V slice per iteration — a panel_fast trace measured those
    copies at ~15% of the 2048^2 rollout's device time."""
    zr, zi = _fft_x(
        ar_ref[:], ai_ref[:], radix, twr[:], twi[:], fr[:], fi[:],
        precision, adjoint=True,
    )
    phase = sigma * v_ref[0]
    c = jnp.cos(phase)
    s = jnp.sin(phase)
    tr = zr * c - zi * s
    ti = zr * s + zi * c
    zr, zi = _fft_x(
        tr, ti, radix, twr[:], twi[:], fr[:], fi[:], precision, adjoint=False
    )
    or_ref[:] = zr
    oi_ref[:] = zi


def _row_init_abs_kernel(
    vr_ref, vi_ref, pr_ref, pi_ref, twr, twi, fr, fi, or_ref, oi_ref,
    *, sigma, radix, precision,
):
    """_row_init_kernel for ABSORPTIVE complex V: t = exp(-sigma*Vi) *
    exp(i*sigma*Vr) (propagate.transmit's optical-potential channel)."""
    phase = sigma * vr_ref[:]
    damp = jnp.exp(-sigma * vi_ref[:])
    c = damp * jnp.cos(phase)
    s = damp * jnp.sin(phase)
    pr = pr_ref[:]
    pi = pi_ref[:]
    zr = pr * c - pi * s
    zi = pr * s + pi * c
    zr, zi = _fft_x(
        zr, zi, radix, twr[:], twi[:], fr[:], fi[:], precision, adjoint=False
    )
    or_ref[:] = zr
    oi_ref[:] = zi


def _row_mid_stack_abs_kernel(
    j_ref, vr_ref, vi_ref, ar_ref, ai_ref, twr, twi, fr, fi,
    or_ref, oi_ref, *, sigma, radix, precision,
):
    """_row_mid_stack_kernel for ABSORPTIVE complex V (damped transmit),
    V real/imag planes scalar-prefetch-indexed from their stacks."""
    zr, zi = _fft_x(
        ar_ref[:], ai_ref[:], radix, twr[:], twi[:], fr[:], fi[:],
        precision, adjoint=True,
    )
    phase = sigma * vr_ref[0]
    damp = jnp.exp(-sigma * vi_ref[0])
    c = damp * jnp.cos(phase)
    s = damp * jnp.sin(phase)
    tr = zr * c - zi * s
    ti = zr * s + zi * c
    zr, zi = _fft_x(
        tr, ti, radix, twr[:], twi[:], fr[:], fi[:], precision, adjoint=False
    )
    or_ref[:] = zr
    oi_ref[:] = zi


def _row_final_kernel(
    ar_ref, ai_ref, twr, twi, fr, fi, or_ref, oi_ref, *, radix, precision
):
    """(R, N) panel: inverse x-transform only — the exit wave."""
    zr, zi = _fft_x(
        ar_ref[:], ai_ref[:], radix, twr[:], twi[:], fr[:], fi[:],
        precision, adjoint=True,
    )
    or_ref[:] = zr
    oi_ref[:] = zi


def _row_fwd_kernel(
    ar_ref, ai_ref, twr, twi, fr, fi, or_ref, oi_ref, *, radix, precision
):
    """(R, N) panel: forward x-transform only (no transmit) — the
    backward pipeline's entry pass."""
    zr, zi = _fft_x(
        ar_ref[:], ai_ref[:], radix, twr[:], twi[:], fr[:], fi[:],
        precision, adjoint=False,
    )
    or_ref[:] = zr
    oi_ref[:] = zi


def _row_bwd_tail_kernel(
    v_ref, pr_ref, pi_ref, br_ref, bi_ref, twr, twi, fr, fi,
    dr_ref, di_ref, dv_ref, *, sigma, radix, precision,
):
    """(R, N) panels: the backward's FINAL row pass fused with its
    elementwise tail — inverse x-transform of the conj-pipeline output
    (u; bar_s = conj(u)), then bar_psi = bar_s * t and
    bar_V = -sigma*Im(bar_s*t*psi) (fused_step._bwd_kernel's tail) in
    the same panel residency: the per-slice adjoint is 3 passes, like
    the forward."""
    ur, ui = _fft_x(
        br_ref[:], bi_ref[:], radix, twr[:], twi[:], fr[:], fi[:],
        precision, adjoint=True,
    )
    bsr = ur
    bsi = -ui
    phase = sigma * v_ref[:]
    c = jnp.cos(phase)
    s = jnp.sin(phase)
    dr_ref[:] = bsr * c - bsi * s
    di_ref[:] = bsr * s + bsi * c
    pr = pr_ref[:]
    pi = pi_ref[:]
    tpr = pr * c - pi * s
    tpi = pr * s + pi * c
    dv_ref[:] = -sigma * (bsr * tpi + bsi * tpr)


def _col_kernel(
    ar_ref, ai_ref, plr_ref, pli_ref, twr, twi, fr, fi, or_ref, oi_ref,
    *, radix, precision,
):
    """(N, C) panel: forward y-transform, propagator multiply (P_l
    pre-permuted + 1/N^2-folded), inverse y-transform."""
    zr, zi = _fft_y(
        ar_ref[:], ai_ref[:], radix, twr[:], twi[:], fr[:], fi[:],
        precision, adjoint=False,
    )
    plr = plr_ref[:]
    pli = pli_ref[:]
    tr = zr * plr - zi * pli
    ti = zr * pli + zi * plr
    zr, zi = _fft_y(
        tr, ti, radix, twr[:], twi[:], fr[:], fi[:], precision, adjoint=True
    )
    or_ref[:] = zr
    oi_ref[:] = zi


def _compiler_params(ndims: int = 1):
    # panels are independent -> 'parallel' grid semantics (Mosaic may
    # reorder/overlap grid steps; the kernels carry no cross-panel carry)
    sem = os.environ.get("FDES_PANEL_SEMANTICS", "parallel")
    return pltpu.CompilerParams(
        vmem_limit_bytes=96 * 1024 * 1024,
        dimension_semantics=(sem,) * ndims,
    )


def _panel_sizes(n: int):
    rows = min(_ROWS, n)
    cols = min(_COLS, n)
    if cols % 128 or rows % 8:
        raise ValueError(
            f"panel extents ({rows}, {cols}) break the f32 tile: column "
            "panels need a multiple of 128 lanes, row panels a multiple "
            "of 8 sublanes"
        )
    return rows, cols


def _row_specs(n: int, rows: int, nin: int, consts_shapes):
    """BlockSpecs for a row pass: nin (rows, n)-panelled inputs followed
    by the transform tables (whole-array constant blocks)."""
    panel = pl.BlockSpec((rows, n), lambda i: (i, 0))
    const = lambda shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp))  # noqa: E731
    return [panel] * nin + [const(s) for s in consts_shapes], panel


def _col_specs(n: int, cols: int, nin: int, consts_shapes):
    panel = pl.BlockSpec((n, cols), lambda i: (0, i))
    const = lambda shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp))  # noqa: E731
    return [panel] * nin + [const(s) for s in consts_shapes], panel


def _const_shapes(twr, fr):
    return [twr.shape, twr.shape, fr.shape, fr.shape]


def panel_init(v0, psir, psii, tabs, sigma, precision, interpret):
    n = psir.shape[-1]
    rows, _ = _panel_sizes(n)
    r, twr, twi, fr, fi = tabs
    in_specs, panel = _row_specs(n, rows, 3, _const_shapes(twr, fr))
    return pl.pallas_call(
        functools.partial(
            _row_init_kernel, sigma=psir.dtype.type(sigma), radix=r,
            precision=precision,
        ),
        grid=(n // rows,),
        in_specs=in_specs,
        out_specs=[panel] * 2,
        out_shape=[jax.ShapeDtypeStruct((n, n), psir.dtype)] * 2,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(v0, psir, psii, twr, twi, fr, fi)


def panel_colpass(ar, ai, plr, pli, tabs, precision, interpret):
    n = ar.shape[-1]
    _, cols = _panel_sizes(n)
    r, twr, twi, fr, fi = tabs
    in_specs, panel = _col_specs(n, cols, 4, _const_shapes(twr, fr))
    return pl.pallas_call(
        functools.partial(_col_kernel, radix=r, precision=precision),
        grid=(n // cols,),
        in_specs=in_specs,
        out_specs=[panel] * 2,
        out_shape=[jax.ShapeDtypeStruct((n, n), ar.dtype)] * 2,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(ar, ai, plr, pli, twr, twi, fr, fi)


def panel_rowpass_stack(j, v_stack, br, bi, tabs, sigma, precision, interpret):
    """panel_rowpass reading V_{j} straight from the (S, n, n) stack
    (scalar-prefetched index — no per-slice XLA dynamic-slice copy)."""
    n = br.shape[-1]
    rows, _ = _panel_sizes(n)
    r, twr, twi, fr, fi = tabs
    panel = pl.BlockSpec((rows, n), lambda i, j_ref: (i, 0))
    const = lambda shp: pl.BlockSpec(shp, lambda i, j_ref: (0,) * len(shp))  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // rows,),
        in_specs=[
            pl.BlockSpec((1, rows, n), lambda i, j_ref: (j_ref[0], i, 0)),
            panel,
            panel,
            const(twr.shape),
            const(twi.shape),
            const(fr.shape),
            const(fi.shape),
        ],
        out_specs=[panel] * 2,
    )
    return pl.pallas_call(
        functools.partial(
            _row_mid_stack_kernel, sigma=br.dtype.type(sigma), radix=r,
            precision=precision,
        ),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n, n), br.dtype)] * 2,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(jnp.asarray(j, jnp.int32).reshape(1), v_stack, br, bi, twr, twi, fr, fi)


def _panel_init_abs(vr0, vi0, psir, psii, tabs, sigma, precision, interpret):
    n = psir.shape[-1]
    rows, _ = _panel_sizes(n)
    r, twr, twi, fr, fi = tabs
    in_specs, panel = _row_specs(n, rows, 4, _const_shapes(twr, fr))
    return pl.pallas_call(
        functools.partial(
            _row_init_abs_kernel, sigma=psir.dtype.type(sigma), radix=r,
            precision=precision,
        ),
        grid=(n // rows,),
        in_specs=in_specs,
        out_specs=[panel] * 2,
        out_shape=[jax.ShapeDtypeStruct((n, n), psir.dtype)] * 2,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(vr0, vi0, psir, psii, twr, twi, fr, fi)


def _panel_rowpass_stack_abs(
    j, vr_stack, vi_stack, br, bi, tabs, sigma, precision, interpret
):
    n = br.shape[-1]
    rows, _ = _panel_sizes(n)
    r, twr, twi, fr, fi = tabs
    panel = pl.BlockSpec((rows, n), lambda i, j_ref: (i, 0))
    stack = pl.BlockSpec((1, rows, n), lambda i, j_ref: (j_ref[0], i, 0))
    const = lambda shp: pl.BlockSpec(shp, lambda i, j_ref: (0,) * len(shp))  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // rows,),
        in_specs=[
            stack, stack, panel, panel,
            const(twr.shape), const(twi.shape), const(fr.shape), const(fi.shape),
        ],
        out_specs=[panel] * 2,
    )
    return pl.pallas_call(
        functools.partial(
            _row_mid_stack_abs_kernel, sigma=br.dtype.type(sigma), radix=r,
            precision=precision,
        ),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n, n), br.dtype)] * 2,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(
        jnp.asarray(j, jnp.int32).reshape(1), vr_stack, vi_stack, br, bi,
        twr, twi, fr, fi,
    )


def panel_rowpass(v_next, br, bi, tabs, sigma, precision, interpret):
    n = br.shape[-1]
    rows, _ = _panel_sizes(n)
    r, twr, twi, fr, fi = tabs
    in_specs, panel = _row_specs(n, rows, 3, _const_shapes(twr, fr))
    return pl.pallas_call(
        functools.partial(
            _row_mid_kernel, sigma=br.dtype.type(sigma), radix=r,
            precision=precision,
        ),
        grid=(n // rows,),
        in_specs=in_specs,
        out_specs=[panel] * 2,
        out_shape=[jax.ShapeDtypeStruct((n, n), br.dtype)] * 2,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(v_next, br, bi, twr, twi, fr, fi)


def panel_final(br, bi, tabs, precision, interpret):
    n = br.shape[-1]
    rows, _ = _panel_sizes(n)
    r, twr, twi, fr, fi = tabs
    in_specs, panel = _row_specs(n, rows, 2, _const_shapes(twr, fr))
    return pl.pallas_call(
        functools.partial(_row_final_kernel, radix=r, precision=precision),
        grid=(n // rows,),
        in_specs=in_specs,
        out_specs=[panel] * 2,
        out_shape=[jax.ShapeDtypeStruct((n, n), br.dtype)] * 2,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(br, bi, twr, twi, fr, fi)


def panel_rowfwd(ar, ai, tabs, precision, interpret):
    n = ar.shape[-1]
    rows, _ = _panel_sizes(n)
    r, twr, twi, fr, fi = tabs
    in_specs, panel = _row_specs(n, rows, 2, _const_shapes(twr, fr))
    return pl.pallas_call(
        functools.partial(_row_fwd_kernel, radix=r, precision=precision),
        grid=(n // rows,),
        in_specs=in_specs,
        out_specs=[panel] * 2,
        out_shape=[jax.ShapeDtypeStruct((n, n), ar.dtype)] * 2,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(ar, ai, twr, twi, fr, fi)


def _panel_bwd_tail(v, pr, pi, br, bi, tabs, sigma, precision, interpret):
    n = pr.shape[-1]
    rows, _ = _panel_sizes(n)
    r, twr, twi, fr, fi = tabs
    in_specs, panel = _row_specs(n, rows, 5, _const_shapes(twr, fr))
    return pl.pallas_call(
        functools.partial(
            _row_bwd_tail_kernel, sigma=pr.dtype.type(sigma), radix=r,
            precision=precision,
        ),
        grid=(n // rows,),
        in_specs=in_specs,
        out_specs=[panel] * 3,
        out_shape=[jax.ShapeDtypeStruct((n, n), pr.dtype)] * 3,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(v, pr, pi, br, bi, twr, twi, fr, fi)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def panel_slice_step(
    psi, v_slice, propagator, sigma: float, precision=None,
    interpret: bool | None = None,
):
    """One multislice step as three panel passes (transmit+Fx row pass,
    Fy/xP/Fy^H column pass, Fx^H row pass) — the GRAD-capable per-slice
    form of the panel engine for pod grids.

    Composes with lax.scan + remat_chunk exactly like the fused per-slice
    engines; the backward is the same panel pipeline run on conjugated
    planes (fused_step.py's bilinear-vjp algebra) with the elementwise
    tail FUSED into its final row pass, so a value_and_grad slice step is
    3 + 3 panel passes."""
    return _pstep_fwd_only(psi, v_slice, propagator, sigma, precision, interpret)


def _pstep_fwd_only(psi, v_slice, propagator, sigma, precision, interpret):
    n = psi.shape[-1]
    interp = _resolve_interpret(interpret)
    precision = precision or jax.lax.Precision.HIGHEST
    tabs = _tables(n)
    pl_c = _prepared_prop(propagator.astype(psi.dtype), n)
    rdt = jnp.real(psi).dtype
    ar, ai = panel_init(
        v_slice.astype(rdt), jnp.real(psi), jnp.imag(psi), tabs,
        float(sigma), precision, interp,
    )
    br, bi = panel_colpass(
        ar, ai, jnp.real(pl_c), jnp.imag(pl_c), tabs, precision, interp
    )
    outr, outi = panel_final(br, bi, tabs, precision, interp)
    return jax.lax.complex(outr, outi)


def _pstep_fwd(psi, v_slice, propagator, sigma, precision, interpret):
    out = panel_slice_step(psi, v_slice, propagator, sigma, precision, interpret)
    return out, (psi, v_slice, propagator)


def _pstep_bwd(sigma, precision, interpret, res, g):
    psi, v_slice, propagator = res
    n = psi.shape[-1]
    interp = _resolve_interpret(interpret)
    precision = precision or jax.lax.Precision.HIGHEST
    tabs = _tables(n)
    pl_c = _prepared_prop(propagator.astype(psi.dtype), n)
    rdt = jnp.real(psi).dtype
    # bar_s = L^T g = conj(chain_{conj P_l}(conj(g))): the bilinear vjp
    # pairing leaves P_l unconjugated in the NET algebra, which
    # operationally means the conj-sandwiched pipeline runs on the
    # conjugated propagator planes (exactly fused_step._bwd_kernel's
    # `plr, -pli` call)
    ar, ai = panel_rowfwd(jnp.real(g), -jnp.imag(g), tabs, precision, interp)
    br, bi = panel_colpass(
        ar, ai, jnp.real(pl_c), -jnp.imag(pl_c), tabs, precision, interp
    )
    dr, di, dv = _panel_bwd_tail(
        v_slice.astype(rdt), jnp.real(psi), jnp.imag(psi), br, bi, tabs,
        float(sigma), precision, interp,
    )
    return jax.lax.complex(dr, di), dv.astype(v_slice.dtype), None


panel_slice_step.defvjp(_pstep_fwd, _pstep_bwd)


# ---------------------------------------------------------------------------
# Whole-loop panel adjoint (store-s): the 2048^2 inverse on 2+2 passes/slice
#
# The per-slice custom-VJP form costs 3 forward + 3 backward passes per
# slice.  Differentiating the LOOP as one custom_vjp keeps the forward on
# the whole-loop 2-pass structure (the row passes additionally write the
# post-transmit wave s_j = t_j psi_j — adjoint_scan.py's store-s residual,
# dV = -sigma*Im(bar_s * s)) and runs the backward as the transposed loop:
# per slice one column pass (C^T = conj-sandwiched colpass, signs folded
# in-kernel) and one row pass (bar_s extraction + dV + t-multiply +
# forward transform).  Transpose algebra: with symmetric DFT matrices and
# digit permutations Pi, (Pi F)^T = F Pi^-1 = conj(adjoint_op(conj(.))) —
# every conjugation is an in-kernel imag-plane negation, fused by Mosaic.
# ---------------------------------------------------------------------------


def _row_init_store_kernel(
    v_ref, pr_ref, pi_ref, twr, twi, fr, fi, or_ref, oi_ref, sr_ref, si_ref,
    *, sigma, radix, precision,
):
    """_row_init_kernel + store of s_0 = t_0 psi_0 (natural space)."""
    phase = sigma * v_ref[:]
    c = jnp.cos(phase)
    s = jnp.sin(phase)
    pr = pr_ref[:]
    pi = pi_ref[:]
    zr = pr * c - pi * s
    zi = pr * s + pi * c
    sr_ref[:] = zr
    si_ref[:] = zi
    zr, zi = _fft_x(
        zr, zi, radix, twr[:], twi[:], fr[:], fi[:], precision, adjoint=False
    )
    or_ref[:] = zr
    oi_ref[:] = zi


def _row_mid_store_kernel(
    j_ref, v_ref, ar_ref, ai_ref, twr, twi, fr, fi,
    or_ref, oi_ref, sr_ref, si_ref, *, sigma, radix, precision,
):
    """_row_mid_stack_kernel + store of s_j (natural space)."""
    zr, zi = _fft_x(
        ar_ref[:], ai_ref[:], radix, twr[:], twi[:], fr[:], fi[:],
        precision, adjoint=True,
    )
    phase = sigma * v_ref[0]
    c = jnp.cos(phase)
    s = jnp.sin(phase)
    tr = zr * c - zi * s
    ti = zr * s + zi * c
    sr_ref[:] = tr
    si_ref[:] = ti
    zr, zi = _fft_x(
        tr, ti, radix, twr[:], twi[:], fr[:], fi[:], precision, adjoint=False
    )
    or_ref[:] = zr
    oi_ref[:] = zi


def _col_bwd_kernel(
    ar_ref, ai_ref, plr_ref, pli_ref, twr, twi, fr, fi, or_ref, oi_ref,
    *, radix, precision,
):
    """C^T = [F Pi^-1] P_l [Pi conj(F)] on (N, C) panels: the transposed
    column pass, every conjugation an in-kernel sign flip."""
    # Pi conj(F) x = conj(fwd_op(conj x))
    zr, zi = _fft_y(
        ar_ref[:], -ai_ref[:], radix, twr[:], twi[:], fr[:], fi[:],
        precision, adjoint=False,
    )
    zr, zi = zr, -zi
    plr = plr_ref[:]
    pli = pli_ref[:]
    tr = zr * plr - zi * pli
    ti = zr * pli + zi * plr
    # F Pi^-1 y = conj(adjoint_op(conj y))
    zr, zi = _fft_y(
        tr, -ti, radix, twr[:], twi[:], fr[:], fi[:], precision, adjoint=True
    )
    or_ref[:] = zr
    oi_ref[:] = -zi


def _row_bwd_loop_kernel(
    j_ref, v_ref, sr_ref, si_ref, ar_ref, ai_ref, twr, twi, fr, fi,
    or_ref, oi_ref, dv_ref, *, sigma, radix, precision,
):
    """Transposed row pass of slice j: from bar_a_j (digit space) extract
    bar_s = conj(adjoint_op(conj(bar_a))), write dV_j = -sigma*Im(bar_s *
    s_j) (s_j prefetch-indexed from the stored stack), multiply t_j
    (bilinear — no conj), and emit bar_b_{j-1} = conj(fwd_op(conj(.)))."""
    wr, wi = _fft_x(
        ar_ref[:], -ai_ref[:], radix, twr[:], twi[:], fr[:], fi[:],
        precision, adjoint=True,
    )
    bsr = wr
    bsi = -wi
    sr = sr_ref[0]
    si = si_ref[0]
    dv_ref[:] = -sigma * (bsr * si + bsi * sr)
    phase = sigma * v_ref[0]
    c = jnp.cos(phase)
    sn = jnp.sin(phase)
    pr = bsr * c - bsi * sn
    pi = bsr * sn + bsi * c
    yr, yi = _fft_x(
        pr, -pi, radix, twr[:], twi[:], fr[:], fi[:], precision, adjoint=False
    )
    or_ref[:] = yr
    oi_ref[:] = -yi


def _row_bwd_last_kernel(
    v_ref, sr_ref, si_ref, ar_ref, ai_ref, twr, twi, fr, fi,
    dr_ref, di_ref, dv_ref, *, sigma, radix, precision,
):
    """Transpose of the INIT pass (slice 0): bar_s extraction + dV_0 +
    t_0-multiply; the psi0 cotangent leaves in natural space."""
    wr, wi = _fft_x(
        ar_ref[:], -ai_ref[:], radix, twr[:], twi[:], fr[:], fi[:],
        precision, adjoint=True,
    )
    bsr = wr
    bsi = -wi
    sr = sr_ref[:]
    si = si_ref[:]
    dv_ref[:] = -sigma * (bsr * si + bsi * sr)
    phase = sigma * v_ref[:]
    c = jnp.cos(phase)
    sn = jnp.sin(phase)
    dr_ref[:] = bsr * c - bsi * sn
    di_ref[:] = bsr * sn + bsi * c


def _panel_rowpass_init_store(v0, psir, psii, tabs, sigma, precision, interp):
    n = psir.shape[-1]
    rows, _ = _panel_sizes(n)
    r, twr, twi, fr, fi = tabs
    in_specs, panel = _row_specs(n, rows, 3, _const_shapes(twr, fr))
    return pl.pallas_call(
        functools.partial(
            _row_init_store_kernel, sigma=psir.dtype.type(sigma), radix=r,
            precision=precision,
        ),
        grid=(n // rows,),
        in_specs=in_specs,
        out_specs=[panel] * 4,
        out_shape=[jax.ShapeDtypeStruct((n, n), psir.dtype)] * 4,
        compiler_params=_compiler_params(),
        interpret=interp,
    )(v0, psir, psii, twr, twi, fr, fi)


def _panel_rowpass_mid_store(j, v_stack, br, bi, tabs, sigma, precision, interp):
    n = br.shape[-1]
    rows, _ = _panel_sizes(n)
    r, twr, twi, fr, fi = tabs
    panel = pl.BlockSpec((rows, n), lambda i, j_ref: (i, 0))
    const = lambda shp: pl.BlockSpec(shp, lambda i, j_ref: (0,) * len(shp))  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // rows,),
        in_specs=[
            pl.BlockSpec((1, rows, n), lambda i, j_ref: (j_ref[0], i, 0)),
            panel, panel,
            const(twr.shape), const(twi.shape), const(fr.shape), const(fi.shape),
        ],
        out_specs=[panel] * 4,
    )
    return pl.pallas_call(
        functools.partial(
            _row_mid_store_kernel, sigma=br.dtype.type(sigma), radix=r,
            precision=precision,
        ),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n, n), br.dtype)] * 4,
        compiler_params=_compiler_params(),
        interpret=interp,
    )(jnp.asarray(j, jnp.int32).reshape(1), v_stack, br, bi, twr, twi, fr, fi)


def _panel_col_bwd(ar, ai, plr, pli, tabs, precision, interp):
    n = ar.shape[-1]
    _, cols = _panel_sizes(n)
    r, twr, twi, fr, fi = tabs
    in_specs, panel = _col_specs(n, cols, 4, _const_shapes(twr, fr))
    return pl.pallas_call(
        functools.partial(_col_bwd_kernel, radix=r, precision=precision),
        grid=(n // cols,),
        in_specs=in_specs,
        out_specs=[panel] * 2,
        out_shape=[jax.ShapeDtypeStruct((n, n), ar.dtype)] * 2,
        compiler_params=_compiler_params(),
        interpret=interp,
    )(ar, ai, plr, pli, twr, twi, fr, fi)


def _panel_row_bwd_loop(j, v_stack, s_r, s_i, ar, ai, tabs, sigma, precision, interp):
    n = ar.shape[-1]
    rows, _ = _panel_sizes(n)
    r, twr, twi, fr, fi = tabs
    panel = pl.BlockSpec((rows, n), lambda i, j_ref: (i, 0))
    stack = pl.BlockSpec((1, rows, n), lambda i, j_ref: (j_ref[0], i, 0))
    const = lambda shp: pl.BlockSpec(shp, lambda i, j_ref: (0,) * len(shp))  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // rows,),
        in_specs=[
            stack, stack, stack, panel, panel,
            const(twr.shape), const(twi.shape), const(fr.shape), const(fi.shape),
        ],
        out_specs=[panel] * 3,
    )
    return pl.pallas_call(
        functools.partial(
            _row_bwd_loop_kernel, sigma=ar.dtype.type(sigma), radix=r,
            precision=precision,
        ),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n, n), ar.dtype)] * 3,
        compiler_params=_compiler_params(),
        interpret=interp,
    )(
        jnp.asarray(j, jnp.int32).reshape(1), v_stack, s_r, s_i, ar, ai,
        twr, twi, fr, fi,
    )


def _panel_row_bwd_last(v0, s0r, s0i, ar, ai, tabs, sigma, precision, interp):
    n = ar.shape[-1]
    rows, _ = _panel_sizes(n)
    r, twr, twi, fr, fi = tabs
    in_specs, panel = _row_specs(n, rows, 5, _const_shapes(twr, fr))
    return pl.pallas_call(
        functools.partial(
            _row_bwd_last_kernel, sigma=ar.dtype.type(sigma), radix=r,
            precision=precision,
        ),
        grid=(n // rows,),
        in_specs=in_specs,
        out_specs=[panel] * 3,
        out_shape=[jax.ShapeDtypeStruct((n, n), ar.dtype)] * 3,
        compiler_params=_compiler_params(),
        interpret=interp,
    )(v0, s0r, s0i, ar, ai, twr, twi, fr, fi)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _panel_loop_diff(psi0, v_stack, propagator, sigma, precision):
    """Whole-loop panel multislice with the store-s custom VJP."""
    return _run_single(psi0, v_stack, propagator, sigma, precision, None)


def _panel_loop_fwd(psi0, v_stack, propagator, sigma, precision):
    n = psi0.shape[-1]
    interp = _resolve_interpret(None)
    prec = precision or jax.lax.Precision.HIGHEST
    tabs = _tables(n)
    pl_c = _prepared_prop(propagator.astype(psi0.dtype), n)
    plr, pli = jnp.real(pl_c), jnp.imag(pl_c)
    rdt = jnp.real(psi0).dtype
    v_cast = v_stack.astype(rdt)
    s_len = v_cast.shape[0]

    ar, ai, s0r, s0i = _panel_rowpass_init_store(
        v_cast[0], jnp.real(psi0), jnp.imag(psi0), tabs, float(sigma), prec,
        interp,
    )

    def body(carry, j):
        ar, ai = carry
        br, bi = panel_colpass(ar, ai, plr, pli, tabs, prec, interp)
        ar, ai, sr, si = _panel_rowpass_mid_store(
            j, v_cast, br, bi, tabs, float(sigma), prec, interp
        )
        return (ar, ai), (sr, si)

    (ar, ai), (srs, sis) = jax.lax.scan(
        body, (ar, ai), jnp.arange(1, s_len, dtype=jnp.int32)
    )
    br, bi = panel_colpass(ar, ai, plr, pli, tabs, prec, interp)
    outr, outi = panel_final(br, bi, tabs, prec, interp)
    out = jax.lax.complex(outr, outi)
    # s-stack residual: s_0 prepended so index j matches slice j
    s_r = jnp.concatenate([s0r[None], srs], axis=0)
    s_i = jnp.concatenate([s0i[None], sis], axis=0)
    return out, (s_r, s_i, v_cast, propagator)


def _panel_loop_bwd(sigma, precision, res, g):
    s_r, s_i, v_cast, propagator = res
    n = s_r.shape[-1]
    interp = _resolve_interpret(None)
    prec = precision or jax.lax.Precision.HIGHEST
    tabs = _tables(n)
    pl_c = _prepared_prop(propagator.astype(g.dtype), n)
    plr, pli = jnp.real(pl_c), jnp.imag(pl_c)
    s_len = v_cast.shape[0]

    # seed: bar_b_{S-1} = (Fx^H)^T g = conj(fwd_op(conj(g)))
    ar, ai = panel_rowfwd(jnp.real(g), -jnp.imag(g), tabs, prec, interp)
    ai = -ai

    def body(carry, j):
        ar, ai = carry
        cr, ci = _panel_col_bwd(ar, ai, plr, pli, tabs, prec, interp)
        br, bi, dv = _panel_row_bwd_loop(
            j, v_cast, s_r, s_i, cr, ci, tabs, float(sigma), prec, interp
        )
        return (br, bi), dv

    (ar, ai), dvs = jax.lax.scan(
        body, (ar, ai), jnp.arange(s_len - 1, 0, -1, dtype=jnp.int32)
    )
    cr, ci = _panel_col_bwd(ar, ai, plr, pli, tabs, prec, interp)
    dpr, dpi, dv0 = _panel_row_bwd_last(
        v_cast[0], s_r[0], s_i[0], cr, ci, tabs, float(sigma), prec, interp
    )
    # dvs came out in reverse slice order (j = S-1 .. 1)
    dv = jnp.concatenate([dv0[None], dvs[::-1]], axis=0)
    return jax.lax.complex(dpr, dpi), dv.astype(v_cast.dtype), None


_panel_loop_diff.defvjp(_panel_loop_fwd, _panel_loop_bwd)


def make_panel_slice_step(ny: int, nx: int, dtype=jnp.complex64, precision=None):
    """propagate.multislice ``slice_step`` on the panel passes — the
    per-slice grad form (composes with remat; the auto grad path prefers
    the whole-loop store-s engine below when the residual fits)."""
    if ny != nx:
        raise ValueError(f"panel step needs a square grid, got ({ny}, {nx})")
    _axis_consts(ny)

    def step(psi, v_slice, propagator, sigma):
        if jnp.iscomplexobj(v_slice):
            from ..propagate import default_slice_step

            return default_slice_step(psi, v_slice, propagator, sigma)
        return panel_slice_step(
            psi.astype(dtype), v_slice, propagator, sigma, precision
        )

    return step


def make_panel_grad_engine(ny: int, nx: int, dtype=jnp.complex64, precision=None):
    """Grad-capable whole-loop panel engine: the store-s custom VJP
    (2 forward + 2 backward panel passes per slice, s-stack residual)
    when the residual fits the measured HBM budget; the per-slice panel
    VJP with sqrt-S remat otherwise (long horizons), and for complex
    absorptive V or batched waves."""
    if ny != nx:
        raise ValueError(f"panel engine needs a square grid, got ({ny}, {nx})")
    _axis_consts(ny)
    _panel_sizes(ny)

    def _per_slice(psi0, v_stack, propagator, sigma, remat):
        step = make_panel_slice_step(ny, nx, dtype, precision)

        def body(psi, v):
            return step(psi, v, propagator, sigma), None

        def one(p):
            s = v_stack.shape[0]
            if not remat or s % remat:
                return jax.lax.scan(body, p, v_stack)[0]
            chunks = v_stack.reshape(s // remat, remat, *v_stack.shape[1:])

            @jax.checkpoint
            def inner(psi, vc):
                return jax.lax.scan(body, psi, vc)[0]

            return jax.lax.scan(lambda q, c: (inner(q, c), None), p, chunks)[0]

        if psi0.ndim == 3:
            return jax.vmap(one)(psi0)
        return one(psi0)

    def whole_scan(psi0, v_stack, propagator, sigma):
        psi0 = psi0.astype(dtype)
        propagator = propagator.astype(dtype)
        if jnp.iscomplexobj(v_stack) or psi0.ndim == 3:
            return _per_slice(psi0, v_stack, propagator, sigma, None)
        from .adjoint_scan import _STORE_CAP_BYTES

        if v_stack.shape[0] * ny * nx * 8 > _STORE_CAP_BYTES:
            from ..propagate import pick_remat_chunk

            return _per_slice(
                psi0, v_stack, propagator, sigma,
                pick_remat_chunk(v_stack.shape[0]),
            )
        return _panel_loop_diff(
            psi0, v_stack, propagator, float(sigma), precision
        )

    kind = {"bf16x3": "panel_fast", "bf16x1": "panel_draft"}.get(
        precision, "panel"
    )
    return WholeScanEngine(whole_scan, kind, grad_capable=True,
                           precision=precision)


def _run_single(psi0, v_stack, propagator, sigma, precision, interpret):
    n = psi0.shape[-1]
    interp = _resolve_interpret(interpret)
    precision = precision or jax.lax.Precision.HIGHEST
    tabs = _tables(n)
    pl_c = _prepared_prop(propagator.astype(psi0.dtype), n)
    plr, pli = jnp.real(pl_c), jnp.imag(pl_c)
    rdt = jnp.real(psi0).dtype
    sigma = float(sigma)
    v_stack = v_stack.astype(rdt)

    ar, ai = panel_init(
        v_stack[0], jnp.real(psi0), jnp.imag(psi0), tabs, sigma, precision,
        interp,
    )

    def body(carry, j):
        ar, ai = carry
        br, bi = panel_colpass(ar, ai, plr, pli, tabs, precision, interp)
        # V_j panels stream straight from the stack (scalar-prefetched
        # index): scanning over v_stack as xs costs a 16 MiB
        # dynamic-slice COPY per slice (~15% of device time in the
        # panel_fast trace)
        ar, ai = panel_rowpass_stack(
            j, v_stack, br, bi, tabs, sigma, precision, interp
        )
        return (ar, ai), None

    s_len = v_stack.shape[0]
    (ar, ai), _ = jax.lax.scan(
        body, (ar, ai), jnp.arange(1, s_len, dtype=jnp.int32)
    )
    br, bi = panel_colpass(ar, ai, plr, pli, tabs, precision, interp)
    outr, outi = panel_final(br, bi, tabs, precision, interp)
    return jax.lax.complex(outr, outi)


def _run_single_abs(psi0, v_stack, propagator, sigma, precision, interpret):
    """_run_single for ABSORPTIVE complex V: the damped transmit runs in
    the same row kernels (round 5 — complex V previously fell back to the
    xla scan, 3x slower at pod grids)."""
    n = psi0.shape[-1]
    interp = _resolve_interpret(interpret)
    precision = precision or jax.lax.Precision.HIGHEST
    tabs = _tables(n)
    pl_c = _prepared_prop(propagator.astype(psi0.dtype), n)
    plr, pli = jnp.real(pl_c), jnp.imag(pl_c)
    rdt = jnp.real(psi0).dtype
    sigma = float(sigma)
    vr = jnp.real(v_stack).astype(rdt)
    vi = jnp.imag(v_stack).astype(rdt)

    ar, ai = _panel_init_abs(
        vr[0], vi[0], jnp.real(psi0), jnp.imag(psi0), tabs, sigma,
        precision, interp,
    )

    def body(carry, j):
        ar, ai = carry
        br, bi = panel_colpass(ar, ai, plr, pli, tabs, precision, interp)
        ar, ai = _panel_rowpass_stack_abs(
            j, vr, vi, br, bi, tabs, sigma, precision, interp
        )
        return (ar, ai), None

    s_len = vr.shape[0]
    (ar, ai), _ = jax.lax.scan(
        body, (ar, ai), jnp.arange(1, s_len, dtype=jnp.int32)
    )
    br, bi = panel_colpass(ar, ai, plr, pli, tabs, precision, interp)
    outr, outi = panel_final(br, bi, tabs, precision, interp)
    return jax.lax.complex(outr, outi)


def _row_g_kernel(
    g_ref, twr, twi, fr, fi, or_ref, oi_ref, *, radix, precision
):
    """(1, R, N) species delta panel (REAL) -> forward x-transform."""
    zr = g_ref[0]
    zi = jnp.zeros_like(zr)
    zr, zi = _fft_x(
        zr, zi, radix, twr[:], twi[:], fr[:], fi[:], precision, adjoint=False
    )
    or_ref[0] = zr
    oi_ref[0] = zi


def _col_build_kernel(
    ar_ref, ai_ref, ffp_ref, twr, twi, fr, fi, or_ref, oi_ref,
    *, radix, precision, nsp,
):
    """(nsp, N, C) panels: per species forward y-transform x REAL
    pre-permuted + pre-scaled factor panel, accumulated over species,
    then ONE inverse y-transform of the sum — the spectral half of the
    potential build, panel-staged (the rfft2 build's MXU replacement)."""
    accr = None
    acci = None
    for s in range(nsp):
        zr, zi = _fft_y(
            ar_ref[s], ai_ref[s], radix, twr[:], twi[:], fr[:], fi[:],
            precision, adjoint=False,
        )
        ffp = ffp_ref[s]
        zr = zr * ffp
        zi = zi * ffp
        accr = zr if accr is None else accr + zr
        acci = zi if acci is None else acci + zi
    zr, zi = _fft_y(
        accr, acci, radix, twr[:], twi[:], fr[:], fi[:], precision,
        adjoint=True,
    )
    or_ref[:] = zr
    oi_ref[:] = zi


def _row_vfused_kernel(
    vxr_ref, vxi_ref, br_ref, bi_ref, twr, twi, fr, fi, or_ref, oi_ref,
    *, sigma, radix, precision,
):
    """(R, N) panels: finish the potential build (inverse x-transform of
    the V spectrum-x panel, real part) AND the propagation row work
    (inverse x-transform of psi, transmit with the just-built V, forward
    x-transform) in ONE HBM pass — three transforms per panel residency."""
    vr, _ = _fft_x(
        vxr_ref[:], vxi_ref[:], radix, twr[:], twi[:], fr[:], fi[:],
        precision, adjoint=True,
    )
    zr, zi = _fft_x(
        br_ref[:], bi_ref[:], radix, twr[:], twi[:], fr[:], fi[:],
        precision, adjoint=True,
    )
    phase = sigma * vr
    c = jnp.cos(phase)
    s = jnp.sin(phase)
    tr = zr * c - zi * s
    ti = zr * s + zi * c
    zr, zi = _fft_x(
        tr, ti, radix, twr[:], twi[:], fr[:], fi[:], precision, adjoint=False
    )
    or_ref[:] = zr
    oi_ref[:] = zi


def _panel_g_rowpass(g, tabs, precision, interpret):
    nsp, n, _ = g.shape
    rows, _ = _panel_sizes(n)
    r, twr, twi, fr, fi = tabs
    panel = pl.BlockSpec((1, rows, n), lambda s, i: (s, i, 0))
    const = lambda shp: pl.BlockSpec(shp, lambda s, i: (0,) * len(shp))  # noqa: E731
    return pl.pallas_call(
        functools.partial(_row_g_kernel, radix=r, precision=precision),
        grid=(nsp, n // rows),
        in_specs=[panel] + [const(s_) for s_ in _const_shapes(twr, fr)],
        out_specs=[panel] * 2,
        out_shape=[jax.ShapeDtypeStruct((nsp, n, n), g.dtype)] * 2,
        compiler_params=_compiler_params(2),
        interpret=interpret,
    )(g, twr, twi, fr, fi)


def _panel_build_colpass(ar, ai, ffp, tabs, precision, interpret):
    nsp, n, _ = ar.shape
    _, cols = _panel_sizes(n)
    r, twr, twi, fr, fi = tabs
    sp_panel = pl.BlockSpec((nsp, n, cols), lambda i: (0, 0, i))
    panel = pl.BlockSpec((n, cols), lambda i: (0, i))
    const = lambda shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp))  # noqa: E731
    return pl.pallas_call(
        functools.partial(
            _col_build_kernel, radix=r, precision=precision, nsp=nsp
        ),
        grid=(n // cols,),
        in_specs=[sp_panel, sp_panel, sp_panel]
        + [const(s_) for s_ in _const_shapes(twr, fr)],
        out_specs=[panel] * 2,
        out_shape=[jax.ShapeDtypeStruct((n, n), ar.dtype)] * 2,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(ar, ai, ffp, twr, twi, fr, fi)


def _panel_vfused_rowpass(vxr, vxi, br, bi, tabs, sigma, precision, interpret):
    n = br.shape[-1]
    rows, _ = _panel_sizes(n)
    r, twr, twi, fr, fi = tabs
    in_specs, panel = _row_specs(n, rows, 4, _const_shapes(twr, fr))
    return pl.pallas_call(
        functools.partial(
            _row_vfused_kernel, sigma=br.dtype.type(sigma), radix=r,
            precision=precision,
        ),
        grid=(n // rows,),
        in_specs=in_specs,
        out_specs=[panel] * 2,
        out_shape=[jax.ShapeDtypeStruct((n, n), br.dtype)] * 2,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(vxr, vxi, br, bi, twr, twi, fr, fi)


def _permuted_factors(ff_r, n, pixel, rdt):
    """rfft-grid species factors -> FULL-grid, digit-permuted (both axes),
    pre-scaled by inv_area/N^2 — the build col pass's real multiply
    operand.  Hermitian symmetry reconstructs the missing half: the
    factors are real and even in each frequency axis."""
    r = n // BASE
    full = jnp.concatenate(
        [ff_r, ff_r[:, :, 1:-1][:, :, ::-1]], axis=-1
    ).astype(rdt)
    p = full
    if r > 1:
        p = p.reshape(-1, n, BASE, r).transpose(0, 1, 3, 2).reshape(-1, n, n)
        p = p.reshape(-1, BASE, r, n).transpose(0, 2, 1, 3).reshape(-1, n, n)
    scale = 1.0 / (pixel[0] * pixel[1] * n * n)
    return p * rdt.type(scale)


def panel_streamed(
    psi0,
    atoms_xyspw,
    ff_r,
    propagator,
    sigma,
    *,
    shape,
    pixel,
    precision=None,
    interpret=None,
):
    """The config-5 composition (VERDICT.md round-4 items 1+7): potential
    built ON THE FLY per slice AND the panel-staged MXU transform loop —
    including the BUILD's transforms.

    The first measurement of this composition (c5_streamed.jsonl,
    2026-08-21: xla 307 / panel_fast 440 slice-props/s at 2048^2 x 512)
    showed the rfft2-based per-slice build dominating (~75% of the
    streamed panel step), so the build rides the panel pipeline too:
    per slice, scatter the deltas (XLA scatter-add, O(atoms)), forward
    row pass per species (_row_g_kernel), ONE build column pass (per
    species Fy x real pre-permuted factors, accumulate, inverse Fy), and
    a FUSED row pass that finishes the build (inverse Fx, real part) and
    does the propagation row work (inverse Fx of psi, transmit, forward
    Fx) in the same panel residency.  Steady state per slice:
    psi col pass + nsp+1 build passes + 1 fused row pass."""
    from ..potential import scatter_slice_deltas

    n = psi0.shape[-1]
    interp = _resolve_interpret(interpret)
    precision = precision or jax.lax.Precision.HIGHEST
    tabs = _tables(n)
    pl_c = _prepared_prop(propagator.astype(psi0.dtype), n)
    plr, pli = jnp.real(pl_c), jnp.imag(pl_c)
    rdt = jnp.real(psi0).dtype
    sigma = float(sigma)
    x, y, sp, w = atoms_xyspw
    nsp = ff_r.shape[0]
    ffp = _permuted_factors(ff_r, n, pixel, rdt)

    def build_vx(xs, ys, sps, ws):
        """V of one slice in spectrum-x / natural-y panel layout."""
        g = scatter_slice_deltas(
            xs, ys, sps, ws, nspecies=nsp, shape=shape, pixel=pixel, rdt=rdt
        )
        gr, gi = _panel_g_rowpass(g, tabs, precision, interp)
        return _panel_build_colpass(gr, gi, ffp, tabs, precision, interp)

    # slice 0: finish the build to natural space (one extra row pass),
    # then seed the loop with transmit + forward row transform
    vx0r, vx0i = build_vx(x[0], y[0], sp[0], w[0])
    v0, _ = panel_final(vx0r, vx0i, tabs, precision, interp)
    ar, ai = panel_init(
        v0, jnp.real(psi0), jnp.imag(psi0), tabs, sigma, precision, interp
    )

    def body(carry, slice_atoms):
        ar, ai = carry
        br, bi = panel_colpass(ar, ai, plr, pli, tabs, precision, interp)
        vxr, vxi = build_vx(*slice_atoms)
        ar, ai = _panel_vfused_rowpass(
            vxr, vxi, br, bi, tabs, sigma, precision, interp
        )
        return (ar, ai), None

    (ar, ai), _ = jax.lax.scan(
        body, (ar, ai), (x[1:], y[1:], sp[1:], w[1:])
    )
    br, bi = panel_colpass(ar, ai, plr, pli, tabs, precision, interp)
    outr, outi = panel_final(br, bi, tabs, precision, interp)
    return jax.lax.complex(outr, outi)


def make_panel_scan(
    ny: int, nx: int, dtype=jnp.complex64, precision=None
):
    """WholeScanEngine streaming row/column PANELS through VMEM — the
    2048^2 engine (any square N = r*128, r in {2,4,8,16}, divisible by the
    panel extents).

    Forward-only; complex absorptive V runs through damped-transmit
    variants of the row kernels (round 5 — no more xla-scan fallback).
    Batched (B, n, n) waves run as a sequential lax.map — batching was
    measured to HURT at pod grids (xla 676 unbatched vs 330 at b8,
    tpu_steps.jsonl r3: HBM-bound), so the panel engine keeps the HBM
    streams of one wave at a time saturated instead."""
    if ny != nx:
        raise ValueError(f"panel scan needs a square grid, got ({ny}, {nx})")
    _axis_consts(ny)  # validate N = r*128
    rows, cols = _panel_sizes(ny)
    if ny % rows or ny % cols:
        raise ValueError(f"grid {ny} not divisible by panels {rows}/{cols}")

    def whole_scan(psi0, v_stack, propagator, sigma):
        psi0 = psi0.astype(dtype)
        propagator = propagator.astype(dtype)
        sigma = float(sigma)
        run = (
            _run_single_abs if jnp.iscomplexobj(v_stack) else _run_single
        )
        if psi0.ndim == 3:
            return jax.lax.map(
                lambda p: run(p, v_stack, propagator, sigma, precision, None),
                psi0,
            )
        return run(psi0, v_stack, propagator, sigma, precision, None)

    kind = {"bf16x3": "panel_fast", "bf16x1": "panel_draft"}.get(
        precision, "panel"
    )
    return WholeScanEngine(whole_scan, kind, grad_capable=False,
                           precision=precision)
