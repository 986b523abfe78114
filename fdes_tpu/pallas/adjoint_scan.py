"""Differentiable whole-loop multislice: the adjoint of pallas/fused_scan
as a second whole-loop Pallas kernel (VERDICT.md round-3 next-round item 1).

Round 3 left the inverse problem on the slowest engine class: the fscan
kernels win every forward tier but are forward-only by construction, so
`value_and_grad` (the contract's headline *reconstruction* metric,
BASELINE.json config 3) still rode the per-slice engines.  The adjoint of
the multislice loop is itself a conjugate multislice recursion
(SURVEY.md §3.2):

    bar_s_j   = F^H ( conj-pass ) applied to bar_psi_{j+1}   (linear part)
    bar_V_j   = -sigma * Im(bar_s_j * t_j * psi_j)           (needs psi_j)
    bar_psi_j = t_j * bar_s_j                                (bilinear vjp)

— exactly the computation the whole-loop kernel already does, run on
conjugated planes.  The only obstacle is psi_j: the forward kernel keeps
psi VMEM-resident and never stores per-slice waves.  Segment-checkpointed
recompute solves it the way jax.checkpoint would, but in-kernel:

  * FORWARD (only under differentiation, via jax.custom_vjp — the primal
    path pays nothing): the fused scan additionally writes psi to HBM
    every K slices (S/K extra plane-pair writes; K ~ sqrt-S-class).
  * BACKWARD: one kernel, grid (nseg, B) with batch INNERMOST.  Per grid
    step it re-runs its K-slice segment forward in VMEM from the
    checkpoint (storing the K intermediate waves in scratch), then runs
    the conjugate recursion in reverse.  bar_psi carries across segments
    in persistent VMEM scratch (scratch outlives grid steps); dL/dV
    accumulates into a per-segment output block whose revisits along the
    inner batch axis are contiguous — the standard Pallas accumulation
    pattern.  Per whole backward, V and dV cross HBM once each (not once
    per wave): the segment's V block is resident across the batch sweep.

Cost per backward grid step: K recompute pipelines + K adjoint pipelines,
so a value_and_grad step is ~3x the forward's MXU work — against the
per-slice grad engines' per-slice HBM round-trips plus XLA-level remat
recompute.

Complex cotangent convention: JAX's vjp pairing is BILINEAR (the transpose
of the jvp with no conjugation — see pallas/slice_step.py's module doc,
pinned there against jnp autodiff), so the propagator multiply passes the
cotangent through diag(P_l) UNTOUCHED and the per-slice recursion above
matches pallas/fused_step.py's _bwd_kernel exactly.

The propagator is treated as non-differentiable (None cotangent), the same
contract as the per-slice fused engines.  sigma is a static host float.
Square grids with N in {128, 256, 512} (fused_step.py VMEM budget).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_step import (
    _params,
    _pipeline,
    _prepared_prop,
    _resolve_interpret,
    _tables,
)

#: max checkpoint segment length per grid size: 2K psi planes live in
#: scratch during the backward recompute (plus the K-plane V and dV
#: blocks), bounded by the ~96 MiB scoped-VMEM budget at 512^2.
#: The 1024 entry is DEAD for execution: the segment-recompute backward
#: overflows VMEM at 1024^2 even with seg=1 (measured Mosaic overflow, r4
#: campaign — block set + radix-8 adjoint spills), so scan_diff_apply
#: rejects every seg>0 there and only the store-s backward (seg=0) runs;
#: the entry exists so pick_seg stays total for the rejection path's
#: error message (ADVICE.md round 4).
_SEG_CAP = {128: 16, 256: 16, 512: 8, 1024: 1}
#: max native wave batch per grid size: the backward carries bar_psi for
#: every batch element in persistent scratch (2B planes).  The store-s
#: backward has no recompute scratch, so its cap is looser at 512².
_BATCH_CAP = {128: 64, 256: 32, 512: 4, 1024: 1}
_BATCH_CAP_STORE = {128: 64, 256: 32, 512: 16, 1024: 1}
#: store-s residual budget: above this the adjoint switches from the
#: store-every-slice backward to segment-checkpointed recompute.
#: MEASURED, not guessed (VERDICT r4 weak 3): the round-5 switchover
#: sweep (benchmarks/results/adjoint_sweep.jsonl, v5e 2026-08-21) ran
#: both backwards at 512^2 across horizons 64-512 and batches 1-64 —
#: store-s wins EVERY cell, by 1.26-1.5x, up to the largest measured
#: 8 GiB residual (b64 chunked: 354 ms vs segment-b16-extrapolated
#: ~530): the 3x recompute always costs more than the extra HBM
#: traffic on this chip.  8 GiB = half of v5e HBM is the practical
#: ceiling (residual + V/grad/opt buffers must coexist); segment
#: recompute remains the beyond-budget and explicit-seg fallback.
_STORE_CAP_BYTES = 8 * 1024 ** 3


def pick_seg(nslices: int, n: int) -> int:
    """Largest divisor of nslices within the grid's VMEM segment cap."""
    cap = _SEG_CAP[n]
    best = 1
    for d in range(1, min(cap, nslices) + 1):
        if nslices % d == 0:
            best = d
    return best


def _ck_kernel(
    v_ref, pr_ref, pi_ref, plr_ref, pli_ref, twr_ref, twi_ref, fr_ref, fi_ref,
    or_ref, oi_ref, ckr_ref, cki_ref, *, sigma, radix, precision, seg,
):
    """fused_scan._scan_kernel + a checkpoint write of the INCOMING wave
    at every segment start (the value the backward recomputes from)."""
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        or_ref[0] = pr_ref[0]
        oi_ref[0] = pi_ref[0]

    @pl.when(s % seg == 0)
    def _snap():
        ckr_ref[0, 0] = or_ref[0]
        cki_ref[0, 0] = oi_ref[0]

    zr = or_ref[0]
    zi = oi_ref[0]
    phase = sigma * v_ref[0]
    c = jnp.cos(phase)
    sn = jnp.sin(phase)
    sr = zr * c - zi * sn
    si = zr * sn + zi * c
    consts = (radix, twr_ref[:], twi_ref[:], fr_ref[:], fi_ref[:])
    sr, si = _pipeline(sr, si, plr_ref[:], pli_ref[:], consts, precision)
    or_ref[0] = sr
    oi_ref[0] = si


def _bwd_scan_kernel(
    v_ref, ckr_ref, cki_ref, gr_ref, gi_ref, plr_ref, pli_ref,
    twr_ref, twi_ref, fr_ref, fi_ref,
    dvr_ref, dpr_ref, dpi_ref,
    cr_ref, ci_ref, *sk,
    sigma, radix, precision, seg, nseg,
):
    """One K-slice segment of the conjugate recursion, batch innermost.

    Segments run last-to-first (index maps reverse the grid axis); within
    a segment: forward recompute from the checkpoint into (skr, ski)
    scratch, then the reverse sweep updating the per-batch bar_psi carry
    (cr, ci) and accumulating dV.  seg == 1 skips the recompute scratch
    entirely and reads psi straight from the checkpoint block (the 4 MiB
    planes at 1024^2 need every VMEM byte — measured Mosaic overflow)."""
    i = pl.program_id(0)
    b = pl.program_id(1)
    consts = (radix, twr_ref[:], twi_ref[:], fr_ref[:], fi_ref[:])
    plr = plr_ref[:]
    pli = pli_ref[:]

    @pl.when(i == 0)
    def _init_carry():
        cr_ref[b] = gr_ref[0]
        ci_ref[b] = gi_ref[0]

    @pl.when(b == 0)
    def _zero_dv():
        dvr_ref[:] = jnp.zeros(dvr_ref.shape, dvr_ref.dtype)

    if seg > 1:
        skr_ref, ski_ref = sk
        # forward recompute: skr[k] holds psi_k (the wave ENTERING slice
        # k of this segment), k = 0..seg-1
        skr_ref[0] = ckr_ref[0, 0]
        ski_ref[0] = cki_ref[0, 0]

        def fwd_body(k, _):
            zr = skr_ref[k - 1]
            zi = ski_ref[k - 1]
            phase = sigma * v_ref[k - 1]
            c = jnp.cos(phase)
            sn = jnp.sin(phase)
            sr = zr * c - zi * sn
            si = zr * sn + zi * c
            sr, si = _pipeline(sr, si, plr, pli, consts, precision)
            skr_ref[k] = sr
            ski_ref[k] = si
            return 0

        jax.lax.fori_loop(1, seg, fwd_body, 0)

        def read_psi(k):
            return skr_ref[k], ski_ref[k]

    else:

        def read_psi(k):
            del k
            return ckr_ref[0, 0], cki_ref[0, 0]

    def bwd_body(t, _):
        k = seg - 1 - t
        br = cr_ref[b]
        bi = ci_ref[b]
        # bar_s = conj( pipeline(conj(bar)) with conj P_l ) — the bilinear
        # pairing passes the cotangent through diag(P_l) untouched
        # (fused_step._bwd_kernel's identity, reused verbatim)
        ur, ui = _pipeline(br, -bi, plr, -pli, consts, precision)
        bsr = ur
        bsi = -ui
        phase = sigma * v_ref[k]
        c = jnp.cos(phase)
        sn = jnp.sin(phase)
        pr_, pi_ = read_psi(k)
        tpr = pr_ * c - pi_ * sn
        tpi = pr_ * sn + pi_ * c
        # bar_V = -sigma * Im(bar_s * t * psi)
        dvr_ref[k] += -sigma * (bsr * tpi + bsi * tpr)
        # bar_psi = t * bar_s
        cr_ref[b] = bsr * c - bsi * sn
        ci_ref[b] = bsr * sn + bsi * c
        return 0

    jax.lax.fori_loop(0, seg, bwd_body, 0)

    @pl.when(i == nseg - 1)
    def _final():
        # after segment 0 the carry IS bar_psi0; earlier flushes of this
        # block hold stale data but the last flush (this one) wins
        dpr_ref[0] = cr_ref[b]
        dpi_ref[0] = ci_ref[b]


def _sfwd_kernel(
    v_ref, pr_ref, pi_ref, plr_ref, pli_ref, twr_ref, twi_ref, fr_ref, fi_ref,
    or_ref, oi_ref, sr_ref, si_ref, *, sigma, radix, precision,
):
    """Forward-under-differentiation, store-s variant: writes the
    POST-TRANSMIT wave s_j = t_j psi_j for EVERY slice (2 planes/slice to
    HBM).  dV needs exactly Im(bar_s * s) and bar_psi needs only t (a
    cos/sin of the streamed V), so the backward then runs ONE adjoint
    pipeline per slice with zero recompute — value_and_grad costs ~2x the
    forward instead of 3x (segment-recompute path)."""
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        or_ref[0] = pr_ref[0]
        oi_ref[0] = pi_ref[0]

    zr = or_ref[0]
    zi = oi_ref[0]
    phase = sigma * v_ref[0]
    c = jnp.cos(phase)
    sn = jnp.sin(phase)
    sr = zr * c - zi * sn
    si = zr * sn + zi * c
    sr_ref[0, 0] = sr
    si_ref[0, 0] = si
    consts = (radix, twr_ref[:], twi_ref[:], fr_ref[:], fi_ref[:])
    sr, si = _pipeline(sr, si, plr_ref[:], pli_ref[:], consts, precision)
    or_ref[0] = sr
    oi_ref[0] = si


def _bwd_store_kernel(
    v_ref, ssr_ref, ssi_ref, gr_ref, gi_ref, plr_ref, pli_ref,
    twr_ref, twi_ref, fr_ref, fi_ref,
    dvr_ref, dpr_ref, dpi_ref,
    *sk,
    sigma, radix, precision, nslices,
):
    """Store-s backward: grid (S, B) with slices last-to-first, batch
    innermost; one adjoint pipeline per step, s_j streamed from HBM.

    Conjugate convention (VMEM-temp elimination): gi arrives PRE-NEGATED
    (-Im g), pli PRE-NEGATED (-Im P_l), the carry holds conj(bar_psi),
    and the dpi output is -Im(bar_psi0) — the driver flips it back.

    With scratch refs (B > 1) the carry lives per batch element in
    persistent scratch; WITHOUT them (B == 1, the 1024^2 case) the carry
    lives in the dp OUTPUT block itself (index-constant -> VMEM-resident,
    the same out-block-carry pattern the forward kernel uses) — saving
    the 2-plane scratch that put 1024^2 424 KB over physical VMEM."""
    i = pl.program_id(0)
    b = pl.program_id(1)
    consts = (radix, twr_ref[:], twi_ref[:], fr_ref[:], fi_ref[:])
    if sk:
        cr_ref, ci_ref = sk
        idx = b
    else:
        cr_ref, ci_ref = dpr_ref, dpi_ref
        idx = 0

    @pl.when(i == 0)
    def _init_carry():
        cr_ref[idx] = gr_ref[0]
        ci_ref[idx] = gi_ref[0]

    @pl.when(b == 0)
    def _zero_dv():
        dvr_ref[:] = jnp.zeros(dvr_ref.shape, dvr_ref.dtype)

    br = cr_ref[idx]
    nbi = ci_ref[idx]  # = -bar_i
    ur, ui = _pipeline(br, nbi, plr_ref[:], pli_ref[:], consts, precision)
    bsr = ur
    nbsi = ui  # = -bar_s_i
    # bar_V = -sigma * Im(bar_s * s)  (s = t*psi, stored by the forward)
    sr = ssr_ref[0, 0]
    si = ssi_ref[0, 0]
    dvr_ref[0] += sigma * (nbsi * sr - bsr * si)
    # bar_psi = t * bar_s  (stored conjugated: (re, -im))
    phase = sigma * v_ref[0]
    c = jnp.cos(phase)
    sn = jnp.sin(phase)
    cr_ref[idx] = bsr * c + nbsi * sn
    ci_ref[idx] = nbsi * c - bsr * sn

    if sk:

        @pl.when(i == nslices - 1)
        def _final():
            dpr_ref[0] = cr_ref[b]
            dpi_ref[0] = ci_ref[b]


def _run_forward_store(psi_b, v_stack, propagator, sigma, precision):
    """(B, n, n) forward storing s every slice; returns (psi_out, s_re,
    s_im) with the s stack of shape (B, S, n, n)."""
    b, n, _ = psi_b.shape
    s = v_stack.shape[0]
    interp = _resolve_interpret(None)
    precision = precision or jax.lax.Precision.HIGHEST
    r, twr, twi, fr, fi = _tables(n)
    pl_c = _prepared_prop(propagator.astype(psi_b.dtype), n)
    rdt = jnp.real(psi_b).dtype

    const2 = lambda shape: pl.BlockSpec(shape, lambda bi, si: (0,) * len(shape))  # noqa: E731
    per_batch = pl.BlockSpec((1, n, n), lambda bi, si: (bi, 0, 0))
    s_spec = pl.BlockSpec((1, 1, n, n), lambda bi, si: (bi, si, 0, 0))
    base = 128
    outr, outi, ssr, ssi = pl.pallas_call(
        functools.partial(
            _sfwd_kernel, sigma=rdt.type(sigma), radix=r, precision=precision
        ),
        grid=(b, s),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda bi, si: (si, 0, 0)),
            per_batch,
            per_batch,
            const2((n, n)),
            const2((n, n)),
            const2(twr.shape),
            const2(twi.shape),
            const2((base, base)),
            const2((base, base)),
        ],
        out_specs=[per_batch, per_batch, s_spec, s_spec],
        out_shape=[jax.ShapeDtypeStruct((b, n, n), rdt)] * 2
        + [jax.ShapeDtypeStruct((b, s, n, n), rdt)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_params(n).vmem_limit_bytes,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interp,
    )(
        v_stack.astype(rdt), jnp.real(psi_b), jnp.imag(psi_b),
        jnp.real(pl_c), jnp.imag(pl_c), twr, twi, fr, fi,
    )
    return jax.lax.complex(outr, outi), ssr, ssi


def _run_backward_store(ssr, ssi, v_stack, propagator, g, sigma, precision):
    """Store-s whole-loop adjoint; returns (dV, bar_psi0)."""
    b, s, n, _ = ssr.shape
    interp = _resolve_interpret(None)
    precision = precision or jax.lax.Precision.HIGHEST
    r, twr, twi, fr, fi = _tables(n)
    pl_c = _prepared_prop(propagator.astype(g.dtype), n)
    rdt = jnp.real(g).dtype

    const2 = lambda shape: pl.BlockSpec(shape, lambda i, bi: (0,) * len(shape))  # noqa: E731
    rev_slice = pl.BlockSpec((1, n, n), lambda i, bi: (s - 1 - i, 0, 0))
    rev_s = pl.BlockSpec((1, 1, n, n), lambda i, bi: (bi, s - 1 - i, 0, 0))
    per_batch = pl.BlockSpec((1, n, n), lambda i, bi: (bi, 0, 0))
    base = 128
    dv, dpr, dpi_neg = pl.pallas_call(
        functools.partial(
            _bwd_store_kernel, sigma=rdt.type(sigma), radix=r,
            precision=precision, nslices=s,
        ),
        grid=(s, b),
        in_specs=[
            rev_slice,  # V_j (for t in the bar_psi update)
            rev_s,  # s re
            rev_s,  # s im
            per_batch,  # cotangent re
            per_batch,  # cotangent im
            const2((n, n)),
            const2((n, n)),
            const2(twr.shape),
            const2(twi.shape),
            const2((base, base)),
            const2((base, base)),
        ],
        out_specs=[rev_slice, per_batch, per_batch],
        out_shape=[
            jax.ShapeDtypeStruct((s, n, n), rdt),
            jax.ShapeDtypeStruct((b, n, n), rdt),
            jax.ShapeDtypeStruct((b, n, n), rdt),
        ],
        scratch_shapes=(
            # B == 1: the dp output block IS the carry (kernel docstring)
            []
            if b == 1
            else [
                pltpu.VMEM((b, n, n), rdt),
                pltpu.VMEM((b, n, n), rdt),
            ]
        ),
        compiler_params=pltpu.CompilerParams(
            # 1024^2 measured 120.57 MiB scoped — just over the generic
            # 120 cap; the physical 127 admits it
            vmem_limit_bytes=(
                127 * 1024 * 1024 if n >= 1024 else _params(n).vmem_limit_bytes
            ),
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interp,
    )(
        # conjugate convention (kernel docstring): -Im g and -Im P_l go
        # in, -Im bar_psi0 comes out — all negations live OUTSIDE the
        # kernel, where XLA fuses them into the split/merge ops instead
        # of burning VMEM temps per grid step
        v_stack.astype(rdt), ssr, ssi, jnp.real(g), -jnp.imag(g),
        jnp.real(pl_c), -jnp.imag(pl_c), twr, twi, fr, fi,
    )
    return dv, jax.lax.complex(dpr, -dpi_neg)


def _run_forward_ck(psi_b, v_stack, propagator, sigma, precision, seg):
    """(B, n, n) forward with per-segment checkpoints; returns
    (psi_out c64, ck_re, ck_im) with ck of shape (B, S/seg, n, n)."""
    b, n, _ = psi_b.shape
    s = v_stack.shape[0]
    nseg = s // seg
    interp = _resolve_interpret(None)
    precision = precision or jax.lax.Precision.HIGHEST
    r, twr, twi, fr, fi = _tables(n)
    pl_c = _prepared_prop(propagator.astype(psi_b.dtype), n)
    rdt = jnp.real(psi_b).dtype

    const2 = lambda shape: pl.BlockSpec(shape, lambda bi, si: (0,) * len(shape))  # noqa: E731
    per_batch = pl.BlockSpec((1, n, n), lambda bi, si: (bi, 0, 0))
    ck_spec = pl.BlockSpec((1, 1, n, n), lambda bi, si: (bi, si // seg, 0, 0))
    base = 128
    outr, outi, ckr, cki = pl.pallas_call(
        functools.partial(
            _ck_kernel, sigma=rdt.type(sigma), radix=r, precision=precision,
            seg=seg,
        ),
        grid=(b, s),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda bi, si: (si, 0, 0)),  # V_j stream
            per_batch,  # psi re
            per_batch,  # psi im
            const2((n, n)),
            const2((n, n)),
            const2(twr.shape),
            const2(twi.shape),
            const2((base, base)),
            const2((base, base)),
        ],
        out_specs=[per_batch, per_batch, ck_spec, ck_spec],
        out_shape=[jax.ShapeDtypeStruct((b, n, n), rdt)] * 2
        + [jax.ShapeDtypeStruct((b, nseg, n, n), rdt)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_params(n).vmem_limit_bytes,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interp,
    )(
        v_stack.astype(rdt), jnp.real(psi_b), jnp.imag(psi_b),
        jnp.real(pl_c), jnp.imag(pl_c), twr, twi, fr, fi,
    )
    return jax.lax.complex(outr, outi), ckr, cki


def _run_backward(ckr, cki, v_stack, propagator, g, sigma, precision, seg):
    """Whole-loop adjoint from the checkpoints; returns (dV, bar_psi0)."""
    b, nseg, n, _ = ckr.shape
    s = v_stack.shape[0]
    interp = _resolve_interpret(None)
    precision = precision or jax.lax.Precision.HIGHEST
    r, twr, twi, fr, fi = _tables(n)
    pl_c = _prepared_prop(propagator.astype(g.dtype), n)
    rdt = jnp.real(g).dtype

    const2 = lambda shape: pl.BlockSpec(shape, lambda i, bi: (0,) * len(shape))  # noqa: E731
    rev_seg = pl.BlockSpec((seg, n, n), lambda i, bi: (nseg - 1 - i, 0, 0))
    per_batch = pl.BlockSpec((1, n, n), lambda i, bi: (bi, 0, 0))
    base = 128
    dv, dpr, dpi = pl.pallas_call(
        functools.partial(
            _bwd_scan_kernel, sigma=rdt.type(sigma), radix=r,
            precision=precision, seg=seg, nseg=nseg,
        ),
        grid=(nseg, b),
        in_specs=[
            rev_seg,  # V segment (resident across the inner batch sweep)
            pl.BlockSpec((1, 1, n, n), lambda i, bi: (bi, nseg - 1 - i, 0, 0)),
            pl.BlockSpec((1, 1, n, n), lambda i, bi: (bi, nseg - 1 - i, 0, 0)),
            per_batch,  # cotangent re (consumed at i == 0)
            per_batch,  # cotangent im
            const2((n, n)),
            const2((n, n)),
            const2(twr.shape),
            const2(twi.shape),
            const2((base, base)),
            const2((base, base)),
        ],
        out_specs=[rev_seg, per_batch, per_batch],
        out_shape=[
            jax.ShapeDtypeStruct((s, n, n), rdt),
            jax.ShapeDtypeStruct((b, n, n), rdt),
            jax.ShapeDtypeStruct((b, n, n), rdt),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, n, n), rdt),  # bar_psi carry re
            pltpu.VMEM((b, n, n), rdt),  # bar_psi carry im
        ]
        + (
            [
                pltpu.VMEM((seg, n, n), rdt),  # recomputed psi re
                pltpu.VMEM((seg, n, n), rdt),  # recomputed psi im
            ]
            if seg > 1
            else []
        ),
        compiler_params=pltpu.CompilerParams(
            # the backward's adjoint pipeline + dV/carry blocks are the
            # VMEM high-water mark; at 1024^2 it needs the physical cap
            vmem_limit_bytes=(
                127 * 1024 * 1024 if n >= 1024 else _params(n).vmem_limit_bytes
            ),
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interp,
    )(
        v_stack.astype(rdt), ckr, cki, jnp.real(g), jnp.imag(g),
        jnp.real(pl_c), jnp.imag(pl_c), twr, twi, fr, fi,
    )
    return dv, jax.lax.complex(dpr, dpi)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _scan_diff(psi_b, v_stack, propagator, sigma, precision, seg):
    """(B, n, n) whole-loop multislice, differentiable wrt psi and V.

    The PRIMAL is fused_scan's plain kernel (no checkpoint writes); only
    tracing under differentiation routes through _fwd_ck below."""
    from .fused_scan import _run_batched

    return _run_batched(psi_b, v_stack, propagator, sigma, precision, None)


def _fwd_ck(psi_b, v_stack, propagator, sigma, precision, seg):
    if seg == 0:
        # store-s mode: residual is the full post-transmit wave stack
        out, ssr, ssi = _run_forward_store(
            psi_b, v_stack, propagator, sigma, precision
        )
        return out, (ssr, ssi, v_stack, propagator)
    out, ckr, cki = _run_forward_ck(
        psi_b, v_stack, propagator, sigma, precision, seg
    )
    return out, (ckr, cki, v_stack, propagator)


def _bwd_ck(sigma, precision, seg, res, g):
    ar, ai, v_stack, propagator = res
    if seg == 0:
        dv, dpsi = _run_backward_store(
            ar, ai, v_stack, propagator, g, sigma, precision
        )
    else:
        dv, dpsi = _run_backward(
            ar, ai, v_stack, propagator, g, sigma, precision, seg
        )
    return dpsi, dv.astype(v_stack.dtype), None


_scan_diff.defvjp(_fwd_ck, _bwd_ck)


def scan_diff_apply(psi0, v_stack, propagator, sigma, precision, seg=None):
    """Grad-capable whole-loop entry: (n, n) or native (B, n, n) psi.

    Native batches larger than the per-grid VMEM carry cap are CHUNKED
    internally — a sequential (unrolled) loop of capped kernel calls whose
    dV contributions sum by autodiff linearity (VERDICT.md round-4 item 4:
    orchestration belongs to the library, not the caller).  The store-s
    HBM budget is decided on the FULL batch, because reverse-mode autodiff
    keeps every chunk's residual alive until the backward runs.

    Budget semantics under vmap (ADVICE.md round 4): when this function is
    traced under ``jax.vmap`` (the forward.py probe axis), psi0 is a
    per-lane (n, n) tracer, so the store budget sees bb=1 while the
    batched kernel stores B× that — product paths stay safe because
    ``pick_probe_chunk`` caps vmap lanes at 16 ≤ _BATCH_CAP_STORE[512]
    and 1 at ≥1024², but direct vmap users with wide axes should prefer
    the native (B, n, n) path, which both counts and chunks correctly."""
    n = psi0.shape[-1]
    if v_stack.ndim != 3 or propagator.ndim != 2:
        raise ValueError(
            "the grad-capable whole-loop engine takes a shared (S, n, n) V "
            "and (n, n) propagator natively; batched-V/propagator GRAD "
            "contexts (tilt series) go through vmap (pallas auto-batching)"
        )
    s = v_stack.shape[0]
    if seg is None:
        # store-s (seg=0) is the fast backward: one adjoint pipeline per
        # slice, zero recompute, residual = the (B, S, n, n) post-transmit
        # wave stack.  Use it whenever that stack fits a modest HBM budget
        # (the thing sqrt-S checkpointing exists to avoid); fall back to
        # segment-recompute for long horizons.  seg=0/seg>0 can also be
        # forced explicitly (tests pin both backward variants).
        bb = 1 if psi0.ndim == 2 else psi0.shape[0]
        store_bytes = bb * s * n * n * 8  # two f32 planes per slice
        seg = 0 if store_bytes <= _STORE_CAP_BYTES else pick_seg(s, n)
    if seg and n >= 1024:
        raise ValueError(
            "the segment-recompute backward exceeds 1024^2 VMEM (adjoint "
            "floor note); at that grid only the store-s variant (seg=0) "
            "runs — shrink the horizon/batch under the store budget or "
            "use a per-slice engine"
        )
    if seg and s % seg != 0:
        raise ValueError(f"seg {seg} must divide nslices {s}")
    if psi0.ndim == 2:
        return _scan_diff(psi0[None], v_stack, propagator, sigma, precision, seg)[0]
    cap = (_BATCH_CAP_STORE if seg == 0 else _BATCH_CAP)[n]
    b = psi0.shape[0]
    if b <= cap:
        return _scan_diff(psi0, v_stack, propagator, sigma, precision, seg)
    # Auto-chunk: sequential capped kernel calls, unrolled at trace time
    # (a handful of chunks; same-shape chunks reuse one compiled kernel).
    # Differentiable as-is — each chunk's VJP contributes its own dV and
    # JAX sums contributions to the shared v_stack/propagator operands.
    outs = [
        _scan_diff(psi0[i : i + cap], v_stack, propagator, sigma, precision, seg)
        for i in range(0, b, cap)
    ]
    return jnp.concatenate(outs, axis=0)
