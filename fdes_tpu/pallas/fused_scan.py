"""Cross-slice fused multislice: the WHOLE slice loop as one Pallas kernel
with ψ resident in VMEM (VERDICT.md round-2 next-round item 2).

The per-slice fused kernel (fused_step.py) eliminates intra-step HBM
traffic but still round-trips ψ through HBM between steps (one 2 MiB read
+ 2 MiB write per slice at 512²) and re-enters the XLA while-loop per
slice.  Here the slice loop IS the Pallas grid:

    grid = (batch, nslices), slices fastest-varying;
    ψ lives in the OUTPUT block, whose index map is constant along the
    slice axis — Pallas keeps a revisited block in VMEM across grid steps
    and flushes it to HBM only when the batch index changes, so ψ never
    touches HBM inside the loop;
    V_j is the only streamed input (1 MiB/slice at 512²), double-buffered
    by the Pallas pipeline automatically: the next slice's potential DMA
    overlaps this slice's butterflies and matmuls.

Per-slice HBM traffic drops from ~5 MiB (ψ in/out + V) to 1 MiB (V only),
and the S kernel launches + while-loop iterations collapse into one
pallas_call.  The transform pipeline (mixed-radix MXU FFT on (re, im)
planes, permuted pre-scaled propagator) is fused_step.py's, reused
verbatim.

The plain engine here is FORWARD-ONLY: the adjoint of the whole loop needs
the per-slice ψ_j which this kernel deliberately never stores.  Round 4
added the whole-loop adjoint as a second kernel with segment-checkpointed
in-kernel recompute (pallas/adjoint_scan.py); make_fused_scan(grad=True)
returns an engine whose whole_scan routes through that custom VJP, so
value_and_grad works with no lax.scan/remat at all.

Square grids with N in {128, 256, 512, 1024} (fused_step.py VMEM budget;
1024 added in round 4 via a single in-kernel radix-8 stage per axis —
VERDICT.md round-3 next item 2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_step import (
    BASE,
    _axis_consts,
    _params,
    _pipeline,
    _prepared_prop,
    _resolve_interpret,
    _tables,
)


def _scan_kernel(
    v_ref, pr_ref, pi_ref, plr_ref, pli_ref, twr_ref, twi_ref, fr_ref, fi_ref,
    or_ref, oi_ref, *, sigma, radix, precision, v_batched, p_batched,
):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        # first slice of this batch element: seed the VMEM-resident carry
        # from the incident wave
        or_ref[0] = pr_ref[0]
        oi_ref[0] = pi_ref[0]

    zr = or_ref[0]
    zi = oi_ref[0]
    phase = sigma * (v_ref[0, 0] if v_batched else v_ref[0])
    c = jnp.cos(phase)
    sn = jnp.sin(phase)
    sr = zr * c - zi * sn
    si = zr * sn + zi * c
    consts = (radix, twr_ref[:], twi_ref[:], fr_ref[:], fi_ref[:])
    plr = plr_ref[0] if p_batched else plr_ref[:]
    pli = pli_ref[0] if p_batched else pli_ref[:]
    sr, si = _pipeline(sr, si, plr, pli, consts, precision)
    or_ref[0] = sr
    oi_ref[0] = si


def _run_batched(psi_b, v_stack, propagator, sigma, precision, interpret):
    """(B, n, n) ψ through all S slices; grid (B, S), slices fastest.

    v_stack may be (S, n, n) shared or (B, S, n, n) per-wave (phonon
    configuration stacks); propagator (n, n) shared or (B, n, n) per-wave
    (tilt series) — per-wave blocks are streamed/resident by batch index,
    so a whole tilt series is ONE kernel launch (VERDICT.md round-3 weak
    item 3: no more Python loops over jit calls for stacked propagators).
    """
    b, n, _ = psi_b.shape
    v_batched = v_stack.ndim == 4
    p_batched = propagator.ndim == 3
    s = v_stack.shape[1] if v_batched else v_stack.shape[0]
    interp = _resolve_interpret(interpret)
    precision = precision or jax.lax.Precision.HIGHEST
    r, twr, twi, fr, fi = _tables(n)
    if p_batched:
        pl_c = jax.vmap(lambda p: _prepared_prop(p, n))(
            propagator.astype(psi_b.dtype)
        )
    else:
        pl_c = _prepared_prop(propagator.astype(psi_b.dtype), n)
    rdt = jnp.real(psi_b).dtype

    const2 = lambda shape: pl.BlockSpec(shape, lambda bi, si: (0,) * len(shape))  # noqa: E731
    per_batch = pl.BlockSpec((1, n, n), lambda bi, si: (bi, 0, 0))
    v_spec = (
        pl.BlockSpec((1, 1, n, n), lambda bi, si: (bi, si, 0, 0))
        if v_batched
        else pl.BlockSpec((1, n, n), lambda bi, si: (si, 0, 0))
    )
    p_spec = per_batch if p_batched else const2((n, n))
    outr, outi = pl.pallas_call(
        functools.partial(
            _scan_kernel, sigma=rdt.type(sigma), radix=r, precision=precision,
            v_batched=v_batched, p_batched=p_batched,
        ),
        grid=(b, s),
        in_specs=[
            v_spec,  # V_j stream
            per_batch,  # psi re
            per_batch,  # psi im
            p_spec,  # P re (permuted, 1/N^2-folded)
            p_spec,  # P im
            const2(twr.shape),
            const2(twi.shape),
            const2((BASE, BASE)),
            const2((BASE, BASE)),
        ],
        out_specs=[per_batch, per_batch],
        out_shape=[jax.ShapeDtypeStruct((b, n, n), rdt)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_params(n).vmem_limit_bytes,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interp,
    )(
        v_stack.astype(rdt), jnp.real(psi_b), jnp.imag(psi_b),
        jnp.real(pl_c), jnp.imag(pl_c), twr, twi, fr, fi,
    )
    return jax.lax.complex(outr, outi)


class WholeScanEngine:
    """Marker object make_slice_step returns for whole-loop engines:
    propagate.multislice dispatches to .whole_scan(psi0, v, prop, sigma)
    instead of scanning a per-slice step (the engine cannot be called per
    slice — the point is that the loop lives inside one kernel)."""

    def __init__(
        self, whole_scan, kind: str, grad_capable: bool = False, precision=None
    ):
        self.whole_scan = whole_scan
        self.kind = kind
        #: True when the engine carries the whole-loop custom VJP
        #: (pallas/adjoint_scan.py): value_and_grad works and remat_chunk
        #: is subsumed by the in-kernel segment checkpointing
        self.grad_capable = grad_capable
        #: the kernel precision tier (HIGHEST / 'bf16x3' / 'bf16x1') so
        #: compositions (multislice_streamed -> panel_streamed) can rebuild
        #: an equivalent pipeline without re-deriving it from .kind
        self.precision = precision

    def __call__(self, *args, **kwargs):
        raise TypeError(
            f"engine {self.kind!r} fuses the whole slice loop; use "
            "propagate.multislice (which dispatches to .whole_scan) instead "
            "of calling it as a per-slice step"
        )


@functools.lru_cache(maxsize=32)
def _single_fn(sigma: float, precision):
    """custom_vmap-wrapped single-wave entry, cached per (sigma, precision)
    so jit tracing sees a stable function identity.  sigma is closed over
    as a STATIC float: the kernel folds it into the transmit constants (an
    SMEM scalar would force a per-call reload; sigma never varies within a
    run)."""

    @jax.custom_batching.custom_vmap
    def single(psi, v_stack, propagator):
        return _run_batched(
            psi[None], v_stack, propagator, sigma, precision, None
        )[0]

    @single.def_vmap
    def _vmap_rule(axis_size, in_batched, psi, v_stack, propagator):
        # any combination of (psi, V, propagator) batching maps onto the
        # kernel's batch grid axis: tilt series batch the propagator,
        # phonon stacks batch V, STEM rasters batch the wave
        if not in_batched[0]:
            psi = jnp.broadcast_to(psi[None], (axis_size, *psi.shape))
        out = _run_batched(psi, v_stack, propagator, sigma, precision, None)
        return out, True

    return single


def make_fused_scan(
    ny: int, nx: int, dtype=jnp.complex64, precision=None, grad: bool = False
):
    """WholeScanEngine running the whole multislice loop in one kernel.

    ψ may be (n, n) or (B, n, n); vmap over the wave maps onto the kernel's
    batch grid axis via a custom batching rule (probe batches in
    forward.stem_raster land there with no per-probe pallas_call).

    grad=False: forward-only (module docstring).  grad=True: the engine
    routes through pallas/adjoint_scan.py's whole-loop custom VJP —
    value_and_grad works (dV + bar psi0; the propagator stays
    non-differentiable), with in-kernel segment-checkpointed recompute
    replacing remat_chunk.  The grad path supports (n, n) and native
    (B, n, n) psi but NOT vmap over the wave.  sigma must be a host float
    either way.
    """
    if ny != nx:
        raise ValueError(f"fused scan needs a square grid, got ({ny}, {nx})")
    if ny > 1024:
        raise ValueError(
            "the whole-loop VMEM kernel cannot hold a 2048^2 plane set in "
            "VMEM (BASELINE.md floor note) — use the panel-staged engine "
            "('panel', pallas/panel_scan.py) or 'xla' there"
        )
    _axis_consts(ny)  # validate size

    def whole_scan(psi0, v_stack, propagator, sigma):
        psi0 = psi0.astype(dtype)
        propagator = propagator.astype(dtype)
        if jnp.iscomplexobj(v_stack):
            # Absorptive complex V: the whole-loop kernel streams a REAL
            # potential; fall back to the per-slice Pallas path (same
            # fallback make_fused_slice_step takes) so engine='auto' stays
            # safe when sim.absorptive_factor > 0 (ADVICE.md round 3).
            from .slice_step import pallas_slice_step

            def body(psi, v):
                return pallas_slice_step(psi, v, propagator, sigma), None

            if psi0.ndim == 3:
                return jax.vmap(lambda p: jax.lax.scan(body, p, v_stack)[0])(
                    psi0
                )
            return jax.lax.scan(body, psi0, v_stack)[0]
        sigma = float(sigma)  # static: traced sigma is not supported here
        if grad:
            if ny >= 1024:
                # At 1024^2 only the STORE-S backward fits VMEM (the
                # segment-recompute variant overflows even with seg=1 —
                # adjoint_scan.py floor note; the store variant fits via
                # the out-block carry, measured 29.7 ms v&g vs 47.5
                # per-slice at 64 slices b1).  When the stored s-stack
                # exceeds its HBM budget, fall back to the per-slice
                # fused adjoint (composes with lax.scan + remat).
                from .adjoint_scan import _STORE_CAP_BYTES

                # Per-lane semantics under vmap (ADVICE.md round 4): a
                # vmapped wave sees bb=1 here while the batched kernel
                # stores B x this estimate; product paths stay safe via
                # pick_probe_chunk's 1-wave cap at >=1024^2 (see
                # adjoint_scan.scan_diff_apply's budget note).
                bb = 1 if psi0.ndim == 2 else psi0.shape[0]
                if bb * v_stack.shape[0] * ny * nx * 8 > _STORE_CAP_BYTES:
                    from .fused_step import make_fused_slice_step

                    step = make_fused_slice_step(ny, nx, dtype, precision)

                    def body(psi, v):
                        return step(psi, v, propagator, sigma), None

                    if psi0.ndim == 3:
                        return jax.vmap(
                            lambda p: jax.lax.scan(body, p, v_stack)[0]
                        )(psi0)
                    return jax.lax.scan(body, psi0, v_stack)[0]
            from .adjoint_scan import scan_diff_apply

            return scan_diff_apply(psi0, v_stack, propagator, sigma, precision)
        if psi0.ndim == 3:
            return _run_batched(
                psi0, v_stack, propagator, sigma, precision, None
            )
        return _single_fn(sigma, precision)(psi0, v_stack, propagator)

    kind = {
        "bf16x3": "fscan_fast",
        "bf16x1": "fscan_draft",
    }.get(precision, "fscan")
    return WholeScanEngine(whole_scan, kind, grad_capable=grad)
