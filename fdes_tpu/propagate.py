"""Multislice propagation engine — the hot loop (SURVEY.md C8, §3.1).

The reference iterates ψ <- IFFT(P * FFT(t_j * ψ)) with ~6-10 kernel
launches + 2 cuFFT calls per slice, crossing the host boundary every slice
(SURVEY.md §3.1).  Here the WHOLE slice horizon is one ``lax.scan`` inside
one XLA program: zero host crossings, XLA fuses the elementwise transmission
and propagator multiplies into the FFT pipeline.  An optional Pallas kernel
(pallas/slice_step.py) fuses the transmission construction exp(i*sigma*V)*psi
into a single VMEM pass; it is benchmark-selected, not assumed faster than
XLA fusion (SURVEY.md §7 M6).

Adjoint: gradients flow through the scan via ``jax.grad``; memory for long
horizons is bounded with sqrt(S)-chunked rematerialisation
(``remat_chunk``): the scan is split into S/chunk outer steps, each a
``jax.checkpoint``-wrapped inner scan, so the stored state is
O(S/chunk + chunk) waves instead of O(S) (SURVEY.md §5 long-context row —
this replaces the reference's S resident forward waves, §3.2).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp


def transmit(psi: jax.Array, v_slice: jax.Array, sigma: float) -> jax.Array:
    """Apply the slice transmission t = exp(1j*sigma*V) to the wave.

    Computed as cos/sin of the real phase so no complex exp is materialised;
    V in V*Å, sigma in rad/(V*Å) (constants.py).

    Absorptive (optical) potential: a COMPLEX v_slice V + i*V_abs applies
    t = exp(1j*sigma*V - sigma*V_abs) — the imaginary part damps the wave
    (inelastic/TDS absorption channel; SURVEY.md Appendix B item 3).
    """
    rdt = psi.real.dtype
    if jnp.iscomplexobj(v_slice):
        phase = jnp.asarray(sigma, rdt) * v_slice.real.astype(rdt)
        damp = jnp.exp(-jnp.asarray(sigma, rdt) * v_slice.imag.astype(rdt))
        t = jax.lax.complex(damp * jnp.cos(phase), damp * jnp.sin(phase))
        return psi * t
    phase = jnp.asarray(sigma, rdt) * v_slice.astype(rdt)
    t = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
    return psi * t


def default_slice_step(
    psi: jax.Array, v_slice: jax.Array, propagator: jax.Array, sigma: float
) -> jax.Array:
    """One multislice step: ψ <- IFFT(P * FFT(exp(1j σ V) ψ))."""
    psi = transmit(psi, v_slice, sigma)
    return jnp.fft.ifft2(jnp.fft.fft2(psi) * propagator.astype(psi.dtype))


def multislice_streamed(
    psi0: jax.Array,
    atoms_xyspw: tuple[jax.Array, jax.Array, jax.Array, jax.Array],
    ff_r: jax.Array,
    propagator: jax.Array,
    sigma: float,
    *,
    shape: tuple[int, int],
    pixel: tuple[float, float],
    remat_chunk: int | None = None,
    slice_step: Callable[..., jax.Array] | None = None,
) -> jax.Array:
    """Multislice with the potential built ON THE FLY inside the scan.

    atoms_xyspw: per-slice padded (S, max_atoms) arrays from
    potential.pad_atoms_per_slice; ff_r the rfft2-grid species factors.
    Each scan step scatters one slice's atoms, builds V_j, transmits and
    propagates — the (S, ny, nx) potential stack never exists, trading
    +2 rFFTs/slice for O(S*N^2) memory (pod config 512x2048^2 = 8 GiB;
    SURVEY.md §7 memory risk).  Forward-only tool: in the INVERSE problem
    the potential stack is the optimization variable itself.

    slice_step composes the streamed build with the engine table
    (VERDICT.md round-4 item 7): per-slice engines run inside the scan
    body; the PANEL whole-loop engine (the 2048^2 winner) composes
    through its XLA-level loop (panel_scan.panel_streamed — the potential
    build rides between the column and row passes).  The fscan family
    cannot compose (its kernel streams a materialised V stack from HBM;
    that stack never existing is the point here) and is rejected loudly.
    """
    from .potential import slice_potential

    x, y, sp, w = atoms_xyspw

    if slice_step is not None and hasattr(slice_step, "whole_scan"):
        if slice_step.kind.startswith("panel"):
            from .pallas.panel_scan import panel_streamed

            return panel_streamed(
                psi0, atoms_xyspw, ff_r, propagator, sigma,
                shape=shape, pixel=pixel,
                precision=getattr(slice_step, "precision", None),
            )
        raise ValueError(
            f"engine {slice_step.kind!r} streams a materialised (S, ny, nx) "
            "V stack into its kernel — it cannot compose with the streamed "
            "on-the-fly potential build.  Use a per-slice engine "
            "('fused'/'xla') or the panel engine at pod grids."
        )
    step = slice_step or default_slice_step

    def body(psi, slice_atoms):
        xs, ys, sps, ws = slice_atoms
        v = slice_potential(
            xs, ys, sps, ws, ff_r, shape=shape, pixel=pixel
        )
        return step(psi, v, propagator, sigma), None

    s = x.shape[0]
    if not remat_chunk or remat_chunk >= s:
        return jax.lax.scan(body, psi0, (x, y, sp, w))[0]
    if s % remat_chunk != 0:
        raise ValueError(f"remat_chunk {remat_chunk} must divide nslices {s}")
    nb = s // remat_chunk
    chunked = tuple(
        a.reshape(nb, remat_chunk, *a.shape[1:]) for a in (x, y, sp, w)
    )

    @jax.checkpoint
    def inner(psi, chunk):
        return jax.lax.scan(body, psi, chunk)[0]

    return jax.lax.scan(lambda p, c: (inner(p, c), None), psi0, chunked)[0]


def _resolve_auto(kind: str, shape: tuple[int, int], grad: bool, batch: int) -> str:
    """Data-driven auto tiers from the v5e measurements (tpu_steps.jsonl +
    tpu_accuracy.jsonl, 2026-08-20/21; see BASELINE.md engine tables).

    Round 4: the whole-loop kernels are DIFFERENTIABLE (in-kernel
    segment-checkpointed adjoint, pallas/adjoint_scan.py), so grad
    contexts promote them too.  Measured value_and_grad of the 512²x64
    unbatched rollout on v5e (tpu_steps.jsonl mode=value_and_grad,
    2026-08-21): fscan_fast 7.7 ms / fused_fast 8.3 / radix 11.0 /
    fscan 12.6 / mxu 19.6 — and the whole-loop adjoint is REMAT-INVARIANT
    (7.74 ms with remat_chunk=8) while every per-slice engine pays
    +28-34% recompute under remat (fused_fast 10.6, mxu 26.3).  On-chip
    grad accuracy: fscan 1.4e-5 (the mxu/radix class), fscan_fast 1.3e-4.
    Config-3 end-to-end: fscan 109.2 / fscan_fast 166.4 recon-iters/s vs
    the round-3 per-slice best 37.8.  With the store-s backward
    (adjoint_scan.py round-4 second pass) the vmapped whole-loop adjoint
    also wins BATCHED grad contexts at 512²x64 — b16: fscan_fast 51.2 ms
    / radix_fast 70.1 / auto-batched segment-fscan_fast 74.7 / fscan
    93.2 / radix 98.8; b64: fscan_fast 198 vs mxu_fast 576, fscan 366 vs
    mxu 940 — so grad promotion at 256²/512² covers EVERY measured
    batch.  At 1024² the store-s backward fits via the out-block carry:
    b1 fscan 28.3 / fscan_fast 17.6 ms (vs per-slice fused 47.5, xla
    53.4); b8 vmapped fscan_fast 117 vs xla 417.

    Round-3 measured facts encoded here (512²x16 batch, 64 slices, post
    radix precision fix + concat-reassembly fix):
    * accuracy tier: radix@HIGHEST is BOTH the fastest grad-capable engine
      at 512² (19.0k slice-props/s vs mxu 9.2k, xla 8.6k) AND the most
      accurate (1.68e-6 exit err vs xla 6.2e-6; grad 1.2e-5); at 1024²
      batched it is more accurate (1.34e-6, grad 9.1e-6) but SLOWER than
      the FFT (1.30k vs 1.61k — HBM-bound, unmoved by the concat fix), so
      xla keeps 1024² and radix stays selectable for accuracy-critical
      runs.  At 256² the dense mxu engines dominate
      (mxu 62k / mxu_fast 102k — the matmuls are small enough that O(N³)
      does not hurt and radix's butterfly overhead does);
    * fast tier: radix_fast wins 512² at 25.6k (mxu_fast 18.1k) at the
      same ~1.7e-3 accuracy class; mxu_fast keeps 1024² (2.36k vs xla
      1.61k; radix_fast 1.30k);
    * at 2048² the VPU FFT wins everything, and BATCHING HURTS (xla 676
      unbatched vs 330 at batch 8 — HBM-bound; shard probes across chips
      instead of batching at pod grids);
    * FORWARD-ONLY contexts at 512² go to the whole-loop VMEM kernels
      (fscan tiers, post in-kernel-concat rewrite): fscan_fast 37.9k at
      7.5e-5 (b1 13.7k, b64 41.4k — wins at EVERY measured batch) and
      fscan 21.6k at 2.57e-6 batched; grad contexts keep the radix tiers
      (fused_fast 22.4k @7.5e-5 grad 1.3e-4 is the better-accuracy
      selectable alternative to radix_fast).
    """
    from .radix import radix_plan

    ny, nx = shape
    # fscan promotion only at its MEASURED shapes: 512² (37.9k/21.6k fwd;
    # 7.7/12.6 ms grad step) and 256² (fscan_fast 114.7k vs mxu_fast
    # 101.8k; fscan 74.5k vs mxu 62.1k; accuracy 7.4e-5 / 2.6e-6 and grad
    # 1.3e-4 / 1.1e-5 certified on chip).  Grad contexts promote at
    # every measured batch (store-s adjoint wins b1-b64 — docstring).
    # Round 4 extends FORWARD promotion to 1024² (in-kernel radix-8):
    # fscan 4.0k b1, 5.1k b8/b16 / fscan_fast 5.5k b1, 8.8k b8, 9.1k b16
    # (b32: 9.26k) vs the prior best xla 2.6k / mxu_fast 2.4k — the
    # VMEM-resident loop removes the HBM traffic that bound this grid;
    # measured through b32, larger batches keep the previous winners.
    fscan_ok = ny == nx and (
        # forward: 256²/512² at every measured batch (wins through b64);
        # 1024² through b16
        (not grad and (ny in (256, 512) or (ny == 1024 and batch <= 32)))
        # grad: 256²/512² at every measured batch — the store-s adjoint
        # wins b1 through b64 (b64: fscan_fast 198 ms vs mxu_fast 576;
        # fscan 366 vs mxu 940)
        or (grad and ny in (256, 512))
    )
    # the radix tiers win only for BATCHED rollouts (the digit matmuls need
    # the batch to fill the MXU): at 512² unbatched radix is 3.4k vs mxu's
    # 6.1k, while at batch 16 radix is 19.0k vs mxu's 9.2k — callers pass
    # the rollout batch (probe/tilt count vmapped over one potential) as
    # the ``batch`` hint, defaulting to the unbatched-safe choice
    radix_ok = (
        1 < batch <= 16  # b64 regresses: radix_fast 8.8k, vs 25.6k at b16
        and radix_plan(ny) is not None
        and radix_plan(nx) is not None
    )
    # 1024² grad: the STORE-S whole-loop backward fits via the out-block
    # carry and wins — b1: fscan 28.3 / fscan_fast 17.6 ms v&g vs
    # per-slice fused 47.5 and xla 53.4; b8 vmapped: fscan_fast 117 ms vs
    # xla 417 (3.6×), but the HIGHEST variant's extra f32-dot register
    # spills overflow VMEM batched (measured +5.2M), so the accuracy tier
    # promotes unbatched only.  (The segment variant never fits 1024²;
    # whole_scan self-routes by horizon.)
    is1024 = max(shape) == 1024 and ny == nx and grad
    fscan1024_grad = is1024 and batch <= 1
    fscan1024_grad_fast = is1024 and batch <= 8
    # 2048²/4096² promote the panel-streamed engine (round 5, tpu_steps/
    # tpu_accuracy.jsonl 2026-08-21): FORWARD at 2048² panel 1,267
    # slice-props/s at 6.0e-6 exit err (1,267 with the V scalar-prefetch
    # final state) / panel_fast 1,993 at 7.4e-5, vs xla 678 at the same
    # accuracy classes — the HBM-staged MXU transform the round-4 floor
    # analysis predicted (1.9x / 2.9x); at 4096² panel 246 at 1.9e-6 /
    # panel_fast 429 at 3.6e-5 vs xla 96.8 (4.4x).
    # GRAD contexts get the whole-loop store-s panel adjoint:
    # value_and_grad of the unbatched 2048²x64 rollout 109.8 ms (panel)
    # / 73.7 ms (panel_fast) vs xla 213 (1.9x / 2.9x), grad-err 1.9e-5 /
    # 1.26e-4 certified on chip; at 4096²x16 it measures 125.5 / 81.8 ms
    # vs xla 361.6 (2.9x / 4.4x), grad-err 8.3e-6 / 6.3e-5.  Batched
    # grad contexts keep xla at the auto tier (tilt/probe series compose
    # the unbatched adjoint via vmap or forward.hrtem_tilt_series
    # (sequential=) — pod-grid tilt inverse measured 187 ms/4-tilt iter
    # vs xla 1,099; batched FORWARD runs as a sequential lax.map and
    # keeps the panel win).
    panel_ok = ny == nx and ny in (2048, 4096) and (not grad or batch <= 1)
    if kind == "auto":
        if fscan_ok:
            # fastest accuracy tier at EVERY measured batch (512²: 11.1k
            # at b1 vs mxu 6.2k; 21.6k at b16; 256²: 74.5k at b16)
            return "fscan"
        if max(shape) <= 256:
            return "mxu"
        if radix_ok and max(shape) <= 512:
            return "radix"
        if fscan1024_grad:
            return "fscan"
        if panel_ok:
            return "panel"
        return "mxu" if max(shape) <= 512 else "xla"
    if fscan_ok:
        return "fscan_fast"  # 13.7k/37.9k/41.4k at b1/b16/b64, 7.5e-5
    if max(shape) <= 256:
        return "mxu_fast"
    if radix_ok and max(shape) <= 512:
        return "radix_fast"
    if fscan1024_grad_fast:
        return "fscan_fast"
    if panel_ok:
        return "panel_fast"
    return "mxu_fast" if max(shape) <= 1024 else "xla"


def make_slice_step(
    kind: str = "xla",
    shape: tuple[int, int] | None = None,
    dtype=None,
    grad: bool = True,
    batch: int = 1,
) -> Callable[..., jax.Array] | None:
    """Select the slice-step implementation (benchmark-selected per grid
    size — see benchmarks/tpu_steps.py / tpu_accuracy.py):

    'xla'      — jnp ops, compiler-fused elementwise + VPU FFT;
    'pallas'   — explicit fused VMEM kernels around the XLA FFT (M6);
    'mxu'      — DFT-as-matmul on the systolic array, true-f32 operands
                 (Precision.HIGHEST bf16x6 emulation; dft.py; needs shape);
    'mxu_fast' — same at Precision.HIGH (bf16x3): ~2x fewer MXU passes;
    'mxu4'     — four-step factorized DFT (dft.py): O(N^2(N1+N2)) matmul
                 FLOPs instead of O(N^3), Precision.HIGHEST;
    'mxu4_fast'— four-step at Precision.HIGH;
    'radix'    — mixed-radix MXU FFT (radix.py): radix-2/4 butterflies +
                 full-width 128-point matmul base, O(N^2 * 128) MXU FLOPs,
                 Precision.HIGHEST; needs axes = 128 * 2^m;
    'radix_fast' — same at Precision.HIGH;
    'fused'    — whole slice step (transmit + mixed-radix MXU FFT + Fresnel
                 + inverse) as ONE VMEM-resident Pallas kernel
                 (pallas/fused_step.py), Precision.HIGHEST; square
                 128/256/512 grids;
    'fused_fast' — same at Precision.HIGH;
    'fscan'    — the WHOLE slice loop as one Pallas kernel with ψ
                 VMEM-resident across slices and V streamed/double-
                 buffered (pallas/fused_scan.py); FORWARD-ONLY (no
                 grad/remat), square 128/256/512 grids, Precision.HIGHEST;
    'fscan_fast' — same with bf16x3 Karatsuba dots;
    'panel'    — HBM-panel-staged MXU transform loop for grids whose
                 planes exceed VMEM (2048^2): row/column panels streamed
                 through VMEM, 2 plane round-trips per slice
                 (pallas/panel_scan.py); FORWARD-ONLY, square N = r*128;
    'panel_fast' — same with bf16x3 Karatsuba dots;
    'auto'     — accuracy-preserving winner per grid size;
    'auto_fast'— throughput winner per grid size (exit-wave error ~2e-3
                 at 512^2 x 64 slices — fine for STEM/detector signals and
                 benchmarks, NOT for 1e-5-gated exit waves).

    The auto tiers encode the v5e measurements of 2026-08-20
    (benchmarks/results/tpu_steps.jsonl, tpu_accuracy.jsonl): batched
    rollouts (the production shape) at 512^2 run 2.1x faster on the MXU
    matmul-DFT at Precision.HIGH than on the VPU FFT (18.1k vs 8.6k
    slice-props/s, batch 16), and Precision.HIGHEST ('mxu') is BOTH faster
    than the FFT up to 512^2 AND more accurate (1.9e-6 vs 4.3e-6 exit
    rel-err vs f64 — bf16x6 matmul emulation carries less rounding than the
    f32 VPU FFT).  At >=1024^2 the O(N^3) matmul FLOPs overtake the FFT's
    O(N^2 log N) advantage for 'mxu'; 'mxu_fast' still wins at 1024^2
    batched (2.36k vs 1.61k) and loses at 2048^2.
    """
    if kind in ("auto", "auto_fast"):
        if shape is None:
            raise ValueError(f"kind={kind!r} needs shape=(ny, nx)")
        kind = _resolve_auto(kind, shape, grad, batch)
        if kind.startswith("panel") and jax.default_backend() not in (
            "tpu",
            "axon",
        ):
            # panel kernels run in INTERPRET mode off-TPU — pathologically
            # slow at 2048²; the VPU FFT keeps that grid off-TPU
            kind = "xla"
        if kind.startswith("fscan") and jax.default_backend() not in (
            "tpu",
            "axon",
        ):
            # the whole-loop Pallas kernels run in INTERPRET mode off-TPU
            # (pathologically slow at 512²) — auto falls back to the dense
            # engines there (xla above the mxu engines' win region);
            # explicit fscan selection still works
            if max(shape) >= 1024:
                # grad at 1024² off-TPU: dense 1024-point matmul DFTs are
                # pathological on CPUs too — take the jnp FFT path
                kind = (
                    "xla"
                    if (grad or kind != "fscan_fast")
                    else "mxu_fast"
                )
            else:
                kind = "mxu_fast" if kind == "fscan_fast" else "mxu"
        if kind in ("fused", "fused_fast") and jax.default_backend() not in (
            "tpu",
            "axon",
        ):
            # same off-TPU rule for the per-slice VMEM kernels (interpret
            # mode at 1024² is pathological on CPUs)
            kind = "xla"
    if kind == "xla":
        return None  # multislice default
    if kind == "pallas":
        from .pallas.slice_step import pallas_slice_step

        return pallas_slice_step
    if kind in ("mxu", "mxu_fast"):
        if shape is None:
            raise ValueError(f"kind={kind!r} needs shape=(ny, nx)")
        from .dft import make_mxu_slice_step

        precision = (
            jax.lax.Precision.HIGH if kind == "mxu_fast" else jax.lax.Precision.HIGHEST
        )
        return make_mxu_slice_step(
            *shape, dtype=dtype or jnp.complex64, precision=precision
        )
    if kind in ("mxu4", "mxu4_fast"):
        if shape is None:
            raise ValueError(f"kind={kind!r} needs shape=(ny, nx)")
        import warnings

        warnings.warn(
            f"engine {kind!r} measured 7x SLOWER than the winners on v5e "
            "(2,521 vs 19,259 slice-props/s at 512^2x16 — its small-digit "
            "einsums lower to ~3%-utilization convolutions; "
            "tpu_steps.jsonl).  Kept as a documented negative result; use "
            "'auto'/'auto_fast' unless you are re-measuring it.",
            stacklevel=2,
        )
        from .dft import make_mxu4_slice_step

        precision = (
            jax.lax.Precision.HIGH
            if kind == "mxu4_fast"
            else jax.lax.Precision.HIGHEST
        )
        return make_mxu4_slice_step(
            *shape, dtype=dtype or jnp.complex64, precision=precision
        )
    if kind in ("radix", "radix_fast"):
        if shape is None:
            raise ValueError(f"kind={kind!r} needs shape=(ny, nx)")
        from .radix import make_radix_slice_step

        precision = (
            jax.lax.Precision.HIGH
            if kind == "radix_fast"
            else jax.lax.Precision.HIGHEST
        )
        return make_radix_slice_step(
            *shape, dtype=dtype or jnp.complex64, precision=precision
        )
    if kind in ("fscan", "fscan_fast", "fscan_draft"):
        if shape is None:
            raise ValueError(f"kind={kind!r} needs shape=(ny, nx)")
        if kind == "fscan_draft":
            import warnings

            warnings.warn(
                "engine 'fscan_draft' is the PREVIEW tier: single-pass bf16 "
                "dots, ~1e-1 exit-wave rel-err at 512^2 x 64 slices "
                "(tpu_accuracy.jsonl) — wrong in the second decimal.  Use it "
                "only for interactive previews; 'fscan_fast' (7.5e-5) is the "
                "production throughput tier.",
                stacklevel=2,
            )
        from .pallas.fused_scan import make_fused_scan

        precision = {
            "fscan_fast": "bf16x3",  # ~7.5e-5 exit err class
            "fscan_draft": "bf16x1",  # single-pass bf16: ~mxu_fast class
        }.get(kind, jax.lax.Precision.HIGHEST)
        # grad=True routes through the whole-loop custom VJP
        # (pallas/adjoint_scan.py): store-s or segment-checkpointed
        # in-kernel adjoint, with whole_scan falling back to the
        # per-slice fused adjoint where neither fits (1024^2 long
        # horizons — fused_scan.py routing note)
        return make_fused_scan(
            *shape, dtype=dtype or jnp.complex64, precision=precision,
            grad=grad,
        )
    if kind in ("panel", "panel_fast"):
        if shape is None:
            raise ValueError(f"kind={kind!r} needs shape=(ny, nx)")
        # Mosaic has no Precision.HIGH lowering; bf16x3 is the hand-rolled
        # Karatsuba HIGH-class tier (fused_step._cdot)
        precision = (
            "bf16x3" if kind == "panel_fast" else jax.lax.Precision.HIGHEST
        )
        if grad:
            # GRAD contexts get the grad-capable whole-loop panel engine:
            # the store-s custom VJP (2+2 panel passes per slice) when
            # the s-stack residual fits the measured HBM budget, the
            # per-slice panel VJP + sqrt-S remat for long horizons, and
            # per-slice for complex V / batched waves
            from .pallas.panel_scan import make_panel_grad_engine

            return make_panel_grad_engine(
                *shape, dtype=dtype or jnp.complex64, precision=precision
            )
        from .pallas.panel_scan import make_panel_scan

        return make_panel_scan(
            *shape, dtype=dtype or jnp.complex64, precision=precision
        )
    if kind in ("fused", "fused_fast"):
        if shape is None:
            raise ValueError(f"kind={kind!r} needs shape=(ny, nx)")
        from .pallas.fused_step import make_fused_slice_step

        # Mosaic has no Precision.HIGH lowering; the fast tier uses the
        # kernel's hand-rolled Karatsuba x bf16-split dots instead.
        precision = (
            "bf16x3" if kind == "fused_fast" else jax.lax.Precision.HIGHEST
        )
        return make_fused_slice_step(
            *shape, dtype=dtype or jnp.complex64, precision=precision
        )
    raise ValueError(f"unknown slice-step kind {kind!r}")


def multislice_thickness_series(
    psi0: jax.Array,
    v_stack: jax.Array,
    propagator: jax.Array,
    sigma: float,
    *,
    every: int = 1,
    slice_step: Callable[..., jax.Array] | None = None,
) -> jax.Array:
    """Exit wave after every ``every``-th slice: the thickness series.

    Returns (S // every, ny, nx) waves psi_{every}, psi_{2*every}, ...,
    letting one rollout produce a whole thickness/defocus map (depth
    sectioning) instead of S separate truncated runs.  S must be divisible
    by ``every``.  Same scan body as ``multislice`` — the stacked outputs
    are the only extra memory (O(S/every * N^2)).
    """
    step = slice_step or default_slice_step
    s = v_stack.shape[0]
    if s % every != 0:
        raise ValueError(f"every {every} must divide nslices {s}")
    chunks = v_stack.reshape(s // every, every, *v_stack.shape[1:])

    if hasattr(step, "whole_scan"):
        # whole-loop engine: one fused kernel per ``every``-slice chunk
        # (the loop between outputs still lives inside the kernel)
        def wbody(psi, v_chunk):
            psi = step.whole_scan(psi, v_chunk, propagator, sigma)
            return psi, psi

        return jax.lax.scan(wbody, psi0, chunks)[1]

    def body(psi, v_chunk):
        psi = jax.lax.scan(
            lambda p, v: (step(p, v, propagator, sigma), None), psi, v_chunk
        )[0]
        return psi, psi

    return jax.lax.scan(body, psi0, chunks)[1]


def pick_probe_chunk(
    shape: tuple[int, int], npos: int, method: str = "multislice"
) -> int:
    """Measured-optimum probe batch for STEM rollouts (VERDICT.md round-3
    weak item 2: the optimum lived only in benchmark scripts).

    v5e measurements (tpu_steps.jsonl, 2026-08-20/21): every engine runs
    FASTER at batch 16 than 64 at <=512^2 (radix_fast 20.0k vs 8.8k
    slice-props/s, mxu_fast 18.1k vs 15.9k — bigger wave batches thrash
    VMEM/HBM), and batching actively HURTS at >=1024^2 (xla 676 unbatched
    vs 330 at batch 8: HBM-bound, so shard probes across chips instead).
    PRISM rasters are different: per-probe work is a cheap S-matrix
    contraction with no multislice, so large chunks amortize dispatch
    (config-6 measured at 256).

    Returns a DIVISOR of npos (stem_raster requires divisibility) no
    larger than the measured target.
    """
    target = 256 if method == "prism" else (16 if max(shape) <= 512 else 1)
    if npos <= target:
        return npos
    for d in range(target, 0, -1):
        if npos % d == 0:
            return d
    return 1


def pick_remat_chunk(nslices: int) -> int:
    """Divisor of nslices nearest sqrt(nslices) (sqrt-S remat policy)."""
    if nslices <= 4:
        return nslices
    target = math.sqrt(nslices)
    best = 1
    for d in range(1, nslices + 1):
        if nslices % d == 0 and abs(d - target) < abs(best - target):
            best = d
    return best


def multislice(
    psi0: jax.Array,
    v_stack: jax.Array,
    propagator: jax.Array,
    sigma: float,
    *,
    remat_chunk: int | None = None,
    slice_step: Callable[..., jax.Array] | None = None,
) -> jax.Array:
    """Propagate psi0 through all slices of v_stack; returns the exit wave.

    psi0: (ny, nx) complex; v_stack: (S, ny, nx) real projected potentials
    in V*Å; propagator: (ny, nx) complex band-limited Fresnel factor for the
    (uniform) slice spacing.  remat_chunk: 0/None = no rematerialisation
    (fastest forward, O(S) adjoint memory); 'auto' is available via
    pick_remat_chunk; otherwise must divide S.
    """
    step = slice_step or default_slice_step
    if hasattr(step, "whole_scan"):
        # whole-loop engine (pallas/fused_scan.py): the slice loop lives
        # inside one kernel.  Grad-capable variants (adjoint_scan.py)
        # checkpoint in-kernel, so remat_chunk is subsumed and ignored;
        # forward-only variants reject it loudly.
        if remat_chunk and not getattr(step, "grad_capable", False):
            raise ValueError(
                f"engine {getattr(step, 'kind', 'fscan')!r} is forward-only; "
                "remat_chunk (adjoint memory) needs a per-slice engine or a "
                "grad-capable whole-loop engine (make_slice_step grad=True)"
            )
        return step.whole_scan(psi0, v_stack, propagator, sigma)

    def body(psi, v_slice):
        return step(psi, v_slice, propagator, sigma), None

    s = v_stack.shape[0]
    if not remat_chunk or remat_chunk >= s:
        return jax.lax.scan(body, psi0, v_stack)[0]

    if s % remat_chunk != 0:
        raise ValueError(f"remat_chunk {remat_chunk} must divide nslices {s}")

    inner_len = remat_chunk
    v_chunks = v_stack.reshape(s // inner_len, inner_len, *v_stack.shape[1:])

    @jax.checkpoint
    def inner(psi, v_chunk):
        return jax.lax.scan(body, psi, v_chunk)[0]

    def outer(psi, v_chunk):
        return inner(psi, v_chunk), None

    return jax.lax.scan(outer, psi0, v_chunks)[0]
