"""On-chip engine accuracy: every slice-step engine vs a NumPy f64 reference.

The engine sweep (tpu_steps.py) answers "which is fastest"; this answers
"what does each engine's arithmetic cost in exit-wave error" — the other
half of the data-driven engine selection (SURVEY.md §7 M6).  For each engine
it runs a multislice rollout on the real chip and compares against the same
rollout computed in float64 NumPy on the host (the golden stand-in, exact to
~1e-16).  Also checks grad(pallas) == grad(xla) on hardware — the Pallas
custom-VJP path only ever ran in interpreter mode before round 2
(VERDICT.md round-1 weak item 2).

Appends JSON lines to benchmarks/results/tpu_accuracy.jsonl.

Usage: python benchmarks/tpu_accuracy.py [sizes] [nslices]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "results", "tpu_accuracy.jsonl"
)


def record(rec):
    """One row per (kind, n, nslices, backend), LATEST wins: harness
    re-runs used to append triplicates (noise for any parser —
    VERDICT.md round-3 weak 5); history lives in git."""
    key = lambda r: (  # noqa: E731
        r.get("kind"), r.get("n"), r.get("nslices"), r.get("backend"),
        r.get("engine_grad", True),
    )
    rows = []
    try:
        with open(RESULTS) as fh:
            for line in fh:
                if line.strip():
                    try:
                        rows.append(json.loads(line))
                    except json.JSONDecodeError:
                        pass
    except OSError:
        pass
    rows = [r for r in rows if key(r) != key(rec)]
    rows.append(rec)
    tmp = RESULTS + ".tmp"
    with open(tmp, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    os.replace(tmp, RESULTS)


def reference_multislice(psi0, v, prop, sigma):
    """f64 NumPy multislice — the host-side exact rollout."""
    psi = psi0.astype(np.complex128)
    p = prop.astype(np.complex128)
    for j in range(v.shape[0]):
        psi = psi * np.exp(1j * sigma * v[j].astype(np.float64))
        psi = np.fft.ifft2(np.fft.fft2(psi) * p)
    return psi


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import fdes_tpu as f
    from fdes_tpu.grids import Grid, host_cast
    from fdes_tpu.propagate import make_slice_step, multislice
    from fdes_tpu.tunnel import fetch_array, fetch_scalar, safe_put

    sizes = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "512").split(",")]
    nslices = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    kinds = os.environ.get("FDES_ACC_KINDS", "xla,pallas,mxu,mxu_fast").split(",")

    kv = 300e3
    lam = f.wavelength_A(kv)
    sigma = f.interaction_sigma(kv)
    rng = np.random.default_rng(0)
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)

    for n in sizes:
        grid = Grid(ny=n, nx=n, py=0.1, px=0.1)
        # SMOOTH random potential, ~0.5 rad/slice: white-noise phase screens
        # scatter all power outside the 2/3 band limit and 64 slices
        # annihilate the wave (gradient underflows to 0 — measured), so
        # low-pass the noise to atom-scale features before scaling.
        noise = rng.normal(size=(nslices, n, n))
        qmask = (grid.q2() < (0.15 / grid.px) ** 2).astype(np.float64)
        smooth = np.fft.ifft2(np.fft.fft2(noise, axes=(1, 2)) * qmask, axes=(1, 2)).real
        v_host = (smooth / smooth.std() * (0.5 / sigma)).astype(np.float32)
        prop_host = host_cast(f.fresnel_propagator(grid, lam, 2.0), np.complex128)
        psi0_host = (rng.random((n, n)) + 1j * rng.random((n, n))).astype(
            np.complex64
        )
        ref = reference_multislice(psi0_host, v_host, prop_host, sigma)
        ref_norm = np.linalg.norm(ref)

        v = safe_put(v_host)
        prop = safe_put(prop_host.astype(np.complex64))
        psi0 = safe_put(psi0_host)

        grads = {}
        # FDES_ACC_GRAD=0 requests the forward-only engine variants (the
        # fscan kinds route differently per grad at pod grids, so both
        # paths need their own certification rows)
        grad_engines = os.environ.get("FDES_ACC_GRAD", "1") == "1"
        for kind in kinds:
            step = make_slice_step(kind, shape=(n, n), grad=grad_engines)
            # grad-capable whole-loop engines (adjoint_scan.py) get their
            # grad row measured like the per-slice engines do
            forward_only = hasattr(step, "whole_scan") and not getattr(
                step, "grad_capable", False
            )
            fn = jax.jit(
                lambda p, vv, pr, st=step: multislice(p, vv, pr, sigma, slice_step=st)
            )
            # tries=120: this fetch doubles as the COMPILE barrier, and
            # remote Mosaic compiles can take 15-20+ min (tpu_steps.py)
            psi = fetch_array(fn(psi0, v, prop), tries=120, wait_s=20.0)
            rel = float(np.linalg.norm(psi - ref) / ref_norm)

            # hardware grad-vs-grad on a PHASE-SENSITIVE loss (sum|psi|^2 is
            # conserved by unitary propagation — its gradient is ~0 and the
            # comparison degenerates).  psi0/prop are ARGUMENTS, not
            # closures — closing over a device array forces a trace-time
            # readback (UNIMPLEMENTED through the tunnel).
            if not forward_only:
                gfn = jax.jit(
                    jax.grad(
                        lambda vv, p0, pr, st=step: jnp.sum(
                            jnp.real(
                                multislice(p0, vv, pr, sigma, slice_step=st)
                            )
                            ** 2
                        )
                    )
                )
                grads[kind] = gfn(v, psi0, prop)  # stays on device
            rec = {
                "n": n,
                "nslices": nslices,
                "kind": kind,
                "exit_rel_err_vs_f64": rel,
                "backend": jax.default_backend(),
            }
            if not grad_engines:
                rec["engine_grad"] = False
            if kind != "xla" and kind in grads and "xla" in grads:
                relg = jax.jit(
                    lambda a, b: jnp.linalg.norm(a - b) / jnp.linalg.norm(b)
                )(grads[kind], grads["xla"])
                # grad-compile barrier: same long-budget rationale as above
                rec["grad_rel_err_vs_xla"] = fetch_scalar(
                    relg, tries=120, wait_s=20.0
                )
            print(json.dumps(rec), flush=True)
            record(rec)
    return 0


if __name__ == "__main__":
    sys.exit(main())
