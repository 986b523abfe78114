"""Config-5 streamed forward per engine composition (VERDICT r4 items 1+7).

The contract's pod forward (BASELINE config 5: 2048^2, 512 slices) must
stream the potential (the 8 GiB stack never materialises) — round 4 ran
it only through the xla slice body.  Round 5 lets the streamed scan ride
the engine table; this harness measures the composed path at the exact
contract shape on one chip: xla body vs the panel-staged MXU transform
(panel / panel_fast), unbatched (batching hurts at pod grids —
tpu_steps.jsonl round 3).

Appends JSON lines to benchmarks/results/c5_streamed.jsonl.

Usage: python benchmarks/r5_c5_streamed.py [kinds]   (default xla,panel,panel_fast)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "results", "c5_streamed.jsonl"
)


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import fdes_tpu as f
    from fdes_tpu.grids import Grid, host_cast
    from fdes_tpu.potential import pad_atoms_per_slice, species_factors_rfft
    from fdes_tpu.propagate import make_slice_step, multislice_streamed
    from fdes_tpu.tunnel import fetch_scalar, safe_put

    kinds = (sys.argv[1] if len(sys.argv) > 1 else "xla,panel,panel_fast").split(",")
    n = int(os.environ.get("FDES_C5_N", "2048"))
    s = int(os.environ.get("FDES_C5_S", "512"))
    reps = int(os.environ.get("FDES_C5_REPS", "3"))

    kv = 300e3
    lam = f.wavelength_A(kv)
    sigma = f.interaction_sigma(kv)
    reps_cell = (24, 16, 64) if n >= 1024 else (2, 2, 4)
    spec = f.make_si110_supercell(reps=reps_cell)
    lx, ly, lz = spec.box
    grid = Grid(ny=n, nx=n, py=ly / n, px=lx / n)
    sliced = f.slice_specimen(spec, nslices=s, dz=float(lz) / s)
    x, y, sp, w, _ = pad_atoms_per_slice(sliced, np.float32)
    ff = safe_put(species_factors_rfft(grid, sliced.species).astype(np.float32))
    prop = safe_put(host_cast(f.fresnel_propagator(grid, lam, sliced.dz), np.complex64))
    rng = np.random.default_rng(0)
    psi0 = safe_put(
        (rng.random((n, n)) + 1j * rng.random((n, n))).astype(np.complex64)
    )
    atoms = tuple(safe_put(a) for a in (x, y, sp, w))
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)

    for kind in kinds:
        step = (
            None if kind == "xla"
            else make_slice_step(kind, shape=(n, n), grad=False)
        )

        def fwd(c, psi0, atoms, ffd, prop, st=step):
            out = multislice_streamed(
                psi0 * (1 + c * jnp.complex64(1e-30)), atoms, ffd, prop,
                sigma, shape=(n, n), pixel=(grid.py, grid.px), slice_step=st,
            )
            return jnp.sum(jnp.abs(out) ** 2)

        fn = jax.jit(fwd)
        t0 = time.time()
        acc = fn(jnp.float32(0.0), psi0, atoms, ff, prop)
        fetch_scalar(acc, tries=120, wait_s=20.0)
        compile_s = time.time() - t0
        t0 = time.time()
        acc = jnp.float32(0.0)
        for _ in range(reps):
            acc = fn(acc, psi0, atoms, ff, prop)
        fetch_scalar(acc)
        dt = (time.time() - t0) / reps
        rec = {
            "case": "c5_streamed_forward",
            "kind": kind,
            "grid": n,
            "nslices": s,
            "natoms": int(sliced.x.shape[0]),
            "rollout_s": round(dt, 3),
            "slice_props_per_s": round(s / dt, 1),
            "compile_s": round(compile_s, 1),
            "backend": jax.default_backend(),
        }
        print(json.dumps(rec), flush=True)
        with open(RESULTS, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
