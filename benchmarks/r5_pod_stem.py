"""STEM raster at the POD GRID (2048^2) — the config-4 modality at
config-5's field size, riding the panel engine (round 5).

Probes run unbatched (pick_probe_chunk: batching hurts at >=1024^2); each
probe's rollout is a panel whole-loop scan.  Reports probes/s and the
equivalent slice-props/s for a modest probe count (the full 4096-probe
raster extrapolates linearly — probes are embarrassingly parallel and
shard across chips at pod scale, BASELINE config-5 design note).

Appends to benchmarks/results/pod_stem.jsonl.
Usage: python benchmarks/r5_pod_stem.py [kinds=auto_fast,auto,xla] [nprobes=32]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "results", "pod_stem.jsonl"
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
    from fdes_tpu.detector import annular_mask
    from fdes_tpu.grids import Grid, host_cast
    from fdes_tpu.profiling import fetch_scalar
    from fdes_tpu.propagate import make_slice_step
    from fdes_tpu.tunnel import safe_put

    kinds = (sys.argv[1] if len(sys.argv) > 1 else "auto_fast,auto,xla").split(",")
    nprobes = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n, nslices = 2048, 64
    kv = 300e3
    lam = f.wavelength_A(kv)
    sigma = f.interaction_sigma(kv)
    spec = f.make_si110_supercell(reps=(24, 16, 8))
    lx, ly, lz = spec.box
    grid = Grid(ny=n, nx=n, py=ly / n, px=lx / n)
    sliced = f.slice_specimen(spec, nslices=nslices, dz=float(lz) / nslices)
    from fdes_tpu.potential import build_potential

    v = safe_put(np.asarray(build_potential(sliced, grid, dtype=np.float32)))
    prop = safe_put(host_cast(f.fresnel_propagator(grid, lam, sliced.dz), np.complex64))
    stencil = safe_put(host_cast(f.probe_stencil(grid, lam, 20e-3), np.complex64))
    qy = safe_put(host_cast(grid.qy()[:, None], np.float32))
    qx = safe_put(host_cast(grid.qx()[None, :], np.float32))
    rng = np.random.default_rng(0)
    pos = safe_put(
        (rng.random((nprobes, 2)) * np.array(grid.extent)).astype(np.float32)
    )
    masks = safe_put(
        host_cast(
            np.stack(
                [
                    annular_mask(grid, lam, 0.0, 20e-3),
                    annular_mask(grid, lam, 50e-3, 200e-3),
                ]
            ),
            np.float32,
        )
    )
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)

    for kind in kinds:
        step = make_slice_step(kind, shape=(n, n), grad=False, batch=1)

        def run(c, vv, p, st, y, x, pr, mk, s=step):
            return jnp.sum(
                f.stem_raster(
                    vv, st, y, x, p + c * 1e-30, pr, sigma, mk,
                    probe_chunk=1, slice_step=s,
                )
            )

        fn = jax.jit(run)
        t0 = time.time()
        acc = fn(jnp.float32(0.0), v, pos, stencil, qy, qx, prop, masks)
        fetch_scalar(acc, tries=120, wait_s=20.0)
        compile_s = time.time() - t0
        reps = 2
        t0 = time.time()
        acc = jnp.float32(0.0)
        for _ in range(reps):
            acc = fn(acc, v, pos, stencil, qy, qx, prop, masks)
        fetch_scalar(acc)
        dt = (time.time() - t0) / reps
        rec = {
            "case": "pod_stem",
            "kind": kind,
            "grid": n,
            "nslices": nslices,
            "nprobes": nprobes,
            "probes_per_s": round(nprobes / dt, 2),
            "slice_props_per_s": round(nprobes * nslices / dt, 1),
            "compile_s": round(compile_s, 1),
            "backend": jax.default_backend(),
        }
        print(json.dumps(rec), flush=True)
        with open(RESULTS, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
