"""Pod-memory proof on one chip (SURVEY.md §7 'adjoint memory at S=512').

Demonstrates on real HBM (v5e, 16 GiB) that the two memory policies hold at
contract scale (BASELINE config 5: 2048^2 grid, 512 slices):

1. FORWARD, streamed potential: `multislice_streamed` builds each V_j
   inside the scan from the atom arrays — the (512, 2048, 2048) f32 stack
   (8 GiB) never materialises.  Run with a 16-probe batch (16 x 32 MiB
   waves resident).
2. ADJOINT, sqrt-S remat: `jax.grad` through the scan with chunked
   `jax.checkpoint` — stored state is O(sqrt(S)) waves instead of O(S).
   Exercised at 2048^2 x 128 slices (V 2 GiB + grad 2 GiB + ~12 stashed
   waves) and 1024^2 x 512 slices (the full contract slice horizon).
   The full 2048^2 x 512 INVERSE needs V+grad = 16 GiB before waves — on a
   pod that is what gridshard row-sharding (TP over the grid axis) or
   host-sharded V accumulation is for (SURVEY.md §5 comm row); a single
   v5e chip cannot hold it and this harness says so instead of faking it.

Appends JSON lines to benchmarks/results/pod_memory.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "results", "pod_memory.jsonl"
)


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
    from fdes_tpu.potential import pad_atoms_per_slice, species_factors_rfft
    from fdes_tpu.propagate import multislice, multislice_streamed, pick_remat_chunk
    from fdes_tpu.tunnel import fetch_scalar, safe_put

    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    kv = 300e3
    lam = f.wavelength_A(kv)
    sigma = f.interaction_sigma(kv)
    results = []

    def record(rec):
        rec["backend"] = jax.default_backend()
        print(json.dumps(rec), flush=True)
        with open(RESULTS, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        results.append(rec)

    # ---- 1. streamed forward at FULL pod shape: 2048^2, 512 slices -------
    n = int(os.environ.get("FDES_POD_N", "2048"))
    s = int(os.environ.get("FDES_POD_S", "512"))
    nprobes = int(os.environ.get("FDES_POD_PROBES", "16"))
    reps_cell = (24, 16, 64) if n >= 1024 else (2, 2, 4)
    spec = f.make_si110_supercell(reps=reps_cell)  # ~200k atoms at full scale
    lx, ly, lz = spec.box
    grid = Grid(ny=n, nx=n, py=ly / n, px=lx / n)
    sliced = f.slice_specimen(spec, nslices=s, dz=float(lz) / s)
    x, y, sp, w, _ = pad_atoms_per_slice(sliced, np.float32)
    ff = species_factors_rfft(grid, sliced.species).astype(np.float32)
    prop = safe_put(host_cast(f.fresnel_propagator(grid, lam, sliced.dz), np.complex64))
    rng = np.random.default_rng(0)
    psi0 = safe_put(
        (rng.random((nprobes, n, n)) + 1j * rng.random((nprobes, n, n))).astype(
            np.complex64
        )
    )
    atoms = tuple(safe_put(a) for a in (x, y, sp, w))
    ffd = safe_put(ff)

    def fwd(c, psi0, atoms, ffd, prop):
        roll = lambda p0: multislice_streamed(  # noqa: E731
            p0 * (1 + c * jnp.complex64(1e-30)), atoms, ffd, prop, sigma,
            shape=(n, n), pixel=(grid.py, grid.px),
        )
        return jnp.sum(jnp.abs(jax.vmap(roll)(psi0)) ** 2)

    step = jax.jit(fwd)
    t0 = time.time()
    acc = step(jnp.float32(0.0), psi0, atoms, ffd, prop)
    fetch_scalar(acc, tries=120, wait_s=20.0)
    compile_s = time.time() - t0
    reps = 2
    t0 = time.time()
    acc = jnp.float32(0.0)
    for _ in range(reps):
        acc = step(acc, psi0, atoms, ffd, prop)
    fetch_scalar(acc)
    dt = (time.time() - t0) / reps
    record(
        {
            "case": "streamed_forward",
            "grid": n,
            "nslices": s,
            "nprobes": nprobes,
            "natoms": int(sliced.x.shape[0]),
            "slice_props_per_s": round(nprobes * s / dt, 1),
            "rollout_s": round(dt, 3),
            "compile_s": round(compile_s, 1),
            "note": "potential stack (8 GiB) never materialised",
        }
    )
    del psi0, atoms, ffd

    # ---- 2. remat adjoint at contract-scale grids -------------------------
    adj = os.environ.get("FDES_POD_ADJ", "2048x128,1024x512")
    for n2, s2 in (tuple(int(v) for v in c.split("x")) for c in adj.split(",")):
        grid2 = Grid(ny=n2, nx=n2, py=0.1, px=0.1)
        chunk = pick_remat_chunk(s2)
        v = safe_put(rng.normal(size=(s2, n2, n2)).astype(np.float32) * 30.0)
        prop2 = safe_put(
            host_cast(f.fresnel_propagator(grid2, lam, 2.0), np.complex64)
        )
        p0 = safe_put(
            (rng.random((n2, n2)) + 1j * rng.random((n2, n2))).astype(np.complex64)
        )

        def loss(vv, p0, pr):
            psi = multislice(p0, vv, pr, sigma, remat_chunk=chunk)
            return jnp.sum(jnp.real(psi) ** 2)

        gfn = jax.jit(jax.grad(loss))
        t0 = time.time()
        g = gfn(v, p0, prop2)
        gnorm = fetch_scalar(
            jax.jit(lambda a: jnp.linalg.norm(a.ravel()[:1048576]))(g),
            tries=120,
            wait_s=20.0,
        )
        record(
            {
                "case": "remat_adjoint",
                "grid": n2,
                "nslices": s2,
                "remat_chunk": chunk,
                "grad_finite": bool(np.isfinite(gnorm)),
                "wall_s": round(time.time() - t0, 1),
                "note": f"V+grad {2 * s2 * n2 * n2 * 4 / 2**30:.1f} GiB resident, "
                f"~{chunk + s2 // chunk} stashed waves",
            }
        )
        del v, g, prop2, p0
    return 0


if __name__ == "__main__":
    sys.exit(main())
