"""Tilt-series dispatch benchmark: ONE batched whole-loop kernel vs the
old per-tilt Python loop of separate jit calls (VERDICT.md round-3 weak 3
"done" gate: a measured tilt-series row on chip).

A tilt series batches the PROPAGATOR (and incident wave) over one shared
potential — the round-4 fscan custom_vmap rule maps that onto the kernel's
batch grid axis, so `vmap(multislice)` over (psi0, prop) is one
pallas_call.  The loop variant dispatches T separate jit calls, which is
what cli.py did before round 4.

Usage: python benchmarks/tilt_series.py [engine=fscan] [n=512] [ntilt=8]
Appends to benchmarks/results/tilt_series.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "results", "tilt_series.jsonl"
)


def main():
    engine = sys.argv[1] if len(sys.argv) > 1 else "fscan"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    ntilt = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    nslices = int(os.environ.get("FDES_TILT_SLICES", "64"))
    reps = int(os.environ.get("FDES_TILT_REPS", "6"))

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import fdes_tpu as f
    from fdes_tpu.grids import Grid, host_cast
    from fdes_tpu.profiling import fetch_scalar
    from fdes_tpu.propagate import make_slice_step, multislice
    from fdes_tpu.tunnel import safe_put

    kv = 300e3
    lam = f.wavelength_A(kv)
    sigma = f.interaction_sigma(kv)
    grid = Grid(ny=n, nx=n, py=0.1, px=0.1)
    rng = np.random.default_rng(0)
    v = safe_put(rng.normal(size=(nslices, n, n)).astype(np.float32) * 30.0)
    angs = np.linspace(0, 2 * np.pi, ntilt, endpoint=False)
    props = safe_put(
        np.stack(
            [
                host_cast(
                    f.fresnel_propagator(grid, lam, 2.0, tilt_xy_rad=(0.02 * np.cos(a), 0.02 * np.sin(a))),
                    np.complex64,
                )
                for a in angs
            ]
        )
    )
    psi0s = safe_put(
        (rng.random((ntilt, n, n)) + 1j * rng.random((ntilt, n, n))).astype(np.complex64)
    )
    step = make_slice_step(engine, shape=(n, n), grad=False, batch=ntilt)
    pick = jax.jit(lambda a: jnp.abs(a.reshape(-1)[:1]))

    # ONE vmapped dispatch (the round-4 path)
    batched = jax.jit(
        lambda p0s, vv, prs: jax.vmap(
            lambda p0, pr: multislice(p0, vv, pr, sigma, slice_step=step)
        )(p0s, prs)
    )
    out = batched(psi0s, v, props)
    fetch_scalar(pick(out), tries=120, wait_s=20.0)
    t0 = time.time()
    for _ in range(reps):
        out = batched(out, v, props)  # chained
    fetch_scalar(pick(out))
    dt_batched = (time.time() - t0) / reps

    # per-tilt loop of separate jit calls (the pre-round-4 cli pattern)
    one = jax.jit(
        lambda p0, vv, pr: multislice(p0, vv, pr, sigma, slice_step=step)
    )
    outs = [one(psi0s[t], v, props[t]) for t in range(ntilt)]
    fetch_scalar(pick(outs[-1]), tries=120, wait_s=20.0)
    t0 = time.time()
    for _ in range(reps):
        outs = [one(outs[t], v, props[t]) for t in range(ntilt)]
    fetch_scalar(pick(outs[-1]))
    dt_loop = (time.time() - t0) / reps

    rec = {
        "n": n,
        "nslices": nslices,
        "ntilt": ntilt,
        "kind": engine,
        "batched_ms": round(dt_batched * 1e3, 3),
        "loop_ms": round(dt_loop * 1e3, 3),
        "speedup": round(dt_loop / dt_batched, 3),
        "slice_props_per_s_batched": round(ntilt * nslices / dt_batched, 1),
        "backend": jax.default_backend(),
        "sync": "fetch",
    }
    print(json.dumps(rec), flush=True)
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    with open(RESULTS, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
