"""Fetch-synced slice-step engine comparison on the real chip.

Times xla / pallas / mxu rollouts at several grid sizes with the only
trustworthy barrier on remote-tunnel TPUs: a scalar fetch at the end of a
dependency chain (block_until_ready is not a reliable completion barrier
there).  Appends one JSON line per measurement to
benchmarks/results/tpu_steps.jsonl.

Usage: python benchmarks/tpu_steps.py [kinds [sizes]]
       e.g. python benchmarks/tpu_steps.py xla,pallas 256,512
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "results", "tpu_steps.jsonl"
)


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # env var alone loses to the ambient sitecustomize backend
        jax.config.update("jax_platforms", "cpu")
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

    kinds = (sys.argv[1] if len(sys.argv) > 1 else "xla,pallas,mxu").split(",")
    sizes = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "256,512").split(",")]
    nslices = int(os.environ.get("FDES_STEPS_SLICES", "64"))
    reps = int(os.environ.get("FDES_STEPS_REPS", "8"))
    batch = int(os.environ.get("FDES_STEPS_BATCH", "1"))  # waves per rollout

    kv = 300e3
    lam = f.wavelength_A(kv)
    sigma = f.interaction_sigma(kv)
    rng = np.random.default_rng(0)
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)

    for n in sizes:
        grid = Grid(ny=n, nx=n, py=0.1, px=0.1)
        # safe_put, not device_put: complex transfers are UNIMPLEMENTED on
        # the tunnel and poison the process (fdes_tpu/tunnel.py).
        v = safe_put(rng.normal(size=(nslices, n, n)).astype(np.float32) * 30.0)
        prop = safe_put(host_cast(f.fresnel_propagator(grid, lam, 2.0), jnp.complex64))
        shape0 = (batch, n, n) if batch > 1 else (n, n)
        psi0 = safe_put(
            (
                rng.random(shape0) + 1j * rng.random(shape0)
            ).astype(np.complex64)
        )
        grad_mode = os.environ.get("FDES_STEPS_GRAD", "0") == "1"
        for kind in kinds:
            step = make_slice_step(kind, shape=(n, n), grad=grad_mode, batch=batch)

            # FDES_STEPS_REMAT=k adds sqrt-S-style chunked remat to the
            # grad rollout (config-3's composition): measuring engines
            # with AND without it attributes the per-slice-VJP train-step
            # regression (VERDICT.md round-3 weak 1)
            remat = int(os.environ.get("FDES_STEPS_REMAT", "0")) or None
            if grad_mode:
                # FDES_STEPS_GRAD=1: time one value_and_grad of a scalar
                # loss through the rollout — the inverse-path unit the
                # engine selection for grad contexts must be measured on
                # (VERDICT.md round-3 next item 3).  The carry chains
                # through V so calls cannot overlap; psi0 travels as an
                # ARGUMENT (a device-array closure needs a trace-time
                # readback — tunnel-hostile).
                def run(c, vv, pr, p0, st=step):
                    def loss(vs):
                        roll = lambda q: multislice(  # noqa: E731
                            q, vs, pr, sigma, slice_step=st, remat_chunk=remat
                        )
                        out = jax.vmap(roll)(p0) if batch > 1 else roll(p0)
                        return jnp.sum(jnp.real(out) ** 2)

                    l, g = jax.value_and_grad(loss)(vv * (1 + c * 1e-30))
                    return l + jnp.sum(jnp.abs(g[0, :1, :1]))

                args = (v, prop, psi0)
                x0 = jnp.float32(0.0)
            else:

                def run(p, vv, pr, st=step):
                    roll = lambda p0: multislice(p0, vv, pr, sigma, slice_step=st)  # noqa: E731
                    return jax.vmap(roll)(p) if batch > 1 else roll(p)

                args = (v, prop)
                x0 = psi0

            fn = jax.jit(run)
            pick = jax.jit(lambda a: jnp.abs(a.reshape(-1)[:1]))
            t0 = time.time()
            p = fn(x0, *args)
            # fetch a single element: completion barrier for the compile run.
            # Remote compiles can take 15-20+ min during which readback keeps
            # erroring, so this barrier gets a much larger retry budget.
            fetch_scalar(pick(p), tries=120, wait_s=20.0)
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(reps):
                p = fn(p, *args)  # chained: output feeds input
            fetch_scalar(pick(p))
            dt = (time.time() - t0) / reps
            rec = {
                "n": n,
                "nslices": nslices,
                "batch": batch,
                "kind": kind,
                "rollout_ms": round(dt * 1e3, 3),
                "slice_props_per_s": round(batch * nslices / dt, 1),
                "compile_s": round(compile_s, 1),
                "backend": jax.default_backend(),
                "sync": "fetch",
            }
            if grad_mode:
                rec["mode"] = "value_and_grad"
                if remat:
                    rec["remat_chunk"] = remat
            print(json.dumps(rec), flush=True)
            with open(RESULTS, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
