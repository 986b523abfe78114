"""Inverse tilt tomography at the POD GRID (2048^2) — round 4's 1024^2
tilt-inverse row, one grid up, on the panel engine.

One adam step = value_and_grad over a T-tilt HRTEM series (per-tilt
propagators) + update.  The vmapped whole-loop store-s panel adjoint
carries a per-LANE s-stack residual (T x S x 32 MiB at 2048^2), so the
shape is sized to the budget: T=4 tilts x 32 slices = 4 GiB residual.

Appends to benchmarks/results/pod_tilt_inverse.jsonl.
Usage: python benchmarks/r5_pod_tilt_inverse.py [kinds=panel_fast,panel,xla]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "results",
    "pod_tilt_inverse.jsonl",
)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import fdes_tpu as f
    from fdes_tpu.grids import Grid, host_cast
    from fdes_tpu.loss import l2_mismatch
    from fdes_tpu.profiling import fetch_scalar
    from fdes_tpu.propagate import make_slice_step
    from fdes_tpu.tunnel import safe_put

    kinds = (sys.argv[1] if len(sys.argv) > 1 else "panel_fast,panel,xla").split(",")
    n, nslices, ntilt = 2048, 32, 4
    kv = 300e3
    lam = f.wavelength_A(kv)
    sigma = f.interaction_sigma(kv)
    grid = Grid(ny=n, nx=n, py=0.1, px=0.1)
    rng = np.random.default_rng(0)
    v0 = safe_put(rng.normal(size=(nslices, n, n)).astype(np.float32) * 30.0)
    angs = np.linspace(0, np.pi, ntilt, endpoint=False)
    props = safe_put(
        np.stack(
            [
                host_cast(
                    f.fresnel_propagator(
                        grid, lam, 2.0, tilt_xy_rad=(0.03 * np.cos(a), 0.03 * np.sin(a))
                    ),
                    np.complex64,
                )
                for a in angs
            ]
        )
    )
    psi0s = safe_put(np.ones((ntilt, n, n), np.complex64))
    ctf = safe_put(host_cast(f.ctf_series(grid, lam, np.array([100.0]))[0], np.complex64))
    i_obs = safe_put(rng.random((ntilt, n, n)).astype(np.float32))
    opt = optax.adam(1.0)
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)

    for kind in kinds:
        step = make_slice_step(kind, shape=(n, n), grad=True, batch=1)

        def loss_fn(v, psi0s, props, ctf_a, i_obs, st=step, kd=kind):
            # FDES_TILT_SEQ=0 measures the vmapped composition instead
            # of the sequential map.  ctf travels as an ARGUMENT: a
            # device-array closure forces a trace-time readback —
            # UNIMPLEMENTED through the tunnel (poisons the process;
            # fdes_tpu/tunnel.py — this bug cost one measurement round)
            sim = f.hrtem_tilt_series(
                v, psi0s, props, sigma, ctf_a, slice_step=st,
                remat_chunk=8 if st is None else None,
                sequential=(kd.startswith("panel")
                            and os.environ.get("FDES_TILT_SEQ", "1") == "1"),
            )
            return l2_mismatch(sim, i_obs)

        @jax.jit
        def train_step(v, opt_state, psi0s, props, ctf_a, i_obs):
            loss, g = jax.value_and_grad(loss_fn)(v, psi0s, props, ctf_a, i_obs)
            updates, opt_state = opt.update(g, opt_state, v)
            return optax.apply_updates(v, updates), opt_state, loss

        st0 = jax.jit(opt.init)(v0)
        t0 = time.time()
        v, st_, loss = train_step(v0, st0, psi0s, props, ctf, i_obs)
        fetch_scalar(loss, tries=120, wait_s=20.0)
        compile_s = time.time() - t0
        v, st_, loss = train_step(v, st_, psi0s, props, ctf, i_obs)  # steady warmup
        fetch_scalar(loss)
        reps = 4
        t0 = time.time()
        for _ in range(reps):
            v, st_, loss = train_step(v, st_, psi0s, props, ctf, i_obs)
        fetch_scalar(loss)
        dt = (time.time() - t0) / reps
        rec = {
            "case": "pod_tilt_inverse",
            "kind": kind,
            "grid": n,
            "nslices": nslices,
            "ntilt": ntilt,
            "iter_ms": round(dt * 1e3, 1),
            "tilt_grads_per_s": round(ntilt / dt, 2),
            "compile_s": round(compile_s, 1),
            "backend": jax.default_backend(),
        }
        print(json.dumps(rec), flush=True)
        with open(RESULTS, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
