"""Measure the store-s <-> segment-recompute switchover and the
native-chunked vs vmapped batched adjoint (VERDICT.md round-4 items 5+4).

Round 4 guessed _STORE_CAP_BYTES = 2 GiB for the whole-loop adjoint's
backward selection (adjoint_scan.py): store-s (residual = the full
post-transmit wave stack in HBM, zero recompute) vs segment-recompute
(sqrt-S-class checkpoints, 3x MXU work).  This sweep puts a measurement
behind the constant: value_and_grad of the 512^2 rollout across horizon
lengths and batches, BOTH backward variants, fetch-synced on the real
chip.  Also measures the round-5 auto-chunked native batch path (B over
the VMEM carry cap -> internal sequential chunks) against the vmapped
composition at b32/b64.

Appends JSON lines to benchmarks/results/adjoint_sweep.jsonl.

Usage: python benchmarks/r5_adjoint_sweep.py [unit ...]
  units: store-<S>-b<B> | seg-<S>-b<B> | native-b<B> | vmap-b<B>
  (no args = the full planned sweep, skipping units already recorded)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "results", "adjoint_sweep.jsonl"
)

N = 512
PLAN = (
    # (unit, S, B, mode)  mode: store|seg|native|vmap
    [(f"store-{s}-b1", s, 1, "store") for s in (64, 128, 256, 512)]
    + [(f"seg-{s}-b1", s, 1, "seg") for s in (64, 128, 256, 512)]
    + [("store-64-b16", 64, 16, "store"), ("seg-64-b16", 64, 16, "seg"),
       ("store-128-b16", 128, 16, "store"), ("seg-128-b16", 128, 16, "seg")]
    + [("native-b32", 64, 32, "native"), ("vmap-b32", 64, 32, "vmap"),
       ("native-b64", 64, 64, "native"), ("vmap-b64", 64, 64, "vmap")]
)


def done_units():
    done = set()
    try:
        with open(RESULTS) as fh:
            for line in fh:
                try:
                    done.add(json.loads(line)["unit"])
                except (json.JSONDecodeError, KeyError):
                    pass
    except OSError:
        pass
    return done


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
    from fdes_tpu.pallas.adjoint_scan import pick_seg, scan_diff_apply
    from fdes_tpu.profiling import fetch_scalar
    from fdes_tpu.tunnel import safe_put

    units = sys.argv[1:] or [u for u, *_ in PLAN if u not in done_units()]
    plan = {u: (s, b, m) for u, s, b, m in PLAN}
    reps = int(os.environ.get("FDES_SWEEP_REPS", "8"))

    kv = 300e3
    lam = f.wavelength_A(kv)
    sigma = f.interaction_sigma(kv)
    grid = Grid(ny=N, nx=N, py=0.1, px=0.1)
    prop = safe_put(host_cast(f.fresnel_propagator(grid, lam, 2.0), np.complex64))
    rng = np.random.default_rng(0)
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)

    for unit in units:
        s, b, mode = plan[unit]
        v = safe_put(rng.normal(size=(s, N, N)).astype(np.float32) * 30.0)
        shape0 = (b, N, N) if b > 1 else (N, N)
        psi0 = safe_put(
            (rng.random(shape0) + 1j * rng.random(shape0)).astype(np.complex64)
        )
        # store-s residual bytes for the record (the budget the constant
        # gates on): B * S * N^2 * 8
        store_gib = b * s * N * N * 8 / 2**30

        if mode in ("store", "seg"):
            seg = 0 if mode == "store" else pick_seg(s, N)

            def run(c, vv, pr, p0, seg=seg):
                def loss(vs):
                    out = scan_diff_apply(p0, vs, pr, sigma, None, seg=seg)
                    return jnp.sum(jnp.real(out) ** 2)

                l, g = jax.value_and_grad(loss)(vv * (1 + c * 1e-30))
                return l + jnp.sum(jnp.abs(g[0, :1, :1]))

        elif mode == "native":
            # B > cap(16): round-5 internal sequential chunking.  seg=0
            # pinned so both batched compositions ride the same store-s
            # backward (the vmapped path's per-lane budget always picks
            # store-s at these shapes) — the comparison isolates
            # chunked-native-kernel vs pallas-auto-batching dispatch.

            def run(c, vv, pr, p0):
                def loss(vs):
                    out = scan_diff_apply(p0, vs, pr, sigma, None, seg=0)
                    return jnp.sum(jnp.real(out) ** 2)

                l, g = jax.value_and_grad(loss)(vv * (1 + c * 1e-30))
                return l + jnp.sum(jnp.abs(g[0, :1, :1]))

        else:  # vmap: pallas auto-batching of the custom-vjp kernels

            def run(c, vv, pr, p0):
                def loss(vs):
                    out = jax.vmap(
                        lambda p: scan_diff_apply(p, vs, pr, sigma, None, seg=0)
                    )(p0)
                    return jnp.sum(jnp.real(out) ** 2)

                l, g = jax.value_and_grad(loss)(vv * (1 + c * 1e-30))
                return l + jnp.sum(jnp.abs(g[0, :1, :1]))

        fn = jax.jit(run)
        t0 = time.time()
        acc = fn(jnp.float32(0.0), v, prop, psi0)
        fetch_scalar(acc, tries=120, wait_s=20.0)  # compile barrier
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            acc = fn(acc * 1e-30, v, prop, psi0)
        fetch_scalar(acc)
        dt = (time.time() - t0) / reps
        rec = {
            "unit": unit,
            "n": N,
            "nslices": s,
            "batch": b,
            "mode": mode,
            "vng_ms": round(dt * 1e3, 3),
            "slice_grads_per_s": round(b * s / dt, 1),
            "store_resid_gib": round(store_gib, 3),
            "compile_s": round(compile_s, 1),
            "backend": jax.default_backend(),
        }
        print(json.dumps(rec), flush=True)
        with open(RESULTS, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
