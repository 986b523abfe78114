"""Pod-scale (config-5) grid-sharded inverse: sharded memory math, proven
by AOT compilation (VERDICT.md round-2 missing item 1 "Done" artifact).

BASELINE.md records that the 2048²×512 inverse needs V+grad = 16 GiB
before any waves — impossible replicated on one v5e chip (16 GiB HBM).
This harness compiles the FULL grid-sharded train step (value_and_grad
through hrtem_defocus_series_gridsharded + adam update, V row-sharded
over an 8-device 'grid' mesh) at the exact contract shape WITHOUT running
it, and records:

* the analytic per-device breakdown (V / grad / adam moments / waves);
* the compiler's own per-device memory analysis where the backend
  reports one (CPU fallback: argument/output/temp byte totals).

Appends one JSON record to benchmarks/results/gridshard_memory.json.

Usage: python benchmarks/gridshard_memory.py [n_grid=2048] [nslices=512]
       [ndev=8]
(Run on the CPU backend: XLA_FLAGS=--xla_force_host_platform_device_count=8
 JAX_PLATFORMS=cpu; the sharding/memory math is backend-independent.)
"""

import datetime
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "results", "gridshard_memory.json"
)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    nslices = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    ndev = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", ndev)

    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    import fdes_tpu as f
    from fdes_tpu.grids import Grid
    from fdes_tpu.gridshard import hrtem_defocus_series_gridsharded
    from fdes_tpu.loss import l2_mismatch
    from fdes_tpu.propagate import pick_remat_chunk
    from fdes_tpu.sharding import make_mesh

    mesh = make_mesh(jax.devices()[:ndev], axis_names=("grid",))
    grid = Grid(ny=n, nx=n, py=0.1, px=0.1)
    lam = f.wavelength_A(300e3)
    sigma = f.interaction_sigma(300e3)
    chunk = pick_remat_chunk(nslices)
    opt = optax.adam(1.0)

    sh = lambda spec, shape, dt: jax.ShapeDtypeStruct(  # noqa: E731
        shape, dt, sharding=NamedSharding(mesh, spec)
    )
    v_t = sh(P(None, "grid", None), (nslices, n, n), jnp.float32)
    psi_t = sh(P("grid", None), (n, n), jnp.complex64)
    prop_t = sh(P(None, "grid"), (n, n), jnp.complex64)
    ctf_t = sh(P(None, None, "grid"), (1, n, n), jnp.complex64)
    obs_t = sh(P(None, "grid", None), (1, n, n), jnp.float32)
    opt_t = jax.eval_shape(opt.init, v_t)

    def loss_fn(v, i_obs, psi0, prop, ctfs):
        sim = hrtem_defocus_series_gridsharded(
            v, psi0, prop, sigma, ctfs, mesh, remat_chunk=chunk
        )
        return l2_mismatch(sim, i_obs)

    def train_step(v, opt_state, i_obs, psi0, prop, ctfs):
        loss, g = jax.value_and_grad(loss_fn)(v, i_obs, psi0, prop, ctfs)
        updates, opt_state = opt.update(g, opt_state, v)
        return optax.apply_updates(v, updates), opt_state, loss

    lowered = jax.jit(train_step, donate_argnums=(0, 1)).lower(
        v_t, opt_t, obs_t, psi_t, prop_t, ctf_t
    )
    compiled = lowered.compile()
    mem = None
    try:
        ma = compiled.memory_analysis()
        if ma is not None:
            mem = {
                k: int(getattr(ma, k))
                for k in (
                    "argument_size_in_bytes",
                    "output_size_in_bytes",
                    "temp_size_in_bytes",
                    "generated_code_size_in_bytes",
                )
                if hasattr(ma, k)
            }
    except Exception as e:  # noqa: BLE001 — backend-dependent API
        mem = {"unavailable": str(e)}

    gib = 1 / 2**30
    full_v = nslices * n * n * 4
    wave = n * n * 8
    rec = {
        "date": datetime.datetime.now().isoformat(timespec="seconds"),
        "config": f"{n}x{n}x{nslices}, 1-defocus inverse, adam, remat_chunk={chunk}",
        "mesh": f"('grid',)={ndev}",
        "compiled": True,
        "analytic_per_device_GiB": {
            "V_shard": round(full_v / ndev * gib, 3),
            "grad_shard": round(full_v / ndev * gib, 3),
            "adam_moments": round(2 * full_v / ndev * gib, 3),
            "wave_blocks_remat": round(
                (nslices // chunk + chunk) * wave / ndev * gib, 3
            ),
            "total": round(
                (4 * full_v + (nslices // chunk + chunk) * wave) / ndev * gib, 3
            ),
        },
        "analytic_replicated_GiB": {
            "V_plus_grad": round(2 * full_v * gib, 3),
            "with_adam": round(4 * full_v * gib, 3),
        },
        "compiler_memory_analysis_bytes": mem,
        "note": (
            "row-sharded V/grad/moments scale 1/n_devices; the replicated "
            "DP path needs 16 GiB V+grad (32 GiB with adam) per device — "
            "over a v5e chip's HBM.  8-way grid sharding fits in ~4.1 GiB."
        ),
    }
    print(json.dumps(rec, indent=1))
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    with open(RESULTS, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
