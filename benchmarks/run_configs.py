"""Benchmark harness: BASELINE configs 1-5 -> benchmarks/results/*.json.

Usage:
    python benchmarks/run_configs.py [--configs 1,2,3,4] [--scale full|ci]
                                     [--step xla|pallas|both]

Each config reports the BASELINE.md headline metrics (slice-props/s/chip,
reconstruction iters/s, exit-wave rel-err, scaling efficiency) plus
workload metadata into one JSON file per run.  --scale ci shrinks grids so
the harness itself is testable on CPU; numbers that gate acceptance come
from --scale full on TPU hardware.

Config 5 (pod scale) runs on however many devices are visible: on a pod it
is the real multi-host measurement; on one chip/CPU it degrades to a
single-device sanity run and records that it did (SURVEY.md §4 distributed
tiers keep real-pod runs out of CI).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")


def _timeit(fn, *args, reps=5):
    """Compile once, then steady-state mean seconds per call."""
    out = fn(*args)
    jax_block(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax_block(out)
    return (time.time() - t0) / reps


def jax_block(x):
    import jax

    jax.tree.map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a, x
    )


def _sim(scale, n_full, s_full, n_ci=64, s_ci=8, reps=(4, 3, 3)):
    import jax.numpy as jnp

    import fdes_tpu as f
    from fdes_tpu.grids import Grid, host_cast
    from fdes_tpu.potential import build_potential

    n = n_full if scale == "full" else n_ci
    s = s_full if scale == "full" else s_ci
    spec = f.make_si110_supercell(reps=reps)
    lx, ly, lz = spec.box
    grid = Grid(ny=n, nx=n, py=ly / n, px=lx / n)
    sliced = f.slice_specimen(spec, nslices=s, dz=float(lz) / s)
    kv = 300e3
    lam = f.wavelength_A(kv)
    sigma = f.interaction_sigma(kv)
    v = build_potential(sliced, grid, dtype=jnp.float32)
    # prop/psi0 as HOST numpy: jitted closures embed them as literals; a
    # device-array closure forces a trace-time device->host readback that
    # remote TPU runtimes may not implement (see dft.py docstring)
    prop = host_cast(f.fresnel_propagator(grid, lam, sliced.dz), jnp.complex64)
    psi0 = np.ones(grid.shape, np.complex64)
    return grid, sliced, kv, lam, sigma, v, prop, psi0


def config1(scale, step_kind):
    """Forward exit wave vs f64 golden: correctness + single-rollout speed."""
    import jax
    import jax.numpy as jnp

    import fdes_tpu as f
    from fdes_tpu.golden import golden_multislice, golden_potential_bilinear
    from fdes_tpu.propagate import make_slice_step

    grid, sliced, kv, lam, sigma, v, prop, psi0 = _sim(scale, 256, 16)
    step = make_slice_step(step_kind, shape=grid.shape)
    fwd = jax.jit(lambda p0, vv: f.multislice(p0, vv, prop, sigma, slice_step=step))
    dt = _timeit(fwd, psi0, v, reps=10)
    psi = np.asarray(fwd(psi0, v), np.complex128)

    vg = golden_potential_bilinear(sliced, grid)
    psig = golden_multislice(
        np.ones(grid.shape, np.complex128), vg, grid, kv, sliced.dz
    )
    rel = float(np.linalg.norm(psi - psig) / np.linalg.norm(psig))
    return {
        "exit_wave_rel_err": rel,
        "gate_rel_err": 1e-4 if scale == "ci" else 1e-4,  # c64 device dtype
        "slice_props_per_s": sliced.nslices / dt,
        "step_ms": dt * 1e3,
        "grid": grid.shape,
        "nslices": sliced.nslices,
    }


def config2(scale, step_kind):
    """HRTEM defocus series: batched forward rollouts."""
    import jax
    import jax.numpy as jnp

    import fdes_tpu as f
    from fdes_tpu.grids import host_cast
    from fdes_tpu.propagate import make_slice_step

    grid, sliced, kv, lam, sigma, v, prop, psi0 = _sim(scale, 512, 64)
    defoci = np.linspace(-400, 400, 8)
    ctfs = host_cast(
        f.ctf_series(grid, lam, defoci, f.Aberrations(cs=1.2e7), 20e-3),
        jnp.complex64,
    )
    step = make_slice_step(step_kind, shape=grid.shape)
    fwd = jax.jit(
        lambda vv: f.hrtem_defocus_series(
            vv, jnp.asarray(psi0), jnp.asarray(prop), sigma, jnp.asarray(ctfs),
            slice_step=step,
        )
    )
    dt = _timeit(fwd, v, reps=10)
    return {
        "images_per_s": len(defoci) / dt,
        "slice_props_per_s": sliced.nslices / dt,
        "step_ms": dt * 1e3,
        "grid": grid.shape,
        "nslices": sliced.nslices,
        "ndefoci": len(defoci),
    }


def config3(scale, step_kind):
    """Inverse reconstruction: iters/s + data residual."""
    import jax
    import jax.numpy as jnp
    import optax

    import fdes_tpu as f
    from fdes_tpu.grids import host_cast
    from fdes_tpu.loss import make_loss
    from fdes_tpu.propagate import pick_remat_chunk

    grid, sliced, kv, lam, sigma, v_true, prop, psi0 = _sim(scale, 512, 64)
    defoci = np.linspace(-400, 400, 8)
    ctfs = host_cast(
        f.ctf_series(grid, lam, defoci, f.Aberrations(cs=1.2e7), 20e-3),
        jnp.complex64,
    )
    chunk = pick_remat_chunk(sliced.nslices)
    i_obs = f.hrtem_defocus_series(
        v_true, jnp.asarray(psi0), jnp.asarray(prop), sigma, jnp.asarray(ctfs)
    )
    loss_fn = make_loss(
        lambda v: f.hrtem_defocus_series(
            v, jnp.asarray(psi0), jnp.asarray(prop), sigma, jnp.asarray(ctfs),
            remat_chunk=chunk,
        ),
        i_obs,
    )
    opt = optax.adam(5.0)

    @jax.jit
    def train_step(v, st):
        loss, g = jax.value_and_grad(loss_fn)(v)
        up, st = opt.update(g, st, v)
        return optax.apply_updates(v, up), st, loss

    v = jnp.zeros_like(v_true)
    st = jax.jit(opt.init)(v)
    v, st, loss = train_step(v, st)  # compile
    jax_block(v)
    iters = 20 if scale == "full" else 10
    t0 = time.time()
    for _ in range(iters):
        v, st, loss = train_step(v, st)
    jax_block(v)
    dt = (time.time() - t0) / iters
    return {
        "recon_iters_per_s": 1.0 / dt,
        "iter_ms": dt * 1e3,
        "loss_after": float(loss),
        "grid": grid.shape,
        "nslices": sliced.nslices,
        "remat_chunk": chunk,
    }


def config4(scale, step_kind):
    """STEM raster: per-chip rollout throughput."""
    import jax
    import jax.numpy as jnp

    import fdes_tpu as f
    from fdes_tpu.detector import annular_mask
    from fdes_tpu.grids import host_cast
    from fdes_tpu.propagate import make_slice_step

    grid, sliced, kv, lam, sigma, v, prop, psi0 = _sim(scale, 512, 128)
    nprobes = 4096 if scale == "full" else 32
    chunk = 64 if scale == "full" else 8
    stencil = host_cast(f.probe_stencil(grid, lam, 20e-3), jnp.complex64)
    qy = host_cast(grid.qy()[:, None], jnp.float32)
    qx = host_cast(grid.qx()[None, :], jnp.float32)
    rng = np.random.default_rng(0)
    pos = jnp.asarray(
        (rng.random((nprobes, 2)) * np.array(grid.extent)).astype(np.float32)
    )
    masks = host_cast(
        np.stack(
            [
                annular_mask(grid, lam, 0.0, 20e-3),
                annular_mask(grid, lam, 50e-3, 200e-3),
            ]
        ),
        jnp.float32,
    )
    step = make_slice_step(step_kind, shape=grid.shape)
    fwd = jax.jit(
        lambda vv, p: f.stem_raster(
            vv, jnp.asarray(stencil), jnp.asarray(qy), jnp.asarray(qx), p,
            jnp.asarray(prop), sigma, jnp.asarray(masks), probe_chunk=chunk,
            slice_step=step,
        )
    )
    dt = _timeit(fwd, v, pos, reps=3)
    return {
        "probes_per_s": nprobes / dt,
        "slice_props_per_s": nprobes * sliced.nslices / dt,
        "raster_s": dt,
        "grid": grid.shape,
        "nslices": sliced.nslices,
        "nprobes": nprobes,
    }


def config5(scale, step_kind):
    """Sharded training step over all visible devices: scaling efficiency."""
    import jax
    import jax.numpy as jnp
    import optax

    import fdes_tpu as f
    from fdes_tpu.grids import Grid, host_cast
    from fdes_tpu.loss import l2_mismatch
    from fdes_tpu.sharding import make_mesh, replicated, shard_measurements

    ndev = len(jax.devices())
    n = 2048 if scale == "full" else 64
    s = 512 if scale == "full" else 8
    per_dev = 8 if scale == "full" else 2
    ntilt = per_dev * ndev

    grid = Grid(ny=n, nx=n, py=0.2, px=0.2)
    kv = 300e3
    lam = f.wavelength_A(kv)
    sigma = f.interaction_sigma(kv)
    rng = np.random.default_rng(0)
    v_true = jnp.asarray(rng.normal(size=(s, n, n)).astype(np.float32) * 30.0)
    angs = np.linspace(0, 2 * np.pi, ntilt, endpoint=False)
    tilts = [(0.02 * np.cos(a), 0.02 * np.sin(a)) for a in angs]
    psi0s = jnp.stack([f.plane_wave(grid, lam, dtype=jnp.complex64) for _ in tilts])
    props = jnp.stack(
        [
            jnp.asarray(host_cast(f.fresnel_propagator(grid, lam, 2.0, tilt_xy_rad=t), jnp.complex64))
            for t in tilts
        ]
    )
    ctf1 = host_cast(f.ctf_series(grid, lam, np.array([100.0]))[0], jnp.complex64)
    i_obs = f.hrtem_tilt_series(v_true, psi0s, props, sigma, ctf1)

    def loss_fn(v, psi0s, props, i_obs):
        sim = f.hrtem_tilt_series(
            v, psi0s, props, sigma, jnp.asarray(ctf1), remat_chunk=None
        )
        return l2_mismatch(sim, i_obs)

    opt = optax.adam(1.0)

    @jax.jit
    def train_step(v, st, psi0s, props, i_obs):
        loss, g = jax.value_and_grad(loss_fn)(v, psi0s, props, i_obs)
        up, st = opt.update(g, st, v)
        return optax.apply_updates(v, up), st, loss

    def measure(nd):
        mesh = make_mesh(jax.devices()[:nd])
        k = per_dev * nd
        p0, pr, ob = shard_measurements(mesh, psi0s[:k], props[:k], i_obs[:k])
        v = jax.device_put(jnp.zeros_like(v_true), replicated(mesh))
        st = jax.jit(opt.init)(v)
        v, st, _ = train_step(v, st, p0, pr, ob)
        jax_block(v)
        reps = 5
        t0 = time.time()
        for _ in range(reps):
            v, st, _ = train_step(v, st, p0, pr, ob)
        jax_block(v)
        dt = (time.time() - t0) / reps
        return k / dt  # measurements processed per second

    tput_1 = measure(1)
    tput_n = measure(ndev) if ndev > 1 else tput_1
    eff = tput_n / (ndev * tput_1) if ndev > 1 else 1.0
    return {
        "devices": ndev,
        "tilts_per_s_1dev": tput_1,
        "tilts_per_s_all": tput_n,
        "scaling_efficiency": eff,
        "grid": (n, n),
        "nslices": s,
        "note": "single-device run; efficiency trivially 1.0" if ndev == 1 else "",
    }


CONFIGS = {1: config1, 2: config2, 3: config3, 4: config4, 5: config5}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4")
    ap.add_argument("--scale", default="full", choices=["full", "ci"])
    ap.add_argument("--step", default="xla", choices=["xla", "pallas", "mxu", "all", "both"])
    ap.add_argument("--tag", default="")
    args = ap.parse_args(argv)

    import jax

    os.makedirs(RESULTS_DIR, exist_ok=True)
    steps = {"both": ["xla", "pallas"], "all": ["xla", "pallas", "mxu"]}.get(
        args.step, [args.step]
    )
    results = {}
    for c in [int(x) for x in args.configs.split(",")]:
        for step_kind in steps:
            key = f"config{c}" + (f"_{step_kind}" if len(steps) > 1 else "")
            t0 = time.time()
            results[key] = CONFIGS[c](args.scale, step_kind)
            results[key]["wall_s"] = round(time.time() - t0, 2)
            print(f"{key}: {json.dumps(results[key])}", flush=True)
    payload = {
        "scale": args.scale,
        "step": args.step,
        "backend": jax.default_backend(),
        "devices": len(jax.devices()),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "results": results,
    }
    tag = ("_" + args.tag) if args.tag else ""
    out = os.path.join(
        RESULTS_DIR, f"{time.strftime('%Y%m%d_%H%M%S')}_{args.scale}{tag}.json"
    )
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=2)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
