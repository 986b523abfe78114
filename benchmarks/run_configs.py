"""Benchmark harness: BASELINE configs 1-5 -> benchmarks/results/*.json.

Usage:
    python benchmarks/run_configs.py [--configs 1,2,3,4] [--scale full|ci]
                                     [--step xla|pallas|mxu|mxu_fast|all|both]

Each config reports the BASELINE.md headline metrics (slice-props/s/chip,
reconstruction iters/s, exit-wave rel-err, scaling efficiency) plus
workload metadata into one JSON file per run.  --scale ci shrinks grids so
the harness itself is testable on CPU; numbers that gate acceptance come
from --scale full on TPU hardware.

Timing methodology (BASELINE.md): on remote-tunnel TPU runtimes
``block_until_ready`` is NOT a reliable completion barrier, so every timed
window here is (a) CHAINED — each call's output feeds the next call's
input through a scalar carry, so calls cannot overlap — and (b) closed by
a scalar device->host FETCH (profiling.fetch_scalar) whose completion
proves the whole chain executed.  Big arrays travel as jit ARGUMENTS
(device_put once), never as closures: a device-array closure forces a
trace-time readback and a multi-MB host closure bloats the HLO payload.

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



def safe_put(x, device=None):
    """Complex-safe device_put (fdes_tpu.tunnel): raw complex transfers
    poison the TPU tunnel, so every upload in this harness routes here."""
    from fdes_tpu.tunnel import safe_put as _sp

    return _sp(x, device)

def _chained_timeit(step, args, reps, compile_tries=120):
    """Steady-state seconds/call of jitted ``step(carry, *args) -> carry``.

    carry is a f32 scalar the step must fold into its inputs (e.g.
    ``x * (1 + carry * 1e-30)``) and produce from its outputs (e.g.
    ``jnp.sum(|out|^2)``) so the timing chain is a real data dependency.
    Returns (seconds_per_call, compile_seconds).
    """
    import jax.numpy as jnp

    from fdes_tpu.profiling import fetch_scalar

    t0 = time.time()
    acc = step(jnp.float32(0.0), *args)
    # Remote compiles can take 15-20+ min during which readback keeps
    # erroring; give the compile barrier a much larger retry budget.
    fetch_scalar(acc, tries=compile_tries, wait_s=20.0)
    compile_s = time.time() - t0
    t0 = time.time()
    acc = jnp.float32(0.0)
    for _ in range(reps):
        acc = step(acc, *args)
    fetch_scalar(acc)
    return (time.time() - t0) / reps, compile_s


def _sim(scale, n_full, s_full, n_ci=64, s_ci=8, reps=(4, 3, 3)):
    import jax
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
    prop = safe_put(
        host_cast(f.fresnel_propagator(grid, lam, sliced.dz), jnp.complex64)
    )
    psi0 = safe_put(np.ones(grid.shape, np.complex64))
    return grid, sliced, kv, lam, sigma, v, prop, psi0


def config1(scale, step_kind):
    """Forward exit wave vs f64 golden: correctness + single-rollout speed."""
    import jax
    import jax.numpy as jnp

    import fdes_tpu as f
    from fdes_tpu.golden import golden_multislice, golden_potential_bilinear
    from fdes_tpu.profiling import fetch_array
    from fdes_tpu.propagate import make_slice_step

    grid, sliced, kv, lam, sigma, v, prop, psi0 = _sim(scale, 256, 16)
    step = make_slice_step(step_kind, shape=grid.shape, grad=False)
    fwd = jax.jit(
        lambda p0, vv, pr: f.multislice(p0, vv, pr, sigma, slice_step=step)
    )
    timed = jax.jit(
        lambda c, p0, vv, pr: jnp.sum(
            jnp.abs(f.multislice(p0 * (1 + c * 1e-30), vv, pr, sigma, slice_step=step))
            ** 2
        )
    )
    dt, compile_s = _chained_timeit(timed, (psi0, v, prop), reps=10)
    psi = fetch_array(fwd(psi0, v, prop)).astype(np.complex128)

    vg = golden_potential_bilinear(sliced, grid)
    psig = golden_multislice(
        np.ones(grid.shape, np.complex128), vg, grid, kv, sliced.dz
    )
    rel = float(np.linalg.norm(psi - psig) / np.linalg.norm(psig))
    return {
        "exit_wave_rel_err": rel,
        # the CONTRACT gate (BASELINE.md:13) — measured c64 runs pass it
        # outright (1.0e-6 on v5e, round 2), so no looser CI gate is
        # advertised (round-1 VERDICT weak item 7)
        "gate_rel_err": 1e-5,
        "gate_pass": bool(rel <= 1e-5),
        "slice_props_per_s": sliced.nslices / dt,
        "step_ms": dt * 1e3,
        "compile_s": round(compile_s, 1),
        "grid": grid.shape,
        "nslices": sliced.nslices,
    }


def _ctf_stack(grid, lam):
    import jax

    import fdes_tpu as f
    from fdes_tpu.grids import host_cast
    import jax.numpy as jnp

    defoci = np.linspace(-400, 400, 8)
    ctfs = safe_put(
        host_cast(
            f.ctf_series(grid, lam, defoci, f.Aberrations(cs=1.2e7), 20e-3),
            jnp.complex64,
        )
    )
    return defoci, ctfs


def config2(scale, step_kind):
    """HRTEM defocus series: batched forward rollouts."""
    import jax
    import jax.numpy as jnp

    import fdes_tpu as f
    from fdes_tpu.propagate import make_slice_step

    grid, sliced, kv, lam, sigma, v, prop, psi0 = _sim(scale, 512, 64)
    defoci, ctfs = _ctf_stack(grid, lam)
    step = make_slice_step(step_kind, shape=grid.shape, grad=False)
    timed = jax.jit(
        lambda c, vv, p0, pr, cs: jnp.sum(
            f.hrtem_defocus_series(
                vv * (1 + c * 1e-30), p0, pr, sigma, cs, slice_step=step
            )
        )
    )
    dt, compile_s = _chained_timeit(timed, (v, psi0, prop, ctfs), reps=10)
    return {
        "images_per_s": len(defoci) / dt,
        "slice_props_per_s": sliced.nslices / dt,
        "step_ms": dt * 1e3,
        "compile_s": round(compile_s, 1),
        "grid": grid.shape,
        "nslices": sliced.nslices,
        "ndefoci": len(defoci),
    }


def config3(scale, step_kind):
    """Inverse reconstruction: iters/s + data residual.

    The optimizer state chains call-to-call by construction, and the final
    loss fetch closes the window — the natural train loop is already a
    valid fetch-synced chain.
    """
    import jax
    import jax.numpy as jnp
    import optax

    import fdes_tpu as f
    from fdes_tpu.loss import make_loss
    from fdes_tpu.profiling import fetch_scalar
    from fdes_tpu.propagate import pick_remat_chunk

    from fdes_tpu.propagate import make_slice_step

    grid, sliced, kv, lam, sigma, v_true, prop, psi0 = _sim(scale, 512, 64)
    defoci, ctfs = _ctf_stack(grid, lam)
    chunk = pick_remat_chunk(sliced.nslices)
    # grad-capable engine for the inverse rollout (unbatched: one shared
    # rollout per step, so the auto tier resolves to the mxu engine)
    step = make_slice_step(step_kind, shape=grid.shape, grad=True)
    # jit the synthesis: eager op-by-op dispatch is pathological through
    # remote-tunnel runtimes (each op a round trip)
    i_obs = jax.jit(
        lambda vv, p0, pr, cs: f.hrtem_defocus_series(
            vv, p0, pr, sigma, cs, slice_step=step
        )
    )(v_true, psi0, prop, ctfs)

    def loss_fn(v, psi0, prop, ctfs, i_obs):
        sim = f.hrtem_defocus_series(
            v, psi0, prop, sigma, ctfs, remat_chunk=chunk, slice_step=step
        )
        return jnp.sum((sim - i_obs) ** 2)

    opt = optax.adam(5.0)

    @jax.jit
    def train_step(v, st, psi0, prop, ctfs, i_obs):
        loss, g = jax.value_and_grad(loss_fn)(v, psi0, prop, ctfs, i_obs)
        up, st = opt.update(g, st, v)
        return optax.apply_updates(v, up), st, loss

    v = jnp.zeros_like(v_true)
    st = jax.jit(opt.init)(v)
    t0 = time.time()
    v, st, loss = train_step(v, st, psi0, prop, ctfs, i_obs)  # compile
    fetch_scalar(loss, tries=120, wait_s=20.0)
    compile_s = time.time() - t0
    iters = 20 if scale == "full" else 10
    t0 = time.time()
    for _ in range(iters):
        v, st, loss = train_step(v, st, psi0, prop, ctfs, i_obs)
    loss_val = fetch_scalar(loss)
    dt = (time.time() - t0) / iters
    return {
        "recon_iters_per_s": 1.0 / dt,
        "iter_ms": dt * 1e3,
        "compile_s": round(compile_s, 1),
        "loss_after": loss_val,
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
    # chunk 16, not 64: EVERY engine measured faster at batch 16 than 64
    # at 512² (radix_fast 20.0k vs 8.8k, mxu_fast 18.1k vs 15.9k — bigger
    # wave batches thrash VMEM/HBM; tpu_steps.jsonl round 3)
    chunk = 16 if scale == "full" else 8
    stencil = safe_put(host_cast(f.probe_stencil(grid, lam, 20e-3), jnp.complex64))
    qy = safe_put(host_cast(grid.qy()[:, None], jnp.float32))
    qx = safe_put(host_cast(grid.qx()[None, :], jnp.float32))
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
            jnp.float32,
        )
    )
    step = make_slice_step(step_kind, shape=grid.shape, grad=False, batch=chunk)
    timed = jax.jit(
        lambda c, vv, p, st, y, x, pr, mk: jnp.sum(
            f.stem_raster(
                vv, st, y, x, p + c * 1e-30, pr, sigma, mk,
                probe_chunk=chunk, slice_step=step,
            )
        )
    )
    dt, compile_s = _chained_timeit(
        timed, (v, pos, stencil, qy, qx, prop, masks), reps=3
    )
    return {
        "probes_per_s": nprobes / dt,
        "slice_props_per_s": nprobes * sliced.nslices / dt,
        "raster_s": dt,
        "compile_s": round(compile_s, 1),
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
    from fdes_tpu.profiling import fetch_scalar
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
    ctf1 = safe_put(
        host_cast(f.ctf_series(grid, lam, np.array([100.0]))[0], jnp.complex64)
    )
    i_obs = jax.jit(
        lambda vv, p0, pr, c1: f.hrtem_tilt_series(vv, p0, pr, sigma, c1)
    )(v_true, psi0s, props, ctf1)

    def loss_fn(v, psi0s, props, ctf1, i_obs):
        sim = f.hrtem_tilt_series(v, psi0s, props, sigma, ctf1, remat_chunk=None)
        return l2_mismatch(sim, i_obs)

    opt = optax.adam(1.0)

    @jax.jit
    def train_step(v, st, psi0s, props, ctf1, i_obs):
        loss, g = jax.value_and_grad(loss_fn)(v, psi0s, props, ctf1, i_obs)
        up, st = opt.update(g, st, v)
        return optax.apply_updates(v, up), st, loss

    def measure(nd):
        mesh = make_mesh(jax.devices()[:nd])
        k = per_dev * nd
        p0, pr, ob = shard_measurements(mesh, psi0s[:k], props[:k], i_obs[:k])
        v = safe_put(jnp.zeros_like(v_true), replicated(mesh))
        st = jax.jit(opt.init)(v)
        v, st, loss = train_step(v, st, p0, pr, ctf1, ob)
        fetch_scalar(loss, tries=120, wait_s=20.0)
        reps = 5
        t0 = time.time()
        for _ in range(reps):
            v, st, loss = train_step(v, st, p0, pr, ctf1, ob)
        fetch_scalar(loss)
        dt = (time.time() - t0) / reps
        return k / dt  # measurements processed per second

    tput_1 = measure(1)
    tput_n = measure(ndev) if ndev > 1 else tput_1
    eff = tput_n / (ndev * tput_1) if ndev > 1 else 1.0
    note = ""
    if ndev == 1:
        note = "single-device run; efficiency trivially 1.0"
    else:
        import os as _os

        cores = _os.cpu_count() or 1
        if jax.default_backend() == "cpu" and ndev > cores:
            note = (
                f"{ndev} VIRTUAL cpu devices on {cores} physical cores: "
                f"this measures sharded-step SEMANTICS, not scaling — "
                f"efficiency is bounded by {cores}/{ndev} = {cores / ndev:.2f}"
            )
    return {
        "devices": ndev,
        "tilts_per_s_1dev": tput_1,
        "tilts_per_s_all": tput_n,
        "scaling_efficiency": eff,
        "grid": (n, n),
        "nslices": s,
        "note": note,
    }


def config6(scale, step_kind):
    """PRISM S-matrix STEM on the config-4 workload (prism.py).

    Times the FULL per-frame pipeline — S-matrix build (one multislice per
    aperture beam) plus probe synthesis + detection for every scan position
    — so the probes/s number is directly comparable to config4's exact
    rollouts.  interp=2 (the standard PRISM dial)."""
    import jax
    import jax.numpy as jnp

    import fdes_tpu as f
    from fdes_tpu.detector import annular_mask
    from fdes_tpu.grids import host_cast
    from fdes_tpu.prism import plan_prism, prism_raster, prism_smatrix
    from fdes_tpu.propagate import make_slice_step

    grid, sliced, kv, lam, sigma, v, prop, psi0 = _sim(scale, 512, 128)
    nprobes = 4096 if scale == "full" else 32
    probe_chunk = 256 if scale == "full" else 8
    interp = 2
    stencil_host = f.probe_stencil(grid, lam, 20e-3)
    plan = plan_prism(grid, stencil_host, interp=interp)
    beam_chunk = next(
        (c for c in range(64, 1, -1) if plan.nbeams % c == 0), None
    )
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
            jnp.float32,
        )
    )
    step = make_slice_step(
        step_kind, shape=grid.shape, grad=False, batch=beam_chunk or 1
    )
    timed = jax.jit(
        lambda c, vv, p, pr, mk: jnp.sum(
            prism_raster(
                prism_smatrix(
                    plan, vv * (1 + c * 1e-30), pr, sigma,
                    beam_chunk=beam_chunk, slice_step=step,
                ),
                plan,
                p,
                mk,
                probe_chunk=probe_chunk,
            )
        )
    )
    dt, compile_s = _chained_timeit(timed, (v, pos, prop, masks), reps=3)

    # PRISM's error vs the exact path at the SAME scale/engine (VERDICT.md
    # round-2 item 8: the 8.8x speedup needs its stated cost) — raster
    # rel-err over all detector signals, fetch-synced.
    from fdes_tpu.forward import stem_raster
    from fdes_tpu.tunnel import fetch_scalar as _fs

    stencil = safe_put(host_cast(stencil_host, jnp.complex64))
    qy = safe_put(host_cast(grid.qy()[:, None], jnp.float32))
    qx = safe_put(host_cast(grid.qx()[None, :], jnp.float32))
    sig_p = jax.jit(
        lambda vv, p, pr, mk: prism_raster(
            prism_smatrix(
                plan, vv, pr, sigma, beam_chunk=beam_chunk, slice_step=step
            ),
            plan, p, mk, probe_chunk=probe_chunk,
        )
    )(v, pos, prop, masks)
    sig_e = jax.jit(
        lambda vv, st, p, pr, mk: stem_raster(
            vv, st, qy, qx, p, pr, sigma, mk,
            probe_chunk=probe_chunk, slice_step=step,
        )
    )(v, stencil, pos, prop, masks)
    rel_err = _fs(
        jax.jit(lambda a, b: jnp.linalg.norm(a - b) / jnp.linalg.norm(b))(
            sig_p, sig_e
        ),
        tries=120, wait_s=20.0,
    )
    return {
        "probes_per_s": nprobes / dt,
        "equiv_slice_props_per_s": nprobes * sliced.nslices / dt,
        "smatrix_rollouts": plan.nbeams,
        "interp": interp,
        "raster_s": dt,
        "compile_s": round(compile_s, 1),
        "raster_rel_err_vs_exact": rel_err,
        "grid": grid.shape,
        "nslices": sliced.nslices,
        "nprobes": nprobes,
    }


def config7(scale, step_kind):
    """4D-STEM ptychographic inverse (beyond-reference modality,
    recon.modality='stem4d'): one adam step of value_and_grad through
    stem_raster_4d against observed CBED stacks — the BATCHED-grad
    context (vmap over probes), which exercises the engine tier the
    defocus-series inverse (config 3) does not."""
    import jax
    import jax.numpy as jnp
    import optax

    import fdes_tpu as f
    from fdes_tpu.forward import stem_raster_4d
    from fdes_tpu.grids import host_cast
    from fdes_tpu.profiling import fetch_scalar
    from fdes_tpu.propagate import make_slice_step, pick_remat_chunk

    grid, sliced, kv, lam, sigma, v_true, prop, psi0 = _sim(scale, 512, 64)
    nprobes = 64 if scale == "full" else 8
    chunk = 16 if scale == "full" else 4
    remat = pick_remat_chunk(sliced.nslices)
    stencil = safe_put(host_cast(f.probe_stencil(grid, lam, 20e-3), jnp.complex64))
    qy = safe_put(host_cast(grid.qy()[:, None], jnp.float32))
    qx = safe_put(host_cast(grid.qx()[None, :], jnp.float32))
    rng = np.random.default_rng(0)
    pos = safe_put(
        (rng.random((nprobes, 2)) * np.array(grid.extent)).astype(np.float32)
    )
    step = make_slice_step(step_kind, shape=grid.shape, grad=True, batch=chunk)

    def fwd(v, stencil, qy, qx, pos, prop):
        return stem_raster_4d(
            v, stencil, qy, qx, pos, prop, sigma,
            probe_chunk=chunk, remat_chunk=remat, slice_step=step,
        )

    i_obs = jax.jit(fwd)(v_true, stencil, qy, qx, pos, prop)

    def loss_fn(v, stencil, qy, qx, pos, prop, i_obs):
        sim = fwd(v, stencil, qy, qx, pos, prop)
        r = sim - i_obs
        return jnp.sum(r * r)

    opt = optax.adam(5.0)

    @jax.jit
    def train_step(v, st, *args):
        loss, g = jax.value_and_grad(loss_fn)(v, *args)
        up, st = opt.update(g, st, v)
        return optax.apply_updates(v, up), st, loss

    v = jnp.zeros_like(v_true)
    st = jax.jit(opt.init)(v)
    args = (stencil, qy, qx, pos, prop, i_obs)
    t0 = time.time()
    v, st, loss = train_step(v, st, *args)
    fetch_scalar(loss, tries=120, wait_s=20.0)
    compile_s = time.time() - t0
    iters = 5 if scale == "full" else 3
    t0 = time.time()
    for _ in range(iters):
        v, st, loss = train_step(v, st, *args)
    loss_val = fetch_scalar(loss)
    dt = (time.time() - t0) / iters
    return {
        "ptycho_iters_per_s": 1.0 / dt,
        "iter_ms": dt * 1e3,
        "probe_grads_per_s": nprobes / dt,
        "compile_s": round(compile_s, 1),
        "loss_after": loss_val,
        "grid": grid.shape,
        "nslices": sliced.nslices,
        "nprobes": nprobes,
        "probe_chunk": chunk,
        "remat_chunk": remat,
    }


CONFIGS = {
    1: config1, 2: config2, 3: config3, 4: config4, 5: config5,
    6: config6, 7: config7,
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4")
    ap.add_argument("--scale", default="full", choices=["full", "ci"])
    ap.add_argument(
        "--step",
        default="auto",
        choices=[
            "auto", "auto_fast", "xla", "pallas", "mxu", "mxu_fast",
            "radix", "radix_fast", "fscan", "fscan_fast", "fused",
            "fused_fast", "all", "both",
        ],
    )
    ap.add_argument("--tag", default="")
    args = ap.parse_args(argv)

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # env var alone loses to the ambient sitecustomize TPU backend
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                ".jax_cache",
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    os.makedirs(RESULTS_DIR, exist_ok=True)
    steps = {"both": ["xla", "pallas"], "all": ["xla", "pallas", "mxu", "mxu_fast"]}.get(
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
