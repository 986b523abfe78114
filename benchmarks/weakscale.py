"""Weak-scaling proxy curve: the config-5-shaped inverse train step at
1/2/4/8 CPU processes via jax.distributed (VERDICT.md round-3 weak 6: the
multi-host proxy was a 2-point curve; this makes it a measured 4-point
curve with the core-bound caveat stated in the artifact).

Weak scaling: each process owns ``per_proc`` tilts of a reduced-grid
config-5 inverse (replicated V, measurement axis sharded over the global
'data' mesh, one psum per step — the same SPMD program the pod runs), so
ideal scaling keeps seconds/step CONSTANT as processes are added.
Efficiency(N) = t(1) / t(N).

This box has few physical cores, so large N is CPU-oversubscribed — the
curve measures the distributed-runtime semantics + collective overhead
trend, NOT real pod scaling (recorded in the artifact's note, as the
round-3 single-point proxy did).  Real N>=2-host numbers remain an
environmental conditional (SURVEY.md §4).

Usage: python benchmarks/weakscale.py [procs=1,2,4,8] [reps=10]
Writes benchmarks/results/<ts>_weakscale.json.
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import textwrap
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
RES = os.path.join(HERE, "results")

WORKER = textwrap.dedent(
    """
    import os, sys, time
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    reps = int(sys.argv[4]); out_path = sys.argv[5]
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}", num_processes=nproc,
            process_id=pid,
        )
    import jax.numpy as jnp
    import numpy as np
    sys.path.insert(0, os.environ["FDES_REPO"])
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    import fdes_tpu as f
    from fdes_tpu.grids import Grid, host_cast
    from fdes_tpu.loss import l2_mismatch
    from fdes_tpu.sharding import make_mesh, replicated

    # reduced config-5 shape: tilt-series inverse, V replicated, data
    # axis sharded, adam step (run_configs.config5 at 1/16 grid scale)
    kv = 300e3
    n, nslices, per_proc = 128, 32, 2
    ntilt = per_proc * nproc
    grid = Grid(ny=n, nx=n, py=0.2, px=0.2)
    lam = f.wavelength_A(kv)
    sigma = f.interaction_sigma(kv)
    rng = np.random.default_rng(0)
    v_true = (rng.normal(size=(nslices, n, n)) * 30.0).astype(np.float32)
    angs = np.linspace(0, 2 * np.pi, ntilt, endpoint=False)
    tilts = [(0.02 * np.cos(a), 0.02 * np.sin(a)) for a in angs]
    props_host = np.stack(
        [
            host_cast(f.fresnel_propagator(grid, lam, 2.0, tilt_xy_rad=t), np.complex64)
            for t in tilts
        ]
    )
    ctf_host = host_cast(f.ctf_series(grid, lam, np.array([100.0]))[0], np.complex64)

    def ref_forward(v, prop):
        psi = np.ones((n, n), np.complex128)
        for j in range(nslices):
            psi = psi * np.exp(1j * sigma * v[j].astype(np.float64))
            psi = np.fft.ifft2(np.fft.fft2(psi) * prop)
        img = np.fft.ifft2(np.fft.fft2(psi) * ctf_host.astype(np.complex128))
        return (np.abs(img) ** 2).astype(np.float32)

    i_obs_host = np.stack([ref_forward(v_true, p) for p in props_host])

    mesh = make_mesh()
    sharding = NamedSharding(mesh, P("data"))
    lo, hi = pid * per_proc, (pid + 1) * per_proc

    def gshard(a):
        return jax.make_array_from_process_local_data(sharding, a[lo:hi], a.shape)

    props = gshard(props_host)
    i_obs = gshard(i_obs_host)
    psi0s = gshard(np.ones((ntilt, n, n), np.complex64))
    ctf1 = jnp.asarray(ctf_host)
    v0 = jax.device_put(jnp.zeros((nslices, n, n), jnp.float32), replicated(mesh))

    def loss_fn(v, psi0s, props, i_obs):
        sim = f.hrtem_tilt_series(v, psi0s, props, sigma, ctf1, remat_chunk=None)
        return l2_mismatch(sim, i_obs)

    opt = optax.adam(1.0)
    st = jax.jit(opt.init)(v0)

    @jax.jit
    def train_step(v, st, psi0s, props, i_obs):
        loss, g = jax.value_and_grad(loss_fn)(v, psi0s, props, i_obs)
        up, st = opt.update(g, st, v)
        return optax.apply_updates(v, up), st, loss

    v, st, loss = train_step(v0, st, psi0s, props, i_obs)  # compile
    float(loss)
    # second warmup from the POST-step arrays: the first steady-state call
    # can recompile once when output layouts/shardings differ from the
    # freshly-device_put inputs — that one-time cost must not amortize
    # into the timed window (it dominated the 16^2 tiny step when reps
    # was small)
    v, st, loss = train_step(v, st, psi0s, props, i_obs)
    float(loss)
    t0 = time.time()
    for _ in range(reps):
        v, st, loss = train_step(v, st, psi0s, props, i_obs)
    float(loss)  # CPU-local: a plain scalar readback is a real barrier
    dt = (time.time() - t0) / reps

    # ---- decomposition (VERDICT.md round-4 item 6) ----
    # (a) the BARE psum of the gradient-sized buffer: isolates collective
    # cost from XLA compute sharing the cores.  Chained (output feeds
    # input, scaled back by 1/nproc) so calls cannot overlap.
    # psum over the 'data' axis of a sharded dummy whose per-shard block
    # is gradient-sized: every process contributes + receives the full
    # (nslices, n, n) f32 gradient, the step's exact collective payload.
    gs = jax.make_array_from_process_local_data(
        sharding,
        np.ones((per_proc, nslices, n, n), np.float32),
        (ntilt, nslices, n, n),
    )
    psum_fn = jax.jit(
        jax.shard_map(
            lambda x: x * 0.0 + jax.lax.psum(jnp.sum(x, 0), "data")[None]
            * (1.0 / ntilt),
            mesh=mesh, in_specs=P("data"), out_specs=P("data"),
        )
    )
    gs = psum_fn(gs)  # compile
    float(jnp.sum(gs[0, 0, 0]))
    gs = psum_fn(gs)  # steady-state warmup (see train_step note)
    float(jnp.sum(gs[0, 0, 0]))
    t0 = time.time()
    for _ in range(reps):
        gs = psum_fn(gs)
    float(jnp.sum(gs[0, 0, 0]))
    psum_s = (time.time() - t0) / reps

    # (b) a trivially small step (16^2 x 4): compute ~zero by design, so
    # the time is the per-step distributed-runtime floor (dispatch +
    # collective latency), the other bound the core-bound curve lacks.
    tn, tns = 16, 4
    tgrid = Grid(ny=tn, nx=tn, py=0.2, px=0.2)
    tprops_host = np.stack(
        [
            host_cast(f.fresnel_propagator(tgrid, lam, 2.0, tilt_xy_rad=t), np.complex64)
            for t in tilts
        ]
    )
    tctf = jnp.asarray(host_cast(f.ctf_series(tgrid, lam, np.array([100.0]))[0], np.complex64))
    tobs_host = np.ones((ntilt, tn, tn), np.float32)
    tprops = gshard(tprops_host)
    tobs = gshard(tobs_host)
    tpsi0 = gshard(np.ones((ntilt, tn, tn), np.complex64))
    tv0 = jax.device_put(jnp.zeros((tns, tn, tn), jnp.float32), replicated(mesh))

    def tiny_loss(v, psi0s, props, i_obs):
        sim = f.hrtem_tilt_series(v, psi0s, props, sigma, tctf, remat_chunk=None)
        return l2_mismatch(sim, i_obs)

    tst = jax.jit(opt.init)(tv0)

    @jax.jit
    def tiny_step(v, st, psi0s, props, i_obs):
        loss, g = jax.value_and_grad(tiny_loss)(v, psi0s, props, i_obs)
        up, st = opt.update(g, st, v)
        return optax.apply_updates(v, up), st, loss

    tv, tst, tl = tiny_step(tv0, tst, tpsi0, tprops, tobs)
    float(tl)
    tv, tst, tl = tiny_step(tv, tst, tpsi0, tprops, tobs)  # steady state
    float(tl)
    t0 = time.time()
    for _ in range(reps):
        tv, tst, tl = tiny_step(tv, tst, tpsi0, tprops, tobs)
    float(tl)
    tiny_s = (time.time() - t0) / reps

    if pid == 0:
        with open(out_path, "w") as fh:
            json.dump({"nproc": nproc, "ntilt": ntilt, "step_s": dt,
                       "psum_grad_s": psum_s, "tiny_step_s": tiny_s}, fh)
    if nproc > 1:
        jax.distributed.shutdown()
    """
)


def run_point(nproc, reps, port):
    env = dict(os.environ, FDES_REPO=REPO, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # one real CPU device per process
    # one core per process (taskset, wrapping at the core count): without
    # pinning every process's XLA thread pool fights over all cores and
    # even the nproc=2 point measures thrash, not collectives (measured
    # 0.37 unpinned vs pinned).  Beyond cores, processes share by design
    # (the artifact's oversubscription note).
    cores = os.cpu_count() or 1
    pin = shutil.which("taskset")
    with tempfile.TemporaryDirectory() as td:
        script = os.path.join(td, "worker.py")
        with open(script, "w") as fh:
            fh.write("import json\n" + WORKER)
        out_path = os.path.join(td, "out.json")
        procs = [
            subprocess.Popen(
                ([pin, "-c", str(pid % cores)] if pin else [])
                + [sys.executable, script, str(pid), str(nproc), port,
                   str(reps), out_path],
                env=env,
            )
            for pid in range(nproc)
        ]
        for p in procs:
            if p.wait(timeout=1200) != 0:
                raise RuntimeError(f"worker failed at nproc={nproc}")
        with open(out_path) as fh:
            return json.load(fh)


def main():
    procs = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1,2,4,8").split(",")]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(RES, exist_ok=True)
    points = []
    for np_ in procs:
        r = run_point(np_, reps, port=str(18800 + np_))
        points.append(r)
        print(json.dumps(r), flush=True)
    t1 = points[0]["step_s"]
    for r in points:
        r["weak_efficiency_vs_1proc"] = round(t1 / r["step_s"], 4)
    cores = os.cpu_count() or 1
    payload = {
        "workload": "config5-shaped tilt inverse, 128^2 x 32 slices, "
                    "2 tilts/process, replicated V, 'data'-sharded series, "
                    "one psum/step (weak scaling: ideal = constant step_s)",
        "physical_cores": cores,
        "note": (
            f"CPU proxy on {cores} physical cores: points with nproc > "
            f"{cores} are CPU-oversubscribed, so efficiency there bounds "
            "collective/runtime overhead UNDER contention, not pod scaling "
            "(real N>=2-host runs are environmentally unavailable; "
            "SURVEY.md §4)"
        ),
        "decomposition_note": (
            "psum_grad_s isolates the step's collective: one psum of the "
            "full (32,128,128) f32 gradient payload per process, no XLA "
            "compute sharing the core.  tiny_step_s is the full train "
            "step at 16^2x4 — compute ~zero by design, so it is the "
            "per-step distributed-runtime floor (dispatch + collective "
            "latency) under the same contention.  step_s - tiny-floor "
            "bounds what is compute/core contention vs runtime overhead "
            "(VERDICT.md round-4 item 6)."
        ),
        "points": points,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    out = os.path.join(RES, f"{time.strftime('%Y%m%d_%H%M%S')}_weakscale.json")
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=2)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
