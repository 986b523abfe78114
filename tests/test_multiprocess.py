"""Real multi-process jax.distributed tier (SURVEY §4 'multi-process
single-machine'): two CPU processes, one coordinator, global mesh psum.

This is the closest a single machine gets to the pod runtime path
(jax.distributed.initialize + cross-process collectives over the
distributed runtime) without TPU hosts.  Heavier than the fake-8-device
tests, so it is one focused smoke test.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc,
        process_id=pid,
    )
    import jax.numpy as jnp
    import numpy as np
    sys.path.insert(0, os.environ["FDES_REPO"])
    from fdes_tpu.sharding import make_mesh, shard_measurements
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == nproc
    mesh = make_mesh()  # one device per process on CPU
    ndev = len(jax.devices())
    assert ndev == nproc, f"{ndev} != {nproc}"

    # ---- a REAL physics train step across process boundaries ----------
    # (VERDICT round-1 weak item 5: the old tier only summed arange).
    # Each process owns half the tilt series; the jitted value_and_grad
    # psums loss and dL/dV across the processes, checked against an
    # independent f64 NumPy evaluation of the same loss.
    import optax

    import fdes_tpu as f
    from fdes_tpu.grids import Grid, host_cast
    from fdes_tpu.loss import l2_mismatch
    from fdes_tpu.sharding import replicated

    kv = 300e3
    n, nslices, ntilt = 32, 4, 2 * ndev
    grid = Grid(ny=n, nx=n, py=0.25, px=0.25)
    lam = f.wavelength_A(kv)
    sigma = f.interaction_sigma(kv)

    rng = np.random.default_rng(0)
    v_true = (rng.normal(size=(nslices, n, n)) * 50.0).astype(np.float32)
    v0_host = (0.3 * v_true).astype(np.float32)
    angs = np.linspace(0, 2 * np.pi, ntilt, endpoint=False)
    tilts = [(0.02 * np.cos(a), 0.02 * np.sin(a)) for a in angs]
    props_host = np.stack(
        [f.fresnel_propagator(grid, lam, 8.0, tilt_xy_rad=t) for t in tilts]
    )
    ctf_host = f.ctf_series(grid, lam, np.array([100.0]))[0]

    def ref_forward(v, prop):  # f64 NumPy reference (exact stand-in)
        psi = np.ones((n, n), np.complex128)
        for j in range(nslices):
            psi = psi * np.exp(1j * sigma * v[j].astype(np.float64))
            psi = np.fft.ifft2(np.fft.fft2(psi) * prop)
        img = np.fft.ifft2(np.fft.fft2(psi) * ctf_host)
        return np.abs(img) ** 2

    i_obs_host = np.stack([ref_forward(v_true, p) for p in props_host])
    # l2_mismatch is 0.5 * sum of squares (loss.py)
    ref_loss = 0.5 * sum(
        float(np.sum((ref_forward(v0_host, p) - io) ** 2))
        for p, io in zip(props_host, i_obs_host)
    )

    sharding = NamedSharding(mesh, P("data"))
    lo, hi = pid * 2, (pid + 1) * 2
    def gshard(a):
        a32 = a.astype(np.complex64 if np.iscomplexobj(a) else np.float32)
        return jax.make_array_from_process_local_data(sharding, a32[lo:hi], a32.shape)
    props = gshard(props_host)
    i_obs = gshard(i_obs_host)
    psi0s = gshard(np.ones((ntilt, n, n), np.complex64))
    ctf1 = jnp.asarray(host_cast(ctf_host, jnp.complex64))
    v0 = jax.device_put(jnp.asarray(v0_host), replicated(mesh))

    def loss_fn(v, psi0s, props, i_obs):
        sim = f.hrtem_tilt_series(v, psi0s, props, sigma, ctf1, remat_chunk=2)
        return l2_mismatch(sim, i_obs)

    opt = optax.adam(1.0)
    opt_state = jax.jit(opt.init)(v0)

    @jax.jit
    def train_step(v, opt_state, psi0s, props, i_obs):
        loss, g = jax.value_and_grad(loss_fn)(v, psi0s, props, i_obs)
        updates, opt_state = opt.update(g, opt_state, v)
        return optax.apply_updates(v, updates), opt_state, loss

    v1, opt_state, loss = train_step(v0, opt_state, psi0s, props, i_obs)
    got = float(loss)
    assert abs(got - ref_loss) / ref_loss < 1e-3, f"{got} != {ref_loss}"
    assert v1.sharding.is_fully_replicated
    _, _, loss2 = train_step(v1, opt_state, psi0s, props, i_obs)
    assert float(loss2) < got, f"loss did not decrease: {got} -> {float(loss2)}"
    # ---- grid-sharded (tensor-parallel) rollout across processes ------
    # the distributed-FFT all_to_all crosses the PROCESS boundary here —
    # the closest single-machine analog of the pod's ICI transpose
    # (gridshard.py; round-3 pod-inverse path).
    from fdes_tpu.gridshard import multislice_gridsharded

    gmesh = make_mesh(axis_names=("grid",))
    rows = n // nproc
    lo_r, hi_r = pid * rows, (pid + 1) * rows
    prop0 = props_host[0].astype(np.complex64)

    def gmake(spec, local, full_shape):
        return jax.make_array_from_process_local_data(
            NamedSharding(gmesh, spec), np.ascontiguousarray(local), full_shape
        )

    psi0_g = gmake(P("grid", None), np.ones((rows, n), np.complex64), (n, n))
    v_g = gmake(
        P(None, "grid", None),
        v_true.astype(np.float32)[:, lo_r:hi_r, :],
        v_true.shape,
    )
    prop_g = gmake(P(None, "grid"), prop0[:, lo_r:hi_r], prop0.shape)

    def ref_exit(v, prop):
        psi = np.ones((n, n), np.complex128)
        for j in range(nslices):
            psi = psi * np.exp(1j * sigma * v[j].astype(np.float64))
            psi = np.fft.ifft2(np.fft.fft2(psi) * prop)
        return psi

    tgt = gmake(
        P(None), ref_exit(v_true, props_host[0]).astype(np.complex64), (n, n)
    )
    rel = jax.jit(
        lambda p0, vv, pr, t: jnp.linalg.norm(
            multislice_gridsharded(p0, vv, pr, sigma, gmesh) - t
        )
        / jnp.linalg.norm(t)
    )(psi0_g, v_g, prop_g, tgt)
    rel = float(rel)
    assert rel < 1e-5, f"grid-sharded exit wave rel-err {rel}"
    print(f"proc {pid}: ok total={got} gridshard_rel={rel:.2e}", flush=True)
    jax.distributed.shutdown()
    """
)



def test_two_process_distributed_psum(tmp_path):
    port = "18765"
    env = dict(os.environ, FDES_REPO=REPO)
    env.pop("XLA_FLAGS", None)  # one device per process, no faking
    env["JAX_PLATFORMS"] = "cpu"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", port],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert "ok total=" in out
