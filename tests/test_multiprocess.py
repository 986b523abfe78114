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

    # global measurement array sharded across processes
    data = np.arange(2 * ndev, dtype=np.float32).reshape(ndev * 2, 1)
    sharding = NamedSharding(mesh, P("data"))
    garr = jax.make_array_from_process_local_data(sharding, data[
        pid * 2:(pid + 1) * 2], data.shape)

    @jax.jit
    def total(x):
        return jnp.sum(x)

    t = total(garr)  # global sum: fully replicated output, fetchable anywhere
    expect = float(data.sum())
    got = float(t)
    assert abs(got - expect) < 1e-6, f"{got} != {expect}"
    print(f"proc {pid}: ok total={got}", flush=True)
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
