"""Capture a jax.profiler trace of one engine's rollout on the chip, and
summarize device time per op from the perfetto JSON if the runtime emits
one (VERDICT.md round-2 item 2: back the roofline-gap analysis with a
trace).

Usage: python benchmarks/trace_engine.py [engine=fscan_fast] [n=512]
       [nslices=64] [batch=16]
Writes benchmarks/results/trace_<engine>_<n>/ and prints a device-time
summary when a *.trace.json.gz lands.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize(logdir):
    paths = glob.glob(
        os.path.join(logdir, "plugins", "profile", "*", "*.trace.json.gz")
    )
    if not paths:
        print(f"# no trace.json.gz under {logdir}; open the xplane.pb in xprof")
        return
    with gzip.open(paths[0], "rt") as fh:
        data = json.load(fh)
    # device-track events only: trace json marks TPU op tracks by pid name
    pid_names = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
    by_name = defaultdict(float)
    total = 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "Device" not in pname:
            continue
        dur = float(ev.get("dur", 0.0))
        by_name[ev.get("name", "?")] += dur
        total += dur
    print(f"# device time total {total / 1e3:.2f} ms across {len(by_name)} ops")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{dur / 1e3:10.2f} ms  {100 * dur / max(total, 1e-9):5.1f}%  {name[:110]}")


def main():
    engine = sys.argv[1] if len(sys.argv) > 1 else "fscan_fast"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    nslices = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    batch = int(sys.argv[4]) if len(sys.argv) > 4 else 16

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import fdes_tpu as f
    from fdes_tpu.grids import Grid, host_cast
    from fdes_tpu.propagate import make_slice_step, multislice
    from fdes_tpu.tunnel import fetch_scalar, safe_put

    logdir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results", f"trace_{engine}_{n}"
    )
    grid = Grid(ny=n, nx=n, py=0.1, px=0.1)
    lam = f.wavelength_A(300e3)
    sigma = f.interaction_sigma(300e3)
    rng = np.random.default_rng(0)
    v = safe_put(rng.normal(size=(nslices, n, n)).astype(np.float32) * 30.0)
    prop = safe_put(host_cast(f.fresnel_propagator(grid, lam, 2.0), jnp.complex64))
    shape0 = (batch, n, n) if batch > 1 else (n, n)
    psi0 = safe_put(
        (rng.random(shape0) + 1j * rng.random(shape0)).astype(np.complex64)
    )
    grad_mode = os.environ.get("FDES_TRACE_GRAD", "0") == "1"
    step = make_slice_step(engine, shape=(n, n), grad=grad_mode, batch=batch)

    if grad_mode:
        # FDES_TRACE_GRAD=1: trace the value_and_grad unit (the config-3
        # inverse shape) instead of the plain forward — the attribution
        # tool for VERDICT.md round-3 next item 3.
        logdir += "_grad"

        def run(c, vv, pr, p0):
            def loss(vs):
                roll = lambda q: multislice(q, vs, pr, sigma, slice_step=step)  # noqa: E731
                out = jax.vmap(roll)(p0) if batch > 1 else roll(p0)
                return jnp.sum(jnp.real(out) ** 2)

            l, g = jax.value_and_grad(loss)(vv * (1 + c * 1e-30))
            return l + jnp.sum(jnp.abs(g[0, :1, :1]))

        args = (v, prop, psi0)
        x0 = jnp.float32(0.0)
    else:

        def run(p, vv, pr):
            roll = lambda p0: multislice(p0, vv, pr, sigma, slice_step=step)  # noqa: E731
            return jax.vmap(roll)(p) if batch > 1 else roll(p)

        args = (v, prop)
        x0 = psi0

    fn = jax.jit(run)
    pick = jax.jit(lambda a: jnp.abs(a.reshape(-1)[:1]))
    # compile outside the trace window (long-budget barrier)
    fetch_scalar(pick(fn(x0, *args)), tries=120, wait_s=20.0)
    jax.profiler.start_trace(logdir)
    p = fn(x0, *args)
    p = fn(p, *args)
    fetch_scalar(pick(p))
    jax.profiler.stop_trace()
    print(f"# trace in {logdir}")
    summarize(logdir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
