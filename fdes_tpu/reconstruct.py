"""Inverse reconstruction engine (SURVEY.md C13/C14, L6, §3.2).

The reference's inverse loop is: forward all measurements storing per-slice
waves, seed an error wave, hand-back-propagate it through every slice,
host-sum per-GPU partial gradients, steepest-descent step (SURVEY.md §3.2).
Here the ENTIRE iteration body is one jitted, donated XLA program:

    loss, grad = value_and_grad(loss_fn)(V)   # adjoint = autodiff of the scan
    V, opt_state = optax.update(...)

with remat bounding adjoint memory (propagate.py) and the measurement axis
sharded over the device mesh (sharding.py) so the only collective per step
is the gradient psum GSPMD inserts — the TPU replacement for the
reference's D2H + host add (SURVEY.md C19/C20).

Checkpoint/resume (SURVEY.md §5): every ``checkpoint_every`` iterations the
full optimization state (V, opt state, iteration, RNG-free) is written as an
.npz from host 0; ``resume`` restarts losing at most that many iterations —
the reference's raw-binary V dump generalised to the whole pytree.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .tunnel import fetch_array, fetch_scalar


@dataclasses.dataclass
class ReconResult:
    """Terminal state of a reconstruction run."""

    v: np.ndarray
    losses: np.ndarray
    iterations: int
    wall_s: float
    #: median fetch-closed per-step wall (s) — the steady-state rate;
    #: ``wall_s`` additionally carries one-time costs (compile, final
    #: checkpoint/result transfers), which dominate short runs on
    #: tunneled TPU runtimes
    median_step_s: float = 0.0


def make_optimizer(
    name: str = "adam", lr: float = 1.0, **kwargs
) -> optax.GradientTransformation:
    """Named optax optimizers for the CLI/config layer (SURVEY.md C14)."""
    opts: dict[str, Callable[..., optax.GradientTransformation]] = {
        "sgd": optax.sgd,
        "momentum": lambda learning_rate: optax.sgd(learning_rate, momentum=0.9),
        "adam": optax.adam,
        "adamw": optax.adamw,
        # lbfgs runs its zoom linesearch; a fixed learning rate would defeat
        # it, so lr is ignored (reconstruct() feeds value_fn to the update).
        "lbfgs": lambda learning_rate: optax.lbfgs(),
    }
    if name not in opts:
        raise ValueError(f"unknown optimizer {name!r}; options: {sorted(opts)}")
    return opts[name](lr, **kwargs)


def positive_projection(v: jax.Array) -> jax.Array:
    """Project the potential onto V >= 0 (elementwise; complex potentials
    clip both channels — the absorptive part is nonnegative too)."""
    if jnp.iscomplexobj(v):
        return jax.lax.complex(
            jnp.maximum(v.real, 0.0), jnp.maximum(v.imag, 0.0)
        )
    return jnp.maximum(v, 0.0)


def save_checkpoint(path: str, v, opt_state, iteration: int) -> None:
    """Write the full optimization pytree as a flat .npz (host 0 only)."""
    if jax.process_index() != 0:
        return
    leaves, treedef = jax.tree.flatten((v, opt_state))
    # fetch_array, not np.asarray: complex leaves (absorptive-V inverse)
    # cannot be read back directly through a TPU tunnel (tunnel.py)
    arrays = {f"leaf_{i}": fetch_array(x) for i, x in enumerate(leaves)}
    tmp = path + ".tmp.npz"
    np.savez(tmp, iteration=iteration, nleaves=len(leaves), **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str, v_like, opt_state_like):
    """Restore (v, opt_state, iteration) from save_checkpoint output.

    v_like/opt_state_like provide the treedef (and shardings via device_put
    by the caller); raises FileNotFoundError if absent.
    """
    with np.load(path) as z:
        n = int(z["nleaves"])
        leaves = [z[f"leaf_{i}"] for i in range(n)]
        iteration = int(z["iteration"])
    _, treedef = jax.tree.flatten((v_like, opt_state_like))
    v, opt_state = jax.tree.unflatten(treedef, leaves)
    return v, opt_state, iteration


class MetricsWriter:
    """Append-only JSONL metrics, host-0 only (SURVEY.md §5 metrics row).

    Values must already be host scalars — the writer never forces a device
    sync of its own.
    """

    def __init__(self, path: str | None):
        self.path = path if (path and jax.process_index() == 0) else None
        if self.path:
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            self._fh = open(self.path, "a", buffering=1)

    def write(self, **kv: Any) -> None:
        if self.path:
            self._fh.write(json.dumps(kv) + "\n")

    def close(self) -> None:
        if self.path:
            self._fh.close()


def reconstruct(
    loss_fn: Callable[[jax.Array], jax.Array],
    v0: jax.Array,
    *,
    loss_args: tuple = (),
    iterations: int = 100,
    optimizer: optax.GradientTransformation | None = None,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 50,
    resume: bool = False,
    metrics_path: str | None = None,
    metrics_every: int = 16,
    callback: Callable[[int, float, jax.Array], None] | None = None,
    v_sharding: jax.sharding.Sharding | None = None,
    project: Callable[[jax.Array], jax.Array] | None = None,
) -> ReconResult:
    """Gradient-descent reconstruction of the potential stack.

    loss_fn: scalar loss of the (S, ny, nx) potential (close over the
    observed data and forward model with loss.make_loss).  The step is one
    jitted program with V and opt_state donated, so steady-state iteration
    allocates nothing.

    project: optional constraint projection applied to V after each update
    (projected gradient descent), e.g. ``lambda v: jnp.maximum(v, 0.0)`` for
    potential positivity.  Runs INSIDE the jitted step.  The reference has
    no constraint support; positivity is the physically safe default for
    projected potentials of neutral atoms when the observed series is noisy.

    callback contract: ``callback(it, loss, v)`` fires at metric FLUSH time
    (every ``metrics_every`` iterations), and every call in a flushed chunk
    receives the CURRENT v — the latest iterate, not the iterate of ``it``.
    This is the price of the chunked-fetch design (per-iteration host syncs
    cost ~0.45 s each on tunneled runtimes and capped the CLI invert at
    2 it/s); callbacks needing v-at-iteration should set metrics_every=1
    and pay the sync.
    """
    optimizer = optimizer or make_optimizer("adam", 1.0)

    @jax.jit
    def init_state(v):
        return optimizer.init(v)

    if v_sharding is not None:
        v0 = jax.device_put(v0, v_sharding)
    opt_state = init_state(v0)

    start = 0
    ck_exists = bool(checkpoint_path and os.path.exists(checkpoint_path))
    if resume and checkpoint_path and jax.process_count() > 1:
        # Checkpoints are written by process 0; resuming requires ALL
        # processes to see the same file (shared filesystem) or the SPMD
        # step counts diverge and the per-step psum deadlocks.  Fail loudly
        # instead (review finding).
        import jax.experimental.multihost_utils as mhu

        exists_p0 = bool(mhu.broadcast_one_to_all(np.int32(ck_exists)))
        if exists_p0 != ck_exists:
            raise RuntimeError(
                f"checkpoint {checkpoint_path!r} visible on process 0 but "
                f"not on process {jax.process_index()} — put checkpoint_path "
                "on storage shared by all hosts"
            )
    if resume and ck_exists:
        from .tunnel import safe_put

        v_host, opt_host, start = load_checkpoint(checkpoint_path, v0, opt_state)
        v0 = safe_put(np.asarray(v_host, dtype=v0.dtype), v_sharding)
        # like.dtype, not np.asarray(like): materialising the device pytree
        # on the host just for dtypes is a gratuitous (and, for complex,
        # tunnel-poisoning) readback
        opt_state = jax.tree.map(
            lambda like, val: safe_put(
                # non-array leaves (Python scalars in some optax states) have
                # no .dtype — fall back to numpy inference (ADVICE.md round 2)
                np.asarray(val, getattr(like, "dtype", None)),
                like.sharding if hasattr(like, "sharding") else None,
            ),
            opt_state,
            opt_host,
        )

    # with_extra_args_support lets one update call serve both families:
    # linesearch optimizers (lbfgs — the reference-beating choice for this
    # deterministic least-squares problem) consume value/grad/value_fn,
    # plain first-order ones ignore them.
    opt = optax.with_extra_args_support(optimizer)

    # V and opt_state are donated: XLA reuses their buffers in place, so the
    # steady-state iteration allocates nothing (the TPU analog of the
    # reference's persistent cudaMalloc buffers, SURVEY.md C17).
    # loss_args thread DEVICE arrays (observed data, incident waves, CTF
    # stacks) into the step as jit ARGUMENTS: a device array captured in
    # the loss closure becomes a compile-time constant, whose embedding
    # needs a trace-time device->host readback — unimplemented on tunneled
    # TPU runtimes (fdes_tpu/tunnel.py) and a gratuitous transfer anywhere.
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(v, opt_state, *largs):
        lf = (lambda vv: loss_fn(vv, *largs)) if largs else loss_fn
        loss, g = jax.value_and_grad(lf)(v)
        updates, opt_state = opt.update(
            g, opt_state, v, value=loss, grad=g, value_fn=lf
        )
        v = optax.apply_updates(v, updates)
        if project is not None:
            v = project(v)
        return v, opt_state, loss, jnp.linalg.norm(g)

    metrics = MetricsWriter(metrics_path)
    losses: list[float] = []
    v = v0
    t0 = time.time()
    # Metric scalars are fetched in CHUNKS of ``metrics_every``, not per
    # iteration: on a tunneled TPU runtime every device->host readback is
    # a ~hundreds-of-ms round trip, and the per-iteration fetch made the
    # product CLI invert run at 2 it/s while the same step benchmarked at
    # 109 (round-4 measurement).  The per-iteration VALUES are all still
    # recorded — they just travel batched; callbacks fire at flush time.
    pending: list[tuple[int, jax.Array, jax.Array, float]] = []

    # jitted stacker: EAGER jnp.stack of device scalars is one tunnel
    # round trip PER OP — the very cost this chunking removes
    stack_fn = jax.jit(lambda vals: jnp.stack(vals))
    chunk_t0 = time.time()
    step_walls: list[float] = []

    def flush():
        nonlocal chunk_t0
        if not pending:
            return
        flat = [x for _, l, g in pending for x in (l, g)]
        stacked = np.asarray(fetch_array(stack_fn(flat))).reshape(-1, 2)
        # per-step wall is the fetch-closed chunk wall amortised over the
        # chunk (dispatch is async — a per-dispatch clock reads ~40 µs
        # regardless of the device time)
        dt = (time.time() - chunk_t0) / len(pending)
        step_walls.append(dt)
        for (it, _, _), (lf, gn) in zip(pending, stacked):
            loss_f = float(lf)
            losses.append(loss_f)
            metrics.write(
                iter=it, loss=loss_f, grad_norm=float(gn), step_s=dt
            )
            if callback is not None:
                callback(it, loss_f, v)
        pending.clear()
        chunk_t0 = time.time()

    try:
        for it in range(start, iterations):
            v, opt_state, loss, gnorm = step(v, opt_state, *loss_args)
            pending.append((it, loss, gnorm))
            if len(pending) >= max(metrics_every, 1):
                # the chunked fetch doubles as the watchdog readback — a
                # bare float() can block forever on a half-up tunnel
                flush()
            if checkpoint_path and (it + 1) % checkpoint_every == 0:
                flush()  # metrics/callbacks precede their checkpoint
                save_checkpoint(checkpoint_path, v, opt_state, it + 1)
        flush()
    finally:
        # an exception mid-chunk must not silently drop the pending
        # metrics/losses (ADVICE.md round 4): best-effort flush before
        # close — swallowing its own failure so it cannot mask the
        # original exception (on the success path the flush above already
        # ran and propagates its errors normally)
        if pending:
            try:
                flush()
            except Exception:
                pass
        metrics.close()
    if checkpoint_path:
        save_checkpoint(checkpoint_path, v, opt_state, iterations)
    return ReconResult(
        v=fetch_array(v),
        losses=np.asarray(losses),
        iterations=iterations,
        wall_s=time.time() - t0,
        # drop the first chunk (it carries the compile barrier)
        median_step_s=float(
            np.median(step_walls[1:] if len(step_walls) > 1 else step_walls)
        )
        if step_walls
        else 0.0,
    )
