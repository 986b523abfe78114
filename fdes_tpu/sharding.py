"""Device meshes and measurement-axis sharding (SURVEY.md C19/C20, §2.1/§2.2).

The reference's only parallelism is data-parallel: the measurement series is
partitioned per GPU and partial gradients are D2H-copied and summed on the
host (SURVEY.md C19, C20).  The TPU replacement:

* one `jax.sharding.Mesh` over all devices — flat ``('data',)`` by default,
  or ``('host', 'chip')`` when cross-host/intra-host traffic should map to
  DCN/ICI separately (SURVEY.md §2.2);
* the measurement axis (defoci / tilts / probe positions) carries a
  `NamedSharding(P('data', ...))`; the potential V is replicated;
* gradients: `jax.value_and_grad` of a jitted loss whose batch inputs are
  sharded — GSPMD inserts exactly one psum of dL/dV over the mesh, riding
  ICI within a slice and DCN across hosts.  An explicit `shard_map` variant
  is provided for cases where manual control beats the partitioner, and the
  two are asserted equal in tests on the 8-device CPU mesh (SURVEY.md §4
  distributed tier).

Multi-host startup (`jax.distributed.initialize`) is wrapped in
`init_distributed` and is a no-op in single-process runs.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialise the multi-host runtime; safe no-op single-process.

    With no arguments relies on the TPU pod's automatic environment
    discovery (the standard path on Cloud TPU); explicit arguments are for
    multi-process-on-one-machine tests.
    """
    if num_processes is None and coordinator is None:
        return  # single-process run, nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    devices: Sequence[jax.Device] | None = None,
    axis_names: tuple[str, ...] = ("data",),
    shape: tuple[int, ...] | None = None,
) -> Mesh:
    """Mesh over all (or given) devices.

    Default: flat 1-D ('data',) mesh.  Pass axis_names=('host', 'chip') with
    shape=(nhosts, chips_per_host) to pin the DCN/ICI split explicitly.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required when len(axis_names) > 1")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def data_axis_size(mesh: Mesh) -> int:
    return int(np.prod(mesh.devices.shape))


def measurement_sharding(mesh: Mesh, batch_ndim_spec: P | None = None) -> NamedSharding:
    """Sharding for a (M, ...) measurement-series array: M over all axes."""
    spec = batch_ndim_spec or P(tuple(mesh.axis_names))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_measurements(mesh: Mesh, *arrays: jax.Array | np.ndarray):
    """device_put each (M, ...) array with M sharded over the whole mesh.

    M must divide by the mesh size (pad at the call site; forward models
    treat padded rows as extra work whose output is discarded).
    """
    n = data_axis_size(mesh)
    out = []
    for a in arrays:
        if a.shape[0] % n != 0:
            raise ValueError(
                f"leading (measurement) dim {a.shape[0]} not divisible by "
                f"mesh size {n}; pad the series"
            )
        out.append(jax.device_put(a, measurement_sharding(mesh)))
    return out[0] if len(out) == 1 else tuple(out)


def sharded_value_and_grad(
    loss_fn: Callable[..., jax.Array],
    mesh: Mesh,
    batch_argnums: tuple[int, ...],
) -> Callable[..., tuple[jax.Array, jax.Array]]:
    """Explicit shard_map data-parallel value_and_grad over the mesh.

    loss_fn(v, *args) must return a SUM-over-measurements scalar so that the
    per-shard losses/gradients combine by psum.  Arguments listed in
    batch_argnums (0 = first of *args) are split on their leading axis;
    everything else (v included) is replicated.  Returns f(v, *args) ->
    (loss, grad) with both already psum-reduced — numerically the same
    contraction as the GSPMD path, asserted in tests.

    Note the gradient is NOT psum'ed by hand: under shard_map's varying-
    manual-axes tracking, the cotangent of an unvarying (P()) input is
    automatically psum-reduced by the transpose so it comes back replicated
    AND already summed over shards; an explicit psum would multiply the
    gradient by the mesh size (bug class pinned by
    tests/test_sharding.py::test_shard_map_grad_equals_single_device).
    Only the per-shard loss needs the explicit reduction.
    """
    axes = tuple(mesh.axis_names)

    def fn(v, *args):
        in_specs = [P()] + [
            P(axes) if (i in batch_argnums) else P() for i in range(len(args))
        ]

        def local(v, *args_):
            loss, g = jax.value_and_grad(loss_fn)(v, *args_)
            return jax.lax.psum(loss, axes), g

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(), P()),
        )(v, *args)

    return fn
