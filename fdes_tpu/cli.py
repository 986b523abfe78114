"""Command-line driver (SURVEY.md C1, L0).

Usage:
    python -m fdes_tpu.cli <config.toml> [--mode forward|hrtem|invert|stem]
                           [--set section.key=value ...] [--resume]

Replaces the reference's `FDES <input-file>` entry (SURVEY.md C1): parse
config, build the simulation state, dispatch the requested mode, write .npy
outputs and JSONL metrics under ``output_dir``.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

import numpy as np


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="fdes-tpu", description=__doc__)
    ap.add_argument("config", help="TOML/JSON config file")
    ap.add_argument("--mode", default=None, help="override config mode")
    ap.add_argument(
        "--set",
        dest="overrides",
        action="append",
        default=[],
        metavar="KEY=VAL",
        help="dotted config override, e.g. --set sim.nslices=64",
    )
    ap.add_argument("--resume", action="store_true", help="resume reconstruction")
    ap.add_argument(
        "--debug-nans",
        action="store_true",
        help="enable jax_debug_nans (sanitizer tier, SURVEY.md §5)",
    )
    args = ap.parse_args(argv)

    from .config import apply_overrides, load_config

    cfg = load_config(args.config)
    cfg = apply_overrides(cfg, args.overrides)
    if args.mode:
        cfg = dataclasses.replace(cfg, mode=args.mode)
    if args.resume:
        cfg = dataclasses.replace(
            cfg, recon=dataclasses.replace(cfg.recon, resume=True)
        )

    from .sharding import init_distributed

    if cfg.mesh.distributed:
        init_distributed()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # honor an explicit CPU request even where a sitecustomize registers
        # an ambient TPU backend (env var alone loses to it)
        jax.config.update("jax_platforms", "cpu")
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    # Persistent compile cache: repeated runs skip XLA recompiles (slow
    # remote compile helpers make this load-bearing on tunneled TPUs).
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from . import io
    from .pipeline import build_mesh, setup, shard_series, shard_sim, stem_setup

    t0 = time.time()
    sim = setup(cfg)
    # Shard the measurement axis over all devices (C19 product path): the
    # defocus/tilt/probe series splits across the mesh, V stays replicated,
    # and GSPMD inserts the single gradient psum (SURVEY.md §2.2).
    #
    # A mesh axis named 'grid' switches forward/invert to the TENSOR-
    # PARALLEL path instead (gridshard.py): the (y, x) field rows shard
    # over it, V and its gradient stay row-sharded (the pod-scale inverse
    # where V+grad = 16 GiB cannot replicate — BASELINE.md config 5), and
    # any 'data' axis still shards the measurement series on top
    # (('data', 'grid') composition).  Configure with e.g.
    #   [mesh]  axis_names = ["data", "grid"]  shape = [2, 4]
    mesh = build_mesh(cfg)
    use_gridshard = mesh is not None and "grid" in mesh.axis_names
    if use_gridshard and cfg.mode not in ("forward", "invert"):
        print(
            f"mesh axis 'grid' supports modes forward/invert only (got "
            f"{cfg.mode!r}); use a ('data',) mesh for stem/hrtem",
            file=sys.stderr,
        )
        return 2
    if not use_gridshard:
        sim = shard_sim(sim, mesh)
    os.makedirs(cfg.output_dir, exist_ok=True)
    out = lambda name: os.path.join(cfg.output_dir, name)  # noqa: E731

    from .propagate import make_slice_step, pick_probe_chunk

    # stem.probe_chunk == 0 resolves to the MEASURED optimum per grid size
    # (16-wave chunks at <=512^2, unbatched at >=1024^2, 256 for PRISM —
    # pick_probe_chunk); an explicit value that contradicts the measured
    # tables warns like the mxu4 negative-result warning does
    n_scan = cfg.stem.scan_ny * cfg.stem.scan_nx
    probe_chunk = cfg.stem.probe_chunk or pick_probe_chunk(
        sim.grid.shape, n_scan, method=cfg.stem.method
    )
    if cfg.stem.probe_chunk and cfg.stem.method != "prism":
        big = max(sim.grid.shape)
        if (big <= 512 and cfg.stem.probe_chunk > 16) or (
            big >= 1024 and cfg.stem.probe_chunk > 1
        ):
            import warnings

            warnings.warn(
                f"stem.probe_chunk={cfg.stem.probe_chunk} contradicts the "
                f"measured optimum at {big}^2 (16-wave chunks at <=512^2, "
                "unbatched at >=1024^2 — every engine measured SLOWER at "
                "bigger batches; tpu_steps.jsonl).  Set stem.probe_chunk=0 "
                "for the measured default.",
                stacklevel=2,
            )

    # auto-tier hints: grad excludes forward-only engines for the inverse;
    # batch is the rollout count vmapped over one potential (probe raster
    # or tilt series) — the radix tiers only win batched (propagate.py).
    # The hint is the RESOLVED chunk, not the raster size: with chunking
    # off the old scan_ny*scan_nx hint disabled the radix promotion
    # (VERDICT.md round-3 weak item 2).
    if cfg.mode in ("stem", "stem4d"):
        batch_hint = probe_chunk
    elif cfg.sim.tilt_series_rad:
        batch_hint = len(cfg.sim.tilt_series_rad)
    else:
        batch_hint = 1
    slice_step = make_slice_step(
        cfg.sim.engine, shape=sim.grid.shape, dtype=sim.cdtype,
        grad=(cfg.mode == "invert"), batch=batch_hint,
    )

    if cfg.mode in ("stem", "stem4d") and cfg.stem.method not in (
        "multislice",
        "prism",
    ):
        print(f"unknown stem.method {cfg.stem.method!r}", file=sys.stderr)
        return 2
    if cfg.mode == "invert" and cfg.recon.modality not in ("auto", "stem4d"):
        print(f"unknown recon.modality {cfg.recon.modality!r}", file=sys.stderr)
        return 2

    def prism_smat(plan, v):
        """Shared S-matrix build for the stem/stem4d PRISM branches."""
        from .prism import prism_smatrix

        return prism_smatrix(
            plan, v, sim.propagator, sim.sigma,
            beam_chunk=cfg.stem.beam_chunk or None,
            slice_step=slice_step, dtype=sim.cdtype,
        )

    def phonon_stacks():
        """Potential stacks to average over: one (DWF) or many (frozen)."""
        if cfg.sim.phonon_configs <= 0:
            return [sim.v_stack]
        from .phonon import phonon_sliced
        from .potential import build_potential

        stacks = [
            build_potential(c, sim.grid, table=sim.table, dtype=sim.rdtype)
            for c in phonon_sliced(
                sim.specimen,
                cfg.sim.phonon_configs,
                cfg.sim.nslices,
                dz=cfg.sim.dz_A or None,
                seed=cfg.seed,
            )
        ]
        if cfg.sim.absorptive_factor > 0.0:
            import jax.numpy as jnp

            stacks = [
                v + 1j * cfg.sim.absorptive_factor * jnp.abs(v) for v in stacks
            ]
        return stacks

    def phonon_mean(fn, stacks):
        """Configurational average of fn(V) as ONE vmapped dispatch: the
        whole-loop engines map batched potentials onto their kernel batch
        grid axis (fused_scan custom_vmap), so C frozen-phonon configs are
        a single launch instead of C separate jit calls."""
        import jax.numpy as jnp

        if len(stacks) == 1:
            return fn(stacks[0])
        return jnp.mean(jax.vmap(fn)(jnp.stack(stacks)), axis=0)

    if cfg.mode == "forward" and cfg.sim.streamed:
        # Pod-memory forward (BASELINE.md pod-memory row): potential built
        # per slice inside the scan; the (S, ny, nx) stack never exists.
        import jax.numpy as jnp

        from .grids import host_cast
        from .potential import pad_atoms_per_slice, species_factors_rfft
        from .propagate import multislice_streamed

        np_rdt = np.dtype(jax.numpy.dtype(sim.rdtype).name)
        x, y, sp, w, _ = pad_atoms_per_slice(sim.sliced, np_rdt)
        atoms = tuple(jnp.asarray(a) for a in (x, y, sp, w))
        if use_gridshard:
            # streamed x 'grid' mesh (VERDICT.md round-4 item 7): the
            # potential build is row-local after the halo scatter and the
            # transforms ride the distributed-FFT machinery — the config-5
            # forward streams V AND shards the field in one path.
            from jax.sharding import NamedSharding, PartitionSpec as P

            from .gridshard import multislice_gridsharded_streamed
            from .potential import species_factors_full

            if sim.psi0_stack is not None:
                print(
                    "gridshard streamed forward supports a single incident "
                    "wave (no tilt series); drop sim.tilt_series_rad or the "
                    "'grid' mesh axis",
                    file=sys.stderr,
                )
                return 2
            ff_full = jnp.asarray(
                host_cast(
                    species_factors_full(
                        sim.grid, sim.sliced.species, sim.table
                    ),
                    sim.rdtype,
                )
            )
            psi0s = jax.device_put(
                sim.psi0, NamedSharding(mesh, P("grid", None))
            )
            ffs = jax.device_put(
                ff_full, NamedSharding(mesh, P(None, None, "grid"))
            )
            props = jax.device_put(
                sim.propagator, NamedSharding(mesh, P(None, "grid"))
            )
            psi = jax.jit(
                lambda p0, at, ff, pr: multislice_gridsharded_streamed(
                    p0, at, ff, pr, sim.sigma, mesh,
                    shape=sim.grid.shape,
                    pixel=(sim.grid.py, sim.grid.px),
                )
            )(psi0s, atoms, ffs, props)
            io.write_npy(out("exit_wave.npy"), psi)
            if jax.process_index() == 0:
                print(
                    f"{cfg.mode}: done in {time.time() - t0:.2f}s -> "
                    f"{cfg.output_dir}/"
                )
            return 0
        # streamed x engine table (VERDICT.md round-4 item 7): per-slice
        # engines run inside the scan body; the panel engine composes
        # through its XLA-level loop.  The fscan tiers stream a
        # materialised V stack and cannot compose — the auto tiers fall
        # back to the xla body there (an EXPLICIT fscan request still
        # errors loudly in multislice_streamed).
        step_streamed = slice_step
        if (
            step_streamed is not None
            and hasattr(step_streamed, "whole_scan")
            and not step_streamed.kind.startswith("panel")
            and cfg.sim.engine in ("auto", "auto_fast")
        ):
            step_streamed = None
        ff_r = jnp.asarray(
            host_cast(
                species_factors_rfft(sim.grid, sim.sliced.species, sim.table),
                sim.rdtype,
            )
        )
        run = jax.jit(
            lambda p0, at, ff, pr: multislice_streamed(
                p0, at, ff, pr, sim.sigma,
                shape=sim.grid.shape,
                pixel=(sim.grid.py, sim.grid.px),
                slice_step=step_streamed,
            )
        )
        if sim.psi0_stack is not None:
            # ONE vmapped dispatch over (tilt wave, tilt propagator) — the
            # unmapped atom arrays keep the per-slice potential build
            # shared across tilts (VERDICT.md round-3 weak 3: no Python
            # loops of separate jit calls over the tilt series)
            psi = jax.jit(
                jax.vmap(run, in_axes=(0, None, None, 0))
            )(sim.psi0_stack, atoms, ff_r, sim.prop_stack)
        else:
            psi = run(sim.psi0, atoms, ff_r, sim.propagator)
        io.write_npy(out("exit_wave.npy"), psi)
    elif cfg.mode == "forward" and use_gridshard:
        from .gridshard import multislice_gridsharded, shard_field_inputs

        if sim.psi0_stack is not None:
            print(
                "gridshard forward supports a single incident wave (no tilt "
                "series); drop sim.tilt_series_rad or the 'grid' mesh axis",
                file=sys.stderr,
            )
            return 2
        psi0s, vs, props = shard_field_inputs(
            mesh, sim.psi0, sim.v_stack, sim.propagator
        )
        psi = jax.jit(
            lambda p, v, pr: multislice_gridsharded(
                p, v, pr, sim.sigma, mesh
            )
        )(psi0s, vs, props)
        io.write_npy(out("exit_wave.npy"), psi)
        io.write_npy(out("potential.npy"), sim.v_stack)
    elif cfg.mode == "forward":
        import jax.numpy as jnp

        from .propagate import multislice

        if sim.psi0_stack is not None:
            # one vmapped rollout batch over (wave, propagator): the fscan
            # engines map the whole tilt series onto their batch grid axis
            # in a single kernel launch (fused_scan custom_vmap rule)
            psi = jax.vmap(
                lambda p0, pr: multislice(
                    p0, sim.v_stack, pr, sim.sigma, slice_step=slice_step
                )
            )(sim.psi0_stack, sim.prop_stack)
        else:
            psi = multislice(
                sim.psi0, sim.v_stack, sim.propagator, sim.sigma,
                slice_step=slice_step,
            )
        io.write_npy(out("exit_wave.npy"), psi)
        io.write_npy(out("potential.npy"), sim.v_stack)
        if cfg.sim.thickness_every > 0:
            from .propagate import multislice_thickness_series

            if sim.psi0_stack is not None:
                # per-tilt depth sectioning: (T, S // every, ny, nx)
                series = jax.vmap(
                    lambda p0, pr: multislice_thickness_series(
                        p0, sim.v_stack, pr, sim.sigma,
                        every=cfg.sim.thickness_every,
                        slice_step=slice_step,
                    )
                )(sim.psi0_stack, sim.prop_stack)
            else:
                series = multislice_thickness_series(
                    sim.psi0, sim.v_stack, sim.propagator, sim.sigma,
                    every=cfg.sim.thickness_every,
                    slice_step=slice_step,
                )
            io.write_npy(out("thickness_series.npy"), series)
    elif cfg.mode == "hrtem":
        from .forward import hrtem_defocus_series, hrtem_tilt_series
        from .imaging import add_dose_noise, apply_mtf, gaussian_mtf

        stacks = phonon_stacks()
        if sim.psi0_stack is not None:
            imgs = phonon_mean(
                lambda v: hrtem_tilt_series(
                    v, sim.psi0_stack, sim.prop_stack, sim.sigma,
                    sim.ctf_stack[0], weights=sim.ctf_weights,
                    slice_step=slice_step,
                ),
                stacks,
            )
        else:
            imgs = phonon_mean(
                lambda v: hrtem_defocus_series(
                    v, sim.psi0, sim.propagator, sim.sigma, sim.ctf_stack,
                    weights=sim.ctf_weights, slice_step=slice_step,
                ),
                stacks,
            )
        det = cfg.detector
        if det.mtf_sigma_px > 0:
            import jax.numpy as jnp

            from .grids import host_cast

            mtf = jnp.asarray(
                host_cast(gaussian_mtf(sim.grid.shape, det.mtf_sigma_px), sim.rdtype)
            )
            imgs = jax.vmap(lambda i: apply_mtf(i, mtf))(imgs)
        if det.apply_noise and det.dose_per_px > 0:
            keys = jax.random.split(jax.random.key(cfg.seed), imgs.shape[0])
            imgs = jax.vmap(
                lambda k, i: add_dose_noise(k, i, det.dose_per_px)
            )(keys, imgs)
        io.write_npy(out("images.npy"), imgs)
    elif cfg.mode == "stem4d":
        from .forward import stem_raster_4d

        stencil, qy, qx, positions, _ = stem_setup(sim)
        positions = shard_series(mesh, positions)
        stacks = phonon_stacks()
        if cfg.stem.method == "prism":
            from .pipeline import prism_setup
            from .prism import prism_raster_4d

            plan = prism_setup(sim)
            cbed = phonon_mean(
                lambda v: prism_raster_4d(
                    prism_smat(plan, v),
                    plan,
                    positions,
                    probe_chunk=probe_chunk,
                ),
                stacks,
            )
        else:
            cbed = phonon_mean(
                lambda v: stem_raster_4d(
                    v,
                    stencil,
                    qy,
                    qx,
                    positions,
                    sim.propagator,
                    sim.sigma,
                    probe_chunk=probe_chunk,
                    slice_step=slice_step,
                ),
                stacks,
            )
        io.write_npy(
            out("cbed.npy"),
            np.asarray(cbed).reshape(
                cfg.stem.scan_ny, cfg.stem.scan_nx, *sim.grid.shape
            ),
        )
    elif cfg.mode == "stem":
        from .forward import stem_raster

        stencil, qy, qx, positions, masks = stem_setup(sim)
        positions = shard_series(mesh, positions)
        stacks = phonon_stacks()
        if cfg.stem.method == "prism":
            from .pipeline import prism_setup
            from .prism import prism_raster

            plan = prism_setup(sim)
            sig = phonon_mean(
                lambda v: prism_raster(
                    prism_smat(plan, v),
                    plan,
                    positions,
                    masks,
                    probe_chunk=probe_chunk,
                ),
                stacks,
            )
        else:
            sig = phonon_mean(
                lambda v: stem_raster(
                    v,
                    stencil,
                    qy,
                    qx,
                    positions,
                    sim.propagator,
                    sim.sigma,
                    masks,
                    probe_chunk=probe_chunk,
                    slice_step=slice_step,
                ),
                stacks,
            )
        raster = np.asarray(sig).reshape(-1, cfg.stem.scan_ny, cfg.stem.scan_nx)
        io.write_npy(out("stem.npy"), raster)
        if cfg.stem.compute_com:
            from .forward import stem_com_raster

            com = phonon_mean(
                lambda v: stem_com_raster(
                    v,
                    stencil,
                    qy,
                    qx,
                    positions,
                    sim.propagator,
                    sim.sigma,
                    probe_chunk=probe_chunk,
                    slice_step=slice_step,
                ),
                stacks,
            )
            io.write_npy(
                out("stem_com.npy"),
                np.asarray(com).reshape(cfg.stem.scan_ny, cfg.stem.scan_nx, 2),
            )
    elif cfg.mode == "invert":
        import jax.numpy as jnp

        from .forward import hrtem_defocus_series, hrtem_tilt_series
        from .loss import make_loss
        from .propagate import pick_remat_chunk
        from .reconstruct import make_optimizer, positive_projection, reconstruct

        chunk = cfg.recon.remat_chunk or pick_remat_chunk(cfg.sim.nslices)

        # Every device array the forward model consumes is threaded as an
        # ARGUMENT (fwd_args -> reconstruct loss_args), never a closure: a
        # device array captured by a jitted step becomes a compile-time
        # constant whose embedding needs a trace-time device->host readback
        # — unimplemented on tunneled TPU runtimes (fdes_tpu/tunnel.py).
        if use_gridshard:
            # Tensor-parallel inverse (VERDICT.md round-2 missing item 1):
            # the field/V rows shard over the 'grid' axis, dL/dV comes back
            # row-sharded (never replicating the pod-scale 16 GiB V+grad),
            # and an optional 'data' axis shards the measurement series.
            from jax.sharding import NamedSharding, PartitionSpec as P

            from .gridshard import (
                hrtem_defocus_series_gridsharded,
                hrtem_tilt_series_gridsharded,
            )

            if cfg.recon.modality == "stem4d":
                print(
                    "recon.modality='stem4d' does not support the 'grid' "
                    "mesh axis (probe rollouts shard over 'data' instead)",
                    file=sys.stderr,
                )
                return 2

            def gput(x, *spec):
                return jax.device_put(x, NamedSharding(mesh, P(*spec)))

            dax = "data" if "data" in mesh.axis_names else None
            if dax is not None:
                series_len = (
                    sim.psi0_stack.shape[0]
                    if sim.psi0_stack is not None
                    else sim.ctf_stack.shape[0]
                )
                if series_len % mesh.shape[dax]:
                    print(
                        f"# mesh: series length {series_len} not divisible "
                        f"by data axis {mesh.shape[dax]}; replicating the "
                        "series over 'data'",
                        file=sys.stderr,
                    )
                    dax = None
            quad = sim.ctf_weights is not None
            if sim.psi0_stack is not None:
                fwd_args = (
                    gput(sim.psi0_stack, dax, "grid", None),
                    gput(sim.prop_stack, dax, None, "grid"),
                    gput(
                        sim.ctf_stack[0],
                        *((None, None, "grid") if quad else (None, "grid")),
                    ),
                    sim.ctf_weights,
                )

                def fwd(v, psi0_stack, prop_stack, ctf0, weights):
                    return hrtem_tilt_series_gridsharded(
                        v, psi0_stack, prop_stack, sim.sigma, ctf0, mesh,
                        weights=weights, data_axis=dax, remat_chunk=chunk,
                    )
            else:
                fwd_args = (
                    gput(sim.psi0, "grid", None),
                    gput(sim.propagator, None, "grid"),
                    gput(
                        sim.ctf_stack,
                        *(
                            (dax, None, None, "grid")
                            if quad
                            else (dax, None, "grid")
                        ),
                    ),
                    sim.ctf_weights,
                )

                def fwd(v, psi0, propagator, ctf_stack, weights):
                    return hrtem_defocus_series_gridsharded(
                        v, psi0, propagator, sim.sigma, ctf_stack, mesh,
                        weights=weights, data_axis=dax, remat_chunk=chunk,
                    )
        elif cfg.recon.modality == "stem4d":
            # ptychography-style inverse from CBED stacks (beyond-reference;
            # tests/test_inverse.py::test_4dstem_ptychographic_recovery)
            from .forward import stem_raster_4d

            stencil, qy, qx, positions, _ = stem_setup(sim)
            positions = shard_series(mesh, positions)
            fwd_args = (stencil, qy, qx, positions, sim.propagator)

            def fwd(v, stencil, qy, qx, positions, propagator):
                return stem_raster_4d(
                    v, stencil, qy, qx, positions, propagator, sim.sigma,
                    probe_chunk=probe_chunk,
                    remat_chunk=chunk, slice_step=slice_step,
                )
        elif sim.psi0_stack is not None:
            # tilt-series modality (the reference's inverse tomography)
            fwd_args = (
                sim.psi0_stack, sim.prop_stack, sim.ctf_stack[0],
                sim.ctf_weights,
            )

            def fwd(v, psi0_stack, prop_stack, ctf0, weights):
                return hrtem_tilt_series(
                    v, psi0_stack, prop_stack, sim.sigma,
                    ctf0, weights=weights,
                    remat_chunk=chunk, slice_step=slice_step,
                )
        else:
            fwd_args = (sim.psi0, sim.propagator, sim.ctf_stack, sim.ctf_weights)

            def fwd(v, psi0, propagator, ctf_stack, weights):
                return hrtem_defocus_series(
                    v, psi0, propagator, sim.sigma, ctf_stack,
                    weights=weights, remat_chunk=chunk,
                    slice_step=slice_step,
                )

        if cfg.observed_path:
            obs = np.load(cfg.observed_path)
            if obs.ndim == 4:  # (scan_ny, scan_nx, ny, nx) CBED export
                obs = obs.reshape(-1, *obs.shape[-2:])
            i_obs = jnp.asarray(
                obs.astype(np.dtype(jax.numpy.dtype(sim.rdtype).name))
            )
        else:
            # Self-test mode: invert synthetic data from the loaded specimen.
            real_v = (
                sim.v_stack.real
                if jnp.iscomplexobj(sim.v_stack)
                else sim.v_stack
            )
            # jit the synthesis: eager per-op dispatch of a multislice
            # rollout is pathologically slow on tunneled TPU runtimes
            # (minutes for a 256² 16-slice series vs <1 s compiled)
            i_obs = jax.jit(fwd)(real_v, *fwd_args)
            if cfg.recon.loss == "poisson":
                # poisson_nll consumes COUNTS (loss.py); intensities would
                # shift the ML minimum to sim = I/dose for any dose != 1
                i_obs = cfg.recon.dose * i_obs
        if use_gridshard:
            i_obs = gput(i_obs, dax, "grid", None)
        elif i_obs.ndim >= 3:
            i_obs = shard_series(mesh, i_obs)
        elif mesh is not None:
            # a single 2-D observed image has no measurement axis: axis 0 is
            # the image row axis, so replicate instead of sharding it
            # (ADVICE.md round 2)
            from .sharding import replicated

            i_obs = jax.device_put(i_obs, replicated(mesh))

        loss_fn = make_loss(
            fwd, None, l2_weight=cfg.recon.l2_weight, tv_weight=cfg.recon.tv_weight,
            kind=cfg.recon.loss, dose=cfg.recon.dose,
        )
        v_sharding = None
        if use_gridshard:
            from jax.sharding import NamedSharding, PartitionSpec

            v_sharding = NamedSharding(mesh, PartitionSpec(None, "grid", None))
        elif mesh is not None:
            from .sharding import replicated

            v_sharding = replicated(mesh)
        res = reconstruct(
            loss_fn,
            jnp.zeros_like(sim.v_stack),
            loss_args=(i_obs, *fwd_args),
            iterations=cfg.recon.iterations,
            optimizer=make_optimizer(cfg.recon.optimizer, cfg.recon.lr),
            v_sharding=v_sharding,
            checkpoint_path=cfg.recon.checkpoint_path or out("checkpoint.npz"),
            checkpoint_every=cfg.recon.checkpoint_every,
            resume=cfg.recon.resume,
            metrics_path=cfg.recon.metrics_path or out("metrics.jsonl"),
            project=positive_projection if cfg.recon.positivity else None,
        )
        io.write_npy(out("reconstructed.npy"), res.v)
        if jax.process_index() == 0:
            if res.losses.size:
                print(
                    f"invert: {res.iterations} iters, final loss "
                    f"{res.losses[-1]:.6g}, "
                    f"{len(res.losses) / max(res.wall_s, 1e-9):.2f} it/s "
                    f"wall ({1.0 / max(res.median_step_s, 1e-9):.1f} it/s "
                    "steady-state)"
                )
            else:
                print("invert: checkpoint already at target iterations; "
                      "nothing to do (raise recon.iterations to continue)")
    else:
        print(f"unknown mode {cfg.mode!r}", file=sys.stderr)
        return 2

    if jax.process_index() == 0:
        print(f"{cfg.mode}: done in {time.time() - t0:.2f}s -> {cfg.output_dir}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
