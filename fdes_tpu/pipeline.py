"""Config -> device-ready simulation state (SURVEY.md §3.5 init path).

The reference's `main` wires parsing, allocation and plan creation by hand
(SURVEY.md §3.5).  Here `setup()` turns a Config into a `Sim` bundle of
host-built constants (grid, propagator, CTF stack, probe stencil) and
device arrays (potential stack), shared by the CLI, the benchmark harness
and the driver entry points — one construction path, no duplicated wiring.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from . import constants
from .config import Config
from .grids import Grid, fresnel_propagator, host_cast
from .tunnel import safe_put
from .optics import Aberrations, ctf_series
from .potential import build_potential
from .probe import plane_wave, probe_stencil
from .detector import annular_mask
from .specimen import Specimen, SlicedAtoms, load_xyz, make_si110_supercell, slice_specimen


@dataclasses.dataclass
class Sim:
    """Device-ready state for one simulation/reconstruction run."""

    cfg: Config
    grid: Grid
    specimen: Specimen
    sliced: SlicedAtoms
    wavelength_A: float
    sigma: float
    cdtype: object  # jnp complex dtype
    rdtype: object  # jnp real dtype
    v_stack: object  # (S, ny, nx) device array, V*Å
    propagator: object  # (ny, nx) device complex
    psi0: object  # (ny, nx) device complex incident wave
    ctf_stack: object  # (D, ny, nx) device complex; (D, K, ny, nx) explicit
    aberrations: Aberrations
    psi0_stack: object = None  # (T, ny, nx) tilt-series incident waves
    prop_stack: object = None  # (T, ny, nx) tilt-series propagators
    #: (K,) quadrature weights when optics.coherence == "explicit"
    #: (forward passes them to the incoherent-average imaging path);
    #: None for the closed-form envelope model.
    ctf_weights: object = None
    #: ScatteringTable the potential was built with (phonon re-builds reuse it)
    table: object = None


def _dtypes(name: str):
    if name in ("complex64", "c64"):
        return jnp.complex64, jnp.float32
    if name in ("complex128", "c128"):
        return jnp.complex128, jnp.float64
    raise ValueError(f"unsupported dtype {name!r}")


def load_specimen(cfg: Config) -> Specimen:
    sp = cfg.specimen
    if sp.atoms_path:
        return load_xyz(sp.atoms_path, sp.box_A, bfactor=sp.bfactor_A2)
    return make_si110_supercell(reps=sp.reps, bfactor=sp.bfactor_A2)


def make_table(cfg: Config):
    """ScatteringTable from SpecimenParams (wentzel/moliere/kirkland)."""
    from .scattering import ScatteringTable, load_kirkland_table

    sp = cfg.specimen
    if sp.scattering == "kirkland":
        if not sp.scattering_path:
            raise ValueError(
                "specimen.scattering='kirkland' needs specimen.scattering_path "
                "(an fparams.dat-layout table; docs/SCATTERING.md)"
            )
        return load_kirkland_table(sp.scattering_path)
    if sp.scattering in ("wentzel", "moliere"):
        return ScatteringTable(kind=sp.scattering)
    raise ValueError(
        f"specimen.scattering must be wentzel|moliere|kirkland, got "
        f"{sp.scattering!r}"
    )


def setup(cfg: Config) -> Sim:
    cdt, rdt = _dtypes(cfg.sim.dtype)
    spec = load_specimen(cfg)
    fy = cfg.sim.fov_y_A or float(spec.box[1])
    fx = cfg.sim.fov_x_A or float(spec.box[0])
    if fy <= 0 or fx <= 0:
        raise ValueError(
            "field of view is zero: set sim.fov_y_A/fov_x_A or specimen.box_A "
            f"(got fov=({fy}, {fx}); atoms_path={cfg.specimen.atoms_path!r})"
        )
    grid = Grid(ny=cfg.sim.ny, nx=cfg.sim.nx, py=fy / cfg.sim.ny, px=fx / cfg.sim.nx)
    dz = cfg.sim.dz_A or None
    if dz is None and float(spec.box[2]) <= 0:
        raise ValueError(
            "slice thickness is zero: set sim.dz_A or a positive specimen "
            "box_A[2]"
        )
    sliced = slice_specimen(spec, cfg.sim.nslices, dz=dz)

    lam = constants.wavelength_A(cfg.sim.voltage_V)
    sigma = constants.interaction_sigma(cfg.sim.voltage_V)

    table = make_table(cfg)
    if cfg.sim.streamed:
        # pod-memory policy: the potential stack is built slice-by-slice
        # inside the propagation scan (multislice_streamed) and never
        # materialises — only the forward mode can stream (in the inverse
        # the stack IS the optimization variable)
        if cfg.mode != "forward":
            raise ValueError(
                f"sim.streamed supports mode='forward' only (got {cfg.mode!r})"
            )
        for bad, name in (
            (cfg.sim.absorptive_factor > 0.0, "sim.absorptive_factor"),
            (cfg.sim.phonon_configs > 0, "sim.phonon_configs"),
            (cfg.sim.thickness_every > 0, "sim.thickness_every"),
        ):
            if bad:
                raise ValueError(f"sim.streamed is incompatible with {name}")
        v_stack = None
    else:
        v_stack = build_potential(sliced, grid, table=table, dtype=rdt)
        if cfg.sim.absorptive_factor > 0.0:
            # absorptive (optical) potential: imaginary part damps the wave
            # (propagate.transmit handles complex V)
            v_stack = v_stack + 1j * cfg.sim.absorptive_factor * jnp.abs(v_stack)
    # safe_put: complex constants travel as two float planes (TPU tunnels
    # cannot transfer complex buffers — fdes_tpu/tunnel.py)
    prop = safe_put(
        host_cast(
            fresnel_propagator(
                grid,
                lam,
                sliced.dz,
                tilt_xy_rad=(cfg.sim.tilt_x_rad, cfg.sim.tilt_y_rad),
                bandlimit=cfg.sim.bandlimit or None,
            ),
            cdt,
        )
    )
    psi0 = plane_wave(grid, lam, dtype=cdt)

    ab = Aberrations(
        defocus=cfg.optics.defoci_A[0],
        cs=cfg.optics.cs_A,
        c5=cfg.optics.c5_A,
        a1=cfg.optics.a1_A,
        a1_angle=cfg.optics.a1_angle_rad,
        b2=cfg.optics.b2_A,
        b2_angle=cfg.optics.b2_angle_rad,
        a2=cfg.optics.a2_A,
        a2_angle=cfg.optics.a2_angle_rad,
        s3=cfg.optics.s3_A,
        s3_angle=cfg.optics.s3_angle_rad,
        a3=cfg.optics.a3_A,
        a3_angle=cfg.optics.a3_angle_rad,
    )
    ctf_weights = None
    if cfg.optics.coherence == "explicit":
        from .optics import ctf_quadrature_series

        quads, weights = ctf_quadrature_series(
            grid,
            lam,
            np.asarray(cfg.optics.defoci_A, dtype=np.float64),
            base=ab,
            aperture_semiangle_rad=cfg.optics.aperture_rad,
            defocus_spread_A=cfg.optics.defocus_spread_A,
            source_semiangle_rad=cfg.optics.source_semiangle_rad,
            n_defocus=cfg.optics.quad_defocus,
            n_tilt=cfg.optics.quad_tilt,
        )
        ctfs = safe_put(host_cast(quads, cdt))
        ctf_weights = jnp.asarray(weights.astype(np.float32 if rdt == jnp.float32 else np.float64))
    elif cfg.optics.coherence == "envelope":
        ctfs = safe_put(
            host_cast(
                ctf_series(
                    grid,
                    lam,
                    np.asarray(cfg.optics.defoci_A, dtype=np.float64),
                    base=ab,
                    aperture_semiangle_rad=cfg.optics.aperture_rad,
                    defocus_spread_A=cfg.optics.defocus_spread_A,
                    source_semiangle_rad=cfg.optics.source_semiangle_rad,
                ),
                cdt,
            )
        )
    else:
        raise ValueError(
            f"optics.coherence must be 'envelope' or 'explicit', got "
            f"{cfg.optics.coherence!r}"
        )
    psi0_stack = prop_stack = None
    if cfg.sim.tilt_series_rad:
        # Specimen-tilt convention: the beam stays along z (untilted plane
        # wave) and each tilt enters ONLY as the propagator shear term.
        # Tilting the incident wave as well would put beam and specimen in
        # the same tilted frame — the ramp and shear cancel exactly and the
        # series degenerates (caught in review; the relative tilt is what
        # carries the projection information).
        tilts = [tuple(t) for t in cfg.sim.tilt_series_rad]
        psi0_stack = jnp.stack([plane_wave(grid, lam, dtype=cdt) for _ in tilts])
        prop_stack = jnp.stack(
            [
                safe_put(
                    host_cast(
                        fresnel_propagator(
                            grid, lam, sliced.dz, tilt_xy_rad=t,
                            bandlimit=cfg.sim.bandlimit or None,
                        ),
                        cdt,
                    )
                )
                for t in tilts
            ]
        )
    return Sim(
        cfg=cfg,
        grid=grid,
        specimen=spec,
        sliced=sliced,
        wavelength_A=lam,
        sigma=sigma,
        cdtype=cdt,
        rdtype=rdt,
        v_stack=v_stack,
        propagator=prop,
        psi0=psi0,
        ctf_stack=ctfs,
        aberrations=ab,
        psi0_stack=psi0_stack,
        prop_stack=prop_stack,
        ctf_weights=ctf_weights,
        table=table,
    )


def build_mesh(cfg: Config):
    """The run's device mesh from MeshParams, or None when 1 device.

    Called by the CLI so `fdes-tpu invert/stem` on a pod actually shards the
    measurement axis instead of running replicated (round-1 C19 gap).
    """
    import jax

    from .sharding import make_mesh

    if len(jax.devices()) <= 1 and not cfg.mesh.shape:
        return None
    return make_mesh(
        axis_names=tuple(cfg.mesh.axis_names),
        shape=tuple(cfg.mesh.shape) or None,
    )


def shard_series(mesh, *arrays):
    """Shard (M, ...) arrays' leading axis over the mesh; replicate with a
    warning when M does not divide (CLI robustness: a 10-image series on 8
    chips should run, not die)."""
    if mesh is None:
        return arrays[0] if len(arrays) == 1 else arrays

    from .sharding import data_axis_size, shard_measurements

    n = data_axis_size(mesh)
    if any(a.shape[0] % n for a in arrays):
        import sys

        print(
            f"# mesh: series length {arrays[0].shape[0]} not divisible by "
            f"{n} devices; running replicated (pad the series to shard)",
            file=sys.stderr,
        )
        return arrays[0] if len(arrays) == 1 else arrays
    return shard_measurements(mesh, *arrays)


def shard_sim(sim: Sim, mesh) -> Sim:
    """Shard the Sim's measurement-series axes over the mesh.

    Defocus series: ctf_stack's D axis; tilt series: the (psi0, propagator)
    pairs.  The potential/propagator/incident wave stay replicated — the
    step's only collective is the gradient psum (SURVEY.md §2.2 design rule).
    """
    if mesh is None:
        return sim
    if sim.psi0_stack is not None:
        sim.psi0_stack, sim.prop_stack = shard_series(
            mesh, sim.psi0_stack, sim.prop_stack
        )
    elif getattr(sim.ctf_stack, "ndim", 0) >= 3 and sim.ctf_stack.shape[0] > 1:
        sim.ctf_stack = shard_series(mesh, sim.ctf_stack)
    return sim


def stem_setup(sim: Sim):
    """Probe stencil, scan positions and detector masks for STEM mode."""
    st = sim.cfg.stem
    stencil = safe_put(
        host_cast(
            probe_stencil(sim.grid, sim.wavelength_A, st.semiangle_rad, sim.aberrations),
            sim.cdtype,
        )
    )
    qy = jnp.asarray(host_cast(sim.grid.qy()[:, None], sim.rdtype))
    qx = jnp.asarray(host_cast(sim.grid.qx()[None, :], sim.rdtype))
    ly = st.scan_ly_A or sim.grid.extent[0]
    lx = st.scan_lx_A or sim.grid.extent[1]
    ys = st.scan_y0_A + (np.arange(st.scan_ny) + 0.5) * ly / st.scan_ny
    xs = st.scan_x0_A + (np.arange(st.scan_nx) + 0.5) * lx / st.scan_nx
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    positions = jnp.asarray(
        host_cast(np.stack([gy.ravel(), gx.ravel()], axis=-1), sim.rdtype)
    )
    mask_list = [annular_mask(sim.grid, sim.wavelength_A, i, o) for i, o in st.detectors]
    if st.dpc_nseg > 0:
        from .detector import segmented_masks

        inner, outer = st.detectors[0]
        mask_list.extend(
            segmented_masks(
                sim.grid, sim.wavelength_A, inner, outer, nseg=st.dpc_nseg
            )
        )
    masks = np.stack(mask_list)
    return stencil, qy, qx, positions, jnp.asarray(host_cast(masks, sim.rdtype))


def prism_setup(sim: Sim):
    """PRISM beam plan for the configured probe (stem.method = "prism").

    Reuses the exact probe stencil (HOST c128, before device cast) so the
    interp=1 plan reproduces stem_setup's probe identically.
    """
    from .prism import plan_prism

    st = sim.cfg.stem
    stencil_host = probe_stencil(
        sim.grid, sim.wavelength_A, st.semiangle_rad, sim.aberrations
    )
    return plan_prism(sim.grid, stencil_host, interp=max(st.prism_interp, 1))
