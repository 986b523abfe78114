"""fdes_tpu — TPU-native forward & inverse dynamical electron scattering.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the CUDA
program FDES (woutervandenbroek/FDES): multislice simulation of TEM/STEM
image series and inverse reconstruction of the specimen potential by
gradient descent, designed SPMD-first for TPU meshes.  See SURVEY.md for the
reference blueprint and fdes_tpu/constants.py for all physics conventions.
"""

from .config import Config, load_config
from .constants import interaction_sigma, lorentz_gamma, wavelength_A
from .forward import (
    hrtem_defocus_series,
    hrtem_tilt_series,
    stem_com_raster,
    stem_raster,
    stem_raster_4d,
)
from .calibrate import (
    chi_device,
    ctf_device,
    default_params,
    fit_instrument,
    hrtem_series_device,
    joint_refine,
)
from .grids import Grid, fresnel_propagator
from .imaging import hrtem_image, hrtem_incoherent, hrtem_series
from .loss import l2_mismatch, make_loss, poisson_nll, tikhonov, total_variation
from .optics import (
    Aberrations,
    aperture,
    chi,
    ctf,
    ctf_quadrature,
    ctf_quadrature_series,
    ctf_series,
    ctf_traced,
    envelopes,
)
from .potential import build_potential, build_potential_exact
from .probe import plane_wave, probe_from_stencil, probe_stencil
from .phonon import phonon_average, phonon_configs, phonon_sliced
from .prism import plan_prism, prism_raster, prism_raster_4d, prism_smatrix
from .propagate import (
    make_slice_step,
    multislice,
    multislice_thickness_series,
    pick_remat_chunk,
    transmit,
)
from .reconstruct import make_optimizer, reconstruct
from .scattering import ScatteringTable, load_kirkland_table
from .sharding import make_mesh, shard_measurements, sharded_value_and_grad
from .specimen import Specimen, SlicedAtoms, make_si110_supercell, slice_specimen

__version__ = "0.1.0"

__all__ = [
    "Aberrations",
    "chi_device",
    "ctf_device",
    "default_params",
    "fit_instrument",
    "hrtem_series_device",
    "joint_refine",
    "Config",
    "Grid",
    "ScatteringTable",
    "SlicedAtoms",
    "Specimen",
    "aperture",
    "build_potential",
    "build_potential_exact",
    "chi",
    "ctf",
    "ctf_quadrature",
    "ctf_quadrature_series",
    "ctf_series",
    "ctf_traced",
    "envelopes",
    "fresnel_propagator",
    "hrtem_defocus_series",
    "hrtem_image",
    "hrtem_incoherent",
    "hrtem_series",
    "hrtem_tilt_series",
    "interaction_sigma",
    "l2_mismatch",
    "poisson_nll",
    "load_config",
    "load_kirkland_table",
    "lorentz_gamma",
    "make_loss",
    "make_mesh",
    "make_optimizer",
    "make_si110_supercell",
    "make_slice_step",
    "plan_prism",
    "prism_raster",
    "prism_raster_4d",
    "prism_smatrix",
    "multislice",
    "multislice_thickness_series",
    "phonon_average",
    "phonon_configs",
    "phonon_sliced",
    "pick_remat_chunk",
    "plane_wave",
    "probe_from_stencil",
    "probe_stencil",
    "reconstruct",
    "shard_measurements",
    "sharded_value_and_grad",
    "slice_specimen",
    "stem_com_raster",
    "stem_raster",
    "stem_raster_4d",
    "tikhonov",
    "total_variation",
    "transmit",
    "wavelength_A",
]
