"""fdes_tpu — TPU-native forward & inverse dynamical electron scattering.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the CUDA
program FDES (woutervandenbroek/FDES): multislice simulation of TEM/STEM
image series and inverse reconstruction of the specimen potential by
gradient descent, designed SPMD-first for TPU meshes.  See SURVEY.md for the
reference blueprint and fdes_tpu/constants.py for all physics conventions.
"""

from .constants import interaction_sigma, lorentz_gamma, wavelength_A
from .grids import Grid, fresnel_propagator
from .optics import Aberrations, aperture, chi, ctf, ctf_series, envelopes
from .probe import plane_wave, probe_from_stencil, probe_stencil
from .propagate import multislice, pick_remat_chunk, transmit
from .scattering import ScatteringTable, load_kirkland_table
from .specimen import Specimen, SlicedAtoms, make_si110_supercell, slice_specimen

__version__ = "0.1.0"

__all__ = [
    "Aberrations",
    "Grid",
    "ScatteringTable",
    "SlicedAtoms",
    "Specimen",
    "aperture",
    "chi",
    "ctf",
    "ctf_series",
    "envelopes",
    "fresnel_propagator",
    "interaction_sigma",
    "load_kirkland_table",
    "lorentz_gamma",
    "make_si110_supercell",
    "multislice",
    "pick_remat_chunk",
    "plane_wave",
    "probe_from_stencil",
    "probe_stencil",
    "slice_specimen",
    "transmit",
    "wavelength_A",
]
