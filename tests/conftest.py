"""Test configuration: CPU backend with 8 virtual devices, x64 enabled.

Must set env vars BEFORE jax initialises (SURVEY.md §4 distributed tier):
the 8 fake CPU devices let shard_map/psum tests run without a pod, and x64
lets golden-comparison tests run the library in complex128.
"""

import os

# Force CPU for the test suite even if the ambient env selects the TPU
# platform (the real chip has no f64/c128; golden tests need x64).  The env
# var alone is not enough here: the machine's sitecustomize registers the
# TPU backend at interpreter startup, so override via jax.config too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from fdes_tpu.grids import Grid  # noqa: E402
from fdes_tpu.specimen import make_si110_supercell, slice_specimen  # noqa: E402


@pytest.fixture(scope="session")
def si110_small():
    """Config-1-shaped fixture: Si [110], 64x64 grid, 8 slices (kept small so
    the exact-phase golden potential stays fast in CI)."""
    spec = make_si110_supercell(reps=(2, 2, 2))
    lx, ly, _ = spec.box
    grid = Grid(ny=64, nx=64, py=ly / 64, px=lx / 64)
    sliced = slice_specimen(spec, nslices=8)
    return spec, grid, sliced


@pytest.fixture(scope="session")
def si110_config1():
    """BASELINE config 1: Si [110] supercell, 256x256, 16 slices, 300 kV."""
    spec = make_si110_supercell(reps=(4, 3, 3))
    lx, ly, _ = spec.box
    grid = Grid(ny=256, nx=256, py=ly / 256, px=lx / 256)
    sliced = slice_specimen(spec, nslices=16)
    return spec, grid, sliced


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
