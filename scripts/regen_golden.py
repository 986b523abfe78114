"""Regenerate the frozen golden pack (SURVEY §4 fixtures row).

The pack freezes f64 golden outputs for config-1-shaped workloads so the
test suite detects DRIFT in either the golden implementation or the physics
conventions — regeneration is deliberate (run this script, review the diff,
commit), never automatic.

Usage: python scripts/regen_golden.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "golden"
)


def build():
    from fdes_tpu.constants import interaction_sigma, wavelength_A
    from fdes_tpu.golden import (
        golden_hrtem,
        golden_multislice,
        golden_potential_exact,
    )
    from fdes_tpu.grids import Grid
    from fdes_tpu.optics import Aberrations, ctf_series
    from fdes_tpu.specimen import make_si110_supercell, slice_specimen

    kv = 300e3
    spec = make_si110_supercell(reps=(2, 2, 2))
    lx, ly, _ = spec.box
    grid = Grid(ny=64, nx=64, py=ly / 64, px=lx / 64)
    sliced = slice_specimen(spec, nslices=8)
    lam = wavelength_A(kv)

    v = golden_potential_exact(sliced, grid)
    psi = golden_multislice(
        np.ones(grid.shape, np.complex128), v, grid, kv, sliced.dz
    )
    ctf = ctf_series(
        grid, lam, np.array([-200.0, 0.0, 200.0]), Aberrations(cs=1.2e7), 20e-3
    )
    images = np.stack([golden_hrtem(psi, c) for c in ctf])
    return {
        "si110_2x2x2_64_potential": v,
        "si110_2x2x2_64_exit_wave": psi,
        "si110_2x2x2_64_images": images,
        "meta_sigma": np.array([interaction_sigma(kv)]),
        "meta_lambda": np.array([lam]),
    }


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    pack = build()
    out = os.path.join(GOLDEN_DIR, "si110_golden_pack.npz")
    np.savez_compressed(out, **pack)
    print(f"wrote {out}:")
    for k, v in pack.items():
        print(f"  {k}: {v.shape} {v.dtype}")


if __name__ == "__main__":
    main()
