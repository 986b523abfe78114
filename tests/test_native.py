"""Native C++ specimen I/O vs the Python implementations (SURVEY C3/C18)."""

import numpy as np
import pytest

from fdes_tpu import native
from fdes_tpu.specimen import load_xyz, make_si110_supercell, slice_specimen

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for native lib"
)


def _write_xyz(tmp_path, lines, count=None):
    body = "\n".join(lines)
    n = count if count is not None else len(lines)
    p = tmp_path / "a.xyz"
    p.write_text(f"{n}\ncomment line\n{body}\n")
    return str(p)


def test_parse_matches_python(tmp_path, rng):
    n = 500
    syms = np.array(["Si", "O", "Au"])[rng.integers(0, 3, n)]
    pos = rng.normal(size=(n, 3)) * 20.0
    b = rng.random(n)
    occ = rng.random(n)
    lines = [
        f"{s} {p[0]:.9f} {p[1]:.9f} {p[2]:.9f} {bb:.6f} {oo:.6f}"
        for s, p, bb, oo in zip(syms, pos, b, occ)
    ]
    path = _write_xyz(tmp_path, lines)
    box = (50.0, 50.0, 50.0)
    sp_native = load_xyz(path, box, native=True)
    sp_python = load_xyz(path, box, native=False)
    np.testing.assert_allclose(sp_native.positions, sp_python.positions)
    np.testing.assert_array_equal(sp_native.numbers, sp_python.numbers)
    np.testing.assert_allclose(sp_native.bfactors, sp_python.bfactors)
    np.testing.assert_allclose(sp_native.occupancies, sp_python.occupancies)


def test_parse_defaults_and_numeric_z(tmp_path):
    path = _write_xyz(
        tmp_path,
        ["Si 1.0 2.0 3.0", "14 4.0 5.0 6.0 0.3", "O 0.5 0.5 0.5 0.1 0.9"],
    )
    sp = load_xyz(path, (10, 10, 10), bfactor=0.77, native=True)
    np.testing.assert_array_equal(sp.numbers, [14, 14, 8])
    np.testing.assert_allclose(sp.bfactors, [0.77, 0.3, 0.1])
    np.testing.assert_allclose(sp.occupancies, [1.0, 1.0, 0.9])


def test_parse_errors(tmp_path):
    bad_sym = _write_xyz(tmp_path, ["Qq 1 2 3"])
    with pytest.raises(ValueError):
        native.parse_xyz(bad_sym)
    short = _write_xyz(tmp_path, ["Si 1 2"], count=1)
    with pytest.raises(ValueError):
        native.parse_xyz(short)
    p = tmp_path / "h.xyz"
    p.write_text("not-a-count\nx\n")
    with pytest.raises(ValueError):
        native.parse_xyz(str(p))


def test_bin_slices_matches_python_clamping(rng):
    z = np.concatenate([rng.normal(size=200) * 30.0, [-1e5, 1e5]])
    idx_native = native.bin_slices(z, z0=0.0, dz=2.5, nslices=16)
    idx_py = np.clip(np.floor(z / 2.5).astype(np.int64), 0, 15)
    np.testing.assert_array_equal(idx_native, idx_py)


def test_species_index_matches_slicer():
    spec = make_si110_supercell(reps=(1, 1, 1))
    sl = slice_specimen(spec, 2)
    soa, species = native.species_index(spec.numbers, spec.bfactors)
    # same partition (native is first-seen order, python slicer sorts)
    assert len(species) == len(sl.species)
    assert set(species) == set(sl.species)
    remap = {i: sl.species.index(sp) for i, sp in enumerate(species)}
    np.testing.assert_array_equal(
        np.array([remap[i] for i in soa]), sl.species_idx
    )
