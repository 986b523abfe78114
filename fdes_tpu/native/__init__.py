"""ctypes bindings for the native specimen I/O library (SURVEY.md C3/C18).

The shared library is compiled from specimen_io.cpp with g++ on first use
and cached next to this package (or $FDES_NATIVE_CACHE).  Every entry point
has a NumPy fallback, so `available()` gating is the only coupling — an
environment without a toolchain loses speed, not features.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "specimen_io.cpp")
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_TRIED = False


def _cache_dir() -> str:
    d = os.environ.get("FDES_NATIVE_CACHE") or os.path.join(
        os.path.dirname(_SRC), "_build"
    )
    os.makedirs(d, exist_ok=True)
    return d


def _build() -> str | None:
    out = os.path.join(_cache_dir(), "libfdes_specimen_io.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(_SRC):
        return out
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", out + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return None
    os.replace(out + ".tmp", out)
    return out


def _load() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.fdes_parse_xyz.restype = ctypes.c_int64
        lib.fdes_parse_xyz.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.fdes_bin_slices.restype = None
        lib.fdes_bin_slices.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.fdes_species_index.restype = ctypes.c_int32
        lib.fdes_species_index.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double),
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _ip(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def parse_xyz(path: str, default_b: float = 0.0):
    """Parse an .xyz file -> (positions (n,3) f64, Z (n,) i32, B, occ).

    Raises ValueError on malformed files; RuntimeError if the native
    library is unavailable (callers use specimen.load_xyz which falls back).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native specimen_io library unavailable")
    with open(path, "rb") as fh:
        buf = fh.read()
    first = buf.split(b"\n", 1)[0].strip() or b"-1"
    try:
        cap = int(first)
    except ValueError:
        raise ValueError(f"{path}: bad atom-count header {first!r}") from None
    if cap < 0:
        raise ValueError(f"{path}: bad atom-count header")
    xyz = np.empty((cap, 3), np.float64)
    zed = np.empty((cap,), np.int32)
    bfac = np.empty((cap,), np.float64)
    occ = np.empty((cap,), np.float64)
    n = lib.fdes_parse_xyz(
        buf, len(buf), cap, default_b, _dp(xyz), _ip(zed), _dp(bfac), _dp(occ)
    )
    if n < 0:
        raise ValueError(f"{path}: xyz parse error code {n}")
    return xyz[:n], zed[:n], bfac[:n], occ[:n]


def bin_slices(z: np.ndarray, z0: float, dz: float, nslices: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native specimen_io library unavailable")
    z = np.ascontiguousarray(z, np.float64)
    out = np.empty((z.shape[0],), np.int32)
    lib.fdes_bin_slices(_dp(z), z.shape[0], z0, dz, nslices, _ip(out))
    return out


def species_index(zed: np.ndarray, bfac: np.ndarray):
    """(species_of_atom (n,) i32, [(Z, B), ...] in first-seen order)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native specimen_io library unavailable")
    zed = np.ascontiguousarray(zed, np.int32)
    bfac = np.ascontiguousarray(bfac, np.float64)
    n = zed.shape[0]
    soa = np.empty((n,), np.int32)
    sz = np.empty((n,), np.int32)
    sb = np.empty((n,), np.float64)
    nsp = lib.fdes_species_index(_ip(zed), _dp(bfac), n, _ip(soa), _ip(sz), _dp(sb))
    species = [(int(sz[i]), float(sb[i])) for i in range(nsp)]
    return soa, species
