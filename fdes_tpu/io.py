"""Array I/O: npy/npz plus reference-compatible raw binary (SURVEY.md C18).

The reference reads and writes raw float32/complex64 binary dumps of images
and potentials (`rwBinary.cu` [U?], SURVEY.md C18).  The rebuild's native
format is .npy/.npz (self-describing, mmap-able); `read_raw`/`write_raw`
keep byte-compatibility with reference-style dumps so old inputs/outputs can
be cross-checked (SURVEY.md §5 config row "compat reader").
"""

from __future__ import annotations

import os

import numpy as np


def _to_host(arr) -> np.ndarray:
    """Device->host that survives TPU tunnels: complex device arrays must
    come back as real/imag planes (tunnel.py), NumPy inputs pass through."""
    if isinstance(arr, np.ndarray):
        return arr
    if hasattr(arr, "dtype") and hasattr(arr, "sharding"):  # jax.Array
        from .tunnel import fetch_array

        return fetch_array(arr)
    return np.asarray(arr)


def write_npy(path: str, arr) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.save(path, _to_host(arr))


def read_npy(path: str) -> np.ndarray:
    return np.load(path)


def write_raw(path: str, arr, dtype=None) -> None:
    """Raw little-endian binary dump, C order, no header (reference format).

    Complex arrays are written as interleaved (re, im) pairs of the scalar
    dtype — the layout of a C float2/cuComplex buffer.
    """
    a = _to_host(arr)
    if dtype is not None:
        a = a.astype(dtype)
    if np.iscomplexobj(a):
        scalar = np.float32 if a.dtype == np.complex64 else np.float64
        a = np.stack([a.real, a.imag], axis=-1).astype(scalar)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    a.astype(a.dtype.newbyteorder("<")).tofile(path)


def read_raw(
    path: str, shape: tuple[int, ...], dtype=np.float32, complex_interleaved=False
) -> np.ndarray:
    """Read a headerless binary dump written by write_raw / the reference.

    complex_interleaved: interpret the file as (re, im) pairs of ``dtype``
    and return the matching complex array of ``shape``.
    """
    scalar = np.dtype(dtype).newbyteorder("<")
    if complex_interleaved:
        flat = np.fromfile(path, dtype=scalar)
        expected = int(np.prod(shape)) * 2
        if flat.size != expected:
            raise ValueError(
                f"{path}: {flat.size} scalars != expected {expected} for "
                f"complex shape {shape}"
            )
        pairs = flat.reshape(*shape, 2)
        cdt = np.complex64 if scalar == np.float32 else np.complex128
        return (pairs[..., 0] + 1j * pairs[..., 1]).astype(cdt)
    flat = np.fromfile(path, dtype=scalar)
    if flat.size != int(np.prod(shape)):
        raise ValueError(
            f"{path}: {flat.size} scalars != expected {int(np.prod(shape))} "
            f"for shape {shape}"
        )
    return flat.reshape(shape)
