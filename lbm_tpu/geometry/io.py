"""Loaders/savers for the reference's geometry and BC file formats.

geo.txt: whitespace-separated integers; two orderings exist in the wild:
  - 'xyz' (x fastest, then y, then z) — bifurcation.cu:51-60
  - 'yxz' (y fastest, then x, then z) — coronary.cu:46-55
bc.txt: three (nz, nx) slices of floats (x fastest, then z); the code uses
slice 0 as the inlet (y=1) map and slice 1 as the outlet (y=ny-2) map
(bifurcation.cu:294-326); slice 2 is unused.
"""

from __future__ import annotations

import numpy as np


def load_geo(path: str, shape: tuple[int, int, int], order: str = "xyz") -> np.ndarray:
    """Load a binary occupancy grid into an (nx, ny, nz) int32 array."""
    nx, ny, nz = shape
    vals = np.fromfile(path, dtype=np.int64, sep=" ").astype(np.int32)
    if vals.size != nx * ny * nz:
        raise ValueError(
            f"geo file {path} has {vals.size} entries, expected {nx*ny*nz}"
        )
    if order == "xyz":  # z outer, y, x fastest
        return vals.reshape(nz, ny, nx).transpose(2, 1, 0).copy()
    if order == "yxz":  # z outer, x, y fastest
        return vals.reshape(nz, nx, ny).transpose(1, 2, 0).copy()
    raise ValueError(f"unknown geo order {order!r}")


def save_geo(path: str, flag: np.ndarray, order: str = "xyz") -> None:
    if order == "xyz":
        flat = flag.transpose(2, 1, 0).ravel()
    elif order == "yxz":
        flat = flag.transpose(2, 0, 1).ravel()
    else:
        raise ValueError(f"unknown geo order {order!r}")
    # Chunked writes: a single join of a coronary-sized grid (31.5M ints)
    # would build a ~100 MB string.
    with open(path, "w") as fh:
        chunk = 1 << 20
        for i in range(0, flat.size, chunk):
            part = flat[i : i + chunk]
            fh.write(" ".join(map(str, part.tolist())))
            fh.write(" " if i + chunk < flat.size else "")


def load_bc(path: str, nx: int, nz: int) -> list[np.ndarray]:
    """Load the lattice-velocity map slabs of a bc.txt, each (nx, nz) f32.

    The file holds consecutive (nz, nx) slabs (x fastest, then z). The
    reference reads slab 0 as the inlet (y=1) map and slab 1 as the outlet
    (y=ny-2) map (bifurcation.cu:294-326). Note: in the *shipped* bc.txt
    slab 0 is all zeros and the measured profile lives in slab 1, whose
    nonzero footprint exactly matches the y=1 inlet opening of geo.txt —
    the intended inlet map is slab 1 (see cases/bifurcation.py).
    """
    vals = np.fromfile(path, dtype=np.float64, sep=" ").astype(np.float32)
    if vals.size % (nx * nz) != 0 or vals.size == 0:
        raise ValueError(
            f"bc file {path} has {vals.size} entries, not a multiple of {nx*nz}"
        )
    nslabs = vals.size // (nx * nz)
    return [
        vals[s * nx * nz : (s + 1) * nx * nz].reshape(nz, nx).T.copy()
        for s in range(nslabs)
    ]


__all__ = ["load_geo", "save_geo", "load_bc"]
