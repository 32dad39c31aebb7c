"""ctypes bindings for the native geometry runtime (tools/native/lbm_geo.cpp)
with pure-NumPy fallbacks.

Replaces the reference's offline C MEX + MATLAB tooling (SURVEY.md 2.2-2.3):
  - vertex adjacency (smoothpatch/vertex_neighbours_double.c semantics)
  - inverse-distance and curvature(-cotangent) Laplacian mesh smoothing
    (smoothpatch_{inversedistance,curvature}_double.c semantics)
  - STL voxelization (the geo_preprocess step described in README.md item
    E but never shipped; CartGen-style Cartesian grid from a surface)
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_LIB_TRIED = False
_SRC_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tools", "native",
)


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = os.path.join(_SRC_DIR, "lbm_geo.so")
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["make", "-C", _SRC_DIR], check=True, capture_output=True
            )
        except Exception as e:
            import warnings

            warnings.warn(
                f"lbm_geo native build failed ({e!r}); geometry ops fall "
                f"back to the slower NumPy paths. Run `make -C "
                f"{_SRC_DIR}` to see the compiler error.",
                RuntimeWarning,
            )
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.build_adjacency.restype = ctypes.c_int64
    lib.build_adjacency.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int,
    ]
    lib.smooth_mesh.restype = None
    lib.smooth_mesh.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
    ]
    lib.voxelize.restype = None
    lib.voxelize.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_double,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    _LIB = lib
    return lib


def have_native() -> bool:
    return _load() is not None


def _ptr(arr, typ):
    return arr.ctypes.data_as(ctypes.POINTER(typ))


# ---------------------------------------------------------------------------
# Vertex adjacency
# ---------------------------------------------------------------------------

def vertex_neighbours(faces: np.ndarray, nv: int):
    """CSR (offsets, neighbors) adjacency from an (nf, 3) face list."""
    faces = np.ascontiguousarray(faces, np.int64)
    lib = _load()
    if lib is not None:
        total = lib.build_adjacency(
            _ptr(faces, ctypes.c_int64), len(faces), nv, None, None, 1
        )
        offsets = np.zeros(nv + 1, np.int64)
        neigh = np.zeros(total, np.int64)
        lib.build_adjacency(
            _ptr(faces, ctypes.c_int64), len(faces), nv,
            _ptr(offsets, ctypes.c_int64), _ptr(neigh, ctypes.c_int64), 0,
        )
        return offsets, neigh
    adj = [[] for _ in range(nv)]
    for a, b, c in faces:
        for u, v in ((a, b), (a, c), (b, a), (b, c), (c, a), (c, b)):
            if v not in adj[u]:
                adj[u].append(v)
    offsets = np.zeros(nv + 1, np.int64)
    flat = []
    for v in range(nv):
        offsets[v] = len(flat)
        flat.extend(adj[v])
    offsets[nv] = len(flat)
    return offsets, np.asarray(flat, np.int64)


# ---------------------------------------------------------------------------
# Mesh smoothing
# ---------------------------------------------------------------------------

def smooth_mesh(
    vertices: np.ndarray,
    faces: np.ndarray,
    iterations: int = 10,
    mode: str = "inversedistance",
    sigma: float = 1e-6,
    lam: float = 0.5,
) -> np.ndarray:
    """Iterative Laplacian smoothing; mode 'inversedistance' or 'curvature'
    (cotangent-flow). Returns new vertices (nv, 3)."""
    verts = np.ascontiguousarray(vertices, np.float64).copy()
    faces = np.ascontiguousarray(faces, np.int64)
    m = {"inversedistance": 0, "curvature": 1}[mode]
    lib = _load()
    if lib is not None:
        lib.smooth_mesh(
            _ptr(verts, ctypes.c_double), len(verts),
            _ptr(faces, ctypes.c_int64), len(faces),
            iterations, m, sigma, lam,
        )
        return verts
    # NumPy fallback (vectorized edge scatter).
    nv = len(verts)
    e = np.concatenate(
        [faces[:, [0, 1]], faces[:, [0, 2]], faces[:, [1, 0]],
         faces[:, [1, 2]], faces[:, [2, 0]], faces[:, [2, 1]]]
    )
    e = np.unique(e, axis=0)
    for _ in range(iterations):
        if m == 0:
            d = np.linalg.norm(verts[e[:, 1]] - verts[e[:, 0]], axis=1)
            w = 1.0 / (d + sigma)
        else:
            w = _cot_weights(verts, faces, e)
        acc = np.zeros_like(verts)
        ws = np.zeros(nv)
        np.add.at(acc, e[:, 0], w[:, None] * verts[e[:, 1]])
        np.add.at(ws, e[:, 0], w)
        ok = ws > 0
        target = np.where(ok[:, None], acc / np.maximum(ws, 1e-300)[:, None],
                          verts)
        verts = (1 - lam) * verts + lam * target
    return verts


def _cot_weights(verts, faces, edges):
    key = {tuple(k): i for i, k in enumerate(map(tuple, edges))}
    w = np.zeros(len(edges))
    for f in faces:
        for corner in range(3):
            o, a, b = f[corner], f[(corner + 1) % 3], f[(corner + 2) % 3]
            u = verts[a] - verts[o]
            v = verts[b] - verts[o]
            cot = max(np.dot(u, v) / (np.linalg.norm(np.cross(u, v)) + 1e-12),
                      0.0)
            w[key[(a, b)]] += cot
            w[key[(b, a)]] += cot
    return w


# ---------------------------------------------------------------------------
# STL loading + voxelization
# ---------------------------------------------------------------------------

def load_stl(path: str) -> np.ndarray:
    """Triangles (ntri, 3, 3) from binary or ASCII STL."""
    with open(path, "rb") as fh:
        head = fh.read(5)
    if head.lower() == b"solid":
        # Could still be binary with a 'solid' header; try ASCII first.
        try:
            return _load_stl_ascii(path)
        except ValueError:
            pass
    return _load_stl_binary(path)


def _load_stl_binary(path: str) -> np.ndarray:
    with open(path, "rb") as fh:
        fh.seek(80)
        (ntri,) = np.frombuffer(fh.read(4), np.uint32)
        data = np.frombuffer(fh.read(int(ntri) * 50), np.uint8)
    rec = data.reshape(int(ntri), 50)
    floats = rec[:, :48].copy().view("<f4").reshape(int(ntri), 4, 3)
    return floats[:, 1:4].astype(np.float64)


def _load_stl_ascii(path: str) -> np.ndarray:
    tris, cur = [], []
    with open(path, "r", errors="strict") as fh:
        for line in fh:
            parts = line.split()
            if parts[:1] == ["vertex"]:
                cur.append([float(p) for p in parts[1:4]])
                if len(cur) == 3:
                    tris.append(cur)
                    cur = []
    if not tris:
        raise ValueError("no ASCII facets found")
    return np.asarray(tris, np.float64)


def voxelize_mesh(
    tris: np.ndarray,
    shape: tuple[int, int, int],
    origin=None,
    spacing: float | None = None,
    margin: int = 2,
) -> np.ndarray:
    """Binary occupancy (nx, ny, nz) from a watertight triangle surface by
    +z parity ray casting at cell centers. If origin/spacing are omitted
    the mesh is fitted into the grid with `margin` empty cells per side."""
    nx, ny, nz = shape
    tris = np.ascontiguousarray(tris, np.float64)
    lo = tris.reshape(-1, 3).min(axis=0)
    hi = tris.reshape(-1, 3).max(axis=0)
    if spacing is None:
        spacing = float(
            np.max((hi - lo) / (np.asarray(shape) - 2 * margin))
        )
    if origin is None:
        center = (lo + hi) / 2
        origin = center - np.asarray(shape) * spacing / 2
    origin = np.ascontiguousarray(origin, np.float64)
    out = np.zeros(nx * ny * nz, np.int32)
    lib = _load()
    if lib is not None:
        lib.voxelize(
            _ptr(tris, ctypes.c_double), len(tris),
            _ptr(origin, ctypes.c_double), float(spacing),
            nx, ny, nz, _ptr(out, ctypes.c_int32),
        )
        return out.reshape(nx, ny, nz)
    return _voxelize_np(tris, origin, spacing, shape)


def _voxelize_np(tris, origin, spacing, shape):
    nx, ny, nz = shape
    px = origin[0] + (np.arange(nx) + 0.5) * spacing
    py = origin[1] + (np.arange(ny) + 0.5) * spacing
    pz = origin[2] + (np.arange(nz) + 0.5) * spacing
    out = np.zeros(shape, np.int32)
    v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]
    d = (v1[:, 1] - v2[:, 1]) * (v0[:, 0] - v2[:, 0]) + (
        v2[:, 0] - v1[:, 0]
    ) * (v0[:, 1] - v2[:, 1])
    keep = np.abs(d) > 1e-30
    v0, v1, v2, d = v0[keep], v1[keep], v2[keep], d[keep]
    for i, x in enumerate(px):
        for j, y in enumerate(py):
            l0 = ((v1[:, 1] - v2[:, 1]) * (x - v2[:, 0])
                  + (v2[:, 0] - v1[:, 0]) * (y - v2[:, 1])) / d
            l1 = ((v2[:, 1] - v0[:, 1]) * (x - v2[:, 0])
                  + (v0[:, 0] - v2[:, 0]) * (y - v2[:, 1])) / d
            l2 = 1.0 - l0 - l1
            hit = (l0 >= 0) & (l1 >= 0) & (l2 > 0)
            if not hit.any():
                continue
            zhit = (l0[hit] * v0[hit, 2] + l1[hit] * v1[hit, 2]
                    + l2[hit] * v2[hit, 2])
            cnt = (zhit[None, :] > pz[:, None]).sum(axis=1)
            out[i, j] = cnt & 1
    return out


def fit_plane_normal(points: np.ndarray) -> np.ndarray:
    """Least-squares plane fit -> unit normal (the fitNormal/fitNormal.m
    capability, SURVEY.md 2.3). SVD of the centered cloud."""
    pts = np.asarray(points, np.float64)
    centered = pts - pts.mean(axis=0)
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    n = vt[-1]
    return n / np.linalg.norm(n)


__all__ = [
    "have_native",
    "vertex_neighbours",
    "smooth_mesh",
    "load_stl",
    "voxelize_mesh",
    "fit_plane_normal",
]
