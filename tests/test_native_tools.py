"""Native geometry runtime tests: adjacency, smoothing, STL voxelization,
plane fitting — the TPU-era equivalents of the reference's MATLAB/C MEX
pipeline (SURVEY.md 2.2-2.3) plus the never-shipped geo_preprocess."""

import numpy as np
import pytest

from lbm_tpu.geometry.native import (
    fit_plane_normal,
    have_native,
    load_stl,
    smooth_mesh,
    vertex_neighbours,
    voxelize_mesh,
)


def _icosphere(subdiv=2):
    """Unit icosahedron refined `subdiv` times, projected to the sphere."""
    t = (1 + 5**0.5) / 2
    verts = np.array(
        [[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
         [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
         [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]],
        np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array(
        [[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
         [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
         [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
         [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
        np.int64,
    )
    for _ in range(subdiv):
        mid = {}
        vlist = list(verts)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in mid:
                m = (vlist[a] + vlist[b]) / 2
                m /= np.linalg.norm(m)
                mid[key] = len(vlist)
                vlist.append(m)
            return mid[key]

        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc],
                          [ab, bc, ca]]
        verts = np.asarray(vlist)
        faces = np.asarray(new_faces, np.int64)
    return verts, faces


def test_native_library_builds():
    assert have_native(), "tools/native/lbm_geo.so failed to build/load"


def test_vertex_neighbours():
    faces = np.array([[0, 1, 2], [1, 2, 3]], np.int64)
    offsets, neigh = vertex_neighbours(faces, 4)
    assert offsets[-1] == len(neigh)
    n0 = set(neigh[offsets[0]:offsets[1]].tolist())
    n1 = set(neigh[offsets[1]:offsets[2]].tolist())
    assert n0 == {1, 2}
    assert n1 == {0, 2, 3}


@pytest.mark.parametrize("mode", ["inversedistance", "curvature"])
def test_smoothing_reduces_noise(mode):
    rng = np.random.default_rng(1)
    verts, faces = _icosphere(2)
    noisy = verts + 0.05 * rng.standard_normal(verts.shape)
    sm = smooth_mesh(noisy, faces, iterations=10, mode=mode)
    # Smoothing must pull radii back toward constancy (sphere-ness).
    assert np.std(np.linalg.norm(sm, axis=1)) < np.std(
        np.linalg.norm(noisy, axis=1)
    )
    assert np.isfinite(sm).all()


def test_smoothing_native_matches_numpy():
    rng = np.random.default_rng(2)
    verts, faces = _icosphere(1)
    noisy = verts + 0.03 * rng.standard_normal(verts.shape)
    if not have_native():
        pytest.skip("native lib unavailable")
    import lbm_tpu.geometry.native as nat

    a = smooth_mesh(noisy, faces, iterations=3, mode="inversedistance")
    lib, nat._LIB, nat._LIB_TRIED = nat._LIB, None, True
    try:
        b = smooth_mesh(noisy, faces, iterations=3, mode="inversedistance")
    finally:
        nat._LIB = lib
    np.testing.assert_allclose(a, b, atol=1e-9)


def test_voxelize_sphere_volume():
    verts, faces = _icosphere(3)
    tris = verts[faces]
    n = 40
    occ = voxelize_mesh(tris, (n, n, n), margin=4)
    # Volume of the unit sphere vs voxel count.
    spacing = 2.0 / (n - 8)
    vol = occ.sum() * spacing**3
    assert abs(vol - 4 / 3 * np.pi) / (4 / 3 * np.pi) < 0.05
    # Center inside, corners outside.
    assert occ[n // 2, n // 2, n // 2] == 1
    assert occ[0, 0, 0] == 0


def test_voxelize_bifurcation_stl(reference_root):
    tris = load_stl(f"{reference_root}/bifurcation/bif.stl")
    assert len(tris) > 1000
    occ = voxelize_mesh(tris, (64, 83, 32), margin=1)
    frac = occ.mean()
    # The shipped geo.txt has 31% occupancy; a fresh voxelization of the
    # same surface must land in the same ballpark.
    assert 0.1 < frac < 0.6
    # The vessel is a single dominant connected slab along y.
    assert occ[:, 40, :].sum() > 50


def test_fit_plane_normal():
    rng = np.random.default_rng(3)
    pts = np.stack(
        [rng.uniform(-1, 1, 200), rng.uniform(-1, 1, 200),
         np.zeros(200)], axis=1,
    )
    n = fit_plane_normal(pts + 0.001 * rng.standard_normal((200, 3)))
    assert abs(abs(n[2]) - 1) < 1e-3


def test_geo_preprocess_pipeline(reference_root, tmp_path):
    """End-to-end STL -> labeled mask (the capability the reference
    describes in README item E but never ships)."""
    from lbm_tpu.geometry.preprocess import label_occupancy, stl_to_occupancy

    flag = stl_to_occupancy(
        f"{reference_root}/bifurcation/bif.stl", (64, 83, 32)
    )
    geo = label_occupancy(flag, inlet_axis=1)
    labels = dict(zip(*map(list, np.unique(geo, return_counts=True))))
    assert set(labels) == {-1, 0, 1, 2, 3, 4}
    # Openings comparable to the shipped mask (345 inlet / 306 outlet).
    assert 200 < labels[2] < 500
    assert 200 < labels[3] < 500
    # Occupancy in the shipped ballpark (geo.txt: 31%).
    assert 0.2 < flag.mean() < 0.4


def test_geo_preprocess_registered_matches_shipped(reference_root):
    """GRID-REGISTERED voxelization (spacing = case CH, centered, open
    ends extruded) must reproduce the shipped bifurcation geometry
    nearly cell-for-cell through the case's own label chain — the
    L0->L7 closure at the geometry level (r4: converged midplane
    fields then agree to l2_rel 6.4%, corr 0.997;
    tools/l0l7_bifurcation.py)."""
    from lbm_tpu.cases.bifurcation import build_labels
    from lbm_tpu.geometry.io import load_geo
    from lbm_tpu.geometry.mask import CellType
    from lbm_tpu.geometry.preprocess import (
        extrude_open_ends,
        stl_to_occupancy,
    )

    flag = stl_to_occupancy(
        f"{reference_root}/bifurcation/bif.stl", (64, 83, 32),
        spacing=0.248925,  # CH in the STL's mm units
    )
    flag = extrude_open_ends(flag, axis=1)
    shipped = load_geo(f"{reference_root}/bifurcation/geo.txt",
                       (64, 83, 32), order="xyz")
    # cell-level occupancy agreement (voxelizer + registration)
    interior = (slice(None), slice(2, -2), slice(None))
    agree = (flag[interior] > 0) == (shipped[interior] > 0)
    assert agree.mean() > 0.98, agree.mean()  # measured 0.988 (the
    # disagreement is the +/-1-cell wall band of a surface-vs-grid fit)
    # label-level agreement through the case's own chain
    mask_self = build_labels(flag)
    mask_ref = build_labels(shipped)
    n_self = int((mask_self != 0).sum())
    n_ref = int((mask_ref != 0).sum())
    assert abs(n_self - n_ref) / n_ref < 0.005, (n_self, n_ref)
    for label in (CellType.INLET, CellType.OUTLET):
        a = int((mask_self == label).sum())
        b = int((mask_ref == label).sum())
        assert abs(a - b) / b < 0.05, (label, a, b)
