"""Tetrahedralization tests: native C++ vs NumPy fallback, mesh import path."""

import numpy as np
import pytest

from pies_tpu.scene import tetmesh
from pies_tpu.native import load as native_load


def icosphere(radius=1.0):
    """A coarse closed sphere mesh (icosahedron)."""
    phi = (1 + 5**0.5) / 2
    v = np.array(
        [
            [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
            [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
            [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1],
        ],
        np.float32,
    )
    v = v / np.linalg.norm(v, axis=1, keepdims=True) * radius
    f = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int32,
    )
    return v, f


class TestPointsInMesh:
    def test_sphere_interior(self):
        v, f = icosphere(1.0)
        pts = np.array(
            [[0, 0, 0], [0.3, 0.2, 0.1], [2, 0, 0], [0, 1.5, 0]], np.float32
        )
        inside = tetmesh.points_in_mesh(pts, v, f)
        assert list(inside) == [True, True, False, False]


class TestTetrahedralize:
    def test_sphere_numpy(self):
        v, f = icosphere(1.0)
        points, tets, surface = tetmesh._tetrahedralize_numpy(v, f, 6)
        assert points.shape[1] == 3 and tets.shape[1] == 4
        assert tets.shape[0] > 0 and surface.shape[0] > 0
        assert tets.max() < points.shape[0]
        # All tet centroids inside-ish the sphere.
        cent = points[tets].mean(axis=1)
        assert np.all(np.linalg.norm(cent, axis=1) < 1.3)
        # Surface faces wound outward: normal · (centroid - origin) > 0.
        a, b, c = points[surface[:, 0]], points[surface[:, 1]], points[surface[:, 2]]
        n = np.cross(b - a, c - a)
        fc = (a + b + c) / 3
        outward = np.sum(n * fc, axis=1)
        assert (outward > 0).mean() > 0.95
        # Total tet volume approximates the voxelized ball volume.
        e = points[tets[:, 1:]] - points[tets[:, 0]][:, None]
        vol = np.abs(np.linalg.det(e)).sum() / 6
        assert 2.0 < vol < 5.5  # sphere vol = 4.19

    def test_native_matches_numpy(self):
        native = native_load.try_load()
        assert native is not None, "native library not built (run native/build.sh)"
        v, f = icosphere(1.0)
        p_n, t_n, s_n = native.tetrahedralize(v, f, 6)
        p_py, t_py, s_py = tetmesh._tetrahedralize_numpy(v, f, 6)
        np.testing.assert_allclose(p_n, p_py, atol=1e-5)
        np.testing.assert_array_equal(t_n, t_py)
        np.testing.assert_array_equal(
            np.sort(np.sort(s_n, axis=1), axis=0),
            np.sort(np.sort(s_py, axis=1), axis=0),
        )

    def test_add_tri_mesh_volume_end_to_end(self):
        import jax
        from pies_tpu import Solver
        from pies_tpu.options import SolverName, SolverOptions

        v, f = icosphere(1.0)
        s = Solver(SolverOptions(solver=SolverName.PD), enable_collisions=False)
        s.add_tri_mesh_volume(
            v + np.array([0, 3.0, 0], np.float32),
            f,
            density=1.0,
            strain_stiffness=500.0,
            volume_stiffness=500.0,
        )
        for _ in range(80):
            s.tick()
        assert not s.sim_failed
        p = s.get_vertices()["position"]
        assert np.all(np.isfinite(p))
        assert p[:, 1].mean() < 3.0  # fell under gravity
        assert p[:, 1].min() > -1.5  # caught by floor contacts


class TestSurfaceSnap:
    def _sphere(self, n=12):
        # icosphere-ish: lat-long sphere
        import math
        verts, faces = [], []
        for i in range(n + 1):
            th = math.pi * i / n
            for j in range(2 * n):
                ph = math.pi * j / n
                verts.append([
                    math.sin(th) * math.cos(ph),
                    math.cos(th),
                    math.sin(th) * math.sin(ph),
                ])
        for i in range(n):
            for j in range(2 * n):
                a = i * 2 * n + j
                b = i * 2 * n + (j + 1) % (2 * n)
                c = (i + 1) * 2 * n + j
                d = (i + 1) * 2 * n + (j + 1) % (2 * n)
                faces += [[a, b, c], [b, d, c]]
        return (
            np.asarray(verts, np.float32),
            np.asarray(faces, np.int32),
        )

    def test_snap_improves_conformity_without_inversions(self):
        v, f = self._sphere()
        p_raw, tets, surf = tetmesh.tetrahedralize(v, f, 8, snap_surface=False)
        p_snap, tets2, surf2 = tetmesh.tetrahedralize(v, f, 8, snap_surface=True)
        np.testing.assert_array_equal(tets, tets2)

        err_raw = tetmesh.surface_error(p_raw, surf, v, f)
        err_snap = tetmesh.surface_error(p_snap, surf, v, f)
        # Conformity improves substantially (inversion guard backs off
        # roughly half the displacement on the worst slivers).
        assert err_snap["hausdorff"] < 0.55 * err_raw["hausdorff"]
        assert err_snap["mean"] < 0.45 * err_raw["mean"]

        # No tet collapses or inverts (orientation-normalized).
        vol = tetmesh._tet_volumes(p_snap, tets)
        vol0 = tetmesh._tet_volumes(p_raw, tets)
        sign = np.where(vol0 < 0, -1.0, 1.0)
        assert np.all(vol * sign > 0.05 * np.abs(vol0))

        # Enclosed volume approaches the analytic sphere volume (4/3 pi).
        def enclosed(points, tets_):
            return float(np.abs(tetmesh._tet_volumes(points, tets_)).sum())

        true_vol = 4.0 / 3.0 * np.pi
        assert abs(enclosed(p_snap, tets) - true_vol) < abs(
            enclosed(p_raw, tets) - true_vol
        )


class TestMeshQuality:
    def _sphere(self, n=12):
        return TestSurfaceSnap._sphere(TestSurfaceSnap(), n)

    def test_quality_bounds_after_snap(self):
        # The guarded snap must keep element quality bounded: tetgen's q
        # contract is radius-edge <= 1.5 on arbitrary geometry
        # (PrimitiveUtilities.cpp:229); the lattice mesher's contract is
        # exact lattice quality inside + volume-floored degradation at the
        # boundary (snap_boundary_to_surface docstring documents the gap).
        v, f = self._sphere(12)
        p, tets, surf = tetmesh.tetrahedralize(v, f, resolution=8)
        q = tetmesh.tet_quality(p, tets)
        assert q["num_tets"] > 100
        # Unsnapped lattice tets score radius-edge ~0.72; the 0.3 volume
        # floor keeps the worst boundary element within a small multiple.
        assert q["radius_edge_max"] < 3.0, q
        assert q["dihedral_min_deg"] > 8.0, q
        assert q["volume_min_ratio"] > 0.25, q

    def test_volume_floor_respected(self):
        v, f = self._sphere(10)
        p_raw, tets, surf = tetmesh.tetrahedralize(
            v, f, resolution=7, snap_surface=False
        )
        p_snap = tetmesh.snap_boundary_to_surface(
            p_raw, tets, surf, v, f, min_volume_ratio=0.3
        )
        vol0 = np.abs(tetmesh._tet_volumes(p_raw, tets))
        vol1 = np.abs(tetmesh._tet_volumes(p_snap, tets))
        # Every tet keeps >= ~30% of its lattice volume (full-revert
        # fallback restores 100%, so the bound is one-sided).
        assert np.all(vol1 >= 0.299 * vol0), float((vol1 / vol0).min())


class TestTargetTets:
    """Element-budget control (tetrahedralize(target_tets=...)): the analog
    of tetgen's max-volume switch the reference sizes imports with
    (PrimitiveUtilities.cpp:212-241)."""

    def test_enclosed_volume_cube(self):
        # Unit-ish cube: analytic volume 8.
        v = np.array(
            [[0, 0, 0], [2, 0, 0], [2, 2, 0], [0, 2, 0],
             [0, 0, 2], [2, 0, 2], [2, 2, 2], [0, 2, 2]], np.float32
        )
        f = np.array(
            [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5],
             [0, 5, 4], [1, 2, 6], [1, 6, 5], [2, 3, 7], [2, 7, 6],
             [3, 0, 4], [3, 4, 7]], np.int32,
        )
        assert abs(tetmesh.enclosed_volume(v, f) - 8.0) < 1e-5

    def test_budget_tracks_target(self):
        v, f = icosphere(1.0)
        for target in (300, 1500, 6000):
            _, tets, _ = tetmesh.tetrahedralize(v, f, target_tets=target)
            # Lattice stuffing can't hit the budget exactly (boundary cells
            # straddle the surface); 2x either way is the loose contract.
            assert target / 2 <= tets.shape[0] <= target * 2, (
                target, tets.shape[0],
            )

    def test_budget_monotone(self):
        v, f = icosphere(1.0)
        counts = [
            tetmesh.tetrahedralize(v, f, target_tets=t)[1].shape[0]
            for t in (300, 1500, 6000)
        ]
        assert counts[0] < counts[1] < counts[2]
