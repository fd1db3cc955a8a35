"""Tests for aonerf.viz.mesh — marching-tetrahedra isosurface extraction.

The checks are structural, not golden-file: watertightness (every directed
edge used exactly once, so winding is globally consistent), Euler
characteristic 2 for a sphere, outward normals, and exact vertex placement
for a linear field (linear interpolation is exact there)."""

import numpy as np

from aonerf.viz import mesh as vm


def _grid_from(fn, R=32, lo=-1.5, hi=1.5):
    c = lo + (hi - lo) * (np.arange(R) + 0.5) / R
    x, y, z = np.meshgrid(c, c, c, indexing="ij")
    return fn(x, y, z)


class TestMarchingTetrahedra:
    def _sphere(self, R=32, r0=0.8):
        grid = _grid_from(lambda x, y, z: r0 - np.sqrt(x * x + y * y + z * z), R)
        return vm.marching_tetrahedra(grid, 0.0)

    def test_sphere_vertices_on_surface(self):
        verts, faces = self._sphere()
        assert len(faces) > 100
        radii = np.linalg.norm(verts, axis=-1)
        np.testing.assert_allclose(radii, 0.8, atol=0.02)
        assert faces.min() == 0 and faces.max() == len(verts) - 1

    def test_sphere_watertight_consistent_winding(self):
        _, faces = self._sphere()
        directed = set()
        for a, b, c in faces:
            for e in ((a, b), (b, c), (c, a)):
                assert e not in directed, "directed edge reused: bad winding"
                directed.add(e)
        # closed surface: every directed edge has its reverse
        assert all((b, a) in directed for (a, b) in directed)

    def test_sphere_euler_characteristic(self):
        verts, faces = self._sphere()
        n_edges = 3 * len(faces) // 2  # each undirected edge shared by 2 faces
        assert len(verts) - n_edges + len(faces) == 2  # genus-0 surface

    def test_sphere_normals_point_outward(self):
        verts, faces = self._sphere()
        p = verts[faces]
        n = np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
        centroid = p.mean(axis=1)
        dots = np.einsum("ij,ij->i", n, centroid)
        assert (dots > 0).all()

    def test_linear_field_exact_plane(self):
        # v = x, level 0: interpolation is exact for a linear field
        grid = _grid_from(lambda x, y, z: x, R=16)
        verts, faces = vm.marching_tetrahedra(grid, 0.0)
        assert len(faces) > 0
        np.testing.assert_allclose(verts[:, 0], 0.0, atol=1e-12)

    def test_empty_and_full_grids(self):
        for fill in (0.0, 5.0):  # all-outside and all-inside
            verts, faces = vm.marching_tetrahedra(np.full((8, 8, 8), fill), 1.0)
            assert len(verts) == 0 and len(faces) == 0

    def test_welding_no_duplicate_vertices(self):
        verts, _ = self._sphere(R=16)
        uniq = np.unique(verts.round(decimals=9), axis=0)
        assert len(uniq) == len(verts)


class TestExtractAndExport:
    def test_extract_mesh_from_density_fn(self, tmp_path):
        import jax.numpy as jnp

        def fn(points):  # same analytic sphere through the jitted grid path
            return 30.0 * (0.8 - jnp.linalg.norm(points, axis=-1))

        verts, faces = vm.extract_mesh(fn, level=0.0, resolution=24)
        np.testing.assert_allclose(np.linalg.norm(verts, axis=-1), 0.8, atol=0.03)

        path = vm.write_mesh_ply(str(tmp_path / "m.ply"), verts, faces)
        lines = open(path).read().splitlines()
        n_v = int([l for l in lines if l.startswith("element vertex")][0].split()[-1])
        n_f = int([l for l in lines if l.startswith("element face")][0].split()[-1])
        assert (n_v, n_f) == (len(verts), len(faces))
        # last face line indexes valid vertices
        a = [int(v) for v in lines[-1].split()]
        assert a[0] == 3 and max(a[1:]) < len(verts)
