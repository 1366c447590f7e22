"""Mesh extraction tests: marching tetrahedra on analytic SDFs."""
import os

import numpy as np

from neurecon_tpu.utils.mesh import (
    extract_mesh,
    marching_tetrahedra,
    read_ply,
    write_ply,
)


def sphere_grid(N, R=0.6, extent=1.0):
    ax = np.linspace(-extent, extent, N)
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    return np.sqrt(x ** 2 + y ** 2 + z ** 2) - R, ax


class TestMarchingTetrahedra:
    def test_sphere_vertices_on_levelset(self):
        N, R = 48, 0.6
        values, ax = sphere_grid(N, R)
        verts, faces = marching_tetrahedra(values, level=0.0)
        assert len(verts) > 500 and len(faces) > 500
        # to world coords
        world = verts * (2.0 / (N - 1)) - 1.0
        radii = np.linalg.norm(world, axis=-1)
        assert abs(radii.mean() - R) < 0.01
        assert radii.std() < 0.01
        # faces index valid vertices
        assert faces.min() >= 0 and faces.max() < len(verts)

    def test_normals_point_outward(self):
        N, R = 32, 0.6
        values, ax = sphere_grid(N, R)
        verts, faces = marching_tetrahedra(values, level=0.0)
        world = verts * (2.0 / (N - 1)) - 1.0
        a, b, c = world[faces[:, 0]], world[faces[:, 1]], world[faces[:, 2]]
        n = np.cross(b - a, c - a)
        centroid = (a + b + c) / 3
        outward_frac = np.mean((n * centroid).sum(-1) > 0)
        assert outward_frac > 0.99, outward_frac

    def test_watertight_surface_area(self):
        """Total triangle area ≈ sphere area 4πR²."""
        N, R = 64, 0.6
        values, ax = sphere_grid(N, R)
        verts, faces = marching_tetrahedra(values, level=0.0)
        world = verts * (2.0 / (N - 1)) - 1.0
        a, b, c = world[faces[:, 0]], world[faces[:, 1]], world[faces[:, 2]]
        area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1).sum()
        gt = 4 * np.pi * R ** 2
        assert abs(area - gt) / gt < 0.02, (area, gt)

    def test_empty_when_no_crossing(self):
        values = np.ones((8, 8, 8))
        verts, faces = marching_tetrahedra(values, level=0.0)
        assert len(verts) == 0 and len(faces) == 0

    def test_nonzero_level(self):
        N = 32
        values, ax = sphere_grid(N, R=0.4)
        # level 0.2 -> sphere of radius 0.6
        verts, faces = marching_tetrahedra(values, level=0.2)
        world = verts * (2.0 / (N - 1)) - 1.0
        assert abs(np.linalg.norm(world, axis=-1).mean() - 0.6) < 0.02


class TestPly:
    def test_write_read_roundtrip(self, tmp_path):
        verts = np.random.RandomState(0).rand(17, 3).astype(np.float32)
        faces = np.random.RandomState(1).randint(0, 17, (9, 3)).astype(np.int32)
        p = str(tmp_path / "m.ply")
        write_ply(p, verts, faces)
        v2, f2 = read_ply(p)
        np.testing.assert_allclose(v2, verts, rtol=1e-6)
        np.testing.assert_array_equal(f2, faces)


class TestExtractMesh:
    def test_extract_from_implicit_surface(self, tmp_path):
        """Device-queried grid of a freshly-initialized ImplicitSurface (a
        sphere of radius 0.5) must produce a sphere-like mesh."""
        import jax
        from neurecon_tpu.models.base import ImplicitSurface
        surf = ImplicitSurface(W=64, D=4, skips=[2], W_geo_feat=32,
                               embed_multires=4, radius_init=0.5)
        params = surf.init(jax.random.PRNGKey(0))
        p = str(tmp_path / "s.ply")
        info = extract_mesh(lambda x: surf.forward(params, x),
                            volume_size=2.0, N=48, filepath=p, chunk=16384)
        assert info["n_faces"] > 200
        verts, faces = read_ply(p)
        radii = np.linalg.norm(verts, axis=-1)
        assert abs(np.median(radii) - 0.5) < 0.1, np.median(radii)
