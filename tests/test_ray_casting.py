"""Ray-casting tests against an exact analytic sphere SDF."""
import jax
import jax.numpy as jnp
import numpy as np

from neurecon_tpu.models.ray_casting import (
    make_surface_render_fn,
    root_finding_surface_points,
    sphere_tracing_surface_points,
)

RADIUS = 1.0


def sphere_sdf(pts):
    return jnp.linalg.norm(pts, axis=-1) - RADIUS


def make_rays():
    """4 rays from (0,0,-4): two hits (axis + slightly off), two misses."""
    rays_o = jnp.broadcast_to(jnp.array([0.0, 0.0, -4.0]), (4, 3))
    dirs = jnp.array([
        [0.0, 0.0, 1.0],       # center hit at depth 3
        [0.05, 0.0, 1.0],      # near-center hit
        [1.0, 0.0, 1.0],       # miss
        [0.0, 1.0, 0.0],       # perpendicular miss
    ])
    rays_d = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return rays_o, rays_d


class TestRootFinding:
    def test_hits_and_misses(self):
        rays_o, rays_d = make_rays()
        d, pt, mask, mask_sc = root_finding_surface_points(
            sphere_sdf, rays_o, rays_d, near=0.0, far=8.0, N_steps=128,
            fill_inf=False)
        m = np.asarray(mask)
        assert m.tolist() == [True, True, False, False]
        assert abs(float(d[0]) - 3.0) < 1e-3
        # hit point on the sphere
        assert abs(float(jnp.linalg.norm(pt[1])) - RADIUS) < 1e-3
        # misses fall back to far
        assert float(d[2]) == 8.0 and float(d[3]) == 8.0

    def test_occupied_at_start_gives_zero(self):
        rays_o = jnp.zeros((1, 3))  # inside the sphere
        rays_d = jnp.array([[0.0, 0.0, 1.0]])
        d, pt, mask, _ = root_finding_surface_points(
            sphere_sdf, rays_o, rays_d, near=0.0, far=8.0, N_steps=64)
        assert float(d[0]) == 0.0 and not bool(mask[0])

    def test_logit_tau_shifts_levelset(self):
        # level set sdf == 0.5 -> sphere of radius 1.5 -> hit at depth 2.5
        rays_o, rays_d = make_rays()
        d, *_ = root_finding_surface_points(
            sphere_sdf, rays_o[:1], rays_d[:1], near=0.0, far=8.0,
            N_steps=128, logit_tau=0.5, fill_inf=False)
        assert abs(float(d[0]) - 2.5) < 1e-3


class TestSphereTracing:
    def test_converges_on_hits(self):
        rays_o, rays_d = make_rays()
        d, pts, mask = sphere_tracing_surface_points(
            sphere_sdf, rays_o, rays_d, near=0.0, far=8.0, N_iters=30)
        assert abs(float(d[0]) - 3.0) < 1e-4
        assert abs(float(jnp.linalg.norm(pts[1])) - RADIUS) < 1e-3
        # misses march past far and get masked out
        assert not bool(mask[2]) and not bool(mask[3])
        assert bool(mask[0]) and bool(mask[1])


class TestSurfaceRender:
    def test_neus_surface_render_at_init(self):
        """A freshly-initialized NeuS SDF is a sphere (r=0.5): surface render
        from z=-3 must return depth ≈ 2.5 on the central ray."""
        from tests.test_neus import tiny_model
        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0))
        for algo, cfg in (("sphere_tracing", {"near": 0.0, "far": 6.0, "N_iters": 25}),
                          ("root_finding", {"near": 0.0, "far": 6.0, "N_steps": 128})):
            render = make_surface_render_fn(model, ray_casting_algo=algo,
                                            ray_casting_cfgs=cfg)
            rays_o = jnp.broadcast_to(jnp.array([0.0, 0.0, -3.0]), (2, 3))
            rays_d = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.05]])
            rgb, depth, extras = jax.jit(render)(params, rays_o, rays_d)
            assert abs(float(depth[0]) - 2.5) < 0.1, (algo, float(depth[0]))
            assert bool(extras["mask_surface"][0])
            assert not bool(extras["mask_surface"][1])
            # miss pixels are black
            np.testing.assert_allclose(np.asarray(rgb[1]), 0.0)
            # normals on the hit are ~unit and point back at the camera
            n = np.asarray(extras["normals_surface"][0])
            assert abs(np.linalg.norm(n) - 1.0) < 1e-3
            assert n[2] < -0.9
