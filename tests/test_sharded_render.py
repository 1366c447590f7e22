"""Sharded full-image render matches the single-device render."""
import jax
import jax.numpy as jnp
import numpy as np

from neurecon_tpu.models.frameworks.neus import make_volume_render_fn
from neurecon_tpu.parallel import make_mesh
from neurecon_tpu.parallel.sharding import make_sharded_render


def test_sharded_render_matches_single():
    from tests.test_neus import tiny_model
    model = tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    render = make_volume_render_fn(model, N_samples=16, N_importance=16,
                                   perturb=False, detailed_output=False,
                                   calc_normal=True)
    N = 64  # divisible by 8 devices
    rays_o = jnp.broadcast_to(jnp.array([0.0, 0.0, -3.0]), (N, 3))
    th = jnp.linspace(-0.3, 0.3, N)
    rays_d = jnp.stack([jnp.sin(th), jnp.zeros(N), jnp.cos(th)], -1)
    key = jax.random.PRNGKey(1)

    rgb_s, depth_s, extras_s = render(params, rays_o, rays_d, key)

    mesh = make_mesh(8)
    sharded = make_sharded_render(render, mesh)
    rgb_m, depth_m, extras_m = sharded(params, rays_o, rays_d, key)
    assert len(rgb_m.sharding.device_set) == 8

    np.testing.assert_allclose(np.asarray(rgb_m), np.asarray(rgb_s),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth_m), np.asarray(depth_s),
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(extras_m["normals_volume"]),
                               np.asarray(extras_s["normals_volume"]),
                               rtol=2e-3, atol=1e-4)


def test_microchunk_composes_with_mesh():
    """render_full_image(mesh=..., microchunk=...) — the multi-chip eval
    memory-control path — must equal both the sharded-only and the
    unsharded render (VERDICT r2 item 6: the microchunk-vs-mesh warning)."""
    from tests.test_neus import tiny_model
    from neurecon_tpu.training import render_full_image

    model = tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    render = make_volume_render_fn(model, N_samples=16, N_importance=16,
                                   perturb=False, detailed_output=False,
                                   calc_normal=True)
    N = 200  # not a multiple of the chunking: exercises padding too
    rng = np.random.RandomState(7)
    rays_o = jnp.broadcast_to(jnp.array([0.0, 0.0, -3.0]), (N, 3))
    th = jnp.linspace(-0.3, 0.3, N)
    rays_d = jnp.stack([jnp.sin(th), jnp.zeros(N), jnp.cos(th)], -1)
    key = jax.random.PRNGKey(1)

    mesh = make_mesh(8)
    plain = render_full_image(render, params, rays_o, rays_d, key,
                              rayschunk=64)
    sharded = render_full_image(render, params, rays_o, rays_d, key,
                                rayschunk=64, mesh=mesh)
    micro = render_full_image(render, params, rays_o, rays_d, key,
                              rayschunk=64, mesh=mesh, microchunk=16)
    unroll = render_full_image(render, params, rays_o, rays_d, key,
                               rayschunk=64, mesh=mesh, microchunk=16,
                               microchunk_unroll=True)
    for k in plain:
        np.testing.assert_allclose(sharded[k], plain[k], rtol=2e-3, atol=1e-4,
                                   err_msg=f"sharded != plain on {k}")
        np.testing.assert_allclose(micro[k], plain[k], rtol=2e-3, atol=1e-4,
                                   err_msg=f"sharded+microchunk != plain on {k}")
        np.testing.assert_allclose(unroll[k], plain[k], rtol=2e-3, atol=1e-4,
                                   err_msg=f"sharded+unroll != plain on {k}")


class TestMicrochunk:
    def test_microchunk_equals_plain(self):
        """lax.map micro-batching inside a dispatch must be bitwise-neutral."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from neurecon_tpu.training import render_full_image

        def render_fn(p, o, d, k, **kw):
            rgb = jnp.tanh(jnp.stack([o[:, 0] * d[:, 1], d[:, 0], o[:, 2]], -1))
            return rgb, jnp.linalg.norm(o, axis=-1), {"normals_volume": d * 2}

        rng = np.random.RandomState(3)
        o = rng.randn(300, 3).astype(np.float32)
        d = rng.randn(300, 3).astype(np.float32)
        a = render_full_image(render_fn, {}, o, d, jax.random.PRNGKey(0),
                              rayschunk=128)
        b = render_full_image(render_fn, {}, o, d, jax.random.PRNGKey(0),
                              rayschunk=128, microchunk=32)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])

    def test_sequential_renderers_do_not_alias(self):
        """Two renderers created one after another (the second possibly
        reusing the first's recycled id()) must each get their own compiled
        program: the cache keys on weakref tokens, and a dead renderer's
        entries are evicted rather than left to alias a newcomer."""
        import gc

        import jax
        import jax.numpy as jnp
        import numpy as np
        from neurecon_tpu import training

        o = np.ones((64, 3), np.float32)
        d = np.ones((64, 3), np.float32)

        def run(scale):
            def render_fn(p, o, d, k, **kw):
                return o * scale, jnp.zeros(o.shape[0]), {}

            out = training.render_full_image(
                render_fn, {}, o, d, jax.random.PRNGKey(0), rayschunk=64)
            tok = training._render_cache_token(render_fn)
            assert any(tok == k[0] for k in training._RENDER_JIT_CACHE), \
                "cache key must be the weakref token of the live renderer"
            return out["rgb"][0, 0]

        n0 = len(training._RENDER_JIT_CACHE)
        assert run(2.0) == 2.0
        gc.collect()  # first renderer is now dead -> its entry must evict
        assert run(5.0) == 5.0
        gc.collect()
        assert len(training._RENDER_JIT_CACHE) <= n0 + 1, \
            "dead renderers' cache entries must be evicted, not accumulate"

    def test_microchunk_unroll_equals_map(self):
        """The straight-line (Python-unrolled) micro-block path — the TPU
        workaround for the lax.map miscompile (docs/methods.md) — must be
        bit-identical to the lax.map path, including per-block key fold_in
        (fold_in(k, int) == fold_in(k, traced int))."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from neurecon_tpu.training import render_full_image

        def render_fn(p, o, d, k, **kw):
            r = jax.random.uniform(k, (o.shape[0],))
            rgb = jnp.tanh(jnp.stack([o[:, 0] * d[:, 1], d[:, 0], o[:, 2]], -1))
            return rgb, r, {"normals_volume": d * 2}

        rng = np.random.RandomState(5)
        o = rng.randn(256, 3).astype(np.float32)
        d = rng.randn(256, 3).astype(np.float32)
        key = jax.random.PRNGKey(0)
        a = render_full_image(render_fn, {}, o, d, key,
                              rayschunk=128, microchunk=32)
        b = render_full_image(render_fn, {}, o, d, key,
                              rayschunk=128, microchunk=32,
                              microchunk_unroll=True)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])

    def test_microchunk_lax_map_warns_on_tpu(self, monkeypatch):
        """On a non-CPU backend the lax.map micro-block path must warn once
        (the TPU miscompile, docs/methods.md); the unrolled path and the CPU
        backend must not."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        import neurecon_tpu.training as training

        def render_fn(p, o, d, k, **kw):
            return o * 2, jnp.zeros(o.shape[0]), {}

        o = np.zeros((64, 3), np.float32)
        warnings = []
        monkeypatch.setattr(training.log, "warning",
                            lambda msg, *a: warnings.append(msg))

        def run(**kw):
            render_full_image = training.render_full_image
            render_full_image(render_fn, {}, o, o, jax.random.PRNGKey(0),
                              rayschunk=32, **kw)

        run(microchunk=8)                          # cpu backend: silent
        assert not warnings
        monkeypatch.setattr(training.jax, "default_backend", lambda: "tpu")
        run(microchunk=16)                         # fresh cache key: warns
        assert len(warnings) == 1 and "lax.map" in warnings[0]
        run(microchunk=16)                         # cache hit: no re-warn
        assert len(warnings) == 1
        run(microchunk=4, microchunk_unroll=True)  # unroll: silent
        assert len(warnings) == 1

    def test_microchunk_must_divide(self):
        import jax
        import numpy as np
        import pytest
        from neurecon_tpu.training import render_full_image
        with pytest.raises(ValueError):
            render_full_image(lambda p, o, d, k: None, {},
                              np.zeros((8, 3)), np.zeros((8, 3)),
                              jax.random.PRNGKey(0), rayschunk=128,
                              microchunk=48)

    def test_microchunk_blocks_get_distinct_keys(self):
        """A stochastic render_fn must not repeat jitter across lax.map
        blocks (each block's key is fold_in(key, block_index))."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from neurecon_tpu.training import render_full_image

        def render_fn(p, o, d, k, **kw):
            r = jax.random.uniform(k, (o.shape[0],))
            return jnp.zeros((o.shape[0], 3)), r, {}

        o = np.zeros((128, 3), np.float32)
        d = np.ones((128, 3), np.float32)
        out = render_full_image(render_fn, {}, o, d, jax.random.PRNGKey(0),
                                rayschunk=128, microchunk=32)
        dep = out["depth_volume"].reshape(4, 32)
        assert not np.allclose(dep[0], dep[1])
        # degenerate microchunk values normalize instead of crashing
        render_full_image(render_fn, {}, o, d, jax.random.PRNGKey(0),
                          rayschunk=128, microchunk=-1)
        render_full_image(render_fn, {}, o, d, jax.random.PRNGKey(0),
                          rayschunk=128, microchunk=256)


class TestCullMiss:
    """Host-side bounding-sphere culling (render_full_image cull_sphere_r):
    hit rays must match the uncalled full render; miss rays get miss_rgb
    exactly, and the full render's own miss-ray rgb must be within the
    documented sigmoid-tail residual of that value."""

    def _setup(self):
        from tests.test_neus import tiny_model
        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0))
        render = make_volume_render_fn(model, N_samples=16, N_importance=16,
                                       perturb=False, detailed_output=False,
                                       calc_normal=True)
        N = 96
        rays_o = jnp.broadcast_to(jnp.array([0.0, 0.0, -3.0]), (N, 3))
        th = jnp.linspace(-0.8, 0.8, N)  # |th| > ~0.34 misses the r=1 sphere
        rays_d = jnp.stack([jnp.sin(th), jnp.zeros(N), jnp.cos(th)], -1)
        return model, params, render, rays_o, rays_d

    def test_culled_matches_full(self):
        from neurecon_tpu.training import render_full_image
        model, params, render, rays_o, rays_d = self._setup()
        key = jax.random.PRNGKey(1)
        full = render_full_image(render, params, rays_o, rays_d, key,
                                 rayschunk=32)
        culled = render_full_image(render, params, rays_o, rays_d, key,
                                   rayschunk=32, cull_sphere_r=1.0,
                                   miss_rgb=0.0)
        o = np.asarray(rays_o, np.float64)
        dn = np.asarray(rays_d, np.float64)
        dn /= np.linalg.norm(dn, axis=-1, keepdims=True)
        t_mid = -np.sum(o * dn, -1)
        hit = np.linalg.norm(o + t_mid[:, None] * dn, axis=-1) <= 1.0
        assert 10 < hit.sum() < len(hit) - 10, "need both hits and misses"
        np.testing.assert_allclose(culled["rgb"][hit], full["rgb"][hit],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(culled["rgb"][~hit], 0.0)
        # the residual the shortcut drops really is tiny
        assert np.abs(full["rgb"][~hit]).max() < 5e-3
        np.testing.assert_allclose(culled["normals_volume"][hit],
                                   full["normals_volume"][hit],
                                   rtol=1e-4, atol=1e-5)

    def test_no_hits_and_all_hits_paths(self):
        from neurecon_tpu.training import render_full_image
        model, params, render, rays_o, rays_d = self._setup()
        key = jax.random.PRNGKey(1)
        # all rays miss a tiny sphere: structure comes from the probe ray
        culled = render_full_image(render, params, rays_o, rays_d, key,
                                   rayschunk=32, cull_sphere_r=1e-4,
                                   miss_rgb=0.25)
        assert culled["rgb"].shape == (96, 3)
        np.testing.assert_array_equal(culled["rgb"], 0.25)
        # all rays hit a huge sphere: falls through to the plain path
        full = render_full_image(render, params, rays_o, rays_d, key,
                                 rayschunk=32)
        culled_all = render_full_image(render, params, rays_o, rays_d, key,
                                       rayschunk=32, cull_sphere_r=50.0)
        np.testing.assert_allclose(culled_all["rgb"], full["rgb"],
                                   rtol=1e-6, atol=1e-7)
