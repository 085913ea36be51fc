"""Renderer correctness tests (CPU backend, tiny resolutions).

Includes the furnace-style analytic check the reference only eyeballed
(SURVEY.md §4), JAX-vs-oracle traversal agreement, determinism, and the
sharded multi-chip step on the 8-device virtual mesh.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gpu_raytracer_tpu.assets import geometry  # noqa: E402
from gpu_raytracer_tpu.config import CPUConfig, GPUConfig  # noqa: E402
from gpu_raytracer_tpu.integrators.pathtracer import render_wave  # noqa: E402
from gpu_raytracer_tpu.ops.buffers import build_scene_buffers  # noqa: E402
from gpu_raytracer_tpu.ops.traverse import trace_any_tlas, trace_closest_tlas  # noqa: E402
from gpu_raytracer_tpu.scene import Scene  # noqa: E402
from gpu_raytracer_tpu.scene.types import Material, MaterialType  # noqa: E402
from gpu_raytracer_tpu.core import transform as xf  # noqa: E402


def _camera_dict(scene):
    return {k: jnp.asarray(v) for k, v in scene.camera.params().items()}


def _affine4(m3x4):
    return np.vstack([m3x4, [0, 0, 0, 1]]).astype(np.float32)


@pytest.fixture(scope="module")
def cornell(reference_data):
    import os

    scene = Scene.from_config(CPUConfig(
        scene_filenames=[os.path.join(reference_data, "cornellbox", "scene.xml")]))
    scene.film_width = scene.film_height = 32
    scene.camera.resize(32, 32)
    return scene, build_scene_buffers(scene)


class TestTraversalJAX:
    def test_matches_numpy_oracle(self, cornell):
        scene, bufs = cornell
        from gpu_raytracer_tpu.bvh.cpu_trace import intersect_tris_brute

        p0 = np.asarray(bufs["tris"]["p0"])
        e1 = np.asarray(bufs["tris"]["e1"])
        e2 = np.asarray(bufs["tris"]["e2"])
        rng = np.random.default_rng(0)
        R = 64
        o = rng.uniform(-0.9, 0.9, (R, 3)).astype(np.float32)
        o[:, 1] = rng.uniform(0.1, 1.9, R)
        d = rng.standard_normal((R, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        hit = trace_closest_tlas(bufs["nodes"], bufs["tris"], bufs["instances"],
                                 jnp.asarray(o), jnp.asarray(d), jnp.full(R, jnp.inf))
        t = np.asarray(hit.t)
        tri = np.asarray(hit.tri)
        inst = np.asarray(hit.inst)
        for i in range(R):
            t_ref, tri_ref, _, _ = intersect_tris_brute(o[i], d[i], p0, e1, e2)
            if tri_ref < 0:
                assert tri[i] == -1
            else:
                assert t[i] == pytest.approx(t_ref, rel=1e-4), i
                assert tri[i] == tri_ref, i
                assert inst[i] >= 0

    def test_any_hit_consistent_with_closest(self, cornell):
        scene, bufs = cornell
        rng = np.random.default_rng(1)
        R = 64
        o = rng.uniform(-0.9, 0.9, (R, 3)).astype(np.float32)
        o[:, 1] = rng.uniform(0.1, 1.9, R)
        d = rng.standard_normal((R, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        t_max = jnp.full(R, 1.5)
        hit = trace_closest_tlas(bufs["nodes"], bufs["tris"], bufs["instances"],
                                 jnp.asarray(o), jnp.asarray(d), t_max)
        occ = trace_any_tlas(bufs["nodes"], bufs["tris"], bufs["instances"],
                             jnp.asarray(o), jnp.asarray(d), t_max)
        closest_hit = np.asarray(hit.tri) >= 0
        np.testing.assert_array_equal(np.asarray(occ), closest_hit)

    def test_dead_rays_do_no_work(self, cornell):
        scene, bufs = cornell
        o = jnp.zeros((8, 3), jnp.float32)
        d = jnp.tile(jnp.array([[0.0, 1.0, 0.0]], jnp.float32), (8, 1))
        hit = trace_closest_tlas(bufs["nodes"], bufs["tris"], bufs["instances"],
                                 o, d, jnp.zeros(8))
        assert np.all(np.asarray(hit.tri) == -1)


class TestFurnace:
    def test_diffuse_reflectance_under_constant_sky(self):
        """Camera looks at a large diffuse rectangle lit by a constant sky:
        the radiance through any surface pixel must equal albedo * sky
        exactly in expectation (one-bounce escape, convex geometry)."""
        albedo = np.array([0.7, 0.5, 0.3], np.float32)
        sky_l = 2.0

        scene = Scene()
        rect = geometry.rectangle(_affine4(
            xf.compose(xf.translate([0, 0, 0]), xf.scale(50.0))))
        mesh = scene.add_mesh_data(rect, "rect")
        mat = scene.add_material(Material(name="m", diffuse=albedo))
        scene.add_instance("rect", mesh, mat)
        scene.update()
        from gpu_raytracer_tpu.scene.sky import Sky

        scene.sky = Sky.constant([sky_l] * 3, 4, 8)
        scene.finalize()

        W = 16
        scene.camera.position = np.array([0, 0, 5], np.float32)
        scene.camera.resize(W, W)
        scene.camera.update(0.0)

        bufs = build_scene_buffers(scene)
        config = GPUConfig(num_bounces=4, enable_russian_roulette=False,
                           enable_nee=False)
        idx = jnp.arange(W * W, dtype=jnp.int32)
        acc = np.zeros((W * W, 3), np.float64)
        n_samples = 32
        for s in range(n_samples):
            out = render_wave(bufs, _camera_dict(scene), idx, s, config, W, 0, False)
            acc += np.asarray(out)
        acc /= n_samples
        expected = albedo * sky_l
        # Every pixel sees the rectangle; single bounce then sky escape.
        np.testing.assert_allclose(acc.mean(axis=0), expected, rtol=0.05)

    def test_emissive_seen_directly(self):
        """Camera looking straight at an area light reads its radiance."""
        scene = Scene()
        rect = geometry.rectangle(_affine4(xf.scale(5.0)))
        mesh = scene.add_mesh_data(rect, "light")
        emission = np.array([3.0, 4.0, 5.0], np.float32)
        mat = scene.add_material(Material(name="L", type=MaterialType.LIGHT,
                                          emission=emission))
        scene.add_instance("light", mesh, mat)
        scene.update()
        scene.finalize()
        scene.check_materials()

        W = 8
        scene.camera.position = np.array([0, 0, 3], np.float32)
        scene.camera.resize(W, W)
        scene.camera.update(0.0)

        bufs = build_scene_buffers(scene)
        config = GPUConfig(num_bounces=2)
        idx = jnp.arange(W * W, dtype=jnp.int32)
        out = np.asarray(render_wave(bufs, _camera_dict(scene), idx, 0, config, W, 0, True))
        np.testing.assert_allclose(out, np.tile(emission, (W * W, 1)), rtol=1e-5)


class TestCornellRender:
    def test_deterministic(self, cornell):
        scene, bufs = cornell
        config = GPUConfig(num_bounces=3)
        idx = jnp.arange(32 * 32, dtype=jnp.int32)
        a = np.asarray(render_wave(bufs, _camera_dict(scene), idx, 0, config, 32, 0, True))
        b = np.asarray(render_wave(bufs, _camera_dict(scene), idx, 0, config, 32, 0, True))
        np.testing.assert_array_equal(a, b)

    def test_samples_decorrelated(self, cornell):
        scene, bufs = cornell
        config = GPUConfig(num_bounces=3)
        idx = jnp.arange(32 * 32, dtype=jnp.int32)
        a = np.asarray(render_wave(bufs, _camera_dict(scene), idx, 0, config, 32, 0, True))
        b = np.asarray(render_wave(bufs, _camera_dict(scene), idx, 1, config, 32, 0, True))
        assert not np.array_equal(a, b)

    def test_finite_and_lit(self, cornell):
        scene, bufs = cornell
        config = GPUConfig(num_bounces=4)
        idx = jnp.arange(32 * 32, dtype=jnp.int32)
        acc = np.zeros((32 * 32, 3), np.float64)
        for s in range(4):
            acc += np.asarray(render_wave(bufs, _camera_dict(scene), idx, s, config, 32, 0, True))
        acc /= 4
        assert np.isfinite(acc).all()
        assert acc.mean() > 0.02  # the box is lit
        # No magenta poisoning (NaN marker)
        magenta = (np.abs(acc - [1, 0, 1]) < 1e-6).all(axis=-1)
        assert not magenta.any()

    def test_nee_unbiased(self, cornell):
        """NEE+MIS on and off must converge to the same mean image."""
        scene, bufs = cornell
        idx = jnp.arange(32 * 32, dtype=jnp.int32)
        cam = _camera_dict(scene)

        def mean_render(config, n):
            acc = np.zeros((32 * 32, 3), np.float64)
            for s in range(n):
                acc += np.asarray(render_wave(bufs, cam, idx, s, config, 32, 0, True))
            return acc / n

        on = mean_render(GPUConfig(num_bounces=4, enable_nee=True,
                                   enable_russian_roulette=False), 48)
        off = mean_render(GPUConfig(num_bounces=4, enable_nee=False,
                                    enable_russian_roulette=False), 48)
        # Brightness must agree within Monte-Carlo noise of the brute path.
        assert on.mean() == pytest.approx(off.mean(), rel=0.15)


class TestMultichip:
    def test_dryrun_8_devices(self):
        import __graft_entry__ as entrypoints

        entrypoints.dryrun_multichip(8)

    def test_sharded_matches_single(self, cornell):
        scene, bufs = cornell
        from gpu_raytracer_tpu.parallel.mesh import (
            make_mesh, place_replicated, place_sharded, shard_render_wave)

        config = GPUConfig(num_bounces=3)
        mesh = make_mesh(jax.devices()[:8])
        idx = jnp.arange(32 * 32, dtype=jnp.int32)

        single = np.asarray(render_wave(bufs, _camera_dict(scene), idx, 0, config, 32, 0, True))

        step = shard_render_wave(mesh, config, 32, 0, True)
        sharded = np.asarray(step(place_replicated(mesh, bufs),
                                  place_replicated(mesh, _camera_dict(scene)),
                                  place_sharded(mesh, idx), 0))
        np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_tile_order_render_matches_linear(cornell):
    """Ray submission order must not change any pixel's radiance."""
    from gpu_raytracer_tpu.ops.camera_rays import tile_order

    scene, bufs = cornell
    W = scene.film_width
    cfg = GPUConfig(num_bounces=2)
    cam = _camera_dict(scene)
    lin = jnp.arange(W * W, dtype=jnp.int32)
    til = jnp.asarray(tile_order(W, W, tile=8))
    a = np.asarray(render_wave(bufs, cam, lin, 3, cfg, W, 0, scene.has_lights))
    b = np.asarray(render_wave(bufs, cam, til, 3, cfg, W, 0, scene.has_lights))
    img_a = np.zeros_like(a)
    img_b = np.zeros_like(b)
    img_a[np.asarray(lin)] = a
    img_b[np.asarray(til)] = b
    np.testing.assert_array_equal(img_a, img_b)
