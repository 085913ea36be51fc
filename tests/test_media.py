"""Participating media tests: Beer-Lambert absorption through a glass body,
scattering medium energy behavior, HG sampler distribution."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gpu_raytracer_tpu.assets import geometry  # noqa: E402
from gpu_raytracer_tpu.config import GPUConfig  # noqa: E402
from gpu_raytracer_tpu.integrators.pathtracer import render_wave  # noqa: E402
from gpu_raytracer_tpu.ops.buffers import build_scene_buffers  # noqa: E402
from gpu_raytracer_tpu.ops.sampling import sample_henyey_greenstein  # noqa: E402
from gpu_raytracer_tpu.scene import Scene  # noqa: E402
from gpu_raytracer_tpu.scene.sky import Sky  # noqa: E402
from gpu_raytracer_tpu.scene.types import Material, MaterialType, Medium  # noqa: E402

LUT_SAMPLES = 512


class TestHGSampler:
    def test_unit_directions_and_anisotropy(self):
        rng = np.random.default_rng(0)
        n = 8192
        omega = jnp.asarray(np.tile([0.0, 0.0, 1.0], (n, 1)), jnp.float32)
        u1 = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
        u2 = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
        for g, sign in [(0.7, -1.0), (-0.7, 1.0)]:
            d = np.asarray(sample_henyey_greenstein(omega, jnp.float32(g), u1, u2))
            np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
            # PBRT convention: omega = -ray_direction, so g>0 (forward
            # scattering) concentrates AWAY from omega (mean cos < 0).
            mean_cos = (d[:, 2]).mean()
            assert np.sign(mean_cos) == sign, (g, mean_cos)
        # isotropic: mean cos ~ 0
        d = np.asarray(sample_henyey_greenstein(omega, jnp.float32(0.0), u1, u2))
        assert abs(d[:, 2].mean()) < 0.05


def _glass_ball_scene(medium: Medium):
    scene = Scene()
    sphere = geometry.sphere(np.eye(4, dtype=np.float32), num_subdivisions=2)
    mesh = scene.add_mesh_data(sphere, "sphere")
    medium_id = scene.add_medium(medium)
    mat = scene.add_material(Material(
        name="glass", type=MaterialType.DIELECTRIC, index_of_refraction=1.5,
        linear_roughness=0.1, medium_id=medium_id))
    scene.add_instance("ball", mesh, mat)
    scene.update()
    scene.sky = Sky.constant([1.0, 1.0, 1.0], 2, 2)
    scene.finalize()
    scene.check_materials()
    W = 8
    scene.camera.position = np.array([0, 0, 2.2], np.float32)
    scene.camera.resize(W, W)
    scene.camera.update(0.0)
    return scene, W


def _render_mean(scene, W, samples=32, bounces=24):
    bufs = build_scene_buffers(scene, lut_samples=LUT_SAMPLES)
    config = GPUConfig(num_bounces=bounces, enable_russian_roulette=False,
                       enable_nee=False)
    cam = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
    idx = jnp.arange(W * W, dtype=jnp.int32)
    acc = np.zeros((W * W, 3), np.float64)
    for s in range(samples):
        acc += np.asarray(render_wave(bufs, cam, idx, s, config, W, 0, False,
                                      has_media=True))
    return (acc / samples).mean(axis=0)


class TestMedia:
    def test_absorbing_medium_attenuates(self):
        # Strongly absorbing red-tinted medium: transmitted light keeps more
        # red than blue; total below the clear-glass furnace value.
        medium = Medium.from_sigmas("ink", sigma_a=[0.5, 2.0, 6.0],
                                    sigma_s=[0.0, 0.0, 0.0])
        scene, W = _glass_ball_scene(medium)
        mean = _render_mean(scene, W)
        assert np.isfinite(mean).all()
        assert mean[0] > mean[2]  # red survives more than blue
        assert mean[2] < 0.9      # blue got absorbed

    def test_scattering_medium_conserves_energy(self):
        # Pure scattering (albedo 1) inside glass under a white furnace sky:
        # no energy is destroyed, only redirected -> mean stays near 1.
        medium = Medium.from_sigmas("milk", sigma_a=[0.0, 0.0, 0.0],
                                    sigma_s=[3.0, 3.0, 3.0], g=0.3)
        scene, W = _glass_ball_scene(medium)
        mean = _render_mean(scene, W, samples=48, bounces=48)
        np.testing.assert_allclose(mean, 1.0, rtol=0.15)

    def test_no_medium_matches_plain_glass(self):
        # A medium with zero extinction must not change the render.
        clear = Medium.from_sigmas("clear", sigma_a=[0, 0, 0], sigma_s=[0, 0, 0])
        scene, W = _glass_ball_scene(clear)
        mean = _render_mean(scene, W, samples=24)
        np.testing.assert_allclose(mean, 1.0, rtol=0.12)
