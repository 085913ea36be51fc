"""BSDF and Kulla-Conty tests.

The white-furnace tests validate numerically what the reference only
eyeballed (README "Energy Preservation"; SURVEY.md §4): under a constant
unit-radiance sky every energy-preserving BSDF must return ~1.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gpu_raytracer_tpu.assets import geometry  # noqa: E402
from gpu_raytracer_tpu.config import CPUConfig, GPUConfig  # noqa: E402
from gpu_raytracer_tpu.core import transform as xf  # noqa: E402
from gpu_raytracer_tpu.integrators.pathtracer import render_wave  # noqa: E402
from gpu_raytracer_tpu.ops import kulla_conty as kc  # noqa: E402
from gpu_raytracer_tpu.ops import microfacet as mf  # noqa: E402
from gpu_raytracer_tpu.ops.buffers import build_scene_buffers  # noqa: E402
from gpu_raytracer_tpu.scene import Scene  # noqa: E402
from gpu_raytracer_tpu.scene.sky import Sky  # noqa: E402
from gpu_raytracer_tpu.scene.types import Material, MaterialType  # noqa: E402

LUT_SAMPLES = 512  # test-speed bake; production default is 16384


class TestMicrofacet:
    def test_fresnel_dielectric_range_and_tir(self):
        cos = jnp.linspace(0.01, 1.0, 64)
        f = mf.fresnel_dielectric(cos, jnp.float32(1.0 / 1.5))
        assert np.all((np.asarray(f) >= 0) & (np.asarray(f) <= 1))
        # TIR: leaving dense medium at grazing angle
        f_tir = mf.fresnel_dielectric(jnp.array([0.1]), jnp.float32(1.5))
        assert np.asarray(f_tir)[0] == 1.0

    def test_fresnel_conductor_at_normal(self):
        # eta=0, k=1 is the reference's "none" = perfect mirror material.
        f = mf.fresnel_conductor(jnp.array([1.0]), jnp.zeros((1, 3)), jnp.ones((1, 3)))
        np.testing.assert_allclose(np.asarray(f), 1.0, atol=1e-5)

    def test_ggx_d_normalization(self):
        """int D(m) cos(m) dm = 1 over the hemisphere (MC, uniform sphere)."""
        rng = np.random.default_rng(0)
        n = 200_000
        z = rng.uniform(0, 1, n)
        phi = rng.uniform(0, 2 * np.pi, n)
        s = np.sqrt(1 - z * z)
        m = jnp.asarray(np.stack([s * np.cos(phi), s * np.sin(phi), z], -1), jnp.float32)
        for alpha in (0.1, 0.3, 0.7):
            d = np.asarray(mf.ggx_D(m, alpha, alpha))
            integral = (d * z).mean() * 2 * np.pi  # hemisphere area pdf = 1/(2pi)
            assert integral == pytest.approx(1.0, rel=0.05), alpha

    def test_vndf_sample_valid_hemisphere(self):
        rng = np.random.default_rng(1)
        n = 4096
        omega_i = jnp.asarray(np.tile([0.6, 0.0, 0.8], (n, 1)), jnp.float32)
        u1 = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
        u2 = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
        m = np.asarray(mf.sample_vndf_ggx(omega_i, 0.25, 0.25, u1, u2))
        assert np.all(m[:, 2] >= 0)
        np.testing.assert_allclose(np.linalg.norm(m, axis=-1), 1.0, atol=1e-5)

    def test_reflect_refract_conventions(self):
        omega_i = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        m = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        r = np.asarray(mf.reflect_direction(omega_i, m))
        np.testing.assert_allclose(r, [[0, 0, 1]], atol=1e-6)
        t = np.asarray(mf.refract_direction(omega_i, m, jnp.float32(1.0 / 1.5)))
        np.testing.assert_allclose(t, [[0, 0, -1]], atol=1e-6)


class TestKullaConty:
    @pytest.fixture(scope="class")
    def luts(self):
        return kc.bake_luts(LUT_SAMPLES)

    def test_tables_monotone_sane(self, luts):
        con = np.asarray(luts["conductor_dir"])
        assert con.shape == (32, 32)
        assert np.all((con >= 0) & (con <= 1))
        # Smooth surfaces lose almost no energy: E ~ 1 at low roughness.
        assert con[0].min() > 0.95
        # Rough surfaces lose a lot of single-scatter energy away from
        # grazing (E -> G2/G1 -> 1 only as mu -> 0); verified against an
        # independent uniform-hemisphere brute-force integral.
        assert con[-1, -1] < 0.5  # roughness ~1, normal incidence
        assert con[-1, 0] > con[-1, -1]  # grazing recovers energy

    def test_dielectric_tables(self, luts):
        die = np.asarray(luts["dielectric_dir_enter"])
        assert die.shape == (16, 16, 16)
        assert np.all((die >= 0) & (die <= 1.001))
        assert die[:, 0, :].min() > 0.9  # smooth: energy preserved

    def test_lookup_interpolation(self, luts):
        rough = jnp.asarray([0.5, 0.5], jnp.float32)
        cos = jnp.asarray([0.5, 0.9], jnp.float32)
        e = np.asarray(kc.conductor_directional_albedo(luts, rough, cos))
        assert np.all((e > 0) & (e <= 1))
        avg = np.asarray(kc.conductor_albedo(luts, rough))
        assert np.all((avg > 0.5) & (avg <= 1))


def _furnace_scene(material: Material):
    """A big rect of `material` filling the view under a unit-radiance sky."""
    scene = Scene()
    rect = geometry.rectangle(np.vstack([xf.scale(200.0), [0, 0, 0, 1]]).astype(np.float32))
    mesh = scene.add_mesh_data(rect, "rect")
    mat = scene.add_material(material)
    scene.add_instance("rect", mesh, mat)
    scene.update()
    scene.sky = Sky.constant([1.0, 1.0, 1.0], 4, 8)
    scene.finalize()
    scene.check_materials()
    W = 8
    scene.camera.position = np.array([0, 0, 5], np.float32)
    scene.camera.resize(W, W)
    scene.camera.update(0.0)
    return scene, W


def _furnace_mean(material: Material, num_bounces=24, samples=96) -> np.ndarray:
    scene, W = _furnace_scene(material)
    bufs = build_scene_buffers(scene, lut_samples=LUT_SAMPLES)
    config = GPUConfig(num_bounces=num_bounces, enable_russian_roulette=False,
                       enable_nee=False)
    camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
    idx = jnp.arange(W * W, dtype=jnp.int32)
    acc = np.zeros((W * W, 3), np.float64)
    for s in range(samples):
        acc += np.asarray(render_wave(bufs, camera, idx, s, config, W, 0, False))
    return (acc / samples).mean(axis=0)


class TestFurnaceBSDFs:
    def test_conductor_white_furnace(self):
        # eta=0, k=1: Fresnel == 1 (the reference's "material none" mirror).
        # With Kulla-Conty compensation a rough mirror must preserve energy.
        mean = _furnace_mean(Material(
            name="mirror", type=MaterialType.CONDUCTOR,
            eta=np.zeros(3, np.float32), k=np.ones(3, np.float32),
            linear_roughness=0.8))
        np.testing.assert_allclose(mean, 1.0, rtol=0.06)

    def test_plastic_furnace_bounded(self):
        mean = _furnace_mean(Material(
            name="plastic", type=MaterialType.PLASTIC,
            diffuse=np.ones(3, np.float32) * 0.9, linear_roughness=0.4))
        # Energy-conserving coupled diffuse+specular: close to but <= 1.
        assert np.all(mean < 1.05)
        assert np.all(mean > 0.7)

    def test_dielectric_furnace(self):
        """A CLOSED glass object under a unit sky: the eta^2 radiance
        compression on entry cancels on exit, so every path carries ~1.
        (A one-sided sheet would read (1-F)*ior^2 + F — not a furnace.)"""
        scene = Scene()
        sphere = geometry.sphere(np.eye(4, dtype=np.float32), num_subdivisions=3)
        mesh = scene.add_mesh_data(sphere, "sphere")
        mat = scene.add_material(Material(
            name="glass", type=MaterialType.DIELECTRIC,
            index_of_refraction=1.5, linear_roughness=0.4))
        scene.add_instance("sphere", mesh, mat)
        scene.update()
        scene.sky = Sky.constant([1.0, 1.0, 1.0], 4, 8)
        scene.finalize()
        scene.check_materials()
        W = 8
        scene.camera.position = np.array([0, 0, 2.5], np.float32)
        scene.camera.resize(W, W)
        scene.camera.update(0.0)
        bufs = build_scene_buffers(scene, lut_samples=LUT_SAMPLES)
        config = GPUConfig(num_bounces=48, enable_russian_roulette=False,
                           enable_nee=False)
        camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
        idx = jnp.arange(W * W, dtype=jnp.int32)
        acc = np.zeros((W * W, 3), np.float64)
        samples = 64
        for s in range(samples):
            acc += np.asarray(render_wave(bufs, camera, idx, s, config, W, 0, False))
        mean = (acc / samples).mean(axis=0)
        np.testing.assert_allclose(mean, 1.0, rtol=0.12)

    def test_diffuse_furnace_exact(self):
        albedo = 0.6
        mean = _furnace_mean(Material(
            name="d", type=MaterialType.DIFFUSE,
            diffuse=np.full(3, albedo, np.float32)), num_bounces=4, samples=64)
        np.testing.assert_allclose(mean, albedo, rtol=0.05)
