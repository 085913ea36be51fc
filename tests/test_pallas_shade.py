"""Fused diffuse shade megakernel vs. the XLA bounce body (interpret mode;
hardware parity is checked on TPU by the perf logs — max|diff| 1e-4 at b6)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gpu_raytracer_tpu.config import CPUConfig, GPUConfig
from gpu_raytracer_tpu.ops import pallas_shade as psh
from gpu_raytracer_tpu.ops import pallas_traverse as ptv
from gpu_raytracer_tpu.integrators.pathtracer import render_wave
from gpu_raytracer_tpu.ops.buffers import build_scene_buffers
from gpu_raytracer_tpu.scene import Scene

CORNELL = "/root/reference/Data/cornellbox/scene.xml"


@pytest.fixture(autouse=True)
def _interpret():
    old_t, old_s = ptv.FORCE_INTERPRET, psh.FORCE_INTERPRET
    ptv.FORCE_INTERPRET = psh.FORCE_INTERPRET = True
    yield
    ptv.FORCE_INTERPRET, psh.FORCE_INTERPRET = old_t, old_s


def test_matches_xla_bounce_body():
    W = H = 32
    scene = Scene.from_config(CPUConfig(scene_filenames=[CORNELL]))
    scene.film_width, scene.film_height = W, H
    scene.camera.resize(W, H)
    buffers = build_scene_buffers(scene)
    assert buffers["pallas_shade"] is not None
    camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
    pix = jnp.arange(W * H, dtype=jnp.int32)
    config = GPUConfig(num_bounces=3)
    a, ra = render_wave(buffers, camera, pix, 2, config, W, 0, True, True)
    b, rb = render_wave(buffers, camera, pix, 2, config, W, 0, True, True,
                        use_pallas=True, use_pallas_shade=True)
    # Identical control flow (same RR kills, same shadow rays)...
    assert float(ra) == float(rb)
    # ...and float-precision-identical radiance.
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def test_gate_scope():
    # All material types run fused now; textures/media/env skies do not.
    assert psh.supports_shade(
        np.array([0, 1, 2, 3, 4]), 100, 2, 1, False, False, (1, 1))
    assert not psh.supports_shade(
        np.array([0, 1]), 100, 2, 1, True, False, (1, 1))
    assert not psh.supports_shade(
        np.array([0, 1]), 100, 2, 1, False, True, (1, 1))
    assert not psh.supports_shade(
        np.array([0, 1]), 100, 2, 1, False, False, (64, 128))
    assert psh.supports_shade(
        np.array([0, 1]), 100, 2, 1, False, False, (1, 1))


def _mixed_scene(W):
    """Plastic + rough dielectric + rough conductor spheres and a diffuse
    floor under an area light + constant sky: every fused BSDF lobe."""
    from gpu_raytracer_tpu.assets import geometry
    from gpu_raytracer_tpu.scene.sky import Sky
    from gpu_raytracer_tpu.scene.types import Material, MaterialType

    scene = Scene()
    sphere = geometry.sphere(np.eye(4, dtype=np.float32), num_subdivisions=2)
    mesh = scene.add_mesh_data(sphere, "sphere")
    floor = scene.add_mesh_data(
        geometry.rectangle(np.vstack([
            [6.0, 0, 0, 0], [0, 0, -6.0, -1.0], [0, 6.0, 0, 0],
            [0, 0, 0, 1]]).astype(np.float32)), "floor")
    panel = scene.add_mesh_data(
        geometry.rectangle(np.vstack([
            [1.5, 0, 0, 0], [0, 0, 1.5, 3.0], [0, 1.5, 0, 0],
            [0, 0, 0, 1]]).astype(np.float32)), "panel")

    glass = scene.add_material(Material(
        name="glass", type=MaterialType.DIELECTRIC,
        index_of_refraction=1.5, linear_roughness=0.35))
    gold = scene.add_material(Material(
        name="gold", type=MaterialType.CONDUCTOR,
        eta=np.array([0.13, 0.45, 1.43], np.float32),
        k=np.array([3.98, 2.38, 1.60], np.float32),
        linear_roughness=0.4))
    shell = scene.add_material(Material(
        name="shell", type=MaterialType.PLASTIC,
        diffuse=np.array([0.7, 0.2, 0.2], np.float32),
        linear_roughness=0.25))
    gray = scene.add_material(Material(name="gray"))
    lamp = scene.add_material(Material(
        name="lamp", type=MaterialType.LIGHT,
        emission=np.array([8.0, 7.0, 6.0], np.float32)))

    for name, mesh_id, mat, x in (("glass", mesh, glass, -2.2),
                                  ("gold", mesh, gold, 0.0),
                                  ("shell", mesh, shell, 2.2)):
        inst = scene.add_instance(name, mesh_id, mat)
        inst.position = np.array([x, 0.0, 0.0], np.float32)
    scene.add_instance("floor", floor, gray)
    scene.add_instance("lamp", panel, lamp)
    scene.update()
    scene.sky = Sky.constant([0.25, 0.3, 0.35], 1, 1)
    scene.finalize()
    scene.check_materials()
    scene.camera.position = np.array([0.0, 0.8, 6.0], np.float32)
    scene.film_width = scene.film_height = W
    scene.camera.resize(W, W)
    scene.camera.update(0.0)
    return scene


def test_full_bsdf_matches_xla_bounce_body():
    """Fused full-BSDF dispatch vs the XLA body on a mixed-material scene.
    The fused path evaluates per-material Kulla-Conty POLYNOMIAL curves
    (kulla_conty.bake_material_curves, fit error ~1e-2) instead of the
    XLA path's trilinear LUT taps, and E-threshold lobe picks can flip for
    borderline lanes — so parity is statistical, not per-pixel."""
    W = 32
    scene = _mixed_scene(W)
    buffers = build_scene_buffers(scene)
    assert buffers["pallas_shade"] is not None
    camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
    pix = jnp.arange(W * W, dtype=jnp.int32)
    config = GPUConfig(num_bounces=4)
    acc_a = np.zeros((W * W, 3), np.float32)
    acc_b = np.zeros((W * W, 3), np.float32)
    for s in range(4):
        a, _ = render_wave(buffers, camera, pix, s, config, W, 0, True, True)
        b, _ = render_wave(buffers, camera, pix, s, config, W, 0, True, True,
                           use_pallas=True, use_pallas_shade=True)
        acc_a += np.asarray(a)
        acc_b += np.asarray(b)
    acc_a /= 4
    acc_b /= 4
    # Means agree to ~1% and the bulk of pixels agree closely.
    np.testing.assert_allclose(acc_b.mean(axis=0), acc_a.mean(axis=0),
                               rtol=0.02)
    d = np.abs(acc_a - acc_b).max(axis=1)
    assert float(np.quantile(d, 0.90)) < 0.02, float(np.quantile(d, 0.90))
