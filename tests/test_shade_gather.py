"""Scene-scale gathered-input shade megakernel vs. the XLA bounce body
(interpret mode). Unlike the SMEM megakernel (test_pallas_shade.py) this
path has no texture/sky/scene-size gate, so parity is checked on textured
scenes too. Reference behavior: one device-side material stage for every
scene (/root/reference/Src/CUDA/Pathtracer.cu:465-773)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gpu_raytracer_tpu.config import CPUConfig, GPUConfig
from gpu_raytracer_tpu.ops import pallas_shade_gather as psg
from gpu_raytracer_tpu.integrators.pathtracer import render_wave
from gpu_raytracer_tpu.ops.buffers import build_scene_buffers
from gpu_raytracer_tpu.scene import Scene

CORNELL = "/root/reference/Data/cornellbox/scene.xml"


@pytest.fixture(autouse=True)
def _interpret():
    old = psg.FORCE_INTERPRET
    psg.FORCE_INTERPRET = True
    yield
    psg.FORCE_INTERPRET = old


def test_gate_scope():
    # The 5 core material types pass at any scene size, WITH media (the
    # HG continuation merges outside the kernel since round 4);
    # SMEM-overflowing material/light tables do not.
    assert psg.supports_gather_shade(np.array([0, 1, 2, 3, 4]), 5, 2, False)
    assert psg.supports_gather_shade(np.array([0, 1]), 2, 2, True)
    assert not psg.supports_gather_shade(np.array([0, 1]), 4000, 2, False)
    assert psg.supports_gather_shade(np.array([0, 1]), 500, 500, False)


def test_cornell_matches_xla_bounce_body():
    W = H = 32
    scene = Scene.from_config(CPUConfig(scene_filenames=[CORNELL]))
    scene.film_width, scene.film_height = W, H
    scene.camera.resize(W, H)
    buffers = build_scene_buffers(scene)
    assert buffers["shade_gather"] is not None
    camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
    pix = jnp.arange(W * H, dtype=jnp.int32)
    config = GPUConfig(num_bounces=4)
    a, ra = render_wave(buffers, camera, pix, 2, config, W, 0, True, True)
    b, rb = render_wave(buffers, camera, pix, 2, config, W, 0, True, True,
                        use_gather_shade=True)
    # Same control flow (same RR kills, same shadow rays) and
    # float-precision-identical radiance: the all-diffuse scene exercises
    # no Kulla-Conty curve, so the only divergence is op ordering.
    assert float(ra) == float(rb)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def test_mixed_bsdf_statistical_parity():
    """All 4 BSDFs through the gathered kernel vs the XLA body. The kernel
    evaluates per-material Kulla-Conty POLYNOMIAL curves (fit error ~1e-2)
    where the XLA path taps trilinear LUTs, so borderline lobe picks can
    flip — parity is statistical, as for the SMEM megakernel."""
    from tests.test_pallas_shade import _mixed_scene

    W = 32
    scene = _mixed_scene(W)
    buffers = build_scene_buffers(scene)
    assert buffers["shade_gather"] is not None
    camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
    pix = jnp.arange(W * W, dtype=jnp.int32)
    config = GPUConfig(num_bounces=4)
    acc_a = np.zeros((W * W, 3), np.float32)
    acc_b = np.zeros((W * W, 3), np.float32)
    for s in range(4):
        a, _ = render_wave(buffers, camera, pix, s, config, W, 0, True, True)
        b, _ = render_wave(buffers, camera, pix, s, config, W, 0, True, True,
                           use_gather_shade=True)
        acc_a += np.asarray(a)
        acc_b += np.asarray(b)
    acc_a /= 4
    acc_b /= 4
    np.testing.assert_allclose(acc_b.mean(axis=0), acc_a.mean(axis=0),
                               rtol=0.02)
    d = np.abs(acc_a - acc_b).max(axis=1)
    assert float(np.quantile(d, 0.90)) < 0.02, float(np.quantile(d, 0.90))


def test_media_scene_statistical_parity():
    """Mixed BSDFs + a homogeneous medium through the gathered kernel: the
    XLA pre-stage samples scatter distances, scattered lanes ride through
    the kernel dead and rejoin with their HG continuation via the kernel's
    is_transmission output (reference: media handled in the same
    wavefront, Pathtracer.cu:252-325). Statistical tolerance for the same
    Kulla-Conty polynomial-vs-LUT reason as the mixed-BSDF test."""
    from tests.test_pallas_shade import _mixed_scene

    from gpu_raytracer_tpu.scene.types import Medium

    W = 32
    scene = _mixed_scene(W)
    # Homogeneous absorbing+scattering medium inside the glass sphere
    # (same synthetic candles-class setup as bench.bench_mixed).
    scene.mediums.append(Medium.from_sigmas(
        "juice", [0.4, 0.1, 0.1], [0.2, 0.2, 0.2]))
    glass = next(m for m in scene.materials if m.name == "glass")
    glass.medium_id = 0
    scene.finalize()
    buffers = build_scene_buffers(scene)
    camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
    pix = jnp.arange(W * W, dtype=jnp.int32)
    config = GPUConfig(num_bounces=6)
    acc_a = np.zeros((W * W, 3), np.float32)
    acc_b = np.zeros((W * W, 3), np.float32)
    for s in range(4):
        a, _ = render_wave(buffers, camera, pix, s, config, W, 0, True,
                           True, has_media=True)
        b, _ = render_wave(buffers, camera, pix, s, config, W, 0, True,
                           True, has_media=True, use_gather_shade=True)
        acc_a += np.asarray(a)
        acc_b += np.asarray(b)
    acc_a /= 4
    acc_b /= 4
    np.testing.assert_allclose(acc_b.mean(axis=0), acc_a.mean(axis=0),
                               rtol=0.02)
    d = np.abs(acc_a - acc_b).max(axis=1)
    assert float(np.quantile(d, 0.90)) < 0.02, float(np.quantile(d, 0.90))


def test_textured_scene_matches_xla(tmp_path):
    """A textured diffuse floor: the gather branch's XLA pre-stage must
    reproduce the body's iso ray-cone texture taps exactly (diffuse-only,
    so no Kulla-Conty divergence; bounce 0 runs the shared XLA body in
    both configurations)."""
    from PIL import Image

    from gpu_raytracer_tpu.assets import geometry
    from gpu_raytracer_tpu.scene.sky import Sky
    from gpu_raytracer_tpu.scene.types import Material, MaterialType

    rng = np.random.default_rng(7)
    img = (rng.uniform(0.1, 1.0, (64, 64, 3)) * 255).astype(np.uint8)
    path = tmp_path / "checker.png"
    Image.fromarray(img).save(path)

    W = 32
    scene = Scene()
    floor = scene.add_mesh_data(
        geometry.rectangle(np.vstack([
            [6.0, 0, 0, 0], [0, 0, -6.0, -1.0], [0, 6.0, 0, 0],
            [0, 0, 0, 1]]).astype(np.float32)), "floor")
    panel = scene.add_mesh_data(
        geometry.rectangle(np.vstack([
            [1.5, 0, 0, 0], [0, 0, 1.5, 3.0], [0, 1.5, 0, 0],
            [0, 0, 0, 1]]).astype(np.float32)), "panel")
    tex = scene.add_texture(str(path))
    wood = scene.add_material(Material(name="wood", texture_id=tex))
    lamp = scene.add_material(Material(
        name="lamp", type=MaterialType.LIGHT,
        emission=np.array([8.0, 7.0, 6.0], np.float32)))
    scene.add_instance("floor", floor, wood)
    scene.add_instance("lamp", panel, lamp)
    scene.update()
    scene.sky = Sky.constant([0.2, 0.25, 0.3], 1, 1)
    scene.finalize()
    scene.check_materials()
    scene.camera.position = np.array([0.0, 0.8, 6.0], np.float32)
    scene.film_width = scene.film_height = W
    scene.camera.resize(W, W)
    scene.camera.update(0.0)

    buffers = build_scene_buffers(scene)
    assert buffers["shade_gather"] is not None
    camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
    pix = jnp.arange(W * W, dtype=jnp.int32)
    config = GPUConfig(num_bounces=4)
    a, _ = render_wave(buffers, camera, pix, 1, config, W, 0, True, True,
                       has_textures=True)
    b, _ = render_wave(buffers, camera, pix, 1, config, W, 0, True, True,
                       has_textures=True, use_gather_shade=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-3)
