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


def test_gate_rejects_non_diffuse_scene():
    # Sponza has textures + conductor materials -> no shade tables.
    assert not psh.supports_shade(
        np.array([0, 1, 4]), 100, 2, 1, False, False, (1, 1))
    assert not psh.supports_shade(
        np.array([0, 1]), 100, 2, 1, True, False, (1, 1))
    assert not psh.supports_shade(
        np.array([0, 1]), 100, 2, 1, False, False, (64, 128))
    assert psh.supports_shade(
        np.array([0, 1]), 100, 2, 1, False, False, (1, 1))
