"""Golden-image regression: a tiny deterministic render compared against a
committed reference frame (the analog of the reference's screenshot-diff
workflow for Data/ scenes). Regenerate with REGEN_GOLDEN=1 after an
intentional change to light transport, then eyeball the delta."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from gpu_raytracer_tpu.config import CPUConfig, GPUConfig
from gpu_raytracer_tpu.integrators.pathtracer import render_wave
from gpu_raytracer_tpu.ops.buffers import build_scene_buffers
from gpu_raytracer_tpu.scene import Scene

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "cornell48.npz")
CORNELL = "/root/reference/Data/cornellbox/scene.xml"


def _render():
    W = H = 48
    scene = Scene.from_config(CPUConfig(scene_filenames=[CORNELL]))
    scene.film_width, scene.film_height = W, H
    scene.camera.resize(W, H)
    buffers = build_scene_buffers(scene)
    camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
    pix = jnp.arange(W * H, dtype=jnp.int32)
    config = GPUConfig(num_bounces=3)
    acc = np.zeros((W * H, 3), np.float32)
    for s in range(4):
        r, _ = render_wave(buffers, camera, pix, s, config, W, 0,
                           scene.has_lights, True)
        acc += np.asarray(r)
    return acc / 4.0


def test_cornell_golden():
    img = _render()
    if os.environ.get("REGEN_GOLDEN"):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez_compressed(GOLDEN, img=img)
        pytest.skip("golden regenerated")
    assert os.path.exists(GOLDEN), "golden missing — run with REGEN_GOLDEN=1"
    ref = np.load(GOLDEN)["img"]
    rmse = float(np.sqrt(np.mean((img - ref) ** 2)))
    # Identical sampler streams -> the render is deterministic; any drift
    # means light transport changed.
    assert rmse < 1e-5, f"golden mismatch: RMSE {rmse}"
    assert np.isfinite(img).all()
