"""Late-bounce wavefront compaction (round 5): the lax.cond compacted
bounce body must be pixel-exact against the full-width body — same
sampler draws (pixel ids travel with the lane), same per-lane math, just
executed at a narrower static width. Reference role: material-queue
compaction making late bounces near-free (Pathtracer.cu:426-462)."""
import numpy as np
import jax.numpy as jnp

from gpu_raytracer_tpu.config import CPUConfig, GPUConfig
from gpu_raytracer_tpu.integrators.pathtracer import render_wave
from gpu_raytracer_tpu.ops.buffers import build_scene_buffers
from gpu_raytracer_tpu.scene import Scene

SCENE = "/root/reference/Data/cornellbox/scene.xml"
W = 64


def _setup():
    scene = Scene.from_config(CPUConfig(scene_filenames=[SCENE]))
    scene.film_width = scene.film_height = W
    scene.camera.resize(W, W)
    scene.camera.update(0.0)
    buffers = build_scene_buffers(scene)
    camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
    return scene, buffers, camera


def _render(scene, buffers, camera, tiers, valid_mask=None, bounces=6):
    cfg = GPUConfig(num_bounces=bounces)
    idx = jnp.arange(W * W, dtype=jnp.int32)
    mat_types = tuple(sorted({int(m.type) for m in scene.materials}))
    return np.asarray(render_wave(
        buffers, camera, idx, 3, cfg, W, 0, scene.has_lights,
        has_textures=len(scene.textures) > 0, mat_types=mat_types,
        valid_mask=valid_mask, compact_tiers=tiers))


def test_compact_matches_full():
    scene, buffers, camera = _setup()
    full = _render(scene, buffers, camera, ())
    tiered = _render(scene, buffers, camera, (2, 4))
    # Same draws, same per-lane arithmetic; the two programs may fuse
    # fma/adds differently, so allow ULP-level drift (observed max 9e-10).
    np.testing.assert_allclose(full, tiered, rtol=0, atol=1e-6)
    assert np.isfinite(tiered).all() and tiered.mean() > 0.01


def test_compact_sparse_wave():
    """A wave with only a few live lanes must take the compact branch from
    bounce 1 onward (live << R/4) and still match the full body exactly —
    including lanes killed by the valid mask staying black."""
    scene, buffers, camera = _setup()
    mask = np.zeros(W * W, bool)
    mask[:: 7] = True  # ~585 of 4096 lanes
    mask = jnp.asarray(mask)
    full = _render(scene, buffers, camera, (), valid_mask=mask)
    tiered = _render(scene, buffers, camera, (4,), valid_mask=mask)
    np.testing.assert_allclose(full, tiered, rtol=0, atol=1e-6)
    assert float(np.abs(full[~np.asarray(mask)]).max()) == 0.0


def test_compact_tiny_r_guard():
    """Tiers whose compact width would round below 1024 lanes are skipped
    (the cond would cost more than it saves); the render still works."""
    scene, buffers, camera = _setup()
    out = _render(scene, buffers, camera, (64, 4096), bounces=3)
    ref = _render(scene, buffers, camera, (), bounces=3)
    np.testing.assert_allclose(ref, out, rtol=0, atol=1e-6)
