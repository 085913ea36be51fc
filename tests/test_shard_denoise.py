"""Sharded trace+SVGF+TAA frame vs the single-device path (SURVEY §5.8)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gpu_raytracer_tpu.config import CPUConfig, GPUConfig  # noqa: E402
from gpu_raytracer_tpu.ops import svgf as svgf_ops  # noqa: E402
from gpu_raytracer_tpu.ops.buffers import build_scene_buffers  # noqa: E402
from gpu_raytracer_tpu.parallel.denoise import shard_denoised_step  # noqa: E402
from gpu_raytracer_tpu.parallel.mesh import make_mesh, place_replicated  # noqa: E402
from gpu_raytracer_tpu.scene import Scene  # noqa: E402

CORNELL = "/root/reference/Data/cornellbox/scene.xml"
W = H = 16  # small: the two pjit compiles dominate this test's runtime


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_denoised_matches_single():
    scene = Scene.from_config(CPUConfig(scene_filenames=[CORNELL]))
    scene.film_width, scene.film_height = W, H
    scene.camera.resize(W, H)
    bufs = build_scene_buffers(scene)
    camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
    config = GPUConfig(num_bounces=1, enable_svgf=True, enable_taa=True)
    vp = jnp.asarray(scene.camera.view_projection)
    idx = jnp.arange(W * H, dtype=jnp.int32)

    mesh = make_mesh(jax.devices()[:8])
    step = shard_denoised_step(mesh, config, W, H, has_lights=scene.has_lights)

    history = svgf_ops.init_history(H, W)
    taa_prev = jnp.zeros((H, W, 3), jnp.float32)
    bufs_r = place_replicated(mesh, bufs)
    cam_r = place_replicated(mesh, camera)

    # Two frames so reprojection/history feedback is exercised.
    c1, h1, t1 = step(bufs_r, cam_r, idx, 0, history, vp, taa_prev, True)
    c2, h2, t2 = step(bufs_r, cam_r, idx, 1, h1, vp, t1, False)
    jax.block_until_ready(c2)

    # Single-device reference: same computation, no shardings bound.
    from gpu_raytracer_tpu.integrators.pathtracer import render_wave
    from gpu_raytracer_tpu.ops import taa as taa_ops

    def single(sample_index, history, taa_prev, is_first):
        aovs = render_wave(bufs, camera, idx, sample_index, config, W, 0,
                           scene.has_lights, with_aovs=True)
        frame = {k: aovs[k].reshape((H, W) + aovs[k].shape[1:]) for k in
                 ("direct", "indirect", "albedo", "normal", "depth",
                  "instance", "position_prev")}
        colour, new_hist = svgf_ops.svgf_step(frame, history, vp, config)
        taa_in = taa_ops.to_taa_space(jnp.maximum(colour, 0.0))
        prev = taa_in if is_first else taa_prev
        screen_prev = svgf_ops.project_to_screen(frame["position_prev"], vp, W, H)
        taa_out = taa_ops.taa_step(taa_in, prev, screen_prev)
        return taa_ops.from_taa_space(taa_out), new_hist, taa_out

    s1, sh1, st1 = single(0, svgf_ops.init_history(H, W),
                          jnp.zeros((H, W, 3), jnp.float32), True)
    s2, sh2, st2 = single(1, sh1, st1, False)

    np.testing.assert_allclose(np.asarray(c2), np.asarray(s2),
                               rtol=1e-4, atol=1e-5)
    assert np.isfinite(np.asarray(c2)).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_wide_path_matches_single():
    """The sharded step must exercise the PRODUCTION traversal pipeline
    (wide/gang Pallas kernels, run per-shard via shard_map), not the XLA
    fallback — interpret mode stands in for Mosaic on the CPU backend."""
    from gpu_raytracer_tpu.integrators.pathtracer import render_wave
    from gpu_raytracer_tpu.ops import pallas_gang as pg
    from gpu_raytracer_tpu.ops import pallas_wide as pwd
    from gpu_raytracer_tpu.parallel.mesh import shard_render_wave

    scene = Scene.from_config(CPUConfig(scene_filenames=[CORNELL]))
    scene.film_width, scene.film_height = W, H
    scene.camera.resize(W, H)
    bufs = build_scene_buffers(scene)
    assert bufs.get("wide") is not None
    camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
    config = GPUConfig(num_bounces=2)
    idx = jnp.arange(W * H, dtype=jnp.int32)
    mat_types = tuple(sorted({int(m.type) for m in scene.materials}))

    old_w, old_g = pwd.FORCE_INTERPRET, pg.FORCE_INTERPRET
    pwd.FORCE_INTERPRET = pg.FORCE_INTERPRET = True
    try:
        mesh = make_mesh(jax.devices()[:8])
        step = shard_render_wave(mesh, config, W, has_lights=scene.has_lights,
                                 use_wide=True, mat_types=mat_types)
        sharded = step(place_replicated(mesh, bufs),
                       place_replicated(mesh, camera), idx, 0)
        single = render_wave(bufs, camera, idx, 0, config, W, 0,
                             scene.has_lights, use_wide=True,
                             mat_types=mat_types)
        np.testing.assert_array_equal(np.asarray(sharded), np.asarray(single))
        assert np.isfinite(np.asarray(sharded)).all()
    finally:
        pwd.FORCE_INTERPRET, pg.FORCE_INTERPRET = old_w, old_g
