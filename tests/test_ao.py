"""AO integrator (reference: Src/Renderer/Integrators/AO.cpp + AO.cu):
cosine-hemisphere visibility within ao_radius."""

import numpy as np
import jax.numpy as jnp

from gpu_raytracer_tpu.assets import geometry
from gpu_raytracer_tpu.config import GPUConfig
from gpu_raytracer_tpu.core import transform as xf
from gpu_raytracer_tpu.integrators.ao import render_wave_ao
from gpu_raytracer_tpu.ops.buffers import build_scene_buffers
from gpu_raytracer_tpu.scene import Scene
from gpu_raytracer_tpu.scene.types import Material


def _affine4(m3x4):
    out = np.eye(4, dtype=np.float32)
    out[:3] = m3x4
    return out


def _scene_plane_with_cube():
    scene = Scene()
    plane = geometry.rectangle(_affine4(
        xf.compose(xf.translate([0, 0, 0]),
                   xf.compose(xf.axis_angle([1.0, 0.0, 0.0], -np.pi / 2),
                              xf.scale(20.0)))))
    cube = geometry.cube(_affine4(xf.translate([0, 1.0, 0])))
    mat = None
    m1 = scene.add_mesh_data(plane, "plane")
    m2 = scene.add_mesh_data(cube, "cube")
    mat = scene.add_material(Material(name="m", diffuse=np.array([0.5] * 3, np.float32)))
    scene.add_instance("plane", m1, mat)
    scene.add_instance("cube", m2, mat)
    scene.update()
    scene.finalize()
    return scene


def test_ao_occlusion_gradient():
    scene = _scene_plane_with_cube()
    W = 32
    scene.camera.position = np.array([0, 3, 10], np.float32)  # looks -z
    scene.camera.resize(W, W)
    scene.camera.update(0.0)
    bufs = build_scene_buffers(scene)
    camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
    idx = jnp.arange(W * W, dtype=jnp.int32)
    config = GPUConfig(ao_radius=3.0)
    acc = np.zeros((W * W, 3), np.float64)
    n = 24
    for s in range(n):
        acc += np.asarray(render_wave_ao(bufs, camera, idx, s, config, W, 0))
    acc /= n
    vis = acc[:, 0].reshape(W, W)
    assert np.isfinite(vis).all()
    assert vis.min() >= 0.0 and vis.max() <= 1.0
    # Some pixels fully visible, occluded pixels exist near the cube.
    assert vis.max() > 0.95
    assert vis.min() < 0.6


def test_ao_radius_monotonic():
    """Larger radius can only find MORE occluders -> lower mean visibility."""
    scene = _scene_plane_with_cube()
    W = 24
    scene.camera.position = np.array([0, 3, 10], np.float32)  # looks -z
    scene.camera.resize(W, W)
    scene.camera.update(0.0)
    bufs = build_scene_buffers(scene)
    camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
    idx = jnp.arange(W * W, dtype=jnp.int32)

    def mean_vis(radius):
        acc = 0.0
        for s in range(16):
            acc += float(np.asarray(render_wave_ao(
                bufs, camera, idx, s, GPUConfig(ao_radius=radius), W, 0)).mean())
        return acc / 16

    assert mean_vis(5.0) <= mean_vis(0.5) + 1e-6
