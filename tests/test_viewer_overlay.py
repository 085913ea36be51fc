"""Pixel-query overlay (reference: Main.cpp:665-760 GL debug lines): the
query must return world-space debug geometry consistent with the render
(the queried triangle reprojects over the queried pixel), and the overlay
must draw visible wireframes into the frame without touching the input."""
import numpy as np

from gpu_raytracer_tpu.config import CPUConfig, GPUConfig
from gpu_raytracer_tpu.integrators.pathtracer import Pathtracer
from gpu_raytracer_tpu.scene import Scene
from gpu_raytracer_tpu.utils.viewer import (
    _project,
    draw_query_overlay,
    query_pixel,
)

SCENE = "/root/reference/Data/cornellbox/scene.xml"
W = 64


def _integrator():
    cpu = CPUConfig(scene_filenames=[SCENE], initial_width=W,
                    initial_height=W)
    scene = Scene.from_config(cpu)
    scene.film_width = scene.film_height = W
    scene.camera.resize(W, W)
    scene.camera.update(0.0)
    integ = Pathtracer(scene, cpu, GPUConfig(num_bounces=2))
    integ.init_device()
    return integ


def test_query_geometry_reprojects_onto_pixel():
    integ = _integrator()
    qx, qy = W // 2, W // 2
    info = query_pixel(integ, qx, qy)
    assert info is not None and info["t"] > 0.0
    # The hit point must project back onto the queried pixel center.
    xy, ok = _project(integ.scene.camera, info["hit_p"][None])
    assert ok.all()
    assert abs(xy[0, 0] - (qx + 0.5)) < 1.0
    assert abs(xy[0, 1] - (qy + 0.5)) < 1.0
    # The hit point lies in the plane of the returned world triangle.
    tw = info["tri_world"]
    n = np.cross(tw[1] - tw[0], tw[2] - tw[0])
    d = abs(np.dot(info["hit_p"] - tw[0], n / np.linalg.norm(n)))
    assert d < 1e-3 * np.linalg.norm(tw[1] - tw[0])
    # AABB contains the triangle.
    lo = info["aabb_corners"].min(axis=0) - 1e-4
    hi = info["aabb_corners"].max(axis=0) + 1e-4
    assert (tw >= lo).all() and (tw <= hi).all()


def test_overlay_draws_without_mutating_input():
    integ = _integrator()
    integ.render()
    frame = np.asarray(integ.framebuffer())
    before = frame.copy()
    info = query_pixel(integ, W // 2, W // 2)
    out = draw_query_overlay(frame, integ.scene.camera, info)
    np.testing.assert_array_equal(frame, before)  # input untouched
    changed = np.any(out != frame, axis=-1)
    assert changed.sum() >= 8  # wireframes actually landed on screen
    # Overlay colors are saturated HDR marks.
    assert out[changed].max() >= 4.0
