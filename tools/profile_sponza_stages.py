"""Per-stage Sponza bounce-body profiler: times full-sample variants with
individual stages disabled to attribute the non-trace bounce cost.
Run on idle TPU hardware."""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from gpu_raytracer_tpu.utils import compile_cache

compile_cache.enable()

import jax
import jax.numpy as jnp

from gpu_raytracer_tpu.config import CPUConfig, GPUConfig
from gpu_raytracer_tpu.integrators.pathtracer import render_wave
from gpu_raytracer_tpu.ops.buffers import build_scene_buffers
from gpu_raytracer_tpu.ops.camera_rays import generate_primary_rays, tile_order
from gpu_raytracer_tpu.ops.ray_sort import trace_sorted
from gpu_raytracer_tpu.ops import pallas_wide as pwd
from gpu_raytracer_tpu.scene import Scene
from gpu_raytracer_tpu.utils.perftest import POVS_SPONZA

W, H = 960, 544  # 32-aligned

scene = Scene.from_config(CPUConfig(
    scene_filenames=["/root/reference/Data/Sponza/scene.xml"]))
scene.film_width, scene.film_height = W, H
scene.camera.resize(W, H)
pos, rot = POVS_SPONZA[0]
scene.camera.position = np.asarray(pos, np.float32)
scene.camera.rotation = np.asarray(rot, np.float32)
scene.camera.update(0.0)
buffers = build_scene_buffers(scene)
camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
pix = jnp.asarray(tile_order(W, H))


def run(tag, config, n=2, **kw):
    kwargs = dict(has_lights=scene.has_lights, with_stats=True,
                  has_textures=len(scene.textures) > 0, use_wide=True,
                  mat_types=tuple(sorted({int(m.type) for m in scene.materials})))
    kwargs.update(kw)
    def f(s):
        return render_wave(buffers, camera, pix, s, config, W, 0, **kwargs)
    r, _ = f(0)
    jax.block_until_ready(r)
    t0 = time.time()
    for s in range(1, n + 1):
        r, _ = f(s)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / n
    print(f"{tag:34s} {dt*1e3:8.0f} ms", flush=True)
    return dt


base = GPUConfig(num_bounces=3)
run("b3 full", base)
run("b1 (primary only)", dataclasses.replace(base, num_bounces=1))
run("b2", dataclasses.replace(base, num_bounces=2))
run("b3 nee off", dataclasses.replace(base, enable_nee=False))
run("b3 mis off", dataclasses.replace(base, enable_mis=False))
run("b3 textures off", base, has_textures=False)
run("b3 no mip", dataclasses.replace(base, enable_mipmapping=False))
run("b3 sampler=hash", dataclasses.replace(base, sampler="hash"))
run("b3 rr off", dataclasses.replace(base, enable_russian_roulette=False))

# Isolated trace cost on primary rays (coherent) for scale.
o, d = generate_primary_rays(camera, pix, W, 0, base.reconstruction_filter)
tmax = jnp.full((W * H,), np.inf, jnp.float32)
nodes, rows = buffers["wide"]
hit = pwd.trace_closest_wide(nodes, rows, o, d, tmax)
jax.block_until_ready(hit.t)
t0 = time.time()
for _ in range(3):
    hit = pwd.trace_closest_wide(nodes, rows, o, d, tmax)
jax.block_until_ready(hit.t)
print(f"{'isolated primary wide trace':34s} {(time.time()-t0)/3*1e3:8.0f} ms")

f = lambda o_, d_, t_: pwd.trace_closest_wide(nodes, rows, o_, d_, t_)
hit = trace_sorted(f, o, d, tmax, buffers["nodes"]["root_min"],
                   buffers["nodes"]["root_max"])
jax.block_until_ready(hit.t)
t0 = time.time()
for _ in range(3):
    hit = trace_sorted(f, o, d, tmax, buffers["nodes"]["root_min"],
                       buffers["nodes"]["root_max"])
jax.block_until_ready(hit.t)
print(f"{'isolated primary trace_sorted':34s} {(time.time()-t0)/3*1e3:8.0f} ms")
