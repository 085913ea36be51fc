"""Per-bounce live-lane counts at Sponza 1080p (sizing the round-5
wavefront-compaction tiers): runs render_wave with NEE off (aliveness is
NEE-independent) at increasing num_bounces; rays_traced deltas are the
live count entering each bounce."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from gpu_raytracer_tpu.utils import compile_cache

compile_cache.enable()

import jax.numpy as jnp

from gpu_raytracer_tpu.config import CPUConfig, GPUConfig
from gpu_raytracer_tpu.integrators.pathtracer import render_wave
from gpu_raytracer_tpu.ops.buffers import build_scene_buffers
from gpu_raytracer_tpu.ops.camera_rays import tile_order
from gpu_raytracer_tpu.scene import Scene
from gpu_raytracer_tpu.utils.perftest import POVS_SPONZA

T0 = time.time()
W, H = 1920, 1080
POV = int(sys.argv[1]) if len(sys.argv) > 1 else 0

scene = Scene.from_config(CPUConfig(
    scene_filenames=["/root/reference/Data/Sponza/scene.xml"]))
scene.film_width, scene.film_height = W, H
scene.camera.resize(W, H)
pos, rot = POVS_SPONZA[POV]
scene.camera.position = np.asarray(pos, np.float32)
scene.camera.rotation = np.asarray(rot, np.float32)
scene.camera.update(0.0)
buffers = build_scene_buffers(scene)
camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
pix = jnp.asarray(tile_order(W, H))
mat_types = tuple(sorted({int(m.type) for m in scene.materials}))
print(f"[{time.time()-T0:6.1f}s] buffers built", flush=True)

R = W * H
prev = 0
for b in (1, 2, 3, 4, 6, 8):
    cfg = GPUConfig(num_bounces=b, enable_nee=False)
    _, rays = render_wave(buffers, camera, pix, 11, cfg, W, 0,
                          scene.has_lights, with_stats=True,
                          has_textures=len(scene.textures) > 0,
                          use_wide=True, use_gather_shade=True,
                          mat_types=mat_types)
    rays = int(rays)
    print(f"[{time.time()-T0:6.1f}s] b={b}: total {rays}  "
          f"live@{b-1} <= {rays - prev}  ({100.0*(rays-prev)/R:.1f}% of R)",
          flush=True)
    prev = rays
