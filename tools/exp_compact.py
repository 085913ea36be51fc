"""Round-5 compaction A/B at Sponza 1080p b3: full-width body vs the
tiered lax.cond compacted body. Trusted protocol (fresh sample index,
forced scalar readback, fetch baseline subtracted)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from gpu_raytracer_tpu.utils import compile_cache

compile_cache.enable()

import jax
import jax.numpy as jnp

from gpu_raytracer_tpu.config import CPUConfig, GPUConfig
from gpu_raytracer_tpu.integrators.pathtracer import render_wave
from gpu_raytracer_tpu.ops.buffers import build_scene_buffers
from gpu_raytracer_tpu.ops.camera_rays import tile_order
from gpu_raytracer_tpu.scene import Scene
from gpu_raytracer_tpu.utils.perftest import POVS_SPONZA

T0 = time.time()
W, H = 1920, 1080


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


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
mat_types = tuple(sorted({int(m.type) for m in scene.materials}))
log("buffers built")


@jax.jit
def _dsum(x):
    return jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0))


vals = []
for k in range(3):
    t0 = time.time()
    float(_dsum(jnp.float32(k)))
    vals.append((time.time() - t0) * 1000.0)
base_ms = sorted(vals)[1]
log(f"fetch baseline {base_ms:.1f} ms")

_k = [1700]
cfg = GPUConfig(num_bounces=3)
sums = {}


def timed(name, tiers, reps=3):
    def fn():
        _k[0] += 1
        return render_wave(buffers, camera, pix, _k[0], cfg, W, 0,
                           scene.has_lights,
                           has_textures=len(scene.textures) > 0,
                           use_wide=True, use_gather_shade=True,
                           mat_types=mat_types, compact_tiers=tiers)

    t0 = time.time()
    s = float(_dsum(fn()))
    first = time.time() - t0
    vals = []
    for _ in range(reps):
        t0 = time.time()
        float(_dsum(fn()))
        vals.append((time.time() - t0) * 1000.0)
    ms = sorted(vals)[len(vals) // 2] - base_ms
    sums[name] = s
    log(f"{name:28s} {ms:9.1f} ms  (first {first:.1f}s, sum {s:.5g})")
    return ms


full = timed("b3 full-width", ())
cfg = GPUConfig(num_bounces=6)
b6 = timed("b6 full-width", ())
b6t = timed("b6 tiers (16,)", (16,))
log(f"b6 /16 net: {b6t - b6:.1f} ms")
log("ALL DONE")
