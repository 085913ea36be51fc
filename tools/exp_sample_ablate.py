"""Attribute the Sponza-1080p sample time across stages by static-flag
ablation: textures, mipmapping, NEE, bounce count, gather-shade. With the
round-4 traversal at ~210 ms/bounce-wave (522k) the glue between kernels
is roughly half the sample — this locates it. Trusted timing protocol
(fresh sample_index per call, forced scalar readback)."""
import dataclasses
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
log("buffers built")

camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
pix = jnp.asarray(tile_order(W, H))
mat_types = tuple(sorted({int(m.type) for m in scene.materials}))


@jax.jit
def _dsum(x):
    return jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0))


_k = [100]


def timed(name, cfg, reps=2, **kw):
    kwargs = dict(has_textures=len(scene.textures) > 0,
                  use_wide=True, use_gather_shade=True,
                  mat_types=mat_types)
    kwargs.update(kw)

    def fn():
        _k[0] += 1
        return render_wave(buffers, camera, pix, _k[0], cfg, W, 0,
                           scene.has_lights, **kwargs)

    t0 = time.time()
    float(_dsum(fn()))
    first = time.time() - t0
    vals = []
    for _ in range(reps):
        t0 = time.time()
        float(_dsum(fn()))
        vals.append((time.time() - t0) * 1000.0)
    ms = sorted(vals)[len(vals) // 2] - base_ms
    log(f"{name:36s} {ms:9.1f} ms  (first {first:.1f}s)")
    return ms


vals = []
for k in range(3):
    t0 = time.time()
    float(_dsum(jnp.float32(k)))
    vals.append((time.time() - t0) * 1000.0)
base_ms = sorted(vals)[1]
log(f"fetch baseline {base_ms:.1f} ms")

b3 = GPUConfig(num_bounces=3)
timed("full b3 (gather-shade)", b3)
timed("b3 no textures", b3, has_textures=False)
timed("b3 no mipmapping", dataclasses.replace(b3, enable_mipmapping=False))
timed("b3 no NEE", dataclasses.replace(b3, enable_nee=False))
timed("b3 XLA shade body", b3, use_gather_shade=False)
timed("b1", GPUConfig(num_bounces=1))
timed("b2", GPUConfig(num_bounces=2))
log("ALL DONE")
