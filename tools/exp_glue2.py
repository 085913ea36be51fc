"""Second glue probe (round 4): price the constant-sky fast path, the
in-jit bounce sort, and the un-tile-free b2 segment at Sponza 1080p.
Run AFTER the sky fast path landed — b2 baseline compares against the
458s-run value 2367 ms (tools/exp_sample_ablate.py)."""
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
from gpu_raytracer_tpu.integrators import pathtracer as pt_mod
from gpu_raytracer_tpu.ops import ray_sort
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


_k = [500]


def timed(name, cfg, reps=2, **kw):
    kwargs = dict(has_textures=len(scene.textures) > 0,
                  use_wide=True, use_gather_shade=True, mat_types=mat_types)
    kwargs.update(kw)

    def fn():
        _k[0] += 1
        return pt_mod.render_wave(buffers, camera, pix, _k[0], cfg, W, 0,
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

b2 = GPUConfig(num_bounces=2)
b3 = GPUConfig(num_bounces=3)
timed("b2 (const-sky fast path)", b2)
timed("b3 (const-sky fast path)", b3)

# ---- bounce sort OFF: identity trace_sorted ----
orig = ray_sort.trace_sorted


def unsorted_trace(trace_fn, ray_o, ray_d, t_max, lo, hi):
    return trace_fn(ray_o, ray_d, t_max)


pt_mod.render_wave.clear_cache()
try:
    ray_sort.trace_sorted = unsorted_trace
    # pathtracer imports trace_sorted INSIDE the bounce body, so the
    # module attribute patch takes effect on retrace.
    timed("b2 sort OFF", b2)
finally:
    ray_sort.trace_sorted = orig
    pt_mod.render_wave.clear_cache()

log("ALL DONE")
