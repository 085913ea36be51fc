"""Stage-level probe of the instancing scene (VERDICT r3 item 7:
instancing512_mrays flat at ~0.95 across rounds). NOTE the Data snapshot
ships scene.xml but NOT lucy.obj — 441 of 444 instances degrade to empty
meshes (warn+fallback), so what renders is room/floor/light. Times each
traversal kernel and the full sample with the trusted protocol (fresh
inputs + forced scalar readback)."""
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
from gpu_raytracer_tpu.ops.camera_rays import generate_primary_rays, tile_order
from gpu_raytracer_tpu.scene import Scene

T0 = time.time()
W = 512


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


scene = Scene.from_config(CPUConfig(
    scene_filenames=["/root/reference/Data/instancing/scene.xml"]))
scene.film_width = scene.film_height = W
scene.camera.resize(W, W)
scene.camera.update(0.0)
log(f"instances {len(scene.instances)} meshes {len(scene.mesh_datas)} "
    f"tris {scene.total_instanced_tris() if hasattr(scene, 'total_instanced_tris') else '?'} "
    f"textures {len(scene.textures)} lights mats "
    f"{len(scene.materials)}")

buffers = build_scene_buffers(scene)
log("built; wide", buffers.get("wide") is not None,
    "prim_map", buffers.get("wide_prim_map") is not None,
    "pallas", buffers.get("pallas") is not None)

camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
pix = jnp.asarray(tile_order(W, W))
config = GPUConfig(num_bounces=4)
mat_types = tuple(sorted({int(m.type) for m in scene.materials}))

_rng = np.random.default_rng(5)


@jax.jit
def _dsum(t):
    return sum(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0))
               for x in jax.tree.leaves(t) if x.dtype == jnp.float32)


def timed(name, fn, reps=3):
    t0 = time.time()
    float(_dsum(fn(0)))
    first = time.time() - t0
    vals = []
    for k in range(1, reps + 1):
        t0 = time.time()
        float(_dsum(fn(k)))
        vals.append((time.time() - t0) * 1000.0)
    ms = sorted(vals)[len(vals) // 2] - base_ms
    log(f"{name:34s} {ms:9.1f} ms  (first {first:.1f}s)")


base_ms = 0.0
vals = []
for k in range(3):
    t0 = time.time()
    float(_dsum(jnp.float32(k)))
    vals.append((time.time() - t0) * 1000.0)
base_ms = sorted(vals)[1]
log(f"fetch baseline {base_ms:.1f} ms")

from gpu_raytracer_tpu.config import ReconstructionFilter

o, d = generate_primary_rays(camera, pix, W, 0, ReconstructionFilter.BOX)
o = np.asarray(o)
tmax = jnp.full((W * W,), jnp.inf, jnp.float32)
on_tpu = jax.default_backend() == "tpu"

if buffers.get("wide") is not None and on_tpu:
    from gpu_raytracer_tpu.ops.pallas_gang import trace_closest_gang
    from gpu_raytracer_tpu.ops.pallas_wide import trace_closest_wide

    nodes, rows = buffers["wide"]
    flat = buffers.get("wide_prim_map") is not None

    def pv(k):
        return jnp.asarray(o + _rng.uniform(0, 1e-4, o.shape)
                           .astype(np.float32))

    timed("wide primary", lambda k: trace_closest_wide(
        nodes, rows, pv(k), d, tmax).t)
    timed("gang primary (flat)", lambda k: trace_closest_gang(
        nodes, rows, pv(k), d, tmax, flat=flat).t)

use_pallas = buffers.get("pallas") is not None and on_tpu
use_wide = buffers.get("wide") is not None and on_tpu and not use_pallas
use_gather = (buffers.get("shade_gather") is not None and on_tpu)

timed("render_wave full sample", lambda k: render_wave(
    buffers, camera, pix, k + 1, config, W, 0, scene.has_lights,
    has_textures=len(scene.textures) > 0, use_pallas=use_pallas,
    use_wide=use_wide, use_gather_shade=use_gather and not use_pallas,
    mat_types=mat_types), reps=3)

for nb in (1, 2):
    cfg = GPUConfig(num_bounces=nb)
    timed(f"render_wave b{nb}", lambda k, c=cfg: render_wave(
        buffers, camera, pix, k + 1, c, W, 0, scene.has_lights,
        has_textures=len(scene.textures) > 0, use_pallas=use_pallas,
        use_wide=use_wide, use_gather_shade=use_gather and not use_pallas,
        mat_types=mat_types), reps=2)

log("ALL DONE")
