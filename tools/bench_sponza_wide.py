"""Measure the wide-kernel traversal on Sponza POV 0 on real TPU hardware,
against the XLA while_loop path. Also reports wide-table build time + sizes."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from gpu_raytracer_tpu.config import CPUConfig, ReconstructionFilter
from gpu_raytracer_tpu.ops.buffers import build_scene_buffers
from gpu_raytracer_tpu.ops.camera_rays import generate_primary_rays, tile_order
from gpu_raytracer_tpu.ops import pallas_wide as pwd
from gpu_raytracer_tpu.ops.traverse import trace_closest_tlas
from gpu_raytracer_tpu.scene import Scene
from gpu_raytracer_tpu.utils.perftest import POVS_SPONZA

W, H = (1920, 1080) if "--full" in sys.argv else (960, 540)

t0 = time.time()
scene = Scene.from_config(CPUConfig(
    scene_filenames=["/root/reference/Data/Sponza/scene.xml"]))
scene.film_width, scene.film_height = W, H
scene.camera.resize(W, H)
print(f"scene load: {time.time()-t0:.1f}s, {scene.triangle_count()} tris")

t0 = time.time()
bufs = build_scene_buffers(scene)
print(f"buffers: {time.time()-t0:.1f}s")
wide = bufs.get("wide")
if wide is None:
    print("wide: GATED OFF")
    sys.exit(1)
nodes, rows = wide
print(f"wide tables: nodes {nodes.shape} rows {rows.shape} "
      f"= {(nodes.shape[0]+rows.shape[0])*512/1e6:.1f} MB")

pos, rot = POVS_SPONZA[0]
scene.camera.position = np.asarray(pos, np.float32)
scene.camera.rotation = np.asarray(rot, np.float32)
scene.camera.update(0.0)
camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
pix = jnp.asarray(tile_order(W, H))
o, d = generate_primary_rays(camera, pix, W, 0, ReconstructionFilter.BOX)
tmax = jnp.full((W * H,), np.inf, jnp.float32)
R = W * H

t0 = time.time()
hit = pwd.trace_closest_wide(nodes, rows, o, d, tmax)
jax.block_until_ready(hit.t)
print(f"wide compile+first: {time.time()-t0:.1f}s")

t0 = time.time()
n = 5
for _ in range(n):
    hit = pwd.trace_closest_wide(nodes, rows, o, d, tmax)
jax.block_until_ready(hit.t)
dt = (time.time() - t0) / n
print(f"wide: {dt*1000:.1f} ms for {R} rays = {R/dt/1e6:.2f} Mrays/s  "
      f"hitrate {float(jnp.mean((hit.tri >= 0).astype(jnp.float32))):.3f}")

if "--xla" in sys.argv:
    nd, tr, ins = bufs["nodes"], bufs["tris"], bufs["instances"]
    t0 = time.time()
    ref = trace_closest_tlas(nd, tr, ins, o, d, tmax)
    jax.block_until_ready(ref.t)
    print(f"xla compile+first: {time.time()-t0:.1f}s")
    t0 = time.time()
    ref = trace_closest_tlas(nd, tr, ins, o, d, tmax)
    jax.block_until_ready(ref.t)
    dt_x = time.time() - t0
    print(f"xla: {dt_x*1000:.1f} ms = {R/dt_x/1e6:.2f} Mrays/s")
    # agreement
    ht_w = np.asarray(hit.tri) >= 0
    ht_x = np.asarray(ref.tri) >= 0
    agree = np.mean(ht_w == ht_x)
    tt = np.abs(np.asarray(hit.t) - np.asarray(ref.t))
    both = ht_w & ht_x
    print(f"hitmask agree {agree:.5f}; t max-absdiff {tt[both].max():.2e}")
