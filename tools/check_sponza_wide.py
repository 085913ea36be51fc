"""Compiled-on-TPU wide kernel vs XLA path on Sponza, small ray batch."""
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
from gpu_raytracer_tpu.ops.traverse import trace_any_tlas, trace_closest_tlas
from gpu_raytracer_tpu.scene import Scene
from gpu_raytracer_tpu.utils.perftest import POVS_SPONZA

W, H = 256, 256
scene = Scene.from_config(CPUConfig(
    scene_filenames=["/root/reference/Data/Sponza/scene.xml"]))
scene.film_width, scene.film_height = W, H
scene.camera.resize(W, H)
bufs = build_scene_buffers(scene)

pos, rot = POVS_SPONZA[0]
scene.camera.position = np.asarray(pos, np.float32)
scene.camera.rotation = np.asarray(rot, np.float32)
scene.camera.update(0.0)
camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
pix = jnp.asarray(tile_order(W, H))
o, d = generate_primary_rays(camera, pix, W, 0, ReconstructionFilter.BOX)
tmax = jnp.full((W * H,), np.inf, jnp.float32)

hit = pwd.trace_closest_wide(*bufs["wide"], o, d, tmax)
jax.block_until_ready(hit.t)

t0 = time.time()
ref = trace_closest_tlas(bufs["nodes"], bufs["tris"], bufs["instances"],
                         o, d, tmax)
jax.block_until_ready(ref.t)
print(f"xla compile+run: {time.time()-t0:.1f}s")
t0 = time.time()
ref = trace_closest_tlas(bufs["nodes"], bufs["tris"], bufs["instances"],
                         o, d, tmax)
jax.block_until_ready(ref.t)
dt = time.time() - t0
R = W * H
print(f"xla: {dt*1000:.1f} ms = {R/dt/1e6:.2f} Mrays/s")

t0 = time.time()
for _ in range(5):
    hit = pwd.trace_closest_wide(*bufs["wide"], o, d, tmax)
jax.block_until_ready(hit.t)
dtw = (time.time() - t0) / 5
print(f"wide: {dtw*1000:.1f} ms = {R/dtw/1e6:.2f} Mrays/s (speedup {dt/dtw:.1f}x)")

wt, rt = np.asarray(hit.t), np.asarray(ref.t)
wm, rm = np.asarray(hit.tri) >= 0, np.asarray(ref.tri) >= 0
print(f"hitmask agree: {np.mean(wm == rm):.6f}")
both = wm & rm
relerr = np.abs(wt[both] - rt[both]) / np.maximum(rt[both], 1e-6)
print(f"t relerr max: {relerr.max():.2e}  tri match: "
      f"{np.mean(np.asarray(hit.tri)[both] == np.asarray(ref.tri)[both]):.4f}")

# any-hit
sh = trace_any_tlas(bufs["nodes"], bufs["tris"], bufs["instances"], o, d,
                    jnp.full(R, 50.0, jnp.float32))
sw = pwd.trace_any_wide(*bufs["wide"], o, d, jnp.full(R, 50.0, jnp.float32))
print(f"anyhit agree: {np.mean(np.asarray(sh) == np.asarray(sw)):.6f}")
