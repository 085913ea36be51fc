"""Gang kernel vs block-sync wide kernel on real Sponza waves (primary,
diffuse bounce sorted/unsorted, shadow any-hit)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from gpu_raytracer_tpu.utils import compile_cache

compile_cache.enable()

from gpu_raytracer_tpu.config import CPUConfig, GPUConfig
from gpu_raytracer_tpu.ops.buffers import build_scene_buffers
from gpu_raytracer_tpu.ops.camera_rays import generate_primary_rays, tile_order
from gpu_raytracer_tpu.ops import pallas_wide as pwd
from gpu_raytracer_tpu.ops import pallas_gang as pg
from gpu_raytracer_tpu.ops.ray_sort import ray_sort_order
from gpu_raytracer_tpu.scene import Scene
from gpu_raytracer_tpu.utils.perftest import POVS_SPONZA

W, H = 960, 544
R = W * H

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
cfg = GPUConfig(num_bounces=3)
o, d = generate_primary_rays(camera, pix, W, 0, cfg.reconstruction_filter)
tmax = jnp.full((R,), np.inf, jnp.float32)
nodes, rows = buffers["wide"]
lo, hi = buffers["nodes"]["root_min"], buffers["nodes"]["root_max"]


def t(name, fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.time()-t0)/n*1000:8.1f} ms", flush=True)
    return out


# primary
hit_w = t("wide  primary", pwd.trace_closest_wide, nodes, rows, o, d, tmax)
hit_g = t("gang  primary", pg.trace_closest_gang, nodes, rows, o, d, tmax)
tw, tg = np.asarray(hit_w.t), np.asarray(hit_g.t)
finite = np.isfinite(tw)
print("   parity: hits equal", bool(np.array_equal(finite, np.isfinite(tg))),
      "max dt", float(np.abs(np.where(finite, tw - tg, 0)).max()), flush=True)

# synthetic diffuse bounce wave
k = jax.random.PRNGKey(0)
u = jax.random.uniform(k, (R, 2))
hp = o + np.where(np.isfinite(tw), tw, 0.0)[:, None] * d
phi = 2 * np.pi * u[:, 0]
ct = jnp.sqrt(u[:, 1])
st = jnp.sqrt(1 - u[:, 1])
nd = -d
bd = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], 1)
bd = bd * jnp.sign(jnp.sum(bd * nd, axis=1, keepdims=True))
alive = jnp.asarray(np.isfinite(tw))
btmax = jnp.where(alive, jnp.inf, 0.0)
bo = jnp.asarray(hp) + 1e-3 * bd

t("wide  bounce unsorted", pwd.trace_closest_wide, nodes, rows, bo, bd, btmax)
t("gang  bounce unsorted", pg.trace_closest_gang, nodes, rows, bo, bd, btmax)

order, inv = ray_sort_order(bo, bd, btmax, lo, hi)
so, sd, stm = bo[order], bd[order], btmax[order]
t("wide  bounce sorted-in", pwd.trace_closest_wide, nodes, rows, so, sd, stm)
t("gang  bounce sorted-in", pg.trace_closest_gang, nodes, rows, so, sd, stm)

# shadow-like any-hit from primary hit points toward the sky light
sd2 = jnp.asarray(np.tile(np.array([[0.2, 0.95, 0.1]], np.float32), (R, 1)))
sd2 = sd2 / jnp.linalg.norm(sd2, axis=1, keepdims=True)
so2 = jnp.asarray(hp) + 1e-3 * sd2
stm2 = jnp.where(alive, 50.0, 0.0)
t("wide  shadow any", pwd.trace_any_wide, nodes, rows, so2, sd2, stm2)
t("gang  shadow any", pg.trace_any_gang, nodes, rows, so2, sd2, stm2)
