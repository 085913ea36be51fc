"""Attribute trace_sorted overhead (137 ms at 522k rays): argsort vs the
gathers; test whether shadow waves / primary waves need the sort at all;
measure row-packed ray permutation."""
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
from gpu_raytracer_tpu.ops.ray_sort import ray_sort_order, trace_sorted
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
    print(f"{name:42s} {(time.time()-t0)/n*1000:8.1f} ms", flush=True)
    return out


# --- components of trace_sorted ---
key = jnp.arange(R, dtype=jnp.uint32)[::-1]
t("argsort uint32", jax.jit(jnp.argsort), key)
order = jnp.argsort(key)
t("sort_order (key+argsort+inv)", jax.jit(
    lambda o_, d_, t_: ray_sort_order(o_, d_, t_, lo, hi)), o, d, tmax)
t("gather (R,) f32 x1", jax.jit(lambda x, i: x[i]), o[:, 0], order)
t("gather (R,3) f32 x1", jax.jit(lambda x, i: x[i]), o, order)
packed = jnp.concatenate([o, d, tmax[:, None],
                          jnp.zeros((R, 1), jnp.float32)], axis=1)
t("pack rays (R,8)", jax.jit(lambda a, b, c: jnp.concatenate(
    [a, b, c[:, None], jnp.zeros((R, 1), jnp.float32)], axis=1)), o, d, tmax)
t("gather (R,8) rows x1", jax.jit(lambda x, i: x[i]), packed, order)
t("unpack (R,8)->cols", jax.jit(
    lambda p: tuple(p[:, i] for i in range(7))), packed)

# --- full trace variants on primary rays ---
t("wide trace unsorted (primary)", pwd.trace_closest_wide, nodes, rows, o, d, tmax)
t("wide trace sorted (primary)", lambda *a: trace_sorted(
    lambda o_, d_, t_: pwd.trace_closest_wide(nodes, rows, o_, d_, t_),
    *a, lo, hi), o, d, tmax)

# --- bounce-1-like wave: diffuse directions from primary hits ---
hit = pwd.trace_closest_wide(nodes, rows, o, d, tmax)
k = jax.random.PRNGKey(0)
u = jax.random.uniform(k, (R, 2))
hp = o + jnp.where(jnp.isfinite(hit.t), hit.t, 0.0)[:, None] * d
# cosine hemisphere around +z then flip by a pseudo normal (-d): crude but
# produces realistically incoherent directions.
phi = 2 * np.pi * u[:, 0]
ct = jnp.sqrt(u[:, 1])
st = jnp.sqrt(1 - u[:, 1])
nd = -d
bd = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], 1)
bd = bd * jnp.sign(jnp.sum(bd * nd, axis=1, keepdims=True))
alive = jnp.isfinite(hit.t)
btmax = jnp.where(alive, jnp.inf, 0.0)
bo = hp + 1e-3 * bd

t("bounce trace unsorted", pwd.trace_closest_wide, nodes, rows, bo, bd, btmax)
t("bounce trace sorted", lambda *a: trace_sorted(
    lambda o_, d_, t_: pwd.trace_closest_wide(nodes, rows, o_, d_, t_),
    *a, lo, hi), bo, bd, btmax)

# --- shadow-like wave from SORTED bounce origins toward one light area ---
order_b, inv_b = ray_sort_order(bo, bd, btmax, lo, hi)
so = bo[order_b]
stm = btmax[order_b]
light_p = jnp.asarray([0.0, 15.0, 0.0]) + 2.0 * jax.random.uniform(k, (R, 3))
sd = light_p - so
sd = sd / jnp.maximum(jnp.linalg.norm(sd, axis=1, keepdims=True), 1e-9)


def any_unsorted(o_, d_, t_):
    return pwd.trace_any_wide(nodes, rows, o_, d_, t_)


t("shadow any unsorted (parent-sorted)", any_unsorted, so, sd, stm)
t("shadow any re-sorted", lambda *a: trace_sorted(
    any_unsorted, *a, lo, hi), so, sd, stm)
