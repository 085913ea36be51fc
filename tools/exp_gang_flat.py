"""Flat (leaf-postponing) gang kernel vs round-3 gang kernel on real Sponza
waves. Dumps the wave + tables to /tmp/sponza_wave.npz on first run so
subsequent kernel iterations skip the scene build."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from gpu_raytracer_tpu.utils import compile_cache

compile_cache.enable()

import jax
import jax.numpy as jnp

from gpu_raytracer_tpu.ops import pallas_gang as pg
from gpu_raytracer_tpu.ops import pallas_wide as pwd
from gpu_raytracer_tpu.ops.ray_sort import ray_sort_order

T0 = time.time()


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


CACHE = "/tmp/sponza_wave_c12.npz"  # cap12/cn10 tables (round-4 defaults)
if os.path.exists(CACHE):
    z = np.load(CACHE)
    data = {k: z[k] for k in z.files}
    log("wave loaded from cache")
else:
    from gpu_raytracer_tpu.config import CPUConfig, GPUConfig
    from gpu_raytracer_tpu.ops.buffers import build_scene_buffers
    from gpu_raytracer_tpu.ops.camera_rays import generate_primary_rays, tile_order
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
    log("buffers built")
    camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
    pix = jnp.asarray(tile_order(W, H))
    cfg = GPUConfig(num_bounces=3)
    o, d = generate_primary_rays(camera, pix, W, 0, cfg.reconstruction_filter)
    nodes, rows = buffers["wide"]
    tmax = jnp.full((R,), np.inf, jnp.float32)
    hit = pwd.trace_closest_wide(nodes, rows, o, d, tmax)
    tw = np.asarray(hit.t)
    log("primary traced")
    k = jax.random.PRNGKey(0)
    u = np.asarray(jax.random.uniform(k, (R, 2)))
    on = np.asarray(o)
    dn = np.asarray(d)
    hp = on + np.where(np.isfinite(tw), tw, 0.0)[:, None] * dn
    phi = 2 * np.pi * u[:, 0]
    ct = np.sqrt(u[:, 1])
    st = np.sqrt(1 - u[:, 1])
    bd = np.stack([st * np.cos(phi), st * np.sin(phi), ct], 1).astype(np.float32)
    bd *= np.sign(np.sum(bd * (-dn), axis=1, keepdims=True)).astype(np.float32)
    alive = np.isfinite(tw)
    data = {
        "nodes": np.asarray(nodes), "rows": np.asarray(rows),
        "o": on, "d": dn, "tmax": np.asarray(tmax),
        "bo": (hp + 1e-3 * bd).astype(np.float32), "bd": bd,
        "btmax": np.where(alive, np.inf, 0.0).astype(np.float32),
        "so": (hp + 1e-3 * np.array([0.2, 0.95, 0.1], np.float32)
               / np.linalg.norm([0.2, 0.95, 0.1])).astype(np.float32),
        "stmax": np.where(alive, 50.0, 0.0).astype(np.float32),
        "lo": np.asarray(buffers["nodes"]["root_min"]),
        "hi": np.asarray(buffers["nodes"]["root_max"]),
    }
    np.savez(CACHE, **data)
    log("wave cached")

nodes = jnp.asarray(data["nodes"])
rows = jnp.asarray(data["rows"])
bo = jnp.asarray(data["bo"])
bd = jnp.asarray(data["bd"])
btmax = jnp.asarray(data["btmax"])
o = jnp.asarray(data["o"])
d = jnp.asarray(data["d"])
tmax = jnp.asarray(data["tmax"])
lo = jnp.asarray(data["lo"])
hi = jnp.asarray(data["hi"])
jax.block_until_ready(rows)
log("tables on device", nodes.shape, rows.shape)


def t(name, fn, *args, n=3, perturb=None):
    """Times with a UNIQUE ray-origin perturbation per call: the axon
    backend can serve same-input executions from cache (repeat call with
    identical buffers returns in ~0.1 ms; a fresh input costs the real
    time). `perturb` is the index of the ray-origin arg (auto: first
    (R, 3) array). Never perturb node tables — they carry float-encoded
    int refs."""
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    c = time.time() - t0
    if perturb is None:
        perturb = next(i for i, a in enumerate(args)
                       if hasattr(a, "ndim") and a.ndim == 2
                       and a.shape[-1] == 3)
    vs = [jax.block_until_ready(args[perturb] + (k + 1) * 1e-6)
          for k in range(n)]
    t0 = time.time()
    for k in range(n):
        a = list(args)
        a[perturb] = vs[k]
        out = fn(*a)
        jax.block_until_ready(out)
    log(f"{name:36s} {(time.time()-t0)/n*1000:8.1f} ms  (first {c:.1f}s)")
    return out


hg = t("gang primary (r3)", pg.trace_closest_gang, nodes, rows, o, d, tmax)
hf = t("flat primary", lambda *a: pg.trace_closest_gang(*a, flat=True),
       nodes, rows, o, d, tmax)
tg, tf = np.asarray(hg.t), np.asarray(hf.t)
fin = np.isfinite(tg)
log("primary parity:", bool(np.array_equal(fin, np.isfinite(tf))),
    float(np.abs(np.where(fin, tg - tf, 0)).max()))

t("gang bounce (r3)", pg.trace_closest_gang, nodes, rows, bo, bd, btmax)
hfb = t("flat bounce", lambda *a: pg.trace_closest_gang(*a, flat=True),
        nodes, rows, bo, bd, btmax)


@jax.jit
def sorted_flat(bo, bd, btmax):
    order, inv = ray_sort_order(bo, bd, btmax, lo, hi)
    h = pg.trace_closest_gang(nodes, rows, bo[order], bd[order],
                              btmax[order], flat=True)
    return h.t[inv], h.tri[inv]


t("flat bounce sorted (incl sort+unsort)", sorted_flat, bo, bd, btmax)

so = jnp.asarray(data["so"])
sdv = jnp.asarray(np.tile((np.array([0.2, 0.95, 0.1], np.float32)
                           / np.linalg.norm([0.2, 0.95, 0.1])), (so.shape[0], 1)))
stmax = jnp.asarray(data["stmax"])
t("gang shadow any (r3)", pg.trace_any_gang, nodes, rows, so, sdv, stmax)
t("flat shadow any", lambda *a: pg.trace_any_gang(*a, flat=True),
  nodes, rows, so, sdv, stmax)
log("ALL DONE")
