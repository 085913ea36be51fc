"""Round-5 fine-grained bounce-1 attribution at Sponza 1080p.

Round-4/5 measurements killed the old lore: the full b3 sample is 3068 ms
of which primary-only is 113 ms, bounce 1 ~1995 ms, bounce 2 ~960 ms,
textures only 180 ms, and the while_loop-vs-unrolled diff is zero. This
probe attributes bounce-1 cost across its sub-stages by patching each one
to a shape-preserving stub (inputs stay live so XLA cannot DCE upstream
work) and re-tracing b2:

  * closest gang kernel   (fake hit, sort kept)
  * bounce coherence sort (identity trace_sorted)
  * NEE shadow gang kernel (constant unoccluded)
  * fused shade kernel    (cheap XLA stand-in, same dict contract)
  * sampler draws         (hash-based draw2)
  * textures              (has_textures=False)

Trusted protocol: fresh sample_index per call, forced 4-byte scalar
readback, fetch-baseline subtracted (see memory/tpu-tunnel notes).
"""
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
from gpu_raytracer_tpu.integrators import pathtracer as pt_mod
from gpu_raytracer_tpu.ops import pallas_gang, ray_sort
from gpu_raytracer_tpu.ops import pallas_shade_gather as psg
from gpu_raytracer_tpu.ops import rng as rng_mod
from gpu_raytracer_tpu.ops.buffers import build_scene_buffers
from gpu_raytracer_tpu.ops.camera_rays import tile_order
from gpu_raytracer_tpu.ops.traverse import HitInstanced
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
N_PRIMS = int(buffers["wide_prim_map"].shape[0])


@jax.jit
def _dsum(x):
    return jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0))


_k = [900]


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
    log(f"{name:40s} {ms:9.1f} ms  (first {first:.1f}s)")
    return ms


vals = []
for k in range(3):
    t0 = time.time()
    float(_dsum(jnp.float32(k)))
    vals.append((time.time() - t0) * 1000.0)
base_ms = sorted(vals)[1]
log(f"fetch baseline {base_ms:.1f} ms")

b2 = GPUConfig(num_bounces=2)


# ---- stubs (inputs kept live; outputs shape/dtype-exact) ----

def fake_closest(nodes, rows, ray_o, ray_d, t_max, flat=False,
                 interpret=False):
    R = ray_o.shape[0]
    h = (jnp.arange(R, dtype=jnp.uint32) * jnp.uint32(2654435761)
         ^ (ray_d[:, 0] * 1024.0).astype(jnp.int32).astype(jnp.uint32))
    live = t_max > 0.0
    tri = jnp.where(live, (h % jnp.uint32(N_PRIMS)).astype(jnp.int32), -1)
    t = jnp.where(live, 0.5 + (h % 97).astype(jnp.float32) * 0.05, t_max)
    zero = jnp.zeros((R,), jnp.float32)
    return HitInstanced(t=t, tri=tri, inst=jnp.zeros(R, jnp.int32),
                        u=zero, v=zero)


def unsorted_trace(trace_fn, ray_o, ray_d, t_max, lo, hi):
    return trace_fn(ray_o, ray_d, t_max)


def fake_any(nodes, rows, ray_o, ray_d, t_max, flat=False, interpret=False):
    return (ray_o[:, 0] + ray_d[:, 0]) * 0.0 > t_max + 1.0


def stub_shade(sg, params, lanes, enable_nee=True, enable_mis=True,
               enable_rr=True, demod=False):
    R = lanes["t"].shape[0]
    alive = lanes["alive"] & (lanes["mat_id"] >= 0)
    u = lanes["f0"]
    out = {
        "radiance_add": lanes["sky"] * 0.001 + lanes["tex_mul"] * 1e-4,
        "shadow_o": lanes["point"],
        "shadow_d": lanes["shading_n"],
        "shadow_tmax": jnp.where(alive, lanes["t"] + lanes["r0"], 0.0),
        "illumination": lanes["throughput"] * lanes["r1"][:, None],
        "alive": alive & (u < 0.9),
        "ray_o": lanes["point"],
        "ray_d": jnp.where(alive[:, None], lanes["shading_n"],
                           lanes["ray_d"]),
        "prev_allow_nee": alive & (lanes["r2"] < 0.5),
        "last_pdf": lanes["r5"] + lanes["r3"] + lanes["r4"] + 1.0,
        "throughput": lanes["throughput"] * (0.5 + 0.4 * lanes["f1"][:, None]),
        "is_transmission": jnp.zeros(R, bool),
    }
    if demod:
        out["rr_albedo"] = lanes["rr_albedo"]
    return out


def cheap_make_draw2(sampler, width, seed, kind, scalar_tables=True):
    def draw2(dim, pixel_index, bounce, sample_index):
        h = (pixel_index.astype(jnp.uint32) * jnp.uint32(2654435761)
             + jnp.uint32(int(dim)) * jnp.uint32(97)
             + jnp.asarray(sample_index, jnp.uint32) * jnp.uint32(9173)
             + jnp.asarray(bounce, jnp.uint32) * jnp.uint32(389))
        h ^= h >> 16
        u1 = (h >> 8).astype(jnp.float32) * (1.0 / 16777216.0)
        h2 = h * jnp.uint32(48271)
        u2 = (h2 >> 8).astype(jnp.float32) * (1.0 / 16777216.0)
        return u1, u2
    return draw2


def run_patched(name, patches, cfg=b2, **kw):
    saved = [(mod, attr, getattr(mod, attr)) for mod, attr, _ in patches]
    pt_mod.render_wave.clear_cache()
    try:
        for mod, attr, repl in patches:
            setattr(mod, attr, repl)
        return timed(name, cfg, **kw)
    finally:
        for mod, attr, old in saved:
            setattr(mod, attr, old)
        pt_mod.render_wave.clear_cache()


full = timed("b2 full", b2)
run_patched("b2 closest OFF (sort kept)",
            [(pallas_gang, "trace_closest_gang", fake_closest)])
run_patched("b2 sort OFF",
            [(ray_sort, "trace_sorted", unsorted_trace)])
run_patched("b2 shadow OFF",
            [(pallas_gang, "trace_any_gang", fake_any)])
run_patched("b2 shade-kernel STUB",
            [(psg, "shade_scene_pallas", stub_shade)])
run_patched("b2 draws HASH",
            [(rng_mod, "make_draw2", cheap_make_draw2)])
timed("b2 textures OFF", b2, has_textures=False)
run_patched("b2 closest+shadow+shade+draws OFF",
            [(pallas_gang, "trace_closest_gang", fake_closest),
             (pallas_gang, "trace_any_gang", fake_any),
             (psg, "shade_scene_pallas", stub_shade),
             (rng_mod, "make_draw2", cheap_make_draw2)])
log("ALL DONE")
