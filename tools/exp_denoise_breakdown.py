"""Break down the Sponza-1080p denoised frame (VERDICT r3 item #2).

Times, each as its OWN jitted program on chip: bare render_wave,
render_wave+AOVs, the un-tile (reshape) stage, SVGF reproject alone, the
full svgf_step, TAA alone, the scatter+SVGF+TAA tail, and the fused
_denoised_frame.

Timing discipline (memory: tpu-tunnel-constraints): every timed call uses
a FRESH perturbed input and forces a 4-byte scalar readback; the fetch-only
baseline is subtracted.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from gpu_raytracer_tpu.utils import compile_cache

compile_cache.enable()

from gpu_raytracer_tpu.config import CPUConfig, GPUConfig
from gpu_raytracer_tpu.integrators.pathtracer import (
    Pathtracer,
    _denoised_frame,
    render_wave,
)
from gpu_raytracer_tpu.ops import svgf as svgf_ops
from gpu_raytracer_tpu.ops import taa as taa_ops
from gpu_raytracer_tpu.utils.perftest import POVS_SPONZA

W, H = 1920, 1080
scene_file = "/root/reference/Data/Sponza/scene.xml"

from gpu_raytracer_tpu.scene import Scene

T0 = time.time()


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


scene = Scene.from_config(CPUConfig(scene_filenames=[scene_file]))
scene.film_width, scene.film_height = W, H
scene.camera.resize(W, H)
pos, rot = POVS_SPONZA[0]
scene.camera.position = np.asarray(pos, np.float32)
scene.camera.rotation = np.asarray(rot, np.float32)
scene.camera.update(0.0)

gpu = GPUConfig(num_bounces=3, enable_svgf=True, enable_taa=True)
pt = Pathtracer(scene, gpu_config=gpu)
pt.init_device()
log("paths: use_pallas", pt.use_pallas, "use_wide", pt.use_wide,
    "use_gather_shade", pt.use_gather_shade)

camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
from gpu_raytracer_tpu.ops.camera_rays import can_untile, tile_order, untile

idx = jnp.asarray(tile_order(W, H))
kw = dict(has_textures=len(scene.textures) > 0,
          has_media=len(scene.mediums) > 0,
          use_pallas=pt.use_pallas,
          use_wide=pt.use_wide and not pt.use_pallas,
          use_gather_shade=pt.use_gather_shade,
          mat_types=pt.mat_types)


@jax.jit
def _dsum(t):
    return sum(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0))
               for x in jax.tree.leaves(t) if x.dtype == jnp.float32)


def t(name, fn, reps=2):
    """fn(k) -> pytree; k varies the inputs per call."""
    t0 = time.time()
    float(_dsum(fn(0)))
    compile_s = time.time() - t0
    vals = []
    for k in range(1, reps + 1):
        t0 = time.time()
        float(_dsum(fn(k)))
        vals.append((time.time() - t0) * 1000.0)
    ms = sorted(vals)[len(vals) // 2] - base_ms
    log(f"{name:34s} {ms:9.1f} ms   (warmup {compile_s:.1f}s)")
    return fn(0)


base_ms = 0.0
base_ms = t("fetch baseline", lambda k: jnp.float32(k), reps=3)

t("render_wave plain", lambda k: render_wave(
    pt.buffers, camera, idx, k + 1, gpu, W, 0, scene.has_lights, **kw))

aovs = t("render_wave with_aovs", lambda k: render_wave(
    pt.buffers, camera, idx, k + 1, gpu, W, 0, scene.has_lights,
    with_aovs=True, **kw))

history = svgf_ops.init_history(H, W)
taa_prev = jnp.zeros((H, W, 3), jnp.float32)
vp_prev = jnp.asarray(scene.camera.view_projection)

AOV_KEYS = ("direct", "indirect", "albedo", "normal", "depth",
            "instance", "position_prev")
assert can_untile(W, H)


@jax.jit
def untile_all(aovs):
    return {k: untile(aovs[k], W, H) for k in AOV_KEYS}


@jax.jit
def scatter_all(aovs):
    def img(x):
        out = jnp.zeros((H * W,) + x.shape[1:], x.dtype)
        return out.at[idx].set(x).reshape((H, W) + x.shape[1:])
    return {k: img(aovs[k]) for k in AOV_KEYS}


def vary(pytree, k):
    return jax.tree.map(
        lambda x: x + jnp.float32(k) * 1e-6 if x.dtype == jnp.float32 else x,
        pytree)


t("untile x7 AOVs", lambda k: untile_all(vary(aovs, k)))
t("scatter x7 AOVs (old path)", lambda k: scatter_all(vary(aovs, k)))

frame0 = untile_all(aovs)


@jax.jit
def reproject_only(frame, history, vp_prev):
    screen_prev = svgf_ops.project_to_screen(frame["position_prev"],
                                             vp_prev, W, H)
    return svgf_ops.reproject(frame, history, screen_prev)


t("svgf reproject alone", lambda k: reproject_only(vary(frame0, k),
                                                   history, vp_prev))


@jax.jit
def svgf_full(frame, history, vp_prev):
    colour, new_history = svgf_ops.svgf_step(frame, history, vp_prev, gpu)
    return colour


t("svgf_step full", lambda k: svgf_full(vary(frame0, k), history, vp_prev))

colour0 = svgf_full(frame0, history, vp_prev)


@jax.jit
def taa_only(colour, frame, taa_prev, vp_prev):
    taa_in = taa_ops.to_taa_space(jnp.maximum(colour, 0.0))
    screen_prev = svgf_ops.project_to_screen(frame["position_prev"],
                                             vp_prev, W, H)
    taa_out = taa_ops.taa_step(taa_in, taa_prev, screen_prev)
    return taa_ops.from_taa_space(taa_out)


t("taa alone", lambda k: taa_only(colour0 + jnp.float32(k) * 1e-6,
                                  frame0, taa_prev, vp_prev))


@jax.jit
def tail(aovs, history, taa_prev, vp_prev):
    frame = untile_all(aovs)
    colour, new_history = svgf_ops.svgf_step(frame, history, vp_prev, gpu)
    taa_in = taa_ops.to_taa_space(jnp.maximum(colour, 0.0))
    screen_prev = svgf_ops.project_to_screen(frame["position_prev"],
                                             vp_prev, W, H)
    taa_out = taa_ops.taa_step(taa_in, taa_prev, screen_prev)
    return taa_ops.from_taa_space(taa_out)


t("untile+svgf+taa tail", lambda k: tail(vary(aovs, k), history, taa_prev,
                                         vp_prev))

t("_denoised_frame fused", lambda k: _denoised_frame(
    pt.buffers, camera, idx, k + 1, history, vp_prev, taa_prev,
    jnp.asarray(False), gpu, W, H, 0, scene.has_lights,
    len(scene.textures) > 0, len(scene.mediums) > 0,
    pt.use_pallas, pt.use_wide and not pt.use_pallas, pt.mat_types,
    use_gather_shade=pt.use_gather_shade)[0])
log("ALL DONE")
