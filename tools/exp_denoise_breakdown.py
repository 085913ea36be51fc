"""Break down the Sponza-1080p denoised frame (round-3 item #2): bench_r02
shows +4.7 s over the bare sample while SVGF+TAA alone profile at ~370 ms.
Times: bare render_wave, render_wave with AOVs, the scatter+SVGF+TAA tail,
and the fused _denoised_frame."""

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
print("paths: use_pallas", pt.use_pallas, "use_wide", pt.use_wide,
      "use_pallas_shade", pt.use_pallas_shade, flush=True)

camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
from gpu_raytracer_tpu.ops.camera_rays import tile_order

idx = jnp.asarray(tile_order(W, H))
kw = dict(has_textures=len(scene.textures) > 0,
          has_media=len(scene.mediums) > 0,
          use_pallas=pt.use_pallas,
          use_wide=pt.use_wide and not pt.use_pallas,
          use_gather_shade=pt.use_gather_shade,
          mat_types=pt.mat_types)


def t(name, fn, n=2):
    t0 = time.time()
    out = fn()
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    ms = (time.time() - t0) / n * 1000
    print(f"{name:40s} {ms:9.1f} ms   (warmup {compile_s:.1f}s)", flush=True)
    return out


t("render_wave plain", lambda: render_wave(
    pt.buffers, camera, idx, 1, gpu, W, 0, scene.has_lights, **kw))

aovs = t("render_wave with_aovs", lambda: render_wave(
    pt.buffers, camera, idx, 1, gpu, W, 0, scene.has_lights,
    with_aovs=True, **kw))

history = svgf_ops.init_history(H, W)
taa_prev = jnp.zeros((H, W, 3), jnp.float32)
vp_prev = jnp.asarray(scene.camera.view_projection)


@jax.jit
def tail(aovs, history, taa_prev, vp_prev):
    def img(x):
        out = jnp.zeros((H * W,) + x.shape[1:], x.dtype)
        return out.at[idx].set(x).reshape((H, W) + x.shape[1:])

    frame = {k: img(aovs[k]) for k in
             ("direct", "indirect", "albedo", "normal", "depth",
              "instance", "position_prev")}
    colour, new_history = svgf_ops.svgf_step(frame, history, vp_prev, gpu)
    taa_in = taa_ops.to_taa_space(jnp.maximum(colour, 0.0))
    screen_prev = svgf_ops.project_to_screen(frame["position_prev"],
                                             vp_prev, W, H)
    taa_out = taa_ops.taa_step(taa_in, taa_prev, screen_prev)
    return taa_ops.from_taa_space(taa_out), new_history, taa_out


t("scatter+svgf+taa tail", lambda: tail(aovs, history, taa_prev, vp_prev))

t("_denoised_frame fused", lambda: _denoised_frame(
    pt.buffers, camera, idx, 1, history, vp_prev, taa_prev,
    jnp.asarray(False), gpu, W, H, 0, scene.has_lights,
    len(scene.textures) > 0, len(scene.mediums) > 0,
    pt.use_pallas, pt.use_wide and not pt.use_pallas, pt.mat_types,
    use_gather_shade=pt.use_gather_shade))
