"""Find the NaN source in Sponza shading: wide vs XLA path NaN counts."""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from gpu_raytracer_tpu.config import CPUConfig, GPUConfig
from gpu_raytracer_tpu.integrators.pathtracer import render_wave
from gpu_raytracer_tpu.ops.buffers import build_scene_buffers
from gpu_raytracer_tpu.ops.camera_rays import tile_order
from gpu_raytracer_tpu.scene import Scene

W, H = 256, 144
scene = Scene.from_config(CPUConfig(
    scene_filenames=["/root/reference/Data/Sponza/scene.xml"]))
scene.film_width, scene.film_height = W, H
scene.camera.resize(W, H)
bufs = build_scene_buffers(scene)
camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
pix = jnp.asarray(tile_order(W, H))
config = GPUConfig(num_bounces=2, enable_russian_roulette=False)


def run(use_wide, nb=2):
    cfg = GPUConfig(num_bounces=nb, enable_russian_roulette=False)
    r = render_wave(bufs, camera, pix, 0, cfg, W, 0, scene.has_lights,
                    has_textures=len(scene.textures) > 0,
                    use_wide=use_wide)
    r = np.asarray(r)
    bad = (r == np.array([1.0, 0.0, 1.0])).all(-1)
    return r, bad


t0 = time.time()
r_w, bad_w = run(True)
print(f"wide b2: {time.time()-t0:.1f}s nan-poisoned {bad_w.mean()*100:.2f}% "
      f"mean {r_w[~bad_w].mean():.4f}")

t0 = time.time()
r_w1, bad_w1 = run(True, nb=1)
print(f"wide b1: {time.time()-t0:.1f}s nan-poisoned {bad_w1.mean()*100:.2f}%")

t0 = time.time()
r_x, bad_x = run(False)
print(f"xla  b2: {time.time()-t0:.1f}s nan-poisoned {bad_x.mean()*100:.2f}% "
      f"mean {r_x[~bad_x].mean():.4f}")
same_bad = (bad_w == bad_x).mean()
print(f"bad-mask agreement: {same_bad:.4f}")
d = np.abs(r_w[~(bad_w | bad_x)] - r_x[~(bad_w | bad_x)])
print(f"radiance absdiff (good px): max {d.max():.4f} mean {d.mean():.6f}")
