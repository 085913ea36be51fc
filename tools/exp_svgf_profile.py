"""Profile each denoiser stage at 1080p on the real chip (round-3 item #2:
SVGF+TAA adds ~4.7 s per frame; find where it goes)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gpu_raytracer_tpu.config import GPUConfig
from gpu_raytracer_tpu.ops import svgf as svgf_ops
from gpu_raytracer_tpu.ops import taa as taa_ops

H, W = 1080, 1920
key = jax.random.PRNGKey(0)


def t(fn, *args, n=5, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / n * 1000
    print(f"{name:32s} {ms:8.1f} ms")
    return out


def rnd(*shape):
    global key
    key, k = jax.random.split(key)
    return jax.random.uniform(k, shape, jnp.float32)


frame = {
    "direct": rnd(H, W, 3),
    "indirect": rnd(H, W, 3),
    "albedo": rnd(H, W, 3),
    "normal": rnd(H, W, 3),
    "depth": rnd(H, W) * 10,
    "instance": jnp.zeros((H, W), jnp.int32),
    "position_prev": rnd(H, W, 3),
}
frame["dz"] = jnp.clip(rnd(H, W), 1e-4, 1e20)
history = svgf_ops.init_history(H, W)
vp = jnp.eye(4)
config = GPUConfig(enable_svgf=True, enable_taa=True)

screen_prev = svgf_ops.project_to_screen(frame["position_prev"], vp, W, H)

full = jax.jit(lambda f, h, v: svgf_ops.svgf_step(f, h, v, config))
t(full, frame, history, vp, name="svgf_step total")

t(jax.jit(svgf_ops.reproject), frame, history, screen_prev, name="reproject")

integrated = svgf_ops.reproject(frame, history, screen_prev)
t(jax.jit(svgf_ops.spatial_variance), frame, integrated,
  name="spatial_variance")

filt = svgf_ops.spatial_variance(frame, integrated)
t(jax.jit(lambda f, i: svgf_ops.atrous(f, i, 6)), frame, filt,
  name="atrous x6")

cur = rnd(H, W, 3)
prev = rnd(H, W, 3)
t(jax.jit(taa_ops.taa_step), cur, prev, screen_prev, name="taa_step")
t(jax.jit(taa_ops.resample_mitchell), prev, screen_prev,
  name="  resample_mitchell")

# Microbenches: gather cost models at this scale.
idx = jax.random.randint(key, (H * W,), 0, H * W)
tbl64 = rnd(H * W, 64)
t(jax.jit(lambda t_, i: t_[i]), tbl64, idx, name="gather (HW,64) rows")
tbl8 = rnd(H * W, 8)
t(jax.jit(lambda t_, i: t_[i]), tbl8, idx, name="gather (HW,8) rows")
plane = rnd(H, W)
yi = jax.random.randint(key, (H, W), 0, H)
xi = jax.random.randint(key, (H, W), 0, W)
t(jax.jit(lambda p, y, x: p[y, x]), plane, yi, xi, name="gather 2D (H,W) elems")

# Layout experiment: one atrous-style pass channel-planar (H, W) vs (H,W,3).
def pass_hwc(img):
    out = jnp.zeros_like(img)
    for dy in range(-1, 2):
        for dx in range(-1, 2):
            out = out + svgf_ops._shift(img, dy, dx)
    return out


def pass_planar(planes):
    outs = []
    for p in planes:
        o = jnp.zeros_like(p)
        for dy in range(-1, 2):
            for dx in range(-1, 2):
                o = o + svgf_ops._shift(p, dy, dx)
        outs.append(o)
    return outs


img3 = rnd(H, W, 3)
t(jax.jit(pass_hwc), img3, name="9-tap sum (H,W,3)")
planes = [rnd(H, W) for _ in range(3)]
t(jax.jit(pass_planar), planes, name="9-tap sum 3x(H,W) planar")
imgc = rnd(3, H, W)
t(jax.jit(pass_hwc), imgc, name="9-tap sum (3,H,W)")
