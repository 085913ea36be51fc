"""External correctness anchor: render a reference Data scene with OUR
engine and compare statistically against the reference renderer's own
screenshot (/root/reference/Screenshots/) — the only ground truth produced
by the reference binary itself (VERDICT r2 item 9; BASELINE.json's RMSE
north-star clause).

Exact RNG/sample counts differ, so the comparison is feature-level, on the
display transform both renderers share (ACES + gamma 1/2.2,
/root/reference/Src/Shaders/post.frag): luminance SSIM at a common
downsampled size, mean-brightness relative error, and histogram
intersection.

Usage:
  python tools/anchor_compare.py /root/reference/Data/Sponza/scene.xml \
      /root/reference/Screenshots/atrium.png --spp 32 --width 512 [--json]

Library use: `compare(render_u8, screenshot_path)` -> dict of metrics.
"""

from __future__ import annotations

import sys

import numpy as np


def _lum(img01):
    return (0.2126 * img01[..., 0] + 0.7152 * img01[..., 1]
            + 0.0722 * img01[..., 2])


def _resize_box(img, h, w):
    """Integer-free box downsample via bilinear sampling grid (PIL-free for
    float arrays)."""
    from PIL import Image

    pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
    return np.asarray(pil.resize((w, h), Image.LANCZOS), np.float32) / 255.0


def ssim(a, b, sigma=1.5):
    """Standard single-scale SSIM on [0, 1] luminance images."""
    from numpy.lib.stride_tricks import sliding_window_view

    radius = 5
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()

    def filt(img):
        p = np.pad(img, radius, mode="reflect")
        p = np.apply_along_axis(lambda r: np.convolve(r, g, "valid"), 1, p)
        p = np.apply_along_axis(lambda c: np.convolve(c, g, "valid"), 0, p)
        return p

    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mu_a = filt(a)
    mu_b = filt(b)
    va = filt(a * a) - mu_a ** 2
    vb = filt(b * b) - mu_b ** 2
    cab = filt(a * b) - mu_a * mu_b
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * cab + c2)
         / ((mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2)))
    return float(s.mean())


def compare(render01: np.ndarray, screenshot_path: str,
            size=(231, 342)) -> dict:
    """render01: our tone-mapped [0,1] (H, W, 3) image."""
    from PIL import Image

    shot = np.asarray(Image.open(screenshot_path).convert("RGB"),
                      np.float32) / 255.0
    h, w = size
    a = _resize_box(render01, h, w)
    b = _resize_box(shot, h, w)
    la, lb = _lum(a), _lum(b)
    hist_a = np.histogram(la, bins=32, range=(0, 1), density=True)[0]
    hist_b = np.histogram(lb, bins=32, range=(0, 1), density=True)[0]
    inter = float(np.minimum(hist_a, hist_b).sum() / max(hist_b.sum(), 1e-9))
    return {
        "ssim": ssim(la, lb),
        "mean_ours": float(la.mean()),
        "mean_ref": float(lb.mean()),
        "mean_rel_err": float(abs(la.mean() - lb.mean())
                              / max(lb.mean(), 1e-9)),
        "hist_intersection": inter,
        "rmse": float(np.sqrt(((la - lb) ** 2).mean())),
    }


def render_scene(scene_path: str, width: int, spp: int):
    """Render with the production engine + the shared display transform."""
    import jax.numpy as jnp

    from gpu_raytracer_tpu import args as args_mod
    from gpu_raytracer_tpu.integrators.pathtracer import Pathtracer
    from gpu_raytracer_tpu.scene import Scene
    from gpu_raytracer_tpu.utils.image import tonemap_aces

    from PIL import Image

    shot_probe = None
    cpu, gpu = args_mod.parse([scene_path, "-W", str(width),
                               "-H", str(int(width * 926 / 1372))
                               if "Sponza" in scene_path else str(width),
                               "-N", str(spp)])
    scene = Scene.from_config(cpu)
    pt = Pathtracer(scene, cpu, gpu)
    pt.init_device()
    for _ in range(spp):
        pt.render()
    hdr = np.asarray(pt.accumulator).reshape(pt.height, pt.width, 3)
    return tonemap_aces(hdr) ** (1.0 / 2.2)


def main(argv):
    import argparse
    import json

    p = argparse.ArgumentParser()
    p.add_argument("scene")
    p.add_argument("screenshot")
    p.add_argument("--spp", type=int, default=32)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--json", action="store_true")
    a = p.parse_args(argv)

    img = render_scene(a.scene, a.width, a.spp)
    m = compare(img, a.screenshot)
    if a.json:
        print(json.dumps(m))
    else:
        for k, v in m.items():
            print(f"{k:20s} {v:.4f}")
    return m


if __name__ == "__main__":
    main(sys.argv[1:])
