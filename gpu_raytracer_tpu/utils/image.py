"""LDR image output: ACES tonemap + gamma, PPM/PNG writers
(reference: Src/Shaders/post.frag:14-36 tonemap, Src/Exporters/
PPMExporter.cpp:24-40).

HDR frames are stored y-up (pixel row 0 = bottom, matching the view-pyramid
math); writers flip to the usual top-down raster order.
"""

from __future__ import annotations

import numpy as np


def tonemap_aces(colour: np.ndarray) -> np.ndarray:
    """Narkowicz ACES fit (reference: post.frag:14-22)."""
    c = np.maximum(colour, 0.0)
    a, b, cc, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return np.clip((c * (a * c + b)) / (c * (cc * c + d) + e), 0.0, 1.0)


def hdr_to_ldr(hdr: np.ndarray) -> np.ndarray:
    """ACES + gamma 2.2 -> uint8 (reference: post.frag main)."""
    ldr = tonemap_aces(hdr) ** (1.0 / 2.2)
    return (ldr * 255.0 + 0.5).astype(np.uint8)


def save_ppm(filename: str, hdr: np.ndarray) -> None:
    """Binary P6 PPM from an HDR frame (reference PPMExporter::save)."""
    img = hdr_to_ldr(np.flipud(hdr))
    h, w = img.shape[:2]
    with open(filename, "wb") as f:
        f.write(b"P6\n %d\n %d\n %d\n" % (w, h, 255))
        f.write(img[..., :3].tobytes())


def save_png(filename: str, hdr: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(hdr_to_ldr(np.flipud(hdr))[..., :3]).save(filename)


def save(filename: str, hdr: np.ndarray) -> None:
    lower = filename.lower()
    if lower.endswith(".ppm"):
        save_ppm(filename, hdr)
    elif lower.endswith(".png"):
        save_png(filename, hdr)
    elif lower.endswith(".exr"):
        from gpu_raytracer_tpu.utils.exr import write_exr

        write_exr(filename, np.flipud(hdr))
    else:
        raise ValueError(f"unsupported output format: {filename}")


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.sqrt(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)))
