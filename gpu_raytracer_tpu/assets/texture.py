"""Texture decode + mip chain generation (reference: Src/Assets/
TextureLoader.cpp + Src/Math/Mipmap.cpp).

Decoding goes through PIL (TGA/PNG/JPG/BMP/DDS); failures degrade to the
reference's 1x1 pink fallback (AssetManager.cpp:157-169). Mip chains are
generated on the CPU with a box filter (fast path) or Lanczos/Kaiser
windowed-sinc polyphase filters (reference: Mipmap.cpp:14-53), all sizes
rounded down by powers of two.

BC1 block compression is intentionally not implemented: it is a GPU texture-
memory format with no TPU equivalent (textures live in HBM as plain arrays);
the `--compress` flag is parsed and ignored (see CPUConfig).
"""

from __future__ import annotations

from typing import List

import numpy as np

from gpu_raytracer_tpu.config import MipmapFilterType

PINK = np.array([[[255, 0, 255]]], np.uint8)


def load_image(filename: str) -> np.ndarray:
    """-> (H, W, 3) uint8 sRGB. Pink 1x1 fallback on failure."""
    try:
        from PIL import Image

        with Image.open(filename) as img:
            return np.asarray(img.convert("RGB"), np.uint8)
    except Exception as exc:
        print(f"WARNING: failed to load texture {filename!r}: {exc}")
        return PINK.copy()


def _box_downsample(img: np.ndarray) -> np.ndarray:
    h, w = img.shape[:2]
    h2, w2 = max(h // 2, 1), max(w // 2, 1)
    src = img[: h2 * 2, : w2 * 2].astype(np.float32)
    out = 0.25 * (src[0::2, 0::2] + src[1::2, 0::2] + src[0::2, 1::2] + src[1::2, 1::2])
    return np.clip(out + 0.5, 0, 255).astype(np.uint8)


def _sinc(x):
    return np.sinc(x)  # normalized sinc: sin(pi x)/(pi x)


def _lanczos_kernel(taps: int = 3):
    """Half-band Lanczos-3 polyphase kernel for 2x downsampling."""
    x = (np.arange(-2 * taps, 2 * taps + 1) + 0.5) / 2.0
    k = _sinc(x) * _sinc(x / taps)
    return (k / k.sum()).astype(np.float32)


def _kaiser_kernel(taps: int = 3, beta: float = 4.0):
    x = (np.arange(-2 * taps, 2 * taps + 1) + 0.5) / 2.0
    window = np.i0(beta * np.sqrt(np.clip(1 - (x / taps) ** 2, 0, 1))) / np.i0(beta)
    k = _sinc(x) * window
    return (k / k.sum()).astype(np.float32)


def _filtered_downsample(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Separable 2x downsample with the given half-band kernel."""
    src = img.astype(np.float32)
    pad = len(kernel) // 2

    def down_axis(a, axis):
        a = np.moveaxis(a, axis, 0)
        padded = np.pad(a, [(pad, pad)] + [(0, 0)] * (a.ndim - 1), mode="edge")
        n_out = max(a.shape[0] // 2, 1)
        out = np.zeros((n_out,) + a.shape[1:], np.float32)
        for i, kv in enumerate(kernel):
            sl = padded[i: i + 2 * n_out: 2]
            out += kv * sl[:n_out]
        return np.moveaxis(out, 0, axis)

    out = down_axis(down_axis(src, 0), 1)
    return np.clip(out + 0.5, 0, 255).astype(np.uint8)


def generate_mips(image: np.ndarray,
                  filter_type: MipmapFilterType = MipmapFilterType.BOX) -> List[np.ndarray]:
    """Full mip chain down to 1x1."""
    mips = [image]
    if filter_type == MipmapFilterType.LANCZOS:
        kernel = _lanczos_kernel()
    elif filter_type == MipmapFilterType.KAISER:
        kernel = _kaiser_kernel()
    else:
        kernel = None
    cur = image
    while cur.shape[0] > 1 or cur.shape[1] > 1:
        cur = _box_downsample(cur) if kernel is None else _filtered_downsample(cur, kernel)
        mips.append(cur)
    return mips
