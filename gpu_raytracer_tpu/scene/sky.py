"""Sky: equirectangular lat-long HDR environment (reference: Src/Renderer/Sky.cpp,
Src/CUDA/Sky.h).

The reference loads `.hdr` via stb_image; neither stb nor imageio is available
here, so a Radiance RGBE decoder is implemented directly (the format stb
implements). EXR environments load through the framework's own EXR reader.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class Sky:
    data: np.ndarray = field(default_factory=lambda: np.zeros((1, 1, 3), np.float32))
    scale: float = 1.0

    @property
    def height(self) -> int:
        return self.data.shape[0]

    @property
    def width(self) -> int:
        return self.data.shape[1]

    @staticmethod
    def constant(radiance, height: int = 1, width: int = 1) -> "Sky":
        rad = np.broadcast_to(np.asarray(radiance, np.float32), (height, width, 3)).copy()
        return Sky(data=rad)

    @staticmethod
    def load(filename: str) -> "Sky":
        lower = filename.lower()
        if lower.endswith(".hdr"):
            return Sky(data=read_hdr(filename))
        if lower.endswith(".exr"):
            from gpu_raytracer_tpu.utils.exr import read_exr

            return Sky(data=read_exr(filename)[..., :3].astype(np.float32))
        raise ValueError(f"unsupported sky format: {filename}")


def read_hdr(filename: str) -> np.ndarray:
    """Decode a Radiance RGBE (.hdr) file to (H, W, 3) float32."""
    with open(filename, "rb") as f:
        raw = f.read()

    # Header: lines until a blank line, then the resolution line.
    pos = 0

    def read_line():
        nonlocal pos
        end = raw.index(b"\n", pos)
        line = raw[pos:end]
        pos = end + 1
        return line

    magic = read_line()
    if not (magic.startswith(b"#?RADIANCE") or magic.startswith(b"#?RGBE")):
        raise ValueError(f"{filename}: not a Radiance HDR file")
    while True:
        line = read_line()
        if line.strip() == b"":
            break
    res = read_line().split()
    if len(res) != 4 or res[0] != b"-Y" or res[2] != b"+X":
        raise ValueError(f"{filename}: unsupported HDR orientation {res!r}")
    height, width = int(res[1]), int(res[3])

    data = np.frombuffer(raw, np.uint8, offset=pos)
    rgbe = np.empty((height, width, 4), np.uint8)

    idx = 0
    for y in range(height):
        # New-style RLE scanline: starts with 2,2 then 16-bit width.
        if (width >= 8 and width < 32768 and data[idx] == 2 and data[idx + 1] == 2
                and (int(data[idx + 2]) << 8 | int(data[idx + 3])) == width):
            idx += 4
            for c in range(4):
                x = 0
                while x < width:
                    count = int(data[idx]); idx += 1
                    if count > 128:  # run
                        rgbe[y, x:x + count - 128, c] = data[idx]
                        idx += 1
                        x += count - 128
                    else:  # literal
                        rgbe[y, x:x + count, c] = data[idx:idx + count]
                        idx += count
                        x += count
        else:
            flat = data[idx:idx + width * 4].reshape(width, 4)
            rgbe[y] = flat
            idx += width * 4

    return rgbe_to_float(rgbe)


def rgbe_to_float(rgbe: np.ndarray) -> np.ndarray:
    exp = rgbe[..., 3].astype(np.int32)
    scale = np.where(exp == 0, 0.0, np.ldexp(1.0, exp - 136)).astype(np.float32)
    return (rgbe[..., :3].astype(np.float32) + 0.5) * scale[..., None] * (exp != 0)[..., None]


def float_to_rgbe(rgb: np.ndarray) -> np.ndarray:
    """Encode (H, W, 3) float32 to RGBE (for writing .hdr)."""
    maxc = rgb.max(axis=-1)
    rgbe = np.zeros(rgb.shape[:-1] + (4,), np.uint8)
    valid = maxc >= 1e-32
    mantissa, exp = np.frexp(np.where(valid, maxc, 1.0))
    scale = mantissa * 256.0 / np.where(valid, maxc, 1.0)
    rgbe[..., :3] = np.clip(rgb * scale[..., None], 0, 255).astype(np.uint8) * valid[..., None]
    rgbe[..., 3] = np.where(valid, exp + 128, 0).astype(np.uint8)
    return rgbe
