"""Temporal anti-aliasing (reference: Src/CUDA/SVGF/TAA.h:10-172).

Per frame: reproject the previous TAA frame to the current pixel via motion
vectors with a 4x4 Mitchell-Netravali resample, clamp the history to the
mu +/- 1.25 sigma YCoCg neighborhood of the current frame, then EMA blend
with alpha = 0.1. Operates in the same gamma/pseudo-Reinhard space the
reference uses between svgf_finalize and taa_finalize.
"""

from __future__ import annotations

import jax.numpy as jnp

ALPHA = 0.1
GAMMA_CLAMP = 1.25


def rgb_to_ycocg(rgb):
    """reference: Src/CUDA/Util.h:70."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return jnp.stack([
        0.25 * r + 0.5 * g + 0.25 * b,
        0.5 * r - 0.5 * b,
        -0.25 * r + 0.5 * g - 0.25 * b,
    ], axis=-1)


def ycocg_to_rgb(c):
    y, co, cg = c[..., 0], c[..., 1], c[..., 2]
    return jnp.stack([y + co - cg, y + cg, y - co - cg], axis=-1)


def _mitchell(x, b: float = 1.0 / 3.0, c: float = 1.0 / 3.0):
    """Mitchell-Netravali kernel (reference: Src/CUDA/Util.h:262)."""
    ax = jnp.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    inner = ((12 - 9 * b - 6 * c) * ax3 + (-18 + 12 * b + 6 * c) * ax2
             + (6 - 2 * b))
    outer = ((-b - 6 * c) * ax3 + (6 * b + 30 * c) * ax2
             + (-12 * b - 48 * c) * ax + (8 * b + 24 * c))
    return jnp.where(ax < 1.0, inner, jnp.where(ax < 2.0, outer, 0.0)) / 6.0


def resample_mitchell(img, screen_pos):
    """4x4 Mitchell resample of (H, W, 3) at (H, W, 2) pixel coords
    (reference: TAA.h:41-54)."""
    H, W = img.shape[0], img.shape[1]
    px = screen_pos[..., 0] - 0.5
    py = screen_pos[..., 1] - 0.5
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)

    colour = jnp.zeros(img.shape, jnp.float32)
    weight = jnp.zeros(img.shape[:2], jnp.float32)
    for j in range(-1, 3):
        for i in range(-1, 3):
            xi = x0 + i
            yi = y0 + j
            w = _mitchell(px - xi) * _mitchell(py - yi)
            in_bounds = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            w = jnp.where(in_bounds, w, 0.0)
            xc = jnp.clip(xi, 0, W - 1)
            yc = jnp.clip(yi, 0, H - 1)
            colour = colour + w[..., None] * img[yc, xc]
            weight = weight + w
    ok = weight > 1e-5
    colour = colour / jnp.maximum(weight, 1e-5)[..., None]
    return colour, ok


def resample_mitchell_quad(img, screen_pos):
    """resample_mitchell with NO gather at all.

    TPU gathers are HBM-latency-bound per START (~100 ms for one
    full-screen row gather at 1080p — ops/vec.py findings), so even the
    round-3 one-gather quad design left TAA at ~165 ms/frame. The 4x4
    footprint is prebuilt as a 48-channel quad image (15 cheap bandwidth
    shifts) and fetched per pixel by svgf.windowed_fetch: one dynamic
    global-motion alignment + separable residual shift-selects — pure
    stencil bandwidth. Taps whose residual motion exceeds the fetch
    window fall back to the current frame (history miss), the same
    degradation the reference accepts for off-screen reprojection."""
    from gpu_raytracer_tpu.ops.svgf import windowed_fetch

    H, W = img.shape[0], img.shape[1]
    px = screen_pos[..., 0] - 0.5
    py = screen_pos[..., 1] - 0.5
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    xb = jnp.clip(x0 - 1, 0, W - 4)
    yb = jnp.clip(y0 - 1, 0, H - 4)

    quad = jnp.concatenate(
        [_shift(img, -dy, -dx) for dy in range(4) for dx in range(4)],
        axis=-1)                                   # (H, W, 48)
    rows, in_window = windowed_fetch(quad, xb, yb)

    colour = jnp.zeros(img.shape, jnp.float32)
    weight = jnp.zeros((H, W), jnp.float32)
    for j in range(-1, 3):
        for i in range(-1, 3):
            xi = x0 + i
            yi = y0 + j
            w = _mitchell(px - xi) * _mitchell(py - yi)
            in_bounds = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            w = jnp.where(in_bounds & in_window, w, 0.0)
            slot = jnp.clip(yi - yb, 0, 3) * 4 + jnp.clip(xi - xb, 0, 3)
            val = rows[..., 0:3]
            for s in range(1, 16):
                val = jnp.where((slot == s)[..., None],
                                rows[..., s * 3: s * 3 + 3], val)
            colour = colour + w[..., None] * val
            weight = weight + w
    ok = weight > 1e-5
    return colour / jnp.maximum(weight, 1e-5)[..., None], ok


def _shift(img, dy, dx):
    H, W = img.shape[0], img.shape[1]
    pad = [(max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0))] + \
          [(0, 0)] * (img.ndim - 2)
    return jnp.pad(img, pad, mode="edge")[max(-dy, 0): max(-dy, 0) + H,
                                          max(-dx, 0): max(-dx, 0) + W]


def taa_step(current, prev_frame, screen_prev):
    """-> antialiased frame (reference: TAA.h:56-141). `current` and
    `prev_frame` are in the pre-tonemapped TAA colour space."""
    history, history_ok = resample_mitchell_quad(prev_frame, screen_prev)

    # 3x3 YCoCg neighborhood statistics with border guards
    # (reference: TAA.h:56-128).
    cur_y = rgb_to_ycocg(current)
    mean = jnp.zeros_like(cur_y)
    m2 = jnp.zeros_like(cur_y)
    for dy in range(-1, 2):
        for dx in range(-1, 2):
            q = rgb_to_ycocg(_shift(current, dy, dx))
            mean = mean + q
            m2 = m2 + q * q
    mean = mean / 9.0
    sigma = jnp.sqrt(jnp.maximum(m2 / 9.0 - mean * mean, 0.0))

    hist_y = rgb_to_ycocg(history)
    clamped = jnp.clip(hist_y, mean - GAMMA_CLAMP * sigma, mean + GAMMA_CLAMP * sigma)
    history = ycocg_to_rgb(clamped)

    blended = ALPHA * current + (1.0 - ALPHA) * history
    return jnp.where(history_ok[..., None], blended, current)


# Colour-space transform pair around TAA (reference: svgf_finalize applies
# Reinhard-luma + sqrt gamma; taa_finalize undoes it, TAA.h:150-172).

def to_taa_space(rgb):
    from gpu_raytracer_tpu.ops.sampling import luminance

    l = luminance(rgb)[..., None]
    return jnp.sqrt(rgb / (1.0 + l))


def from_taa_space(rgb):
    sq = rgb * rgb
    from gpu_raytracer_tpu.ops.sampling import luminance

    l = luminance(sq)[..., None]
    return sq / jnp.maximum(1.0 - l, 1e-4)
