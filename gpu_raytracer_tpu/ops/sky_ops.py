"""Sky radiance lookup (reference: Src/CUDA/Sky.h:1-16): equirectangular
lat-long sample by world direction, nearest texel (the reference samples a
CUDA texture with linear filtering; bilinear here)."""

from __future__ import annotations

import jax.numpy as jnp

from gpu_raytracer_tpu.ops.sampling import PI, TWO_PI


def sample_sky(sky: jnp.ndarray, sky_scale, direction: jnp.ndarray) -> jnp.ndarray:
    """sky: (H, W, 3); direction: (R, 3) unit vectors -> (R, 3) radiance."""
    H, W = sky.shape[0], sky.shape[1]
    if H == 1 and W == 1:
        # Constant sky (the default for scenes with no envmap emitter,
        # e.g. Sponza): shapes are static under jit, so this skips the 4
        # equirect gathers entirely — a full-wave gather costs ~50-100 ms
        # of start latency PER BOUNCE at 1080p (round-4 finding).
        return jnp.broadcast_to(sky[0, 0] * sky_scale,
                                direction.shape[:-1] + (3,))
    # Equirect: u from azimuth, v from elevation (y-up).
    phi = jnp.arctan2(direction[..., 2], direction[..., 0])
    theta = jnp.arccos(jnp.clip(direction[..., 1], -1.0, 1.0))
    u = (phi + PI) / TWO_PI
    v = theta / PI

    x = u * (W - 1)
    y = v * (H - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    c00 = sky[y0, x0]
    c01 = sky[y0, x1]
    c10 = sky[y1, x0]
    c11 = sky[y1, x1]
    top = c00 * (1 - fx) + c01 * fx
    bot = c10 * (1 - fx) + c11 * fx
    return (top * (1 - fy) + bot * fy) * sky_scale
