"""Primary ray generation (reference: Src/CUDA/Pathtracer.cu kernel_generate
:122-139 + Src/CUDA/Camera.h camera_generate_ray:20-62).

One lane per pixel in the wave: reconstruction-filter jitter (box/tent/
gaussian), thin-lens aperture sampling, rays in world space from the rotated
view pyramid. Matches the reference math exactly: the focal point is
`focal_distance * normalize(pyramid_direction)` relative to the camera, the
lens offset lives in the (unit) x/y axis plane, and aperture_radius == 0
degenerates to a pinhole.
"""

from __future__ import annotations

import jax.numpy as jnp

from gpu_raytracer_tpu.config import ReconstructionFilter
from gpu_raytracer_tpu.ops import rng
from gpu_raytracer_tpu.ops.sampling import normalize, sample_disk, sample_gaussian_pair, sample_tent


def generate_primary_rays(camera: dict, pixel_index: jnp.ndarray, width: int,
                          sample_index, recon_filter: ReconstructionFilter,
                          seed: int = 0, jitter_override=None, draw2=None):
    """pixel_index: (R,) int32 -> (ray_o (R,3), ray_d (R,3)).

    `jitter_override`: optional (2,) array replacing the per-pixel filter
    jitter — used by the SVGF/TAA path, which jitters the whole frame by a
    Halton point instead (reference Camera.h:26-29).
    """
    x = (pixel_index % width).astype(jnp.float32)
    y = (pixel_index // width).astype(jnp.float32)

    if draw2 is None:
        draw2 = rng.make_draw2(None, width, seed, "pcg")
    if jitter_override is not None:
        jx = jnp.broadcast_to(jitter_override[0], x.shape)
        jy = jnp.broadcast_to(jitter_override[1], y.shape)
    else:
        u1, u2 = draw2(rng.SampleDimension.FILTER, pixel_index, 0, sample_index)
        if recon_filter == ReconstructionFilter.BOX:
            jx, jy = u1, u2
        elif recon_filter == ReconstructionFilter.TENT:
            jx = sample_tent(u1)
            jy = sample_tent(u2)
        else:  # GAUSSIAN (reference Camera.h:41-44)
            gx, gy = sample_gaussian_pair(u1, u2)
            jx = 0.5 + 0.5 * gx
            jy = 0.5 + 0.5 * gy

    pyramid_dir = (camera["bottom_left_corner"]
                   + (x + jx)[:, None] * camera["x_axis"]
                   + (y + jy)[:, None] * camera["y_axis"])
    focal_point = camera["focal_distance"] * normalize(pyramid_dir)

    a1, a2 = draw2(rng.SampleDimension.APERTURE, pixel_index, 0, sample_index)
    lx, ly = sample_disk(a1, a2)
    offset = camera["aperture_radius"] * (lx[:, None] * camera["x_axis"]
                                          + ly[:, None] * camera["y_axis"])

    ray_o = camera["position"] + offset
    ray_d = normalize(focal_point - offset)
    return ray_o, ray_d


def tile_order(width: int, height: int, tile: int = 32):
    """Pixel indices reordered into (tile x tile) screen tiles (row-major
    within and across tiles). Rays that share a traversal block then share a
    compact screen region, which shrinks the Pallas kernel's adaptive
    select-scan windows (coherent rays visit clustered BVH rows). The CUDA
    reference gets the same effect from its 8x4 warp rasterization order.
    Returns an (W*H,) int32 permutation; radiance comes back in this order
    and is scattered by the caller."""
    import numpy as _np

    ys, xs = _np.meshgrid(_np.arange(height), _np.arange(width), indexing="ij")
    flat_y = ys.reshape(-1)
    flat_x = xs.reshape(-1)
    key = ((flat_y // tile) * ((width + tile - 1) // tile) + (flat_x // tile))
    order = _np.lexsort((flat_x % tile, flat_y % tile, key))
    return (flat_y[order] * width + flat_x[order]).astype(_np.int32)


def can_untile(width: int, height: int, tile: int = 32) -> bool:
    """Is tile_order(width, height) invertible by untile()'s reshapes?"""
    return width % tile == 0


def untile(x: jnp.ndarray, width: int, height: int, tile: int = 32):
    """Inverse of tile_order as pure reshape/transpose — NO scatter.

    `x` is (W*H, ...) data in tile_order(width, height) wave order; returns
    the (H, W, ...) image. A (H*W,)-sized scatter with a device-resident
    permutation costs hundreds of ms at 1080p on TPU; because tile_order is
    tiles-in-raster/rows-in-raster, the inverse is two reshapes and a
    transpose (HBM-bandwidth, <1 ms). Requires width % tile == 0 (the ragged
    LAST tile row is handled by splitting; ragged columns are not)."""
    assert width % tile == 0, "untile requires width % tile == 0"
    ntx = width // tile
    nfull = height // tile
    rem = height % tile
    chans = x.shape[1:]

    def block(seg, rows):
        seg = seg.reshape((-1, ntx, rows, tile) + chans)
        seg = jnp.moveaxis(seg, 2, 1)
        return seg.reshape((-1, width) + chans)

    top = block(x[:nfull * tile * width], tile)
    if rem == 0:
        return top
    bottom = block(x[nfull * tile * width:], rem)
    return jnp.concatenate([top, bottom], axis=0)
