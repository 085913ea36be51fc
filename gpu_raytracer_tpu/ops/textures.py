"""Device texture sampling: software bilinear/trilinear over a flat texel pool
(reference: CUDA texture objects + tex2DLod/tex2DGrad — TPUs have no hardware
samplers, so filtering is explicit vector math over HBM gathers).

Layout: one flat (N, 3) uint8 texel pool; a descriptor table maps
(texture, mip) -> (offset, width, height). Texels are sRGB and converted to
linear at sample time (the CUDA build gets this from the sRGB texture format).
Addressing is wrap (repeat), matching the reference's CU_TR_ADDRESS_MODE_WRAP.
"""

from __future__ import annotations

from typing import List

import numpy as np
import jax.numpy as jnp

MAX_MIPS = 16


def _next_pow2(x: int) -> int:
    v = 1
    while v < x:
        v *= 2
    return v


def pack_texture_pool(mip_chains: List[List[np.ndarray]]):
    """mip_chains[i] = list of (H, W, 3) uint8 mips for texture i.
    Returns device dict:
      pool (N, 3) uint8, desc_offset/width/height (T, MAX_MIPS) int32,
      num_mips (T,) int32

    Layout (round 5): every texture's mip m is allocated a slot of
    (V>>m)^2 texels where V = next_pow2(max(W0, H0)), so mip offsets have
    the closed form

        offset(t, m) = base_t + (4 * (V^2 - (V>>m)^2)) / 3

    computable from (base_t, W0, H0) alone. The indirect-bounce tap uses
    this ARITHMETIC addressing (sample_bilinear_lod_arith) instead of the
    per-lane (texture, mip) descriptor-row gather — a full-wave gather
    costs ~50 ns/row of start latency (~100 ms per textured bounce at
    1080p), while the formula is free VPU ALU. The real mip dims inside a
    slot are max(W0>>m, 1) x max(H0>>m, 1) (iterated floor-halving equals
    shifting), so wrapping math needs no tables either. Square pow2
    textures waste nothing; the worst non-pow2 case pads ~3x (uint8
    texels — accepted for the gather-start win)."""
    if not mip_chains:
        mip_chains = [[np.array([[[255, 0, 255]]], np.uint8)]]
    T = len(mip_chains)
    offsets = np.zeros((T, MAX_MIPS), np.int64)
    widths = np.ones((T, MAX_MIPS), np.int32)
    heights = np.ones((T, MAX_MIPS), np.int32)
    num_mips = np.zeros(T, np.int32)
    base_off = np.zeros(T, np.int64)
    parts = []
    cursor = 0
    for t, chain in enumerate(mip_chains):
        chain = chain[:MAX_MIPS]
        num_mips[t] = len(chain)
        h0, w0 = chain[0].shape[:2]
        V = _next_pow2(max(w0, h0))
        # sample_bilinear_lod_arith computes 4*V^2 in int32.
        assert V <= 8192, "texture dims above 8192 unsupported"
        base_off[t] = cursor
        for m, mip in enumerate(chain):
            h, w = mip.shape[:2]
            assert w == max(w0 >> m, 1) and h == max(h0 >> m, 1), \
                "mip chains must be floor-halving (generate_mips contract)"
            slot = (V >> m) * (V >> m)
            assert slot >= h * w
            offsets[t, m] = cursor
            widths[t, m] = w
            heights[t, m] = h
            parts.append(mip.reshape(-1, 3))
            if slot > h * w:
                parts.append(np.zeros((slot - h * w, 3), np.uint8))
            cursor += slot
        # Pad descriptor tail with the last mip so out-of-range lods clamp.
        for m in range(len(chain), MAX_MIPS):
            offsets[t, m] = offsets[t, len(chain) - 1]
            widths[t, m] = widths[t, len(chain) - 1]
            heights[t, m] = heights[t, len(chain) - 1]
    pool = np.concatenate(parts, axis=0)
    assert cursor < (1 << 31), "texel pool exceeds int32 addressing"
    # 2x2 neighborhood quad rows: row i holds texel i's wrapped bilinear
    # footprint [c00|c10|c01|c11] so one row gather replaces the 4 texel
    # gathers per bilinear tap (TPU gathers cost HBM latency per start —
    # ops/vec.py fetch_rows rationale). 5.3x the pool bytes, bought back
    # ~4x fewer gather starts on the texture path.
    quad_parts = []
    for t, chain in enumerate(mip_chains):
        h0, w0 = chain[0].shape[:2]
        V = _next_pow2(max(w0, h0))
        for m, mip in enumerate(chain[:MAX_MIPS]):
            h, w = mip.shape[:2]
            sx = np.roll(mip, -1, axis=1)
            sy = np.roll(mip, -1, axis=0)
            sxy = np.roll(sy, -1, axis=1)
            quad = np.concatenate([mip, sx, sy, sxy], axis=-1)
            quad_parts.append(quad.reshape(-1, 12))
            slot = (V >> m) * (V >> m)
            if slot > h * w:
                quad_parts.append(np.zeros((slot - h * w, 12), np.uint8))
    pool_quad = np.concatenate(
        [np.concatenate(quad_parts, axis=0),
         np.zeros((pool.shape[0], 4), np.uint8)], axis=-1)
    # Base lod bias: log2(max dimension of mip 0), the CUDA texture lod_bias
    # analog (reference: sample_albedo's `textures[id].lod_bias`).
    base_lod = np.log2(np.maximum(np.maximum(widths[:, 0], heights[:, 0]), 1)
                       .astype(np.float32))
    # (T, MM, 4) int32 [offset | width | height | max_mip] descriptor rows:
    # the bounce-path tap fetches one (tid, mip) row instead of 3-4 narrow
    # per-texture gathers (each full-wave gather pays ~50 ns/row of start
    # latency - ~100 ms at 1080p, so descriptor packing saves ~300 ms per
    # textured bounce).
    mip_desc = np.stack(
        [offsets.astype(np.int64), widths, heights,
         np.broadcast_to((num_mips - 1)[:, None], widths.shape)],
        axis=-1).astype(np.int32)
    return {
        "pool": jnp.asarray(pool),
        "pool_quad": jnp.asarray(pool_quad),
        "offset": jnp.asarray(offsets.astype(np.int32)),
        "width": jnp.asarray(widths),
        "height": jnp.asarray(heights),
        "num_mips": jnp.asarray(num_mips),
        "base_lod": jnp.asarray(base_lod),
        "mip_desc": jnp.asarray(mip_desc),
        # Host copies for baking per-instance lod bias / mip count /
        # arithmetic-addressing facts into instance rows
        # (buffers._pack_instances) without a device readback.
        "base_lod_np": base_lod,
        "num_mips_np": num_mips,
        "base_off_np": base_off.astype(np.int32),
        "w0_np": widths[:, 0].copy(),
        "h0_np": heights[:, 0].copy(),
    }


def srgb_to_linear(c):
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _fetch(textures, offset, x, y, w, h):
    """Wrapped texel fetch -> (R, 3) linear float."""
    x = jnp.mod(x, w)
    y = jnp.mod(y, h)
    texel = textures["pool"][offset + y * w + x].astype(jnp.float32) * (1.0 / 255.0)
    return srgb_to_linear(texel)


def sample_bilinear_lod(textures, texture_id, u, v, lod, nearest_mip=False,
                        max_mip=None):
    """Trilinear sample: bilinear at floor(lod) and ceil(lod), blended.
    texture_id: (R,) int32 (callers mask id < 0 themselves);
    u, v: (R,) wrap-addressed; lod: (R,) float mip level.

    nearest_mip=True skips the second mip's quad gather and samples
    bilinearly at round(lod) — half the gather-start latency. Used by the
    bounce >= 1 iso-cone taps (integrators/pathtracer.py): a full-wave
    gather costs ~50-100 ms at 1080p and inter-mip popping is invisible
    in indirect lighting (bounce 0 keeps the exact aniso/trilinear path
    the reference's tex2DGrad provides).

    `max_mip`: optional (R,) float per-lane mip cap the caller already
    holds (e.g. baked into instance rows) — skips the num_mips gather.
    Each mip's offset/width/height come from ONE mip_desc row gather."""
    tid = jnp.maximum(texture_id, 0)
    if max_mip is None:
        max_mip = (textures["num_mips"][tid] - 1).astype(jnp.float32)
    lod = jnp.clip(lod, 0.0, max_mip)
    if nearest_mip:
        lod = jnp.round(lod)
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, max_mip.astype(jnp.int32))
    f = (lod - l0)[:, None]

    def bilinear(mip):
        d = textures["mip_desc"][tid, mip]
        off, w, h = d[:, 0], d[:, 1], d[:, 2]
        x = u * w - 0.5
        y = v * h - 0.5
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = (x - x0)[:, None]
        fy = (y - y0)[:, None]
        # One quad-row gather covers all 4 wrapped bilinear texels.
        row = textures["pool_quad"][off + jnp.mod(y0, h) * w + jnp.mod(x0, w)]
        row = srgb_to_linear(row.astype(jnp.float32) * (1.0 / 255.0))
        c00, c10 = row[:, 0:3], row[:, 3:6]
        c01, c11 = row[:, 6:9], row[:, 9:12]
        return (c00 * (1 - fx) + c10 * fx) * (1 - fy) + (c01 * (1 - fx) + c11 * fx) * fy

    if nearest_mip:
        return bilinear(l0)
    return bilinear(l0) * (1 - f) + bilinear(l1) * f


def sample_bilinear_lod_arith(textures, base_off, w0, h0, u, v, lod,
                              nearest_mip=False, max_mip=None):
    """Bilinear/trilinear tap with ARITHMETIC mip addressing: no
    per-lane descriptor gather. `base_off` is the texture's pool base
    (int32, bitcast through the f32 instance row), `w0`/`h0` its mip-0
    dims as floats; mip m lives at

        base + (4 * (V^2 - (V>>m)^2)) / 3,   V = next_pow2(max(w0, h0))

    with real dims (max(w0>>m, 1), max(h0>>m, 1)) — see pack_texture_pool.
    Callers supply `max_mip` (baked into instance rows) and mask
    texture-less lanes themselves. Same texels as sample_bilinear_lod."""
    lod = jnp.clip(lod, 0.0, max_mip)
    if nearest_mip:
        lod = jnp.round(lod)
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, max_mip.astype(jnp.int32))
    f = (lod - l0)[:, None]
    # V and V^2 as exact int ALU (pow2 dims give exact float log2; non-pow2
    # round up). V <= 32768 so 4*V^2 < 2^31.
    V = jnp.exp2(jnp.ceil(jnp.log2(jnp.maximum(jnp.maximum(w0, h0), 1.0)))
                 ).astype(jnp.int32)
    V2 = V * V
    w0i = w0.astype(jnp.int32)
    h0i = h0.astype(jnp.int32)

    def bilinear(mip):
        vm = V >> mip
        off = base_off + ((V2 - vm * vm) << 2) // 3
        w = jnp.maximum(w0i >> mip, 1)
        h = jnp.maximum(h0i >> mip, 1)
        x = u * w - 0.5
        y = v * h - 0.5
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = (x - x0)[:, None]
        fy = (y - y0)[:, None]
        row = textures["pool_quad"][off + jnp.mod(y0, h) * w + jnp.mod(x0, w)]
        row = srgb_to_linear(row.astype(jnp.float32) * (1.0 / 255.0))
        c00, c10 = row[:, 0:3], row[:, 3:6]
        c01, c11 = row[:, 6:9], row[:, 9:12]
        return (c00 * (1 - fx) + c10 * fx) * (1 - fy) + (c01 * (1 - fx) + c11 * fx) * fy

    if nearest_mip:
        return bilinear(l0)
    return bilinear(l0) * (1 - f) + bilinear(l1) * f


ANISO_MAX = 4.0   # footprint anisotropy clamp (hardware maxAniso analog)
ANISO_TAPS = 4    # trilinear taps along the major axis


def sample_aniso_grad(textures, texture_id, u, v, g1, g2):
    """Software anisotropic filtering — the tex2DGrad analog (reference:
    Pathtracer.cu:668-690 aniso path at bounce 0). g1/g2 are the uv-space
    texture gradients (projected ellipse axes); the footprint is sampled
    with ANISO_TAPS trilinear taps along the major axis at the lod of the
    (clamped) minor axis."""
    tid = jnp.maximum(texture_id, 0)
    w0 = textures["width"][tid, 0].astype(jnp.float32)
    h0 = textures["height"][tid, 0].astype(jnp.float32)
    l1 = jnp.sqrt((g1[:, 0] * w0) ** 2 + (g1[:, 1] * h0) ** 2)
    l2 = jnp.sqrt((g2[:, 0] * w0) ** 2 + (g2[:, 1] * h0) ** 2)
    major_is_1 = l1 >= l2
    major_len = jnp.where(major_is_1, l1, l2)
    minor_len = jnp.where(major_is_1, l2, l1)
    major = jnp.where(major_is_1[:, None], g1, g2)
    # Effective isotropic footprint: minor axis, clamped so the tap line
    # never under-filters by more than ANISO_MAX.
    eff = jnp.maximum(jnp.maximum(minor_len, major_len / ANISO_MAX), 1e-8)
    lod = jnp.log2(eff)
    acc = 0.0
    for i in range(ANISO_TAPS):
        t = (i + 0.5) / ANISO_TAPS - 0.5
        acc = acc + sample_bilinear_lod(textures, texture_id,
                                        u + major[:, 0] * t,
                                        v + major[:, 1] * t, lod)
    return acc * (1.0 / ANISO_TAPS)
