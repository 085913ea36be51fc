"""Low-discrepancy sampler tables + table-driven random numbers
(reference: Src/CUDA/Sampling.h:30-84, Src/Util/PMJ.h, Src/Util/BlueNoise.cpp).

The reference embeds ~2 MB of precomputed PMJ02 samples and 16 blue-noise
textures in source. Those tables are generated here instead:

  * sample sequences: Owen-scrambled Sobol (0,2) sequences — the same
    (0,2)-net stratification class as PMJ02 (SURVEY.md hard-part #5: the
    reference's PMJ.cpp data is absent, so sequences are regenerated;
    distributional equivalence, validated by the stratification tests).
    64 sequences x 4096 samples x 2 dims, float32, cached.
  * blue noise: 16 x 128x128 x 2-channel uint8 masks via greedy
    void-and-cluster ranking (toroidal gaussian energy), cached.

The device-side `pmj_random2` reproduces the reference lookup exactly: pcg
stream hash, hash fallback past 4096 spp, Kensler index permutation when the
64 sequences run out, Cranley-Patterson rotation by tiled per-pixel blue
noise.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from gpu_raytracer_tpu.config import (
    BLUE_NOISE_NUM_TEXTURES,
    BLUE_NOISE_TEXTURE_DIM,
    MAX_BOUNCES,
    PMJ_NUM_SAMPLES_PER_SEQUENCE,
    PMJ_NUM_SEQUENCES,
)
from gpu_raytracer_tpu.ops.rng import SampleDimension, pcg_hash

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".cache")


# ---------------------------------------------------------------------------
# Host-side table generation (numpy)
# ---------------------------------------------------------------------------

def _reverse_bits32(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint32)
    x = ((x & 0x55555555) << 1) | ((x >> 1) & 0x55555555)
    x = ((x & 0x33333333) << 2) | ((x >> 2) & 0x33333333)
    x = ((x & 0x0F0F0F0F) << 4) | ((x >> 4) & 0x0F0F0F0F)
    x = ((x & 0x00FF00FF) << 8) | ((x >> 8) & 0x00FF00FF)
    return ((x << 16) | (x >> 16)).astype(np.uint32)


def _laine_karras(x: np.ndarray, seed: np.uint32) -> np.ndarray:
    """Laine-Karras hash: an Owen scramble in reversed-bit order."""
    with np.errstate(over="ignore"):
        x = (x + seed).astype(np.uint32)
        x ^= (x * np.uint32(0x6C50B47C))
        x ^= (x * np.uint32(0xB82F1E52))
        x ^= (x * np.uint32(0xC7AFE638))
        x ^= (x * np.uint32(0x8D22F6E6))
        return x.astype(np.uint32)


def _owen_scramble(x_bits: np.ndarray, seed: int) -> np.ndarray:
    return _reverse_bits32(_laine_karras(_reverse_bits32(x_bits), np.uint32(seed)))


def _sobol_dim2(index: np.ndarray) -> np.ndarray:
    """Second Sobol dimension (first is plain bit reversal)."""
    v = np.uint32(1 << 31)
    result = np.zeros_like(index, dtype=np.uint32)
    idx = index.astype(np.uint32)
    for bit in range(32):
        take = (idx >> np.uint32(bit)) & np.uint32(1)
        result ^= take * v
        v ^= v >> np.uint32(1)
    return result


def generate_sample_sequences(num_sequences: int = PMJ_NUM_SEQUENCES,
                              num_samples: int = PMJ_NUM_SAMPLES_PER_SEQUENCE) -> np.ndarray:
    """(S, N, 2) float32 in [0, 1)."""
    idx = np.arange(num_samples, dtype=np.uint32)
    x_bits = _reverse_bits32(idx)
    y_bits = _sobol_dim2(idx)
    out = np.empty((num_sequences, num_samples, 2), np.float32)
    for s in range(num_sequences):
        sx = int(pcg_hash_np(np.uint32(2 * s + 1)))
        sy = int(pcg_hash_np(np.uint32(2 * s + 2)))
        out[s, :, 0] = _owen_scramble(x_bits, sx) * np.float64(2.0 ** -32)
        out[s, :, 1] = _owen_scramble(y_bits, sy) * np.float64(2.0 ** -32)
    return out


def pcg_hash_np(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = np.asarray(x, np.uint32)
        state = x * np.uint32(747796405) + np.uint32(2891336453)
        word = ((state >> ((state >> np.uint32(28)) + np.uint32(4))) ^ state) \
            * np.uint32(277803737)
        return (word >> np.uint32(22)) ^ word


def generate_blue_noise(num_textures: int = BLUE_NOISE_NUM_TEXTURES,
                        dim: int = BLUE_NOISE_TEXTURE_DIM,
                        sigma: float = 1.9) -> np.ndarray:
    """(T, dim, dim, 2) uint8 blue-noise masks (greedy void-and-cluster
    ranking with a toroidal gaussian energy field)."""
    n = dim * dim
    # Precompute the wrapped gaussian kernel once.
    coords = np.arange(dim)
    delta = np.minimum(coords, dim - coords).astype(np.float64)
    k1 = np.exp(-(delta ** 2) / (2 * sigma * sigma))
    kernel = np.outer(k1, k1)  # separable toroidal gaussian, peak at (0, 0)

    rng = np.random.default_rng(0xB1E)
    out = np.empty((num_textures, dim, dim, 2), np.uint8)
    for t in range(num_textures):
        for c in range(2):
            energy = np.zeros((dim, dim), np.float64)
            # Tiny random tie-break noise keeps the first picks scattered.
            energy += rng.random((dim, dim)) * 1e-9
            rank = np.empty((dim, dim), np.float64)
            occupied = np.zeros((dim, dim), bool)
            for r in range(n):
                flat = np.where(occupied.ravel(), np.inf, energy.ravel())
                pick = int(np.argmin(flat))
                py, px = divmod(pick, dim)
                occupied[py, px] = True
                rank[py, px] = r
                energy += np.roll(np.roll(kernel, py, axis=0), px, axis=1)
            out[t, :, :, c] = np.floor(rank * (256.0 / n)).astype(np.uint8)
    return out


def load_tables() -> dict:
    """Generate-or-load the sampler tables; returns jnp arrays."""
    cache = os.path.join(_CACHE_DIR, "sampler_tables_v1.npz")
    if os.path.exists(cache):
        data = np.load(cache)
        seqs, noise = data["sequences"], data["blue_noise"]
    else:
        seqs = generate_sample_sequences()
        noise = generate_blue_noise()
        os.makedirs(_CACHE_DIR, exist_ok=True)
        np.savez_compressed(cache, sequences=seqs, blue_noise=noise)
    nx_rows, ny_rows = pack_noise_rows(noise)
    return {
        # Component-major flat tables (TPU gather-friendly).
        "seq_x": jnp.asarray(seqs[:, :, 0].reshape(-1)),
        "seq_y": jnp.asarray(seqs[:, :, 1].reshape(-1)),
        "noise_x": jnp.asarray(noise[:, :, :, 0].reshape(-1).astype(np.float32) / 255.0),
        "noise_y": jnp.asarray(noise[:, :, :, 1].reshape(-1).astype(np.float32) / 255.0),
        # Per-screen-tile noise rows for the in-kernel sampler
        # (ops/pallas_shade.py): 32x32 screen tiles align with the 128x128
        # noise textures' 4x4 tiling, so one dynamically-indexed 1024-lane
        # row read replaces a per-lane gather.
        "noise_x_rows": jnp.asarray(nx_rows),
        "noise_y_rows": jnp.asarray(ny_rows),
        # (128*128, 2T) rows holding EVERY texture's (nx, ny) pair for one
        # pixel position: all draw sites of a bounce read the SAME row
        # (they differ only in the texture index), so XLA CSEs the per-draw
        # gathers into ONE row gather per bounce; each draw then selects
        # its texture's pair with a dynamic minor-dim slice. (TPU gathers
        # cost HBM latency per start — ops/vec.py fetch_rows.)
        "noise_all": jnp.asarray(
            noise.transpose(1, 2, 0, 3).reshape(
                noise.shape[1] * noise.shape[2], -1)
            .astype(np.float32) / 255.0),
    }


def pack_noise_rows(noise: np.ndarray):
    """(T, 128, 128, 2) uint8 noise -> two (T*16, 1024) f32 row tables.
    Row t*16 + ty*4 + tx holds texture t's 32x32 tile (tx, ty) in (y, x)
    row-major order — the within-tile lane order of camera_rays.tile_order."""
    T, dim = noise.shape[0], noise.shape[1]
    tiles = dim // 32
    out = []
    for c in range(2):
        ch = noise[:, :, :, c].astype(np.float32) / 255.0
        rows = ch.reshape(T, tiles, 32, tiles, 32).transpose(0, 1, 3, 2, 4)
        out.append(rows.reshape(T * tiles * tiles, 1024))
    return out[0], out[1]


# ---------------------------------------------------------------------------
# Device-side lookup (faithful port of reference random<Dim>)
# ---------------------------------------------------------------------------

def _hash_with(seed, h):
    """Wang hash seeded (reference: Util.h hash_with)."""
    seed = (seed ^ jnp.uint32(61)) ^ h
    seed = seed + (seed << 3)
    seed = seed ^ (seed >> 4)
    seed = seed * jnp.uint32(0x27D4EB2D)
    return seed


def _permute(index, length: int, seed):
    """Kensler power-of-two index permutation (reference: Util.h:125-149)."""
    mask = jnp.uint32(length - 1)
    index = index.astype(jnp.uint32)
    index = index ^ seed
    index = index * jnp.uint32(0xE170893D)
    index = index ^ (seed >> 16)
    index = index ^ ((index & mask) >> 4)
    index = index ^ (seed >> 8)
    index = index * jnp.uint32(0x0929EB3F)
    index = index ^ (seed >> 23)
    index = index ^ ((index & mask) >> 1)
    index = index * (jnp.uint32(1) | (seed >> 27))
    index = index * jnp.uint32(0x6935FA69)
    index = index ^ ((index & mask) >> 11)
    index = index * jnp.uint32(0x74DCB303)
    index = index ^ ((index & mask) >> 2)
    index = index * jnp.uint32(0x9E501CC3)
    index = index ^ ((index & mask) >> 2)
    index = index * jnp.uint32(0xC860A3DF)
    index = index & mask
    index = index ^ (index >> 5)
    return (index + seed) & mask


def pmj_random2(tables: dict, dim: int, pixel_index, bounce, sample_index,
                width: int, scalar_tables: bool = False):
    """Two stateless low-discrepancy floats per lane, reference semantics
    (Sampling.h:44-84). `dim` is a Python int; `bounce`/`sample_index` may be
    traced scalars (the bounce loop is a lax.while_loop).

    `scalar_tables` (static) asserts dim_total < PMJ_NUM_SEQUENCES for every
    reachable bounce (config.num_bounces <= 12): the PMJ pair then needs no
    per-lane Kensler permutation, so the two big seq gathers collapse to
    SCALAR lookups and only the per-pixel CP noise row gather remains."""
    pix = pixel_index.astype(jnp.uint32)
    bounce_u = jnp.asarray(bounce, jnp.uint32)
    h = pcg_hash((pix * jnp.uint32(int(SampleDimension.NUM_DIMENSIONS))
                  + jnp.uint32(dim)) * jnp.uint32(MAX_BOUNCES)
                 + bounce_u)
    s_idx = jnp.asarray(sample_index, jnp.uint32)

    # Fallback hash path for sample_index >= table size.
    inv_max = jnp.float32(np.frombuffer(np.uint32(0x2F7FFFFF).tobytes(),
                                        np.float32)[0])
    fx = _hash_with(s_idx, h).astype(jnp.float32) * inv_max
    fy = _hash_with(s_idx + jnp.uint32(0xDEADBEEF), h).astype(jnp.float32) * inv_max

    dim_total = (jnp.uint32(dim)
                 + jnp.uint32(int(SampleDimension.NUM_BOUNCE)) * bounce_u)
    base = ((dim_total % PMJ_NUM_SEQUENCES)
            * PMJ_NUM_SAMPLES_PER_SEQUENCE).astype(jnp.int32)
    s_cap = jnp.minimum(s_idx, PMJ_NUM_SAMPLES_PER_SEQUENCE - 1).astype(jnp.int32)
    if scalar_tables:
        # dim_total < NUM_SEQUENCES statically: the pair index is the same
        # for every lane -> two scalar gathers + broadcast.
        flat = base + s_cap
        sx = jnp.broadcast_to(tables["seq_x"][flat], pix.shape)
        sy = jnp.broadcast_to(tables["seq_y"][flat], pix.shape)
    else:
        permuted = _permute(jnp.broadcast_to(s_idx, pix.shape),
                            PMJ_NUM_SAMPLES_PER_SEQUENCE, h)
        idx = jnp.where(dim_total >= PMJ_NUM_SEQUENCES, permuted,
                        jnp.broadcast_to(s_idx, pix.shape))
        flat = base + jnp.minimum(
            idx, PMJ_NUM_SAMPLES_PER_SEQUENCE - 1).astype(jnp.int32)
        sx = tables["seq_x"][flat]
        sy = tables["seq_y"][flat]

    # Cranley-Patterson rotation by tiled per-pixel blue noise: one
    # texture-agnostic row gather (CSE-shared across every draw site of
    # the bounce) + a dynamic 2-column slice for this dim's texture.
    tex = (dim_total % BLUE_NOISE_NUM_TEXTURES).astype(jnp.int32)
    x = (pixel_index % width) % BLUE_NOISE_TEXTURE_DIM
    y = (pixel_index // width) % BLUE_NOISE_TEXTURE_DIM
    nrow = tables["noise_all"][y * BLUE_NOISE_TEXTURE_DIM + x]
    pair = jax.lax.dynamic_slice_in_dim(nrow, 2 * tex, 2, axis=1)
    sx = sx + pair[:, 0]
    sy = sy + pair[:, 1]
    sx = jnp.where(sx >= 1.0, sx - 1.0, sx)
    sy = jnp.where(sy >= 1.0, sy - 1.0, sy)

    in_table = s_idx < PMJ_NUM_SAMPLES_PER_SEQUENCE
    return jnp.where(in_table, sx, fx), jnp.where(in_table, sy, fy)
