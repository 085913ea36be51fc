"""Stateless per-ray sampling (reference: Src/CUDA/Sampling.h:30-84).

The reference draws each sample dimension from PMJ02 tables with per-pixel
blue-noise Cranley-Patterson rotation, falling back to a pcg hash past 4096
spp. This module implements the same *interface* — `random_float(dim, pixel,
bounce, sample)` with the reference's SampleDimension keying — over two
backends:

  * `pcg`: pure hash (the reference's fallback path, Sampling.h:76-83) —
    stateless, zero tables, used until the PMJ02/blue-noise tables land.
  * `pmj02`: table-driven low-discrepancy sampling (ops/pmj.py), matching the
    reference's primary path.

All math is uint32 on the VPU; no jax.random keys are threaded through the
wavefront (hash-based = random access by construction, which is what a
wavefront renderer needs).
"""

from __future__ import annotations

import enum

import jax.numpy as jnp


class SampleDimension(enum.IntEnum):
    """reference: Src/CUDA/Sampling.h:30-42. The last five re-key per bounce."""

    FILTER = 0
    APERTURE = 1
    RUSSIAN_ROULETTE = 2
    NEE_LIGHT = 3
    NEE_TRIANGLE = 4
    BSDF_0 = 5
    BSDF_1 = 6

    NUM_DIMENSIONS = 7
    NUM_BOUNCE = 5  # bounce-dependent tail (RUSSIAN_ROULETTE..BSDF_1)


def pcg_hash(x: jnp.ndarray) -> jnp.ndarray:
    """PCG output permutation (reference: Src/CUDA/Util.h:105-112)."""
    x = x.astype(jnp.uint32)
    state = x * jnp.uint32(747796405) + jnp.uint32(2891336453)
    word = ((state >> ((state >> 28) + jnp.uint32(4))) ^ state) * jnp.uint32(277803737)
    return (word >> 22) ^ word


def wang_hash(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.uint32)
    x = (x ^ jnp.uint32(61)) ^ (x >> 16)
    x = x * jnp.uint32(9)
    x = x ^ (x >> 4)
    x = x * jnp.uint32(0x27D4EB2D)
    return x ^ (x >> 15)


def _to_unit_float(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> [0, 1) float32 with 24-bit mantissa precision."""
    return (bits >> 8).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def random_float(dim: int, pixel_index: jnp.ndarray, bounce, sample_index,
                 seed: int = 0) -> jnp.ndarray:
    """One stateless uniform sample, keyed like the reference's
    `random<Dim>(pixel, bounce, sample)` (Sampling.h:44-48).

    `dim` and (usually) `bounce` are Python ints under jit, `pixel_index` is a
    (R,) array, `sample_index` a traced scalar or int.
    """
    dim_key = jnp.uint32(int(dim))
    bounce_key = jnp.asarray(bounce, jnp.uint32)
    sample_key = jnp.asarray(sample_index, jnp.uint32)
    h = pcg_hash(pixel_index.astype(jnp.uint32)
                 + jnp.uint32(0x9E3779B9) * dim_key
                 + jnp.uint32(0x85EBCA6B) * bounce_key
                 + jnp.uint32(0xC2B2AE35) * jnp.uint32(seed))
    h = pcg_hash(h + sample_key)
    return _to_unit_float(h)


def random_float2(dim0: int, dim1: int, pixel_index, bounce, sample_index, seed: int = 0):
    return (random_float(dim0, pixel_index, bounce, sample_index, seed),
            random_float(dim1, pixel_index, bounce, sample_index, seed))


def make_draw2(tables, width: int, seed: int, mode: str,
               scalar_tables: bool = False):
    """Factory for the per-wave 2D sample draw: `draw2(dim, pixel_index,
    bounce, sample_index) -> (u1, u2)`. Selects the table-driven
    low-discrepancy path (reference Sampling.h primary path) or the pure
    hash fallback; the choice is static under jit. `scalar_tables` is the
    static num_bounces<=12 hint (see pmj.pmj_random2)."""
    if mode == "pmj" and tables is not None:
        from gpu_raytracer_tpu.ops.pmj import pmj_random2

        def draw2(dim, pixel_index, bounce, sample_index):
            return pmj_random2(tables, int(dim), pixel_index, bounce,
                               sample_index, width,
                               scalar_tables=scalar_tables)
    else:
        def draw2(dim, pixel_index, bounce, sample_index):
            return (random_float(2 * int(dim), pixel_index, bounce, sample_index, seed),
                    random_float(2 * int(dim) + 1, pixel_index, bounce, sample_index, seed))
    return draw2
