"""BSDF library (reference: Src/CUDA/BSDF.h — Diffuse here; Plastic,
RoughDielectric, RoughConductor land with the Kulla-Conty LUT milestone).

Interface convention follows the reference exactly (BSDF.h:39-56):
  * albedo multiplies the path throughput once at the hit (calc_albedo),
    so diffuse eval/sample exclude it;
  * eval(to_light) returns (bsdf_value, pdf) where bsdf_value INCLUDES the
    cosine factor: diffuse eval = pdf = cos_theta/pi;
  * sample() returns (direction, pdf, throughput_multiplier) with the
    cosine/pdf ratio already folded in (1 for cosine-sampled diffuse).

All functions are batched over (R,) lanes and branchless.
"""

from __future__ import annotations

import jax.numpy as jnp

from gpu_raytracer_tpu.ops import rng
from gpu_raytracer_tpu.ops.sampling import (
    ONE_OVER_PI,
    local_to_world,
    orthonormal_basis,
    sample_cosine_hemisphere,
)


def diffuse_eval(normal, to_light):
    """-> (bsdf_value (R,), pdf (R,), valid (R,)). reference BSDF.h:39-46."""
    cos_o = jnp.sum(normal * to_light, axis=-1)
    valid = cos_o > 0.0
    val = jnp.maximum(cos_o, 0.0) * ONE_OVER_PI
    return val, val, valid


def diffuse_sample(normal, pixel_index, bounce, sample_index, seed: int = 0):
    """-> (direction (R,3), pdf (R,), throughput_mul (R,), valid (R,)).
    reference BSDF.h:48-56."""
    u1 = rng.random_float(2 * rng.SampleDimension.BSDF_0, pixel_index, bounce, sample_index, seed)
    u2 = rng.random_float(2 * rng.SampleDimension.BSDF_0 + 1, pixel_index, bounce, sample_index, seed)
    local_dir, pdf = sample_cosine_hemisphere(u1, u2)
    tangent, bitangent = orthonormal_basis(normal)
    direction = local_to_world(local_dir, tangent, bitangent, normal)
    valid = pdf > 1e-8
    return direction, pdf, jnp.ones_like(pdf), valid
