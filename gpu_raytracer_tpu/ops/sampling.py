"""Sampling primitives in JAX (reference: Src/CUDA/Sampling.h:86-190).

Branchless vectorized forms of the reference's device sampling helpers; all
take/return (R,)-shaped arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

PI = jnp.float32(jnp.pi)
TWO_PI = jnp.float32(2.0 * jnp.pi)
ONE_OVER_PI = jnp.float32(1.0 / jnp.pi)


def balance_heuristic(pdf_f, pdf_g):
    """reference: Sampling.h:22-24."""
    return pdf_f / (pdf_f + pdf_g)


def power_heuristic(pdf_f, pdf_g):
    """Power heuristic with beta=2 (reference: Sampling.h:26-28)."""
    f2 = pdf_f * pdf_f
    return f2 / (f2 + pdf_g * pdf_g)


def sample_tent(u):
    """Inverse-CDF tent filter over [-1, 1] (reference: Sampling.h tent)."""
    left = u < 0.5
    return jnp.where(left, jnp.sqrt(2.0 * u) - 1.0, 1.0 - jnp.sqrt(2.0 - 2.0 * u))


def sample_gaussian_pair(u1, u2):
    """Box-Muller (reference: Sampling.h box_muller)."""
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-10)))
    theta = TWO_PI * u2
    return r * jnp.cos(theta), r * jnp.sin(theta)


def sample_disk(u1, u2):
    """Concentric disk mapping (reference: Sampling.h sample_disk)."""
    a = 2.0 * u1 - 1.0
    b = 2.0 * u2 - 1.0
    use_a = jnp.abs(a) > jnp.abs(b)
    r = jnp.where(use_a, a, b)
    safe = jnp.where(r == 0.0, 1.0, r)
    phi = jnp.where(use_a,
                    (PI / 4.0) * (b / safe),
                    (PI / 2.0) - (PI / 4.0) * (a / safe))
    return r * jnp.cos(phi), r * jnp.sin(phi)


def sample_cosine_hemisphere(u1, u2):
    """Cosine-weighted hemisphere about +z; returns (R, 3) direction and pdf
    (reference: Sampling.h sample_cosine_weighted_direction)."""
    x, y = sample_disk(u1, u2)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - y * y))
    dir_local = jnp.stack([x, y, z], axis=-1)
    pdf = jnp.maximum(z, 1e-8) * ONE_OVER_PI
    return dir_local, pdf


def sample_triangle_barycentric(u1, u2):
    """Heitz 2019 low-distortion square->triangle map
    (reference: Sampling.h sample_triangle)."""
    flip = u2 > u1
    half_u1 = 0.5 * u1
    half_u2 = 0.5 * u2
    u = jnp.where(flip, half_u1, u1 - half_u2)
    v = jnp.where(flip, u2 - half_u1, half_u2)
    return u, v


def sample_henyey_greenstein(omega, g, u1, u2):
    """HG phase-function direction sampling about `omega` (= -ray_direction),
    PBRT v3 convention (reference: Sampling.h:140-156). Returns (R, 3)."""
    g = jnp.asarray(g)
    iso = jnp.abs(g) < 1e-3
    denom = jnp.where(iso, 1.0, 1.0 + g - 2.0 * g * u1)
    sq = (1.0 - g * g) / jnp.where(jnp.abs(denom) < 1e-8, 1e-8, denom)
    cos_theta = jnp.where(iso, 1.0 - 2.0 * u1,
                          -(1.0 + g * g - sq * sq)
                          / jnp.where(jnp.abs(g) < 1e-8, 1e-8, 2.0 * g))
    cos_theta = jnp.clip(cos_theta, -1.0, 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = TWO_PI * u2
    local = jnp.stack([sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi),
                       cos_theta], axis=-1)
    t, b = orthonormal_basis(omega)
    return local_to_world(local, t, b, omega)


def orthonormal_basis(n):
    """Branchless ONB (Duff et al. 2017; reference: Src/CUDA/Util.h
    orthonormal_basis). n: (..., 3) -> (tangent, bitangent)."""
    z = n[..., 2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z)
    b = n[..., 0] * n[..., 1] * a
    tangent = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]], axis=-1)
    bitangent = jnp.stack(
        [b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return tangent, bitangent


def local_to_world(local_dir, tangent, bitangent, normal):
    return (local_dir[..., 0:1] * tangent
            + local_dir[..., 1:2] * bitangent
            + local_dir[..., 2:3] * normal)


def world_to_local(world_dir, tangent, bitangent, normal):
    return jnp.stack([
        jnp.sum(world_dir * tangent, axis=-1),
        jnp.sum(world_dir * bitangent, axis=-1),
        jnp.sum(world_dir * normal, axis=-1),
    ], axis=-1)


def searchsorted_cdf(cdf, u):
    """Binary search over a normalized CDF (reference: Src/CUDA/Util.h:87-103
    binary_search). cdf: (L,), u: (R,) -> (R,) int32 indices."""
    return jnp.clip(jnp.searchsorted(cdf, u, side="left"), 0, cdf.shape[0] - 1).astype(jnp.int32)


def normalize(v, eps: float = 1e-20):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def luminance(rgb):
    return (0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2])


def octahedral_encode(n):
    """Oct-encode unit vectors to 2 floats (reference: Src/CUDA/Util.h:238)."""
    d = jnp.abs(n[..., 0]) + jnp.abs(n[..., 1]) + jnp.abs(n[..., 2])
    ox = n[..., 0] / d
    oy = n[..., 1] / d
    flip_x = (1.0 - jnp.abs(oy)) * jnp.where(ox >= 0, 1.0, -1.0)
    flip_y = (1.0 - jnp.abs(ox)) * jnp.where(oy >= 0, 1.0, -1.0)
    neg = n[..., 2] < 0
    return jnp.stack([jnp.where(neg, flip_x, ox), jnp.where(neg, flip_y, oy)], axis=-1)


def octahedral_decode(o):
    ox, oy = o[..., 0], o[..., 1]
    z = 1.0 - jnp.abs(ox) - jnp.abs(oy)
    t = jnp.maximum(-z, 0.0)
    x = ox - jnp.where(ox >= 0, t, -t)
    y = oy - jnp.where(oy >= 0, t, -t)
    return normalize(jnp.stack([x, y, z], axis=-1))
