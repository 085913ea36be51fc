"""GGX microfacet machinery + Fresnel (reference: Src/CUDA/Material.h:145-222,
Sampling.h:159-178 VNDF, Raytracing/Ray.h reflect/refract).

Conventions match the reference: all directions are in the local shading
frame with +z = shading normal; `omega_i` points AWAY from the surface toward
the viewer; `roughness_to_alpha(r) = r^2`. All functions are batched (R,) /
(R, 3) and branchless.
"""

from __future__ import annotations

import jax.numpy as jnp

from gpu_raytracer_tpu.ops.sampling import PI, sample_disk

_EPS = jnp.float32(1e-8)


def roughness_to_alpha(linear_roughness):
    """reference: Material.h:7-9."""
    return jnp.maximum(linear_roughness * linear_roughness, 1e-4)


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def _div_diff_by_sum(a, b):
    return (a - b) / jnp.maximum(a + b, _EPS)


def fresnel_dielectric(cos_theta_i, eta):
    """eta = n_incident / n_transmitted. Returns 1 on TIR
    (reference: Material.h:145-157)."""
    sin_theta_o2 = eta * eta * (1.0 - cos_theta_i * cos_theta_i)
    tir = sin_theta_o2 >= 1.0
    cos_theta_o = safe_sqrt(1.0 - sin_theta_o2)
    p = _div_diff_by_sum(eta * cos_theta_i, cos_theta_o)
    s = _div_diff_by_sum(cos_theta_i, eta * cos_theta_o)
    return jnp.where(tir, 1.0, 0.5 * (p * p + s * s))


def fresnel_conductor(cos_theta_i, eta, k):
    """Shirley's exact conductor Fresnel; eta/k are (..., 3)
    (reference: Material.h:160-172)."""
    cos_theta_i = cos_theta_i[..., None] if eta.ndim > cos_theta_i.ndim else cos_theta_i
    c2 = cos_theta_i * cos_theta_i
    s2 = 1.0 - c2
    inner = eta * eta - k * k - s2
    a2_plus_b2 = safe_sqrt(inner * inner + 4.0 * k * k * eta * eta)
    a = safe_sqrt(0.5 * (a2_plus_b2 + inner))
    t_s = _div_diff_by_sum(a2_plus_b2 + c2, 2.0 * a * cos_theta_i)
    t_p = _div_diff_by_sum(a2_plus_b2 * c2 + s2 * s2, 2.0 * a * cos_theta_i * s2) * t_s
    return 0.5 * (t_p + t_s)


def average_fresnel_dielectric(ior):
    """Kulla-Conty 2017 rational fit (reference: Material.h:174-177)."""
    return (ior - 1.0) / (4.08567 + 1.00071 * ior)


def average_fresnel_conductor(eta, k):
    """d'Eon's fit (Hitchhiker's Guide to Multiple Scattering)
    (reference: Material.h:179-184)."""
    num = (eta * (133.736 - 98.9833 * eta)
           + k * (eta * (59.5617 - 3.98288 * eta) - 182.37)
           + ((0.30818 * eta - 13.1093) * eta - 62.5919) * k * k
           - 8.21474)
    den = (k * (eta * (94.6517 - 15.8558 * eta) - 187.166)
           + (-78.476 * eta - 395.268) * eta
           + (eta * (eta - 15.4387) - 62.0752) * k * k)
    return num / den


def ggx_D(omega_m, alpha_x, alpha_y):
    """GGX normal distribution (reference: Material.h:186-200)."""
    z = omega_m[..., 2]
    valid = z >= 1e-6
    zs = jnp.where(valid, z, 1.0)
    sx = -omega_m[..., 0] / (zs * alpha_x)
    sy = -omega_m[..., 1] / (zs * alpha_y)
    sl = 1.0 + sx * sx + sy * sy
    cos2 = zs * zs
    cos4 = cos2 * cos2
    return jnp.where(valid, 1.0 / (sl * sl * PI * alpha_x * alpha_y * cos4), 0.0)


def ggx_lambda(omega, alpha_x, alpha_y):
    z2 = jnp.maximum(omega[..., 2] * omega[..., 2], _EPS)
    t = ((alpha_x * omega[..., 0]) ** 2 + (alpha_y * omega[..., 1]) ** 2) / z2
    return 0.5 * (jnp.sqrt(1.0 + t) - 1.0)


def ggx_G1(omega, alpha_x, alpha_y):
    return 1.0 / (1.0 + ggx_lambda(omega, alpha_x, alpha_y))


def ggx_G2(omega_o, omega_i, omega_m, alpha_x, alpha_y):
    """Height-correlated Smith (reference: Material.h:215-222)."""
    i_back = jnp.sum(omega_i * omega_m, axis=-1) * omega_i[..., 2] <= 0.0
    o_back = jnp.sum(omega_o * omega_m, axis=-1) * omega_o[..., 2] <= 0.0
    g = 1.0 / (1.0 + ggx_lambda(omega_o, alpha_x, alpha_y)
               + ggx_lambda(omega_i, alpha_x, alpha_y))
    return jnp.where(i_back | o_back, 0.0, g)


def sample_vndf_ggx(omega_i, alpha_x, alpha_y, u1, u2):
    """Heitz 2018 visible-normal sampling (reference: Sampling.h:159-178)."""
    v = jnp.stack([alpha_x * omega_i[..., 0], alpha_y * omega_i[..., 1],
                   omega_i[..., 2]], axis=-1)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), _EPS)

    len2 = v[..., 0] ** 2 + v[..., 1] ** 2
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(len2, _EPS))
    axis1 = jnp.where((len2 > _EPS)[..., None],
                      jnp.stack([-v[..., 1] * inv_len, v[..., 0] * inv_len,
                                 jnp.zeros_like(inv_len)], axis=-1),
                      jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], jnp.float32), v.shape))
    axis2 = jnp.cross(v, axis1)

    dx, dy = sample_disk(u1, u2)
    t1 = dx
    t2 = (1.0 - (0.5 + 0.5 * v[..., 2])) * safe_sqrt(1.0 - t1 * t1) \
        + (0.5 + 0.5 * v[..., 2]) * dy

    n_h = (t1[..., None] * axis1 + t2[..., None] * axis2
           + safe_sqrt(1.0 - t1 * t1 - t2 * t2)[..., None] * v)
    m = jnp.stack([alpha_x * n_h[..., 0], alpha_y * n_h[..., 1],
                   jnp.maximum(n_h[..., 2], 0.0)], axis=-1)
    return m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), _EPS)


def reflect_direction(omega_i, omega_m):
    """reference: Ray.h:20-22 (omega_i away from surface)."""
    return 2.0 * jnp.sum(omega_i * omega_m, axis=-1, keepdims=True) * omega_m - omega_i


def refract_direction(omega_i, omega_m, eta):
    """reference: Ray.h:24-28. eta broadcastable scalar/(R,)."""
    eta = jnp.asarray(eta)
    if eta.ndim < omega_i.ndim:
        eta = eta[..., None]
    cos_theta = jnp.sum(omega_i * omega_m, axis=-1, keepdims=True)
    k = 1.0 - eta * eta * (1.0 - cos_theta * cos_theta)
    return (eta * cos_theta - safe_sqrt(k)) * omega_m - eta * omega_i


def pdf_is_valid(pdf):
    return jnp.isfinite(pdf) & (pdf > 1e-8)
