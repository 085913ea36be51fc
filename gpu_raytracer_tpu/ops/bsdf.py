"""BSDF library: Diffuse, Plastic, Rough Dielectric, Rough Conductor
(reference: Src/CUDA/BSDF.h:8-525 — re-derived as branchless batched JAX).

Interface conventions follow the reference exactly:
  * all directions in the local shading frame (+z = shading normal);
    `omega_i` points away from the surface toward the viewer;
  * eval(omega_o) returns (value, pdf, valid) where `value` INCLUDES the
    cosine factor (BRDF * cos_theta_o);
  * sample() returns (omega_o, pdf, throughput_multiplier, valid,
    is_transmission) with BRDF*cos/pdf folded into the multiplier;
  * diffuse albedo multiplies path throughput separately at the hit
    (reference calc_albedo), so DIFFUSE eval/sample exclude it while PLASTIC
    includes it in its diffuse lobe;
  * material dispatch is compute-all-and-select: on the TPU's lockstep VPU
    evaluating all four lobes and masking is cheaper than the reference's
    per-material queue split (which exists to fight warp divergence, a
    non-concept here). The material-sorted wavefront path remains available
    for the Pallas kernels.

The dispatch tables are (R,)-gathered material parameters:
  mat = {type, roughness, ior, eta (R,3), k (R,3)}
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gpu_raytracer_tpu.ops import kulla_conty as kc
from gpu_raytracer_tpu.ops.microfacet import (
    average_fresnel_conductor,
    average_fresnel_dielectric,
    fresnel_conductor,
    fresnel_dielectric,
    ggx_D,
    ggx_G1,
    ggx_G2,
    pdf_is_valid,
    reflect_direction,
    refract_direction,
    roughness_to_alpha,
    sample_vndf_ggx,
)
from gpu_raytracer_tpu.ops.sampling import ONE_OVER_PI, sample_cosine_hemisphere
from gpu_raytracer_tpu.scene.types import MaterialType, ROUGHNESS_CUTOFF

PLASTIC_IOR = 1.5       # reference: BSDF.h:83-84
PLASTIC_ETA = 1.0 / PLASTIC_IOR


class BSDFSample(NamedTuple):
    omega_o: jnp.ndarray          # (R, 3) local
    pdf: jnp.ndarray              # (R,)
    throughput_mul: jnp.ndarray   # (R, 3)
    valid: jnp.ndarray            # (R,) bool
    is_transmission: jnp.ndarray  # (R,) bool


class BSDFEval(NamedTuple):
    value: jnp.ndarray  # (R, 3) BRDF * cos_theta_o
    pdf: jnp.ndarray    # (R,)
    valid: jnp.ndarray  # (R,) bool


def _z(v):
    return v[..., 2]


# ---------------------------------------------------------------------------
# Diffuse (reference BSDF.h:8-65)
# ---------------------------------------------------------------------------

def diffuse_eval(omega_i, omega_o) -> BSDFEval:
    cos_o = _z(omega_o)
    val = jnp.maximum(cos_o, 0.0) * ONE_OVER_PI
    return BSDFEval(jnp.broadcast_to(val[:, None], omega_o.shape),
                    val, cos_o > 0.0)


def diffuse_sample(omega_i, u1, u2) -> BSDFSample:
    omega_o, pdf = sample_cosine_hemisphere(u1, u2)
    R = omega_o.shape[0]
    return BSDFSample(omega_o, pdf, jnp.ones((R, 3), jnp.float32),
                      pdf_is_valid(pdf), jnp.zeros(R, bool))


# ---------------------------------------------------------------------------
# Plastic: GGX coat over energy-conserving diffuse (reference BSDF.h:67-190)
# ---------------------------------------------------------------------------

def _plastic_terms(omega_i, omega_o, omega_m, albedo, alpha):
    F = fresnel_dielectric(jnp.abs(jnp.sum(omega_i * omega_m, axis=-1)), PLASTIC_ETA)
    D = ggx_D(omega_m, alpha, alpha)
    G1 = ggx_G1(omega_i, alpha, alpha)
    G2 = ggx_G2(omega_o, omega_i, omega_m, alpha, alpha)
    z_i = jnp.maximum(_z(omega_i), 1e-6)

    brdf_specular = (F * G2 * D / (4.0 * z_i))[:, None]

    F_i = fresnel_dielectric(_z(omega_i), PLASTIC_ETA)
    F_o = fresnel_dielectric(_z(omega_o), PLASTIC_ETA)
    F_avg = average_fresnel_dielectric(PLASTIC_IOR)
    internal = 1.0 - (1.0 - F_avg) * PLASTIC_ETA * PLASTIC_ETA
    brdf_diffuse = (PLASTIC_ETA * PLASTIC_ETA
                    * ((1.0 - F_i) * (1.0 - F_o) * _z(omega_o) * ONE_OVER_PI)[:, None]
                    * albedo / (1.0 - albedo * internal))

    pdf_specular = G1 * D / (4.0 * z_i)
    pdf_diffuse = jnp.maximum(_z(omega_o), 0.0) * ONE_OVER_PI
    pdf = pdf_diffuse + F_i * (pdf_specular - pdf_diffuse)
    return brdf_specular + brdf_diffuse, pdf, F_i


def plastic_eval(omega_i, omega_o, albedo, roughness) -> BSDFEval:
    alpha = roughness_to_alpha(roughness)
    omega_m = _halfway(omega_i, omega_o)
    value, pdf, _ = _plastic_terms(omega_i, omega_o, omega_m, albedo, alpha)
    return BSDFEval(value, pdf, (_z(omega_o) > 0.0) & pdf_is_valid(pdf))


def plastic_sample(omega_i, albedo, roughness, u_f, u1, u2) -> BSDFSample:
    alpha = roughness_to_alpha(roughness)
    F_i = fresnel_dielectric(_z(omega_i), PLASTIC_ETA)

    omega_m_spec = sample_vndf_ggx(omega_i, alpha, alpha, u1, u2)
    omega_o_spec = reflect_direction(omega_i, omega_m_spec)
    omega_o_diff, _ = sample_cosine_hemisphere(u1, u2)

    pick_spec = u_f < F_i
    omega_o = jnp.where(pick_spec[:, None], omega_o_spec, omega_o_diff)
    omega_m = jnp.where(pick_spec[:, None], omega_m_spec, _halfway(omega_i, omega_o_diff))

    value, pdf, _ = _plastic_terms(omega_i, omega_o, omega_m, albedo, alpha)
    valid = (_z(omega_m) >= 0.0) & (_z(omega_o) > 0.0) & pdf_is_valid(pdf)
    mul = value / jnp.maximum(pdf, 1e-8)[:, None]
    return BSDFSample(omega_o, pdf, mul, valid, jnp.zeros(pdf.shape[0], bool))


def _halfway(omega_i, omega_o):
    m = omega_i + omega_o
    return m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-12)


# ---------------------------------------------------------------------------
# Rough Dielectric with Kulla-Conty multiscatter (reference BSDF.h:192-403)
# ---------------------------------------------------------------------------

def _dielectric_common(luts, ior, roughness, omega_i, entering):
    E_i = kc.dielectric_directional_albedo(luts, ior, roughness, _z(omega_i), entering)
    F_avg = average_fresnel_dielectric(ior)
    F_avg = jnp.where(entering, F_avg, 1.0 - (1.0 - F_avg) / (ior * ior))
    E_avg_enter = kc.dielectric_albedo(luts, ior, roughness,
                                       jnp.ones_like(entering, bool))
    E_avg_leave = kc.dielectric_albedo(luts, ior, roughness,
                                       jnp.zeros_like(entering, bool))
    x = kc.dielectric_reciprocity_factor(E_avg_enter, E_avg_leave)
    ratio = jnp.where(entering, x, 1.0 - x) * (1.0 - F_avg)
    return E_i, ratio, E_avg_enter, E_avg_leave


def _dielectric_lobes(luts, ior, roughness, eta, omega_i, omega_o, omega_m,
                      entering, E_i, ratio, E_avg_enter, E_avg_leave, reflected):
    alpha = roughness_to_alpha(roughness)
    i_dot_m = jnp.abs(jnp.sum(omega_i * omega_m, axis=-1))
    o_dot_m = jnp.abs(jnp.sum(omega_o * omega_m, axis=-1))
    F = fresnel_dielectric(i_dot_m, eta)
    D = ggx_D(omega_m, alpha, alpha)
    G1 = ggx_G1(omega_i, alpha, alpha)
    G2 = ggx_G2(omega_o, omega_i, omega_m, alpha, alpha)
    z_i = jnp.maximum(_z(omega_i), 1e-6)
    abs_z_o = jnp.abs(_z(omega_o))

    # Reflection lobes
    bsdf_single_r = F * G2 * D / (4.0 * z_i)
    pdf_single_r = F * G1 * D / (4.0 * z_i)
    E_o_r = kc.dielectric_directional_albedo(luts, ior, roughness, _z(omega_o), entering)
    E_avg_same = jnp.where(entering, E_avg_enter, E_avg_leave)
    bsdf_multi_r = (1.0 - ratio) * abs_z_o * kc.multiscatter_lobe(E_i, E_o_r, E_avg_same)
    pdf_multi_r = (1.0 - ratio) * abs_z_o * ONE_OVER_PI

    # Transmission lobes
    denom = (eta * i_dot_m + o_dot_m) ** 2
    bsdf_single_t = ((1.0 - F) * G2 * D * i_dot_m * o_dot_m
                     / (z_i * jnp.maximum(denom, 1e-12) * eta * eta))
    pdf_single_t = ((1.0 - F) * G1 * D * i_dot_m * o_dot_m
                    / (z_i * jnp.maximum(denom, 1e-12)))
    E_o_t = kc.dielectric_directional_albedo(luts, ior, roughness, _z(omega_o), ~entering)
    E_avg_inv = jnp.where(entering, E_avg_leave, E_avg_enter)  # NOTE: inverted
    bsdf_multi_t = ratio * abs_z_o * kc.multiscatter_lobe(E_i, E_o_t, E_avg_inv)
    pdf_multi_t = ratio * abs_z_o * ONE_OVER_PI

    bsdf = jnp.where(reflected, bsdf_single_r + bsdf_multi_r,
                     bsdf_single_t + bsdf_multi_t)
    pdf_single = jnp.where(reflected, pdf_single_r, pdf_single_t)
    pdf_multi = jnp.where(reflected, pdf_multi_r, pdf_multi_t)
    pdf = pdf_multi + E_i * (pdf_single - pdf_multi)
    return bsdf, pdf


def dielectric_eval(luts, ior, roughness, omega_i, omega_o, entering) -> BSDFEval:
    eta = jnp.where(entering, 1.0 / ior, ior)
    reflected = _z(omega_o) >= 0.0
    omega_m_r = _halfway(omega_i, omega_o)
    m_t = eta[:, None] * omega_i + omega_o
    omega_m_t = m_t / jnp.maximum(jnp.linalg.norm(m_t, axis=-1, keepdims=True), 1e-12)
    omega_m = jnp.where(reflected[:, None], omega_m_r, omega_m_t)
    omega_m = omega_m * jnp.where(_z(omega_m) >= 0, 1.0, -1.0)[:, None]

    E_i, ratio, E_avg_enter, E_avg_leave = _dielectric_common(
        luts, ior, roughness, omega_i, entering)
    bsdf, pdf = _dielectric_lobes(luts, ior, roughness, eta, omega_i, omega_o,
                                  omega_m, entering, E_i, ratio,
                                  E_avg_enter, E_avg_leave, reflected)
    return BSDFEval(jnp.broadcast_to(bsdf[:, None], omega_o.shape), pdf,
                    pdf_is_valid(pdf))


def dielectric_sample(luts, ior, roughness, omega_i, entering,
                      u_lobe, u_f, u1, u2) -> BSDFSample:
    eta = jnp.where(entering, 1.0 / ior, ior)
    alpha = roughness_to_alpha(roughness)
    E_i, ratio, E_avg_enter, E_avg_leave = _dielectric_common(
        luts, ior, roughness, omega_i, entering)

    # Single-scatter branch: VNDF microfacet, Fresnel choice.
    omega_m_s = sample_vndf_ggx(omega_i, alpha, alpha, u1, u2)
    F_s = fresnel_dielectric(jnp.abs(jnp.sum(omega_i * omega_m_s, axis=-1)), eta)
    refl_s = u_f < F_s
    omega_o_s = jnp.where(refl_s[:, None],
                          reflect_direction(omega_i, omega_m_s),
                          refract_direction(omega_i, omega_m_s, eta))

    # Multi-scatter branch: cosine lobe, ratio choice of hemisphere.
    omega_o_m, _ = sample_cosine_hemisphere(u1, u2)
    refl_m = u_f > ratio
    omega_o_m = omega_o_m * jnp.where(refl_m, 1.0, -1.0)[:, None]
    m_m_r = _halfway(omega_i, omega_o_m)
    m_m_t = eta[:, None] * omega_i + omega_o_m
    m_m_t = m_m_t / jnp.maximum(jnp.linalg.norm(m_m_t, axis=-1, keepdims=True), 1e-12)
    omega_m_m = jnp.where(refl_m[:, None], m_m_r, m_m_t)
    omega_m_m = omega_m_m * jnp.where(_z(omega_m_m) >= 0, 1.0, -1.0)[:, None]

    single = u_lobe < E_i
    omega_m = jnp.where(single[:, None], omega_m_s, omega_m_m)
    omega_o = jnp.where(single[:, None], omega_o_s, omega_o_m)
    reflected = jnp.where(single, refl_s, refl_m)

    hemi_ok = reflected == (_z(omega_o) >= 0.0)
    bsdf, pdf = _dielectric_lobes(luts, ior, roughness, eta, omega_i, omega_o,
                                  omega_m, entering, E_i, ratio,
                                  E_avg_enter, E_avg_leave, reflected)
    valid = hemi_ok & pdf_is_valid(pdf)
    mul = (bsdf / jnp.maximum(pdf, 1e-8))[:, None] * jnp.ones((1, 3), jnp.float32)
    return BSDFSample(omega_o, pdf, mul, valid, ~reflected)


# ---------------------------------------------------------------------------
# Rough Conductor with Kulla-Conty multiscatter (reference BSDF.h:405-525)
# ---------------------------------------------------------------------------

def _conductor_lobes(luts, roughness, eta, k, omega_i, omega_o, omega_m):
    alpha = roughness_to_alpha(roughness)
    o_dot_m = jnp.sum(omega_o * omega_m, axis=-1)
    F = fresnel_conductor(o_dot_m, eta, k)
    D = ggx_D(omega_m, alpha, alpha)
    G1 = ggx_G1(omega_i, alpha, alpha)
    G2 = ggx_G2(omega_o, omega_i, omega_m, alpha, alpha)
    z_i = jnp.maximum(_z(omega_i), 1e-6)

    brdf_single = F * (G2 * D / (4.0 * z_i))[:, None]
    pdf_single = G1 * D / (4.0 * z_i)

    E_i = kc.conductor_directional_albedo(luts, roughness, _z(omega_i))
    E_o = kc.conductor_directional_albedo(luts, roughness, _z(omega_o))
    E_avg = kc.conductor_albedo(luts, roughness)
    F_avg = average_fresnel_conductor(eta, k)
    F_ms = kc.fresnel_multiscatter(F_avg, E_avg)

    z_o = jnp.maximum(_z(omega_o), 0.0)
    brdf_multi = F_ms * (kc.multiscatter_lobe(E_i, E_o, E_avg) * z_o)[:, None]
    pdf_multi = z_o * ONE_OVER_PI

    pdf = pdf_multi + E_i * (pdf_single - pdf_multi)
    return brdf_single + brdf_multi, pdf, o_dot_m, E_i


def conductor_eval(luts, roughness, eta, k, omega_i, omega_o) -> BSDFEval:
    omega_m = _halfway(omega_i, omega_o)
    value, pdf, o_dot_m, _ = _conductor_lobes(luts, roughness, eta, k,
                                              omega_i, omega_o, omega_m)
    valid = (_z(omega_o) > 0.0) & (o_dot_m > 0.0) & pdf_is_valid(pdf)
    return BSDFEval(value, pdf, valid)


def conductor_sample(luts, roughness, eta, k, omega_i, u_lobe, u1, u2) -> BSDFSample:
    alpha = roughness_to_alpha(roughness)
    E_i = kc.conductor_directional_albedo(luts, roughness, _z(omega_i))

    omega_m_s = sample_vndf_ggx(omega_i, alpha, alpha, u1, u2)
    omega_o_s = reflect_direction(omega_i, omega_m_s)
    omega_o_d, _ = sample_cosine_hemisphere(u1, u2)

    single = u_lobe < E_i
    omega_o = jnp.where(single[:, None], omega_o_s, omega_o_d)
    omega_m = jnp.where(single[:, None], omega_m_s, _halfway(omega_i, omega_o_d))

    value, pdf, o_dot_m, _ = _conductor_lobes(luts, roughness, eta, k,
                                              omega_i, omega_o, omega_m)
    valid = (o_dot_m > 0.0) & (_z(omega_o) >= 0.0) & pdf_is_valid(pdf)
    mul = value / jnp.maximum(pdf, 1e-8)[:, None]
    return BSDFSample(omega_o, pdf, mul, valid, jnp.zeros(pdf.shape[0], bool))


# ---------------------------------------------------------------------------
# Dispatch: compute-all-and-select over the material type key
# ---------------------------------------------------------------------------

def allow_nee(mat_type, roughness, mat_types=None):
    """Whether NEE can sample this BSDF (specular cutoff ROUGHNESS_CUTOFF;
    reference: BSDF.h allow_nee + Material.h:5)."""
    if mat_types is not None and not ({int(MaterialType.DIELECTRIC),
                                      int(MaterialType.CONDUCTOR)}
                                     & set(mat_types)):
        return jnp.ones(mat_type.shape, bool)
    smooth = roughness < ROUGHNESS_CUTOFF
    specularish = ((mat_type == int(MaterialType.DIELECTRIC))
                   | (mat_type == int(MaterialType.CONDUCTOR)))
    return ~(specularish & smooth)


def _has(mat_types, mt) -> bool:
    return mat_types is None or int(mt) in mat_types


def bsdf_eval(luts, mat, omega_i, omega_o, albedo, entering,
              mat_types=None) -> BSDFEval:
    """`mat_types`: optional static tuple of MaterialType ints present in the
    scene. Lobes for absent types are never built — on an all-diffuse scene
    (Sponza) this strips the Kulla-Conty LUT gathers and microfacet math of
    the other three lobes from the compiled program (the TPU analog of the
    reference's per-material kernels being launched only for non-empty
    queues, Pathtracer.cu:426-462)."""
    d = diffuse_eval(omega_i, omega_o)
    t = mat["type"]

    # Diffuse eval excludes albedo: the path throughput already folded it in
    # at the hit (reference calc_albedo), while plastic's diffuse lobe owns
    # its albedo internally.
    p = (plastic_eval(omega_i, omega_o, albedo, mat["roughness"])
         if _has(mat_types, MaterialType.PLASTIC) else None)
    g = (dielectric_eval(luts, mat["ior"], mat["roughness"], omega_i, omega_o,
                         entering)
         if _has(mat_types, MaterialType.DIELECTRIC) else None)
    c = (conductor_eval(luts, mat["roughness"], mat["eta"], mat["k"], omega_i,
                        omega_o)
         if _has(mat_types, MaterialType.CONDUCTOR) else None)

    value, pdf, valid = d.value, d.pdf, d.valid
    for mt, lobe in ((MaterialType.PLASTIC, p), (MaterialType.DIELECTRIC, g),
                     (MaterialType.CONDUCTOR, c)):
        if lobe is None:
            continue
        m = t == int(mt)
        value = jnp.where(m[:, None], lobe.value, value)
        pdf = jnp.where(m, lobe.pdf, pdf)
        valid = jnp.where(m, lobe.valid, valid)
    return BSDFEval(value, pdf, valid)


def bsdf_sample(luts, mat, omega_i, albedo, entering,
                u_f0, u_f1, u_b0, u_b1, mat_types=None) -> BSDFSample:
    d = diffuse_sample(omega_i, u_b0, u_b1)
    p = (plastic_sample(omega_i, albedo, mat["roughness"], u_f0, u_b0, u_b1)
         if _has(mat_types, MaterialType.PLASTIC) else None)
    g = (dielectric_sample(luts, mat["ior"], mat["roughness"], omega_i,
                           entering, u_f0, u_f1, u_b0, u_b1)
         if _has(mat_types, MaterialType.DIELECTRIC) else None)
    c = (conductor_sample(luts, mat["roughness"], mat["eta"], mat["k"],
                          omega_i, u_f0, u_b0, u_b1)
         if _has(mat_types, MaterialType.CONDUCTOR) else None)
    t = mat["type"]

    out = d
    for mt, lobe in ((MaterialType.PLASTIC, p), (MaterialType.DIELECTRIC, g),
                     (MaterialType.CONDUCTOR, c)):
        if lobe is None:
            continue
        m = t == int(mt)
        mv = m[:, None]
        out = BSDFSample(
            omega_o=jnp.where(mv, lobe.omega_o, out.omega_o),
            pdf=jnp.where(m, lobe.pdf, out.pdf),
            throughput_mul=jnp.where(mv, lobe.throughput_mul,
                                     out.throughput_mul),
            valid=jnp.where(m, lobe.valid, out.valid),
            is_transmission=jnp.where(m, lobe.is_transmission,
                                      out.is_transmission),
        )
    return out
