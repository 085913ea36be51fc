"""Kulla-Conty multiple-scattering energy compensation
(reference: Src/CUDA/KullaConty.h + host driver Pathtracer.cpp:182-245).

The reference bakes six LUTs on the GPU at startup with per-entry Monte-Carlo
loops (100k sequential samples per thread). Here the bake is one jitted JAX
program: all table entries X a sample chunk are evaluated as a single
vectorized batch and reduced with `lax.fori_loop` over chunks — the
TPU-native formulation of the same integral. Tables are cached to disk keyed
by (dims, sample count).

LUT semantics match the reference exactly:
  * dielectric directional albedo E(ior, roughness, cos_theta) for entering
    (eta = 1/ior) and leaving (eta = ior) rays — 16^3 each
  * dielectric average albedo E_avg(ior, roughness) = 2 int E(mu) mu dmu — 16^2
  * conductor directional albedo E(roughness, cos_theta) (Fresnel excluded)
    — 32^2, and its cosine-weighted average — 32
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from gpu_raytracer_tpu.config import (
    LUT_CONDUCTOR_DIM_COS_THETA,
    LUT_CONDUCTOR_DIM_ROUGHNESS,
    LUT_DIELECTRIC_DIM_COS_THETA,
    LUT_DIELECTRIC_DIM_IOR,
    LUT_DIELECTRIC_DIM_ROUGHNESS,
)
from gpu_raytracer_tpu.ops import rng
from gpu_raytracer_tpu.ops.microfacet import (
    fresnel_dielectric,
    ggx_D,
    ggx_G1,
    ggx_G2,
    pdf_is_valid,
    reflect_direction,
    refract_direction,
    roughness_to_alpha,
    safe_sqrt,
    sample_vndf_ggx,
)

LUT_DIELECTRIC_MIN_IOR = 1.0001  # reference: Common.h:92-93
LUT_DIELECTRIC_MAX_IOR = 2.5

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".cache")


def _grid_centers(dim):
    return ((np.arange(dim, dtype=np.float32) + 0.5) / dim).astype(np.float32)


def _dielectric_grid():
    ior = LUT_DIELECTRIC_MIN_IOR + _grid_centers(LUT_DIELECTRIC_DIM_IOR) * (
        LUT_DIELECTRIC_MAX_IOR - LUT_DIELECTRIC_MIN_IOR)
    rough = _grid_centers(LUT_DIELECTRIC_DIM_ROUGHNESS)
    cos = _grid_centers(LUT_DIELECTRIC_DIM_COS_THETA)
    return ior, rough, cos


def _sample_u(entry_ids, dim, chunk_base, s):
    return rng.random_float(dim, entry_ids, 0, chunk_base + s, seed=7)


@partial(jax.jit, static_argnames=("entering", "num_samples"))
def _bake_dielectric_directional(entering: bool, num_samples: int):
    """E x (ior, roughness, cos_theta) grid — weight = G2/G1 of a VNDF sample
    (reference: kernel_integrate_dielectric, KullaConty.h:83-150)."""
    ior_g, rough_g, cos_g = _dielectric_grid()
    ior, rough, cos = [jnp.asarray(a.reshape(s), jnp.float32) for a, s in (
        (np.tile(ior_g, LUT_DIELECTRIC_DIM_ROUGHNESS * LUT_DIELECTRIC_DIM_COS_THETA), (-1,)),
        (np.tile(np.repeat(rough_g, LUT_DIELECTRIC_DIM_IOR), LUT_DIELECTRIC_DIM_COS_THETA), (-1,)),
        (np.repeat(cos_g, LUT_DIELECTRIC_DIM_IOR * LUT_DIELECTRIC_DIM_ROUGHNESS), (-1,)),
    )]
    E = ior.shape[0]
    entry_ids = jnp.arange(E, dtype=jnp.int32)
    eta = 1.0 / ior if entering else ior
    alpha = roughness_to_alpha(rough)
    sin = safe_sqrt(1.0 - cos * cos)
    omega_i = jnp.stack([sin, jnp.zeros_like(sin), cos], axis=-1)

    def one_sample(s):
        u_f = _sample_u(entry_ids, 0, 0, 3 * s)
        u_1 = _sample_u(entry_ids, 1, 0, 3 * s + 1)
        u_2 = _sample_u(entry_ids, 2, 0, 3 * s + 2)
        omega_m = sample_vndf_ggx(omega_i, alpha, alpha, u_1, u_2)
        i_dot_m = jnp.abs(jnp.sum(omega_i * omega_m, axis=-1))
        F = fresnel_dielectric(i_dot_m, eta)
        reflected = u_f < F
        omega_r = reflect_direction(omega_i, omega_m)
        omega_t = refract_direction(omega_i, omega_m, eta)
        omega_o = jnp.where(reflected[:, None], omega_r, omega_t)
        hemi_ok = reflected == (omega_o[..., 2] >= 0.0)

        D = ggx_D(omega_m, alpha, alpha)
        G1 = ggx_G1(omega_i, alpha, alpha)
        G2 = ggx_G2(omega_o, omega_i, omega_m, alpha, alpha)
        o_dot_m = jnp.abs(jnp.sum(omega_o * omega_m, axis=-1))
        pdf_r = F * G1 * D / (4.0 * omega_i[..., 2])
        pdf_t = ((1.0 - F) * G1 * D * i_dot_m * o_dot_m
                 / (omega_i[..., 2] * (eta * i_dot_m + o_dot_m) ** 2))
        pdf = jnp.where(reflected, pdf_r, pdf_t)
        weight = G2 / jnp.maximum(G1, 1e-8)
        return jnp.where(hemi_ok & pdf_is_valid(pdf), weight, 0.0)

    def body(s, acc):
        return acc + one_sample(s)

    total = jax.lax.fori_loop(0, num_samples, body, jnp.zeros(E, jnp.float32))
    table = (total / num_samples).reshape(
        LUT_DIELECTRIC_DIM_COS_THETA, LUT_DIELECTRIC_DIM_ROUGHNESS,
        LUT_DIELECTRIC_DIM_IOR).transpose(2, 1, 0)
    return jnp.clip(table, 0.0, 1.0)  # (IOR, ROUGH, COS)


@partial(jax.jit, static_argnames=("num_samples",))
def _bake_conductor_directional(num_samples: int):
    """reference: kernel_integrate_conductor (Fresnel excluded)."""
    rough_g = _grid_centers(LUT_CONDUCTOR_DIM_ROUGHNESS)
    cos_g = _grid_centers(LUT_CONDUCTOR_DIM_COS_THETA)
    rough = jnp.asarray(np.tile(rough_g, LUT_CONDUCTOR_DIM_COS_THETA))
    cos = jnp.asarray(np.repeat(cos_g, LUT_CONDUCTOR_DIM_ROUGHNESS))
    E = rough.shape[0]
    entry_ids = jnp.arange(E, dtype=jnp.int32)
    alpha = roughness_to_alpha(rough)
    sin = safe_sqrt(1.0 - cos * cos)
    omega_i = jnp.stack([sin, jnp.zeros_like(sin), cos], axis=-1)

    def one_sample(s):
        u_1 = _sample_u(entry_ids, 4, 0, 2 * s)
        u_2 = _sample_u(entry_ids, 5, 0, 2 * s + 1)
        omega_m = sample_vndf_ggx(omega_i, alpha, alpha, u_1, u_2)
        omega_o = reflect_direction(omega_i, omega_m)
        ok = (jnp.sum(omega_o * omega_m, axis=-1) > 0.0) & (omega_o[..., 2] > 0.0)
        D = ggx_D(omega_m, alpha, alpha)
        G1 = ggx_G1(omega_i, alpha, alpha)
        G2 = ggx_G2(omega_o, omega_i, omega_m, alpha, alpha)
        pdf = G1 * D / (4.0 * omega_i[..., 2])
        return jnp.where(ok & pdf_is_valid(pdf), G2 / jnp.maximum(G1, 1e-8), 0.0)

    total = jax.lax.fori_loop(0, num_samples, lambda s, acc: acc + one_sample(s),
                              jnp.zeros(E, jnp.float32))
    table = (total / num_samples).reshape(
        LUT_CONDUCTOR_DIM_COS_THETA, LUT_CONDUCTOR_DIM_ROUGHNESS).T
    return jnp.clip(table, 0.0, 1.0)  # (ROUGH, COS)


def _average_over_cos(directional, cos_centers):
    """E_avg = 2 int_0^1 E(mu) mu dmu (reference: kernel_average_*)."""
    w = jnp.asarray(cos_centers, jnp.float32)
    return 2.0 * jnp.mean(directional * w, axis=-1)


def bake_luts(num_samples: int = 16384) -> dict:
    """Bake (or load cached) all six tables. Returns a dict of jnp arrays."""
    cache = os.path.join(_CACHE_DIR, f"kulla_conty_s{num_samples}.npz")
    if os.path.exists(cache):
        data = np.load(cache)
        out = {k: jnp.asarray(data[k]) for k in data.files}
        out["tag"] = jnp.float32(num_samples)
        return out

    die_enter = _bake_dielectric_directional(True, num_samples)
    die_leave = _bake_dielectric_directional(False, num_samples)
    con_dir = _bake_conductor_directional(num_samples)
    cos_die = _grid_centers(LUT_DIELECTRIC_DIM_COS_THETA)
    cos_con = _grid_centers(LUT_CONDUCTOR_DIM_COS_THETA)
    luts = {
        "dielectric_dir_enter": die_enter,
        "dielectric_dir_leave": die_leave,
        "dielectric_avg_enter": _average_over_cos(die_enter, cos_die),
        "dielectric_avg_leave": _average_over_cos(die_leave, cos_die),
        "conductor_dir": con_dir,
        "conductor_avg": _average_over_cos(con_dir, cos_con),
    }
    os.makedirs(_CACHE_DIR, exist_ok=True)
    np.savez(cache, **{k: np.asarray(v) for k, v in luts.items()})
    luts["tag"] = jnp.float32(num_samples)
    return luts


def placeholder_luts() -> dict:
    """Energy-complete tables (E == 1 everywhere): disables multiscatter
    compensation, for scenes with no dielectric/conductor materials."""
    ones3 = jnp.ones((LUT_DIELECTRIC_DIM_IOR, LUT_DIELECTRIC_DIM_ROUGHNESS,
                      LUT_DIELECTRIC_DIM_COS_THETA), jnp.float32)
    ones2 = jnp.ones((LUT_DIELECTRIC_DIM_IOR, LUT_DIELECTRIC_DIM_ROUGHNESS), jnp.float32)
    return {
        "dielectric_dir_enter": ones3,
        "dielectric_dir_leave": ones3,
        "dielectric_avg_enter": ones2,
        "dielectric_avg_leave": ones2,
        "conductor_dir": jnp.ones((LUT_CONDUCTOR_DIM_ROUGHNESS,
                                   LUT_CONDUCTOR_DIM_COS_THETA), jnp.float32),
        "conductor_avg": jnp.ones(LUT_CONDUCTOR_DIM_ROUGHNESS, jnp.float32),
        "tag": jnp.float32(-1.0),
    }


# ---------------------------------------------------------------------------
# Lookups (linear filtering with half-texel centers, like the CUDA textures)
# ---------------------------------------------------------------------------

def _normalize_ior(ior):
    return jnp.clip((ior - LUT_DIELECTRIC_MIN_IOR)
                    / (LUT_DIELECTRIC_MAX_IOR - LUT_DIELECTRIC_MIN_IOR), 0.0, 1.0)


def _axis_coords(coord, dim):
    x = jnp.clip(coord * dim - 0.5, 0.0, dim - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    return x0, jnp.minimum(x0 + 1, dim - 1), x - x0


def _trilinear(table, u, v, w):
    """table: (I, Ro, C) shared; u/v/w: (R,) normalized coords."""
    I, Ro, C = table.shape
    u0, u1, fu = _axis_coords(u, I)
    v0, v1, fv = _axis_coords(v, Ro)
    w0, w1, fw = _axis_coords(w, C)

    def g(i, j, k):
        return table[i, j, k]

    c00 = g(u0, v0, w0) * (1 - fu) + g(u1, v0, w0) * fu
    c01 = g(u0, v0, w1) * (1 - fu) + g(u1, v0, w1) * fu
    c10 = g(u0, v1, w0) * (1 - fu) + g(u1, v1, w0) * fu
    c11 = g(u0, v1, w1) * (1 - fu) + g(u1, v1, w1) * fu
    c0 = c00 * (1 - fv) + c10 * fv
    c1 = c01 * (1 - fv) + c11 * fv
    return c0 * (1 - fw) + c1 * fw


def _bilinear(table, u, v):
    I, Ro = table.shape
    u0, u1, fu = _axis_coords(u, I)
    v0, v1, fv = _axis_coords(v, Ro)
    c0 = table[u0, v0] * (1 - fu) + table[u1, v0] * fu
    c1 = table[u0, v1] * (1 - fu) + table[u1, v1] * fu
    return c0 * (1 - fv) + c1 * fv


def dielectric_directional_albedo(luts, ior, roughness, cos_theta, entering):
    """entering: (R,) bool (reference: KullaConty.h:16-24)."""
    u = _normalize_ior(ior)
    v = jnp.clip(roughness, 0.0, 1.0)
    w = jnp.abs(cos_theta)
    return jnp.where(entering,
                     _trilinear(luts["dielectric_dir_enter"], u, v, w),
                     _trilinear(luts["dielectric_dir_leave"], u, v, w))


def dielectric_albedo(luts, ior, roughness, entering):
    u = _normalize_ior(ior)
    v = jnp.clip(roughness, 0.0, 1.0)
    return jnp.where(entering,
                     _bilinear(luts["dielectric_avg_enter"], u, v),
                     _bilinear(luts["dielectric_avg_leave"], u, v))


def conductor_directional_albedo(luts, roughness, cos_theta):
    return _bilinear(luts["conductor_dir"], jnp.clip(roughness, 0.0, 1.0),
                     jnp.abs(cos_theta))


def conductor_albedo(luts, roughness):
    table = luts["conductor_avg"]
    x0, x1, f = _axis_coords(jnp.clip(roughness, 0.0, 1.0), table.shape[0])
    return table[x0] * (1 - f) + table[x1] * f


def fresnel_multiscatter(F_avg, E_avg):
    """reference: KullaConty.h:12-14."""
    if F_avg.ndim > E_avg.ndim:
        E_avg = E_avg[..., None]
    return F_avg * F_avg * E_avg / (1.0 - F_avg * (1.0 - E_avg))


def multiscatter_lobe(E_i, E_o, E_avg):
    """reference: KullaConty.h:46-49."""
    return (1.0 - E_i) * (1.0 - E_o) / jnp.maximum(1e-4, jnp.pi * (1.0 - E_avg))


def dielectric_reciprocity_factor(E_avg_enter, E_avg_leave):
    """reference: KullaConty.h:51-66."""
    return (1.0 - E_avg_leave) / jnp.maximum(1e-4, 2.0 - E_avg_enter - E_avg_leave)


def bake_material_curves(luts, mats: dict) -> "np.ndarray":
    """Per-MATERIAL Kulla-Conty shading constants for the fused Pallas shade
    kernel (ops/pallas_shade.py): each material's (ior, roughness) is fixed,
    so the directional-albedo LUT slices reduce to 1D cos curves — fitted
    here as degree-7 polynomials of |cos| so the kernel evaluates them with
    8 FMAs and ZERO gathers. The fit targets the same trilinear LUT
    interpolation the XLA path uses (max fit error ~1e-3 on the smooth
    albedo curves).

    Layout (32, M) f32:
      [0:8]   dielectric E_enter(cos) poly (Horner, c7..c0)
      [8:16]  dielectric E_leave(cos) poly
      [16:24] conductor  E(cos) poly
      [24]    E_avg_enter     [25] E_avg_leave
      [26]    ratio_enter     [27] ratio_leave   (KC lobe-pick ratios)
      [28:31] conductor F_ms rgb                 [31] conductor E_avg
    """
    from gpu_raytracer_tpu.ops.microfacet import (
        average_fresnel_conductor,
        average_fresnel_dielectric,
    )
    from gpu_raytracer_tpu.scene.types import MaterialType

    M = int(np.asarray(mats["type"]).shape[0])
    mtype = np.asarray(mats["type"], np.int32)
    ior = np.asarray(mats["ior"], np.float32)
    rough = np.asarray(mats["roughness"], np.float32)
    eta = np.asarray(mats["eta"], np.float32)
    k = np.asarray(mats["k"], np.float32)

    # Disk cache: each curve column is a pure function of (type, ior,
    # roughness, eta, k) and the LUT sample count — the bake itself is ~10
    # device round-trips per material, which dominates scene build time on
    # slow device links (round-4 profile: 80 s of a Sponza build).
    import hashlib
    import os

    lut_tag = int(luts["dielectric_dir_enter"].shape[0] * 1000
                  + luts["dielectric_dir_enter"].shape[1])
    samples = float(np.asarray(luts.get("tag", 0.0)))
    key = hashlib.sha1(np.concatenate(
        [mtype.astype(np.float32), ior, rough, eta.ravel(), k.ravel(),
         np.float32([lut_tag, samples, _CURVES_VERSION])]).tobytes()
    ).hexdigest()[:20]
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".cache")
    cache_path = os.path.join(cache_dir, f"kc_curves_{key}.npz")
    if os.path.exists(cache_path):
        try:
            return np.load(cache_path)["curves"]
        except Exception:
            pass

    out = np.zeros((32, M), np.float32)
    cos = np.linspace(1e-3, 1.0, 64, dtype=np.float32)

    # Only PLASTIC/DIELECTRIC/CONDUCTOR lanes ever read their KC column in
    # the fused kernels (diffuse/light lanes mask the math off), so other
    # types keep zero columns and skip the bake round-trips entirely.
    needs_kc = {int(MaterialType.PLASTIC), int(MaterialType.DIELECTRIC),
                int(MaterialType.CONDUCTOR)}
    for m in range(M):
        if int(mtype[m]) not in needs_kc:
            continue
        i = jnp.full(64, ior[m])
        r = jnp.full(64, rough[m])
        e_enter = np.asarray(dielectric_directional_albedo(
            luts, i, r, jnp.asarray(cos), jnp.ones(64, bool)))
        e_leave = np.asarray(dielectric_directional_albedo(
            luts, i, r, jnp.asarray(cos), jnp.zeros(64, bool)))
        e_con = np.asarray(conductor_directional_albedo(
            luts, r, jnp.asarray(cos)))
        out[0:8, m] = np.polyfit(cos, e_enter, 7)
        out[8:16, m] = np.polyfit(cos, e_leave, 7)
        out[16:24, m] = np.polyfit(cos, e_con, 7)

        e_avg_en = float(dielectric_albedo(luts, jnp.float32(ior[m]),
                                           jnp.float32(rough[m]),
                                           jnp.asarray(True)))
        e_avg_lv = float(dielectric_albedo(luts, jnp.float32(ior[m]),
                                           jnp.float32(rough[m]),
                                           jnp.asarray(False)))
        out[24, m] = e_avg_en
        out[25, m] = e_avg_lv
        x = float(dielectric_reciprocity_factor(np.float32(e_avg_en),
                                                np.float32(e_avg_lv)))
        f_avg = float(average_fresnel_dielectric(ior[m]))
        f_avg_lv = 1.0 - (1.0 - f_avg) / max(ior[m] * ior[m], 1e-8)
        out[26, m] = x * (1.0 - f_avg)
        out[27, m] = (1.0 - x) * (1.0 - f_avg_lv)

        e_avg_con = float(conductor_albedo(luts, jnp.float32(rough[m])))
        f_avg_con = np.asarray(average_fresnel_conductor(
            jnp.asarray(eta[m][None]), jnp.asarray(k[m][None])))[0]
        f_ms = f_avg_con * f_avg_con * e_avg_con / np.maximum(
            1.0 - f_avg_con * (1.0 - e_avg_con), 1e-6)
        out[28:31, m] = f_ms
        out[31, m] = e_avg_con

    try:
        os.makedirs(cache_dir, exist_ok=True)
        np.savez(cache_path, curves=out)
    except OSError:
        pass
    return out


# Bump to invalidate cached kc_curves_*.npz entries on layout changes.
_CURVES_VERSION = 1
