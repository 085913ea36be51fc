"""Wavefront path tracer (reference: Src/Renderer/Integrators/Pathtracer.{h,
cpp} + Src/CUDA/Pathtracer.cu — re-designed for XLA).

The CUDA reference splits each bounce into generate / trace / sort /
material_* / trace_shadow kernels communicating through atomic global-memory
queues. Here one jitted `render_wave` contains the whole sample: a Python
bounce loop unrolled at trace time (num_bounces is static in GPUConfig), each
bounce doing trace -> shade -> NEE shadow trace on the full wavefront with
alive masks. XLA fuses the shading math between the two traversal while-loops;
queue compaction is deliberately absent: the TPU VPU is lockstep with no warp
scheduler, so the reference's material-sorted queues (SURVEY.md §2.10) buy
nothing — every lane evaluates the compute-all-select BSDF in the same
instruction stream either way, and a per-bounce sort would cost more than the
selects it saves.

Invalidation flags drive selective re-upload exactly like the reference's
Integrator::update (Integrator.cpp:432-528): scene edits rebuild buffers,
camera moves only refresh the small camera pytree, GPUConfig changes re-jit
via static-arg dispatch.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from gpu_raytracer_tpu.config import CPUConfig, GPUConfig, Invalidation
from gpu_raytracer_tpu.ops import rng
from gpu_raytracer_tpu.ops import bsdf as bsdf_lib
from gpu_raytracer_tpu.ops.buffers import build_scene_buffers
from gpu_raytracer_tpu.ops.camera_rays import generate_primary_rays
from gpu_raytracer_tpu.ops.sampling import (
    local_to_world,
    luminance,
    normalize,
    orthonormal_basis,
    power_heuristic,
    sample_triangle_barycentric,
    searchsorted_cdf,
    world_to_local,
)
from gpu_raytracer_tpu.ops.sky_ops import sample_sky
from gpu_raytracer_tpu.ops.traverse import trace_any_tlas, trace_closest_tlas
from gpu_raytracer_tpu.ops.pallas_traverse import trace_any_pallas, trace_closest_pallas
from gpu_raytracer_tpu.ops.pallas_wide import trace_any_wide, trace_closest_wide
from gpu_raytracer_tpu.scene.scene import Scene
from gpu_raytracer_tpu.scene.types import MaterialType

EPSILON = jnp.float32(1e-4)  # ray-origin offset (reference: Common.h:75)
INF = jnp.float32(jnp.inf)


def _offset_origin(point, direction, geometric_normal):
    """reference: Src/CUDA/Raytracing/Ray.h:16-18."""
    sign = jnp.where(jnp.sum(direction * geometric_normal, axis=-1, keepdims=True) >= 0,
                     1.0, -1.0)
    return point + sign * EPSILON * geometric_normal


def _affine_point(cols, idx, v):
    """cols: (12, I) component-major affine table; idx: (R,); v: (R, 3)."""
    from gpu_raytracer_tpu.ops.vec import affine12_point

    out = affine12_point(cols, idx, (v[..., 0], v[..., 1], v[..., 2]))
    return jnp.stack(out, axis=-1)


def _affine_dir(cols, idx, v):
    from gpu_raytracer_tpu.ops.vec import affine12_dir

    out = affine12_dir(cols, idx, (v[..., 0], v[..., 1], v[..., 2]))
    return jnp.stack(out, axis=-1)


def _affine_normal(inv_cols, idx, n):
    """Inverse-transpose transform: n'_j = sum_i inv[i, j] * n_i."""
    m = [inv_cols[j][idx] for j in range(12)]
    x, y, z = n[..., 0], n[..., 1], n[..., 2]
    return normalize(jnp.stack([
        m[0] * x + m[4] * y + m[8] * z,
        m[1] * x + m[5] * y + m[9] * z,
        m[2] * x + m[6] * y + m[10] * z,
    ], axis=-1))


def _affine_point_rows(m, v):
    """m: (R, 12) per-lane affine rows; v: (R, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack([
        m[:, 0] * x + m[:, 1] * y + m[:, 2] * z + m[:, 3],
        m[:, 4] * x + m[:, 5] * y + m[:, 6] * z + m[:, 7],
        m[:, 8] * x + m[:, 9] * y + m[:, 10] * z + m[:, 11],
    ], axis=-1)


def _affine_dir_rows(m, v):
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack([
        m[:, 0] * x + m[:, 1] * y + m[:, 2] * z,
        m[:, 4] * x + m[:, 5] * y + m[:, 6] * z,
        m[:, 8] * x + m[:, 9] * y + m[:, 10] * z,
    ], axis=-1)


def _affine_normal_rows(inv_m, n):
    """Inverse-transpose transform from per-lane INVERSE rows (R, 12)."""
    x, y, z = n[..., 0], n[..., 1], n[..., 2]
    return normalize(jnp.stack([
        inv_m[:, 0] * x + inv_m[:, 4] * y + inv_m[:, 8] * z,
        inv_m[:, 1] * x + inv_m[:, 5] * y + inv_m[:, 9] * z,
        inv_m[:, 2] * x + inv_m[:, 6] * y + inv_m[:, 10] * z,
    ], axis=-1))


def _interpolate_hit(tris, irow, hit):
    """Reconstruct position/normal/uv from barycentrics in object space and
    transform into world space with the hit instance's matrices (reference:
    Pathtracer.cu:596-650 shade_material hit reconstruction).

    All per-triangle attributes come from ONE (T, 32) row gather
    (buffers.py "shade_rows") and the transforms from the pre-fetched
    per-lane instance rows `irow`: TPU gathers pay HBM latency per start,
    not per byte, so wide-row fetches beat per-column gathers ~10x
    (ops/vec.py fetch_rows)."""
    u = hit.u[:, None]
    v = hit.v[:, None]
    rows = tris["shade_rows"][jnp.maximum(hit.tri, 0)]  # (R, 32)
    p0, e1, e2 = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9]
    n0, n1, n2 = rows[:, 9:12], rows[:, 12:15], rows[:, 15:18]
    uv0, uv1, uv2 = rows[:, 18:20], rows[:, 20:22], rows[:, 22:24]

    p_obj = p0 + u * e1 + v * e2
    point = _affine_point_rows(irow[:, 0:12], p_obj)

    geom_n = _affine_normal_rows(irow[:, 12:24], jnp.cross(e1, e2))
    shading_n = _affine_normal_rows(irow[:, 12:24],
                                    (1.0 - u - v) * n0 + u * n1 + v * n2)
    uv = (1.0 - u - v) * uv0 + u * uv1 + v * uv2
    return point, geom_n, shading_n, uv, p_obj, e1, e2


@functools.partial(jax.jit,
                   static_argnames=("config", "width", "seed", "has_lights",
                                    "with_stats", "has_textures", "with_aovs",
                                    "has_media", "use_pallas",
                                    "use_pallas_shade", "use_wide",
                                    "use_gather_shade", "use_stream",
                                    "mat_types", "compact_tiers"))
def render_wave(buffers: dict, camera: dict, pixel_index: jnp.ndarray,
                sample_index, config: GPUConfig, width: int, seed: int = 0,
                has_lights: bool = True, with_stats: bool = False,
                has_textures: bool = False, with_aovs: bool = False,
                has_media: bool = False, use_pallas: bool = False,
                use_pallas_shade: bool = False, use_wide: bool = False,
                use_gather_shade: bool = False, use_stream: bool = False,
                valid_mask=None, mat_types=None, compact_tiers=()):
    """Trace one sample for one wave of pixels. Returns (R, 3) radiance.

    The whole per-sample pipeline of the reference's render() loop
    (Pathtracer.cpp:738-855) in one XLA program.
    """
    R = pixel_index.shape[0]
    nodes, tris = buffers["nodes"], buffers["tris"]
    instances = buffers["instances"]
    materials = buffers["materials"]
    lights = buffers["lights"]
    nee_possible = config.enable_nee and has_lights

    # num_bounces <= 12 keeps every sampler dim inside the 64 PMJ sequences
    # (dim_total = dim + 5*bounce < 64), so the PMJ pair is wave-constant
    # and the big seq gathers collapse to scalars (pmj.pmj_random2).
    draw2 = rng.make_draw2(buffers.get("sampler"), width, seed, config.sampler,
                           scalar_tables=config.num_bounces <= 12)
    # Under SVGF/TAA the per-pixel filter jitter is replaced by a
    # FRAME-CONSTANT Halton point cycling with the frame index — TAA's
    # neighborhood clamp is designed around whole-frame jitter (reference:
    # Camera.h:26-29, taa_halton_{x,y} tables indexed sample_index & 3).
    jitter_override = None
    if config.enable_svgf:
        hs = jnp.asarray(sample_index, jnp.int32) & 3
        jitter_override = jnp.stack([
            jnp.asarray([0.3, 0.7, 0.2, 0.8], jnp.float32)[hs],
            jnp.asarray([0.2, 0.8, 0.7, 0.3], jnp.float32)[hs]])
    ray_o, ray_d = generate_primary_rays(
        camera, pixel_index, width, sample_index, config.reconstruction_filter,
        seed, jitter_override=jitter_override, draw2=draw2)

    radiance = jnp.zeros((R, 3), jnp.float32)
    throughput = jnp.ones((R, 3), jnp.float32)
    # valid_mask kills tail-wave padding lanes (clamped duplicate pixels)
    # before any ray is traced — shapes stay static, no recompile.
    alive = jnp.ones(R, bool) if valid_mask is None else valid_mask
    del valid_mask
    prev_allow_nee = jnp.zeros(R, bool)  # primary rays: emissive hits count fully
    last_pdf = jnp.ones(R, jnp.float32)
    # AOV values (reference: Src/CUDA/AOV.h; direct = emission reaching
    # the camera through <= 1 scattering event, the reference's bounce<=1 rule
    # for emissive hits and bounce==0 rule for NEE shadow rays). When SVGF
    # demodulation is on, the primary albedo is divided back out of the path
    # (reference: calc_albedo skips the throughput multiply at bounce 0).
    # Everything except `direct` is written ONLY at bounce 0, which is PEELED
    # out of the bounce while_loop (see below) — the G-buffer arrays never
    # enter the loop carry, and the peeled call sees a STATIC first flag.
    demodulate = with_aovs and config.enable_svgf and config.modulate_albedo
    direct = jnp.zeros((R, 3), jnp.float32)
    # Russian-roulette albedo correction for the demodulated path: the
    # primary albedo is NOT folded into throughput (it is divided back out
    # for SVGF), so survival must be computed against throughput*albedo or
    # RR systematically over-survives — the reference passes
    # `throughput * albedo` to russian_roulette exactly for this case
    # (Pathtracer.cu:199-218). Measured: 1978 -> ~1400 ms on a Sponza
    # 960x544 3-bounce denoised sample.
    rr_albedo = jnp.ones((R, 3), jnp.float32) if demodulate else None
    rays_traced = jnp.zeros((), jnp.float32)  # primary+bounce+shadow ray count
    # Ray cones for texture LOD (reference: Src/CUDA/RayCone.h; angle starts
    # at the camera's per-pixel spread, width grows by angle*t per segment).
    cone_angle = jnp.broadcast_to(camera["pixel_spread_angle"], (R,))
    cone_width = jnp.zeros(R, jnp.float32)
    medium_id = jnp.full(R, -1, jnp.int32)  # current homogeneous medium

    def fast_bounce_body(bounce, carry):
        """Fused Pallas shade path: full 4-BSDF dispatch in-kernel (no
        AOVs, media or textures — gated by _pack_pallas_shade). Mirrors
        the XLA bounce body below; see ops/pallas_shade.py."""
        from gpu_raytracer_tpu.ops.pallas_shade import shade_diffuse_pallas

        (ray_o, ray_d, radiance, throughput, alive, prev_allow_nee, last_pdf,
         medium_id, cone_width, direct, rays_traced, *_tail) = carry

        rays_traced = rays_traced + jnp.sum(alive)
        hit = trace_closest_pallas(*buffers["pallas"], ray_o, ray_d,
                                   jnp.where(alive, INF, jnp.float32(0.0)))

        params = jnp.zeros(48, jnp.float32)
        params = params.at[0].set(bounce.astype(jnp.float32))
        params = params.at[1].set(jnp.float32(config.num_bounces))
        sky_rgb = buffers["sky"][0, 0] * buffers["sky_scale"]
        params = params.at[2:5].set(sky_rgb)
        params = params.at[5].set(lights["total_weight"])
        params = params.at[6].set(jnp.asarray(sample_index, jnp.float32))
        # Per-draw-site sampler scalars for the in-kernel sampler (the PMJ
        # pair for a (dim, bounce, sample) triple is wave-wide constant).
        sampler = buffers["sampler"]
        s_u = jnp.asarray(sample_index, jnp.uint32)
        bounce_u = bounce.astype(jnp.uint32)
        from gpu_raytracer_tpu.config import (
            PMJ_NUM_SAMPLES_PER_SEQUENCE as _PMJ_N,
            PMJ_NUM_SEQUENCES as _PMJ_S,
            BLUE_NOISE_NUM_TEXTURES as _BN_T,
        )

        for site, dim in enumerate((rng.SampleDimension.RUSSIAN_ROULETTE,
                                    rng.SampleDimension.NEE_LIGHT,
                                    rng.SampleDimension.NEE_TRIANGLE,
                                    rng.SampleDimension.BSDF_0,
                                    rng.SampleDimension.BSDF_1)):
            dim_total = (jnp.uint32(int(dim))
                         + jnp.uint32(int(rng.SampleDimension.NUM_BOUNCE))
                         * bounce_u)
            flat = ((dim_total % _PMJ_S) * _PMJ_N
                    + jnp.minimum(s_u, _PMJ_N - 1)).astype(jnp.int32)
            b = 16 + site * 4
            params = params.at[b].set(sampler["seq_x"][flat])
            params = params.at[b + 1].set(sampler["seq_y"][flat])
            params = params.at[b + 2].set((dim_total % _BN_T).astype(jnp.float32))
            params = params.at[b + 3].set((s_u < _PMJ_N).astype(jnp.float32))

        out = shade_diffuse_pallas(
            buffers["pallas_shade"], sampler, params, hit, ray_o, ray_d,
            throughput, alive, prev_allow_nee, last_pdf, pixel_index, width,
            enable_nee=nee_possible, enable_mis=config.enable_mis,
            enable_rr=config.enable_russian_roulette)

        radiance = radiance + out["radiance_add"]
        if nee_possible:
            want = out["shadow_tmax"] > 0.0
            rays_traced = rays_traced + jnp.sum(want)
            occluded = trace_any_pallas(*buffers["pallas"], out["shadow_o"],
                                        out["shadow_d"], out["shadow_tmax"])
            radiance = radiance + jnp.where((want & ~occluded)[:, None],
                                            out["illumination"], 0.0)
        return (out["ray_o"], out["ray_d"], radiance, out["throughput"],
                out["alive"], out["prev_allow_nee"], out["last_pdf"],
                medium_id, cone_width, direct, rays_traced, *_tail)

    def _decode_wide_hit(hit):
        if use_stream:
            # Streaming tables use split (P,) decode arrays (prim counts
            # can exceed the 22-bit packed range).
            p_inst, p_tri = buffers["stream_prim"]
            code = jnp.maximum(hit.tri, 0)
            ok = hit.tri >= 0
            return hit._replace(tri=jnp.where(ok, p_tri[code], hit.tri),
                                inst=jnp.where(ok, p_inst[code], hit.inst))
        pm = buffers.get("wide_prim_map")
        if pm is None:
            return hit
        # Static-scene flattened tables return per-instance PRIM ids
        # (buffers._pack_wide_merged): unpack (inst, tri).
        code = pm[jnp.maximum(hit.tri, 0)]
        ok = hit.tri >= 0
        return hit._replace(tri=jnp.where(ok, code & 0x3FFFFF, hit.tri),
                            inst=jnp.where(ok, code >> 22, hit.inst))

    _closure_pixel_index = pixel_index

    def bounce_body(bounce, carry, static_first=False, pix=None):
        """One bounce. `static_first=True` traces the PEELED bounce-0 call:
        `first`-gated logic resolves at trace time, the primary wave skips
        the coherence sort (it arrives pre-tiled by screen position —
        re-sorting it measured 188 ms vs 38 ms bare at 522k rays), and the
        G-buffer AOVs are returned out-of-carry.

        `pix` overrides the closure pixel ids (same values, COMPACTED
        order) so the round-5 late-bounce compaction wrapper below can run
        this body at a narrower static width: every array below sizes off
        the carry, never off the closure R."""
        (ray_o, ray_d, radiance, throughput, alive, prev_allow_nee, last_pdf,
         medium_id, cone_width, direct, rays_traced, *_tail) = carry
        pixel_index = pix if pix is not None else _closure_pixel_index
        R = ray_o.shape[0]
        cone_angle = jnp.broadcast_to(camera["pixel_spread_angle"], (R,))
        rr_alb = _tail[0] if demodulate else None
        # reference's direct-lighting bounces (bounce <= 1)
        early = True if static_first else (bounce <= 1)
        not_last = ((0 < config.num_bounces - 1) if static_first
                    else (bounce < config.num_bounces - 1))
        aovs_out = {}

        rays_traced = rays_traced + jnp.sum(alive)
        if use_stream:
            # Beyond-VMEM paged traversal (ops/pallas_stream.py): resident
            # pass + portal-sorted page rounds; size-independent like the
            # reference's DRAM-streamed CWBVH (BVH8.h:19-27).
            from gpu_raytracer_tpu.ops.pallas_stream import (
                trace_closest_stream,
            )

            hit, truncated = trace_closest_stream(
                buffers["wide_stream"], ray_o, ray_d,
                jnp.where(alive, INF, jnp.float32(0.0)),
                with_residual=True)
            hit = _decode_wide_hit(hit)
            # Beyond-cap portal truncation (> MAX_PASSES * K_PORTALS
            # portals on one lane) must never render silently-wrong
            # geometry: poison the lane like a NaN pixel (the magenta
            # diagnostic at the end of render_wave).
            radiance = jnp.where((alive & truncated)[:, None],
                                 jnp.float32(jnp.nan), radiance)
        elif use_wide:
            if static_first:
                hit = trace_closest_wide(
                    *buffers["wide"], ray_o, ray_d,
                    jnp.where(alive, INF, jnp.float32(0.0)))
            else:
                # Bounce waves run on the per-sublane GANG kernel
                # (ops/pallas_gang.py): each 128-ray gang traverses with
                # its own stack, so the cost scales with per-gang unions
                # instead of the whole tile's. Merged static-scene tables
                # take the FLAT leaf-postponing variant. The wave is
                # coherence-sorted IN-JIT first: round-4 chip numbers on a
                # 522k-ray Sponza diffuse wave — gang 366 ms unsorted,
                # flat 319 ms unsorted, flat+sort 290 ms including the
                # argsort and un-sort gathers (the round-3 "+120 ms sort"
                # was dispatch overhead, not the sort; in-jit it is ~8 ms).
                from gpu_raytracer_tpu.ops.pallas_gang import (
                    trace_closest_gang,
                )
                from gpu_raytracer_tpu.ops.ray_sort import trace_sorted

                flat = buffers.get("wide_prim_map") is not None
                hit = trace_sorted(
                    lambda o, d, t: trace_closest_gang(
                        *buffers["wide"], o, d, t, flat=flat),
                    ray_o, ray_d, jnp.where(alive, INF, jnp.float32(0.0)),
                    buffers["nodes"]["root_min"],
                    buffers["nodes"]["root_max"])
            hit = _decode_wide_hit(hit)
        elif use_pallas:
            hit = trace_closest_pallas(*buffers["pallas"], ray_o, ray_d,
                                       jnp.where(alive, INF, jnp.float32(0.0)))
        else:
            hit = trace_closest_tlas(nodes, tris, instances, ray_o, ray_d,
                                     jnp.where(alive, INF, jnp.float32(0.0)))

        # ---- homogeneous medium interaction (reference: Pathtracer.cu
        # :252-325 — Wrenninge spectral-MIS distance sampling + HG phase) ----
        scatters = jnp.zeros(R, bool)
        if has_media:
            mediums = buffers["mediums"]
            in_medium = alive & (medium_id >= 0)
            mid = jnp.maximum(medium_id, 0)
            sig_a = mediums["sigma_a"][mid]
            sig_s = mediums["sigma_s"][mid]
            g_med = mediums["g"][mid]
            sigma_t = sig_a + sig_s
            can_scatter = jnp.sum(sig_s, axis=-1) > 0.0

            u_s1, u_s2 = draw2(rng.SampleDimension.BSDF_0, pixel_index, bounce, sample_index)
            u_p1, u_p2 = draw2(rng.SampleDimension.BSDF_1, pixel_index, bounce, sample_index)

            thr_sum = jnp.maximum(jnp.sum(throughput, axis=-1), 1e-20)
            wavelength_pdf = throughput / thr_sum[:, None]
            pick = u_s1 * thr_sum
            sigma_used = jnp.where(pick < throughput[:, 0], sigma_t[:, 0],
                                   jnp.where(pick < throughput[:, 0] + throughput[:, 1],
                                             sigma_t[:, 1], sigma_t[:, 2]))
            dist_s = -jnp.log(jnp.maximum(1.0 - u_s2, 1e-10)) / jnp.maximum(sigma_used, 1e-10)
            t_clip = jnp.minimum(dist_s, hit.t)
            transmittance = jnp.exp(-sigma_t * t_clip[:, None])

            scatters = in_medium & can_scatter & (dist_s < hit.t)
            passthrough = in_medium & can_scatter & ~scatters
            absorb_only = in_medium & ~can_scatter

            pdf_sc = jnp.maximum(jnp.sum(wavelength_pdf * sigma_t * transmittance,
                                         axis=-1), 1e-20)
            pdf_pass = jnp.maximum(jnp.sum(wavelength_pdf * transmittance,
                                           axis=-1), 1e-20)
            thr_scatter = throughput * sig_s * transmittance / pdf_sc[:, None]
            thr_pass = throughput * transmittance / pdf_pass[:, None]
            thr_absorb = throughput * jnp.exp(
                -sig_a * jnp.minimum(hit.t, 1e20)[:, None])
            throughput = jnp.where(scatters[:, None], thr_scatter,
                                   jnp.where(passthrough[:, None], thr_pass,
                                             jnp.where(absorb_only[:, None],
                                                       thr_absorb, throughput)))

            from gpu_raytracer_tpu.ops.sampling import sample_henyey_greenstein

            scatter_dir = sample_henyey_greenstein(-ray_d, g_med, u_p1, u_p2)
            scatter_o = ray_o + dist_s[:, None] * ray_d
            # Scattered lanes bypass all surface logic this segment
            # (reference `return`s after emitting the scattered ray).
            alive = alive & ~scatters

        # ---- sky on miss (reference: Pathtracer.cu:328-343) ----
        missed = alive & (hit.tri < 0)
        sky_radiance = sample_sky(buffers["sky"], buffers["sky_scale"], ray_d)
        sky_contrib = jnp.where(missed[:, None], throughput * sky_radiance, 0.0)
        radiance = radiance + sky_contrib
        if with_aovs:
            direct = direct + jnp.where(early, sky_contrib, 0.0)
        alive = alive & ~missed

        # ---- material fetch (instance material wins, like the reference's
        # per-mesh material id, Raytracing/Mesh.h) ----
        from gpu_raytracer_tpu.ops.vec import fetch_rows

        ti = jnp.maximum(hit.tri, 0)
        ii = jnp.maximum(hit.inst, 0)
        # One wide-row fetch per table per bounce (ops/vec.py fetch_rows)
        # instead of dozens of per-column gathers.
        irow = fetch_rows(instances["rows"], ii)        # fwd|inv|mat_id
        if use_stream or (use_wide and not static_first):
            # The gang kernel returns (t, tri, inst) without barycentrics
            # (two fewer (8,128) carries per traversal iteration); re-derive
            # (u, v) from the object-space hit point against the edge-form
            # triangle — the shade_rows gather below CSEs with
            # _interpolate_hit's.
            _pr = tris["shade_rows"][ti]
            _p0, _e1, _e2 = _pr[:, 0:3], _pr[:, 3:6], _pr[:, 6:9]
            _ph = _affine_point_rows(irow[:, 12:24],
                                     ray_o + hit.t[:, None] * ray_d)
            _n = jnp.cross(_e1, _e2)
            _den = jnp.maximum(jnp.sum(_n * _n, axis=-1), 1e-30)
            _q = _ph - _p0
            _u = jnp.sum(jnp.cross(_q, _e2) * _n, axis=-1) / _den
            _v = jnp.sum(jnp.cross(_e1, _q) * _n, axis=-1) / _den
            _ok = hit.tri >= 0
            hit = hit._replace(u=jnp.where(_ok, _u, 0.0),
                               v=jnp.where(_ok, _v, 0.0))
        mat_id = irow[:, 24].astype(jnp.int32)
        mrow = fetch_rows(materials["rows"], mat_id)    # type|em|diff|...
        mat_type = mrow[:, 0].astype(jnp.int32)
        emission = mrow[:, 1:4]

        if use_gather_shade and not static_first:
            # ---- SCENE-SCALE fused shade (ops/pallas_shade_gather.py):
            # XLA keeps the gathers (hit interpolation, texture taps, sky,
            # sampler draws); ONE Mosaic kernel fuses all remaining
            # per-bounce shade math. Mirrors the reference's material
            # kernels at any scene size (Pathtracer.cu:465-773). Bounce 0
            # stays on the XLA body below (AOVs, aniso texture gradients,
            # demodulation are statically peeled there). ----
            from gpu_raytracer_tpu.ops.pallas_shade_gather import (
                shade_scene_pallas,
            )

            point, geom_n, shading_n, uv, p_obj, e1_obj, e2_obj = \
                _interpolate_hit(tris, irow, hit)
            entering = jnp.sum(ray_d * geom_n, axis=-1) < 0.0
            flip = jnp.where(entering, 1.0, -1.0)[:, None]
            geom_n = geom_n * flip
            shading_n = shading_n * flip
            tex_mul = jnp.ones((R, 3), jnp.float32)
            if has_textures and config.enable_mipmapping:
                # Isotropic ray-cone LOD (bounce >= 1 policy; the aniso
                # gradients are bounce-0-only, see the XLA body below).
                # tex id + lod bias come from the BAKED instance-row cols
                # (buffers._pack_instances round 5) so neither the
                # materials row gather nor the base_lod gather issues 2M
                # row starts here — XLA DCEs both.
                cone_width = cone_width + cone_angle * jnp.where(alive, hit.t, 0.0)
                tex_id = irow[:, 25].astype(jnp.int32)
                e1w = _affine_dir_rows(irow[:, 0:12], e1_obj)
                e2w = _affine_dir_rows(irow[:, 0:12], e2_obj)
                double_area_world = jnp.linalg.norm(jnp.cross(e1w, e2w), axis=-1)
                _r = tris["shade_rows"][ti]
                uv_e1 = _r[:, 20:22] - _r[:, 18:20]
                uv_e2 = _r[:, 22:24] - _r[:, 18:20]
                double_area_tex = jnp.abs(uv_e1[:, 0] * uv_e2[:, 1]
                                          - uv_e2[:, 0] * uv_e1[:, 1])
                from gpu_raytracer_tpu.ops.textures import (
                    sample_bilinear_lod_arith,
                )

                lod_tri = jnp.sqrt(double_area_tex
                                   / jnp.maximum(double_area_world, 1e-20))
                lod_cone = jnp.abs(cone_width / jnp.minimum(
                    jnp.sum(ray_d * geom_n, axis=-1), -1e-4))
                mip = (irow[:, 26]
                       + jnp.log2(jnp.maximum(lod_tri * lod_cone, 1e-20)))
                # Arithmetic mip addressing: base off / w0 / h0 ride the
                # instance row, so the whole tap costs ONE quad-row gather
                # (no per-lane mip_desc gather — ops/textures.py round 5).
                tex_rgb = sample_bilinear_lod_arith(
                    buffers["textures"],
                    jax.lax.bitcast_convert_type(irow[:, 29], jnp.int32),
                    irow[:, 30], irow[:, 31],
                    uv[:, 0], uv[:, 1], mip,
                    nearest_mip=True, max_mip=irow[:, 28])
                tex_mul = jnp.where((tex_id >= 0)[:, None], tex_rgb, 1.0)
            sky_radiance = sample_sky(buffers["sky"], buffers["sky_scale"],
                                      ray_d)
            u_rr, _ = draw2(rng.SampleDimension.RUSSIAN_ROULETTE,
                            pixel_index, bounce, sample_index)
            u_pick, _ = draw2(rng.SampleDimension.NEE_LIGHT,
                              pixel_index, bounce, sample_index)
            u_b1, u_b2 = draw2(rng.SampleDimension.NEE_TRIANGLE,
                               pixel_index, bounce, sample_index)
            u_f0, u_f1 = draw2(rng.SampleDimension.BSDF_0,
                               pixel_index, bounce, sample_index)
            u_c0, u_c1 = draw2(rng.SampleDimension.BSDF_1,
                               pixel_index, bounce, sample_index)
            params = jnp.stack([bounce.astype(jnp.float32),
                                jnp.float32(config.num_bounces),
                                lights["total_weight"],
                                jnp.float32(0.0)])
            lanes = {
                "t": hit.t,
                "mat_id": jnp.where(hit.tri >= 0, mat_id, -1),
                "entering": entering,
                "point": point,
                "geom_n": geom_n,
                "shading_n": shading_n,
                "tex_mul": tex_mul,
                "sky": sky_radiance,
                "ray_d": ray_d,
                "throughput": throughput,
                "alive": alive,
                "prev_allow_nee": prev_allow_nee,
                "last_pdf": last_pdf,
                "r5": u_rr, "r0": u_pick, "r1": u_b1, "r2": u_b2,
                "f0": u_f0, "f1": u_f1, "r3": u_c0, "r4": u_c1,
            }
            if demodulate:
                lanes["rr_albedo"] = rr_alb
            out = shade_scene_pallas(
                buffers["shade_gather"], params, lanes,
                enable_nee=nee_possible, enable_mis=config.enable_mis,
                enable_rr=config.enable_russian_roulette, demod=demodulate)
            radiance = radiance + out["radiance_add"]
            if with_aovs:
                # radiance_add = sky + emissive only; at bounce 1 both count
                # as direct light (the reference's bounce <= 1 rule).
                direct = direct + jnp.where(early, out["radiance_add"], 0.0)
            if nee_possible:
                want = out["shadow_tmax"] > 0.0
                rays_traced = rays_traced + jnp.sum(want)
                if use_stream:
                    from gpu_raytracer_tpu.ops.pallas_stream import (
                        trace_any_stream,
                    )

                    occluded = trace_any_stream(
                        buffers["wide_stream"], out["shadow_o"],
                        out["shadow_d"], out["shadow_tmax"])
                elif use_wide:
                    from gpu_raytracer_tpu.ops.pallas_gang import (
                        trace_any_gang,
                    )

                    occluded = trace_any_gang(
                        *buffers["wide"], out["shadow_o"], out["shadow_d"],
                        out["shadow_tmax"],
                        flat=buffers.get("wide_prim_map") is not None)
                elif use_pallas:
                    occluded = trace_any_pallas(
                        *buffers["pallas"], out["shadow_o"], out["shadow_d"],
                        out["shadow_tmax"])
                else:
                    occluded = trace_any_tlas(
                        nodes, tris, instances, out["shadow_o"],
                        out["shadow_d"], out["shadow_tmax"])
                radiance = radiance + jnp.where((want & ~occluded)[:, None],
                                                out["illumination"], 0.0)
            new_alive = out["alive"]
            ray_o = jnp.where(new_alive[:, None], out["ray_o"], ray_o)
            ray_d = jnp.where(new_alive[:, None], out["ray_d"], ray_d)
            prev_nee_out = out["prev_allow_nee"]
            last_pdf_out = out["last_pdf"]
            if has_media:
                # Mirror the XLA body's media merge (below at the loop
                # tail): dielectric transmissions hand the medium id over,
                # and lanes that scattered in the medium (dead through the
                # kernel) rejoin with their HG continuation ray. The
                # kernel's russian roulette rescaled EVERY lane's
                # throughput (scattered included, matching the reference's
                # russian_roulette() on scattered rays, Pathtracer.cu:287);
                # the matching kill for scattered lanes happens here since
                # they carry active=False through the kernel.
                if config.enable_russian_roulette:
                    rr_basis = (throughput * rr_alb if demodulate
                                else throughput)
                    survival = jnp.clip(jnp.max(rr_basis, axis=-1),
                                        0.0, 1.0)
                    scatters = scatters & (u_rr <= survival)
                mat_medium = irow[:, 27].astype(jnp.int32)
                medium_id = jnp.where(
                    new_alive & out["is_transmission"],
                    jnp.where(entering, mat_medium, -1), medium_id)
                ray_o = jnp.where(scatters[:, None], scatter_o, ray_o)
                ray_d = jnp.where(scatters[:, None], scatter_dir, ray_d)
                new_alive = new_alive | scatters
                prev_nee_out = prev_nee_out & ~scatters
                last_pdf_out = jnp.where(scatters, 1.0, last_pdf_out)
            return (ray_o, ray_d, radiance, out["throughput"], new_alive,
                    prev_nee_out, last_pdf_out, medium_id,
                    cone_width, direct, rays_traced,
                    *((rr_alb,) if demodulate else ())), aovs_out

        if with_aovs and static_first:
            # Primary-hit G-buffer for EVERY surface hit including emissive
            # ones (reference: svgf_set_gbuffers is also called in the LIGHT
            # branch, Pathtracer.cu:372-377) — otherwise lamp pixels keep
            # inf depth and poison the SVGF edge weights with NaNs.
            gb_ok = alive & (hit.tri >= 0)
            aovs_out["depth"] = jnp.where(gb_ok, hit.t, jnp.inf)
            aovs_out["instance"] = jnp.where(gb_ok, hit.inst, -1)

        # ---- emissive hit (reference: Pathtracer.cu:354-421) ----
        is_light = alive & (mat_type == int(MaterialType.LIGHT))
        if nee_possible:
            # World-space geometric light normal for the solid-angle pdf
            # (one shade_rows gather; XLA CSEs it with _interpolate_hit's).
            _r = tris["shade_rows"][ti]
            light_gn = _affine_normal_rows(
                irow[:, 12:24], jnp.cross(_r[:, 3:6], _r[:, 6:9]))
            cos_light = jnp.abs(jnp.sum(ray_d * light_gn, axis=-1))
            light_pdf = (luminance(emission) * hit.t * hit.t
                         / jnp.maximum(cos_light * lights["total_weight"], 1e-20))
            pdf_ok = jnp.isfinite(light_pdf) & (light_pdf > 0)
            full = ~prev_allow_nee  # BSDF lobe NEE couldn't have sampled
            if config.enable_mis:
                mis_w = jnp.where(full, 1.0,
                                  jnp.where(pdf_ok, power_heuristic(last_pdf, light_pdf), 0.0))
            else:
                mis_w = jnp.where(full, 1.0, 0.0)
            # (bounce 0 implicitly gets mis_w = 1: prev_allow_nee starts
            # False, so `full` covers the reference's bounce==0 rule.)
            light_contrib = throughput * emission * mis_w[:, None]
        else:
            light_contrib = throughput * emission
        light_add = jnp.where(is_light[:, None], light_contrib, 0.0)
        radiance = radiance + light_add
        if with_aovs:
            direct = direct + jnp.where(early, light_add, 0.0)
        alive = alive & ~is_light

        # ---- bounce cap + russian roulette (reference: Pathtracer.cu:199-218;
        # inactive at bounce 0, which is the peeled call) ----
        alive = alive & not_last
        if config.enable_russian_roulette and not static_first:
            rr_basis = throughput * rr_alb if demodulate else throughput
            survival = jnp.clip(jnp.max(rr_basis, axis=-1), 0.0, 1.0)
            u_rr, _ = draw2(rng.SampleDimension.RUSSIAN_ROULETTE,
                            pixel_index, bounce, sample_index)
            alive = alive & (u_rr <= survival)
            # Media-scattered lanes bypass the surface path but are still
            # subject to the SAME kill: the reference calls
            # russian_roulette() on the scattered ray before emitting it
            # (Pathtracer.cu:287) — rescaling without the kill would bias
            # scattered paths bright.
            scatters = scatters & (u_rr <= survival)
            throughput = throughput / jnp.maximum(survival, 1e-8)[:, None]

        # ---- surface shading (reference: Pathtracer.cu shade_material) ----
        point, geom_n, shading_n, uv, p_obj, e1_obj, e2_obj = _interpolate_hit(tris, irow, hit)
        # Two-sided handling: `entering` tracks which side of the surface the
        # ray arrived on (drives dielectric eta); the frame is flipped into
        # the incident hemisphere (reference: Pathtracer.cu:643-650).
        entering = jnp.sum(ray_d * geom_n, axis=-1) < 0.0
        flip = jnp.where(entering, 1.0, -1.0)[:, None]
        geom_n = geom_n * flip
        shading_n = shading_n * flip

        tangent, bitangent = orthonormal_basis(shading_n)
        omega_i = world_to_local(-ray_d, tangent, bitangent, shading_n)
        # Reject rays arriving below the shading hemisphere (reference:
        # Pathtracer.cu:653 omega_i.z <= 0 return).
        alive = alive & (omega_i[..., 2] > 0.0)

        mat = {
            "type": mat_type,
            "roughness": mrow[:, 7],
            "ior": mrow[:, 8],
            "eta": mrow[:, 9:12],
            "k": mrow[:, 12:15],
        }
        albedo = mrow[:, 4:7]
        if has_textures and config.enable_mipmapping:
            # Ray-cone texture LOD (reference: RayCone.h + Pathtracer.cu
            # :668-690): ANISOTROPIC ellipse-axis gradients at bounce 0,
            # isotropic cone after (matching the reference's policy).
            cone_width = cone_width + cone_angle * jnp.where(alive, hit.t, 0.0)
            tex_id = mrow[:, 15].astype(jnp.int32)
            e1w = _affine_dir_rows(irow[:, 0:12], e1_obj)
            e2w = _affine_dir_rows(irow[:, 0:12], e2_obj)
            double_area_world = jnp.linalg.norm(jnp.cross(e1w, e2w), axis=-1)
            _r = tris["shade_rows"][ti]
            uv_e1 = _r[:, 20:22] - _r[:, 18:20]
            uv_e2 = _r[:, 22:24] - _r[:, 18:20]
            double_area_tex = jnp.abs(uv_e1[:, 0] * uv_e2[:, 1]
                                      - uv_e2[:, 0] * uv_e1[:, 1])
            from gpu_raytracer_tpu.ops.textures import (
                sample_aniso_grad,
                sample_bilinear_lod_arith,
            )

            def iso_tex(_):
                lod_tri = jnp.sqrt(double_area_tex
                                   / jnp.maximum(double_area_world, 1e-20))
                lod_cone = jnp.abs(cone_width / jnp.minimum(
                    jnp.sum(ray_d * geom_n, axis=-1), -1e-4))
                mip = (irow[:, 26]
                       + jnp.log2(jnp.maximum(lod_tri * lod_cone, 1e-20)))
                # bounce >= 1 only (bounce 0 is the aniso branch): nearest
                # mip + arithmetic mip addressing = ONE quad-row gather per
                # tap; popping is invisible in indirect light.
                return sample_bilinear_lod_arith(
                    buffers["textures"],
                    jax.lax.bitcast_convert_type(irow[:, 29], jnp.int32),
                    irow[:, 30], irow[:, 31],
                    uv[:, 0], uv[:, 1], mip,
                    nearest_mip=True, max_mip=irow[:, 28])

            def aniso_tex(_):
                # Cone ellipse axes on the surface (RT Gems ch.20 / reference
                # RayCone.h:5-35): a1 along the projected direction, a2
                # perpendicular, both scaled so their direction-orthogonal
                # extent equals the cone width.
                nd = jnp.sum(geom_n * ray_d, axis=-1, keepdims=True)
                a1 = ray_d - nd * geom_n
                p1 = a1 - jnp.sum(ray_d * a1, axis=-1, keepdims=True) * ray_d
                a1 = a1 * (cone_width / jnp.maximum(
                    jnp.linalg.norm(p1, axis=-1), 1e-4))[:, None]
                a2 = jnp.cross(geom_n, a1)
                p2 = a2 - jnp.sum(ray_d * a2, axis=-1, keepdims=True) * ray_d
                a2 = a2 * (cone_width / jnp.maximum(
                    jnp.linalg.norm(p2, axis=-1), 1e-4))[:, None]
                # World axes -> barycentric deltas -> uv gradients.
                ng = jnp.cross(e1w, e2w)
                denom = jnp.maximum(jnp.sum(ng * ng, axis=-1), 1e-20)

                def to_uv(a):
                    al = jnp.sum(jnp.cross(a, e2w) * ng, axis=-1) / denom
                    be = jnp.sum(jnp.cross(e1w, a) * ng, axis=-1) / denom
                    return al[:, None] * uv_e1 + be[:, None] * uv_e2

                return sample_aniso_grad(buffers["textures"], tex_id,
                                         uv[:, 0], uv[:, 1],
                                         to_uv(a1), to_uv(a2))

            # Anisotropic gradients at the (peeled) primary bounce, isotropic
            # cone after — statically resolved, matching the reference's
            # bounce==0 policy (Pathtracer.cu:668-690).
            tex_rgb = aniso_tex(0) if static_first else iso_tex(0)
            albedo = jnp.where((tex_id >= 0)[:, None], albedo * tex_rgb, albedo)
        # Diffuse folds albedo into throughput once at the hit (reference
        # calc_albedo); plastic's diffuse lobe owns its albedo internally.
        # SVGF demodulation skips the fold at bounce 0 and re-modulates after
        # filtering (reference: BSDF.h calc_albedo svgf branch).
        is_diffuse = mat_type == int(MaterialType.DIFFUSE)
        fold_albedo = alive & is_diffuse
        if demodulate and static_first:
            # SVGF demodulation: skip the fold at bounce 0, re-modulate
            # after filtering (reference: BSDF.h calc_albedo svgf branch).
            # The suppressed factor still weights RR survival (see
            # rr_albedo above).
            rr_alb = jnp.where(fold_albedo[:, None], albedo, 1.0)
            fold_albedo = jnp.zeros_like(fold_albedo)
        throughput = jnp.where(fold_albedo[:, None], throughput * albedo, throughput)
        can_nee = bsdf_lib.allow_nee(mat_type, mat["roughness"], mat_types)

        if with_aovs and static_first:
            # Primary-hit G-buffer (reference: svgf_set_gbuffers SVGF.h:61-81
            # + ALBEDO/NORMAL/POSITION AOVs).
            hit_ok = alive
            aovs_out["albedo"] = jnp.where(
                (hit_ok & (is_diffuse | (mat_type == int(MaterialType.PLASTIC))))[:, None],
                albedo, 1.0)
            aovs_out["normal"] = jnp.where(hit_ok[:, None], shading_n, 0.0)
            aovs_out["position"] = jnp.where(hit_ok[:, None], point, 0.0)
            # Previous-frame world position for motion vectors (reference:
            # per-mesh transform_prev, Integrator.cpp:422).
            point_prev = _affine_point_rows(
                fetch_rows(instances["prev_rows"], ii), p_obj)
            aovs_out["position_prev"] = jnp.where(hit_ok[:, None],
                                                  point_prev, 0.0)

        # ---- next-event estimation (reference: Pathtracer.cu:466-555) ----
        if nee_possible:
            u_pick, _ = draw2(rng.SampleDimension.NEE_LIGHT,
                              pixel_index, bounce, sample_index)
            u_b1, u_b2 = draw2(rng.SampleDimension.NEE_TRIANGLE,
                               pixel_index, bounce, sample_index)
            k = searchsorted_cdf(lights["cdf"], u_pick)
            lt = lights["tri"][k]
            li = lights["inst"][k]
            lu, lv = sample_triangle_barycentric(u_b1, u_b2)
            lrow = tris["shade_rows"][lt]  # one row gather for p0|e1|e2
            lirow = fetch_rows(instances["rows"], li)
            le1 = _affine_dir_rows(lirow[:, 0:12], lrow[:, 3:6])
            le2 = _affine_dir_rows(lirow[:, 0:12], lrow[:, 6:9])
            lp0 = _affine_point_rows(lirow[:, 0:12], lrow[:, 0:3])
            light_point = lp0 + lu[:, None] * le1 + lv[:, None] * le2
            light_gn = normalize(jnp.cross(le1, le2))
            lm = lirow[:, 24].astype(jnp.int32)
            light_emission = fetch_rows(materials["rows"], lm)[:, 1:4]

            shadow_o = _offset_origin(point, light_point - point, geom_n)
            light_point = _offset_origin(light_point, shadow_o - light_point, light_gn)
            to_light = light_point - shadow_o
            dist = jnp.linalg.norm(to_light, axis=-1)
            to_light = to_light / jnp.maximum(dist, 1e-20)[:, None]

            cos_light = jnp.abs(jnp.sum(to_light * light_gn, axis=-1))
            omega_o_nee = world_to_local(to_light, tangent, bitangent, shading_n)
            nee_eval = bsdf_lib.bsdf_eval(buffers["luts"], mat, omega_i,
                                          omega_o_nee, albedo, entering,
                                          mat_types)
            light_pdf = (luminance(light_emission) * dist * dist
                         / jnp.maximum(cos_light * lights["total_weight"], 1e-20))
            pdf_ok = jnp.isfinite(light_pdf) & (light_pdf > 1e-20)

            mis_w = power_heuristic(light_pdf, nee_eval.pdf) if config.enable_mis else 1.0
            illumination = (throughput * nee_eval.value * light_emission
                            * (mis_w / jnp.maximum(light_pdf, 1e-20))[:, None])

            want_shadow = alive & can_nee & nee_eval.valid & pdf_ok & (cos_light > 1e-6)
            rays_traced = rays_traced + jnp.sum(want_shadow)
            shadow_tmax = jnp.where(want_shadow, dist - 2 * EPSILON,
                                    jnp.float32(0.0))
            if use_stream:
                from gpu_raytracer_tpu.ops.pallas_stream import (
                    trace_any_stream,
                )

                occluded = trace_any_stream(buffers["wide_stream"],
                                            shadow_o, to_light, shadow_tmax)
            elif use_wide:
                # Shadow waves are NOT re-sorted: origins inherit the parent
                # wave's clustering, directions point at a small light set,
                # and the any-hit kernel drains a gang as soon as every lane
                # is occluded — measured 46 ms unsorted vs 155 ms re-sorted
                # at 522k rays (tools/exp_sort_cost.py); the gang kernel's
                # per-sublane drain is another ~10% (32 vs 36 ms).
                from gpu_raytracer_tpu.ops.pallas_gang import trace_any_gang

                occluded = trace_any_gang(
                    *buffers["wide"], shadow_o, to_light, shadow_tmax,
                    flat=buffers.get("wide_prim_map") is not None)
            elif use_pallas:
                occluded = trace_any_pallas(*buffers["pallas"], shadow_o,
                                            to_light, shadow_tmax)
            else:
                occluded = trace_any_tlas(nodes, tris, instances, shadow_o,
                                          to_light, shadow_tmax)
            add = want_shadow & ~occluded
            nee_add = jnp.where(add[:, None], illumination, 0.0)
            radiance = radiance + nee_add
            if with_aovs and static_first:
                direct = direct + nee_add

        # ---- BSDF sample -> continuation ray (reference: Pathtracer.cu:745-756) ----
        u_f0, u_f1 = draw2(rng.SampleDimension.BSDF_0, pixel_index, bounce, sample_index)
        u_b0, u_b1 = draw2(rng.SampleDimension.BSDF_1, pixel_index, bounce, sample_index)
        sample = bsdf_lib.bsdf_sample(buffers["luts"], mat, omega_i, albedo,
                                      entering, u_f0, u_f1, u_b0, u_b1,
                                      mat_types)
        alive = alive & sample.valid
        throughput = jnp.where(alive[:, None],
                               throughput * sample.throughput_mul, throughput)
        new_dir = local_to_world(sample.omega_o, tangent, bitangent, shading_n)
        new_dir = normalize(new_dir)
        ray_o = jnp.where(alive[:, None], _offset_origin(point, new_dir, geom_n), ray_o)
        ray_d = jnp.where(alive[:, None], new_dir, ray_d)
        last_pdf = sample.pdf
        prev_allow_nee = jnp.full(R, bool(config.enable_nee)) & can_nee
        if has_media:
            # Medium transitions on dielectric transmission (reference:
            # BSDF.h dielectric sample medium_id update).
            mat_medium = mrow[:, 16].astype(jnp.int32)
            medium_id = jnp.where(alive & sample.is_transmission,
                                  jnp.where(entering, mat_medium, -1), medium_id)
            # Merge scattered lanes back into the wavefront.
            ray_o = jnp.where(scatters[:, None], scatter_o, ray_o)
            ray_d = jnp.where(scatters[:, None], scatter_dir, ray_d)
            alive = alive | scatters
            prev_allow_nee = prev_allow_nee & ~scatters
            last_pdf = jnp.where(scatters, 1.0, last_pdf)

        return (ray_o, ray_d, radiance, throughput, alive, prev_allow_nee,
                last_pdf, medium_id, cone_width, direct, rays_traced,
                *((rr_alb,) if demodulate else ())), aovs_out

    carry = (ray_o, ray_d, radiance, throughput, alive, prev_allow_nee,
             last_pdf, medium_id, cone_width, direct, rays_traced,
             *((rr_albedo,) if demodulate else ()))
    # Bounce 0 is PEELED out of the loop: `first`-gated logic (G-buffer
    # writes, aniso texture gradients, RR inactivity, demodulation) resolves
    # statically, the pre-tiled primary wave skips the coherence sort, and
    # the AOV arrays never enter the loop carry. Bounces 1.. run as a
    # lax.while_loop: the per-bounce program is traced ONCE (compile time
    # independent of num_bounces — the unrolled form made 48-bounce furnace
    # configs take tens of minutes to compile), and the loop exits as soon
    # as every lane is dead. Mitsuba scenes ship maxDepth=65; with RR the
    # effective depth is ~6-10, and the reference's queue compaction makes
    # late bounces near-free — this is the TPU equivalent (a bounce with
    # zero alive lanes is skipped entirely).
    aovs_first = {}

    def _cond(state):
        b, c = state
        return (b < config.num_bounces) & jnp.any(c[4])

    if use_pallas_shade:
        def _body(state):
            b, c = state
            return b + 1, fast_bounce_body(b, c)

        _, carry = jax.lax.while_loop(_cond, _body, (jnp.int32(0), carry))
    else:
        carry, aovs_first = bounce_body(jnp.int32(0), carry,
                                        static_first=True)

        # ---- round-5 late-bounce wavefront compaction ----
        # The reference's material queues make a bounce with few live rays
        # near-free (Pathtracer.cu:426-462 compaction + persistent fetch);
        # the one-program XLA design pays full-width glue at every bounce
        # regardless of live count (~0.9 s/bounce at 1080p, measured with
        # tools/exp_bounce_ablate.py). TPU equivalent: for each static tier
        # divisor D, when the live count fits in ceil(R/D), lax.cond into a
        # copy of the SAME bounce body traced at the narrower width —
        # live lanes are cumsum-packed, the body runs compacted, results
        # scatter back. Never biased: the full body runs otherwise.
        lane_ids = jnp.arange(R, dtype=jnp.int32)

        def _compact_step(bounce, carry, cap):
            alive_f = carry[4]
            slot = jnp.where(alive_f,
                             jnp.cumsum(alive_f.astype(jnp.int32)) - 1, cap)
            idx = jnp.zeros(cap, jnp.int32).at[slot].set(lane_ids,
                                                         mode="drop")
            valid = jnp.zeros(cap, jnp.bool_).at[slot].set(True, mode="drop")

            def gath(x):
                if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == R:
                    return x[idx]
                return x

            cc = tuple(gath(x) for x in carry)
            # Padding slots duplicate lane 0 — mask them dead before the
            # body ever sees them.
            cc = cc[:4] + (cc[4] & valid,) + cc[5:]
            out = bounce_body(bounce, cc, pix=_closure_pixel_index[idx])[0]
            iw = jnp.where(valid, idx, R)  # dropped on padding slots

            def scat(x, xc):
                if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == R:
                    return x.at[iw].set(xc, mode="drop")
                return xc  # scalar stats: compact sums == full sums

            return tuple(scat(x, xc) for x, xc in zip(carry, out))

        def _tiered_body(b, c):
            fn = lambda c: bounce_body(b, c)[0]
            for div in sorted(set(int(d) for d in compact_tiers)):
                if div < 2 or R // div < 1024:
                    continue
                cap = -(-(R // div) // 1024) * 1024
                fn = (lambda fn_next, cap: lambda c: jax.lax.cond(
                    jnp.sum(c[4]) <= cap,
                    lambda c: _compact_step(b, c, cap),
                    fn_next, c))(fn, cap)
            return fn(c)

        def _body(state):
            b, c = state
            return b + 1, _tiered_body(b, c)

        _, carry = jax.lax.while_loop(_cond, _body, (jnp.int32(1), carry))
    (ray_o, ray_d, radiance, throughput, alive, prev_allow_nee, last_pdf,
     medium_id, cone_width, direct, rays_traced, *_tail) = carry

    # NaN/Inf poisoning -> magenta, matching the reference's diagnostic
    # (Pathtracer.cu:790-793).
    bad = ~jnp.all(jnp.isfinite(radiance), axis=-1)
    magenta = jnp.array([1.0, 0.0, 1.0], jnp.float32)
    radiance = jnp.where(bad[:, None], magenta, radiance)
    if with_aovs:
        a = aovs_first  # {} on the fast-shade path (its gate excludes AOVs)
        aovs = {
            "radiance": radiance,
            "direct": jnp.where(bad[:, None], 0.0, direct),
            "indirect": jnp.where(bad[:, None], magenta,
                                  jnp.maximum(radiance - direct, 0.0)),
            "albedo": a.get("albedo", jnp.ones((R, 3), jnp.float32)),
            "normal": a.get("normal", jnp.zeros((R, 3), jnp.float32)),
            "position": a.get("position", jnp.zeros((R, 3), jnp.float32)),
            "position_prev": a.get("position_prev",
                                   jnp.zeros((R, 3), jnp.float32)),
            "depth": a.get("depth", jnp.full((R,), jnp.inf, jnp.float32)),
            "instance": a.get("instance", jnp.full((R,), -1, jnp.int32)),
        }
        if with_stats:
            return aovs, rays_traced
        return aovs
    if with_stats:
        return radiance, rays_traced
    return radiance


def default_compact_tiers(R, config):
    """Static divisors for render_wave's late-bounce compaction cond.

    Measured at Sponza 1080p (tools/exp_live_counts.py, exp_compact.py):
    live lanes entering each bounce are 99.7% (b1), 24.7% (b2), 5.2%
    (b3), 1.4% (b5). The bounce body's cost is dominated by ~50 ns/row
    gather STARTS, and the compact transition itself gathers/scatters the
    ~12-array carry — so shallow tiers LOSE (/4 at bounce 2 measured
    +170 ms, /2 +520 ms net) and compaction only pays when the live
    fraction is far below the tier (bounces >= 3, <= 6%, where a /16
    body replaces full-width gathers with 1/16-width ones). Hence: no
    tiers for <= 3 bounces; a single /16 tier for deeper configs (the
    default b10, furnace b48), which the 99%-dead tail bounces take.
    Small waves skip entirely (compile + cond outweigh the glue)."""
    if R < (1 << 18) or config.num_bounces <= 3:
        return ()
    return (16,)


@functools.partial(jax.jit,
                   static_argnames=("config", "width", "height", "seed",
                                    "has_lights", "has_textures", "has_media",
                                    "use_pallas", "use_wide",
                                    "use_gather_shade", "use_stream",
                                    "mat_types", "canonical_order"))
def _denoised_frame(buffers, camera, pixel_index, sample_index, history,
                    vp_prev, taa_prev, is_first, config, width,
                    height, seed, has_lights, has_textures, has_media,
                    use_pallas, use_wide, mat_types,
                    use_gather_shade=False, use_stream=False,
                    canonical_order=True):
    """Trace + SVGF + TAA as one program (see render_frame_denoised).

    `canonical_order` asserts that pixel_index IS tile_order(width, height):
    only then is the reshape/transpose untile a valid inverse. Callers
    passing any other permutation must set it False to get the scatter
    fallback (untile would silently scramble the image)."""
    from gpu_raytracer_tpu.ops import svgf as svgf_ops
    from gpu_raytracer_tpu.ops import taa as taa_ops

    aovs = render_wave(buffers, camera, pixel_index, sample_index, config,
                       width, seed, has_lights, has_textures=has_textures,
                       has_media=has_media, with_aovs=True,
                       use_pallas=use_pallas, use_wide=use_wide,
                       use_gather_shade=use_gather_shade,
                       use_stream=use_stream, mat_types=mat_types,
                       compact_tiers=default_compact_tiers(
                           pixel_index.shape[0], config))

    # Un-tile into (H, W) images. When pixel_index is the canonical
    # tile_order permutation (render_frame_denoised always passes it), the
    # inverse is pure reshape/transpose (ops/camera_rays.untile) — a
    # device-permutation scatter costs ~250 ms PER AOV at 1080p, the
    # reshape is HBM-bandwidth.
    from gpu_raytracer_tpu.ops.camera_rays import can_untile, untile

    if canonical_order and can_untile(width, height):
        def img(x):
            return untile(x, width, height)
    else:
        def img(x):
            out = jnp.zeros((height * width,) + x.shape[1:], x.dtype)
            return out.at[pixel_index].set(x).reshape((height, width)
                                                      + x.shape[1:])

    frame = {k: img(aovs[k]) for k in
             ("direct", "indirect", "albedo", "normal", "depth",
              "instance", "position_prev")}
    colour, new_history = svgf_ops.svgf_step(
        frame, history, vp_prev, config,
        use_pallas=jax.default_backend() == "tpu")

    if config.enable_taa:
        taa_in = taa_ops.to_taa_space(jnp.maximum(colour, 0.0))
        prev = jnp.where(is_first, taa_in, taa_prev)
        # position_prev is the hit's PREVIOUS-frame world position, so it
        # must be projected with the PREVIOUS view-projection to land on the
        # pixel that saw it last frame (reference: svgf_set_gbuffers uses
        # svgf_data.view_projection_prev, Src/CUDA/SVGF/SVGF.h:61-81).
        screen_prev = svgf_ops.project_to_screen(
            frame["position_prev"], vp_prev, width, height)
        taa_out = taa_ops.taa_step(taa_in, prev, screen_prev)
        colour = taa_ops.from_taa_space(taa_out)
        new_taa = taa_out
    else:
        new_taa = taa_prev
    return colour, new_history, new_taa


class Pathtracer:
    """Host orchestrator: owns device buffers, camera upload, accumulation
    (reference: Integrator + Pathtracer host classes)."""

    def __init__(self, scene: Scene, cpu_config: Optional[CPUConfig] = None,
                 gpu_config: Optional[GPUConfig] = None):
        self.scene = scene
        self.cpu_config = cpu_config or scene.config
        gpu = gpu_config or GPUConfig()
        if scene.integrator_max_depth:
            import dataclasses

            gpu = dataclasses.replace(gpu, num_bounces=scene.integrator_max_depth)
        self.gpu_config = gpu
        self.invalidated = Invalidation()

        self.width = scene.film_width
        self.height = scene.film_height
        self.buffers: Optional[dict] = None
        self.accumulator = None
        self.sample_index = 0

    # -- lifecycle ----------------------------------------------------------

    def init_device(self) -> None:
        """Build + upload all scene buffers (reference cuda_init)."""
        self.buffers = build_scene_buffers(
            self.scene, self.cpu_config.sah_cost_node, self.cpu_config.sah_cost_leaf)
        self.accumulator = jnp.zeros((self.width * self.height, 3), jnp.float32)
        self.invalidated.clear()

    @property
    def mat_types(self) -> tuple:
        """Static tuple of MaterialType ints present in the scene: lobes for
        absent types compile away in bsdf dispatch (ops/bsdf.py)."""
        return tuple(sorted({int(m.type) for m in self.scene.materials}))

    @property
    def use_pallas(self) -> bool:
        """The Pallas whole-loop traversal kernel runs when the scene fits its
        SMEM table budget and we're on real TPU hardware (the XLA while_loop
        path covers larger scenes and the CPU test backend)."""
        return (self.buffers is not None
                and self.buffers.get("pallas") is not None
                and jax.default_backend() == "tpu")

    @property
    def use_pallas_shade(self) -> bool:
        """The fused shade megakernel runs for all-BSDF untextured scenes
        on TPU when not rendering AOVs (ops/pallas_shade.py gate). The
        in-kernel sampler additionally needs 32-aligned film dims (ray
        blocks must sit inside one 32x32 screen tile for the blue-noise
        row trick), the PMJ sampler, and bounce depths whose sampler dims
        stay inside the 64 PMJ sequences."""
        return (self.use_pallas
                and self.buffers.get("pallas_shade") is not None
                and self.width % 32 == 0 and self.height % 32 == 0
                and self.gpu_config.sampler == "pmj"
                and self.gpu_config.num_bounces <= 12)

    @property
    def use_gather_shade(self) -> bool:
        """The SCENE-SCALE fused shade megakernel
        (ops/pallas_shade_gather.py): gathers stay in XLA, all remaining
        per-bounce shade math runs in one Mosaic kernel. No size, texture,
        sky or media gate — only the 5 core material types (media distance
        sampling stays in the XLA pre-stage; the HG continuation merges
        after the kernel). The small-scene SMEM megakernel
        (use_pallas_shade) keeps priority when it applies (it also fuses
        the gathers + sampler)."""
        return (self.buffers is not None
                and self.buffers.get("shade_gather") is not None
                and jax.default_backend() == "tpu"
                and not self.use_pallas_shade)

    @property
    def use_stream(self) -> bool:
        """Beyond-VMEM paged traversal (ops/pallas_stream.py): runs when
        the merged wide tables exceeded the VMEM budget and were packed as
        resident-top + HBM pages instead (ops/buffers._pack_wide_merged).
        San Miguel/Bistro-class scenes stay on a Pallas path instead of
        the ~1000x slower XLA while_loop."""
        return (self.buffers is not None
                and self.buffers.get("wide_stream") is not None
                and jax.default_backend() == "tpu")

    @property
    def use_wide(self) -> bool:
        """The block-synchronous wide-BVH kernel covers scene-scale tables
        (up to the VMEM budget, ~100 MB — Sponza class) on real TPU
        hardware. The small-scene SMEM kernel keeps priority when its fused
        shade path applies; the XLA while_loop path covers everything else
        (giant scenes, CPU backend)."""
        return (self.buffers is not None
                and self.buffers.get("wide") is not None
                and jax.default_backend() == "tpu")

    def update(self, delta: float = 0.0) -> None:
        """Selective re-upload per invalidation flags (reference
        Integrator::update, Integrator.cpp:432-528)."""
        if self.buffers is None or self.invalidated.materials \
                or self.invalidated.mediums or self.invalidated.sky:
            self.scene.update(delta)
            self.init_device()
            self.reset_accumulation()
        elif self.invalidated.scene:
            # Transform-only edits: in-place TLAS + instance refresh — no
            # shape change, no re-jit (reference: per-frame build_tlas).
            from gpu_raytracer_tpu.ops.buffers import refresh_tlas

            if self.cpu_config.enable_scene_update:
                self.scene.update(delta)
            self.buffers = refresh_tlas(self.buffers, self.scene)
            if not self.gpu_config.enable_svgf:
                self.reset_accumulation()
            self.invalidated.clear()
        elif self.invalidated.camera or self.invalidated.gpu_config:
            self.reset_accumulation()
            self.invalidated.clear()

    def update_async(self, delta: float = 0.0) -> None:
        """Host-side re-pack on a worker thread so it overlaps the device
        still executing the PREVIOUS frame's (async-dispatched) render —
        the TPU analog of the reference's pinned staging buffer + dedicated
        non-blocking memory stream (Integrator.h:199-201, Integrator.cpp:
        212,278: uploads ride a separate stream while the render stream
        works). The next render()/render_frame_denoised() joins the future
        before dispatching. Only the transform-edit path (refresh_tlas) is
        overlapped; structural invalidations rebuild synchronously."""
        if (self.buffers is not None and self.invalidated.scene
                and not (self.invalidated.materials
                         or self.invalidated.mediums
                         or self.invalidated.sky)):
            from gpu_raytracer_tpu.ops.buffers import refresh_tlas
            from gpu_raytracer_tpu.utils.pool import submit

            if self.cpu_config.enable_scene_update:
                self.scene.update(delta)
            buffers = self.buffers

            self._pending_buffers = submit(refresh_tlas, buffers, self.scene)
            if not self.gpu_config.enable_svgf:
                self.reset_accumulation()
            self.invalidated.clear()
        else:
            self.update(delta)

    def _join_pending(self) -> None:
        fut = getattr(self, "_pending_buffers", None)
        if fut is not None:
            self._pending_buffers = None
            self.buffers = fut.result()

    def reset_accumulation(self) -> None:
        self.sample_index = 0
        self.accumulator = jnp.zeros((self.width * self.height, 3), jnp.float32)

    # -- rendering ----------------------------------------------------------

    def render(self) -> None:
        """Render one sample for every pixel and fold it into the online
        average (reference: kernel_accumulate, Pathtracer.cu:775-796)."""
        self._join_pending()
        if self.buffers is None:
            self.init_device()
        num_pixels = self.width * self.height
        wave = min(self.cpu_config.batch_size, num_pixels)
        if self.use_pallas_shade:
            # The in-kernel sampler needs every 1024-ray block inside one
            # 32x32 screen tile: keep wave offsets block-aligned.
            wave = max(wave // 1024 * 1024, 1024)
        camera = {k: jnp.asarray(v) for k, v in self.scene.camera.params().items()}

        if getattr(self, "_tile_order", None) is None or                 self._tile_order.shape[0] != num_pixels:
            from gpu_raytracer_tpu.ops.camera_rays import tile_order

            self._tile_order = jnp.asarray(tile_order(self.width, self.height))

        frame = jnp.zeros((num_pixels, 3), jnp.float32)
        for offset in range(0, num_pixels, wave):
            pos_raw = offset + jnp.arange(wave, dtype=jnp.int32)
            pos = jnp.minimum(pos_raw, num_pixels - 1)  # tail wave: clamp
            idx = self._tile_order[pos]
            # Padding lanes of the tail wave are masked dead up front (the
            # clamped duplicates would otherwise re-render real pixels).
            mask = pos_raw < num_pixels
            colors = render_wave(self.buffers, camera, idx, self.sample_index,
                                 self.gpu_config, self.width, self.cpu_config.seed,
                                 self.scene.has_lights,
                                 has_textures=len(self.scene.textures) > 0,
                                 has_media=len(self.scene.mediums) > 0,
                                 use_pallas=self.use_pallas,
                                 use_pallas_shade=self.use_pallas_shade,
                                 use_wide=self.use_wide and not self.use_pallas,
                                 use_gather_shade=self.use_gather_shade,
                                 use_stream=self.use_stream,
                                 valid_mask=mask, mat_types=self.mat_types,
                                 compact_tiers=default_compact_tiers(
                                     wave, self.gpu_config))
            count = min(wave, num_pixels - offset)
            frame = frame.at[idx[:count]].set(colors[:count])

        self.accumulator = self.accumulator + (frame - self.accumulator) / (self.sample_index + 1)
        self.sample_index += 1

    def render_samples(self, n: int) -> np.ndarray:
        for _ in range(n):
            self.render()
        return self.framebuffer()

    # -- SVGF + TAA interactive path (1 spp per frame, denoised) -------------

    def render_frame_denoised(self) -> np.ndarray:
        """One 1-spp frame through SVGF (+TAA): the reference's interactive
        mode (Pathtracer.cpp render() SVGF branch + svgf_* kernels).

        The whole frame — trace (in 32x32 tile order for traversal
        coherence), AOV scatter, SVGF and TAA — is ONE jitted program:
        per-op dispatch over the device link would otherwise cost more
        than the denoiser math itself."""
        from gpu_raytracer_tpu.ops import svgf as svgf_ops

        self._join_pending()
        if self.buffers is None:
            self.init_device()
        H, W = self.height, self.width
        if getattr(self, "_svgf_history", None) is None:
            self._svgf_history = svgf_ops.init_history(H, W)
            self._taa_prev = jnp.zeros((H, W, 3), jnp.float32)
            self._vp_prev = jnp.asarray(self.scene.camera.view_projection)
        if getattr(self, "_tile_order", None) is None or \
                self._tile_order.shape[0] != W * H:
            from gpu_raytracer_tpu.ops.camera_rays import tile_order

            self._tile_order = jnp.asarray(tile_order(W, H))

        camera = {k: jnp.asarray(v) for k, v in self.scene.camera.params().items()}
        colour, self._svgf_history, self._taa_prev = _denoised_frame(
            self.buffers, camera, self._tile_order, self.sample_index,
            self._svgf_history, self._vp_prev, self._taa_prev,
            jnp.asarray(self.sample_index == 0),
            self.gpu_config, W, H, self.cpu_config.seed,
            self.scene.has_lights, len(self.scene.textures) > 0,
            len(self.scene.mediums) > 0, self.use_pallas,
            self.use_wide and not self.use_pallas, self.mat_types,
            use_gather_shade=self.use_gather_shade,
            use_stream=self.use_stream)
        self.sample_index += 1
        self._vp_prev = jnp.asarray(self.scene.camera.view_projection)
        self.accumulator = colour.reshape(-1, 3)
        return np.asarray(colour)

    def framebuffer(self) -> np.ndarray:
        """(H, W, 3) float32 HDR frame."""
        return np.asarray(self.accumulator).reshape(self.height, self.width, 3)

    def export_aovs(self, output_filename: str, samples: int = 4) -> dict:
        """Write albedo/normal/position EXRs next to the main output
        (reference: capture_screen AOV export, Main.cpp:226-250)."""
        import os

        from gpu_raytracer_tpu.utils.exr import write_exr

        camera = {k: jnp.asarray(v) for k, v in self.scene.camera.params().items()}
        idx = jnp.arange(self.width * self.height, dtype=jnp.int32)
        acc = {"albedo": 0, "normal": 0, "position": 0}
        for s in range(samples):
            aovs = render_wave(self.buffers, camera, idx, s, self.gpu_config,
                               self.width, self.cpu_config.seed,
                               self.scene.has_lights,
                               has_textures=len(self.scene.textures) > 0,
                               has_media=len(self.scene.mediums) > 0,
                               with_aovs=True, use_pallas=self.use_pallas,
                               use_wide=self.use_wide and not self.use_pallas,
                               use_gather_shade=self.use_gather_shade,
                               use_stream=self.use_stream,
                               mat_types=self.mat_types,
                               compact_tiers=default_compact_tiers(
                                   self.width * self.height,
                                   self.gpu_config))
            for k in acc:
                acc[k] = acc[k] + np.asarray(aovs[k])
        base = os.path.splitext(output_filename)[0]
        written = {}
        for k, v in acc.items():
            img = (v / samples).reshape(self.height, self.width, 3)
            path = f"{base}_{k}.exr"
            write_exr(path, np.flipud(img))
            written[k] = path
        return written
