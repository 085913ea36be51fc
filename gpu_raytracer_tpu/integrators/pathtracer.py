"""Wavefront path tracer (reference: Src/Renderer/Integrators/Pathtracer.{h,
cpp} + Src/CUDA/Pathtracer.cu — re-designed for XLA).

The CUDA reference splits each bounce into generate / trace / sort /
material_* / trace_shadow kernels communicating through atomic global-memory
queues. Here one jitted `render_wave` contains the whole sample: a Python
bounce loop unrolled at trace time (num_bounces is static in GPUConfig), each
bounce doing trace -> shade -> NEE shadow trace on the full wavefront with
alive masks. XLA fuses the shading math between the two traversal while-loops;
queue compaction is unnecessary at this stage because every stage is already
branchless vector math over all lanes (the sort-based compaction of SURVEY.md
§2.10 becomes profitable only with heavy multi-BSDF divergence; see
ops/compaction.py once material sorting lands).

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
from gpu_raytracer_tpu.scene.scene import Scene
from gpu_raytracer_tpu.scene.types import MaterialType

EPSILON = jnp.float32(1e-4)  # ray-origin offset (reference: Common.h:75)
INF = jnp.float32(jnp.inf)


def _offset_origin(point, direction, geometric_normal):
    """reference: Src/CUDA/Raytracing/Ray.h:16-18."""
    sign = jnp.where(jnp.sum(direction * geometric_normal, axis=-1, keepdims=True) >= 0,
                     1.0, -1.0)
    return point + sign * EPSILON * geometric_normal


def _interpolate_hit(tris, instances, hit):
    """Reconstruct position/normals/uv from barycentrics in object space and
    transform into world space with the hit instance's matrices (reference:
    Pathtracer.cu:596-650 shade_material hit reconstruction)."""
    ti = jnp.maximum(hit.tri, 0)
    ii = jnp.maximum(hit.inst, 0)
    u = hit.u[:, None]
    v = hit.v[:, None]
    p0 = tris["p0"][ti]
    e1 = tris["e1"][ti]
    e2 = tris["e2"][ti]
    fwd = instances["transform"][ii]      # (R, 3, 4)
    inv = instances["transform_inv"][ii]

    p_obj = p0 + u * e1 + v * e2
    point = jnp.einsum("rij,rj->ri", fwd[:, :, :3], p_obj) + fwd[:, :, 3]

    # Normals transform by the inverse-transpose: n'_j = sum_i inv[i, j] n_i.
    def n_to_world(n):
        return normalize(jnp.einsum("rij,ri->rj", inv[:, :, :3], n))

    geom_n = n_to_world(jnp.cross(e1, e2))
    n0 = tris["n0"][ti]
    n1 = tris["n1"][ti]
    n2 = tris["n2"][ti]
    shading_n = n_to_world((1.0 - u - v) * n0 + u * n1 + v * n2)
    uv = (1.0 - u - v) * tris["uv0"][ti] + u * tris["uv1"][ti] + v * tris["uv2"][ti]
    return point, geom_n, shading_n, uv


@functools.partial(jax.jit,
                   static_argnames=("config", "width", "seed", "has_lights", "with_stats"))
def render_wave(buffers: dict, camera: dict, pixel_index: jnp.ndarray,
                sample_index, config: GPUConfig, width: int, seed: int = 0,
                has_lights: bool = True, with_stats: bool = False):
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

    ray_o, ray_d = generate_primary_rays(
        camera, pixel_index, width, sample_index, config.reconstruction_filter, seed)

    radiance = jnp.zeros((R, 3), jnp.float32)
    throughput = jnp.ones((R, 3), jnp.float32)
    alive = jnp.ones(R, bool)
    prev_allow_nee = jnp.zeros(R, bool)  # primary rays: emissive hits count fully
    last_pdf = jnp.ones(R, jnp.float32)
    rays_traced = jnp.zeros((), jnp.float32)  # primary+bounce+shadow ray count

    for bounce in range(config.num_bounces):
        rays_traced = rays_traced + jnp.sum(alive)
        hit = trace_closest_tlas(nodes, tris, instances, ray_o, ray_d,
                                 jnp.where(alive, INF, jnp.float32(0.0)))

        # ---- sky on miss (reference: Pathtracer.cu:328-343) ----
        missed = alive & (hit.tri < 0)
        sky_radiance = sample_sky(buffers["sky"], buffers["sky_scale"], ray_d)
        radiance = radiance + jnp.where(missed[:, None], throughput * sky_radiance, 0.0)
        alive = alive & ~missed

        # ---- material fetch (instance material wins, like the reference's
        # per-mesh material id, Raytracing/Mesh.h) ----
        ti = jnp.maximum(hit.tri, 0)
        ii = jnp.maximum(hit.inst, 0)
        mat_id = instances["material_id"][ii]
        mat_type = materials["type"][mat_id]
        emission = materials["emission"][mat_id]

        # ---- emissive hit (reference: Pathtracer.cu:354-421) ----
        is_light = alive & (mat_type == int(MaterialType.LIGHT))
        if nee_possible:
            # World-space geometric light normal for the solid-angle pdf.
            inv_hit = instances["transform_inv"][ii]
            light_gn = normalize(jnp.einsum(
                "rij,ri->rj", inv_hit[:, :, :3], jnp.cross(tris["e1"][ti], tris["e2"][ti])))
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
            if bounce == 0:
                mis_w = jnp.ones_like(mis_w)
            light_contrib = throughput * emission * mis_w[:, None]
        else:
            light_contrib = throughput * emission
        radiance = radiance + jnp.where(is_light[:, None], light_contrib, 0.0)
        alive = alive & ~is_light

        # ---- russian roulette / bounce cap (reference: Pathtracer.cu:199-218) ----
        if bounce == config.num_bounces - 1:
            break
        if config.enable_russian_roulette and bounce > 0:
            survival = jnp.clip(jnp.max(throughput, axis=-1), 0.0, 1.0)
            u_rr = rng.random_float(2 * rng.SampleDimension.RUSSIAN_ROULETTE,
                                    pixel_index, bounce, sample_index, seed)
            killed = u_rr > survival
            alive = alive & ~killed
            throughput = throughput / jnp.maximum(survival, 1e-8)[:, None]

        # ---- surface shading (reference: Pathtracer.cu shade_material) ----
        point, geom_n, shading_n, uv = _interpolate_hit(tris, instances, hit)
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
            "roughness": materials["roughness"][mat_id],
            "ior": materials["ior"][mat_id],
            "eta": materials["eta"][mat_id],
            "k": materials["k"][mat_id],
        }
        albedo = materials["diffuse"][mat_id]
        # Diffuse folds albedo into throughput once at the hit (reference
        # calc_albedo); plastic's diffuse lobe owns its albedo internally.
        is_diffuse = mat_type == int(MaterialType.DIFFUSE)
        throughput = jnp.where((alive & is_diffuse)[:, None],
                               throughput * albedo, throughput)
        can_nee = bsdf_lib.allow_nee(mat_type, mat["roughness"])

        # ---- next-event estimation (reference: Pathtracer.cu:466-555) ----
        if nee_possible:
            u_pick = rng.random_float(2 * rng.SampleDimension.NEE_LIGHT,
                                      pixel_index, bounce, sample_index, seed)
            u_b1 = rng.random_float(2 * rng.SampleDimension.NEE_TRIANGLE,
                                    pixel_index, bounce, sample_index, seed)
            u_b2 = rng.random_float(2 * rng.SampleDimension.NEE_TRIANGLE + 1,
                                    pixel_index, bounce, sample_index, seed)
            k = searchsorted_cdf(lights["cdf"], u_pick)
            lt = lights["tri"][k]
            li = lights["inst"][k]
            lu, lv = sample_triangle_barycentric(u_b1, u_b2)
            lfwd = instances["transform"][li]
            le1 = jnp.einsum("rij,rj->ri", lfwd[:, :, :3], tris["e1"][lt])
            le2 = jnp.einsum("rij,rj->ri", lfwd[:, :, :3], tris["e2"][lt])
            lp0 = jnp.einsum("rij,rj->ri", lfwd[:, :, :3], tris["p0"][lt]) + lfwd[:, :, 3]
            light_point = lp0 + lu[:, None] * le1 + lv[:, None] * le2
            light_gn = normalize(jnp.cross(le1, le2))
            light_emission = materials["emission"][instances["material_id"][li]]

            shadow_o = _offset_origin(point, light_point - point, geom_n)
            light_point = _offset_origin(light_point, shadow_o - light_point, light_gn)
            to_light = light_point - shadow_o
            dist = jnp.linalg.norm(to_light, axis=-1)
            to_light = to_light / jnp.maximum(dist, 1e-20)[:, None]

            cos_light = jnp.abs(jnp.sum(to_light * light_gn, axis=-1))
            omega_o_nee = world_to_local(to_light, tangent, bitangent, shading_n)
            nee_eval = bsdf_lib.bsdf_eval(buffers["luts"], mat, omega_i,
                                          omega_o_nee, albedo, entering)
            light_pdf = (luminance(light_emission) * dist * dist
                         / jnp.maximum(cos_light * lights["total_weight"], 1e-20))
            pdf_ok = jnp.isfinite(light_pdf) & (light_pdf > 1e-20)

            mis_w = power_heuristic(light_pdf, nee_eval.pdf) if config.enable_mis else 1.0
            illumination = (throughput * nee_eval.value * light_emission
                            * (mis_w / jnp.maximum(light_pdf, 1e-20))[:, None])

            want_shadow = alive & can_nee & nee_eval.valid & pdf_ok & (cos_light > 1e-6)
            rays_traced = rays_traced + jnp.sum(want_shadow)
            occluded = trace_any_tlas(nodes, tris, instances, shadow_o, to_light,
                                      jnp.where(want_shadow, dist - 2 * EPSILON,
                                                jnp.float32(0.0)))
            add = want_shadow & ~occluded
            radiance = radiance + jnp.where(add[:, None], illumination, 0.0)

        # ---- BSDF sample -> continuation ray (reference: Pathtracer.cu:745-756) ----
        u_f0 = rng.random_float(2 * rng.SampleDimension.BSDF_0, pixel_index,
                                bounce, sample_index, seed)
        u_f1 = rng.random_float(2 * rng.SampleDimension.BSDF_0 + 1, pixel_index,
                                bounce, sample_index, seed)
        u_b0 = rng.random_float(2 * rng.SampleDimension.BSDF_1, pixel_index,
                                bounce, sample_index, seed)
        u_b1 = rng.random_float(2 * rng.SampleDimension.BSDF_1 + 1, pixel_index,
                                bounce, sample_index, seed)
        sample = bsdf_lib.bsdf_sample(buffers["luts"], mat, omega_i, albedo,
                                      entering, u_f0, u_f1, u_b0, u_b1)
        alive = alive & sample.valid
        throughput = jnp.where(alive[:, None],
                               throughput * sample.throughput_mul, throughput)
        new_dir = local_to_world(sample.omega_o, tangent, bitangent, shading_n)
        new_dir = normalize(new_dir)
        ray_o = _offset_origin(point, new_dir, geom_n)
        ray_d = new_dir
        last_pdf = sample.pdf
        prev_allow_nee = jnp.full(R, bool(config.enable_nee)) & can_nee

    # NaN/Inf poisoning -> magenta, matching the reference's diagnostic
    # (Pathtracer.cu:790-793).
    bad = ~jnp.all(jnp.isfinite(radiance), axis=-1)
    magenta = jnp.array([1.0, 0.0, 1.0], jnp.float32)
    radiance = jnp.where(bad[:, None], magenta, radiance)
    if with_stats:
        return radiance, rays_traced
    return radiance


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

    def reset_accumulation(self) -> None:
        self.sample_index = 0
        self.accumulator = jnp.zeros((self.width * self.height, 3), jnp.float32)

    # -- rendering ----------------------------------------------------------

    def render(self) -> None:
        """Render one sample for every pixel and fold it into the online
        average (reference: kernel_accumulate, Pathtracer.cu:775-796)."""
        if self.buffers is None:
            self.init_device()
        num_pixels = self.width * self.height
        wave = min(self.cpu_config.batch_size, num_pixels)
        camera = {k: jnp.asarray(v) for k, v in self.scene.camera.params().items()}

        frame = jnp.zeros((num_pixels, 3), jnp.float32)
        for offset in range(0, num_pixels, wave):
            idx = offset + jnp.arange(wave, dtype=jnp.int32)
            idx = jnp.minimum(idx, num_pixels - 1)  # tail wave: clamp (dup work)
            colors = render_wave(self.buffers, camera, idx, self.sample_index,
                                 self.gpu_config, self.width, self.cpu_config.seed,
                                 self.scene.has_lights)
            count = min(wave, num_pixels - offset)
            frame = jax.lax.dynamic_update_slice(frame, colors[:count], (offset, 0))

        self.accumulator = self.accumulator + (frame - self.accumulator) / (self.sample_index + 1)
        self.sample_index += 1

    def render_samples(self, n: int) -> np.ndarray:
        for _ in range(n):
            self.render()
        return self.framebuffer()

    def framebuffer(self) -> np.ndarray:
        """(H, W, 3) float32 HDR frame."""
        return np.asarray(self.accumulator).reshape(self.height, self.width, 3)
