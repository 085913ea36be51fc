"""Ambient-occlusion integrator (reference: Src/Renderer/Integrators/AO.{h,cpp}
+ Src/CUDA/AO.cu:100-163).

Per sample: primary trace -> cosine-hemisphere occlusion ray with
max_distance = ao_radius -> visibility average. The reference runs this as a
3-kernel wavefront; here it is one jitted program sharing the path tracer's
traversal and camera stages.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from gpu_raytracer_tpu.config import CPUConfig, GPUConfig, Invalidation
from gpu_raytracer_tpu.integrators.pathtracer import (
    EPSILON,
    INF,
    _interpolate_hit,
    _offset_origin,
)
from gpu_raytracer_tpu.ops import rng
from gpu_raytracer_tpu.ops.camera_rays import generate_primary_rays
from gpu_raytracer_tpu.ops.sampling import (
    local_to_world,
    orthonormal_basis,
    sample_cosine_hemisphere,
)
from gpu_raytracer_tpu.ops.pallas_traverse import trace_any_pallas, trace_closest_pallas
from gpu_raytracer_tpu.ops.pallas_wide import trace_any_wide, trace_closest_wide
from gpu_raytracer_tpu.ops.traverse import trace_any_tlas, trace_closest_tlas
from gpu_raytracer_tpu.scene.scene import Scene


@functools.partial(jax.jit, static_argnames=("config", "width", "seed",
                                              "use_pallas", "use_wide",
                                              "use_stream"))
def render_wave_ao(buffers: dict, camera: dict, pixel_index: jnp.ndarray,
                   sample_index, config: GPUConfig, width: int, seed: int = 0,
                   use_pallas: bool = False, use_wide: bool = False,
                   use_stream: bool = False):
    """One AO sample for a wave of pixels -> (R, 3) grayscale visibility."""
    R = pixel_index.shape[0]
    nodes, tris = buffers["nodes"], buffers["tris"]
    instances = buffers["instances"]

    ray_o, ray_d = generate_primary_rays(
        camera, pixel_index, width, sample_index, config.reconstruction_filter, seed)
    if use_stream:
        from gpu_raytracer_tpu.ops.pallas_stream import trace_closest_stream

        hit = trace_closest_stream(buffers["wide_stream"], ray_o, ray_d,
                                   jnp.full(R, INF))
        p_inst, p_tri = buffers["stream_prim"]
        code = jnp.maximum(hit.tri, 0)
        ok = hit.tri >= 0
        hit = hit._replace(tri=jnp.where(ok, p_tri[code], hit.tri),
                           inst=jnp.where(ok, p_inst[code], hit.inst))
    elif use_wide:
        hit = trace_closest_wide(*buffers["wide"], ray_o, ray_d,
                                 jnp.full(R, INF))
        pm = buffers.get("wide_prim_map")
        if pm is not None:
            # Flattened static tables return per-instance PRIM ids
            # (buffers._pack_wide_merged): unpack (inst, tri).
            code = pm[jnp.maximum(hit.tri, 0)]
            ok = hit.tri >= 0
            hit = hit._replace(tri=jnp.where(ok, code & 0x3FFFFF, hit.tri),
                               inst=jnp.where(ok, code >> 22, hit.inst))
    elif use_pallas:
        hit = trace_closest_pallas(*buffers["pallas"], ray_o, ray_d,
                                   jnp.full(R, INF))
    else:
        hit = trace_closest_tlas(nodes, tris, instances, ray_o, ray_d,
                                 jnp.full(R, INF))
    hit_surface = hit.tri >= 0

    from gpu_raytracer_tpu.ops.vec import fetch_rows

    irow = fetch_rows(instances["rows"], jnp.maximum(hit.inst, 0))
    point, geom_n, shading_n, _, _, _, _ = _interpolate_hit(tris, irow, hit)
    facing = jnp.sum(ray_d * geom_n, axis=-1) < 0.0
    flip = jnp.where(facing, 1.0, -1.0)[:, None]
    geom_n = geom_n * flip
    shading_n = shading_n * flip

    u1 = rng.random_float(2 * rng.SampleDimension.BSDF_0, pixel_index, 0,
                          sample_index, seed)
    u2 = rng.random_float(2 * rng.SampleDimension.BSDF_0 + 1, pixel_index, 0,
                          sample_index, seed)
    local_dir, _ = sample_cosine_hemisphere(u1, u2)
    tangent, bitangent = orthonormal_basis(shading_n)
    ao_dir = local_to_world(local_dir, tangent, bitangent, shading_n)
    ao_o = _offset_origin(point, ao_dir, geom_n)

    ao_tmax = jnp.where(hit_surface, jnp.float32(config.ao_radius), 0.0)
    if use_stream:
        from gpu_raytracer_tpu.ops.pallas_stream import trace_any_stream

        occluded = trace_any_stream(buffers["wide_stream"], ao_o, ao_dir,
                                    ao_tmax)
    elif use_wide:
        from gpu_raytracer_tpu.ops.ray_sort import trace_sorted

        occluded = trace_sorted(
            lambda o, d, t: trace_any_wide(*buffers["wide"], o, d, t),
            ao_o, ao_dir, ao_tmax,
            buffers["nodes"]["root_min"], buffers["nodes"]["root_max"])
    elif use_pallas:
        occluded = trace_any_pallas(*buffers["pallas"], ao_o, ao_dir, ao_tmax)
    else:
        occluded = trace_any_tlas(nodes, tris, instances, ao_o, ao_dir, ao_tmax)
    visibility = jnp.where(hit_surface, (~occluded).astype(jnp.float32), 1.0)
    return jnp.broadcast_to(visibility[:, None], (R, 3))


class AO:
    """Host orchestrator mirroring Pathtracer's interface."""

    def __init__(self, scene: Scene, cpu_config: Optional[CPUConfig] = None,
                 gpu_config: Optional[GPUConfig] = None):
        self.scene = scene
        self.cpu_config = cpu_config or scene.config
        self.gpu_config = gpu_config or GPUConfig()
        self.invalidated = Invalidation()
        self.width = scene.film_width
        self.height = scene.film_height
        self.buffers = None
        self.accumulator = None
        self.sample_index = 0

    def init_device(self) -> None:
        from gpu_raytracer_tpu.ops.buffers import build_scene_buffers

        self.buffers = build_scene_buffers(
            self.scene, self.cpu_config.sah_cost_node, self.cpu_config.sah_cost_leaf)
        self.reset_accumulation()

    def reset_accumulation(self) -> None:
        self.sample_index = 0
        self.accumulator = jnp.zeros((self.width * self.height, 3), jnp.float32)

    def update(self, delta: float = 0.0) -> None:
        if self.buffers is None or self.invalidated.any():
            self.scene.update(delta)
            self.init_device()
            self.invalidated.clear()

    def render(self) -> None:
        if self.buffers is None:
            self.init_device()
        num_pixels = self.width * self.height
        camera = {k: jnp.asarray(v) for k, v in self.scene.camera.params().items()}
        idx = jnp.arange(num_pixels, dtype=jnp.int32)
        use_pallas = (self.buffers.get("pallas") is not None
                      and jax.default_backend() == "tpu")
        use_wide = (not use_pallas and self.buffers.get("wide") is not None
                    and jax.default_backend() == "tpu")
        use_stream = (self.buffers.get("wide_stream") is not None
                      and jax.default_backend() == "tpu")
        frame = render_wave_ao(self.buffers, camera, idx, self.sample_index,
                               self.gpu_config, self.width, self.cpu_config.seed,
                               use_pallas=use_pallas, use_wide=use_wide,
                               use_stream=use_stream)
        self.accumulator = self.accumulator + (frame - self.accumulator) / (self.sample_index + 1)
        self.sample_index += 1

    def render_samples(self, n: int) -> np.ndarray:
        for _ in range(n):
            self.render()
        return self.framebuffer()

    def framebuffer(self) -> np.ndarray:
        return np.asarray(self.accumulator).reshape(self.height, self.width, 3)
