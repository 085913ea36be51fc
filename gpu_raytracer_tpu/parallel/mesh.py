"""Device mesh + sharded render step.

Sharding layout:
  * wavefront arrays (pixel_index, radiance out): sharded on axis "pixels"
  * scene buffers (BVH nodes, triangles, materials, lights, sky, wide/Pallas
    traversal tables): replicated — path tracing is embarrassingly parallel
    per pixel (SURVEY §5.8)
  * camera pytree: replicated

The trace stage runs under `jax.shard_map`: each chip executes the FULL
single-chip `render_wave` program — including the Pallas traversal
kernels — on its pixel slice against its replica of the scene. shard_map
(not bare GSPMD sharding) is what lets the production Pallas path run
multi-chip: the kernel is invoked per-shard on local blocks, so no
partitioning rule for `pallas_call` is needed, and the same code path that
the single-chip benchmarks exercise is what scales out. No collectives are
needed during tracing; only the denoiser's stencils need halos
(parallel/denoise.py, GSPMD).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "pixels") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    import numpy as np

    return Mesh(np.array(devices), (axis_name,))


def shard_render_wave(mesh: Mesh, config, width: int, seed: int = 0,
                      has_lights: bool = True, axis_name: str = "pixels",
                      mat_types=None, has_textures: bool = False,
                      has_media: bool = False, use_pallas: bool = False,
                      use_wide: bool = False, use_pallas_shade: bool = False,
                      use_gather_shade: bool = False, use_stream: bool = False,
                      with_aovs: bool = False):
    """Bind a pixel-sharded `render_wave` over `mesh`. Returns
    fn(buffers, camera, pixel_index, sample_index) -> (R, 3) radiance
    (or the AOV dict when `with_aovs`) with the pixel axis sharded.

    All single-chip fast-path flags (`use_wide`/`use_pallas`/
    `use_pallas_shade`, textures, media, static material set) plumb
    through, so multi-chip renders run the SAME production pipeline as
    single-chip ones — traversal tables replicate like any other scene
    buffer."""
    from gpu_raytracer_tpu.integrators.pathtracer import render_wave

    def step_local(buffers, camera, pixel_index, sample_index):
        return render_wave(buffers, camera, pixel_index, sample_index,
                           config, width, seed, has_lights,
                           has_textures=has_textures, has_media=has_media,
                           use_pallas=use_pallas, use_wide=use_wide,
                           use_pallas_shade=use_pallas_shade,
                           use_gather_shade=use_gather_shade,
                           use_stream=use_stream,
                           with_aovs=with_aovs, mat_types=mat_types)

    out_spec = P(axis_name)
    if with_aovs:
        # dict of (R,)/(R, 3) leaves, all pixel-sharded
        out_specs = {k: out_spec for k in
                     ("radiance", "direct", "indirect", "albedo", "normal",
                      "position", "position_prev", "depth", "instance")}
    else:
        out_specs = out_spec

    sharded = jax.shard_map(
        step_local, mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P()),
        out_specs=out_specs,
        check_vma=False)
    return jax.jit(sharded)


def place_replicated(mesh: Mesh, tree):
    """Put a pytree on the mesh fully replicated."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def place_sharded(mesh: Mesh, array, axis_name: str = "pixels"):
    return jax.device_put(array, NamedSharding(mesh, P(axis_name)))
