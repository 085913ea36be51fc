"""Device mesh + sharded render step.

Sharding layout:
  * wavefront arrays (pixel_index, radiance out): sharded on axis "pixels"
  * scene buffers (BVH nodes, triangles, materials, lights, sky): replicated
  * camera pytree: replicated

`shard_render_wave` returns a jitted render step with those shardings bound;
XLA SPMD then partitions the traversal while-loop per chip with no
collectives (each chip traces its pixel slice against its replica of the
scene). The accumulate stage stays sharded too — only final framebuffer
readback gathers to host.
"""

from __future__ import annotations

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
                      mat_types=None):
    """Bind shardings for `render_wave` over `mesh`. Returns
    fn(buffers, camera, pixel_index, sample_index) -> (R, 3) radiance with the
    pixel axis sharded across the mesh."""
    from gpu_raytracer_tpu.integrators.pathtracer import render_wave

    sharded = NamedSharding(mesh, P(axis_name))
    replicated = NamedSharding(mesh, P())

    def step(buffers, camera, pixel_index, sample_index):
        return render_wave(buffers, camera, pixel_index, sample_index,
                           config, width, seed, has_lights,
                           mat_types=mat_types)

    return jax.jit(
        step,
        in_shardings=(replicated, replicated, sharded, replicated),
        out_shardings=sharded,
    )


def place_replicated(mesh: Mesh, tree):
    """Put a pytree on the mesh fully replicated."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def place_sharded(mesh: Mesh, array, axis_name: str = "pixels"):
    return jax.device_put(array, NamedSharding(mesh, P(axis_name)))
