"""Multi-chip denoised frame: trace + SVGF + TAA in ONE jit program
(SURVEY §5.8; reference single-GPU equivalent: Pathtracer::render() SVGF
branch, Src/CUDA/SVGF/SVGF.h:130-609).

Sharding layout:
  * tracing wavefront: pixel axis sharded via `jax.shard_map` — each chip
    runs the full production `render_wave` (incl. Pallas traversal kernels)
    on its pixel rows against replicated scene buffers (parallel/mesh.py)
  * SVGF/TAA images + history: first (row) axis sharded with the SAME
    partitioning, so the reshape (H*W,) -> (H, W, C) is layout-free
  * scene buffers / camera / view-projection: replicated

The à-trous/variance stencils and the reprojection gathers are written as
plain jnp ops; GSPMD propagates the row sharding through them and inserts
the halo/gather collectives itself — the XLA-native alternative to
hand-written ppermute halo exchange. The whole frame is one jit, so the
trace -> denoise boundary never leaves the device.

The single-chip path routes the spatial stages through fused Pallas
stencils (ops/pallas_svgf.py); here they stay XLA on purpose: a sharded
pallas_call would need hand-written ppermute halo exchange per pass for
the 32-pixel à-trous halos, while GSPMD already inserts exactly those
collectives around the jnp form."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_denoised_step(mesh: Mesh, config, width: int, height: int,
                        seed: int = 0, has_lights: bool = True,
                        has_textures: bool = False, has_media: bool = False,
                        use_pallas: bool = False, use_wide: bool = False,
                        use_gather_shade: bool = False,
                        use_stream: bool = False,
                        axis_name: str = "pixels", mat_types=None):
    """Returns jitted
    fn(buffers, camera, pixel_index, sample_index, history, vp_prev,
       taa_prev, is_first) -> (colour (H, W, 3), new_history, new_taa_prev)
    with pixel/row shardings bound. `history` is ops/svgf.SVGFHistory.

    The fast-path flags (`use_wide`/`use_pallas`, textures, media,
    `mat_types`) plumb through to the traced wavefront, so the sharded
    denoised frame exercises the same production pipeline as the
    single-chip one."""
    from gpu_raytracer_tpu.integrators.pathtracer import render_wave
    from gpu_raytracer_tpu.ops import svgf as svgf_ops
    from gpu_raytracer_tpu.ops import taa as taa_ops

    sharded = NamedSharding(mesh, P(axis_name))
    replicated = NamedSharding(mesh, P())

    aov_keys = ("direct", "indirect", "albedo", "normal", "depth",
                "instance", "position_prev")

    def trace_local(buffers, camera, pixel_index, sample_index):
        aovs = render_wave(buffers, camera, pixel_index, sample_index,
                           config, width, seed, has_lights,
                           has_textures=has_textures, has_media=has_media,
                           use_pallas=use_pallas, use_wide=use_wide,
                           use_gather_shade=use_gather_shade,
                           use_stream=use_stream,
                           with_aovs=True, mat_types=mat_types)
        return {k: aovs[k] for k in aov_keys}

    trace_sharded = jax.shard_map(
        trace_local, mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P()),
        out_specs={k: P(axis_name) for k in aov_keys},
        check_vma=False)

    def step(buffers, camera, pixel_index, sample_index, history, vp_prev,
             taa_prev, is_first):
        aovs = trace_sharded(buffers, camera, pixel_index, sample_index)

        def img(x):
            out = x.reshape((height, width) + x.shape[1:])
            return jax.lax.with_sharding_constraint(
                out, NamedSharding(mesh, P(axis_name)))

        frame = {k: img(aovs[k]) for k in aov_keys}
        colour, new_history = svgf_ops.svgf_step(frame, history, vp_prev,
                                                 config)
        if config.enable_taa:
            taa_in = taa_ops.to_taa_space(jnp.maximum(colour, 0.0))
            prev = jnp.where(is_first, taa_in, taa_prev)
            screen_prev = svgf_ops.project_to_screen(
                frame["position_prev"], vp_prev, width, height)
            taa_out = taa_ops.taa_step(taa_in, prev, screen_prev)
            colour = taa_ops.from_taa_space(taa_out)
        else:
            taa_out = taa_prev
        return colour, new_history, taa_out

    hist_sharding = jax.tree.map(lambda _: sharded,
                                 _history_structure(height, width))
    return jax.jit(
        step,
        in_shardings=(replicated, replicated, sharded, replicated,
                      hist_sharding, replicated, sharded, replicated),
        out_shardings=(sharded, hist_sharding, sharded),
    )


def _history_structure(height: int, width: int):
    from gpu_raytracer_tpu.ops import svgf as svgf_ops

    return svgf_ops.init_history(height, width)
