"""Multi-chip scaling (SURVEY.md §5.8).

The reference is single-GPU with zero inter-device communication; the natural
TPU extension is sharding the pixel/ray wavefront axis over a
`jax.sharding.Mesh`: path tracing is embarrassingly parallel per pixel, the
scene (BVH, triangles, materials, sky) is replicated per chip, and XLA's SPMD
partitioner splits every per-lane op of the jitted pipeline without inserted
collectives. Only image-space denoising (SVGF/TAA halos) needs neighbor
exchange, handled at that layer.
"""

from gpu_raytracer_tpu.parallel.mesh import make_mesh, shard_render_wave

__all__ = ["make_mesh", "shard_render_wave"]
