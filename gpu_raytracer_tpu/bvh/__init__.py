"""Acceleration structures (reference layer L2, Src/BVH/).

Host-side construction of flat structure-of-arrays BVHs, built for direct
upload to the device traversal kernels. Unlike the reference's pointer-free
but AoS node structs (Src/BVH/BVH.h), everything here is SoA numpy from the
start — the TPU traversal gathers node planes as vectors.
"""

from gpu_raytracer_tpu.bvh.types import BVH2, BVHStats
from gpu_raytracer_tpu.bvh.sah import SAHBuilder, build_bvh2
from gpu_raytracer_tpu.bvh.collapse import collapse

__all__ = ["BVH2", "BVHStats", "SAHBuilder", "build_bvh2", "collapse"]
