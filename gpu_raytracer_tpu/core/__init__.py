"""Host-side core: math, AABB, transforms, RNG (reference layer L0, Src/Core + Src/Math).

The reference implements its own containers/strings/allocators in C++
(Src/Core/Array.h etc.); those are subsumed by Python + numpy here. What
remains domain logic — AABB algebra, affine transforms, quaternions — lives in
this package as vectorised numpy.
"""

from gpu_raytracer_tpu.core.aabb import AABB
from gpu_raytracer_tpu.core import transform

__all__ = ["AABB", "transform"]
