"""gpu_raytracer_tpu — a TPU-native wavefront path tracing framework.

A from-scratch re-design of the capabilities of jan-van-bergen/GPU-Raytracer
(an interactive CUDA wavefront path tracer) for TPU hardware:

  * host side  — Python/numpy scene + asset + BVH construction layer
  * device side — JAX/XLA jitted wavefront stages and Pallas kernels
  * parallel   — pixel-space sharding over a `jax.sharding.Mesh`

The CUDA reference communicates between kernels through global-memory queues
with atomic counters; here the wavefront is a fixed-capacity structure-of-
arrays ray arena threaded functionally through jitted stages, with sort/scan
based compaction instead of atomics (reference: Src/CUDA/Pathtracer.cu).
"""

__version__ = "0.1.0"

from gpu_raytracer_tpu.config import CPUConfig, GPUConfig, BVHType, IntegratorType

__all__ = [
    "CPUConfig",
    "GPUConfig",
    "BVHType",
    "IntegratorType",
    "__version__",
]
