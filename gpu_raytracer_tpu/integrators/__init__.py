"""Integrators (reference layer L4, Src/Renderer/Integrators/): host-side
orchestration of the jitted wavefront stages."""

from gpu_raytracer_tpu.integrators.pathtracer import Pathtracer

__all__ = ["Pathtracer"]
