"""Scene layer: geometry, materials, media, camera, sky, scene graph
(reference layer L3, Src/Renderer/{Scene,Mesh,MeshData,Material,Medium,
Texture,Sky,Camera,Triangle}.*)."""

from gpu_raytracer_tpu.scene.types import (
    Material,
    MaterialType,
    Medium,
    MeshData,
    MeshInstance,
    TriangleData,
)
from gpu_raytracer_tpu.scene.camera import Camera
from gpu_raytracer_tpu.scene.sky import Sky
from gpu_raytracer_tpu.scene.scene import Scene

__all__ = [
    "Material",
    "MaterialType",
    "Medium",
    "MeshData",
    "MeshInstance",
    "TriangleData",
    "Camera",
    "Sky",
    "Scene",
]
