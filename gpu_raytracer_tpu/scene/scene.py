"""Scene graph + asset management (reference: Src/Renderer/Scene.{h,cpp},
Src/Assets/AssetManager.{h,cpp}).

The reference splits these into Scene (graph) and AssetManager (dedup caches +
thread-pool loads). Here they are one class: Python loaders are fast enough
in-line for the bundled scenes, the dedup caches are plain dicts, and BVH
builds are deferred to `build_bvhs()` which can fan out over a process pool
(the host is single-core in this environment, so the default is in-line).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import numpy as np

from gpu_raytracer_tpu.config import CPUConfig
from gpu_raytracer_tpu.scene.camera import Camera
from gpu_raytracer_tpu.scene.sky import Sky
from gpu_raytracer_tpu.scene.types import (
    Material,
    MaterialType,
    Medium,
    MeshData,
    MeshInstance,
    TriangleData,
)


@dataclass
class TextureSlot:
    filename: str
    name: str
    data: Optional[np.ndarray] = None  # decoded on demand by the texture packer


class Scene:
    def __init__(self, config: Optional[CPUConfig] = None):
        self.config = config or CPUConfig()

        # Default pink material at id 0 (reference: AssetManager.cpp:17-20).
        default = Material(name="Default", diffuse=np.array([1.0, 0.0, 1.0], np.float32))
        self.materials: List[Material] = [default]
        self.mediums: List[Medium] = []
        self.mesh_datas: List[MeshData] = []
        self.instances: List[MeshInstance] = []
        self.textures: List[TextureSlot] = []

        self._mesh_data_cache: Dict[str, int] = {}
        self._texture_cache: Dict[str, int] = {}

        self.camera = Camera()
        self.sky_filename: Optional[str] = self.config.sky_filename
        self.sky: Optional[Sky] = None
        self.film_width: int = self.config.initial_width
        self.film_height: int = self.config.initial_height
        self.integrator_max_depth: Optional[int] = None

        # Material-presence flags driving which shade stages are traced into
        # the pipeline (reference: Src/Renderer/Scene.cpp:49-69).
        self.has_diffuse = False
        self.has_plastic = False
        self.has_dielectric = False
        self.has_conductor = False
        self.has_lights = False

    # -- construction ------------------------------------------------------

    @staticmethod
    def from_config(config: CPUConfig) -> "Scene":
        """Load every configured scene file (reference: Scene.cpp:18-43)."""
        scene = Scene(config)
        for filename in config.scene_filenames:
            scene.load_file(filename)
        if config.sky_filename:
            scene.sky_filename = config.sky_filename
        scene.camera.resize(scene.film_width, scene.film_height)
        scene.finalize()
        return scene

    def load_file(self, filename: str) -> None:
        ext = os.path.splitext(filename)[1].lower()
        if ext == ".obj":
            from gpu_raytracer_tpu.assets import obj

            handle = self.add_mesh_data_from_file(filename, obj.load)
            inst = self.add_instance(os.path.basename(filename), handle, 0)
            inst.update()
        elif ext == ".ply":
            from gpu_raytracer_tpu.assets import ply

            handle = self.add_mesh_data_from_file(filename, ply.load)
            inst = self.add_instance(os.path.basename(filename), handle, 0)
            inst.update()
        elif ext == ".xml":
            from gpu_raytracer_tpu.assets import mitsuba

            mitsuba.load(filename, self)
        else:
            raise ValueError(f"unsupported scene file format: {filename}")

    def finalize(self) -> None:
        """Post-load: join async loads, material flags, sky decode."""
        self.wait_until_loaded()
        self.check_materials()
        if self.sky is None:
            if self.sky_filename:
                self.sky = Sky.load(self.sky_filename)
            else:
                self.sky = Sky.constant([0.0, 0.0, 0.0])

    # -- asset registration (dedup caches, reference AssetManager) ----------

    def add_mesh_data(self, triangles: TriangleData, name: str = "") -> int:
        self.mesh_datas.append(MeshData(triangles=triangles, name=name))
        return len(self.mesh_datas) - 1

    def add_mesh_data_from_file(self, filename: str, loader: Callable[[str], TriangleData],
                                cache_key: Optional[str] = None) -> int:
        """Async mesh registration (reference: AssetManager::add_mesh_data
        submits the load to the ThreadPool and returns the handle
        immediately, AssetManager.cpp:57-95). The future resolves in
        `wait_until_loaded` (called from finalize)."""
        from gpu_raytracer_tpu.utils import pool

        key = cache_key or filename
        if key in self._mesh_data_cache:
            return self._mesh_data_cache[key]
        handle = self.add_mesh_data(None, name=os.path.basename(filename))
        self.mesh_datas[handle]._future = pool.submit(loader, filename)
        self.mesh_datas[handle]._filename = filename
        self._mesh_data_cache[key] = handle
        return handle

    def wait_until_loaded(self) -> None:
        """Join every outstanding mesh load (reference:
        AssetManager::wait_until_loaded = ThreadPool::sync). Failed loads
        degrade to a dummy triangle like the reference
        (AssetManager.cpp:66-79) instead of aborting the scene."""
        for md in self.mesh_datas:
            fut = getattr(md, "_future", None)
            if fut is None:
                continue
            try:
                md.triangles = fut.result()
            except (OSError, ValueError) as exc:
                print(f"WARNING: failed to load mesh "
                      f"{getattr(md, '_filename', md.name)!r}: {exc}")
                dummy = np.zeros((1, 3, 3), np.float32)
                dummy[0, 1, 0] = 1e-6
                dummy[0, 2, 1] = 1e-6
                md.triangles = TriangleData(dummy)
            md._future = None

    def add_material(self, material: Material) -> int:
        self.materials.append(material)
        return len(self.materials) - 1

    def add_medium(self, medium: Medium) -> int:
        self.mediums.append(medium)
        return len(self.mediums) - 1

    def add_texture(self, filename: str) -> int:
        if filename in self._texture_cache:
            return self._texture_cache[filename]
        self.textures.append(TextureSlot(filename=filename, name=os.path.basename(filename)))
        handle = len(self.textures) - 1
        self._texture_cache[filename] = handle
        return handle

    def add_instance(self, name: str, mesh_data_id: int, material_id: Optional[int]) -> MeshInstance:
        inst = MeshInstance(name=name, mesh_data_id=mesh_data_id,
                            material_id=material_id if material_id is not None else 0)
        self.instances.append(inst)
        return inst

    # -- per-frame ----------------------------------------------------------

    def update(self, delta: float = 0.0) -> None:
        """Recompute instance transforms (reference: Scene.cpp update)."""
        for inst in self.instances:
            inst.update()

    def check_materials(self) -> None:
        used = {self.materials[i.material_id].type for i in self.instances}
        self.has_diffuse = MaterialType.DIFFUSE in used
        self.has_plastic = MaterialType.PLASTIC in used
        self.has_dielectric = MaterialType.DIELECTRIC in used
        self.has_conductor = MaterialType.CONDUCTOR in used
        self.has_lights = any(
            self.materials[i.material_id].is_light() for i in self.instances
        )

    # -- stats ---------------------------------------------------------------

    def triangle_count(self) -> int:
        return sum(len(self.mesh_datas[i.mesh_data_id].triangles) for i in self.instances)

    def unique_triangle_count(self) -> int:
        return sum(len(md.triangles) for md in self.mesh_datas)
