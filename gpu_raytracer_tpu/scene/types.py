"""Host scene data types.

Where the reference stores fat per-triangle structs (Src/Renderer/Triangle.h)
we keep structure-of-arrays numpy from the start — that is the layout the
device wants, and BVH builders get vectorised sweeps for free.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from gpu_raytracer_tpu.core import transform as xf
from gpu_raytracer_tpu.core.aabb import AABB


class MaterialType(enum.IntEnum):
    """Tagged material kinds (reference: Src/Renderer/Material.h:11-17).

    The integer values are the device-side material keys used for wavefront
    sorting, so their order is part of the device ABI.
    """

    LIGHT = 0
    DIFFUSE = 1
    PLASTIC = 2
    DIELECTRIC = 3
    CONDUCTOR = 4


@dataclass
class Material:
    """Host material (reference: Src/Renderer/Material.h:11-40)."""

    name: str = "Material"
    type: MaterialType = MaterialType.DIFFUSE

    emission: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))

    diffuse: np.ndarray = field(default_factory=lambda: np.full(3, 0.5, np.float32))
    texture_id: int = -1

    linear_roughness: float = 0.5  # stored linearly; alpha = roughness^2 on device

    medium_id: int = -1            # DIELECTRIC: participating medium inside
    index_of_refraction: float = 1.33

    eta: np.ndarray = field(default_factory=lambda: np.array([1.33, 1.33, 1.33], np.float32))
    k: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))

    def is_light(self) -> bool:
        return self.type == MaterialType.LIGHT and bool(np.any(self.emission > 0))


# Specular NEE cutoff: below this roughness a surface is treated as a perfect
# mirror and NEE is skipped (reference: Src/CUDA/Material.h:5).
ROUGHNESS_CUTOFF = 0.05


@dataclass
class Medium:
    """Homogeneous participating medium with artist-friendly parameters
    (reference: Src/Renderer/Medium.h:9-37).

    `C` is the desired multi-scatter albedo and `mfp` the mean free path; the
    Van de Hulst inversion maps them to (sigma_a, sigma_s).
    """

    name: str = "Medium"
    C: np.ndarray = field(default_factory=lambda: np.ones(3, np.float32))
    mfp: np.ndarray = field(default_factory=lambda: np.ones(3, np.float32))
    g: float = 0.0  # Henyey-Greenstein anisotropy

    def to_sigmas(self):
        """Van de Hulst albedo inversion: (C, mfp, g) -> (sigma_a, sigma_s)
        (reference: Src/Renderer/Medium.h:17-26)."""
        C = np.asarray(self.C, np.float64)
        mfp = np.asarray(self.mfp, np.float64)
        s = _van_de_hulst_s(C, self.g)
        sigma_t = 1.0 / np.maximum(mfp, 1e-12)
        alpha = 1.0 - s * s  # single-scattering albedo
        sigma_s = alpha * sigma_t
        sigma_a = sigma_t - sigma_s
        return sigma_a.astype(np.float32), sigma_s.astype(np.float32)

    @staticmethod
    def from_sigmas(name, sigma_a, sigma_s, g: float = 0.0) -> "Medium":
        """Inverse mapping (reference: Src/Renderer/Medium.h:28-36)."""
        sigma_a = np.asarray(sigma_a, np.float64)
        sigma_s = np.asarray(sigma_s, np.float64)
        sigma_t = np.maximum(sigma_a + sigma_s, 1e-12)
        alpha = sigma_s / sigma_t
        s = np.sqrt(np.maximum(1.0 - alpha, 0.0))
        C = _van_de_hulst_albedo(s, g)
        mfp = 1.0 / sigma_t
        return Medium(name=name, C=C.astype(np.float32), mfp=mfp.astype(np.float32), g=float(g))


def _van_de_hulst_albedo(s: np.ndarray, g: float) -> np.ndarray:
    """Van de Hulst similarity: multi-scatter albedo from sqrt(1-alpha)."""
    return (1.0 - s) * (1.0 - 0.139 * s) / (1.0 + 1.17 * s)


def _van_de_hulst_s(C: np.ndarray, g: float) -> np.ndarray:
    """Numerically invert `_van_de_hulst_albedo` for s in [0, 1] (bisection;
    the function is monotonically decreasing in s)."""
    lo = np.zeros_like(C)
    hi = np.ones_like(C)
    for _ in range(48):
        mid = 0.5 * (lo + hi)
        val = _van_de_hulst_albedo(mid, g)
        too_bright = val > C  # need more extinction -> larger s
        lo = np.where(too_bright, mid, lo)
        hi = np.where(too_bright, hi, mid)
    return 0.5 * (lo + hi)


class TriangleData:
    """SoA triangle soup: positions (T,3,3), shading normals (T,3,3), uvs (T,3,2).

    The constructor reproduces the reference's normal hygiene (Src/Renderer/
    Triangle.h:24-60): zero-length shading normals are replaced by the
    geometric normal, and when all three shading normals oppose the geometric
    normal the winding is considered flipped and the geometric normal negated.
    """

    __slots__ = ("positions", "normals", "uvs")

    def __init__(self, positions: np.ndarray, normals: Optional[np.ndarray] = None,
                 uvs: Optional[np.ndarray] = None):
        positions = np.asarray(positions, np.float32).reshape(-1, 3, 3)
        T = positions.shape[0]
        geom_n = np.cross(positions[:, 1] - positions[:, 0], positions[:, 2] - positions[:, 0])
        geom_len = np.linalg.norm(geom_n, axis=-1, keepdims=True)
        geom_n = geom_n / np.maximum(geom_len, 1e-20)

        if uvs is None:
            uvs = np.zeros((T, 3, 2), np.float32)
        else:
            uvs = np.asarray(uvs, np.float32).reshape(T, 3, 2)

        if normals is None:
            normals = np.repeat(geom_n[:, None, :], 3, axis=1)
        else:
            normals = np.asarray(normals, np.float32).reshape(T, 3, 3)
            lengths = np.linalg.norm(normals, axis=-1, keepdims=True)
            normals = np.where(lengths > 1e-12, normals / np.maximum(lengths, 1e-20),
                               geom_n[:, None, :]).astype(np.float32)
            # All three shading normals opposing the geometric normal means
            # the winding is flipped: reverse it (swap vertex 1 <-> 2) so
            # cross(e1, e2) agrees with the authored orientation (reference:
            # Triangle.h fix_winding_order_if_needed). Mirroring (negative-
            # determinant) instance transforms are the common source.
            dots = np.einsum("tvc,tc->tv", normals, geom_n)
            flipped = np.all(dots < 0.0, axis=1)
            if np.any(flipped):
                positions[flipped] = positions[flipped][:, [0, 2, 1]]
                normals[flipped] = normals[flipped][:, [0, 2, 1]]
                uvs[flipped] = uvs[flipped][:, [0, 2, 1]]

        self.positions = positions
        self.normals = normals.astype(np.float32)
        self.uvs = uvs

    def __len__(self) -> int:
        return self.positions.shape[0]

    def aabbs(self):
        """Per-triangle AABB min/max, each (T, 3)."""
        return self.positions.min(axis=1), self.positions.max(axis=1)

    def centroids(self) -> np.ndarray:
        return self.positions.mean(axis=1)

    def aabb(self) -> AABB:
        mn, mx = self.aabbs()
        return AABB(mn.min(axis=0), mx.max(axis=0))

    @staticmethod
    def concatenate(parts: list["TriangleData"]) -> "TriangleData":
        td = TriangleData.__new__(TriangleData)
        td.positions = np.concatenate([p.positions for p in parts], axis=0)
        td.normals = np.concatenate([p.normals for p in parts], axis=0)
        td.uvs = np.concatenate([p.uvs for p in parts], axis=0)
        return td

    def select(self, indices: np.ndarray) -> "TriangleData":
        td = TriangleData.__new__(TriangleData)
        td.positions = self.positions[indices]
        td.normals = self.normals[indices]
        td.uvs = self.uvs[indices]
        return td


@dataclass
class MeshData:
    """Shared geometry + its BLAS — the instancing unit
    (reference: Src/Renderer/MeshData.h:9-12)."""

    triangles: TriangleData
    bvh: Optional["object"] = None  # gpu_raytracer_tpu.bvh.types.BVH2; built lazily
    name: str = ""


@dataclass
class MeshInstance:
    """A placed instance of a MeshData with a material and TRS transform
    (reference: Src/Renderer/Mesh.{h,cpp})."""

    name: str
    mesh_data_id: int
    material_id: int
    position: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    rotation: np.ndarray = field(default_factory=lambda: np.array([0, 0, 0, 1], np.float32))
    scale: float = 1.0

    # Rebuilt by `update()`
    transform: np.ndarray = field(default_factory=xf.identity)
    transform_inv: np.ndarray = field(default_factory=xf.identity)
    transform_prev: np.ndarray = field(default_factory=xf.identity)

    def update(self) -> None:
        """Recompute fwd/inv matrices, keeping the previous frame's transform
        for motion vectors (reference: Src/Renderer/Mesh.cpp:16-33)."""
        self.transform_prev = self.transform
        self.transform = xf.trs(self.position, self.rotation, self.scale)
        self.transform_inv = xf.invert(self.transform)

    def has_identity_transform(self) -> bool:
        return xf.is_identity(self.transform)
