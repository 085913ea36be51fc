"""Scene -> device buffers (the analog of the reference's Integrator::
init_geometry / init_materials / init_sky uploads, Src/Renderer/Integrators/
Integrator.cpp:21-311).

The CUDA build aggregates per-mesh BLAS arrays and resolves them through
`cuModuleGetGlobal` device globals; here the whole scene becomes one explicit
pytree of jnp arrays passed to the jitted stages. This module currently emits
a *single-level* BVH over world-space triangles (instances flattened); the
two-level TLAS/BLAS path for shared-BLAS instancing lives in ops/tlas.py and
replaces the flatten once per-frame TLAS rebuilds land.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from gpu_raytracer_tpu.bvh import build_bvh2, collapse
from gpu_raytracer_tpu.bvh.types import BVH2
from gpu_raytracer_tpu.core import transform as xf
from gpu_raytracer_tpu.ops.traverse import LEAF_SIZE
from gpu_raytracer_tpu.scene.scene import Scene
from gpu_raytracer_tpu.scene.types import MaterialType, TriangleData

# Rec.709 luma weights (reference: Src/Math/Math.h luminance).
LUMA = np.array([0.2126, 0.7152, 0.0722], np.float32)


def flatten_scene_triangles(scene: Scene):
    """Instance-flatten all meshes into world space.
    Returns (TriangleData, per-tri material ids)."""
    parts = []
    mat_ids = []
    for inst in scene.instances:
        md = scene.mesh_datas[inst.mesh_data_id]
        tris = md.triangles
        if inst.has_identity_transform():
            world = tris
        else:
            world = TriangleData.__new__(TriangleData)
            world.positions = xf.transform_points(
                inst.transform, tris.positions.reshape(-1, 3)).reshape(-1, 3, 3)
            world.normals = xf.transform_normals(
                inst.transform_inv, tris.normals.reshape(-1, 3)).reshape(-1, 3, 3)
            world.uvs = tris.uvs
        parts.append(world)
        mat_ids.append(np.full(len(tris), inst.material_id, np.int32))
    triangles = TriangleData.concatenate(parts)
    return triangles, np.concatenate(mat_ids)


def pack_materials(scene: Scene) -> dict:
    """Materials as SoA (the analog of the reference's CUDAMaterial union
    array, Integrator.h:92-117 — SoA instead of a union)."""
    M = len(scene.materials)
    out = {
        "type": np.zeros(M, np.int32),
        "emission": np.zeros((M, 3), np.float32),
        "diffuse": np.zeros((M, 3), np.float32),
        "roughness": np.zeros(M, np.float32),
        "ior": np.zeros(M, np.float32),
        "eta": np.zeros((M, 3), np.float32),
        "k": np.zeros((M, 3), np.float32),
        "medium": np.full(M, -1, np.int32),
        "texture": np.full(M, -1, np.int32),
    }
    for i, m in enumerate(scene.materials):
        out["type"][i] = int(m.type)
        out["emission"][i] = m.emission
        out["diffuse"][i] = m.diffuse
        out["roughness"][i] = m.linear_roughness
        out["ior"][i] = m.index_of_refraction
        out["eta"][i] = m.eta
        out["k"][i] = m.k
        out["medium"][i] = m.medium_id
        out["texture"][i] = m.texture_id
    return {k: jnp.asarray(v) for k, v in out.items()}


def pack_mediums(scene: Scene) -> dict:
    """Media as (sigma_a, sigma_s, g) via Van de Hulst inversion
    (reference: Pathtracer.cpp:685-701)."""
    n = max(len(scene.mediums), 1)
    sigma_a = np.zeros((n, 3), np.float32)
    sigma_s = np.zeros((n, 3), np.float32)
    g = np.zeros(n, np.float32)
    for i, med in enumerate(scene.mediums):
        sigma_a[i], sigma_s[i] = med.to_sigmas()
        g[i] = med.g
    return {"sigma_a": jnp.asarray(sigma_a), "sigma_s": jnp.asarray(sigma_s),
            "g": jnp.asarray(g)}


def build_light_cdf(triangles: TriangleData, tri_material: np.ndarray,
                    materials_type: np.ndarray, emission: np.ndarray):
    """Power-weighted light triangle CDF.

    The reference builds a two-level pick (power-weighted mesh CDF, then
    area-weighted triangle CDF within the mesh — Pathtracer.cpp:384-534);
    flattened scenes collapse this into one CDF over light triangles with
    weight area_i * luminance(emission_i): the resulting pick probability is
    identical to the reference's product.
    """
    is_light = (materials_type[tri_material] == int(MaterialType.LIGHT))
    lum = emission[tri_material] @ LUMA
    is_light &= lum > 0
    light_ids = np.nonzero(is_light)[0].astype(np.int32)
    if len(light_ids) == 0:
        return {
            "tri": jnp.zeros(1, jnp.int32),
            "cdf": jnp.ones(1, jnp.float32),
            "area": jnp.ones(1, jnp.float32),
            "weight": jnp.zeros(1, jnp.float32),
            "total_weight": jnp.float32(0.0),
        }
    e1 = triangles.positions[light_ids, 1] - triangles.positions[light_ids, 0]
    e2 = triangles.positions[light_ids, 2] - triangles.positions[light_ids, 0]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
    weight = area * lum[light_ids]
    total = float(weight.sum())
    cdf = np.cumsum(weight) / max(total, 1e-20)
    cdf[-1] = 1.0
    return {
        "tri": jnp.asarray(light_ids),
        "cdf": jnp.asarray(cdf.astype(np.float32)),
        "area": jnp.asarray(area.astype(np.float32)),
        "weight": jnp.asarray(weight.astype(np.float32)),
        "total_weight": jnp.float32(total),
    }


def build_scene_buffers(scene: Scene, sah_cost_node: float = 4.0,
                        sah_cost_leaf: float = 1.0,
                        bvh: Optional[BVH2] = None,
                        lut_samples: int = 16384) -> dict:
    """The full device pytree for the single-level render path."""
    scene.finalize()
    scene.check_materials()
    triangles, tri_material = flatten_scene_triangles(scene)

    if bvh is None:
        bvh = build_bvh2(triangles, sah_cost_node, sah_cost_leaf)
        bvh = collapse(bvh, sah_cost_node, sah_cost_leaf, max_leaf_size=LEAF_SIZE)

    order = bvh.indices
    tris_leaf = triangles.select(order)
    tri_material = tri_material[order]

    pos = tris_leaf.positions
    materials = pack_materials(scene)
    mat_type_np = np.asarray(materials["type"])
    emission_np = np.asarray(materials["emission"])

    sky = scene.sky.data if scene.sky is not None else np.zeros((1, 1, 3), np.float32)

    # Kulla-Conty energy-compensation LUTs: baked only when a material needs
    # them (reference bakes unconditionally at startup, Pathtracer.cpp:182).
    from gpu_raytracer_tpu.ops import kulla_conty

    if scene.has_dielectric or scene.has_conductor:
        luts = kulla_conty.bake_luts(lut_samples)
    else:
        luts = kulla_conty.placeholder_luts()

    return {
        "luts": luts,
        "nodes": {
            "min": jnp.asarray(bvh.node_min),
            "max": jnp.asarray(bvh.node_max),
            "left": jnp.asarray(bvh.node_left),
            "count": jnp.asarray(bvh.node_count),
        },
        "tris": {
            "p0": jnp.asarray(pos[:, 0]),
            "e1": jnp.asarray(pos[:, 1] - pos[:, 0]),
            "e2": jnp.asarray(pos[:, 2] - pos[:, 0]),
            "n0": jnp.asarray(tris_leaf.normals[:, 0]),
            "n1": jnp.asarray(tris_leaf.normals[:, 1]),
            "n2": jnp.asarray(tris_leaf.normals[:, 2]),
            "uv0": jnp.asarray(tris_leaf.uvs[:, 0]),
            "uv1": jnp.asarray(tris_leaf.uvs[:, 1]),
            "uv2": jnp.asarray(tris_leaf.uvs[:, 2]),
            "material": jnp.asarray(tri_material),
        },
        "materials": materials,
        "mediums": pack_mediums(scene),
        "lights": build_light_cdf(tris_leaf, tri_material, mat_type_np, emission_np),
        "sky": jnp.asarray(sky),
        "sky_scale": jnp.float32(scene.sky.scale if scene.sky else 1.0),
    }
