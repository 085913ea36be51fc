"""Scene -> device buffers: the two-level TLAS/BLAS layout
(reference: Integrator::init_geometry aggregation, Src/Renderer/Integrators/
Integrator.cpp:101-283, + build_tlas:399-430).

Unified node array: [fixed-size TLAS region][all BLAS nodes]. Instances share
BLAS data exactly like the reference (MeshData is the instancing unit);
triangles stay in OBJECT space with per-BLAS leaf ordering, and the TLAS
region + instance transform table are refreshed in place per frame
(`refresh_tlas`) without changing any array shape, so scene edits never
trigger an XLA recompile.

Device globals of the CUDA build (resolved by cuModuleGetGlobal) are this
explicit pytree:
  nodes      {min,max (N,3), left,count (N,)}   count: >0 tri leaf, 0 interior,
                                                 -1 instance leaf
  tris       object-space SoA (p0,e1,e2,n0..2,uv0..2) + material id per tri
  instances  {transform, transform_inv (I,3,4), material_id, blas_root (I,)}
  materials  SoA tables        mediums   sigma tables
  lights     world-space power CDF over (instance, triangle) pairs
  luts       Kulla-Conty tables            sky  equirect HDR
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from gpu_raytracer_tpu.bvh.cache import build_blas_cached
from gpu_raytracer_tpu.bvh.tlas import build_tlas, instance_world_aabbs, tlas_region_size
from gpu_raytracer_tpu.core import transform as xf
from gpu_raytracer_tpu.ops.traverse import LEAF_SIZE
from gpu_raytracer_tpu.scene.scene import Scene
from gpu_raytracer_tpu.scene.types import MaterialType

# Rec.709 luma weights (reference: Src/Math/Math.h luminance).
LUMA = np.array([0.2126, 0.7152, 0.0722], np.float32)


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


class GeometryCache:
    """Host-side record of the aggregated BLAS layout, kept so TLAS refreshes
    and light-CDF rebuilds don't re-aggregate geometry."""

    def __init__(self):
        self.blas_root_of_mesh: list = []
        self.tri_base_of_mesh: list = []
        self.tri_count_of_mesh: list = []
        self.tlas_size: int = 0
        # Object-space light geometry per mesh (for the world-area CDF).
        self.obj_e1: Optional[np.ndarray] = None
        self.obj_e2: Optional[np.ndarray] = None


def _aggregate_blas(scene: Scene, sah_cost_node, sah_cost_leaf, force_rebuild):
    """Build every unique BLAS (disk-cached) and aggregate into global
    object-space arrays with offsets (reference: init_geometry)."""
    geo = GeometryCache()
    num_instances = max(len(scene.instances), 1)
    geo.tlas_size = tlas_region_size(num_instances)

    node_mins, node_maxs, node_lefts, node_counts = [], [], [], []
    tri_parts = []
    node_base = geo.tlas_size
    tri_base = 0
    for md in scene.mesh_datas:
        bvh = md.bvh
        if bvh is None:
            bvh = build_blas_cached(md.triangles, sah_cost_node, sah_cost_leaf,
                                    LEAF_SIZE, force_rebuild)
            md.bvh = bvh
        geo.blas_root_of_mesh.append(node_base)
        geo.tri_base_of_mesh.append(tri_base)
        geo.tri_count_of_mesh.append(bvh.num_prims)

        is_leaf = bvh.node_count > 0
        node_mins.append(bvh.node_min)
        node_maxs.append(bvh.node_max)
        node_lefts.append(np.where(is_leaf, bvh.node_left + tri_base,
                                   bvh.node_left + node_base).astype(np.int32))
        node_counts.append(bvh.node_count.astype(np.int32))

        tri_parts.append(md.triangles.select(bvh.indices))
        node_base += bvh.num_nodes
        tri_base += bvh.num_prims

    from gpu_raytracer_tpu.scene.types import TriangleData

    tris = TriangleData.concatenate(tri_parts)
    pos = tris.positions
    geo.obj_e1 = pos[:, 1] - pos[:, 0]
    geo.obj_e2 = pos[:, 2] - pos[:, 0]

    blas = {
        "min": np.concatenate(node_mins, axis=0),
        "max": np.concatenate(node_maxs, axis=0),
        "left": np.concatenate(node_lefts, axis=0),
        "count": np.concatenate(node_counts, axis=0),
    }
    return geo, blas, tris


def _pack_instances(scene: Scene, geo: GeometryCache):
    I = max(len(scene.instances), 1)
    transform = np.tile(np.eye(3, 4, dtype=np.float32), (I, 1, 1))
    transform_inv = np.tile(np.eye(3, 4, dtype=np.float32), (I, 1, 1))
    transform_prev = np.tile(np.eye(3, 4, dtype=np.float32), (I, 1, 1))
    material_id = np.zeros(I, np.int32)
    blas_root = np.zeros(I, np.int32)
    for i, inst in enumerate(scene.instances):
        transform[i] = inst.transform
        transform_inv[i] = inst.transform_inv
        transform_prev[i] = inst.transform_prev
        material_id[i] = inst.material_id
        blas_root[i] = geo.blas_root_of_mesh[inst.mesh_data_id]
    return {
        "transform": jnp.asarray(transform),
        "transform_inv": jnp.asarray(transform_inv),
        "transform_prev": jnp.asarray(transform_prev),
        "material_id": jnp.asarray(material_id),
        "blas_root": jnp.asarray(blas_root),
    }


def _build_lights(scene: Scene, geo: GeometryCache):
    """World-space power-weighted CDF over (instance, triangle) pairs
    (reference two-level pick: power-weighted mesh CDF then area-weighted
    triangle CDF, Pathtracer.cpp:384-534 — flattened here to one CDF whose
    pick probability equals the reference's product)."""
    light_tris, light_insts, weights = [], [], []
    for i, inst in enumerate(scene.instances):
        mat = scene.materials[inst.material_id]
        if not mat.is_light():
            continue
        base = geo.tri_base_of_mesh[inst.mesh_data_id]
        count = geo.tri_count_of_mesh[inst.mesh_data_id]
        e1 = geo.obj_e1[base:base + count]
        e2 = geo.obj_e2[base:base + count]
        lin = inst.transform[:, :3]
        e1w = e1 @ lin.T
        e2w = e2 @ lin.T
        area = 0.5 * np.linalg.norm(np.cross(e1w, e2w), axis=-1)
        lum = float(mat.emission @ LUMA)
        light_tris.append(np.arange(base, base + count, dtype=np.int32))
        light_insts.append(np.full(count, i, np.int32))
        weights.append(area * lum)

    if not light_tris:
        return {
            "tri": jnp.zeros(1, jnp.int32),
            "inst": jnp.zeros(1, jnp.int32),
            "cdf": jnp.ones(1, jnp.float32),
            "total_weight": jnp.float32(0.0),
        }, 0
    weights = np.concatenate(weights)
    total = float(weights.sum())
    cdf = np.cumsum(weights) / max(total, 1e-20)
    cdf[-1] = 1.0
    return {
        "tri": jnp.asarray(np.concatenate(light_tris)),
        "inst": jnp.asarray(np.concatenate(light_insts)),
        "cdf": jnp.asarray(cdf.astype(np.float32)),
        "total_weight": jnp.float32(total),
    }, len(weights)


def build_scene_buffers(scene: Scene, sah_cost_node: float = 4.0,
                        sah_cost_leaf: float = 1.0,
                        force_rebuild: bool = False,
                        lut_samples: int = 16384,
                        geometry_cache: Optional[GeometryCache] = None) -> dict:
    """The full device pytree. Returns buffers; the GeometryCache for
    incremental TLAS refreshes is stored on the scene as `_geometry_cache`."""
    scene.finalize()
    scene.check_materials()

    geo, blas, tris_leaf = _aggregate_blas(scene, sah_cost_node, sah_cost_leaf,
                                           force_rebuild)
    scene._geometry_cache = geo

    # TLAS over current instance world AABBs.
    wmin, wmax = instance_world_aabbs(scene)
    t_min, t_max_, t_left, t_count = build_tlas(wmin, wmax, sah_cost_node, sah_cost_leaf)

    nodes = {
        "min": jnp.asarray(np.concatenate([t_min, blas["min"]], axis=0)),
        "max": jnp.asarray(np.concatenate([t_max_, blas["max"]], axis=0)),
        "left": jnp.asarray(np.concatenate([t_left, blas["left"]], axis=0)),
        "count": jnp.asarray(np.concatenate([t_count, blas["count"]], axis=0)),
    }

    pos = tris_leaf.positions
    # Per-triangle material id (object-space; needed for light lookups when a
    # BLAS is shared by instances with different materials the *instance*
    # material wins — tri_material is only the default).
    materials = pack_materials(scene)
    lights, num_lights = _build_lights(scene, geo)

    sky = scene.sky.data if scene.sky is not None else np.zeros((1, 1, 3), np.float32)

    from gpu_raytracer_tpu.ops import kulla_conty

    if scene.has_dielectric or scene.has_conductor:
        luts = kulla_conty.bake_luts(lut_samples)
    else:
        luts = kulla_conty.placeholder_luts()

    return {
        "nodes": nodes,
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
        },
        "instances": _pack_instances(scene, geo),
        "materials": materials,
        "mediums": pack_mediums(scene),
        "lights": lights,
        "luts": luts,
        "sky": jnp.asarray(sky),
        "sky_scale": jnp.float32(scene.sky.scale if scene.sky else 1.0),
    }


def refresh_tlas(buffers: dict, scene: Scene) -> dict:
    """Per-frame TLAS + instance-table refresh after scene-graph updates
    (reference: Integrator::build_tlas per frame). Shapes are unchanged, so
    jitted pipelines keep their compilations."""
    geo: GeometryCache = scene._geometry_cache
    wmin, wmax = instance_world_aabbs(scene)
    t_min, t_max_, t_left, t_count = build_tlas(wmin, wmax)
    size = geo.tlas_size

    nodes = dict(buffers["nodes"])
    nodes["min"] = nodes["min"].at[:size].set(jnp.asarray(t_min))
    nodes["max"] = nodes["max"].at[:size].set(jnp.asarray(t_max_))
    nodes["left"] = nodes["left"].at[:size].set(jnp.asarray(t_left))
    nodes["count"] = nodes["count"].at[:size].set(jnp.asarray(t_count))

    out = dict(buffers)
    out["nodes"] = nodes
    out["instances"] = _pack_instances(scene, geo)
    lights, _ = _build_lights(scene, geo)
    # Light CDF shape changes only if light materials changed; that path goes
    # through a full rebuild (invalidated_materials).
    if lights["tri"].shape == buffers["lights"]["tri"].shape:
        out["lights"] = lights
    return out
