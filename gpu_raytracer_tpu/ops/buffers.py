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
    packed = dict(out)
    # (M, 24) shading rows [type | emission 3 | diffuse 3 | rough | ior |
    # eta 3 | k 3 | texture | medium | pad]: one fetch_rows per bounce
    # replaces ~16 per-column gathers.
    packed["rows"] = np.asarray(np.concatenate(
        [out["type"][:, None].astype(np.float32), out["emission"],
         out["diffuse"], out["roughness"][:, None], out["ior"][:, None],
         out["eta"], out["k"], out["texture"][:, None].astype(np.float32),
         out["medium"][:, None].astype(np.float32),
         np.zeros((M, 7), np.float32)], axis=-1))
    # Component-major (3, M) copies: the shading path gathers per-ray
    # material vectors as 3 scalar row gathers (row gathers of (M, 3)
    # relayout the minor dim per ray — measured megacycles on TPU).
    for k in ("emission", "diffuse", "eta", "k"):
        packed[k + "_T"] = np.asarray(out[k]).T.copy()
    return packed


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
    return {"sigma_a": sigma_a, "sigma_s": sigma_s, "g": g}


def _pack_nodes(node_min, node_max, node_left, node_count) -> dict:
    """Device node layout, tuned for TPU gather economics: every while-loop
    iteration fetches ONE (N, 12) row of the popped node's CHILD AABBs plus
    one (N, 2) int row (left, count) — instead of 6+ separate column gathers
    (measured ~7x cheaper; see tools/profile_traversal.py findings).

    Leaf and instance-leaf rows carry empty (never-hit) child boxes."""
    n = node_min.shape[0]
    child_aabb = np.full((n, 12), np.inf, np.float32)
    child_aabb[:, 3:6] = -np.inf
    child_aabb[:, 9:12] = -np.inf
    interior = node_count == 0
    l = np.where(interior, node_left, 0)
    child_aabb[interior, 0:3] = node_min[l[interior]]
    child_aabb[interior, 3:6] = node_max[l[interior]]
    child_aabb[interior, 6:9] = node_min[l[interior] + 1]
    child_aabb[interior, 9:12] = node_max[l[interior] + 1]
    return {
        # Component-major (12, N): row j is a contiguous (N,) gather source;
        # the traversal fetches child AABBs as 12 flat scalar gathers.
        "child_aabb_T": child_aabb.T.copy(),
        # Root AABB for the pre-test + host-side tools.
        "root_min": node_min[0].copy(),
        "root_max": node_max[0].copy(),
        "min": node_min,
        "max": node_max,
        "left": node_left.astype(np.int32),
        "count": node_count.astype(np.int32),
    }


class GeometryCache:
    """Host-side record of the aggregated BLAS layout, kept so TLAS refreshes
    and light-CDF rebuilds don't re-aggregate geometry."""

    def __init__(self):
        self.blas_root_of_mesh: list = []
        self.tri_base_of_mesh: list = []
        self.tri_count_of_mesh: list = []
        # One canonical leaf slot per ORIGINAL mesh triangle (first occurrence
        # in bvh.indices): SBVH spatial splits duplicate straddling triangles
        # in leaf order, and a light CDF over raw leaf slots would weight each
        # duplicate fully, biasing NEE bright (reference builds its CDF from
        # original mesh triangles, Pathtracer.cpp calc_light_power).
        self.canon_slots_of_mesh: list = []
        self.tlas_size: int = 0
        # Object-space light geometry per mesh (for the world-area CDF).
        self.obj_e1: Optional[np.ndarray] = None
        self.obj_e2: Optional[np.ndarray] = None
        # Leaf-order (T, 9) [p0|e1|e2] geometry for wide-table repacks.
        self.tri_geo: Optional[np.ndarray] = None


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
    from gpu_raytracer_tpu.config import BVHType

    cfg = scene.config
    builder = "sbvh" if (cfg and cfg.bvh_type == BVHType.SBVH) else "sah"
    sbvh_alpha = cfg.sbvh_alpha if cfg else 1e-4
    # BLAS builds stay SERIAL: measured 25s serial vs 35s on the thread
    # pool for Sponza's 383 meshes (the Python partition bookkeeping is
    # GIL-bound, so threads only add contention) — unlike mesh/texture
    # loads, which the pool does help (scene/scene.py, texture decode).
    for md in scene.mesh_datas:
        bvh = md.bvh
        if bvh is None:
            bvh = build_blas_cached(
                md.triangles, sah_cost_node, sah_cost_leaf, LEAF_SIZE,
                force_rebuild, builder=builder, sbvh_alpha=sbvh_alpha,
                optimize_tree=bool(cfg and cfg.enable_bvh_optimization),
                optimize_max_batches=cfg.bvh_optimizer_max_num_batches if cfg else 1000,
                optimize_max_time_ms=cfg.bvh_optimizer_max_time_ms if cfg else 60_000)
            md.bvh = bvh
        geo.blas_root_of_mesh.append(node_base)
        geo.tri_base_of_mesh.append(tri_base)
        geo.tri_count_of_mesh.append(bvh.num_prims)
        order = np.argsort(bvh.indices, kind="stable")
        sorted_ids = bvh.indices[order]
        first = np.ones(len(order), bool)
        first[1:] = sorted_ids[1:] != sorted_ids[:-1]
        geo.canon_slots_of_mesh.append(order[first].astype(np.int32))

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
    # Baked per-instance material facts (round 5): the gather-shade bounce
    # body needs only tex_id / lod bias / medium id from the material row —
    # baking them here lets XLA DCE the whole (R,)-row materials gather
    # (~100 ms of start latency per bounce at 1080p, README round-2 law).
    tex_id = np.full(I, -1.0, np.float32)
    tex_lod = np.zeros(I, np.float32)
    medium_id = np.full(I, -1.0, np.float32)
    tex_max_mip = np.zeros(I, np.float32)
    # Arithmetic mip addressing facts (ops/textures.py round 5): pool base
    # offset (int32 BITCAST into the f32 row — a gather is a pure move, no
    # FTZ risk) plus mip-0 dims, letting the bounce tap compute every mip's
    # offset/dims with VPU ALU instead of a per-lane mip_desc row gather.
    tex_base_off = np.zeros(I, np.int32)
    tex_w0 = np.ones(I, np.float32)
    tex_h0 = np.ones(I, np.float32)
    base_lod_np = getattr(scene, "_texture_base_lod", None)
    num_mips_np = getattr(scene, "_texture_num_mips", None)
    base_off_np = getattr(scene, "_texture_base_off", None)
    w0_np = getattr(scene, "_texture_w0", None)
    h0_np = getattr(scene, "_texture_h0", None)
    for i, inst in enumerate(scene.instances):
        transform[i] = inst.transform
        transform_inv[i] = inst.transform_inv
        transform_prev[i] = inst.transform_prev
        material_id[i] = inst.material_id
        blas_root[i] = geo.blas_root_of_mesh[inst.mesh_data_id]
        m = scene.materials[inst.material_id]
        tex_id[i] = m.texture_id
        medium_id[i] = m.medium_id
        if base_lod_np is not None and 0 <= m.texture_id < len(base_lod_np):
            tex_lod[i] = base_lod_np[m.texture_id]
            if num_mips_np is not None:
                tex_max_mip[i] = max(int(num_mips_np[m.texture_id]) - 1, 0)
            if base_off_np is not None:
                tex_base_off[i] = base_off_np[m.texture_id]
                tex_w0[i] = w0_np[m.texture_id]
                tex_h0[i] = h0_np[m.texture_id]
    return {
        "transform": transform,
        "transform_inv": transform_inv,
        "transform_prev": transform_prev,
        # Flattened transforms for elementwise affine math (batched (R,3,4)
        # einsums lower to padded tiny matmuls on the MXU — measured 7 ms per
        # traversal iteration; 12 scalar FMAs are ~free on the VPU).
        # Component-major (12, I) affine tables: scalar gathers + FMAs only.
        "inv_T": transform_inv.reshape(I, 12).T.copy(),
        "fwd_T": transform.reshape(I, 12).T.copy(),
        "prev_T": transform_prev.reshape(I, 12).T.copy(),
        "material_id": material_id,
        "blas_root": blas_root,
        # (I, 32) shading rows [fwd 12 | inv 12 | material_id | tex_id |
        # tex base lod | medium_id | tex max mip | tex base off (int32
        # bitcast) | tex w0 | tex h0]: one fetch_rows per bounce replaces
        # ~25 per-column gathers (ops/vec.py fetch_rows rationale); cols
        # 25-31 carry the baked material/texture facts above.
        "rows": np.concatenate(
            [transform.reshape(I, 12), transform_inv.reshape(I, 12),
             material_id[:, None].astype(np.float32),
             tex_id[:, None], tex_lod[:, None], medium_id[:, None],
             tex_max_mip[:, None],
             tex_base_off[:, None].view(np.float32),
             tex_w0[:, None], tex_h0[:, None]], axis=-1),
        "prev_rows": transform_prev.reshape(I, 12).copy(),
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
        # One canonical leaf slot per original triangle (SBVH duplicates
        # must contribute exactly one CDF entry — see GeometryCache).
        slots = base + geo.canon_slots_of_mesh[inst.mesh_data_id]
        e1 = geo.obj_e1[slots]
        e2 = geo.obj_e2[slots]
        lin = inst.transform[:, :3]
        e1w = e1 @ lin.T
        e2w = e2 @ lin.T
        area = 0.5 * np.linalg.norm(np.cross(e1w, e2w), axis=-1)
        lum = float(mat.emission @ LUMA)
        light_tris.append(slots.astype(np.int32))
        light_insts.append(np.full(len(slots), i, np.int32))
        weights.append(area * lum)

    if not light_tris:
        return {
            "tri": np.zeros(1, np.int32),
            "inst": np.zeros(1, np.int32),
            "cdf": np.ones(1, np.float32),
            "total_weight": np.float32(0.0),
        }, 0
    weights = np.concatenate(weights)
    total = float(weights.sum())
    cdf = np.cumsum(weights) / max(total, 1e-20)
    cdf[-1] = 1.0
    return {
        "tri": np.concatenate(light_tris),
        "inst": np.concatenate(light_insts),
        "cdf": cdf.astype(np.float32),
        "total_weight": np.float32(total),
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

    nodes = _pack_nodes(
        np.concatenate([t_min, blas["min"]], axis=0),
        np.concatenate([t_max_, blas["max"]], axis=0),
        np.concatenate([t_left, blas["left"]], axis=0),
        np.concatenate([t_count, blas["count"]], axis=0),
    )

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

    # Texture pool: decode + mip every referenced texture (reference:
    # Integrator::init_materials texture upload, Integrator.cpp:42-98).
    from gpu_raytracer_tpu.assets.texture import generate_mips, load_image
    from gpu_raytracer_tpu.ops.textures import pack_texture_pool

    mip_filter = scene.config.mipmap_filter if scene.config else None
    mips_on = bool(scene.config and scene.config.enable_mipmapping)

    def decode_one(slot):
        # Decode + mip on the loader pool (reference: texture loads are
        # ThreadPool jobs, AssetManager.cpp:57-95; PIL + numpy release
        # the GIL).
        if slot.data is None:
            slot.data = load_image(slot.filename)
        return generate_mips(slot.data, mip_filter) if mips_on else [slot.data]

    from gpu_raytracer_tpu.utils import pool as loader_pool

    chains = [f.result() for f in
              [loader_pool.submit(decode_one, s) for s in scene.textures]]
    textures = pack_texture_pool(chains)
    # _pack_instances (below and in every refresh_tlas) bakes each
    # instance material's lod bias / mip count into the instance rows.
    scene._texture_base_lod = textures["base_lod_np"]
    scene._texture_num_mips = textures["num_mips_np"]
    scene._texture_base_off = textures["base_off_np"]
    scene._texture_w0 = textures["w0_np"]
    scene._texture_h0 = textures["h0_np"]

    packed_tris = np.concatenate(
        [pos[:, 0], pos[:, 1] - pos[:, 0], pos[:, 2] - pos[:, 0]], axis=-1)

    from gpu_raytracer_tpu.ops.pmj import load_tables

    # The whole pytree is packed HOST-SIDE (numpy) and uploaded ONCE at the
    # end: the derived-table packers below re-read these fields, and a
    # np.asarray on a device buffer is a device->host readback (hundreds of
    # ms over slow links; round-4 profile: 312 s of a 366 s Sponza build was
    # packers downloading buffers this function had just uploaded).
    scene._lut_samples = lut_samples
    host = {
        "nodes": nodes,
        "tris": {
            # Component-major (9, T) [p0|e1|e2]: the leaf phase fetches each
            # triangle as 9 flat scalar gathers (TPU-efficient layout).
            "geo_T": packed_tris.astype(np.float32).T.copy(),
            "p0": pos[:, 0].copy(),
            "e1": pos[:, 1] - pos[:, 0],
            "e2": pos[:, 2] - pos[:, 0],
            "n0": tris_leaf.normals[:, 0].copy(),
            "n1": tris_leaf.normals[:, 1].copy(),
            "n2": tris_leaf.normals[:, 2].copy(),
            "uv0": tris_leaf.uvs[:, 0].copy(),
            "uv1": tris_leaf.uvs[:, 1].copy(),
            "uv2": tris_leaf.uvs[:, 2].copy(),
            # Component-major (9, T)/(6, T) shading tables (same rationale
            # as geo_T: per-ray fetches are flat scalar gathers).
            "n_T": np.concatenate(
                [tris_leaf.normals[:, 0], tris_leaf.normals[:, 1],
                 tris_leaf.normals[:, 2]], axis=-1).astype(np.float32).T.copy(),
            "uv_T": np.concatenate(
                [tris_leaf.uvs[:, 0], tris_leaf.uvs[:, 1],
                 tris_leaf.uvs[:, 2]], axis=-1).astype(np.float32).T.copy(),
            # Row-major (T, 32) hit-shading rows [p0|e1|e2|n0|n1|n2|uv0..2|
            # pad]: XLA gathers on the TPU are HBM-latency-bound per START
            # (~50 ns x R lanes regardless of row width), so ONE 128-byte
            # row gather replaces the 24 per-column gathers the shading
            # stage would otherwise issue — measured 8x cheaper on Sponza.
            "shade_rows": np.concatenate(
                [packed_tris,
                 tris_leaf.normals.reshape(len(packed_tris), 9),
                 tris_leaf.uvs.reshape(len(packed_tris), 6),
                 np.zeros((len(packed_tris), 8), np.float32)],
                axis=-1).astype(np.float32),
        },
        "instances": _pack_instances(scene, geo),
        "materials": materials,
        "mediums": pack_mediums(scene),
        "lights": lights,
        "sky": np.asarray(sky, np.float32),
        "sky_scale": np.float32(scene.sky.scale if scene.sky else 1.0),
        # luts are device-resident (bake_luts); the KC curve bake below is
        # disk-cached so the packers don't read them back per build.
        "luts": luts,
    }
    host["pallas"] = _pack_pallas(host)
    host["pallas_shade"] = _pack_pallas_shade(host, scene)
    host["shade_gather"] = _pack_shade_gather(host, scene)
    geo.tri_geo = packed_tris.astype(np.float32)
    wide = _pack_wide(scene, geo, geo.tri_geo)
    host["wide"] = wide["tables"] if wide else None
    host["wide_prim_map"] = wide["prim_map"] if wide else None
    host["wide_stream"] = wide.get("stream") if wide else None
    host["stream_prim"] = wide.get("stream_prim") if wide else None
    scene._host_buffers = host

    import jax

    buffers = jax.tree.map(jnp.asarray, host)
    # Device-native side tables (sampler tables, texture pool) join after
    # the upload: they are never read back by the packers.
    buffers["sampler"] = load_tables()
    buffers["textures"] = textures
    return buffers


def _pack_wide(scene: Scene, geo: GeometryCache, tri_geo: np.ndarray):
    """Scene-scale traversal tables for the block-synchronous wide-BVH
    Pallas kernel (ops/pallas_wide.py), or None when the scene exceeds the
    VMEM budget or has no geometry. See bvh/wide.py for the layout."""
    from gpu_raytracer_tpu.bvh import wide as wide_mod
    from gpu_raytracer_tpu.bvh.sah import SAHBuilder
    from gpu_raytracer_tpu.ops import pallas_wide

    if not scene.instances or tri_geo.shape[0] == 0:
        return None
    # --bvh selects the DEVICE traversal format (reference: BVH.cpp:38-59):
    # qbvh/cwbvh run the wide kernel at width 4/8; sah/sbvh keep the binary
    # device paths (SMEM Pallas kernel or XLA while_loop).
    from gpu_raytracer_tpu.config import BVHType

    cfg = scene.config
    bvh_type = cfg.bvh_type if cfg is not None else BVHType.BVH8
    if bvh_type == BVHType.BVH4:
        width = 4
    elif bvh_type == BVHType.BVH8:
        width = 8
    else:
        return None
    num_bvh2_nodes = sum(md.bvh.num_nodes for md in scene.mesh_datas)
    est = wide_mod.estimate_table_bytes(num_bvh2_nodes, tri_geo.shape[0],
                                        len(scene.instances))
    if est > 2 * pallas_wide.VMEM_LIMIT:
        # Even the SHARED two-level tables exceed VMEM: go straight to the
        # merged build, which falls back to the paged STREAMING tables
        # (bvh/stream.py) instead of the ~1000x slower XLA binary
        # traversal.
        merged = _pack_wide_merged(scene, geo, tri_geo, width)
        if merged is None:
            print(f"[bvh] scene exceeds the wide-kernel VMEM budget "
                  f"(~{est // 2 ** 20} MB est.) and the streaming gate; "
                  f"falling back to the XLA binary traversal")
        return merged

    # ---- static-scene flattening ----
    # Fold the whole scene into ONE world-space wide BVH: no TLAS hop, no
    # instance-entry/RESTORE transitions, and a globally SAH-optimal tree
    # over world geometry — measured ~10% faster bounce traversal and
    # bit-identical hits on Sponza. Leaf rows store per-instance PRIM ids;
    # callers recover (tri, inst) from the packed prim map. Shared meshes
    # get per-instance world copies, so memory (not correctness) is the
    # only instancing cost. Heavily-instanced scenes whose per-instance
    # copies blow that budget (441 x 5k-tri stand-in statues: 2.3M world
    # tris from 5k unique) must NOT pay the paged-streaming tax merged
    # would fall back to — the shared two-level TLAS/BLAS below stays
    # resident; streaming is the last resort if those tables don't fit
    # either (round-5 fix, VERDICT r4 weak #7).
    stream_fallback = None
    if len(scene.instances) > 1:
        P = int(sum(geo.tri_count_of_mesh[inst.mesh_data_id]
                    for inst in scene.instances))
        # Merged-build pre-gate: model the FAT-LEAF build this path
        # actually runs (LEAF_CAP 12 packs ~10 tris/row on Sponza-class
        # meshes; interior nodes come out well under the leaf-row count),
        # not estimate_table_bytes' 1-tri-per-row worst case — that
        # pessimism mis-routed Sponza (262k tris, 18 MB packed, estimated
        # 214 MB) onto the ~2.3 s/sample-slower two-level path.  P/6
        # leaves + P/6 nodes is still ~2.5x the measured Sponza total, so
        # genuinely oversized scenes (the 2.3M-tri instancing stand-in:
        # 392 MB est.) keep skipping the build.
        est_merged = (2 * (P // 6) + 2) * wide_mod.ROW * 4
        if est_merged <= 2 * pallas_wide.VMEM_LIMIT:
            merged = _pack_wide_merged(scene, geo, tri_geo, width)
            if merged is not None:
                if merged.get("stream") is None:
                    return merged
                stream_fallback = merged

    wides = []
    for md in scene.mesh_datas:
        cached = getattr(md, "_wide", None)
        if cached is None or cached[0] != width:
            md._wide = (width, wide_mod.collapse_wide(md.bvh, width))
        wides.append(md._wide[1])

    wmin, wmax = instance_world_aabbs(scene)
    tlas_bvh2 = SAHBuilder(4.0, 1.0, max_leaf_size=1).build(wmin, wmax)

    inv = np.stack([inst.transform_inv.reshape(12) for inst in scene.instances])
    mesh_of_inst = np.asarray([inst.mesh_data_id for inst in scene.instances],
                              np.int32)
    packed = wide_mod.pack_wide_scene(
        wides, geo.tri_base_of_mesh, tlas_bvh2,
        {"inv": inv, "mesh_of_inst": mesh_of_inst}, tri_geo)
    n, l = packed["nodes"].shape[0], packed["rows"].shape[0]
    if not pallas_wide.supports(n, l):
        print(f"[bvh] wide tables ({(n + l) * 512 // 2 ** 20} MB) exceed the "
              f"VMEM budget; falling back to "
              + ("streaming" if stream_fallback else
                 "the XLA binary traversal"))
        return stream_fallback
    if packed["max_stack"] > pallas_wide.STACK_DEPTH:
        print(f"[bvh] wide tree needs stack {packed['max_stack']} > kernel "
              f"budget {pallas_wide.STACK_DEPTH}; falling back to "
              + ("streaming" if stream_fallback else "XLA"))
        return stream_fallback
    return {"tables": (packed["nodes"], packed["rows"]),
            "prim_map": None}


def _pack_wide_merged(scene: Scene, geo: GeometryCache, tri_geo: np.ndarray,
                      width: int):
    """One world-space wide BVH over the whole static scene (see
    _pack_wide). Leaf rows carry per-instance PRIM ids; returns
    {"tables": (nodes, rows), "prim_map": (P,) int32} with
    prim_map[p] = inst << 22 | global_leaf_tri_slot, or None when the
    merged tables exceed the VMEM budget / the id packing range."""
    from gpu_raytracer_tpu.bvh import wide as wide_mod
    from gpu_raytracer_tpu.bvh.cache import build_blas_cached
    from gpu_raytracer_tpu.ops import pallas_wide
    from gpu_raytracer_tpu.scene.types import TriangleData

    I = len(scene.instances)
    counts = [geo.tri_count_of_mesh[inst.mesh_data_id]
              for inst in scene.instances]
    P = int(sum(counts))
    # prim_map is int32 with the tri slot in the low 22 bits, leaving 9 usable
    # instance bits (bit 31 is the sign: inst 512 << 22 would overflow int32).
    # Beyond either range the VMEM-resident merged path is unavailable, but
    # the STREAMING fallback below uses split (P,) inst/tri arrays and f32
    # prim ids in leaf rows, which stay exact up to 2^24 prims.
    fits_prim_map = I < (1 << 9) and P < (1 << 22)
    if P >= (1 << 24):
        return None
    world = np.empty((P, 3, 3), np.float32)
    prim_inst = np.empty(P, np.int32)
    prim_tri = np.empty(P, np.int32)
    base_p = 0
    for i, inst in enumerate(scene.instances):
        mi = inst.mesh_data_id
        b = geo.tri_base_of_mesh[mi]
        c = geo.tri_count_of_mesh[mi]
        g = tri_geo[b:b + c]
        m = np.asarray(inst.transform, np.float32)
        p0 = g[:, 0:3] @ m[:, :3].T + m[:, 3]
        p1 = (g[:, 0:3] + g[:, 3:6]) @ m[:, :3].T + m[:, 3]
        p2 = (g[:, 0:3] + g[:, 6:9]) @ m[:, :3].T + m[:, 3]
        world[base_p:base_p + c] = np.stack([p0, p1, p2], axis=1)
        prim_inst[base_p:base_p + c] = i
        prim_tri[base_p:base_p + c] = np.arange(b, b + c, dtype=np.int32)
        base_p += c

    # sah_cost_node=10 (vs the reference's 4): a gang-kernel node phase
    # costs ~4.5x a whole-leaf-row tri phase on TPU (exp_gang_ablate), so
    # the collapse should buy fat leaves — Sponza: 14.3k -> 9.5k interior
    # nodes, bounce waves ~8% faster (tools/exp_leafcap.py, round 4).
    bvh = build_blas_cached(TriangleData(world), sah_cost_node=10.0,
                            max_leaf_size=pallas_wide.LEAF_CAP)
    wideb = wide_mod.collapse_wide(bvh, width)
    world_geo = np.concatenate(
        [world[:, 0], world[:, 1] - world[:, 0], world[:, 2] - world[:, 0]],
        axis=-1).astype(np.float32)
    leaf_geo = world_geo[bvh.indices]
    packed = wide_mod.pack_wide_merged(wideb, bvh.indices, leaf_geo) \
        if fits_prim_map else None
    n = packed["nodes"].shape[0] if packed else 0
    l = packed["rows"].shape[0] if packed else 0
    if (packed is not None and pallas_wide.supports(n, l)
            and packed["max_stack"] <= pallas_wide.STACK_DEPTH
            and packed["entry_stack"] <= pallas_wide.STACK_DEPTH):
        prim_map = (prim_inst << 22) | prim_tri
        return {"tables": (packed["nodes"], packed["rows"]),
                "prim_map": prim_map}

    # ---- beyond-VMEM: paged streaming tables (bvh/stream.py) ----
    from gpu_raytracer_tpu.bvh import stream as stream_mod
    from gpu_raytracer_tpu.ops import pallas_stream

    paged = stream_mod.pack_wide_stream(wideb, bvh.indices, leaf_geo,
                                        page_rows=stream_mod.PAGE_ROWS)
    if paged is None or paged["max_stack"] > pallas_wide.STACK_DEPTH:
        return None
    res_rows = paged["resident"].shape[0]
    if res_rows * 512 > pallas_wide.VMEM_LIMIT:
        print(f"[bvh] streaming resident top ({res_rows * 512 // 2 ** 20} "
              f"MB) exceeds VMEM; falling back")
        return None
    print(f"[bvh] streaming tables: resident {res_rows * 512 // 2 ** 20} MB"
          f" + {paged['pages'].shape[0]} pages x "
          f"{paged['pages'].shape[1] * 512 // 2 ** 10} KB")
    stream = {k: v for k, v in paged.items() if isinstance(v, np.ndarray)}
    return {"tables": None, "prim_map": None, "stream": stream,
            "stream_prim": (prim_inst, prim_tri)}


def _mat_kc_tables(buffers: dict):
    """(16, M) material table + (32, M) Kulla-Conty polynomial curves shared
    by both fused shade kernels (ops/pallas_shade.py layout)."""
    mats = buffers["materials"]
    m = int(np.asarray(mats["type"]).shape[0])
    mat_tbl = np.zeros((16, m), np.float32)
    mat_tbl[0] = np.asarray(mats["type"], np.float32)
    mat_tbl[1:4] = np.asarray(mats["emission_T"])
    mat_tbl[4:7] = np.asarray(mats["diffuse_T"])
    mat_tbl[7] = np.asarray(mats["roughness"])
    mat_tbl[8] = np.asarray(mats["ior"])
    mat_tbl[9:12] = np.asarray(mats["eta_T"])
    mat_tbl[12:15] = np.asarray(mats["k_T"])
    from gpu_raytracer_tpu.ops.kulla_conty import bake_material_curves

    kc_tbl = bake_material_curves(buffers["luts"], mats)
    return mat_tbl, kc_tbl


def _pack_pallas_shade(buffers: dict, scene: Scene):
    """SMEM tables for the fused full-BSDF shade megakernel, or None when
    the scene falls outside its gate (ops/pallas_shade.py)."""
    from gpu_raytracer_tpu.ops import pallas_shade as psh

    if buffers.get("pallas") is None:
        return None
    mats = buffers["materials"]
    tris = buffers["tris"]
    insts = buffers["instances"]
    lights = buffers["lights"]
    t = int(np.asarray(tris["geo_T"]).shape[1])
    i = int(np.asarray(insts["blas_root"]).shape[0])
    l = int(np.asarray(lights["tri"]).shape[0])
    if not psh.supports_shade(np.asarray(mats["type"]), t, i, l,
                              len(scene.textures) > 0,
                              len(scene.mediums) > 0,
                              np.asarray(buffers["sky"]).shape):
        return None

    tri_geo = buffers["pallas"][2]  # the traversal (16, T) geo table
    tri_nrm = np.zeros((16, t), np.float32)
    tri_nrm[0:9] = np.asarray(tris["n_T"])
    inst_a = np.zeros((16, i), np.float32)
    inst_a[0:12] = np.asarray(insts["fwd_T"])
    inst_a[12] = np.asarray(insts["material_id"], np.float32)
    inst_b = np.zeros((16, i), np.float32)
    inst_b[0:12] = np.asarray(insts["inv_T"])
    mat_tbl, kc_tbl = _mat_kc_tables(buffers)
    lgt_tbl = np.zeros((16, l), np.float32)
    lgt_tbl[0] = np.asarray(lights["cdf"])
    lgt_tbl[1] = np.asarray(lights["tri"], np.float32)
    lgt_tbl[2] = np.asarray(lights["inst"], np.float32)
    return (tri_geo, tri_nrm, inst_a, inst_b, mat_tbl, kc_tbl, lgt_tbl)


def _pack_shade_gather(buffers: dict, scene: Scene):
    """SMEM tables for the SCENE-SCALE gathered-input shade megakernel
    (ops/pallas_shade_gather.py), or None outside its gate. Light geometry
    is pre-transformed to world space so the kernel needs no triangle or
    instance fetch — refreshed with the TLAS on scene edits."""
    from gpu_raytracer_tpu.ops import pallas_shade_gather as psg

    mats = buffers["materials"]
    lights = buffers["lights"]
    m = int(np.asarray(mats["type"]).shape[0])
    l = int(np.asarray(lights["tri"]).shape[0])
    if not psg.supports_gather_shade(np.asarray(mats["type"]), m, l,
                                     len(scene.mediums) > 0):
        return None
    mat_tbl, kc_tbl = _mat_kc_tables(buffers)

    tris = buffers["tris"]
    insts = buffers["instances"]
    lt = np.asarray(lights["tri"])
    li = np.asarray(lights["inst"])
    p0 = np.asarray(tris["p0"])[lt]
    e1 = np.asarray(tris["e1"])[lt]
    e2 = np.asarray(tris["e2"])[lt]
    f = np.asarray(insts["fwd_T"])[:, li]  # (12, L)

    def apt(p):
        x, y, z = p[:, 0], p[:, 1], p[:, 2]
        return np.stack([f[0] * x + f[1] * y + f[2] * z + f[3],
                         f[4] * x + f[5] * y + f[6] * z + f[7],
                         f[8] * x + f[9] * y + f[10] * z + f[11]])

    def adr(p):
        x, y, z = p[:, 0], p[:, 1], p[:, 2]
        return np.stack([f[0] * x + f[1] * y + f[2] * z,
                         f[4] * x + f[5] * y + f[6] * z,
                         f[8] * x + f[9] * y + f[10] * z])

    mat_id = np.asarray(insts["material_id"])[li]
    em = np.asarray(buffers["materials"]["emission"])[mat_id]
    lgt_tbl = np.zeros((16, l), np.float32)
    lgt_tbl[0] = np.asarray(lights["cdf"])
    lgt_tbl[1:4] = apt(p0)
    lgt_tbl[4:7] = adr(e1)
    lgt_tbl[7:10] = adr(e2)
    lgt_tbl[10:13] = em.T
    return (mat_tbl, kc_tbl, lgt_tbl)


def _pack_pallas(buffers: dict):
    """SMEM-resident traversal tables for the Pallas whole-loop kernel, or
    None when the scene exceeds its table budget (the XLA while_loop path is
    the fallback). See ops/pallas_traverse.py."""
    from gpu_raytracer_tpu.ops import pallas_traverse as ptv

    nodes, tris, insts = buffers["nodes"], buffers["tris"], buffers["instances"]
    n = int(np.asarray(nodes["left"]).shape[0])
    t = int(np.asarray(tris["geo_T"]).shape[1])
    i = int(np.asarray(insts["blas_root"]).shape[0])
    if not ptv.supports(n, t, i):
        return None
    return ptv.pack_tables(nodes, tris, insts)


def refresh_tlas(buffers: dict, scene: Scene) -> dict:
    """Per-frame TLAS + instance-table refresh after scene-graph updates
    (reference: Integrator::build_tlas per frame). Shapes are unchanged, so
    jitted pipelines keep their compilations."""
    import jax

    geo: GeometryCache = scene._geometry_cache
    host: dict = scene._host_buffers
    wmin, wmax = instance_world_aabbs(scene)
    t_min, t_max_, t_left, t_count = build_tlas(wmin, wmax)
    size = geo.tlas_size

    # All repacking runs against the HOST pytree (numpy) kept by
    # build_scene_buffers; only the refreshed components upload.
    packed = _pack_nodes(t_min, t_max_, t_left, t_count)
    nodes_h = dict(host["nodes"])
    for key in ("min", "max", "left", "count"):
        nodes_h[key] = nodes_h[key].copy()
        nodes_h[key][:size] = packed[key]
    nodes_h["child_aabb_T"] = nodes_h["child_aabb_T"].copy()
    nodes_h["child_aabb_T"][:, :size] = packed["child_aabb_T"]
    nodes_h["root_min"] = packed["root_min"]
    nodes_h["root_max"] = packed["root_max"]
    host = dict(host)
    host["nodes"] = nodes_h
    host["instances"] = _pack_instances(scene, geo)
    fresh = {"instances": host["instances"]}

    lights, _ = _build_lights(scene, geo)
    # Light CDF shape changes only if light materials changed; that path goes
    # through a full rebuild (invalidated_materials).
    if lights["tri"].shape == host["lights"]["tri"].shape:
        host["lights"] = lights
        fresh["lights"] = lights
    if host.get("pallas") is not None:
        host["pallas"] = _pack_pallas(host)
        fresh["pallas"] = host["pallas"]
    if host.get("pallas_shade") is not None:
        host["pallas_shade"] = _pack_pallas_shade(host, scene)
        fresh["pallas_shade"] = host["pallas_shade"]
    if host.get("shade_gather") is not None:
        host["shade_gather"] = _pack_shade_gather(host, scene)
        fresh["shade_gather"] = host["shade_gather"]
    if host.get("wide") is not None or host.get("wide_stream") is not None:
        # Per-mesh wide BLAS collapses are cached on the MeshData; only the
        # TLAS head + instance rows are re-derived here (the merged static
        # path re-packs from the content-hash BVH cache).
        wide = _pack_wide(scene, geo, geo.tri_geo)
        host["wide"] = wide["tables"] if wide else None
        host["wide_prim_map"] = wide["prim_map"] if wide else None
        host["wide_stream"] = wide.get("stream") if wide else None
        host["stream_prim"] = wide.get("stream_prim") if wide else None
        for k in ("wide", "wide_prim_map", "wide_stream", "stream_prim"):
            fresh[k] = host[k]
    scene._host_buffers = host

    out = dict(buffers)
    # The TLAS head lives inside the big unified node arrays: in-place
    # device .at[].set updates avoid re-uploading the BLAS body.
    nodes = dict(buffers["nodes"])
    for key in ("min", "max", "left", "count"):
        nodes[key] = nodes[key].at[:size].set(packed[key])
    nodes["child_aabb_T"] = nodes["child_aabb_T"].at[:, :size].set(
        packed["child_aabb_T"])
    nodes["root_min"] = jnp.asarray(packed["root_min"])
    nodes["root_max"] = jnp.asarray(packed["root_max"])
    out["nodes"] = nodes
    for k, v in fresh.items():
        out[k] = jax.tree.map(jnp.asarray, v)
    return out
