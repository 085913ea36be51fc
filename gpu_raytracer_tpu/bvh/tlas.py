"""Top-level acceleration structure over mesh instances
(reference: Integrator::build_tlas, Src/Renderer/Integrators/
Integrator.cpp:399-430 — rebuilt every frame the scene graph changes).

The TLAS is a BVH2 over instance world AABBs whose leaves store instance ids.
For the device the TLAS occupies a FIXED-SIZE node region (2*I-1 slots,
padded with never-hit empty nodes) at the front of the unified node array, so
per-frame rebuilds swap buffer contents without changing any array shape —
no re-jit, matching XLA's static-shape model.

Leaf encoding in the unified node array:
  count  > 0 : triangle leaf (count triangles at `left` in object space)
  count == 0 : interior node (children at left, left+1)
  count == -1: instance leaf (`left` = instance id) -> push restore marker,
               transform the ray into object space, jump to the BLAS root
"""

from __future__ import annotations

from typing import List

import numpy as np

from gpu_raytracer_tpu.bvh.sah import SAHBuilder
from gpu_raytracer_tpu.bvh.types import BVH2
from gpu_raytracer_tpu.core import transform as xf
from gpu_raytracer_tpu.core.aabb import AABB

INSTANCE_LEAF = -1


def tlas_region_size(num_instances: int) -> int:
    return max(2 * num_instances - 1, 1)


def build_tlas(world_mins: np.ndarray, world_maxs: np.ndarray,
               sah_cost_node: float = 4.0, sah_cost_leaf: float = 1.0):
    """SAH BVH over instance AABBs; returns padded flat arrays
    (node_min, node_max, node_left, node_count) of tlas_region_size slots.

    node_left of an instance leaf holds the INSTANCE id; count = -1.
    Interior child indices are TLAS-region-relative (caller's region starts
    at node 0 of the unified array, so they are also absolute).
    """
    num_instances = world_mins.shape[0]
    size = tlas_region_size(num_instances)

    builder = SAHBuilder(sah_cost_node, sah_cost_leaf, max_leaf_size=1)
    bvh = builder.build(world_mins, world_maxs)

    node_min = np.full((size, 3), np.inf, np.float32)
    node_max = np.full((size, 3), -np.inf, np.float32)
    node_left = np.zeros(size, np.int32)
    node_count = np.full(size, INSTANCE_LEAF, np.int32)  # padding: empty leaves

    n = bvh.num_nodes
    node_min[:n] = bvh.node_min
    node_max[:n] = bvh.node_max
    is_leaf = bvh.node_count > 0
    # Instance leaves: builder leaves are 1 primitive; map to instance ids
    # (clamp the gather — interior `left` values are node ids, not prim ids).
    leaf_prim = bvh.indices[np.minimum(bvh.node_left, num_instances - 1)]
    node_left[:n] = np.where(is_leaf, leaf_prim, bvh.node_left)
    node_count[:n] = np.where(is_leaf, INSTANCE_LEAF, 0)
    return node_min, node_max, node_left, node_count


def instance_world_aabbs(scene) -> tuple:
    """Per-instance world AABB from object-space BLAS root AABBs."""
    mins, maxs = [], []
    for inst in scene.instances:
        md = scene.mesh_datas[inst.mesh_data_id]
        box = md.triangles.aabb()
        if not inst.has_identity_transform():
            box = box.transform(inst.transform)
        box = box.fix_if_needed()
        mins.append(box.min)
        maxs.append(box.max)
    return np.asarray(mins, np.float32), np.asarray(maxs, np.float32)
