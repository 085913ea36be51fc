"""BVH4: 4-wide BVH by greedy collapse of a BVH2 (reference:
Src/BVH/Converters/BVH4Converter.cpp — Wald-style: seed each node with its
two children, repeatedly replace the internal child with the largest surface
area by its own children until 4-wide).

SoA layout (reference keeps 128-byte AoS nodes; the TPU wants planes split):
  child_min/child_max : (N, 4, 3) float32 (empty slots = inverted boxes)
  child_index         : (N, 4) int32  — child node id, or first-triangle id
  child_count         : (N, 4) int32  — 0 = internal child, >0 = leaf,
                                        -1 = empty slot
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from gpu_raytracer_tpu.bvh.types import BVH2
from gpu_raytracer_tpu.core.aabb import half_area


@dataclass
class BVH4:
    child_min: np.ndarray
    child_max: np.ndarray
    child_index: np.ndarray
    child_count: np.ndarray
    indices: np.ndarray  # primitive order shared with the source BVH2

    @property
    def num_nodes(self) -> int:
        return self.child_min.shape[0]


def convert_bvh4(bvh: BVH2) -> BVH4:
    n2 = bvh.num_nodes

    child_min, child_max, child_index, child_count = [], [], [], []
    # Map BVH2 node -> BVH4 node id (only created for internal BVH2 nodes
    # that survive as 4-wide nodes).
    out_id = {}

    def emit() -> int:
        child_min.append(np.full((4, 3), np.inf, np.float32))
        child_max.append(np.full((4, 3), -np.inf, np.float32))
        child_index.append(np.zeros(4, np.int32))
        child_count.append(np.full(4, -1, np.int32))
        return len(child_min) - 1

    # Queue of (bvh2 node, bvh4 slot to fill as a node).
    root4 = emit()
    out_id[0] = root4
    queue = [0]
    while queue:
        node2 = queue.pop()
        node4 = out_id[node2]

        # Gather up to 4 children by repeatedly expanding the largest
        # internal candidate (reference BVH4Converter.cpp:3-80).
        children = []
        if bvh.node_count[node2] > 0:
            children.append(node2)  # degenerate: root leaf
        else:
            l = int(bvh.node_left[node2])
            children = [l, l + 1]
        while len(children) < 4:
            best, best_sa = -1, -1.0
            for i, c in enumerate(children):
                if bvh.node_count[c] == 0:
                    sa = float(half_area(bvh.node_min[c][None], bvh.node_max[c][None])[0])
                    if sa > best_sa:
                        best, best_sa = i, sa
            if best < 0:
                break
            c = children.pop(best)
            l = int(bvh.node_left[c])
            children.extend([l, l + 1])

        for slot, c in enumerate(children):
            child_min[node4][slot] = bvh.node_min[c]
            child_max[node4][slot] = bvh.node_max[c]
            if bvh.node_count[c] > 0:
                child_index[node4][slot] = bvh.node_left[c]
                child_count[node4][slot] = bvh.node_count[c]
            else:
                sub = emit()
                out_id[c] = sub
                child_index[node4][slot] = sub
                child_count[node4][slot] = 0
                queue.append(c)

    return BVH4(
        child_min=np.asarray(child_min, np.float32),
        child_max=np.asarray(child_max, np.float32),
        child_index=np.asarray(child_index, np.int32),
        child_count=np.asarray(child_count, np.int32),
        indices=bvh.indices.copy(),
    )


def traverse_bvh4(bvh4: BVH4, origin, direction, p0, e1, e2, t_max=np.inf):
    """Host oracle traversal of the 4-wide tree (test-only)."""
    from gpu_raytracer_tpu.bvh.cpu_trace import intersect_tris_brute

    inv = 1.0 / np.where(np.abs(direction) > 1e-20, direction,
                         np.where(direction >= 0, 1e-20, -1e-20))
    best_t, best_tri = float(t_max), -1
    stack = [0]
    while stack:
        node = stack.pop()
        t0 = (bvh4.child_min[node] - origin) * inv
        t1 = (bvh4.child_max[node] - origin) * inv
        near = np.minimum(t0, t1).max(axis=-1)
        far = np.maximum(t0, t1).min(axis=-1)
        hit = (near <= far) & (far > 0) & (np.maximum(near, 0) < best_t) \
            & (bvh4.child_count[node] >= 0)
        for slot in np.nonzero(hit)[0]:
            count = int(bvh4.child_count[node][slot])
            idx = int(bvh4.child_index[node][slot])
            if count == 0:
                stack.append(idx)
            else:
                for i in range(idx, idx + count):
                    t, _, _, _ = intersect_tris_brute(
                        origin, direction, p0[i:i + 1], e1[i:i + 1], e2[i:i + 1], best_t)
                    if t < best_t:
                        best_t, best_tri = t, i
    return best_t, best_tri
