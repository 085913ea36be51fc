"""SAH-guided leaf collapsing (reference: Src/BVH/BVHCollapser.cpp:11-114).

Bottom-up dynamic program over the 1-prim-leaf BVH2: for every node compute
the cheaper of (a) keeping it internal (cost_node * SA + children cost) and
(b) flattening its whole subtree into one leaf (count * cost_leaf * SA), then
rebuild top-down emitting collapsed leaves. A `max_leaf_size` cap keeps leaves
bounded for the device traversal's fixed-work leaf loop (the reference caps at
2^30 via its bitfield; the TPU traversal wants small bounded leaves instead).
"""

from __future__ import annotations

from collections import deque

import numpy as np

from gpu_raytracer_tpu.bvh.types import BVH2
from gpu_raytracer_tpu.core.aabb import half_area


def collapse(bvh: BVH2, sah_cost_node: float = 4.0, sah_cost_leaf: float = 1.0,
             max_leaf_size: int = 8) -> BVH2:
    n = bvh.num_nodes
    is_leaf = bvh.node_count > 0
    sa = half_area(bvh.node_min, bvh.node_max).astype(np.float64)

    # --- bottom-up DP (children always have higher indices than parents) ---
    subtree_count = np.where(is_leaf, bvh.node_count, 0).astype(np.int64)
    cost = np.where(is_leaf, sa * sah_cost_leaf * bvh.node_count, 0.0)
    collapse_here = is_leaf.copy()

    for i in range(n - 1, -1, -1):
        if is_leaf[i]:
            continue
        l = int(bvh.node_left[i])
        subtree_count[i] = subtree_count[l] + subtree_count[l + 1]
        cost_internal = sa[i] * sah_cost_node + cost[l] + cost[l + 1]
        cost_as_leaf = sa[i] * sah_cost_leaf * subtree_count[i]
        if subtree_count[i] <= max_leaf_size and cost_as_leaf <= cost_internal:
            cost[i] = cost_as_leaf
            collapse_here[i] = True
        else:
            cost[i] = cost_internal

    # Since `indices` is DFS-contiguous, every subtree owns one contiguous
    # slice of it; its start is the leftmost leaf's first index.
    first_index = np.where(is_leaf, bvh.node_left, 0).astype(np.int64)
    for i in range(n - 1, -1, -1):
        if not is_leaf[i]:
            first_index[i] = first_index[int(bvh.node_left[i])]

    # --- top-down rebuild; children pairs are emitted adjacently ---
    out_min, out_max, out_left, out_count, out_axis = [], [], [], [], []

    def emit(node_id: int) -> int:
        out_id = len(out_min)
        out_min.append(bvh.node_min[node_id])
        out_max.append(bvh.node_max[node_id])
        out_axis.append(bvh.node_axis[node_id])
        if collapse_here[node_id]:
            out_left.append(int(first_index[node_id]))
            out_count.append(int(subtree_count[node_id]))
        else:
            out_left.append(0)  # patched when children are emitted
            out_count.append(0)
        return out_id

    root_out = emit(0)
    queue = deque()
    if not collapse_here[0]:
        queue.append((int(bvh.node_left[0]), root_out))
    while queue:
        left_in, parent_out = queue.popleft()
        left_out = emit(left_in)
        emit(left_in + 1)  # right child: out index = left_out + 1
        out_left[parent_out] = left_out
        for child_in, child_out in ((left_in, left_out), (left_in + 1, left_out + 1)):
            if not collapse_here[child_in]:
                queue.append((int(bvh.node_left[child_in]), child_out))

    return BVH2(
        node_min=np.asarray(out_min, np.float32),
        node_max=np.asarray(out_max, np.float32),
        node_left=np.asarray(out_left, np.int32),
        node_count=np.asarray(out_count, np.int32),
        node_axis=np.asarray(out_axis, np.int8),
        indices=bvh.indices.copy(),
    )
