"""Full-sweep (non-binned) SAH BVH builder (reference: Src/BVH/Builders/
SAHBuilder.{h,cpp} + BVHPartitions.cpp:8-72).

Same algorithm family as the reference: primitive ids are pre-sorted by
centroid along each of the three axes once, and the three sorted orders are
maintained through every partition (stable boolean filtering preserves
sortedness, the numpy analog of the reference's `indices_going_left` bitmask
walk). Each node evaluates a full object-split sweep on all three axes using
prefix/suffix AABB-union surface areas.

Like the reference, leaves default to 1 primitive so cached BVHs stay
collapse-agnostic (SAHBuilder.cpp:14-22); `BVHCollapser.collapse` merges
leaves afterwards when a wider leaf is SAH-cheaper.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from gpu_raytracer_tpu.bvh.types import BVH2
from gpu_raytracer_tpu.core.aabb import cumulative_union, half_area


@dataclass
class SAHBuilder:
    sah_cost_node: float = 4.0
    sah_cost_leaf: float = 1.0
    max_leaf_size: int = 1

    def build(self, aabb_min: np.ndarray, aabb_max: np.ndarray,
              centroids: Optional[np.ndarray] = None) -> BVH2:
        """Build from per-primitive AABBs ((T, 3) each). Works for triangles
        (BLAS) and instance world AABBs (TLAS) alike — the reference templates
        SAHBuilder over Triangle and Mesh for the same reason."""
        aabb_min = np.asarray(aabb_min, np.float32)
        aabb_max = np.asarray(aabb_max, np.float32)
        T = aabb_min.shape[0]
        assert T > 0, "cannot build a BVH over zero primitives"
        if centroids is None:
            centroids = 0.5 * (aabb_min + aabb_max)

        # Pre-sort once per axis (reference: radix sort in SAHBuilder::build).
        sorted_axes = [np.argsort(centroids[:, a], kind="stable").astype(np.int64)
                       for a in range(3)]

        # Flat output arrays; a binary tree over T prims has <= 2T-1 nodes.
        max_nodes = max(2 * T - 1, 1)
        self._node_min = np.empty((max_nodes, 3), np.float32)
        self._node_max = np.empty((max_nodes, 3), np.float32)
        self._node_left = np.zeros(max_nodes, np.int32)
        self._node_count = np.zeros(max_nodes, np.int32)
        self._node_axis = np.zeros(max_nodes, np.int8)
        self._indices = np.empty(T, np.int32)
        self._num_nodes = 1
        self._num_indices = 0
        self._prim_min = aabb_min
        self._prim_max = aabb_max

        # Iterative DFS with an explicit stack (Python recursion depth limits).
        stack = [(0, sorted_axes)]
        while stack:
            node_id, axes = stack.pop()
            child_work = self._build_node(node_id, axes)
            if child_work is not None:
                stack.extend(child_work)

        n = self._num_nodes
        return BVH2(
            node_min=self._node_min[:n].copy(),
            node_max=self._node_max[:n].copy(),
            node_left=self._node_left[:n].copy(),
            node_count=self._node_count[:n].copy(),
            node_axis=self._node_axis[:n].copy(),
            indices=self._indices.copy(),
        )

    def _build_node(self, node_id: int, axes):
        ids = axes[0]
        n = len(ids)
        mins = self._prim_min[ids]
        maxs = self._prim_max[ids]
        self._node_min[node_id] = mins.min(axis=0)
        self._node_max[node_id] = maxs.max(axis=0)

        if n == 1:
            return self._make_leaf(node_id, ids)

        best = self._find_object_split(axes)
        if best is None:
            return self._make_leaf(node_id, ids)
        axis, split_index, split_cost = best

        # Leaf if SAH says splitting doesn't pay and the leaf fits.
        leaf_cost = self.sah_cost_leaf * n
        if n <= self.max_leaf_size and leaf_cost <= split_cost:
            return self._make_leaf(node_id, ids)

        going_left = np.zeros(len(self._prim_min), bool)
        going_left[axes[axis][:split_index]] = True

        left_axes = [ax[going_left[ax]] for ax in axes]
        right_axes = [ax[~going_left[ax]] for ax in axes]

        left_id = self._num_nodes
        self._num_nodes += 2
        self._node_left[node_id] = left_id
        self._node_count[node_id] = 0
        self._node_axis[node_id] = axis
        # Children pushed right-first so the DFS emits left subtree first,
        # keeping leaf runs in `indices` depth-first contiguous.
        return [(left_id + 1, right_axes), (left_id, left_axes)]

    def _make_leaf(self, node_id: int, ids: np.ndarray):
        first = self._num_indices
        count = len(ids)
        self._indices[first:first + count] = ids
        self._num_indices += count
        self._node_left[node_id] = first
        self._node_count[node_id] = count
        return None

    def _find_object_split(self, axes):
        """Sweep all 3 axes; returns (axis, split_index, cost) minimising
        SA_L*n_L + SA_R*n_R (reference: BVHPartitions::partition_sah)."""
        best_axis, best_index, best_cost = -1, -1, np.inf
        n = len(axes[0])
        for axis in range(3):
            order = axes[axis]
            mins = self._prim_min[order]
            maxs = self._prim_max[order]
            lmin, lmax = cumulative_union(mins, maxs)
            rmin, rmax = cumulative_union(mins, maxs, reverse=True)
            sa_l = half_area(lmin[:-1], lmax[:-1])          # prefix [0..i]
            sa_r = half_area(rmin[1:], rmax[1:])            # suffix [i+1..]
            counts_l = np.arange(1, n, dtype=np.float64)
            cost = sa_l * counts_l + sa_r * (n - counts_l)
            i = int(np.argmin(cost))
            if cost[i] < best_cost:
                best_axis, best_index, best_cost = axis, i + 1, float(cost[i])
        if best_axis < 0:
            return None
        # Convert sweep cost to the reference's full SAH split cost:
        # c_node + c_leaf * (SA_L n_L + SA_R n_R) / SA_parent.
        return best_axis, best_index, self._full_cost(axes, best_cost)

    def _full_cost(self, axes, sweep_cost: float) -> float:
        ids = axes[0]
        mins = self._prim_min[ids]
        maxs = self._prim_max[ids]
        sa_parent = float(half_area(mins.min(axis=0)[None], maxs.max(axis=0)[None])[0])
        if sa_parent <= 0.0:
            return np.inf
        return self.sah_cost_node + self.sah_cost_leaf * sweep_cost / sa_parent


def build_bvh2(triangles, sah_cost_node: float = 4.0, sah_cost_leaf: float = 1.0,
               max_leaf_size: int = 1) -> BVH2:
    """Convenience: build a BLAS from TriangleData."""
    mn, mx = triangles.aabbs()
    builder = SAHBuilder(sah_cost_node, sah_cost_leaf, max_leaf_size)
    return builder.build(mn, mx, triangles.centroids())
