"""Flat SoA BVH containers (reference: Src/BVH/BVH.h node formats).

`BVH2` is the binary BVH in the canonical flat layout shared by the builders,
the disk cache, and the device traversal:

  node_min/node_max : (N, 3) float32 — child AABB slabs
  node_left         : (N,) int32     — interior: left-child index (right = left+1)
                                       leaf: first index into `indices`
  node_count        : (N,) int32     — 0 for interior nodes, #prims for leaves
  node_axis         : (N,) int8      — split axis (front-to-back ordering hint)
  indices           : (T,) int32     — permutation of primitive ids, leaves
                                       reference contiguous runs

The reference packs (count:30, axis:2) into one word (BVH.h:23-38); on the
host we keep them as separate arrays — the device layout decides its own
packing at upload time.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from gpu_raytracer_tpu.core.aabb import half_area


@dataclass
class BVH2:
    node_min: np.ndarray
    node_max: np.ndarray
    node_left: np.ndarray
    node_count: np.ndarray
    node_axis: np.ndarray
    indices: np.ndarray

    @property
    def num_nodes(self) -> int:
        return int(self.node_min.shape[0])

    @property
    def num_prims(self) -> int:
        return int(self.indices.shape[0])

    def is_leaf(self) -> np.ndarray:
        return self.node_count > 0

    def validate(self) -> None:
        """Structural invariants (the reference enforces these with scattered
        ASSERTs in builder code; here they are one checkable contract)."""
        n = self.num_nodes
        leaf = self.node_count > 0
        interior = ~leaf
        # Children in range and after their parent (DFS order).
        left = self.node_left[interior]
        assert np.all(left > np.nonzero(interior)[0]), "child before parent"
        assert np.all(left + 1 < n + 1), "child index out of range"
        # Leaves cover `indices` exactly once.
        starts = self.node_left[leaf]
        counts = self.node_count[leaf]
        covered = np.concatenate([np.arange(s, s + c) for s, c in zip(starts, counts)]) \
            if np.any(leaf) else np.array([], np.int64)
        assert len(covered) == self.num_prims, "leaves do not cover all prims"
        assert len(np.unique(covered)) == len(covered), "overlapping leaves"
        # indices is a permutation.
        assert np.array_equal(np.sort(self.indices), np.arange(self.num_prims)), \
            "indices is not a permutation"

    def sah_cost(self, cost_node: float = 4.0, cost_leaf: float = 1.0) -> float:
        """Global SAH cost: sum over nodes of (SA_node / SA_root) * c(node)."""
        sa = half_area(self.node_min, self.node_max)
        root_sa = max(float(sa[0]), 1e-20)
        leaf = self.node_count > 0
        cost = np.where(leaf, cost_leaf * self.node_count, cost_node) * sa
        return float(cost.sum() / root_sa)

    def depth(self) -> int:
        depths = np.zeros(self.num_nodes, np.int32)
        order = np.arange(self.num_nodes)
        for i in order:  # DFS order: parents precede children
            if self.node_count[i] == 0:
                left = self.node_left[i]
                depths[left] = depths[i] + 1
                depths[left + 1] = depths[i] + 1
        return int(depths.max()) if self.num_nodes else 0


@dataclass
class BVHStats:
    num_nodes: int
    num_leaves: int
    max_depth: int
    sah_cost: float
    avg_leaf_size: float

    @staticmethod
    def of(bvh: BVH2, cost_node: float = 4.0, cost_leaf: float = 1.0) -> "BVHStats":
        leaf = bvh.node_count > 0
        num_leaves = int(leaf.sum())
        return BVHStats(
            num_nodes=bvh.num_nodes,
            num_leaves=num_leaves,
            max_depth=bvh.depth(),
            sah_cost=bvh.sah_cost(cost_node, cost_leaf),
            avg_leaf_size=float(bvh.node_count[leaf].mean()) if num_leaves else 0.0,
        )
