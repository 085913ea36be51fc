"""Axis-aligned bounding boxes, scalar and batched (reference: Src/Math/AABB.h).

All functions operate on numpy float32 arrays. The batched forms take
(N, 3) min/max arrays so BVH builders can compute SAH sweeps without Python
loops over primitives.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_INF = np.float32(np.inf)


@dataclass
class AABB:
    """A single AABB. `create_empty` makes an inverted (empty) box."""

    min: np.ndarray  # (3,) float32
    max: np.ndarray  # (3,) float32

    @staticmethod
    def create_empty() -> "AABB":
        return AABB(np.full(3, _INF, np.float32), np.full(3, -_INF, np.float32))

    @staticmethod
    def from_points(points: np.ndarray) -> "AABB":
        pts = np.asarray(points, np.float32).reshape(-1, 3)
        return AABB(pts.min(axis=0), pts.max(axis=0))

    def is_valid(self) -> bool:
        return bool(np.all(self.max > self.min))

    def is_empty(self) -> bool:
        return bool(np.all(self.min == _INF) and np.all(self.max == -_INF))

    # Ensure the AABB is non-degenerate along every axis: grow paper-thin
    # slabs by an epsilon so traversal slab tests stay robust
    # (reference: Src/Math/AABB.h fix_if_needed).
    def fix_if_needed(self, epsilon: float = 0.001) -> "AABB":
        thin = (self.max - self.min) < epsilon
        mn = np.where(thin, self.min - np.float32(epsilon), self.min)
        mx = np.where(thin, self.max + np.float32(epsilon), self.max)
        return AABB(mn.astype(np.float32), mx.astype(np.float32))

    def expand(self, other: "AABB") -> "AABB":
        return AABB(np.minimum(self.min, other.min), np.maximum(self.max, other.max))

    def expand_point(self, p: np.ndarray) -> "AABB":
        return AABB(np.minimum(self.min, p), np.maximum(self.max, p))

    def surface_area(self) -> float:
        return float(surface_area(self.min[None], self.max[None])[0])

    def center(self) -> np.ndarray:
        return (self.min + self.max) * np.float32(0.5)

    def overlaps(self, other: "AABB") -> bool:
        return bool(np.all(self.max >= other.min) and np.all(self.min <= other.max))

    def intersection(self, other: "AABB") -> "AABB":
        return AABB(np.maximum(self.min, other.min), np.minimum(self.max, other.max))

    def transform(self, matrix: np.ndarray) -> "AABB":
        """Transform by a (3, 4) affine matrix; returns the AABB of the 8 corners."""
        corners = corner_points(self.min, self.max)
        world = corners @ matrix[:, :3].T + matrix[:, 3]
        return AABB.from_points(world)


def corner_points(mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
    """(8, 3) corner points of the box [mn, mx]."""
    sel = np.array(
        [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)], np.float32
    )
    return mn[None] * (1 - sel) + mx[None] * sel


# ---------------------------------------------------------------------------
# Batched forms for the BVH builders (axis -1 is xyz).
# ---------------------------------------------------------------------------

def surface_area(mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
    """Batched AABB surface area. Empty (inverted) boxes yield 0."""
    d = mx - mn
    area = 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0])
    valid = np.all(mx >= mn, axis=-1)
    return np.where(valid, area, 0.0).astype(np.float32)


def half_area(mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
    d = np.maximum(mx - mn, 0.0)
    return (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0]).astype(
        np.float32
    )


def union(mn_a, mx_a, mn_b, mx_b):
    return np.minimum(mn_a, mn_b), np.maximum(mx_a, mx_b)


def cumulative_union(mn: np.ndarray, mx: np.ndarray, reverse: bool = False):
    """Prefix (or suffix) running union along axis 0 of (N, 3) min/max arrays.

    Used by the full-sweep SAH builder: `cost[i] = SA(union of boxes [0..i])`.
    """
    if reverse:
        mn_c = np.minimum.accumulate(mn[::-1], axis=0)[::-1]
        mx_c = np.maximum.accumulate(mx[::-1], axis=0)[::-1]
    else:
        mn_c = np.minimum.accumulate(mn, axis=0)
        mx_c = np.maximum.accumulate(mx, axis=0)
    return mn_c, mx_c
