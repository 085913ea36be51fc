"""Host-side (numpy) ray tracing oracles for testing.

The reference ships no oracle at all (SURVEY.md §4); this module provides the
two needed here: a brute-force all-triangles intersector (ground truth) and a
numpy BVH2 traversal (checks tree correctness independently of the JAX path).
Test-only code — the production traversal lives in gpu_raytracer_tpu.ops.
"""

from __future__ import annotations

import numpy as np

from gpu_raytracer_tpu.bvh.types import BVH2

INF = np.float32(np.inf)
TRI_EPS = 1e-9


def intersect_tris_brute(origin: np.ndarray, direction: np.ndarray,
                         p0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
                         t_max: float = np.inf):
    """Möller-Trumbore of one ray against all triangles (edge form, no culling
    — reference: Src/CUDA/Raytracing/Triangle.h:148-198).
    Returns (t, tri_index, u, v); tri_index == -1 on miss."""
    h = np.cross(direction[None, :], e2)
    a = np.einsum("tc,tc->t", e1, h)
    valid = np.abs(a) > TRI_EPS
    f = 1.0 / np.where(valid, a, 1.0)
    s = origin[None, :] - p0
    u = f * np.einsum("tc,tc->t", s, h)
    q = np.cross(s, e1)
    v = f * np.einsum("c,tc->t", direction, q)
    t = f * np.einsum("tc,tc->t", e2, q)
    hit = valid & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t > 1e-6) & (t < t_max)
    t = np.where(hit, t, INF)
    best = int(np.argmin(t))
    if not np.isfinite(t[best]):
        return INF, -1, 0.0, 0.0
    return float(t[best]), best, float(u[best]), float(v[best])


def traverse_bvh2(bvh: BVH2, origin: np.ndarray, direction: np.ndarray,
                  p0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
                  t_max: float = np.inf, any_hit: bool = False):
    """Stack-based single-ray BVH2 traversal with front-to-back ordering.
    Triangle arrays must be in BVH leaf order (i.e. already permuted by
    bvh.indices); returned tri index is in that leaf order."""
    inv_d = 1.0 / np.where(np.abs(direction) > 1e-20, direction,
                           np.where(direction >= 0, 1e-20, -1e-20))
    best_t, best_tri, best_u, best_v = float(t_max), -1, 0.0, 0.0
    stack = [0]
    while stack:
        node = stack.pop()
        t0 = (bvh.node_min[node] - origin) * inv_d
        t1 = (bvh.node_max[node] - origin) * inv_d
        t_near = np.minimum(t0, t1).max()
        t_far = np.maximum(t0, t1).min()
        if t_near > t_far or t_far < 0 or t_near > best_t:
            continue
        count = int(bvh.node_count[node])
        if count > 0:
            first = int(bvh.node_left[node])
            for i in range(first, first + count):
                t, _, u, v = intersect_tris_brute(
                    origin, direction, p0[i:i + 1], e1[i:i + 1], e2[i:i + 1], best_t)
                if t < best_t:
                    best_t, best_tri, best_u, best_v = t, i, u, v
                    if any_hit:
                        return best_t, best_tri, best_u, best_v
        else:
            left = int(bvh.node_left[node])
            # Front-to-back: visit the child on the ray-sign side of the
            # split axis first (push the far child first).
            axis = int(bvh.node_axis[node])
            if direction[axis] >= 0:
                stack += [left + 1, left]
            else:
                stack += [left, left + 1]
    return best_t, best_tri, best_u, best_v


def edge_form(triangles):
    """TriangleData -> (p0, e1, e2) in edge form, given leaf order indices."""
    pos = triangles.positions
    return pos[:, 0], pos[:, 1] - pos[:, 0], pos[:, 2] - pos[:, 0]
