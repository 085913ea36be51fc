"""Batched ray-primitive intersection in JAX (reference: Src/CUDA/Raytracing/
Triangle.h:148-198 Möller-Trumbore, BVH2.h:8-17 slab test).

All functions are shaped for the wavefront: rays are (R, 3) SoA, primitives
are gathered per-ray. Everything is branchless vector math on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp

INF = jnp.float32(jnp.inf)
RAY_EPS = jnp.float32(1e-4)  # min hit distance (self-intersection guard)
_DIV_EPS = jnp.float32(1e-12)


def safe_inv_dir(d: jnp.ndarray) -> jnp.ndarray:
    """1/d with signed clamping so slab tests stay finite."""
    tiny = jnp.where(d >= 0, _DIV_EPS, -_DIV_EPS)
    return 1.0 / jnp.where(jnp.abs(d) < _DIV_EPS, tiny, d)


def aabb_intersect(node_min, node_max, o, inv_d, t_max):
    """Slab test (reference: BVH2.h:8-17). Shapes: node_* (..., 3),
    o/inv_d broadcastable to them, t_max (...,). Returns (hit, t_near)."""
    t0 = (node_min - o) * inv_d
    t1 = (node_max - o) * inv_d
    t_near = jnp.minimum(t0, t1).max(axis=-1)
    t_far = jnp.maximum(t0, t1).min(axis=-1)
    t_near_c = jnp.maximum(t_near, 0.0)
    hit = (t_near <= t_far) & (t_far > 0.0) & (t_near_c < t_max)
    return hit, t_near_c


def triangle_intersect(p0, e1, e2, o, d, t_max):
    """Möller-Trumbore, edge form, no culling. Shapes: p0/e1/e2 (..., 3),
    o/d broadcastable, t_max (...,). Returns (hit, t, u, v)."""
    h = jnp.cross(d, e2)
    a = jnp.sum(e1 * h, axis=-1)
    f = 1.0 / jnp.where(jnp.abs(a) < _DIV_EPS, _DIV_EPS, a)
    s = o - p0
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(d * q, axis=-1)
    t = f * jnp.sum(e2 * q, axis=-1)
    hit = ((jnp.abs(a) >= _DIV_EPS)
           & (u >= 0.0) & (u <= 1.0)
           & (v >= 0.0) & (u + v <= 1.0)
           & (t > RAY_EPS) & (t < t_max))
    return hit, t, u, v
