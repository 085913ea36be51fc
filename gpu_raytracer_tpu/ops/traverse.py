"""Wavefront BVH2 traversal in pure JAX (reference: Src/CUDA/Raytracing/
BVH2.h — re-designed for the TPU execution model).

The CUDA version runs persistent warps where idle lanes atomically fetch new
rays (Aila-Laine dynamic ray fetching, BVH2.h:60-77). On the TPU's lockstep
VPU that mechanism is meaningless: instead the whole wavefront advances in
lockstep through a masked `lax.while_loop`, each ray carrying its own small
traversal stack as a lane of a (R, DEPTH) array. Lanes whose stack empties go
inactive; the loop ends when every lane is done (SURVEY.md §2.10 mapping).

Child AABBs are tested *before* pushing (with near-child-first ordering by
slab entry distance), so stack entries are always live nodes — the same
front-to-back strategy as the reference's sorted child visit (BVH2.h:32-42).

Leaves hold up to LEAF_SIZE contiguous triangles (builder + collapser
guarantee contiguity); the leaf test is a statically unrolled LEAF_SIZE-wide
masked Möller-Trumbore, which keeps every iteration's work static-shaped.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpu_raytracer_tpu.ops.intersect import aabb_intersect, safe_inv_dir, triangle_intersect

STACK_DEPTH = 48  # reference uses 8 shared + 24 local (Common.h:104-108); SAH
#                   trees of ~1M prims stay < 40 deep, 48 leaves headroom.
LEAF_SIZE = 4     # max triangles per leaf the device layout supports

_DEPTH_IOTA = jnp.arange(STACK_DEPTH, dtype=jnp.int32)[None, :]


class Hit(NamedTuple):
    """Closest-hit record (reference HitBuffer packs this in a uint4,
    Src/CUDA/Buffers.h:25-49; no quantization needed here)."""

    t: jnp.ndarray        # (R,) f32, inf on miss
    tri: jnp.ndarray      # (R,) i32 index in leaf order, -1 on miss
    u: jnp.ndarray        # (R,) f32 barycentric
    v: jnp.ndarray        # (R,) f32


def _gather_node(nodes, idx):
    return (nodes["min"][idx], nodes["max"][idx], nodes["left"][idx],
            nodes["count"][idx], )


@partial(jax.jit, static_argnames=("max_iterations",))
def trace_closest(nodes, tris, ray_o, ray_d, t_max, max_iterations: int = 100_000) -> Hit:
    """Full closest-hit traversal of a flat BVH2.

    nodes: dict of SoA arrays {min (N,3), max (N,3), left (N,), count (N,)}
    tris:  dict {p0, e1, e2: (T, 3)} in BVH leaf order
    ray_o, ray_d: (R, 3); t_max: (R,)
    """
    R = ray_o.shape[0]
    T = tris["p0"].shape[0]
    inv_d = safe_inv_dir(ray_d)
    rows = jnp.arange(R, dtype=jnp.int32)

    stack = jnp.zeros((R, STACK_DEPTH), jnp.int32)
    # Root AABB pre-test: rays missing the root start with an empty stack.
    root_hit, _ = aabb_intersect(nodes["min"][0], nodes["max"][0], ray_o, inv_d, t_max)
    ptr = root_hit.astype(jnp.int32)

    init = (stack, ptr, t_max.astype(jnp.float32),
            jnp.full((R,), -1, jnp.int32), jnp.zeros(R, jnp.float32),
            jnp.zeros(R, jnp.float32), jnp.int32(0))

    def cond(state):
        _, ptr, *_, it = state
        return jnp.any(ptr > 0) & (it < max_iterations)

    def body(state):
        stack, ptr, best_t, best_tri, best_u, best_v, it = state
        active = ptr > 0
        top = jnp.maximum(ptr - 1, 0)
        node = jnp.where(active, stack[rows, top], 0)
        ptr = ptr - active.astype(jnp.int32)

        left = nodes["left"][node]
        count = nodes["count"][node]
        is_leaf = active & (count > 0)
        is_int = active & (count == 0)

        # ---- leaf phase: LEAF_SIZE-wide masked triangle test ----
        for j in range(LEAF_SIZE):
            ti = jnp.clip(left + j, 0, T - 1)
            hit, t, u, v = triangle_intersect(
                tris["p0"][ti], tris["e1"][ti], tris["e2"][ti], ray_o, ray_d, best_t)
            take = is_leaf & (j < count) & hit
            best_t = jnp.where(take, t, best_t)
            best_tri = jnp.where(take, ti, best_tri)
            best_u = jnp.where(take, u, best_u)
            best_v = jnp.where(take, v, best_v)

        # ---- interior phase: test both children, push far then near ----
        l = left
        r = left + 1
        hit_l, t_l = aabb_intersect(nodes["min"][l], nodes["max"][l], ray_o, inv_d, best_t)
        hit_r, t_r = aabb_intersect(nodes["min"][r], nodes["max"][r], ray_o, inv_d, best_t)
        hit_l = hit_l & is_int
        hit_r = hit_r & is_int

        near_is_left = t_l <= t_r
        far_node = jnp.where(near_is_left, r, l)
        far_hit = jnp.where(near_is_left, hit_r, hit_l)
        near_node = jnp.where(near_is_left, l, r)
        near_hit = jnp.where(near_is_left, hit_l, hit_r)

        # Push far first so near pops first. Pushes are one-hot masked selects
        # over the depth axis, NOT scatters: XLA lowers scatter on TPU ~14x
        # slower than this fused select (measured). Overflow degrades to a
        # dropped subtree rather than UB.
        far_col = jnp.where(far_hit, jnp.minimum(ptr, STACK_DEPTH - 1), -1)
        near_col = jnp.where(near_hit, jnp.minimum(ptr + far_hit, STACK_DEPTH - 1), -1)
        write_far = _DEPTH_IOTA == far_col[:, None]
        write_near = _DEPTH_IOTA == near_col[:, None]
        stack = jnp.where(write_near, near_node[:, None],
                          jnp.where(write_far, far_node[:, None], stack))
        ptr = jnp.minimum(ptr + far_hit.astype(jnp.int32) + near_hit.astype(jnp.int32),
                          STACK_DEPTH)

        return stack, ptr, best_t, best_tri, best_u, best_v, it + 1

    _, _, t, tri, u, v, _ = jax.lax.while_loop(cond, body, init)
    t = jnp.where(tri >= 0, t, jnp.inf)
    return Hit(t=t, tri=tri, u=u, v=v)


@partial(jax.jit, static_argnames=("max_iterations",))
def trace_any(nodes, tris, ray_o, ray_d, t_max, max_iterations: int = 100_000) -> jnp.ndarray:
    """Any-hit (shadow) traversal: returns (R,) bool occlusion. Early-outs a
    lane on its first hit (reference: BVH2.h:141-244 shadow variant)."""
    R = ray_o.shape[0]
    T = tris["p0"].shape[0]
    inv_d = safe_inv_dir(ray_d)
    rows = jnp.arange(R, dtype=jnp.int32)

    stack = jnp.zeros((R, STACK_DEPTH), jnp.int32)
    root_hit, _ = aabb_intersect(nodes["min"][0], nodes["max"][0], ray_o, inv_d, t_max)
    ptr = root_hit.astype(jnp.int32)
    occluded = jnp.zeros(R, bool)

    init = (stack, ptr, occluded, jnp.int32(0))

    def cond(state):
        _, ptr, _, it = state
        return jnp.any(ptr > 0) & (it < max_iterations)

    def body(state):
        stack, ptr, occluded, it = state
        active = (ptr > 0) & ~occluded
        top = jnp.maximum(ptr - 1, 0)
        node = jnp.where(active, stack[rows, top], 0)
        ptr = jnp.where(occluded, 0, ptr - active.astype(jnp.int32))

        left = nodes["left"][node]
        count = nodes["count"][node]
        is_leaf = active & (count > 0)
        is_int = active & (count == 0)

        for j in range(LEAF_SIZE):
            ti = jnp.clip(left + j, 0, T - 1)
            hit, _, _, _ = triangle_intersect(
                tris["p0"][ti], tris["e1"][ti], tris["e2"][ti], ray_o, ray_d, t_max)
            occluded = occluded | (is_leaf & (j < count) & hit)

        hit_l, _ = aabb_intersect(nodes["min"][left], nodes["max"][left], ray_o, inv_d, t_max)
        hit_r, _ = aabb_intersect(nodes["min"][left + 1], nodes["max"][left + 1],
                                  ray_o, inv_d, t_max)
        push_l = hit_l & is_int & ~occluded
        push_r = hit_r & is_int & ~occluded

        l_col = jnp.where(push_l, jnp.minimum(ptr, STACK_DEPTH - 1), -1)
        r_col = jnp.where(push_r,
                          jnp.minimum(ptr + push_l.astype(jnp.int32), STACK_DEPTH - 1), -1)
        stack = jnp.where(_DEPTH_IOTA == r_col[:, None], (left + 1)[:, None],
                          jnp.where(_DEPTH_IOTA == l_col[:, None], left[:, None], stack))
        ptr = jnp.minimum(ptr + push_l.astype(jnp.int32) + push_r.astype(jnp.int32),
                          STACK_DEPTH)

        return stack, ptr, occluded, it + 1

    _, _, occluded, _ = jax.lax.while_loop(cond, body, init)
    return occluded
