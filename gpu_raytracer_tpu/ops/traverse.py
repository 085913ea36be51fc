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


# ---------------------------------------------------------------------------
# Two-level TLAS/BLAS traversal (reference: Src/CUDA/Raytracing/BVH.h:49-55 +
# BVH2.h:98-116 TLAS->BLAS transition).
#
# The unified node array holds the fixed-size TLAS region first, then every
# BLAS. Instance leaves (count == -1) push a RESTORE marker followed by the
# instance's BLAS root, and switch the ray into object space using the
# instance's inverse transform with an UNNORMALIZED direction, which keeps `t`
# world-parameterized across spaces (the reference relies on the same
# property). Popping RESTORE switches back to the world-space ray. Nested
# instancing is not supported (same as the reference).
# ---------------------------------------------------------------------------

RESTORE = jnp.int32(-1)


class HitInstanced(NamedTuple):
    t: jnp.ndarray     # (R,) f32, inf on miss (world-parameterized)
    tri: jnp.ndarray   # (R,) i32 object-space triangle id, -1 on miss
    inst: jnp.ndarray  # (R,) i32 instance id, -1 on miss
    u: jnp.ndarray
    v: jnp.ndarray


def _transform_ray(inv, o, d):
    """inv: (R, 3, 4) gathered inverse transforms."""
    o2 = jnp.einsum("rij,rj->ri", inv[:, :, :3], o) + inv[:, :, 3]
    d2 = jnp.einsum("rij,rj->ri", inv[:, :, :3], d)
    return o2, d2


@partial(jax.jit, static_argnames=("max_iterations",))
def trace_closest_tlas(nodes, tris, instances, ray_o, ray_d, t_max,
                       max_iterations: int = 200_000) -> HitInstanced:
    """nodes: unified {min,max,left,count}; instances: {transform_inv (I,3,4),
    blas_root (I,)}; tris in object space."""
    R = ray_o.shape[0]
    T = tris["p0"].shape[0]
    rows = jnp.arange(R, dtype=jnp.int32)

    world_o = ray_o
    world_d = ray_d
    world_inv = safe_inv_dir(ray_d)

    root_hit, _ = aabb_intersect(nodes["min"][0], nodes["max"][0],
                                 world_o, world_inv, t_max)
    stack = jnp.zeros((R, STACK_DEPTH), jnp.int32)
    ptr = root_hit.astype(jnp.int32)

    init = (stack, ptr, world_o, world_d, world_inv,
            jnp.full(R, -1, jnp.int32),               # current instance
            t_max.astype(jnp.float32),
            jnp.full(R, -1, jnp.int32), jnp.full(R, -1, jnp.int32),
            jnp.zeros(R, jnp.float32), jnp.zeros(R, jnp.float32),
            jnp.int32(0))

    def cond(state):
        ptr = state[1]
        it = state[-1]
        return jnp.any(ptr > 0) & (it < max_iterations)

    def body(state):
        (stack, ptr, cur_o, cur_d, cur_inv, cur_inst,
         best_t, best_tri, best_inst, best_u, best_v, it) = state
        active = ptr > 0
        top = jnp.maximum(ptr - 1, 0)
        entry = jnp.where(active, stack[rows, top], 0)
        ptr = ptr - active.astype(jnp.int32)

        is_restore = active & (entry == RESTORE)
        node = jnp.maximum(entry, 0)
        left = nodes["left"][node]
        count = nodes["count"][node]

        is_tri_leaf = active & ~is_restore & (count > 0)
        is_interior = active & ~is_restore & (count == 0)
        is_inst_leaf = active & ~is_restore & (count == -1)

        # ---- restore: back to world space ----
        rm = is_restore[:, None]
        cur_o = jnp.where(rm, world_o, cur_o)
        cur_d = jnp.where(rm, world_d, cur_d)
        cur_inv = jnp.where(rm, world_inv, cur_inv)
        cur_inst = jnp.where(is_restore, -1, cur_inst)

        # ---- triangle leaf ----
        for j in range(LEAF_SIZE):
            ti = jnp.clip(left + j, 0, T - 1)
            hit, t, u, v = triangle_intersect(
                tris["p0"][ti], tris["e1"][ti], tris["e2"][ti], cur_o, cur_d, best_t)
            take = is_tri_leaf & (j < count) & hit
            best_t = jnp.where(take, t, best_t)
            best_tri = jnp.where(take, ti, best_tri)
            best_inst = jnp.where(take, cur_inst, best_inst)
            best_u = jnp.where(take, u, best_u)
            best_v = jnp.where(take, v, best_v)

        # ---- interior: ordered child push ----
        l = left
        r = left + 1
        hit_l, t_l = aabb_intersect(nodes["min"][l], nodes["max"][l], cur_o, cur_inv, best_t)
        hit_r, t_r = aabb_intersect(nodes["min"][r], nodes["max"][r], cur_o, cur_inv, best_t)
        hit_l = hit_l & is_interior
        hit_r = hit_r & is_interior
        near_is_left = t_l <= t_r
        far_node = jnp.where(near_is_left, r, l)
        far_hit = jnp.where(near_is_left, hit_r, hit_l)
        near_node = jnp.where(near_is_left, l, r)
        near_hit = jnp.where(near_is_left, hit_l, hit_r)

        # ---- instance leaf: enter BLAS ----
        inst = jnp.where(is_inst_leaf, left, 0)
        inv = instances["transform_inv"][inst]
        o2, d2 = _transform_ray(inv, world_o, world_d)
        im = is_inst_leaf[:, None]
        cur_o = jnp.where(im, o2, cur_o)
        cur_d = jnp.where(im, d2, cur_d)
        cur_inv = jnp.where(im, safe_inv_dir(d2), cur_inv)
        cur_inst = jnp.where(is_inst_leaf, left, cur_inst)
        blas_root = instances["blas_root"][inst]

        # Unified dual push: interior pushes (far, near); instance pushes
        # (RESTORE, blas_root) so the BLAS root pops first.
        push1 = far_hit | is_inst_leaf
        push2 = near_hit | is_inst_leaf
        node1 = jnp.where(is_inst_leaf, RESTORE, far_node)
        node2 = jnp.where(is_inst_leaf, blas_root, near_node)
        col1 = jnp.where(push1, jnp.minimum(ptr, STACK_DEPTH - 1), -2)
        col2 = jnp.where(push2, jnp.minimum(ptr + push1.astype(jnp.int32),
                                            STACK_DEPTH - 1), -2)
        stack = jnp.where(_DEPTH_IOTA == col2[:, None], node2[:, None],
                          jnp.where(_DEPTH_IOTA == col1[:, None], node1[:, None], stack))
        ptr = jnp.minimum(ptr + push1.astype(jnp.int32) + push2.astype(jnp.int32),
                          STACK_DEPTH)

        return (stack, ptr, cur_o, cur_d, cur_inv, cur_inst,
                best_t, best_tri, best_inst, best_u, best_v, it + 1)

    out = jax.lax.while_loop(cond, body, init)
    (_, _, _, _, _, _, t, tri, inst, u, v, _) = out
    t = jnp.where(tri >= 0, t, jnp.inf)
    return HitInstanced(t=t, tri=tri, inst=inst, u=u, v=v)


@partial(jax.jit, static_argnames=("max_iterations",))
def trace_any_tlas(nodes, tris, instances, ray_o, ray_d, t_max,
                   max_iterations: int = 200_000) -> jnp.ndarray:
    """Two-level any-hit traversal -> (R,) bool occlusion."""
    R = ray_o.shape[0]
    T = tris["p0"].shape[0]
    rows = jnp.arange(R, dtype=jnp.int32)

    world_o = ray_o
    world_d = ray_d
    world_inv = safe_inv_dir(ray_d)
    root_hit, _ = aabb_intersect(nodes["min"][0], nodes["max"][0],
                                 world_o, world_inv, t_max)
    stack = jnp.zeros((R, STACK_DEPTH), jnp.int32)
    ptr = root_hit.astype(jnp.int32)

    init = (stack, ptr, world_o, world_d, world_inv,
            jnp.zeros(R, bool), jnp.int32(0))

    def cond(state):
        _, ptr, _, _, _, occluded, it = state
        return jnp.any(ptr > 0) & (it < max_iterations)

    def body(state):
        stack, ptr, cur_o, cur_d, cur_inv, occluded, it = state
        active = (ptr > 0) & ~occluded
        top = jnp.maximum(ptr - 1, 0)
        entry = jnp.where(active, stack[rows, top], 0)
        ptr = jnp.where(occluded, 0, ptr - active.astype(jnp.int32))

        is_restore = active & (entry == RESTORE)
        node = jnp.maximum(entry, 0)
        left = nodes["left"][node]
        count = nodes["count"][node]
        is_tri_leaf = active & ~is_restore & (count > 0)
        is_interior = active & ~is_restore & (count == 0)
        is_inst_leaf = active & ~is_restore & (count == -1)

        rm = is_restore[:, None]
        cur_o = jnp.where(rm, world_o, cur_o)
        cur_d = jnp.where(rm, world_d, cur_d)
        cur_inv = jnp.where(rm, world_inv, cur_inv)

        for j in range(LEAF_SIZE):
            ti = jnp.clip(left + j, 0, T - 1)
            hit, _, _, _ = triangle_intersect(
                tris["p0"][ti], tris["e1"][ti], tris["e2"][ti], cur_o, cur_d, t_max)
            occluded = occluded | (is_tri_leaf & (j < count) & hit)

        l = left
        hit_l, _ = aabb_intersect(nodes["min"][l], nodes["max"][l], cur_o, cur_inv, t_max)
        hit_r, _ = aabb_intersect(nodes["min"][l + 1], nodes["max"][l + 1],
                                  cur_o, cur_inv, t_max)
        push_l = hit_l & is_interior & ~occluded
        push_r = hit_r & is_interior & ~occluded

        inst = jnp.where(is_inst_leaf, left, 0)
        inv = instances["transform_inv"][inst]
        o2, d2 = _transform_ray(inv, world_o, world_d)
        im = (is_inst_leaf & ~occluded)[:, None]
        cur_o = jnp.where(im, o2, cur_o)
        cur_d = jnp.where(im, d2, cur_d)
        cur_inv = jnp.where(im, safe_inv_dir(d2), cur_inv)
        enter = is_inst_leaf & ~occluded

        push1 = push_l | enter
        push2 = push_r | enter
        node1 = jnp.where(enter, RESTORE, l)
        node2 = jnp.where(enter, instances["blas_root"][inst], l + 1)
        col1 = jnp.where(push1, jnp.minimum(ptr, STACK_DEPTH - 1), -2)
        col2 = jnp.where(push2, jnp.minimum(ptr + push1.astype(jnp.int32),
                                            STACK_DEPTH - 1), -2)
        stack = jnp.where(_DEPTH_IOTA == col2[:, None], node2[:, None],
                          jnp.where(_DEPTH_IOTA == col1[:, None], node1[:, None], stack))
        ptr = jnp.minimum(ptr + push1.astype(jnp.int32) + push2.astype(jnp.int32),
                          STACK_DEPTH)
        return stack, ptr, cur_o, cur_d, cur_inv, occluded, it + 1

    _, _, _, _, _, occluded, _ = jax.lax.while_loop(cond, body, init)
    return occluded
