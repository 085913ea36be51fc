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

# numpy on purpose: a module-level jnp.arange becomes a LEAKED TRACER when
# this module is first imported inside a jit trace (lazy `from ... import`
# in a jitted wrapper) — numpy constants are trace-safe.
import numpy as _np  # noqa: E402

_DEPTH_IOTA = _np.arange(STACK_DEPTH, dtype=_np.int32)[None, :]
_DEPTH_IOTA_T = _np.arange(STACK_DEPTH, dtype=_np.int32)[:, None]


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
        far_hit = far_hit & (ptr < STACK_DEPTH)
        ptr1 = ptr + far_hit.astype(jnp.int32)
        near_hit = near_hit & (ptr1 < STACK_DEPTH)
        far_col = jnp.where(far_hit, ptr, -1)
        near_col = jnp.where(near_hit, ptr1, -1)
        write_far = _DEPTH_IOTA == far_col[:, None]
        write_near = _DEPTH_IOTA == near_col[:, None]
        stack = jnp.where(write_near, near_node[:, None],
                          jnp.where(write_far, far_node[:, None], stack))
        ptr = ptr1 + near_hit.astype(jnp.int32)

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

        push_l = push_l & (ptr < STACK_DEPTH)
        ptr1 = ptr + push_l.astype(jnp.int32)
        push_r = push_r & (ptr1 < STACK_DEPTH)
        l_col = jnp.where(push_l, ptr, -1)
        r_col = jnp.where(push_r, ptr1, -1)
        stack = jnp.where(_DEPTH_IOTA == r_col[:, None], (left + 1)[:, None],
                          jnp.where(_DEPTH_IOTA == l_col[:, None], left[:, None], stack))
        ptr = ptr1 + push_r.astype(jnp.int32)

        return stack, ptr, occluded, it + 1

    _, _, occluded, _ = jax.lax.while_loop(cond, body, init)
    return occluded


# ---------------------------------------------------------------------------
# Two-level TLAS/BLAS traversal (reference: Src/CUDA/Raytracing/BVH.h:49-55 +
# BVH2.h:98-116 TLAS->BLAS transition) — fully SCALARIZED formulation.
#
# TPU tiling drives the design (see ops/vec.py + tools/profile findings):
# any (R, small-k) array wastes ~97% of each VPU lane row and its minor-dim
# slices cost millions of relayout cycles. So the hot loop carries rays,
# hit records and node data exclusively as flat (R,) component arrays;
# tables are component-major (C, N) so each fetch is a contiguous-source
# scalar gather. Batched tiny matmuls (einsum ray transforms) are 12 scalar
# FMAs.
#
# Instance leaves (count == -1) push a RESTORE marker followed by the
# instance's BLAS root and switch the ray into object space with an
# UNNORMALIZED direction, keeping `t` world-parameterized across spaces (the
# reference relies on the same property). Popping RESTORE switches back to
# the world ray. Nested instancing is not supported (same as the reference).
# ---------------------------------------------------------------------------

from gpu_raytracer_tpu.ops.vec import (
    affine12_dir,
    affine12_point,
    v3_cross,
    v3_dot,
    v3_sub,
    v3_where,
)

RESTORE = jnp.int32(-1)
_DIV_EPS = jnp.float32(1e-12)
_RAY_EPS = jnp.float32(1e-4)


class HitInstanced(NamedTuple):
    t: jnp.ndarray     # (R,) f32, inf on miss (world-parameterized)
    tri: jnp.ndarray   # (R,) i32 object-space triangle id, -1 on miss
    inst: jnp.ndarray  # (R,) i32 instance id, -1 on miss
    u: jnp.ndarray
    v: jnp.ndarray


def _inv1(c):
    tiny = jnp.where(c >= 0, _DIV_EPS, -_DIV_EPS)
    return 1.0 / jnp.where(jnp.abs(c) < _DIV_EPS, tiny, c)


def _slab_s(bmin, bmax, o, inv, t_max):
    """Scalarized slab test; bmin/bmax/o/inv are tuples of (R,)."""
    tx0 = (bmin[0] - o[0]) * inv[0]
    tx1 = (bmax[0] - o[0]) * inv[0]
    ty0 = (bmin[1] - o[1]) * inv[1]
    ty1 = (bmax[1] - o[1]) * inv[1]
    tz0 = (bmin[2] - o[2]) * inv[2]
    tz1 = (bmax[2] - o[2]) * inv[2]
    t_near = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                         jnp.minimum(tz0, tz1))
    t_far = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                        jnp.maximum(tz0, tz1))
    t_near_c = jnp.maximum(t_near, 0.0)
    hit = (t_near <= t_far) & (t_far > 0.0) & (t_near_c < t_max)
    return hit, t_near_c


def _tri_intersect_s(geo_T, ti, o, d, t_max):
    """Scalarized Moller-Trumbore from the (9, T) component-major table."""
    p0 = (geo_T[0][ti], geo_T[1][ti], geo_T[2][ti])
    e1 = (geo_T[3][ti], geo_T[4][ti], geo_T[5][ti])
    e2 = (geo_T[6][ti], geo_T[7][ti], geo_T[8][ti])
    h = v3_cross(d, e2)
    a = v3_dot(e1, h)
    f = 1.0 / jnp.where(jnp.abs(a) < _DIV_EPS, _DIV_EPS, a)
    s = v3_sub(o, p0)
    u = f * v3_dot(s, h)
    q = v3_cross(s, e1)
    v = f * v3_dot(d, q)
    t = f * v3_dot(e2, q)
    hit = ((jnp.abs(a) >= _DIV_EPS)
           & (u >= 0.0) & (u <= 1.0)
           & (v >= 0.0) & (u + v <= 1.0)
           & (t > _RAY_EPS) & (t < t_max))
    return hit, t, u, v


def _child_aabbs(cab_T, node):
    """12 scalar gathers -> (left box, right box) as tuples."""
    g = [cab_T[j][node] for j in range(12)]
    return ((g[0], g[1], g[2]), (g[3], g[4], g[5]),
            (g[6], g[7], g[8]), (g[9], g[10], g[11]))


def _traverse_tlas(nodes, tris, instances, ray_o, ray_d, t_max, any_hit: bool,
                   max_iterations: int):
    """Shared two-level traversal core; scalarized state."""
    R = ray_o.shape[0]
    T = tris["geo_T"].shape[1]
    rows = jnp.arange(R, dtype=jnp.int32)
    geo_T = tris["geo_T"]
    cab_T = nodes["child_aabb_T"]
    left_tbl = nodes["left"]
    count_tbl = nodes["count"]
    inv_T = instances["inv_T"]

    wo = (ray_o[:, 0], ray_o[:, 1], ray_o[:, 2])
    wd = (ray_d[:, 0], ray_d[:, 1], ray_d[:, 2])
    winv = (_inv1(wd[0]), _inv1(wd[1]), _inv1(wd[2]))

    root_hit, _ = _slab_s(
        tuple(nodes["root_min"][c] for c in range(3)),
        tuple(nodes["root_max"][c] for c in range(3)), wo, winv, t_max)
    # Stack is (DEPTH, R): the minor dimension is the fully lane-packed ray
    # axis, so the one-hot push select runs at full VPU width (the (R, DEPTH)
    # layout measured 2.3 ms/iteration in compiled-HLO estimated_cycles).
    stack = jnp.zeros((STACK_DEPTH, R), jnp.int32)
    ptr = root_hit.astype(jnp.int32)

    state = dict(
        stack=stack, ptr=ptr,
        ox=wo[0], oy=wo[1], oz=wo[2],
        dx=wd[0], dy=wd[1], dz=wd[2],
        ix=winv[0], iy=winv[1], iz=winv[2],
        inst=jnp.full(R, -1, jnp.int32),
        best_t=t_max.astype(jnp.float32),
        best_tri=jnp.full(R, -1, jnp.int32),
        best_inst=jnp.full(R, -1, jnp.int32),
        best_u=jnp.zeros(R, jnp.float32),
        best_v=jnp.zeros(R, jnp.float32),
        occluded=jnp.zeros(R, bool),
        it=jnp.int32(0),
    )

    def cond(s):
        return jnp.any(s["ptr"] > 0) & (s["it"] < max_iterations)

    def body(s):
        ptr = s["ptr"]
        if any_hit:
            active = (ptr > 0) & ~s["occluded"]
            ptr = jnp.where(s["occluded"], 0, ptr - active.astype(jnp.int32))
        else:
            active = ptr > 0
            ptr = ptr - active.astype(jnp.int32)
        top = jnp.maximum(s["ptr"] - 1, 0)
        entry = jnp.where(active, s["stack"][top, rows], 0)

        is_restore = active & (entry == RESTORE)
        node = jnp.maximum(entry, 0)
        left = left_tbl[node]
        count = count_tbl[node]
        is_tri_leaf = active & ~is_restore & (count > 0)
        is_interior = active & ~is_restore & (count == 0)
        is_inst_leaf = active & ~is_restore & (count == -1)

        cur_o = (s["ox"], s["oy"], s["oz"])
        cur_d = (s["dx"], s["dy"], s["dz"])
        cur_i = (s["ix"], s["iy"], s["iz"])
        cur_o = v3_where(is_restore, wo, cur_o)
        cur_d = v3_where(is_restore, wd, cur_d)
        cur_i = v3_where(is_restore, winv, cur_i)
        cur_inst = jnp.where(is_restore, -1, s["inst"])

        # ---- triangle leaf phase ----
        best_t = s["best_t"]
        best_tri = s["best_tri"]
        best_inst = s["best_inst"]
        best_u = s["best_u"]
        best_v = s["best_v"]
        occluded = s["occluded"]
        for j in range(LEAF_SIZE):
            ti = jnp.clip(left + j, 0, T - 1)
            hit, t, u, v = _tri_intersect_s(geo_T, ti, cur_o, cur_d,
                                            t_max if any_hit else best_t)
            take = is_tri_leaf & (j < count) & hit
            if any_hit:
                occluded = occluded | take
            else:
                best_t = jnp.where(take, t, best_t)
                best_tri = jnp.where(take, ti, best_tri)
                best_inst = jnp.where(take, cur_inst, best_inst)
                best_u = jnp.where(take, u, best_u)
                best_v = jnp.where(take, v, best_v)

        # ---- interior: both child AABBs via 12 scalar gathers ----
        lmin, lmax, rmin, rmax = _child_aabbs(cab_T, node)
        cull_t = t_max if any_hit else best_t
        hit_l, t_l = _slab_s(lmin, lmax, cur_o, cur_i, cull_t)
        hit_r, t_r = _slab_s(rmin, rmax, cur_o, cur_i, cull_t)
        hit_l = hit_l & is_interior
        hit_r = hit_r & is_interior
        if any_hit:
            hit_l = hit_l & ~occluded
            hit_r = hit_r & ~occluded
            near_is_left = jnp.ones_like(hit_l)
        else:
            near_is_left = t_l <= t_r
        far_node = jnp.where(near_is_left, left + 1, left)
        far_hit = jnp.where(near_is_left, hit_r, hit_l)
        near_node = jnp.where(near_is_left, left, left + 1)
        near_hit = jnp.where(near_is_left, hit_l, hit_r)

        # ---- instance leaf: enter BLAS (12 scalar gathers + FMAs) ----
        enter = is_inst_leaf if not any_hit else (is_inst_leaf & ~occluded)
        inst_idx = jnp.where(is_inst_leaf, left, 0)
        o2 = affine12_point(inv_T, inst_idx, wo)
        d2 = affine12_dir(inv_T, inst_idx, wd)
        cur_o = v3_where(enter, o2, cur_o)
        cur_d = v3_where(enter, d2, cur_d)
        cur_i = v3_where(enter, (_inv1(d2[0]), _inv1(d2[1]), _inv1(d2[2])), cur_i)
        cur_inst = jnp.where(enter, left, cur_inst)
        blas_root = instances["blas_root"][inst_idx]

        # Unified dual push: interior pushes (far, near); instance pushes
        # (RESTORE, blas_root) so the BLAS root pops first.
        # Overflowing pushes are DROPPED (subtree lost, never corrupted): a
        # clamped dual push could overwrite the RESTORE marker with the BLAS
        # root, resuming TLAS traversal with an object-space ray.
        push1 = (far_hit | enter) & (ptr < STACK_DEPTH)
        ptr1 = ptr + push1.astype(jnp.int32)
        push2 = (near_hit | enter) & (ptr1 < STACK_DEPTH)
        node1 = jnp.where(enter, RESTORE, far_node)
        node2 = jnp.where(enter, blas_root, near_node)
        col1 = jnp.where(push1, ptr, -2)
        col2 = jnp.where(push2, ptr1, -2)
        depth_iota = _DEPTH_IOTA_T  # (DEPTH, 1)
        stack = jnp.where(depth_iota == col2[None, :], node2[None, :],
                          jnp.where(depth_iota == col1[None, :],
                                    node1[None, :], s["stack"]))
        ptr = ptr1 + push2.astype(jnp.int32)

        return dict(
            stack=stack, ptr=ptr,
            ox=cur_o[0], oy=cur_o[1], oz=cur_o[2],
            dx=cur_d[0], dy=cur_d[1], dz=cur_d[2],
            ix=cur_i[0], iy=cur_i[1], iz=cur_i[2],
            inst=cur_inst,
            best_t=best_t, best_tri=best_tri, best_inst=best_inst,
            best_u=best_u, best_v=best_v, occluded=occluded, it=s["it"] + 1,
        )

    out = jax.lax.while_loop(cond, body, state)
    return out


@partial(jax.jit, static_argnames=("max_iterations",))
def trace_closest_tlas(nodes, tris, instances, ray_o, ray_d, t_max,
                       max_iterations: int = 200_000) -> HitInstanced:
    """Closest-hit two-level traversal. nodes/tris/instances use the
    component-major device layout from ops/buffers.py."""
    out = _traverse_tlas(nodes, tris, instances, ray_o, ray_d, t_max,
                         any_hit=False, max_iterations=max_iterations)
    t = jnp.where(out["best_tri"] >= 0, out["best_t"], jnp.inf)
    return HitInstanced(t=t, tri=out["best_tri"], inst=out["best_inst"],
                        u=out["best_u"], v=out["best_v"])


@partial(jax.jit, static_argnames=("max_iterations",))
def trace_any_tlas(nodes, tris, instances, ray_o, ray_d, t_max,
                   max_iterations: int = 200_000) -> jnp.ndarray:
    """Any-hit (shadow) two-level traversal -> (R,) bool occlusion."""
    out = _traverse_tlas(nodes, tris, instances, ray_o, ray_d, t_max,
                         any_hit=True, max_iterations=max_iterations)
    return out["occluded"]
