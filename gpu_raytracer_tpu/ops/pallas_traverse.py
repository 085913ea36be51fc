"""Pallas TPU kernel: whole-loop two-level BVH traversal for VMEM-scale
scenes.

Motivation (measured, see README performance log): the XLA `while_loop`
traversal lowers each iteration to ~100 small fusions, each paying a kernel
launch plus an HBM round trip of the (R,) state arrays — ~2.5 ms/iteration at
R=262144 on a v5e. This kernel runs the ENTIRE traversal loop for a block of
rays inside one Mosaic program: ray state, per-ray stacks and the scene
tables all live in VMEM, so an iteration touches no HBM at all.

Mosaic has no per-lane gather primitive ("Cannot do int indexing on TPU"),
so table fetches are scalar select-scans: the (16, N) tables live in SMEM,
and each row element is loaded as a scalar and broadcast against an
(8, 128) lane-index compare (O(N) per fetch, but fully register-resident —
one-hot formulations materialize (8, 128, N) intermediates that pad N to
128 lanes and OOM VMEM). `supports()` gates on the SMEM table budget; the
caller falls back to the XLA path for larger scenes. The CWBVH
byte-quantized layout (bvh/bvh8.py) streamed through VMEM is the planned
path to Sponza-scale tables.

Table row layouts (packed by ops/buffers.py `_pack_pallas`):
  node_mat (16, N):  [0:12] child AABBs (lmin,lmax,rmin,rmax), [12] left,
                     [13] count (+1 tri leaf / 0 interior / -1 instance leaf)
  inst_mat (16, I):  [0:12] inverse transform rows, [12] blas_root
  tri_mat  (16, T):  [0:9] p0|e1|e2
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 1024  # rays per grid step, shaped (8, 128)
STACK_DEPTH = 48
LEAF_SIZE = 4
RESTORE = -1
# SMEM budget for the three (16, N) f32 tables. Measured on v5e: 536 KB of
# tables compiles, 1.3 MB fails SMEM allocation; 600 KB keeps headroom. The
# select-scan fetch is O(table length) per iteration, but it beats the XLA
# while_loop path at every size that fits (2.7x at N=3254/T=5120; 25x at
# N=931 — the XLA path pays ~100 fusion launches per iteration regardless).
MAX_TABLE_BYTES = 600_000

_DIV_EPS = 1e-12

# Test hook: CPU-backend tests flip this before first use to run the kernels
# through the Pallas interpreter (read at trace time).
FORCE_INTERPRET = False
_RAY_EPS = 1e-4


def supports(num_nodes: int, num_tris: int, num_instances: int) -> bool:
    return 64 * (num_nodes + num_tris + num_instances) <= MAX_TABLE_BYTES


def pack_tables(nodes, tris, instances):
    """Host-side packing into column-major (16, N) matrices whose rows are
    contiguous (N,) vectors the kernel broadcasts against."""
    n = np.asarray(nodes["left"]).shape[0]
    node_mat = np.zeros((16, n), np.float32)
    node_mat[0:12] = np.asarray(nodes["child_aabb_T"])
    node_mat[12] = np.asarray(nodes["left"], np.float32)
    node_mat[13] = np.asarray(nodes["count"], np.float32)

    i = np.asarray(instances["blas_root"]).shape[0]
    inst_mat = np.zeros((16, i), np.float32)
    inst_mat[0:12] = np.asarray(instances["inv_T"])
    inst_mat[12] = np.asarray(instances["blas_root"], np.float32)

    t = np.asarray(tris["geo_T"]).shape[1]
    tri_mat = np.zeros((16, t), np.float32)
    tri_mat[0:9] = np.asarray(tris["geo_T"])

    # Numpy on purpose: build_scene_buffers uploads the whole host pytree
    # once at the end (np.asarray on a device buffer is a slow readback).
    return (node_mat, inst_mat, tri_mat)


def _inv1(c):
    tiny = jnp.where(c >= 0, _DIV_EPS, -_DIV_EPS)
    return 1.0 / jnp.where(jnp.abs(c) < _DIV_EPS, tiny, c)


def _kernel(any_hit, node_ref, inst_ref, tri_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
            t_out, tri_out, inst_out, u_out, v_out,
            stack_ref):
    """Rays live as (8, 128) native tiles; tables as (16, N) column-major
    matrices in VMEM; per-lane fetches are one-hot select-sums over the
    (8, 128, N) mask (Mosaic has no per-lane gather)."""
    N = node_ref.shape[1]
    I = inst_ref.shape[1]
    T = tri_ref.shape[1]
    SHAPE = (8, 128)

    depth_iota = jax.lax.broadcasted_iota(jnp.int32, (STACK_DEPTH,) + SHAPE, 0)

    def fetch(table_ref, idx, cols, n, mask=None):
        """Per-lane gather as a scalar select-scan: tables live in SMEM and
        each row element is broadcast against an (8, 128) lane-index compare.
        Scalar loads with zero 3-D intermediates (a one-hot formulation pads
        the table axis to 128 lanes and OOMs VMEM). The scan covers only
        [min(idx), max(idx)] over `mask`ed lanes — coherent ray blocks visit
        clustered rows, so the dynamic range is usually a small fraction of
        the table."""
        if mask is not None:
            lo = jnp.min(jnp.where(mask, idx, n - 1))
            hi = jnp.max(jnp.where(mask, idx, 0)) + 1
        else:
            lo = jnp.min(idx)
            hi = jnp.max(idx) + 1
        def body(j, accs):
            sel = idx == j
            return tuple(jnp.where(sel, table_ref[c, j], a)
                         for c, a in zip(cols, accs))
        init = tuple(jnp.zeros(SHAPE, jnp.float32) for _ in cols)
        return list(jax.lax.fori_loop(lo, hi, body, init))

    wox, woy, woz = ox_ref[0], oy_ref[0], oz_ref[0]
    wdx, wdy, wdz = dx_ref[0], dy_ref[0], dz_ref[0]
    wix, wiy, wiz = _inv1(wdx), _inv1(wdy), _inv1(wdz)
    t_max = tmax_ref[0]

    stack_ref[:] = jnp.zeros((STACK_DEPTH,) + SHAPE, jnp.int32)
    ptr0 = jnp.ones(SHAPE, jnp.int32)  # root pops first (no pre-test)

    def cond(s):
        return jnp.any(s[0] > 0)

    def body(s):
        (ptr, ox, oy, oz, dx, dy, dz, ivx, ivy, ivz, cur_inst,
         best_t, best_tri, best_inst, best_u, best_v) = s
        active = ptr > 0
        top = jnp.maximum(ptr - 1, 0)
        entry = jnp.sum(jnp.where(depth_iota == top[None], stack_ref[:], 0), axis=0)
        entry = jnp.where(active, entry, 0)
        ptr = ptr - active.astype(jnp.int32)

        is_restore = active & (entry == RESTORE)
        node = jnp.maximum(entry, 0)
        node = jnp.where(active, node, 0)
        nvals = fetch(node_ref, node, list(range(14)), N, mask=active)
        left = nvals[12].astype(jnp.int32)
        count = nvals[13].astype(jnp.int32)

        is_tri_leaf = active & ~is_restore & (count > 0)
        is_interior = active & ~is_restore & (count == 0)
        is_inst_leaf = active & ~is_restore & (count == -1)

        ox = jnp.where(is_restore, wox, ox)
        oy = jnp.where(is_restore, woy, oy)
        oz = jnp.where(is_restore, woz, oz)
        dx = jnp.where(is_restore, wdx, dx)
        dy = jnp.where(is_restore, wdy, dy)
        dz = jnp.where(is_restore, wdz, dz)
        ivx = jnp.where(is_restore, wix, ivx)
        ivy = jnp.where(is_restore, wiy, ivy)
        ivz = jnp.where(is_restore, wiz, ivz)
        cur_inst = jnp.where(is_restore, -1, cur_inst)

        # ---- leaf: LEAF_SIZE packed triangle fetches. The O(T) scan only
        # runs when some lane is actually in a leaf this iteration. ----
        def leaf_phase(args):
            best_t, best_tri, best_inst, best_u, best_v = args
            for j in range(LEAF_SIZE):
                ti = jnp.clip(jnp.where(is_tri_leaf, left, 0) + j, 0, T - 1)
                g = fetch(tri_ref, ti, list(range(9)), T, mask=is_tri_leaf)
                p0x, p0y, p0z, e1x, e1y, e1z, e2x, e2y, e2z = g
                hx = dy * e2z - dz * e2y
                hy = dz * e2x - dx * e2z
                hz = dx * e2y - dy * e2x
                a = e1x * hx + e1y * hy + e1z * hz
                f = 1.0 / jnp.where(jnp.abs(a) < _DIV_EPS, _DIV_EPS, a)
                sx, sy, sz = ox - p0x, oy - p0y, oz - p0z
                u = f * (sx * hx + sy * hy + sz * hz)
                qx = sy * e1z - sz * e1y
                qy = sz * e1x - sx * e1z
                qz = sx * e1y - sy * e1x
                v = f * (dx * qx + dy * qy + dz * qz)
                t = f * (e2x * qx + e2y * qy + e2z * qz)
                hit = ((jnp.abs(a) >= _DIV_EPS) & (u >= 0.0) & (u <= 1.0)
                       & (v >= 0.0) & (u + v <= 1.0)
                       & (t > _RAY_EPS) & (t < best_t))
                take = is_tri_leaf & (j < count) & hit
                best_t = jnp.where(take, t, best_t)
                best_tri = jnp.where(take, ti, best_tri)
                best_inst = jnp.where(take, cur_inst, best_inst)
                best_u = jnp.where(take, u, best_u)
                best_v = jnp.where(take, v, best_v)
            return best_t, best_tri, best_inst, best_u, best_v

        (best_t, best_tri, best_inst, best_u, best_v) = jax.lax.cond(
            jnp.any(is_tri_leaf), leaf_phase, lambda a: a,
            (best_t, best_tri, best_inst, best_u, best_v))

        # ---- interior: both child slabs from the fetched node row ----
        def slab(c0):
            tx0 = (nvals[c0 + 0] - ox) * ivx
            ty0 = (nvals[c0 + 1] - oy) * ivy
            tz0 = (nvals[c0 + 2] - oz) * ivz
            tx1 = (nvals[c0 + 3] - ox) * ivx
            ty1 = (nvals[c0 + 4] - oy) * ivy
            tz1 = (nvals[c0 + 5] - oz) * ivz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                             jnp.minimum(tz0, tz1))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                             jnp.maximum(tz0, tz1))
            tn_c = jnp.maximum(tn, 0.0)
            return (tn <= tf) & (tf > 0.0) & (tn_c < best_t), tn_c

        hit_l, t_l = slab(0)
        hit_r, t_r = slab(6)
        hit_l = hit_l & is_interior
        hit_r = hit_r & is_interior
        near_is_left = t_l <= t_r
        far_node = jnp.where(near_is_left, left + 1, left)
        near_node = jnp.where(near_is_left, left, left + 1)
        far_hit = (near_is_left & hit_r) | (~near_is_left & hit_l)
        near_hit = (near_is_left & hit_l) | (~near_is_left & hit_r)

        # ---- instance leaf: world -> object transform. Instance leaves
        # only occur in the first iterations of each restart; gate the O(I)
        # scan on any lane needing it. ----
        def inst_phase(args):
            ox, oy, oz, dx, dy, dz, ivx, ivy, ivz, cur_inst, _ = args
            inst_idx = jnp.where(is_inst_leaf, left, 0)
            m = fetch(inst_ref, inst_idx, list(range(13)), I,
                      mask=is_inst_leaf)
            blas_root = m[12].astype(jnp.int32)
            o2x = m[0] * wox + m[1] * woy + m[2] * woz + m[3]
            o2y = m[4] * wox + m[5] * woy + m[6] * woz + m[7]
            o2z = m[8] * wox + m[9] * woy + m[10] * woz + m[11]
            d2x = m[0] * wdx + m[1] * wdy + m[2] * wdz
            d2y = m[4] * wdx + m[5] * wdy + m[6] * wdz
            d2z = m[8] * wdx + m[9] * wdy + m[10] * wdz
            ox = jnp.where(is_inst_leaf, o2x, ox)
            oy = jnp.where(is_inst_leaf, o2y, oy)
            oz = jnp.where(is_inst_leaf, o2z, oz)
            dx = jnp.where(is_inst_leaf, d2x, dx)
            dy = jnp.where(is_inst_leaf, d2y, dy)
            dz = jnp.where(is_inst_leaf, d2z, dz)
            ivx = jnp.where(is_inst_leaf, _inv1(d2x), ivx)
            ivy = jnp.where(is_inst_leaf, _inv1(d2y), ivy)
            ivz = jnp.where(is_inst_leaf, _inv1(d2z), ivz)
            cur_inst2 = jnp.where(is_inst_leaf, left, cur_inst)
            return (ox, oy, oz, dx, dy, dz, ivx, ivy, ivz, cur_inst2,
                    blas_root)

        (ox, oy, oz, dx, dy, dz, ivx, ivy, ivz, cur_inst,
         blas_root) = jax.lax.cond(
            jnp.any(is_inst_leaf), inst_phase, lambda a: a,
            (ox, oy, oz, dx, dy, dz, ivx, ivy, ivz, cur_inst,
             jnp.zeros(SHAPE, jnp.int32)))

        # Overflowing pushes are DROPPED (subtree lost, never corrupted): a
        # clamped dual push could overwrite an instance RESTORE marker with
        # the BLAS root, resuming TLAS traversal with an object-space ray.
        push1 = (far_hit | is_inst_leaf) & (ptr < STACK_DEPTH)
        ptr1 = ptr + push1.astype(jnp.int32)
        push2 = (near_hit | is_inst_leaf) & (ptr1 < STACK_DEPTH)
        node1 = jnp.where(is_inst_leaf, RESTORE, far_node)
        node2 = jnp.where(is_inst_leaf, blas_root, near_node)
        col1 = jnp.where(push1, ptr, -2)
        col2 = jnp.where(push2, ptr1, -2)
        stack_ref[:] = jnp.where(depth_iota == col2[None], node2[None],
                                 jnp.where(depth_iota == col1[None],
                                           node1[None], stack_ref[:]))
        ptr = ptr1 + push2.astype(jnp.int32)
        if any_hit:  # shadow rays terminate on first accepted hit
            ptr = jnp.where(best_tri >= 0, 0, ptr)

        return (ptr, ox, oy, oz, dx, dy, dz, ivx, ivy, ivz, cur_inst,
                best_t, best_tri, best_inst, best_u, best_v)

    init = (ptr0, wox, woy, woz, wdx, wdy, wdz, wix, wiy, wiz,
            jnp.full(SHAPE, -1, jnp.int32),
            t_max, jnp.full(SHAPE, -1, jnp.int32), jnp.full(SHAPE, -1, jnp.int32),
            jnp.zeros(SHAPE, jnp.float32), jnp.zeros(SHAPE, jnp.float32))
    out = jax.lax.while_loop(cond, body, init)
    (_, _, _, _, _, _, _, _, _, _, _,
     best_t, best_tri, best_inst, best_u, best_v) = out

    t_out[0] = jnp.where(best_tri >= 0, best_t, jnp.inf)
    tri_out[0] = best_tri
    inst_out[0] = best_inst
    u_out[0] = best_u
    v_out[0] = best_v


@partial(jax.jit, static_argnames=("any_hit", "interpret"))
def _trace_pallas(node_mat, inst_mat, tri_mat, ray_o, ray_d, t_max,
                  any_hit=False, interpret=False):
    """Traversal via the Pallas kernel. Table matrices come from
    `pack_tables` (column-major (16, N)). Rays are padded to a BLOCK
    multiple; each grid step processes one (8, 128) ray tile."""
    interpret = interpret or FORCE_INTERPRET
    R = ray_o.shape[0]
    pad = (-R) % BLOCK
    if pad:
        ray_o = jnp.concatenate([ray_o, jnp.zeros((pad, 3), ray_o.dtype)])
        ray_d = jnp.concatenate([ray_d, jnp.ones((pad, 3), ray_d.dtype)])
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), t_max.dtype)])
    G = (R + pad) // BLOCK
    grid = (G,)

    def block_spec():
        return pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)

    def tile(x):
        return x.reshape(G, 8, 128)

    out_shapes = [
        jax.ShapeDtypeStruct((G, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
        jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
        jax.ShapeDtypeStruct((G, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((G, 8, 128), jnp.float32),
    ]
    t, tri, inst, u, v = pl.pallas_call(
        partial(_kernel, any_hit),
        grid=grid,
        in_specs=[smem(), smem(), smem(),
                  block_spec(), block_spec(), block_spec(),
                  block_spec(), block_spec(), block_spec(), block_spec()],
        out_specs=[block_spec()] * 5,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((STACK_DEPTH, 8, 128), jnp.int32)],
        interpret=interpret,
    )(node_mat, inst_mat, tri_mat,
      tile(ray_o[:, 0]), tile(ray_o[:, 1]), tile(ray_o[:, 2]),
      tile(ray_d[:, 0]), tile(ray_d[:, 1]), tile(ray_d[:, 2]),
      tile(t_max))
    from gpu_raytracer_tpu.ops.traverse import HitInstanced

    n = R + pad
    return HitInstanced(t=t.reshape(n)[:R], tri=tri.reshape(n)[:R],
                        inst=inst.reshape(n)[:R], u=u.reshape(n)[:R],
                        v=v.reshape(n)[:R])


def trace_closest_pallas(node_mat, inst_mat, tri_mat, ray_o, ray_d, t_max,
                         interpret=False):
    """Closest-hit traversal (drop-in for traverse.trace_closest_tlas)."""
    return _trace_pallas(node_mat, inst_mat, tri_mat, ray_o, ray_d, t_max,
                         any_hit=False, interpret=interpret)


def trace_any_pallas(node_mat, inst_mat, tri_mat, ray_o, ray_d, t_max,
                     interpret=False):
    """Any-hit (shadow) traversal -> (R,) bool occlusion (drop-in for
    traverse.trace_any_tlas)."""
    hit = _trace_pallas(node_mat, inst_mat, tri_mat, ray_o, ray_d, t_max,
                        any_hit=True, interpret=interpret)
    return hit.tri >= 0
