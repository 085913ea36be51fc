"""Pallas TPU kernel: BLOCK-SYNCHRONOUS wide-BVH traversal for scene-scale
tables (the TPU-native answer to the reference's CWBVH kernel,
/root/reference/Src/CUDA/Raytracing/BVH8.h:113-274).

Design rationale (all measured on a v5e, tools/exp_*.py):

- Mosaic has no per-lane vector gather, sliced DMA crashes this toolchain,
  and dynamic lane-indexed scalar reads don't lower — but a DYNAMICALLY
  ROW-INDEXED load of a (N, 128) VMEM table with STATIC element extraction
  runs at ~143 ns including 20 extracts. So the kernel never gathers:
  every iteration pops ONE scalar entry from a stack shared by the whole
  (8, 128) ray tile, loads that single node/leaf row, and broadcasts it
  against all 1024 lanes.
- v5e VMEM is ~128 MB with vmem_limit_bytes raised; Sponza-scale tables
  (~173k tris + nodes ~= 40-60 MB of 512-byte rows) are fully VMEM-resident.
  ops/buffers.py gates on the table budget and falls back to the XLA
  while_loop path beyond it.
- Lockstep coherence replaces the reference's per-warp divergence machinery
  (persistent threads, Dynamic Fetch, Triangle Postponing): rays are
  submitted in 32x32 screen tiles, so a tile visits a near-common node set
  and the per-pop slab test keeps most lanes productive. Incoherent bounce
  rays degrade to visiting the union of their node sets — the cost model
  the wavefront sorts (pathtracer-side) exist to bound.

Table formats are packed by bvh/wide.py:
  nodes (N, 128) f32: 8 children x 6 bounds at [c*6..c*6+6), child refs at
    [48+c] (>= 0 wide-node id | -1 empty | <= -2 leaf row -(v+2))
  rows (L, 128) f32: slot 0 = count (tri leaf, <= LEAF_CAP tris) or -1 (instance)
    tri leaf: [1+j] global tri id; [16+j*9..+9) p0|e1|e2
    instance: [1] instance id; [2..14) inverse transform; [14] BLAS root

Stack entries reuse the child-ref encoding plus RESTORE (-2_000_000_000
sentinel is unnecessary: -1 = empty never pushes, so -1 marks RESTORE).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 1024            # rays per tile, shaped (8, 128)
STACK_DEPTH = 160       # wide depth ~8 levels x 7 pushes + TLAS + headroom
RESTORE = -1            # stack marker: restore world-space ray
SHAPE = (8, 128)
# Max tris per leaf row; the tri loop unrolls this (row capacity limit:
# 16 + 12*9 = 124 <= 128). The merged static path builds its BVH at this
# leaf size with a raised SAH node cost (see buffers._pack_wide_merged):
# a gang-kernel NODE phase costs ~1.35 us vs ~0.3 us for a whole leaf-row
# TRI phase (tools/exp_gang_ablate.py, round 4), so fat leaves beat deep
# trees — Sponza cap12/cn10 traces bounce waves ~8% faster than cap8/cn4
# with 33% fewer interior nodes (tools/exp_leafcap.py). Per-mesh BLAS
# paths build at LEAF_SIZE=4 and just mask off the extra unrolled tests.
LEAF_CAP = 12

_DIV_EPS = 1e-12
_RAY_EPS = 1e-4

# Test hook: CPU-backend tests flip this to run through the interpreter.
FORCE_INTERPRET = False

VMEM_LIMIT = 100 * 1024 * 1024  # conservative cap measured working on v5e


def supports(num_nodes: int, num_rows: int) -> bool:
    """Do the packed tables + ray state fit the VMEM budget?"""
    table_bytes = (num_nodes + num_rows) * 128 * 4
    return table_bytes <= VMEM_LIMIT - 8 * 1024 * 1024


def _inv1(c):
    tiny = jnp.where(c >= 0, _DIV_EPS, -_DIV_EPS)
    return 1.0 / jnp.where(jnp.abs(c) < _DIV_EPS, tiny, c)


def _kernel(any_hit, node_ref, row_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
            t_out, tri_out, inst_out, u_out, v_out,
            stack_ref):
    N = node_ref.shape[0]
    L = row_ref.shape[0]
    SCRAP = STACK_DEPTH  # stack_ref has one trash slot at the end

    wox, woy, woz = ox_ref[0], oy_ref[0], oz_ref[0]
    wdx, wdy, wdz = dx_ref[0], dy_ref[0], dz_ref[0]
    wix, wiy, wiz = _inv1(wdx), _inv1(wdy), _inv1(wdz)
    t_max = tmax_ref[0]
    dead = t_max <= 0.0  # padding lanes

    stack_ref[0] = jnp.int32(0)  # root node

    def cond(s):
        return s[0] > 0

    def body(s):
        (sp, cur_inst,
         ox, oy, oz, dx, dy, dz, ix, iy, iz,
         best_t, best_tri, best_inst, best_u, best_v, occ) = s
        sp = sp - 1
        v = stack_ref[sp]

        cull_t = jnp.where(occ > 0, 0.0, t_max) if any_hit else best_t

        def node_fn(args):
            (sp, cur_inst, ox, oy, oz, dx, dy, dz, ix, iy, iz,
             best_t, best_tri, best_inst, best_u, best_v, occ) = args
            row = node_ref[v]
            keys, refs = [], []
            for c in range(8):
                ref = row[48 + c].astype(jnp.int32)
                bx0 = row[c * 6 + 0]
                by0 = row[c * 6 + 1]
                bz0 = row[c * 6 + 2]
                bx1 = row[c * 6 + 3]
                by1 = row[c * 6 + 4]
                bz1 = row[c * 6 + 5]
                tx0 = (bx0 - ox) * ix
                tx1 = (bx1 - ox) * ix
                ty0 = (by0 - oy) * iy
                ty1 = (by1 - oy) * iy
                tz0 = (bz0 - oz) * iz
                tz1 = (bz1 - oz) * iz
                tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                             jnp.minimum(ty0, ty1)),
                                 jnp.minimum(tz0, tz1))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                             jnp.maximum(ty0, ty1)),
                                 jnp.maximum(tz0, tz1))
                hit = (tn <= tf) & (tf > 0.0) & (jnp.maximum(tn, 0.0) < cull_t)
                # Block-shared front-to-back key: nearest slab entry over the
                # hitting lanes (the block-sync analog of the reference's
                # per-ray octant child order, BVH8.h:148-208).
                tmin = jnp.min(jnp.where(hit, jnp.maximum(tn, 0.0), jnp.inf))
                take = (ref != -1) & (tmin < jnp.inf)
                keys.append(jnp.where(take, tmin, jnp.inf))
                refs.append(jnp.where(take, ref, -1))

            # Batcher odd-even mergesort on 8 scalar (key, ref) pairs,
            # ASCENDING by key; pushes run reversed so the nearest child
            # pops first and best_t tightens as early as possible. Any-hit
            # skips the sort — occlusion needs no visit order.
            if not any_hit:
                for a, b in ((0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3),
                             (4, 6), (5, 7), (1, 2), (5, 6), (0, 4), (1, 5),
                             (2, 6), (3, 7), (2, 4), (3, 5), (1, 2), (3, 4),
                             (5, 6)):
                    swap = keys[a] > keys[b]
                    ka = jnp.where(swap, keys[b], keys[a])
                    kb = jnp.where(swap, keys[a], keys[b])
                    ra = jnp.where(swap, refs[b], refs[a])
                    rb = jnp.where(swap, refs[a], refs[b])
                    keys[a], keys[b] = ka, kb
                    refs[a], refs[b] = ra, rb

            for c in range(7, -1, -1):  # far -> near; near on top of stack
                take = (refs[c] != -1) & (sp < STACK_DEPTH)
                # Unconditional write; non-taken pushes land in the scrap
                # slot (scalar branches cost more than a junk store).
                stack_ref[jnp.where(take, sp, SCRAP)] = refs[c]
                sp = sp + take.astype(jnp.int32)
            return (sp, cur_inst, ox, oy, oz, dx, dy, dz, ix, iy, iz,
                    best_t, best_tri, best_inst, best_u, best_v, occ)

        def other_fn(args):
            def restore_fn(args):
                (sp, cur_inst, ox, oy, oz, dx, dy, dz, ix, iy, iz,
                 best_t, best_tri, best_inst, best_u, best_v, occ) = args
                return (sp, jnp.int32(-1), wox, woy, woz, wdx, wdy, wdz,
                        wix, wiy, wiz,
                        best_t, best_tri, best_inst, best_u, best_v, occ)

            def row_fn(args):
                (sp, cur_inst, ox, oy, oz, dx, dy, dz, ix, iy, iz,
                 best_t, best_tri, best_inst, best_u, best_v, occ) = args
                rid = -v - 2
                row = row_ref[rid]
                kind = row[0].astype(jnp.int32)

                def tri_fn(args):
                    (sp, cur_inst, ox, oy, oz, dx, dy, dz, ix, iy, iz,
                     best_t, best_tri, best_inst, best_u, best_v, occ) = args
                    for j in range(LEAF_CAP):
                        base = 16 + j * 9
                        p0x, p0y, p0z = row[base], row[base + 1], row[base + 2]
                        e1x, e1y, e1z = row[base + 3], row[base + 4], row[base + 5]
                        e2x, e2y, e2z = row[base + 6], row[base + 7], row[base + 8]
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
                        w = f * (dx * qx + dy * qy + dz * qz)
                        t = f * (e2x * qx + e2y * qy + e2z * qz)
                        limit = t_max if any_hit else best_t
                        hit = ((j < kind) & (jnp.abs(a) >= _DIV_EPS)
                               & (u >= 0.0) & (u <= 1.0)
                               & (w >= 0.0) & (u + w <= 1.0)
                               & (t > _RAY_EPS) & (t < limit) & ~dead)
                        if any_hit:
                            occ = jnp.maximum(occ, hit.astype(jnp.int32))
                        else:
                            tid = row[1 + j].astype(jnp.int32)
                            best_t = jnp.where(hit, t, best_t)
                            best_tri = jnp.where(hit, tid, best_tri)
                            best_inst = jnp.where(hit, cur_inst, best_inst)
                            best_u = jnp.where(hit, u, best_u)
                            best_v = jnp.where(hit, w, best_v)
                    if any_hit:
                        # Whole tile occluded (or dead): drain the stack.
                        done = jnp.min(occ + dead.astype(jnp.int32))
                        sp = jnp.where(done > 0, 0, sp)
                    return (sp, cur_inst, ox, oy, oz, dx, dy, dz, ix, iy, iz,
                            best_t, best_tri, best_inst, best_u, best_v, occ)

                def inst_fn(args):
                    (sp, cur_inst, ox, oy, oz, dx, dy, dz, ix, iy, iz,
                     best_t, best_tri, best_inst, best_u, best_v, occ) = args
                    m = [row[2 + k] for k in range(12)]
                    o2x = m[0] * wox + m[1] * woy + m[2] * woz + m[3]
                    o2y = m[4] * wox + m[5] * woy + m[6] * woz + m[7]
                    o2z = m[8] * wox + m[9] * woy + m[10] * woz + m[11]
                    d2x = m[0] * wdx + m[1] * wdy + m[2] * wdz
                    d2y = m[4] * wdx + m[5] * wdy + m[6] * wdz
                    d2z = m[8] * wdx + m[9] * wdy + m[10] * wdz
                    blas_root = row[14].astype(jnp.int32)
                    # push RESTORE then the BLAS root (root pops first)
                    ok1 = sp < STACK_DEPTH
                    stack_ref[jnp.where(ok1, sp, SCRAP)] = jnp.int32(RESTORE)
                    sp1 = sp + ok1.astype(jnp.int32)
                    ok2 = sp1 < STACK_DEPTH
                    stack_ref[jnp.where(ok2 & ok1, sp1, SCRAP)] = blas_root
                    sp = sp1 + (ok2 & ok1).astype(jnp.int32)
                    return (sp, row[1].astype(jnp.int32),
                            o2x, o2y, o2z, d2x, d2y, d2z,
                            _inv1(d2x), _inv1(d2y), _inv1(d2z),
                            best_t, best_tri, best_inst, best_u, best_v, occ)

                return jax.lax.cond(kind > 0, tri_fn, inst_fn, args)

            return jax.lax.cond(v == RESTORE, restore_fn, row_fn, args)

        out = jax.lax.cond(
            v >= 0, node_fn, other_fn,
            (sp, cur_inst, ox, oy, oz, dx, dy, dz, ix, iy, iz,
             best_t, best_tri, best_inst, best_u, best_v, occ))
        return out

    init = (jnp.int32(1), jnp.int32(-1),
            wox, woy, woz, wdx, wdy, wdz, wix, wiy, wiz,
            t_max, jnp.full(SHAPE, -1, jnp.int32),
            jnp.full(SHAPE, -1, jnp.int32),
            jnp.zeros(SHAPE, jnp.float32), jnp.zeros(SHAPE, jnp.float32),
            jnp.zeros(SHAPE, jnp.int32))
    out = jax.lax.while_loop(cond, body, init)
    (_, _, _, _, _, _, _, _, _, _, _,
     best_t, best_tri, best_inst, best_u, best_v, occ) = out

    if any_hit:
        hit_mask = occ > 0
        t_out[0] = jnp.where(hit_mask, 0.0, jnp.inf)
        tri_out[0] = jnp.where(hit_mask, 0, -1)
        inst_out[0] = jnp.where(hit_mask, 0, -1)
        u_out[0] = jnp.zeros(SHAPE, jnp.float32)
        v_out[0] = jnp.zeros(SHAPE, jnp.float32)
    else:
        t_out[0] = jnp.where(best_tri >= 0, best_t, jnp.inf)
        tri_out[0] = best_tri
        inst_out[0] = best_inst
        u_out[0] = best_u
        v_out[0] = best_v


@partial(jax.jit, static_argnames=("any_hit", "interpret"))
def _trace_wide(nodes, rows, ray_o, ray_d, t_max, any_hit=False,
                interpret=False):
    interpret = interpret or FORCE_INTERPRET
    R = ray_o.shape[0]
    pad = (-R) % BLOCK
    if pad:
        ray_o = jnp.concatenate([ray_o, jnp.zeros((pad, 3), ray_o.dtype)])
        ray_d = jnp.concatenate([ray_d, jnp.ones((pad, 3), ray_d.dtype)])
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), t_max.dtype)])
    G = (R + pad) // BLOCK

    def tile_spec():
        return pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def table_spec():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def tile(x):
        return x.reshape(G, 8, 128)

    out_shapes = [
        jax.ShapeDtypeStruct((G, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
        jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
        jax.ShapeDtypeStruct((G, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((G, 8, 128), jnp.float32),
    ]
    table_bytes = (nodes.shape[0] + rows.shape[0]) * 128 * 4
    t, tri, inst, u, v = pl.pallas_call(
        partial(_kernel, any_hit),
        grid=(G,),
        in_specs=[table_spec(), table_spec(),
                  tile_spec(), tile_spec(), tile_spec(),
                  tile_spec(), tile_spec(), tile_spec(), tile_spec()],
        out_specs=[tile_spec()] * 5,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH + 1,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(table_bytes + 8 * 1024 * 1024,
                                 120 * 1024 * 1024)),
        interpret=interpret,
    )(nodes, rows,
      tile(ray_o[:, 0]), tile(ray_o[:, 1]), tile(ray_o[:, 2]),
      tile(ray_d[:, 0]), tile(ray_d[:, 1]), tile(ray_d[:, 2]),
      tile(t_max))
    from gpu_raytracer_tpu.ops.traverse import HitInstanced

    n = R + pad
    return HitInstanced(t=t.reshape(n)[:R], tri=tri.reshape(n)[:R],
                        inst=inst.reshape(n)[:R], u=u.reshape(n)[:R],
                        v=v.reshape(n)[:R])


def trace_closest_wide(nodes, rows, ray_o, ray_d, t_max, interpret=False):
    """Closest-hit wide traversal (drop-in for traverse.trace_closest_tlas)."""
    return _trace_wide(nodes, rows, ray_o, ray_d, t_max, any_hit=False,
                       interpret=interpret)


def trace_any_wide(nodes, rows, ray_o, ray_d, t_max, interpret=False):
    """Any-hit wide traversal -> (R,) bool occlusion."""
    hit = _trace_wide(nodes, rows, ray_o, ray_d, t_max, any_hit=True,
                      interpret=interpret)
    return hit.tri >= 0
