"""Pallas TPU kernel: per-sublane GANG wide-BVH traversal.

Evolution of the block-synchronous kernel (ops/pallas_wide.py) that fixes
its core inefficiency on incoherent waves: that kernel pops ONE stack entry
per iteration and broadcasts the node against all 1024 rays of the (8,128)
tile, so its cost scales with the UNION of the whole tile's working set and
every vector op is wasted on the rays that don't care about that node.

Here each of the 8 sublane rows is an independent GANG of 128 rays with its
own SMEM stack: every iteration pops 8 entries (one per gang), loads 8 rows,
and the (8,128) vector ops test each gang's 128 rays against ITS OWN node —
8x more traversal progress per vector op, and each gang's trip count scales
with the union of only 128 rays. Measured on a v5e
(tools/exp_gang_prims.py): 8 independent dynamic row loads pipeline to
~1.1x the cost of one (211 vs 189 ns), per-gang lane-broadcasts
(8,1)->(8,128), per-sublane-row reductions, and per-gang 2D SMEM stacks all
lower natively.

This is the TPU answer to the reference CWBVH kernel's per-warp divergence
machinery (/root/reference/Src/CUDA/Raytracing/BVH8.h:109-274 — persistent
threads, Dynamic Fetch, Triangle Postponing): the reference lets warps slip
against each other; the gang split lets sublane rows slip against each
other.

Tables are the SAME format as pallas_wide (packed by bvh/wide.py):
  nodes (N, 128) f32: 8 children x 6 bounds at [c*6..c*6+6), child refs at
    [48+c] (>= 0 wide-node id | -1 empty | <= -2 leaf row -(v+2))
  rows (L, 128) f32: slot 0 = count (tri leaf) or -1 (instance row)
    tri leaf: [1+j] global tri id; [16+j*9..+9) p0|e1|e2
    instance: [1] instance id; [2..14) inverse transform; [14] BLAS root

Mixed entry types in one iteration (gang 0 pops a node while gang 1 pops a
leaf row) are handled by loading from ONE unified [nodes; rows] table (the
wrapper concatenates the two; a lax.cond selecting between loads from two
different VMEM refs crashes this Mosaic toolchain with a layout check
failure) and running BOTH the slab phase and the triangle phase every
iteration with per-gang (8,1) row masks — vector work doubles, but the 8x
progress and union shrinkage dominate on the waves that matter.

Outputs: t, tri, inst only. Barycentrics are NOT computed in-kernel: the
shade stage re-derives (u, v) from (ray, t, tri) in XLA (one edge-form
Moller-Trumbore on already-fetched triangle rows) — dropping them saves two
(8,128) carries plus two un-sort gathers per bounce in the integrator.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpu_raytracer_tpu.ops.pallas_wide import (
    LEAF_CAP,
    RESTORE,
    STACK_DEPTH,
    VMEM_LIMIT,
    _DIV_EPS,
    _RAY_EPS,
    _inv1,
)

BLOCK = 1024            # rays per tile: 8 gangs x 128 lanes
SHAPE = (8, 128)
GANGS = 8
IDLE = -2_000_000_000   # popped by a gang whose stack is empty

# Leaf postponing (FLAT kernel): triangle rows found during node descent
# are queued per gang and tested in dedicated tri-phase iterations, which
# fire once any gang has QTRIG queued leaves (or is blocked on an empty
# node stack). Node-only iterations then skip the unrolled LEAF_CAP
# triangle loop (~60% of the per-iteration vector work) — the TPU analog
# of the reference CWBVH kernel's Triangle Postponing
# (/root/reference/Src/CUDA/Raytracing/BVH8.h:228-251).
QTRIG = 8
LEAFQ_DEPTH = QTRIG + 7  # node phases only run while every gang < QTRIG

# Test hook: CPU-backend tests flip this to run through the interpreter.
FORCE_INTERPRET = False


def _bc(col):
    """(8, 1) -> (8, 128) per-gang lane broadcast."""
    return jax.lax.broadcast_in_dim(col, SHAPE, (0, 1))


def _gang_kernel(any_hit, num_nodes, tab_ref,
                 ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
                 t_out, tri_out, inst_out,
                 stack_ref):
    N = num_nodes
    L = tab_ref.shape[0] - num_nodes
    SCRAP = STACK_DEPTH  # stack_ref has one trash slot per gang at the end

    wox, woy, woz = ox_ref[0], oy_ref[0], oz_ref[0]
    wdx, wdy, wdz = dx_ref[0], dy_ref[0], dz_ref[0]
    wix, wiy, wiz = _inv1(wdx), _inv1(wdy), _inv1(wdz)
    t_max = tmax_ref[0]
    dead = t_max <= 0.0  # padding lanes

    rowidx = jax.lax.broadcasted_iota(jnp.int32, SHAPE, 0)

    for g in range(GANGS):
        stack_ref[g, 0] = jnp.int32(0)  # root node per gang

    def cond(s):
        sps = s[0]
        total = sps[0]
        for g in range(1, GANGS):
            total = total + sps[g]
        return total > 0

    def body(s):
        (sps, cur_inst,
         ox, oy, oz, dx, dy, dz, ix, iy, iz,
         best_t, best_tri, best_inst, occ) = s

        # ---- pop one entry per gang (idle gangs pop IDLE) ----
        vs = []
        nsps = []
        for g in range(GANGS):
            has = sps[g] > 0
            spm = jnp.where(has, sps[g] - 1, 0)
            v = jnp.where(has, stack_ref[g, spm], jnp.int32(IDLE))
            vs.append(v)
            nsps.append(spm)
        sps = nsps

        # ---- one row load per gang from the unified table (nodes at
        # [0, N), leaf rows at [N, N+L); leaf refs encode -(rid+2);
        # RESTORE/IDLE land on row N and are masked off below) ----
        rows = []
        for g in range(GANGS):
            v = vs[g]
            idx = jnp.where(v >= 0, jnp.minimum(v, N - 1),
                            N + jnp.clip(-v - 2, 0, L - 1))
            rows.append(tab_ref[idx])
        blk = jnp.stack(rows)                       # (8, 128)

        # Per-gang type masks as (8,1) columns (broadcast against lanes).
        # Assembled with iota+where: Mosaic can't stack scalars into rank-1
        # vectors or reshape 1-bit vectors.
        gang_col = jax.lax.broadcasted_iota(jnp.int32, (GANGS, 1), 0)
        node_v = jnp.zeros((GANGS, 1), jnp.int32)
        leaf_v = jnp.zeros((GANGS, 1), jnp.int32)
        for g in range(GANGS):
            node_v = jnp.where(gang_col == g,
                               (vs[g] >= 0).astype(jnp.int32), node_v)
            leaf_v = jnp.where(gang_col == g,
                               ((vs[g] <= -2) & (vs[g] != IDLE))
                               .astype(jnp.int32), leaf_v)
        # Full (8,128) masks: Mosaic mishandles implicit (8,1)-bool
        # broadcasts, so broadcast the i32 columns and compare.
        node_m = _bc(node_v) > 0
        leaf_m = _bc(leaf_v) > 0
        kind = blk[:, 0:1]                          # tri count | -1 instance
        kind128 = _bc(kind)
        tri_m = leaf_m & (kind128 >= 0.0)
        inst_m = leaf_m & (kind128 < 0.0)
        restore_any = jnp.int32(0)
        inst_any = jnp.int32(0)
        for g in range(GANGS):
            restore_any = restore_any + (vs[g] == RESTORE).astype(jnp.int32)
            inst_any = inst_any + ((vs[g] <= -2) & (vs[g] != IDLE)
                                   & (blk[g, 0] < 0.0)).astype(jnp.int32)

        # ---- RESTORE: gang leaves a BLAS -> back to world-space ray ----
        def do_restore(args):
            cur_inst, ox, oy, oz, dx, dy, dz, ix, iy, iz = args
            rmask = jnp.zeros(SHAPE, bool)
            for g in range(GANGS):
                rmask = rmask | ((rowidx == g) & (vs[g] == RESTORE))
            ci = jnp.where(rmask, -1, cur_inst)
            return (ci,
                    jnp.where(rmask, wox, ox), jnp.where(rmask, woy, oy),
                    jnp.where(rmask, woz, oz), jnp.where(rmask, wdx, dx),
                    jnp.where(rmask, wdy, dy), jnp.where(rmask, wdz, dz),
                    jnp.where(rmask, wix, ix), jnp.where(rmask, wiy, iy),
                    jnp.where(rmask, wiz, iz))

        (cur_inst, ox, oy, oz, dx, dy, dz, ix, iy, iz) = jax.lax.cond(
            restore_any > 0, do_restore, lambda a: a,
            (cur_inst, ox, oy, oz, dx, dy, dz, ix, iy, iz))

        # ---- node phase: slab-test each gang's 8 children against its own
        # 128 rays; per-gang front-to-back via a Batcher sort on (8,1)
        # key/ref columns; push far->near per gang ----
        cull_t = jnp.where(occ > 0, 0.0, t_max) if any_hit else best_t

        keys, refs = [], []
        for c in range(8):
            bx0 = _bc(blk[:, c * 6 + 0:c * 6 + 1])
            by0 = _bc(blk[:, c * 6 + 1:c * 6 + 2])
            bz0 = _bc(blk[:, c * 6 + 2:c * 6 + 3])
            bx1 = _bc(blk[:, c * 6 + 3:c * 6 + 4])
            by1 = _bc(blk[:, c * 6 + 4:c * 6 + 5])
            bz1 = _bc(blk[:, c * 6 + 5:c * 6 + 6])
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
            # Per-gang nearest entry over that gang's hitting lanes.
            tmin = jnp.min(jnp.where(hit & node_m, jnp.maximum(tn, 0.0),
                                     jnp.inf), axis=1, keepdims=True)  # (8,1)
            ref = blk[:, 48 + c:49 + c].astype(jnp.int32)       # (8,1)
            take = (ref != -1) & (tmin < jnp.inf)
            keys.append(jnp.where(take, tmin, jnp.inf))
            refs.append(jnp.where(take, ref, jnp.int32(-1)))

        if not any_hit:
            # Batcher odd-even mergesort, ASCENDING by key, on (8,1)
            # columns — all 8 gangs sort their own children simultaneously.
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

        for c in range(7, -1, -1):  # far -> near; near pops first
            for g in range(GANGS):
                r = refs[c][g, 0]
                take = (r != -1) & (sps[g] < STACK_DEPTH)
                stack_ref[g, jnp.where(take, sps[g], SCRAP)] = r
                sps[g] = sps[g] + take.astype(jnp.int32)

        # ---- triangle phase: each tri-leaf gang tests its own (up to
        # LEAF_CAP) triangles against its 128 rays ----
        leaf_alive = tri_m & ~dead
        for j in range(LEAF_CAP):
            base = 16 + j * 9
            p0x = _bc(blk[:, base + 0:base + 1])
            p0y = _bc(blk[:, base + 1:base + 2])
            p0z = _bc(blk[:, base + 2:base + 3])
            e1x = _bc(blk[:, base + 3:base + 4])
            e1y = _bc(blk[:, base + 4:base + 5])
            e1z = _bc(blk[:, base + 5:base + 6])
            e2x = _bc(blk[:, base + 6:base + 7])
            e2y = _bc(blk[:, base + 7:base + 8])
            e2z = _bc(blk[:, base + 8:base + 9])
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
            hit = (leaf_alive & (j < kind) & (jnp.abs(a) >= _DIV_EPS)
                   & (u >= 0.0) & (u <= 1.0)
                   & (w >= 0.0) & (u + w <= 1.0)
                   & (t > _RAY_EPS) & (t < limit))
            if any_hit:
                occ = jnp.maximum(occ, hit.astype(jnp.int32))
            else:
                tid = _bc(blk[:, 1 + j:2 + j]).astype(jnp.int32)
                best_t = jnp.where(hit, t, best_t)
                best_tri = jnp.where(hit, tid, best_tri)
                best_inst = jnp.where(hit, cur_inst, best_inst)

        if any_hit:
            # Per-gang drain: a gang whose 128 lanes are all occluded (or
            # dead) empties its stack.
            done = jnp.min(occ + dead.astype(jnp.int32), axis=1,
                           keepdims=True)  # (8,1)
            for g in range(GANGS):
                sps[g] = jnp.where(done[g, 0] > 0, 0, sps[g])

        # ---- instance phase: gang enters a BLAS -> transform its rays,
        # push RESTORE + BLAS root ----
        def do_inst(args):
            (sps, cur_inst, ox, oy, oz, dx, dy, dz, ix, iy, iz) = args
            m = [_bc(blk[:, 2 + k:3 + k]) for k in range(12)]
            o2x = m[0] * wox + m[1] * woy + m[2] * woz + m[3]
            o2y = m[4] * wox + m[5] * woy + m[6] * woz + m[7]
            o2z = m[8] * wox + m[9] * woy + m[10] * woz + m[11]
            d2x = m[0] * wdx + m[1] * wdy + m[2] * wdz
            d2y = m[4] * wdx + m[5] * wdy + m[6] * wdz
            d2z = m[8] * wdx + m[9] * wdy + m[10] * wdz
            inst_i = inst_m.astype(jnp.int32)  # bool scalars don't extract
            imask = jnp.zeros(SHAPE, bool)
            for g in range(GANGS):
                g_is_inst = inst_i[g, 0] > 0
                imask = imask | ((rowidx == g) & g_is_inst)
                blas_root = blk[g, 14].astype(jnp.int32)
                ok1 = g_is_inst & (sps[g] < STACK_DEPTH)
                stack_ref[g, jnp.where(ok1, sps[g], SCRAP)] = jnp.int32(RESTORE)
                sp1 = sps[g] + ok1.astype(jnp.int32)
                ok2 = g_is_inst & (sp1 < STACK_DEPTH)
                stack_ref[g, jnp.where(ok2 & ok1, sp1, SCRAP)] = blas_root
                sps[g] = sp1 + (ok2 & ok1).astype(jnp.int32)
            iid = _bc(blk[:, 1:2]).astype(jnp.int32)
            ci = jnp.where(imask, iid, cur_inst)
            return (sps, ci,
                    jnp.where(imask, o2x, ox), jnp.where(imask, o2y, oy),
                    jnp.where(imask, o2z, oz), jnp.where(imask, d2x, dx),
                    jnp.where(imask, d2y, dy), jnp.where(imask, d2z, dz),
                    jnp.where(imask, _inv1(d2x), ix),
                    jnp.where(imask, _inv1(d2y), iy),
                    jnp.where(imask, _inv1(d2z), iz))

        (sps, cur_inst, ox, oy, oz, dx, dy, dz, ix, iy, iz) = jax.lax.cond(
            inst_any > 0, do_inst, lambda a: a,
            (sps, cur_inst, ox, oy, oz, dx, dy, dz, ix, iy, iz))

        return (sps, cur_inst, ox, oy, oz, dx, dy, dz, ix, iy, iz,
                best_t, best_tri, best_inst, occ)

    init = ([jnp.int32(1)] * GANGS, jnp.full(SHAPE, -1, jnp.int32),
            wox, woy, woz, wdx, wdy, wdz, wix, wiy, wiz,
            t_max, jnp.full(SHAPE, -1, jnp.int32),
            jnp.full(SHAPE, -1, jnp.int32),
            jnp.zeros(SHAPE, jnp.int32))
    out = jax.lax.while_loop(cond, body, init)
    (_, _, _, _, _, _, _, _, _, _, _, best_t, best_tri, best_inst, occ) = out

    if any_hit:
        hit_mask = occ > 0
        t_out[0] = jnp.where(hit_mask, 0.0, jnp.inf)
        tri_out[0] = jnp.where(hit_mask, 0, -1)
        inst_out[0] = jnp.where(hit_mask, 0, -1)
    else:
        t_out[0] = jnp.where(best_tri >= 0, best_t, jnp.inf)
        tri_out[0] = best_tri
        inst_out[0] = best_inst


def _gang_flat_kernel(any_hit, num_nodes, count_iters, inv_diag_ref, tab_ref,
                      ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                      tmax_ref,
                      t_out, tri_out, inst_out,
                      stack_ref, stackp_ref, leafq_ref, leafqp_ref):
    """FLAT single-BLAS variant (merged static-scene tables,
    buffers._pack_wide_merged): rays stay world-space for the whole
    traversal (no RESTORE/instance phases), node stacks hold ONLY interior
    refs, and leaf rows are postponed into batched tri-phase iterations
    (see QTRIG above). Each iteration is a lax.cond between a node-only
    phase (slab tests + pushes) and a tri-only phase (one queued leaf row
    per gang through the unrolled Moller-Trumbore), so the expensive
    triangle loop runs only when enough leaf work has accumulated to keep
    all 8 gangs busy.

    Pushes are SIBLING-CURSOR entries (round-5 redesign): the per-
    iteration cost of this kernel is scalar-core bound — round 4's
    contiguous block pushes still paid 64 vreg->scalar extracts plus 128
    SMEM stores per iteration (~1.0 us of the ~1.35 us node phase,
    tools/exp_gang_ablate.py). collapse_wide allocates every node's
    interior children (and leaf rows) at CONSECUTIVE ids in slot order
    (asserted by pack_wide_merged), so the whole push collapses to one
    packed 2-word entry per class per gang:

      word0 = base_id | count << 24     word1 = 8x 4-bit offset nibbles

    where the nibbles hold each hit child's allocation offset in
    far->near order (the same class-grouped sorting network as round 4
    computes them, swapping (key, offset) pairs). A pop consumes nibble
    [count-1] (the nearest remaining child), decrements the count in
    place, and drops the entry at zero — the traversal order is
    BIT-IDENTICAL to the block-push kernel. Scalar work per node phase
    drops from ~24 to ~9 ops/gang (4 extracts + 4 stores + counters);
    the pop side pays +1 read +1 writeback."""
    N = num_nodes
    L = tab_ref.shape[0] - num_nodes
    SCRAP = STACK_DEPTH
    QSCRAP = LEAFQ_DEPTH

    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    ix, iy, iz = _inv1(dx), _inv1(dy), _inv1(dz)
    t_max = tmax_ref[0]
    dead = t_max <= 0.0  # padding / masked lanes

    for g in range(GANGS):
        # Packed root entry: base 0, count 1, offset nibble 0.
        stack_ref[g, 0] = jnp.int32(1 << 24)
        stackp_ref[g, 0] = jnp.int32(0)

    def cond(s):
        sps, lqs = s[0], s[1]
        total = sps[0] + lqs[0]
        for g in range(1, GANGS):
            total = total + sps[g] + lqs[g]
        return total > 0

    def body(s):
        (sps, lqs, qrows, best_t, best_tri, occ, iters) = s

        # Trigger on queued leaf ROWS (qrows), not entries: an entry
        # packs 1..8 rows and the tri phase consumes one ROW per gang.
        trig = jnp.int32(0)
        for g in range(GANGS):
            trig = trig + ((qrows[g] >= QTRIG)
                           | ((sps[g] == 0) & (lqs[g] > 0))).astype(jnp.int32)

        gang_col = jax.lax.broadcasted_iota(jnp.int32, (GANGS, 1), 0)

        # ---- tri phase: each gang pops ONE queued leaf row and tests its
        # (up to LEAF_CAP) triangles against the gang's 128 rays ----
        def tri_fn(args):
            sps, lqs, qrows, best_t, best_tri, occ = args
            vs, nlqs, nqrows = [], [], []
            for g in range(GANGS):
                has = lqs[g] > 0
                qm = jnp.where(has, lqs[g] - 1, 0)
                w0 = leafq_ref[g, qm]
                w1 = leafqp_ref[g, qm]
                kl = w0 >> 24
                nib = (w1 >> (4 * jnp.clip(kl - 1, 0, 7))) & 15
                rid = jnp.where(has, (w0 & 0xFFFFFF) + nib, jnp.int32(-1))
                # Consume the nearest remaining row; drop the entry at 0.
                leafq_ref[g, qm] = w0 - (1 << 24)
                vs.append(rid)
                nlqs.append(jnp.where(has & (kl > 1), lqs[g], qm))
                nqrows.append(qrows[g] - has.astype(jnp.int32))
            lqs = nlqs
            qrows = nqrows

            rows = []
            for g in range(GANGS):
                idx = N + jnp.clip(vs[g], 0, L - 1)
                rows.append(tab_ref[idx])
            blk = jnp.stack(rows)                    # (8, 128)

            act_v = jnp.zeros((GANGS, 1), jnp.int32)
            for g in range(GANGS):
                act_v = jnp.where(gang_col == g,
                                  (vs[g] >= 0).astype(jnp.int32), act_v)
            kind = _bc(blk[:, 0:1])
            leaf_alive = (_bc(act_v) > 0) & ~dead

            for j in range(LEAF_CAP):
                base = 16 + j * 9
                p0x = _bc(blk[:, base + 0:base + 1])
                p0y = _bc(blk[:, base + 1:base + 2])
                p0z = _bc(blk[:, base + 2:base + 3])
                e1x = _bc(blk[:, base + 3:base + 4])
                e1y = _bc(blk[:, base + 4:base + 5])
                e1z = _bc(blk[:, base + 5:base + 6])
                e2x = _bc(blk[:, base + 6:base + 7])
                e2y = _bc(blk[:, base + 7:base + 8])
                e2z = _bc(blk[:, base + 8:base + 9])
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
                hit = (leaf_alive & (j < kind) & (jnp.abs(a) >= _DIV_EPS)
                       & (u >= 0.0) & (u <= 1.0)
                       & (w >= 0.0) & (u + w <= 1.0)
                       & (t > _RAY_EPS) & (t < limit))
                if any_hit:
                    occ = jnp.maximum(occ, hit.astype(jnp.int32))
                else:
                    tid = _bc(blk[:, 1 + j:2 + j]).astype(jnp.int32)
                    best_t = jnp.where(hit, t, best_t)
                    best_tri = jnp.where(hit, tid, best_tri)

            if any_hit:
                done = jnp.min(occ + dead.astype(jnp.int32), axis=1,
                               keepdims=True)  # (8, 1)
                for g in range(GANGS):
                    sps[g] = jnp.where(done[g, 0] > 0, 0, sps[g])
                    lqs[g] = jnp.where(done[g, 0] > 0, 0, lqs[g])
                    qrows[g] = jnp.where(done[g, 0] > 0, 0, qrows[g])
            return (sps, lqs, qrows, best_t, best_tri, occ)

        # ---- node phase: slab-test each gang's 8 children; node children
        # push onto the gang's stack, leaf children onto its leaf queue ----
        def node_fn(args):
            sps, lqs, qrows, best_t, best_tri, occ = args
            vs, nsps = [], []
            for g in range(GANGS):
                has = sps[g] > 0
                spm = jnp.where(has, sps[g] - 1, 0)
                w0 = stack_ref[g, spm]
                w1 = stackp_ref[g, spm]
                kn = w0 >> 24
                nib = (w1 >> (4 * jnp.clip(kn - 1, 0, 7))) & 15
                v = jnp.where(has, (w0 & 0xFFFFFF) + nib, jnp.int32(IDLE))
                # Consume the nearest remaining child in place; the entry
                # survives (sp unchanged) until its count reaches zero.
                stack_ref[g, spm] = w0 - (1 << 24)
                vs.append(v)
                nsps.append(jnp.where(has & (kn > 1), sps[g], spm))
            sps = nsps

            rows = []
            for g in range(GANGS):
                rows.append(tab_ref[jnp.clip(vs[g], 0, N - 1)])
            blk = jnp.stack(rows)                    # (8, 128)

            node_v = jnp.zeros((GANGS, 1), jnp.int32)
            for g in range(GANGS):
                node_v = jnp.where(gang_col == g,
                                   (vs[g] >= 0).astype(jnp.int32), node_v)
            node_m = _bc(node_v) > 0

            cull_t = jnp.where(occ > 0, 0.0, t_max) if any_hit else best_t
            inv_diag = inv_diag_ref[0]

            # Allocation bases and per-class ranks (over ALL children, hit
            # or not — ids were assigned in slot order at pack time).
            BIG = jnp.int32(1 << 24)
            run_n = jnp.zeros((GANGS, 1), jnp.int32)
            run_l = jnp.zeros((GANGS, 1), jnp.int32)
            node_base = jnp.full((GANGS, 1), BIG)
            leaf_base = jnp.full((GANGS, 1), BIG)
            kl_v = jnp.zeros((GANGS, 1), jnp.int32)
            kn_v = jnp.zeros((GANGS, 1), jnp.int32)

            keys, offs = [], []
            for c in range(8):
                bx0 = _bc(blk[:, c * 6 + 0:c * 6 + 1])
                by0 = _bc(blk[:, c * 6 + 1:c * 6 + 2])
                bz0 = _bc(blk[:, c * 6 + 2:c * 6 + 3])
                bx1 = _bc(blk[:, c * 6 + 3:c * 6 + 4])
                by1 = _bc(blk[:, c * 6 + 4:c * 6 + 5])
                bz1 = _bc(blk[:, c * 6 + 5:c * 6 + 6])
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
                tmin = jnp.min(jnp.where(hit & node_m & ~dead,
                                         jnp.maximum(tn, 0.0), jnp.inf),
                               axis=1, keepdims=True)  # (8, 1)
                ref = blk[:, 48 + c:49 + c].astype(jnp.int32)       # (8, 1)
                is_n = ref >= 0
                is_l = ref <= -2
                lid = -ref - 2
                node_base = jnp.minimum(node_base, jnp.where(is_n, ref, BIG))
                leaf_base = jnp.minimum(leaf_base, jnp.where(is_l, lid, BIG))
                off = jnp.where(is_l, run_l, run_n)
                run_n = run_n + is_n.astype(jnp.int32)
                run_l = run_l + is_l.astype(jnp.int32)
                take = (ref != -1) & (tmin < jnp.inf)
                # Class-grouped ascending key: leaves in [-24, -16),
                # nodes in [-8, 0], invalid +inf — one sort yields
                # [leaf far->near | node far->near | invalid] (far
                # first within each class: the entry's nibbles are
                # consumed highest-first, so pops see nearest first).
                # Distances are in 1/8th-diameter units so the -16
                # class offset costs < 2^-20 diameters of ordering
                # precision. Any-hit uses the same grouping: near-first
                # raises the chance the next tri phase finds the
                # occluder and drains the gang.
                tn8 = -jnp.minimum(tmin * inv_diag, 8.0)
                keys.append(jnp.where(
                    take, tn8 + jnp.where(is_l, -16.0, 0.0),
                    jnp.inf))
                offs.append(jnp.where(take, off, 0))
                kl_v = kl_v + (take & is_l).astype(jnp.int32)
                kn_v = kn_v + (take & is_n).astype(jnp.int32)

            for a, b in ((0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3),
                         (4, 6), (5, 7), (1, 2), (5, 6), (0, 4), (1, 5),
                         (2, 6), (3, 7), (2, 4), (3, 5), (1, 2), (3, 4),
                         (5, 6)):
                swap = keys[a] > keys[b]
                ka = jnp.where(swap, keys[b], keys[a])
                kb = jnp.where(swap, keys[a], keys[b])
                ra = jnp.where(swap, offs[b], offs[a])
                rb = jnp.where(swap, offs[a], offs[b])
                keys[a], keys[b] = ka, kb
                offs[a], offs[b] = ra, rb

            # Build the packed sibling-cursor words (all vector math):
            # sorted positions [0, kl) are leaf offsets, [kl, kl+kn) node
            # offsets. Leaf nibbles land at 4*j (static shifts); node
            # nibbles at 4*(j - kl) (per-gang dynamic shift).
            w1l = jnp.zeros((GANGS, 1), jnp.int32)
            w1n = jnp.zeros((GANGS, 1), jnp.int32)
            for j in range(8):
                jj = jnp.int32(j)
                w1l = w1l | jnp.where(jj < kl_v, offs[j] << (4 * j), 0)
                in_node = (jj >= kl_v) & (jj < kl_v + kn_v)
                sh = 4 * jnp.clip(jj - kl_v, 0, 7)
                w1n = w1n | jnp.where(in_node, offs[j] << sh, 0)
            w0n = jnp.where(kn_v > 0, node_base, 0) | (kn_v << 24)
            w0l = jnp.where(kl_v > 0, leaf_base, 0) | (kl_v << 24)

            # One 2-word entry per class per gang, stored UNCONDITIONALLY
            # (a count-0 entry lands at the top-of-stack slot and is
            # overwritten before any pop can read it). Entry occupancy is
            # bounded by the wide-tree DEPTH (each live ancestor holds at
            # most one entry) — pack_wide_merged asserts depth + 1 <=
            # STACK_DEPTH; min(s0, SCRAP) stays as an unreachable belt.
            for g in range(GANGS):
                s0 = sps[g]
                l0 = lqs[g]
                w0n_g = w0n[g, 0]
                w1n_g = w1n[g, 0]
                w0l_g = w0l[g, 0]
                w1l_g = w1l[g, 0]
                stack_ref[g, jnp.minimum(s0, SCRAP)] = w0n_g
                stackp_ref[g, jnp.minimum(s0, SCRAP)] = w1n_g
                leafq_ref[g, jnp.minimum(l0, QSCRAP)] = w0l_g
                leafqp_ref[g, jnp.minimum(l0, QSCRAP)] = w1l_g
                kn_g = w0n_g >> 24
                kl_g = w0l_g >> 24
                sps[g] = s0 + (kn_g > 0).astype(jnp.int32)
                # LEAFQ_DEPTH = QTRIG + 7 makes overflow impossible: node
                # phases only run while every gang holds < QTRIG rows,
                # and entries <= rows.
                lqs[g] = l0 + (kl_g > 0).astype(jnp.int32)
                qrows[g] = qrows[g] + kl_g
            return (sps, lqs, qrows, best_t, best_tri, occ)

        sps, lqs, qrows, best_t, best_tri, occ = jax.lax.cond(
            trig > 0, tri_fn, node_fn,
            (sps, lqs, qrows, best_t, best_tri, occ))
        # iters packs (node_iters, tri_iters) as node*2^16 + tri.
        iters = iters + jnp.where(trig > 0, 1, 1 << 16)
        return (sps, lqs, qrows, best_t, best_tri, occ, iters)

    init = ([jnp.int32(1)] * GANGS, [jnp.int32(0)] * GANGS,
            [jnp.int32(0)] * GANGS,
            t_max, jnp.full(SHAPE, -1, jnp.int32),
            jnp.zeros(SHAPE, jnp.int32), jnp.int32(0))
    out = jax.lax.while_loop(cond, body, init)
    (_, _, _, best_t, best_tri, occ, iters) = out

    if any_hit:
        hit_mask = occ > 0
        t_out[0] = jnp.where(hit_mask, 0.0, jnp.inf)
        tri_out[0] = jnp.where(hit_mask, 0, -1)
        inst_out[0] = jnp.where(hit_mask, 0, -1)
    else:
        t_out[0] = jnp.where(best_tri >= 0, best_t, jnp.inf)
        tri_out[0] = best_tri
        if count_iters:
            # Diagnostic: per-tile packed iteration counts instead of inst
            # (flat tables carry no instance ids anyway).
            inst_out[0] = jnp.full(SHAPE, iters, jnp.int32)
        else:
            inst_out[0] = jnp.full(SHAPE, -1, jnp.int32)


@partial(jax.jit, static_argnames=("any_hit", "flat", "count_iters",
                                   "interpret"))
def _trace_gang(nodes, rows, ray_o, ray_d, t_max, any_hit=False, flat=False,
                count_iters=False, interpret=False):
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
    ]
    table_bytes = (nodes.shape[0] + rows.shape[0]) * 128 * 4
    # One unified [nodes; rows] table: the kernel indexes it with a single
    # dynamic row load (a lax.cond between loads from two separate refs
    # crashes Mosaic's layout pass on this toolchain). XLA CSEs the
    # concatenation across calls with the same buffers.
    table = jnp.concatenate([nodes, rows], axis=0)
    if flat:
        kernel = partial(_gang_flat_kernel, any_hit, nodes.shape[0],
                         count_iters)
        # Packed sibling-cursor entries: base ids must fit in 24 bits
        # (word0 = base | count << 24).
        assert nodes.shape[0] < (1 << 24) and rows.shape[0] < (1 << 24)
        scratch = [pltpu.SMEM((GANGS, STACK_DEPTH + 1), jnp.int32),
                   pltpu.SMEM((GANGS, STACK_DEPTH + 1), jnp.int32),
                   pltpu.SMEM((GANGS, LEAFQ_DEPTH + 1), jnp.int32),
                   pltpu.SMEM((GANGS, LEAFQ_DEPTH + 1), jnp.int32)]
        # 1/diameter of the root's child union: the kernel's class-grouped
        # sort keys measure distance in 1/8th-diameter units (see
        # _gang_flat_kernel docstring). Tiny XLA reduction, CSEd per table.
        root = nodes[0]
        cb = root[:48].reshape(8, 6)
        cmask = (root[48:56] != -1.0)[:, None]
        lo = jnp.min(jnp.where(cmask, cb[:, 0:3], jnp.inf), axis=0)
        hi = jnp.max(jnp.where(cmask, cb[:, 3:6], -jnp.inf), axis=0)
        diag = jnp.max(hi - lo)
        inv_diag = jnp.where(jnp.isfinite(diag) & (diag > 1e-20),
                             1.0 / diag, 1.0).reshape(1)
        extra_in = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        extra_args = [inv_diag]
    else:
        kernel = partial(_gang_kernel, any_hit, nodes.shape[0])
        scratch = [pltpu.SMEM((GANGS, STACK_DEPTH + 1), jnp.int32)]
        extra_in = []
        extra_args = []
    t, tri, inst = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=extra_in + [table_spec(),
                             tile_spec(), tile_spec(), tile_spec(),
                             tile_spec(), tile_spec(), tile_spec(),
                             tile_spec()],
        out_specs=[tile_spec()] * 3,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(table_bytes + 8 * 1024 * 1024,
                                 120 * 1024 * 1024)),
        interpret=interpret,
    )(*extra_args, table,
      tile(ray_o[:, 0]), tile(ray_o[:, 1]), tile(ray_o[:, 2]),
      tile(ray_d[:, 0]), tile(ray_d[:, 1]), tile(ray_d[:, 2]),
      tile(t_max))
    from gpu_raytracer_tpu.ops.traverse import HitInstanced

    n = R + pad
    # u, v are re-derived by the shade stage (see module docstring); the
    # Hit tuple carries zeros so the interface stays uniform.
    zero = jnp.zeros((R,), jnp.float32)
    return HitInstanced(t=t.reshape(n)[:R], tri=tri.reshape(n)[:R],
                        inst=inst.reshape(n)[:R], u=zero, v=zero)


def trace_closest_gang(nodes, rows, ray_o, ray_d, t_max, flat=False,
                       interpret=False):
    """Closest-hit gang traversal (u/v left zero — recompute in shade).

    `flat=True` selects the leaf-postponing single-BLAS kernel for merged
    static-scene tables (no instance rows; pathtracer passes
    `wide_prim_map is not None`)."""
    return _trace_gang(nodes, rows, ray_o, ray_d, t_max, any_hit=False,
                       flat=flat, interpret=interpret)


def trace_any_gang(nodes, rows, ray_o, ray_d, t_max, flat=False,
                   interpret=False):
    """Any-hit gang traversal -> (R,) bool occlusion."""
    hit = _trace_gang(nodes, rows, ray_o, ray_d, t_max, any_hit=True,
                      flat=flat, interpret=interpret)
    return hit.tri >= 0
