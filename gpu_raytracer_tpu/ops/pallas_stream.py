"""Streaming wide-BVH traversal for beyond-VMEM scenes.

Two-pass design over the paged tables built by bvh/stream.py (see its
docstring for the partitioning):

  PASS 1 (resident): the per-sublane gang traversal (ops/pallas_gang.py
  design) over the VMEM-resident top of the tree. Portal child refs are not
  descended; instead every lane whose slab test hits the portal's AABB
  records (portal id, entry t) into a fixed per-lane list.

  PASS 2 (paged rounds, driven from XLA inside one jit): while any ray has
  a pending portal nearer than its current best hit, pick each ray's
  globally most-popular pending portal (coordinated selection — gangs come
  out near-uniform), sort rays by portal id, and launch the page kernel:
  each 128-ray GANG DMAs its own portal's page (scalar-prefetched page id)
  from HBM into its VMEM slot and traverses from the portal's local root —
  up to 8 distinct portals retire per 1024-ray tile per round. Rays that
  landed in a gang processing a different portal keep their pending entry
  for the next round (the sort makes that rare). Hits fold into the
  running best; occlusion drains pending.

  This mirrors the ROLE of the reference's DRAM-streaming CWBVH traversal
  (/root/reference/Src/CUDA/Raytracing/BVH8.h:19-27 — node fetches are
  size-independent) with TPU mechanics: sequential DMA of 2 MiB pages
  instead of per-thread cached gathers, and ray/portal sorting instead of
  a hardware cache. Cost model: each round streams only the pages that
  have waiting rays, one page copy per 128 waiting rays.

Scope: merged static-scene tables only (no instance rows / RESTORE) — the
configuration big scenes actually use (bvh/stream.py gate).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpu_raytracer_tpu.bvh.stream import PORTAL_BASE
from gpu_raytracer_tpu.ops.pallas_wide import (
    LEAF_CAP,
    STACK_DEPTH,
    _DIV_EPS,
    _RAY_EPS,
    _inv1,
)

BLOCK = 1024
SHAPE = (8, 128)
GANGS = 8
IDLE = -2_000_000_000
# Per-lane pending-portal list length. With production 2 MiB pages a
# portal's AABB is large, so a ray's frustum crosses few portals. Lanes
# that record more than K in one pass are LOSS-FREE handled by the outer
# re-entry loop in _trace_stream: the resident pass replays (same rays,
# same t_max per gang -> identical deterministic enumeration) with the
# recording window advanced by K until no lane overflows, so no portal is
# ever silently dropped (matches the exactness of the reference's
# DRAM-streamed CWBVH, BVH8.h:19-27).
K_PORTALS = 16
M_SUB = 4           # distinct portals each gang serves per page round
MAX_ROUNDS = 1024   # inner page-round safety cap (>= 1 slot clears/round)
MAX_PASSES = 64     # outer re-entry cap: 64 * K = 1024 portals per lane

# KNOWN SCALE LIMIT (round 4): making the traversal loss-free means the
# round/pass loops now do ALL the portal work the round-3 kernel silently
# dropped at its 64-round cap. Beyond ~2-4M triangles per launch the
# single-XLA-program on-device time can trip the TPU watchdog ("worker
# crashed or restarted"). Callers tracing larger scenes should split the
# wave into chunks per launch; raising portal-drain throughput (more
# portals retired per round) is the round-5 item.

# Test hook: CPU-backend tests flip this to run through the interpreter.
FORCE_INTERPRET = False


def _bc(col):
    return jax.lax.broadcast_in_dim(col, SHAPE, (0, 1))


def _gang_body(any_hit, with_portals, load_row, n_rows, vs, sps, stack_ref,
               state, portal_rec=None):
    """One traversal iteration shared by both passes. `load_row(g, idx)`
    loads row `idx` of gang g's unified table ((128,) f32 — phase 1 shares
    one resident table, phase 2 gives each gang its own VMEM page);
    `vs`/`sps` the popped entries / stack pointers; `state` the ray tuple.
    Returns updated (sps, state). `portal_rec` is called on portal
    children."""
    (ox, oy, oz, dx, dy, dz, ix, iy, iz, t_max, dead,
     best_t, best_tri, occ) = state

    rows = []
    for g in range(GANGS):
        v = vs[g]
        idx = jnp.where(v >= 0, v, jnp.clip(-v - 2, 0, n_rows - 1))
        rows.append(load_row(g, idx))
    blk = jnp.stack(rows)                        # (8, 128)

    gang_col = jax.lax.broadcasted_iota(jnp.int32, (GANGS, 1), 0)
    node_v = jnp.zeros((GANGS, 1), jnp.int32)
    leaf_v = jnp.zeros((GANGS, 1), jnp.int32)
    for g in range(GANGS):
        node_v = jnp.where(gang_col == g, (vs[g] >= 0).astype(jnp.int32),
                           node_v)
        leaf_v = jnp.where(gang_col == g,
                           ((vs[g] <= -2) & (vs[g] != IDLE))
                           .astype(jnp.int32), leaf_v)
    node_m = _bc(node_v) > 0
    leaf_m = _bc(leaf_v) > 0
    kind = blk[:, 0:1]
    tri_m = leaf_m & (_bc(kind) >= 0.0)

    cull_t = jnp.where(occ > 0, 0.0, t_max) if any_hit else best_t

    keys, refs = [], []
    portal_any = jnp.int32(0)
    child_data = []
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
        hit = (tn <= tf) & (tf > 0.0) & (jnp.maximum(tn, 0.0) < cull_t) \
            & node_m & ~dead
        tn0 = jnp.maximum(tn, 0.0)
        tmin = jnp.min(jnp.where(hit, tn0, jnp.inf), axis=1, keepdims=True)
        ref = blk[:, 48 + c:49 + c].astype(jnp.int32)        # (8, 1)
        if with_portals:
            is_portal = ref <= -(2 + PORTAL_BASE)            # (8, 1)
            portal_any = portal_any + jnp.sum(
                is_portal.astype(jnp.int32) * (tmin < jnp.inf))
            child_data.append((ref, is_portal, hit, tn0))
            take = (ref != -1) & ~is_portal & (tmin < jnp.inf)
        else:
            take = (ref != -1) & (tmin < jnp.inf)
        keys.append(jnp.where(take, tmin, jnp.inf))
        refs.append(jnp.where(take, ref, jnp.int32(-1)))

    if with_portals and portal_rec is not None:
        portal_rec(portal_any, child_data)

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

    for c in range(7, -1, -1):
        for g in range(GANGS):
            r = refs[c][g, 0]
            take = (r != -1) & (sps[g] < STACK_DEPTH)
            stack_ref[g, jnp.where(take, sps[g], STACK_DEPTH)] = r
            sps[g] = sps[g] + take.astype(jnp.int32)

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

    if any_hit:
        done = jnp.min(occ + dead.astype(jnp.int32), axis=1, keepdims=True)
        for g in range(GANGS):
            sps[g] = jnp.where(done[g, 0] > 0, 0, sps[g])

    return sps, (ox, oy, oz, dx, dy, dz, ix, iy, iz, t_max, dead,
                 best_t, best_tri, occ)


def _pop(sps, stack_ref):
    vs, nsps = [], []
    for g in range(GANGS):
        has = sps[g] > 0
        spm = jnp.where(has, sps[g] - 1, 0)
        v = jnp.where(has, stack_ref[g, spm], jnp.int32(IDLE))
        vs.append(v)
        nsps.append(spm)
    return vs, nsps


def _resident_kernel(any_hit, skip_ref, tab_ref,
                     ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                     tmax_ref,
                     t_out, tri_out, pid_out, pt_out, ovf_out,
                     stack_ref):
    skip = skip_ref[0]
    wox, woy, woz = ox_ref[0], oy_ref[0], oz_ref[0]
    wdx, wdy, wdz = dx_ref[0], dy_ref[0], dz_ref[0]
    t_max = tmax_ref[0]
    dead = t_max <= 0.0

    for k in range(K_PORTALS):
        pid_out[0, k] = jnp.full(SHAPE, -1, jnp.int32)
        pt_out[0, k] = jnp.full(SHAPE, jnp.inf, jnp.float32)
    ovf_out[0] = jnp.zeros(SHAPE, jnp.int32)

    for g in range(GANGS):
        stack_ref[g, 0] = jnp.int32(0)

    def cond(s):
        sps = s[0]
        total = sps[0]
        for g in range(1, GANGS):
            total = total + sps[g]
        return total > 0

    def body(s):
        sps, cnt, state = s
        vs, sps = _pop(sps, stack_ref)

        rec_cnt = [cnt]

        def portal_rec(portal_any, child_data):
            def do_rec(cnt):
                for (ref, is_portal, hit, tn0) in child_data:
                    pid_col = (-ref - 2) - PORTAL_BASE          # (8, 1)
                    rec = hit & (_bc(is_portal.astype(jnp.int32)) > 0)
                    # Record only window [skip, skip + K): re-entry passes
                    # advance `skip` to pick up where the last pass left
                    # off (the enumeration replays deterministically).
                    for k in range(K_PORTALS):
                        sel = rec & (cnt - skip == k)
                        pid_out[0, k] = jnp.where(
                            sel, _bc(pid_col), pid_out[0, k])
                        pt_out[0, k] = jnp.where(sel, tn0, pt_out[0, k])
                    ovf_out[0] = ovf_out[0] + (
                        rec & (cnt - skip >= K_PORTALS)).astype(jnp.int32)
                    cnt = cnt + rec.astype(jnp.int32)
                return cnt

            rec_cnt[0] = jax.lax.cond(portal_any > 0, do_rec,
                                      lambda c: c, rec_cnt[0])

        sps, state = _gang_body(any_hit, True,
                                lambda g, idx: tab_ref[idx],
                                tab_ref.shape[0], vs, sps, stack_ref,
                                state, portal_rec)
        return sps, rec_cnt[0], state

    wix, wiy, wiz = _inv1(wdx), _inv1(wdy), _inv1(wdz)
    state0 = (wox, woy, woz, wdx, wdy, wdz, wix, wiy, wiz, t_max, dead,
              t_max, jnp.full(SHAPE, -1, jnp.int32),
              jnp.zeros(SHAPE, jnp.int32))
    init = ([jnp.int32(1)] * GANGS, jnp.zeros(SHAPE, jnp.int32), state0)
    _, _, state = jax.lax.while_loop(cond, body, init)
    best_t, best_tri, occ = state[11], state[12], state[13]

    if any_hit:
        t_out[0] = jnp.where(occ > 0, 0.0, jnp.inf)
        tri_out[0] = jnp.where(occ > 0, 0, -1)
    else:
        t_out[0] = jnp.where(best_tri >= 0, best_t, jnp.inf)
        tri_out[0] = best_tri


def _page_kernel(any_hit, n_sub, page_rows, pages_ref, pid_ref, root_ref,
                 ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
                 t_out, tri_out,
                 page_vmem, stack_ref, sem):
    # PER-GANG pages, M_SUB portals per gang per launch (round 5): gang g
    # of tile i serves portal slots pid_ref[(i*8+g)*M + m] for m in
    # [0, M). Each sub-round DMAs the gang's next page into its VMEM slot
    # (skipped for unfilled slots), re-roots the stack, and traverses with
    # that sub-round's participation-scoped t_max (tmax_ref[0, m]); the
    # best hit / occlusion folds ACROSS sub-rounds, so one launch retires
    # up to 8*M distinct portals per tile — M x fewer full-wave rounds,
    # sorts and launches than the round-4 one-portal-per-round driver
    # (measured 0.014 Mrays/s at stream-5M, 5% of resident). Duplicated
    # pids across gangs just re-copy; at 2 MiB pages the 16 MiB refill is
    # ~20 us of HBM bandwidth, far below a page traversal.
    i = pl.program_id(0)

    wox, woy, woz = ox_ref[0], oy_ref[0], oz_ref[0]
    wdx, wdy, wdz = dx_ref[0], dy_ref[0], dz_ref[0]
    wix, wiy, wiz = _inv1(wdx), _inv1(wdy), _inv1(wdz)

    # A lane's round limit is identical in every sub-round it joins
    # (inactive sub-rounds carry 0), so the running best starts at max_m.
    lane_lim = tmax_ref[0, 0]
    for m in range(1, n_sub):
        lane_lim = jnp.maximum(lane_lim, tmax_ref[0, m])
    best_t = lane_lim
    best_tri = jnp.full(SHAPE, -1, jnp.int32)
    occ = jnp.zeros(SHAPE, jnp.int32)

    def cond(s):
        sps = s[0]
        total = sps[0]
        for g in range(1, GANGS):
            total = total + sps[g]
        return total > 0

    for m in range(n_sub):
        for g in range(GANGS):
            pid = pid_ref[(i * GANGS + g) * n_sub + m]

            @pl.when(pid >= 0)
            def _():
                pltpu.make_async_copy(pages_ref.at[pid], page_vmem.at[g],
                                      sem.at[g]).start()
        for g in range(GANGS):
            pid = pid_ref[(i * GANGS + g) * n_sub + m]

            @pl.when(pid >= 0)
            def _():
                pltpu.make_async_copy(pages_ref.at[pid], page_vmem.at[g],
                                      sem.at[g]).wait()

        t_max_m = tmax_ref[0, m]
        dead_m = t_max_m <= 0.0
        sps0 = []
        for g in range(GANGS):
            has = pid_ref[(i * GANGS + g) * n_sub + m] >= 0
            stack_ref[g, 0] = root_ref[(i * GANGS + g) * n_sub + m]
            sps0.append(has.astype(jnp.int32))

        def body(s):
            sps, state = s
            vs, sps = _pop(sps, stack_ref)
            sps, state = _gang_body(any_hit, False,
                                    lambda g, idx: page_vmem[g, idx],
                                    page_rows, vs, sps, stack_ref, state)
            return sps, state

        state0 = (wox, woy, woz, wdx, wdy, wdz, wix, wiy, wiz,
                  t_max_m, dead_m, best_t, best_tri, occ)
        _, state = jax.lax.while_loop(cond, body, (sps0, state0))
        best_t, best_tri, occ = state[11], state[12], state[13]

    if any_hit:
        t_out[0] = jnp.where(occ > 0, 0.0, jnp.inf)
        tri_out[0] = jnp.where(occ > 0, 0, -1)
    else:
        t_out[0] = jnp.where(best_tri >= 0, best_t, jnp.inf)
        tri_out[0] = best_tri


def _tile(x, G):
    return x.reshape(G, 8, 128)


# TPU watchdog guard: grid steps run sequentially on the core, so one
# pallas_call's runtime is the SUM over its tiles — a full 1080p wave
# against a multi-million-triangle tree in a single launch can exceed the
# device's execution watchdog. Both phases split waves wider than this
# into several launches (equal results, bounded per-launch runtime).
MAX_TILES_PER_LAUNCH = 512


def _phase1(resident, ray_o, ray_d, t_max, any_hit, interpret, skip=None):
    R = ray_o.shape[0]
    G = R // BLOCK
    if G > MAX_TILES_PER_LAUNCH:
        c = MAX_TILES_PER_LAUNCH * BLOCK
        outs = [_phase1(resident, ray_o[i:i + c], ray_d[i:i + c],
                        t_max[i:i + c], any_hit, interpret, skip)
                for i in range(0, R, c)]
        return tuple(jnp.concatenate([o[k] for o in outs])
                     for k in range(5))
    if skip is None:
        skip = jnp.zeros((1,), jnp.int32)

    tile_spec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shapes = [
        jax.ShapeDtypeStruct((G, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
        jax.ShapeDtypeStruct((G, K_PORTALS, 8, 128), jnp.int32),
        jax.ShapeDtypeStruct((G, K_PORTALS, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
    ]
    klist_spec = pl.BlockSpec((1, K_PORTALS, 8, 128), lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    t, tri, pids, pts, ovf = pl.pallas_call(
        partial(_resident_kernel, any_hit),
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)] + [tile_spec] * 7,
        out_specs=[tile_spec, tile_spec, klist_spec, klist_spec, tile_spec],
        out_shape=out_shapes,
        scratch_shapes=[pltpu.SMEM((GANGS, STACK_DEPTH + 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(resident.shape[0] * 512 + 16 * 1024 * 1024,
                                 120 * 1024 * 1024)),
        interpret=interpret,
    )(skip, resident,
      _tile(ray_o[:, 0], G), _tile(ray_o[:, 1], G), _tile(ray_o[:, 2], G),
      _tile(ray_d[:, 0], G), _tile(ray_d[:, 1], G), _tile(ray_d[:, 2], G),
      _tile(t_max, G))
    n = R
    return (t.reshape(n), tri.reshape(n),
            pids.transpose(0, 2, 3, 1).reshape(n, K_PORTALS),
            pts.transpose(0, 2, 3, 1).reshape(n, K_PORTALS),
            ovf.reshape(n))


def _phase2(pages, gang_pid, gang_root, ray_o, ray_d, tmax_sub, any_hit,
            interpret):
    """One multi-portal page round. `gang_pid`/`gang_root`: (G*GANGS*M,)
    flat per-gang portal slots (-1 = unfilled); `tmax_sub`: (R, M)
    participation-scoped limits (0 where the lane sits a sub-round out)."""
    R = ray_o.shape[0]
    G = R // BLOCK
    M = tmax_sub.shape[1]
    if G > MAX_TILES_PER_LAUNCH:
        c = MAX_TILES_PER_LAUNCH * BLOCK
        gc = MAX_TILES_PER_LAUNCH * GANGS * M
        outs = [_phase2(pages, gang_pid[g:g + gc], gang_root[g:g + gc],
                        ray_o[i:i + c], ray_d[i:i + c],
                        tmax_sub[i:i + c], any_hit, interpret)
                for i, g in zip(range(0, R, c),
                                range(0, G * GANGS * M, gc))]
        return (jnp.concatenate([o[0] for o in outs]),
                jnp.concatenate([o[1] for o in outs]))
    page_rows = pages.shape[1]

    tile_spec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    sub_spec = pl.BlockSpec((1, M, 8, 128), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    tmax_tiles = tmax_sub.reshape(G, 8, 128, M).transpose(0, 3, 1, 2)
    t, tri = pl.pallas_call(
        partial(_page_kernel, any_hit, M, page_rows),
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [tile_spec] * 6 + [sub_spec],
        out_specs=[tile_spec, tile_spec],
        out_shape=[jax.ShapeDtypeStruct((G, 8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((G, 8, 128), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((GANGS, page_rows, 128), jnp.float32),
                        pltpu.SMEM((GANGS, STACK_DEPTH + 1), jnp.int32),
                        pltpu.SemaphoreType.DMA((GANGS,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(page_rows * 512 * (GANGS + 1)
                                 + 16 * 1024 * 1024, 120 * 1024 * 1024)),
        interpret=interpret,
    )(pages, gang_pid, gang_root,
      _tile(ray_o[:, 0], G), _tile(ray_o[:, 1], G), _tile(ray_o[:, 2], G),
      _tile(ray_d[:, 0], G), _tile(ray_d[:, 1], G), _tile(ray_d[:, 2], G),
      tmax_tiles)
    return t.reshape(R), tri.reshape(R)


@partial(jax.jit, static_argnames=("any_hit", "interpret"))
def _trace_stream(resident, pages, portal_page, portal_root,
                  ray_o, ray_d, t_max, any_hit=False, interpret=False):
    interpret = interpret or FORCE_INTERPRET
    R0 = ray_o.shape[0]
    pad = (-R0) % BLOCK
    if pad:
        ray_o = jnp.concatenate([ray_o, jnp.zeros((pad, 3), ray_o.dtype)])
        ray_d = jnp.concatenate([ray_d, jnp.ones((pad, 3), ray_d.dtype)])
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), t_max.dtype)])
    R = R0 + pad

    P = portal_page.shape[0]

    def round_cond(s):
        best_t, best_tri, occluded, pids, pts, r = s
        lim = t_max if any_hit else jnp.minimum(best_t, t_max)
        pending = (pids >= 0) & (pts < lim[:, None])
        if any_hit:
            pending = pending & ~occluded[:, None]
        return jnp.any(pending) & (r < MAX_ROUNDS)

    def round_body(s):
        best_t, best_tri, occluded, pids, pts, r = s
        lim = t_max if any_hit else jnp.minimum(best_t, t_max)
        pending = (pids >= 0) & (pts < lim[:, None])
        if any_hit:
            pending = pending & ~occluded[:, None]
        # COORDINATED selection: every ray picks its globally most-popular
        # pending portal, so the sorted tiles come out near-uniform and a
        # whole portal population retires per tile per round. (Nearest-
        # first would shrink best_t slightly faster but leaves each tile
        # processing only the few rays that agree with its first ray —
        # measured 1-24 active rays/round on an incoherent wave.)
        pop = jnp.zeros((P + 1,), jnp.int32).at[
            jnp.where(pending, pids, P)].add(1, mode="drop")
        score = jnp.where(pending, pop[jnp.clip(pids, 0, P - 1)], -1)
        sel_k = jnp.argmax(score, axis=1)
        has = jnp.any(pending, axis=1)
        sel_pid = jnp.where(has, jnp.take_along_axis(
            pids, sel_k[:, None], axis=1)[:, 0], jnp.int32(2 ** 30))

        order = jnp.argsort(sel_pid, stable=True)
        inv_order = jnp.zeros((R,), jnp.int32).at[order].set(
            jnp.arange(R, dtype=jnp.int32))
        pid_sorted = sel_pid[order]
        # Round 5: each GANG (128 sorted rays) serves its first M_SUB
        # DISTINCT pending portals as in-kernel sub-rounds, and every ray
        # joins each sub-round whose portal appears ANYWHERE in its
        # pending list — so one round retires up to 8*M_SUB portals per
        # tile and several pending slots per ray.
        pg = pid_sorted.reshape(-1, 128)
        n_gang = pg.shape[0]
        is_new = jnp.concatenate(
            [jnp.ones((n_gang, 1), bool), pg[:, 1:] != pg[:, :-1]], axis=1)
        rank = jnp.cumsum(is_new.astype(jnp.int32), axis=1) - 1
        rows = jnp.broadcast_to(jnp.arange(n_gang)[:, None], pg.shape)
        cols = jnp.where(is_new & (rank < M_SUB), rank, M_SUB)
        q = jnp.full((n_gang, M_SUB + 1), 2 ** 30, jnp.int32).at[
            rows, cols].set(pg, mode="drop")[:, :M_SUB]
        q_valid = q < 2 ** 30

        # Per-ray participation per sub-round, in sorted space.
        pids_sorted = pids[order]
        pend_sorted = pending[order]
        q_ray = jnp.repeat(q, 128, axis=0)                    # (R, M)
        match = (pend_sorted[:, :, None]
                 & (pids_sorted[:, :, None] == q_ray[:, None, :])
                 & q_valid.repeat(128, axis=0)[:, None, :])   # (R, K, M)
        active_m = jnp.any(match, axis=1)                     # (R, M)
        lim_sorted = lim[order]
        tmax_sub = jnp.where(active_m, lim_sorted[:, None], 0.0)

        gang_pid = jnp.where(q_valid, q, -1).reshape(-1)
        qc = jnp.clip(q, 0, P - 1)
        gang_page = jnp.where(q_valid, portal_page[qc], -1).reshape(-1)
        gang_root = jnp.where(q_valid, portal_root[qc], 0).reshape(-1)
        del gang_pid
        t2, tri2 = _phase2(pages, gang_page, gang_root,
                           ray_o[order], ray_d[order], tmax_sub,
                           any_hit, interpret)
        t2 = t2[inv_order]
        tri2 = tri2[inv_order]
        processed = jnp.any(active_m, axis=1)[inv_order]

        if any_hit:
            occluded = occluded | (processed & (tri2 >= 0))
        else:
            better = processed & (tri2 >= 0) & (t2 < best_t)
            best_t = jnp.where(better, t2, best_t)
            best_tri = jnp.where(better, tri2, best_tri)
        # Clear EVERY pending slot whose portal was served to this ray.
        clear = jnp.any(match, axis=2)[inv_order]
        pids = jnp.where(clear, -1, pids)
        return best_t, best_tri, occluded, pids, pts, r + 1

    # ---- outer LOSS-FREE pass loop ----
    # Pass p records each lane's portals [p*K, (p+1)*K) (the resident
    # enumeration replays deterministically because every gang with a
    # pending lane re-traces with its ORIGINAL rays and t_max), then the
    # inner round loop drains them against the running global best.
    # A lane stays pending while its pass overflowed the window; portal
    # counts are finite, so every pass strictly advances.
    def pass_cond(s):
        best_t, best_tri, occluded, pending, p = s
        return jnp.any(pending) & (p < MAX_PASSES)

    def pass_body(s):
        best_t, best_tri, occluded, pending, p = s
        # Gang granularity: all 128 lanes of any gang holding a pending
        # lane replay with their original t_max so the gang's traversal
        # (and with it each lane's portal enumeration order) is identical
        # across passes. Non-pending lanes just re-confirm known hits.
        gang_on = jnp.any(pending.reshape(-1, 128), axis=1, keepdims=True)
        tmax_pass = jnp.where(gang_on, t_max.reshape(-1, 128),
                              0.0).reshape(R)
        t1, tri1, pids, pts, ovf = _phase1(
            resident, ray_o, ray_d, tmax_pass, any_hit, interpret,
            skip=(p * K_PORTALS).reshape(1))
        if any_hit:
            occluded = occluded | (tri1 >= 0)
        else:
            better = (tri1 >= 0) & (t1 < best_t)
            best_t = jnp.where(better, t1, best_t)
            best_tri = jnp.where(better, tri1, best_tri)
        best_t, best_tri, occluded, _, _, _ = jax.lax.while_loop(
            round_cond, round_body,
            (best_t, best_tri, occluded, pids, pts, jnp.int32(0)))
        pending = pending & (ovf > 0)
        if any_hit:
            pending = pending & ~occluded
        return best_t, best_tri, occluded, pending, p + 1

    best_t, best_tri, occluded, pending, _ = jax.lax.while_loop(
        pass_cond, pass_body,
        (t_max, jnp.full(R, -1, jnp.int32), jnp.zeros(R, bool),
         t_max > 0.0, jnp.int32(0)))
    # `pending` is all-False unless a lane exceeded MAX_PASSES * K portals.
    residual = pending.astype(jnp.int32)

    if any_hit:
        hit = occluded[:R0]
        return (jnp.where(hit, 0.0, jnp.inf),
                jnp.where(hit, 0, -1), residual[:R0])
    return best_t[:R0], best_tri[:R0], residual[:R0]


def trace_closest_stream(tables: dict, ray_o, ray_d, t_max, interpret=False,
                         with_residual=False):
    """Closest-hit streaming traversal. Returns HitInstanced with inst=-1
    (merged tables; callers remap through the prim map) and u=v=0 (the
    shade stage re-derives them, as with the gang kernel).

    `with_residual=True` additionally returns the (R,) bool mask of lanes
    whose portal enumeration exceeded MAX_PASSES * K_PORTALS — their hit
    may be truncated (a nearer hit behind an unvisited portal). The
    integrator poisons those lanes magenta like NaN pixels rather than
    rendering silently-wrong geometry (advisor round-4 finding)."""
    from gpu_raytracer_tpu.ops.traverse import HitInstanced

    t, tri, residual = _trace_stream(
        tables["resident"], tables["pages"],
        tables["portal_page"], tables["portal_root"],
        ray_o, ray_d, t_max, any_hit=False, interpret=interpret)
    R = ray_o.shape[0]
    zero = jnp.zeros((R,), jnp.float32)
    hit = HitInstanced(t=t, tri=tri, inst=jnp.full((R,), -1, jnp.int32),
                       u=zero, v=zero)
    if with_residual:
        return hit, residual > 0
    return hit


def trace_any_stream(tables: dict, ray_o, ray_d, t_max, interpret=False):
    """Any-hit streaming traversal -> (R,) bool occlusion.

    Lanes whose portal enumeration exceeded the MAX_PASSES * K_PORTALS cap
    (residual) have UNKNOWN occlusion: report them occluded — the shadow
    sample is dropped (a little energy lost) instead of leaking light
    through unvisited geometry (advisor round-4 finding)."""
    t, tri, residual = _trace_stream(
        tables["resident"], tables["pages"],
        tables["portal_page"], tables["portal_root"],
        ray_o, ray_d, t_max, any_hit=True, interpret=interpret)
    return (tri >= 0) | (residual > 0)
