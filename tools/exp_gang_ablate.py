"""Per-iteration cost anatomy of the FLAT gang kernel on real Sponza data.

Copies _gang_flat_kernel into a FIXED-ITERATION harness (fori_loop, K
iterations per tile, no data-dependent while cond) so ablation variants all
execute the identical iteration count and the time delta prices each
component:

  full      — node/tri cond dispatch exactly as production
  node-only — force node phase every iteration
  tri-only  — force tri phase every iteration
  nosort    — node phase without the 19-swap sorting network
  nopush    — node phase without the 8x8 scalar push loop (refs computed,
              extracts+stores skipped)
  nopushst  — push loop keeps the vreg->scalar extracts but writes every
              entry to the scrap slot (prices stores separately from
              extracts)
  noload    — one shared row 0 instead of 8 dynamic row loads
  nored     — child tmin from lane 0 instead of the (8,128)->(8,1) lane
              reduction (prices the 8 jnp.min reductions)

Uses the cached wave from exp_gang_flat.py (/tmp/sponza_wave.npz).
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from gpu_raytracer_tpu.utils import compile_cache

compile_cache.enable()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpu_raytracer_tpu.ops.pallas_gang import (
    BLOCK, GANGS, IDLE, LEAFQ_DEPTH, QTRIG, SHAPE, _bc,
)
from gpu_raytracer_tpu.ops.pallas_wide import (
    LEAF_CAP, STACK_DEPTH, _DIV_EPS, _RAY_EPS, _inv1,
)

T0 = time.time()
K_ITERS = 256


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


def _kernel(num_nodes, variant, tab_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
            t_out, tri_out, inst_out,
            stack_ref, leafq_ref):
    N = num_nodes
    L = tab_ref.shape[0] - num_nodes
    SCRAP = STACK_DEPTH
    QSCRAP = LEAFQ_DEPTH

    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    ix, iy, iz = _inv1(dx), _inv1(dy), _inv1(dz)
    t_max = tmax_ref[0]
    dead = t_max <= 0.0

    for g in range(GANGS):
        stack_ref[g, 0] = jnp.int32(0)

    def body(_, s):
        (sps, lqs, best_t, best_tri, occ) = s

        trig = jnp.int32(0)
        for g in range(GANGS):
            trig = trig + ((lqs[g] >= QTRIG)
                           | ((sps[g] == 0) & (lqs[g] > 0))).astype(jnp.int32)
        if variant == "node-only":
            trig = jnp.int32(0)
        elif variant == "tri-only":
            trig = jnp.int32(1)

        gang_col = jax.lax.broadcasted_iota(jnp.int32, (GANGS, 1), 0)

        def tri_fn(args):
            sps, lqs, best_t, best_tri, occ = args
            vs, nlqs = [], []
            for g in range(GANGS):
                has = lqs[g] > 0
                qm = jnp.where(has, lqs[g] - 1, 0)
                rid = jnp.where(has, leafq_ref[g, qm], jnp.int32(-1))
                vs.append(rid)
                nlqs.append(qm)
            lqs = nlqs

            rows = []
            for g in range(GANGS):
                idx = N + jnp.clip(vs[g], 0, L - 1)
                rows.append(tab_ref[idx])
            blk = jnp.stack(rows)

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
                hit = (leaf_alive & (j < kind) & (jnp.abs(a) >= _DIV_EPS)
                       & (u >= 0.0) & (u <= 1.0)
                       & (w >= 0.0) & (u + w <= 1.0)
                       & (t > _RAY_EPS) & (t < best_t))
                tid = _bc(blk[:, 1 + j:2 + j]).astype(jnp.int32)
                best_t = jnp.where(hit, t, best_t)
                best_tri = jnp.where(hit, tid, best_tri)
            return (sps, lqs, best_t, best_tri, occ)

        def node_fn(args):
            sps, lqs, best_t, best_tri, occ = args
            vs, nsps = [], []
            for g in range(GANGS):
                has = sps[g] > 0
                spm = jnp.where(has, sps[g] - 1, 0)
                v = jnp.where(has, stack_ref[g, spm], jnp.int32(IDLE))
                vs.append(v)
                nsps.append(spm)
            sps = nsps

            if variant == "noload":
                blk = jnp.stack([tab_ref[0]] * GANGS)
            else:
                rows = []
                for g in range(GANGS):
                    rows.append(tab_ref[jnp.clip(vs[g], 0, N - 1)])
                blk = jnp.stack(rows)

            node_v = jnp.zeros((GANGS, 1), jnp.int32)
            for g in range(GANGS):
                node_v = jnp.where(gang_col == g,
                                   (vs[g] >= 0).astype(jnp.int32), node_v)
            node_m = _bc(node_v) > 0

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
                hit = (tn <= tf) & (tf > 0.0) & (jnp.maximum(tn, 0.0)
                                                 < best_t)
                if variant == "nored":
                    tmin = jnp.where(hit[:, 0:1] & node_v > 0,
                                     jnp.maximum(tn[:, 0:1], 0.0), jnp.inf)
                else:
                    tmin = jnp.min(jnp.where(hit & node_m & ~dead,
                                             jnp.maximum(tn, 0.0), jnp.inf),
                                   axis=1, keepdims=True)
                ref = blk[:, 48 + c:49 + c].astype(jnp.int32)
                take = (ref != -1) & (tmin < jnp.inf)
                keys.append(jnp.where(take, tmin, jnp.inf))
                refs.append(jnp.where(take, ref, jnp.int32(-1)))

            if variant == "sorthalf":
                swaps = ((0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3),
                         (4, 6), (5, 7), (1, 2))
            else:
                swaps = ((0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3),
                         (4, 6), (5, 7), (1, 2), (5, 6), (0, 4), (1, 5),
                         (2, 6), (3, 7), (2, 4), (3, 5), (1, 2), (3, 4),
                         (5, 6))
            if variant != "nosort":
                for a, b in swaps:
                    swap = keys[a] > keys[b]
                    ka = jnp.where(swap, keys[b], keys[a])
                    kb = jnp.where(swap, keys[a], keys[b])
                    ra = jnp.where(swap, refs[b], refs[a])
                    rb = jnp.where(swap, refs[a], refs[b])
                    keys[a], keys[b] = ka, kb
                    refs[a], refs[b] = ra, rb

            if variant == "pushbase":
                # Contiguous-block store: all 8 refs at sps0+c / lq0+c
                # (dynamic BASE, static OFFSET, no per-element selects) —
                # the candidate replacement for the conditional push loop.
                for g in range(GANGS):
                    s0, l0 = sps[g], lqs[g]
                    nn = jnp.int32(0)
                    nl = jnp.int32(0)
                    for c in range(8):
                        r = refs[c][g, 0]
                        stack_ref[g, jnp.minimum(s0 + c, SCRAP)] = r
                        leafq_ref[g, jnp.minimum(l0 + c, QSCRAP)] = -r - 2
                        nn = nn + (r >= 0).astype(jnp.int32)
                        nl = nl + (r <= -2).astype(jnp.int32)
                    sps[g] = jnp.minimum(s0 + nn, STACK_DEPTH - 1)
                    lqs[g] = jnp.minimum(l0 + nl, LEAFQ_DEPTH - 1)
            elif variant != "nopush":
                scrap_only = variant == "nopushst"
                for c in range(7, -1, -1):
                    for g in range(GANGS):
                        r = refs[c][g, 0]
                        take_n = (r >= 0) & (sps[g] < STACK_DEPTH)
                        if scrap_only:
                            stack_ref[g, SCRAP] = r
                        else:
                            stack_ref[g, jnp.where(take_n, sps[g], SCRAP)] = r
                        sps[g] = sps[g] + take_n.astype(jnp.int32)
                        take_l = (r <= -2) & (lqs[g] < LEAFQ_DEPTH)
                        if scrap_only:
                            leafq_ref[g, QSCRAP] = -r - 2
                        else:
                            leafq_ref[g, jnp.where(take_l, lqs[g],
                                                   QSCRAP)] = -r - 2
                        lqs[g] = lqs[g] + take_l.astype(jnp.int32)
            else:
                # No vector->scalar extracts at all: fake scalar-only sps
                # growth (fixed-iteration harness; semantics don't matter).
                for g in range(GANGS):
                    sps[g] = jnp.minimum(sps[g] + 2, STACK_DEPTH - 1)
            return (sps, lqs, best_t, best_tri, occ)

        return jax.lax.cond(trig > 0, tri_fn, node_fn,
                            (sps, lqs, best_t, best_tri, occ))

    init = ([jnp.int32(1)] * GANGS, [jnp.int32(0)] * GANGS,
            t_max, jnp.full(SHAPE, -1, jnp.int32), jnp.zeros(SHAPE,
                                                             jnp.int32))
    out = jax.lax.fori_loop(0, K_ITERS, body, init)
    (_, _, best_t, best_tri, occ) = out
    t_out[0] = jnp.where(best_tri >= 0, best_t, jnp.inf)
    tri_out[0] = best_tri
    inst_out[0] = jnp.full(SHAPE, -1, jnp.int32)


@partial(jax.jit, static_argnames=("variant",))
def run(nodes, rows, ray_o, ray_d, t_max, variant="full"):
    R = ray_o.shape[0]
    G = R // BLOCK
    table = jnp.concatenate([nodes, rows], axis=0)
    tile_spec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)

    def _tile(x):
        return x.reshape(G, 8, 128)

    out_shapes = [jax.ShapeDtypeStruct((G, 8, 128), jnp.float32),
                  jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
                  jax.ShapeDtypeStruct((G, 8, 128), jnp.int32)]
    t, tri, inst = pl.pallas_call(
        partial(_kernel, nodes.shape[0], variant),
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [tile_spec] * 7,
        out_specs=[tile_spec] * 3,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.SMEM((GANGS, STACK_DEPTH + 1), jnp.int32),
                        pltpu.SMEM((GANGS, LEAFQ_DEPTH + 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(table.shape[0] * 512 + 8 * 1024 * 1024,
                                 120 * 1024 * 1024)),
    )(table,
      _tile(ray_o[:, 0]), _tile(ray_o[:, 1]), _tile(ray_o[:, 2]),
      _tile(ray_d[:, 0]), _tile(ray_d[:, 1]), _tile(ray_d[:, 2]),
      _tile(t_max))
    return t


CACHE = "/tmp/sponza_wave.npz"
z = np.load(CACHE)
nodes = jnp.asarray(z["nodes"])
rows = jnp.asarray(z["rows"])
bo = jnp.asarray(z["bo"])
bd = jnp.asarray(z["bd"])
btmax = jnp.asarray(z["btmax"])
R = (bo.shape[0] // BLOCK) * BLOCK
bo, bd, btmax = bo[:R], bd[:R], btmax[:R]
jax.block_until_ready(rows)
G = R // BLOCK
log(f"tables on device, {G} tiles x {K_ITERS} fixed iters")

# Timing discipline for the axon tunnel (measured 2026-08-19):
#   1. block_until_ready does NOT reliably block on pallas outputs here —
#      a forced 4-byte scalar readback is the only ground truth.
#   2. same-content re-executions can be served from a cache (~0.1 ms), so
#      every timed call gets a UNIQUE random origin buffer.
# Each variant is timed as (kernel + on-device sum + scalar fetch) minus
# the (sum + fetch) baseline, median of N_REPS.
N_REPS = 3
_rng = np.random.default_rng(7)


@jax.jit
def _dsum(x):
    return jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0))


def _fresh():
    n = jnp.asarray(_rng.uniform(0, 1e-4, bo.shape).astype(np.float32))
    return jax.block_until_ready(bo + n)


def _timed(fn, reps=N_REPS):
    vals = []
    for _ in range(reps):
        x = _fresh()
        t0 = time.time()
        float(_dsum(fn(x)))
        vals.append((time.time() - t0) * 1000.0)
    return sorted(vals)[len(vals) // 2]


float(_dsum(_fresh()))  # compile the sum
base_ms = _timed(lambda x: x)
log(f"fetch baseline {base_ms:.1f} ms")

results = {}
for variant in ("full", "node-only", "tri-only", "nosort", "nopush",
                "nopushst", "noload", "nored", "pushbase", "sorthalf"):
    t0 = time.time()
    float(_dsum(run(nodes, rows, _fresh(), bd, btmax, variant=variant)))
    first = time.time() - t0
    ms = _timed(lambda x: run(nodes, rows, x, bd, btmax,
                              variant=variant)) - base_ms
    per_iter = ms * 1e3 / (G * K_ITERS)
    results[variant] = per_iter
    log(f"{variant:10s} {ms:8.1f} ms   {per_iter:7.3f} us/iter"
        f"  (first {first:.1f}s)")

base = results.get("full")
if base:
    log("--- deltas vs full ---")
    for k, v in results.items():
        if k != "full":
            log(f"{k:10s} {v - base:+7.3f} us/iter")
log("ALL DONE")
