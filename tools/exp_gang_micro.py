"""Cost anatomy of one gang-kernel iteration: synthetic Pallas kernels run
a FIXED number of iterations with increasing subsets of the real work
(pop -> 8 row loads -> slab -> sort -> pushes -> tri test), so the delta
between variants prices each component. Uses the cached Sponza tables."""
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

GANGS = 8
SHAPE = (8, 128)
N_ITERS = 512
TILES = 64
STACK_DEPTH = 160


def _bc(col):
    return jax.lax.broadcast_in_dim(col, SHAPE, (0, 1))


def _kernel(variant, num_nodes, tab_ref, ox_ref, t_out, stack_ref):
    N = num_nodes
    ox = ox_ref[0]
    oy, oz = ox * 1.01, ox * 0.99
    ix, iy, iz = 1.0 / (ox + 0.5), 1.0 / (ox + 0.6), 1.0 / (ox + 0.7)

    for g in range(GANGS):
        stack_ref[g, 0] = jnp.int32((g * 7919) % N)

    def cond(s):
        return s[0] < N_ITERS

    def body(s):
        it, sps, acc = s
        # ---- pop ----
        if variant == "loop":
            vs = [(it * 31 + g * 7919) % N for g in range(GANGS)]
        else:
            vs, nsps = [], []
            for g in range(GANGS):
                has = sps[g] > 0
                spm = jnp.where(has, sps[g] - 1, 0)
                v = jnp.where(has, stack_ref[g, spm],
                              (it * 31 + g * 7919) % N)
                vs.append(v)
                nsps.append(spm)
            sps = nsps
        if variant in ("loop", "pop"):
            acc = acc + vs[0].astype(jnp.float32)
            return it + 1, sps, acc

        # ---- 8 row loads ----
        rows = []
        for g in range(GANGS):
            rows.append(tab_ref[jnp.clip(vs[g], 0, N - 1)])
        blk = jnp.stack(rows)
        if variant == "load":
            acc = acc + blk
            return it + 1, sps, acc

        # ---- slab phase ----
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
            hit = (tn <= tf) & (tf > 0.0)
            tmin = jnp.min(jnp.where(hit, jnp.maximum(tn, 0.0), jnp.inf),
                           axis=1, keepdims=True)
            ref = blk[:, 48 + c:49 + c].astype(jnp.int32)
            take = (ref != -1) & (tmin < jnp.inf)
            keys.append(jnp.where(take, tmin, jnp.inf))
            refs.append(jnp.where(take, ref, jnp.int32(-1)))
        if variant == "slab":
            acc = acc + keys[0]
            return it + 1, sps, acc

        # ---- batcher sort ----
        if variant in ("sort", "push"):
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
        if variant == "sort":
            acc = acc + keys[0]
            return it + 1, sps, acc

        # ---- pushes (vector extract + SMEM store); sp reset to keep the
        # stack bounded (we only price the machinery) ----
        for c in range(7, -1, -1):
            for g in range(GANGS):
                r = refs[c][g, 0]
                take = (r != -1) & (sps[g] < STACK_DEPTH)
                stack_ref[g, jnp.where(take, sps[g], STACK_DEPTH)] = r
                sps[g] = jnp.where(take, jnp.minimum(sps[g] + 1, 8), sps[g])
        acc = acc + keys[0]
        return it + 1, sps, acc

    init = (jnp.int32(0), [jnp.int32(1)] * GANGS,
            jnp.zeros(SHAPE, jnp.float32))
    _, _, acc = jax.lax.while_loop(cond, body, init)
    t_out[0] = acc


@partial(jax.jit, static_argnames=("variant",))
def run(variant, table, rays):
    G = TILES
    tile_spec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_kernel, variant, table.shape[0]),
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), tile_spec],
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((G, 8, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((GANGS, STACK_DEPTH + 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(table.shape[0] * 512 + 8 * 1024 * 1024,
                                 120 * 1024 * 1024)),
    )(table, rays)


z = np.load("/tmp/sponza_wave.npz")
table = jnp.asarray(np.concatenate([z["nodes"], z["rows"]], 0)[:14265])
rays = jnp.asarray(z["o"][:TILES * 1024, 0].reshape(TILES, 8, 128))
jax.block_until_ready(table)
print("table", table.shape, flush=True)

prev = 0.0
for variant in ("loop", "pop", "load", "slab", "sort", "push"):
    out = run(variant, table, rays)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(5):
        out = run(variant, table, rays)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / 5 * 1000
    ns_per_iter = ms * 1e6 / (N_ITERS * TILES)
    print(f"{variant:6s} {ms:8.2f} ms  {ns_per_iter:7.1f} ns/iter "
          f"(+{ns_per_iter - prev:6.1f})", flush=True)
    prev = ns_per_iter
