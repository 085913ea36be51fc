"""Mosaic primitive probes for the per-sublane GANG traversal design:
8 independent 128-ray gangs per (8,128) tile, each popping its own node.
Tests whether the required primitives lower + their per-iteration cost:
  A: 8 dynamic row loads assembled into an (8,128) block (stack vs scratch)
  B: per-gang lane-broadcast rows[:, k:k+1] -> (8,128)
  C: per-sublane-row reduction (axis=1)
  D: static scalar extract rows[g, k]
  E: 2D SMEM stack indexing stack[g, sp]
  F: per-gang lax.cond picking between two tables
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 4096
ITERS = 100_000
ITERS_DIV = 100_000


def timed(name, make, *args, n=5):
    try:
        fn = make(*args)          # build the jitted callable ONCE
        out = fn()
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{name:52s} FAIL: {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return None
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    per_iter = (time.time() - t0) / n / ITERS_DIV * 1e9
    print(f"{name:52s} {per_iter:8.1f} ns/iter", flush=True)
    return out


table = jnp.asarray(np.random.rand(N, 128), jnp.float32)
table2 = jnp.asarray(np.random.rand(N, 128), jnp.float32)
seed = jnp.asarray(np.random.randint(0, N, (8, 128)), jnp.int32)


def run(kernel, *extra):
    return jax.jit(lambda: pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + len(extra)),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((8, 64), jnp.int32),
                        pltpu.VMEM((8, 128), jnp.float32)],
    )(table, table2, *extra))


# --- baseline: single dynamic row load + static extracts (current kernel) ---
def k_single(tab_ref, tab2_ref, seed_ref, out_ref, smem, scratch):
    def body(i, carry):
        acc, v = carry
        row = tab_ref[v]
        nxt = row[5].astype(jnp.int32) & (N - 1)
        acc = acc + row[0] + row[64]
        return acc + jnp.zeros((8, 128), jnp.float32), nxt

    acc, _ = jax.lax.fori_loop(0, ITERS, body,
                               (jnp.zeros((8, 128), jnp.float32),
                                seed_ref[0, 0]))
    out_ref[:] = acc


timed("baseline single row load", partial(run, k_single), seed)


# --- A1: 8 dynamic loads, jnp.stack assembly ---
def k_stack(tab_ref, tab2_ref, seed_ref, out_ref, smem, scratch):
    def body(i, carry):
        acc, vs = carry
        rows = [tab_ref[vs[g]] for g in range(8)]
        blk = jnp.stack(rows)               # (8,128)
        nvs = tuple((rows[g][5].astype(jnp.int32) & (N - 1)) for g in range(8))
        return acc + blk, nvs

    vs0 = tuple(seed_ref[g, 0] for g in range(8))
    acc, _ = jax.lax.fori_loop(0, ITERS, body,
                               (jnp.zeros((8, 128), jnp.float32), vs0))
    out_ref[:] = acc


timed("A1: 8 loads + jnp.stack", partial(run, k_stack), seed)


# --- A2: 8 dynamic loads into VMEM scratch rows ---
def k_scratch(tab_ref, tab2_ref, seed_ref, out_ref, smem, scratch):
    def body(i, carry):
        acc, vs = carry
        nvs = []
        for g in range(8):
            row = tab_ref[vs[g]]
            scratch[g] = row
            nvs.append(row[5].astype(jnp.int32) & (N - 1))
        blk = scratch[:]
        return acc + blk, tuple(nvs)

    vs0 = tuple(seed_ref[g, 0] for g in range(8))
    acc, _ = jax.lax.fori_loop(0, ITERS, body,
                               (jnp.zeros((8, 128), jnp.float32), vs0))
    out_ref[:] = acc


timed("A2: 8 loads via VMEM scratch", partial(run, k_scratch), seed)


# --- B: assembly + lane broadcast of 8 columns + row reduce + extract ---
def k_full(tab_ref, tab2_ref, seed_ref, out_ref, smem, scratch):
    def body(i, carry):
        acc, vs = carry
        rows = [tab_ref[vs[g]] for g in range(8)]
        blk = jnp.stack(rows)
        s = jnp.zeros((8, 128), jnp.float32)
        for c in range(8):
            col = jax.lax.broadcast_in_dim(blk[:, c * 6:c * 6 + 1],
                                           (8, 128), (0, 1))
            s = s + col * acc
        rmin = jnp.min(s, axis=1, keepdims=True)       # (8,1)
        s = s + jax.lax.broadcast_in_dim(rmin, (8, 128), (0, 1))
        nvs = tuple((rows[g][5].astype(jnp.int32) & (N - 1)) for g in range(8))
        return s * 1e-9 + acc, nvs

    vs0 = tuple(seed_ref[g, 0] for g in range(8))
    acc, _ = jax.lax.fori_loop(0, ITERS, body,
                               (jnp.ones((8, 128), jnp.float32) * 0.5, vs0))
    out_ref[:] = acc


timed("B: + 8 lane-broadcasts + row-reduce", partial(run, k_full), seed)


# --- E: SMEM 2D stack ops per gang ---
def k_smem(tab_ref, tab2_ref, seed_ref, out_ref, smem, scratch):
    for g in range(8):
        smem[g, 0] = seed_ref[g, 0]

    def body(i, carry):
        acc, sps = carry
        nsps = []
        v_any = jnp.int32(0)
        for g in range(8):
            sp = sps[g]
            has = sp > 0
            spm = jnp.where(has, sp - 1, 0)
            v = smem[g, spm]
            v_any = v_any + v
            push = (v + i) & (N - 1)
            ok = has & (spm + 1 < 63)
            smem[g, jnp.where(ok, spm + 1, 63)] = push
            nsps.append(spm + 1 + ok.astype(jnp.int32))
        row = tab_ref[v_any & (N - 1)]
        return acc + row, tuple(nsps)

    sps0 = tuple(jnp.int32(1) for _ in range(8))
    acc, _ = jax.lax.fori_loop(0, ITERS, body,
                               (jnp.zeros((8, 128), jnp.float32), sps0))
    out_ref[:] = acc


timed("E: 8x SMEM 2D stack pop+push", partial(run, k_smem), seed)


# --- F: per-gang lax.cond between two tables ---
def k_cond(tab_ref, tab2_ref, seed_ref, out_ref, smem, scratch):
    def body(i, carry):
        acc, vs = carry
        rows = []
        nvs = []
        for g in range(8):
            v = vs[g]
            row = jax.lax.cond(v & 1, lambda v=v: tab_ref[v],
                               lambda v=v: tab2_ref[v])
            rows.append(row)
            nvs.append(row[5].astype(jnp.int32) & (N - 1))
        blk = jnp.stack(rows)
        return acc + blk, tuple(nvs)

    vs0 = tuple(seed_ref[g, 0] for g in range(8))
    acc, _ = jax.lax.fori_loop(0, ITERS, body,
                               (jnp.zeros((8, 128), jnp.float32), vs0))
    out_ref[:] = acc


timed("F: per-gang cond 2-table load", partial(run, k_cond), seed)


# --- G: masked per-row vector update (instance-transform pattern) ---
def k_maskupd(tab_ref, tab2_ref, seed_ref, out_ref, smem, scratch):
    rowidx = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

    def body(i, carry):
        acc, vs = carry
        nvs = []
        for g in range(8):
            row = tab_ref[vs[g]]
            m0 = row[0]
            acc = jnp.where(rowidx == g, acc * m0 + row[1], acc)
            nvs.append(row[5].astype(jnp.int32) & (N - 1))
        return acc, tuple(nvs)

    vs0 = tuple(seed_ref[g, 0] for g in range(8))
    acc, _ = jax.lax.fori_loop(0, ITERS, body,
                               (jnp.ones((8, 128), jnp.float32), vs0))
    out_ref[:] = acc


timed("G: 8x masked per-row update", partial(run, k_maskupd), seed)
