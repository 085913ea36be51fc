ITERS_DIV = 1
"""Bisect the pathological 209us/iter in exp_gang_prims: data-dependent
index vs arithmetic index, vector vs scalar accumulator, iter scaling."""
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
seed = jnp.asarray(np.random.randint(0, N, (8, 128)), jnp.int32)


def run(kernel, iters):
    return jax.jit(lambda: pl.pallas_call(
        partial(kernel, iters),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(table, seed))


# V1: arithmetic index, scalar acc (replica of round-2 experiment)
def k_v1(iters, tab_ref, seed_ref, out_ref):
    def body(i, acc):
        row = tab_ref[(i * 1237) % N]
        return acc + row[0] + row[64]

    acc = jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
    out_ref[:] = jnp.full((8, 128), acc)


# V2: arithmetic index, vector acc
def k_v2(iters, tab_ref, seed_ref, out_ref):
    def body(i, acc):
        row = tab_ref[(i * 1237) % N]
        return acc + row[0]

    acc = jax.lax.fori_loop(0, iters, body, jnp.zeros((8, 128), jnp.float32))
    out_ref[:] = acc


# V3: data-dependent index, scalar acc
def k_v3(iters, tab_ref, seed_ref, out_ref):
    def body(i, carry):
        acc, v = carry
        row = tab_ref[v]
        nxt = row[5].astype(jnp.int32) & (N - 1)
        return acc + row[0], nxt

    acc, _ = jax.lax.fori_loop(0, iters, body,
                               (jnp.float32(0.0), seed_ref[0, 0]))
    out_ref[:] = jnp.full((8, 128), acc)


# V4: data-dependent index, full-row vector add (row broadcast to (8,128))
def k_v4(iters, tab_ref, seed_ref, out_ref):
    def body(i, carry):
        acc, v = carry
        row = tab_ref[v]
        nxt = row[5].astype(jnp.int32) & (N - 1)
        return acc + row, nxt

    acc, _ = jax.lax.fori_loop(0, iters, body,
                               (jnp.zeros((8, 128), jnp.float32),
                                seed_ref[0, 0]))
    out_ref[:] = acc


for iters in (50_000, 400_000):
    globals()['ITERS_DIV'] = iters
    for name, k in (("V1 arith idx, scalar acc", k_v1),
                    ("V2 arith idx, vec acc (row bcast)", k_v2),
                    ("V3 data idx, scalar acc", k_v3),
                    ("V4 data idx, row-vec acc", k_v4)):
        timed(f"{name} iters={iters}", partial(run, k, iters))
