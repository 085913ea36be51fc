"""Can the kernel do single-element dynamic reads from VMEM tables, and how
fast? Decides the node-table layout for block-sync CWBVH traversal."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SHAPE = (8, 128)
POPS = 256


def bench(f, *args, n=20):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def run(name, make, *args):
    try:
        f = make()
        dt = bench(f, *args)
        print(f"{name}: {dt*1e6:.1f} us / {POPS} = {dt/POPS*1e9:.0f} ns/pop")
    except Exception as e:
        print(f"{name}: FAILED: {str(e)[:200]}")


N = 40_000

# --- A: component-major (24, N) f32, 20 dynamic scalar reads per pop -------
tabT = jnp.asarray(np.random.rand(24, N).astype(np.float32))

def makeA():
    def kernel(tab_ref, out_ref, sp):
        def body(i, acc):
            node = (i * 1237) % N
            vals = [tab_ref[c, node] for c in range(20)]
            s = sum(vals)
            return acc + s
        acc = jax.lax.fori_loop(0, POPS, body, jnp.float32(0.0))
        out_ref[:] = jnp.full(SHAPE, acc)
    return jax.jit(lambda t: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(t))

run("A 20-scalar-reads (24,N) VMEM", makeA, tabT)

# --- B: row-major (N, 128) f32 row load + static extracts ------------------
tabR = jnp.asarray(np.random.rand(N // 8, 128).astype(np.float32))

def makeB():
    def kernel(tab_ref, out_ref, sp):
        def body(i, acc):
            node = (i * 1237) % (N // 8)
            row = tab_ref[node]
            s = sum(row[c] for c in range(20))
            return acc + s
        acc = jax.lax.fori_loop(0, POPS, body, jnp.float32(0.0))
        out_ref[:] = jnp.full(SHAPE, acc)
    return jax.jit(lambda t: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(t))

run("B row-load+static-extract (N,128)", makeB, tabR)

# --- C: row load + DYNAMIC extract (2 nodes/row) ---------------------------
def makeC():
    def kernel(tab_ref, out_ref, sp):
        def body(i, acc):
            node = (i * 1237) % N
            row = tab_ref[node // 8]
            off = (node % 8) * 16
            s = jnp.float32(0.0)
            for c in range(16):
                s = s + row[off + c]
            return acc + s
        acc = jax.lax.fori_loop(0, POPS, body, jnp.float32(0.0))
        out_ref[:] = jnp.full(SHAPE, acc)
    return jax.jit(lambda t: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(t))

run("C row-load+dyn-extract 8nodes/row", makeC, tabR)

# --- D: int32 table + byte decode cost -------------------------------------
tabI = jnp.asarray((np.random.rand(20, N) * 2**31).astype(np.int32))

def makeD():
    def kernel(tab_ref, out_ref, sp):
        def body(i, acc):
            node = (i * 1237) % N
            s = jnp.float32(0.0)
            for c in range(20):
                w = tab_ref[c, node]
                b0 = w & 0xFF
                b1 = (w >> 8) & 0xFF
                b2 = (w >> 16) & 0xFF
                b3 = (w >> 24) & 0xFF
                s = s + (b0 + b1 + b2 + b3).astype(jnp.float32)
            return acc + s
        acc = jax.lax.fori_loop(0, POPS, body, jnp.float32(0.0))
        out_ref[:] = jnp.full(SHAPE, acc)
    return jax.jit(lambda t: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(t))

run("D 20-reads + 80-byte-decodes", makeD, tabI)

# --- E: SMEM table scalar reads (baseline; known to work) ------------------
def makeE():
    tabS = jnp.asarray(np.random.rand(20, 8192).astype(np.float32))
    def kernel(tab_ref, out_ref, sp):
        def body(i, acc):
            node = (i * 1237) % 8192
            s = sum(tab_ref[c, node] for c in range(20))
            return acc + s
        acc = jax.lax.fori_loop(0, POPS, body, jnp.float32(0.0))
        out_ref[:] = jnp.full(SHAPE, acc)
    f = jax.jit(lambda t: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(t))
    return lambda: f  # match signature

try:
    tabS = jnp.asarray(np.random.rand(20, 8192).astype(np.float32))
    def kernelE(tab_ref, out_ref, sp):
        def body(i, acc):
            node = (i * 1237) % 8192
            s = sum(tab_ref[c, node] for c in range(20))
            return acc + s
        acc = jax.lax.fori_loop(0, POPS, body, jnp.float32(0.0))
        out_ref[:] = jnp.full(SHAPE, acc)
    fE = jax.jit(lambda t: pl.pallas_call(
        kernelE,
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(t))
    dt = bench(fE, tabS)
    print(f"E 20-scalar-reads SMEM: {dt*1e6:.1f} us / {POPS} = {dt/POPS*1e9:.0f} ns/pop")
except Exception as e:
    print(f"E SMEM: FAILED: {str(e)[:200]}")
