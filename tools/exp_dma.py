"""Isolate the Mosaic compile crash in dynamic-offset DMA kernels."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 160_000
CHUNK = 256
ITERS = 64
SHAPE = (8, 128)
tab = jnp.asarray(np.random.rand(N, 16).astype(np.float32))
los = jax.random.randint(jax.random.PRNGKey(0), (ITERS,), 0, N - CHUNK).astype(jnp.int32)
idx = jax.random.randint(jax.random.PRNGKey(1), (ITERS, 8, 128), 0, N - CHUNK)


def bench(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def run(name, kernel, inputs, in_specs, scratch):
    f = jax.jit(lambda *a: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=scratch,
    )(*a))
    try:
        dt = bench(f, *inputs)
        print(f"{name}: OK {dt*1e6:.1f} us ({dt/ITERS*1e9:.0f} ns/iter)")
    except Exception as e:
        print(f"{name}: FAILED: {str(e)[:200]}")


# (a) static lo
def k_static(tab_hbm, out_ref, scratch, sem):
    def body(i, acc):
        dma = pltpu.make_async_copy(tab_hbm.at[pl.ds(0, CHUNK), :], scratch, sem)
        dma.start()
        dma.wait()
        return acc + scratch[0, 0]
    out_ref[0, 0] = jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

run("a static-lo", k_static, (tab,),
    [pl.BlockSpec(memory_space=pl.ANY)],
    [pltpu.VMEM((CHUNK, 16), jnp.float32), pltpu.SemaphoreType.DMA(())])


# (b) dynamic lo from SMEM input
def k_smem(lo_ref, tab_hbm, out_ref, scratch, sem):
    def body(i, acc):
        lo = lo_ref[i]
        dma = pltpu.make_async_copy(tab_hbm.at[pl.ds(lo, CHUNK), :], scratch, sem)
        dma.start()
        dma.wait()
        return acc + scratch[0, 0]
    out_ref[0, 0] = jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

run("b smem-lo", k_smem, (los, tab),
    [pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pl.ANY)],
    [pltpu.VMEM((CHUNK, 16), jnp.float32), pltpu.SemaphoreType.DMA(())])


# (c) dynamic lo = jnp.min over VMEM vector
def k_vmin(idx_ref, tab_hbm, out_ref, scratch, sem):
    def body(i, acc):
        lo = jnp.min(idx_ref[i])
        dma = pltpu.make_async_copy(tab_hbm.at[pl.ds(lo, CHUNK), :], scratch, sem)
        dma.start()
        dma.wait()
        return acc + scratch[0, 0]
    out_ref[0, 0] = jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

run("c vmin-lo", k_vmin, (idx, tab),
    [pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pl.ANY)],
    [pltpu.VMEM((CHUNK, 16), jnp.float32), pltpu.SemaphoreType.DMA(())])


# (d) vmin routed through SMEM scratch
def k_vmin_smem(idx_ref, tab_hbm, out_ref, scratch, sem, smem):
    def body(i, acc):
        smem[0] = jnp.min(idx_ref[i])
        lo = smem[0]
        dma = pltpu.make_async_copy(tab_hbm.at[pl.ds(lo, CHUNK), :], scratch, sem)
        dma.start()
        dma.wait()
        return acc + scratch[0, 0]
    out_ref[0, 0] = jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

run("d vmin-smem-lo", k_vmin_smem, (idx, tab),
    [pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pl.ANY)],
    [pltpu.VMEM((CHUNK, 16), jnp.float32), pltpu.SemaphoreType.DMA(()),
     pltpu.SMEM((1,), jnp.int32)])


# (e) HBM memory space instead of ANY
def k_hbm(lo_ref, tab_hbm, out_ref, scratch, sem):
    def body(i, acc):
        lo = lo_ref[i]
        dma = pltpu.make_async_copy(tab_hbm.at[pl.ds(lo, CHUNK), :], scratch, sem)
        dma.start()
        dma.wait()
        return acc + scratch[0, 0]
    out_ref[0, 0] = jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

run("e hbm-space", k_hbm, (los, tab),
    [pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.HBM)],
    [pltpu.VMEM((CHUNK, 16), jnp.float32), pltpu.SemaphoreType.DMA(())])
