"""Narrow the DMA crash: is it DMA at all, the loop, the slice, or out spec?"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, CHUNK = 4096, 256
tab = jnp.asarray(np.random.rand(N, 16).astype(np.float32))


def run(name, kernel, in_specs, scratch, out_space=pltpu.VMEM,
        out_shape=(8, 128)):
    f = jax.jit(lambda *a: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=out_space),
        scratch_shapes=scratch,
    )(*a))
    try:
        r = f(tab)
        jax.block_until_ready(r)
        print(f"{name}: OK")
    except Exception as e:
        print(f"{name}: FAILED: {str(e)[:160]}")


# 1. plain DMA of whole input ANY->VMEM scratch, no loop, no slice
def k1(tab_hbm, out_ref, scratch, sem):
    dma = pltpu.make_async_copy(tab_hbm, scratch, sem)
    dma.start()
    dma.wait()
    out_ref[:] = scratch[0:8, 0:1] + jnp.zeros((8, 128), jnp.float32)

run("1 whole-dma", k1,
    [pl.BlockSpec(memory_space=pl.ANY)],
    [pltpu.VMEM((N, 16), jnp.float32), pltpu.SemaphoreType.DMA(())])


# 2. static slice DMA, no loop
def k2(tab_hbm, out_ref, scratch, sem):
    dma = pltpu.make_async_copy(tab_hbm.at[pl.ds(0, CHUNK), :], scratch, sem)
    dma.start()
    dma.wait()
    out_ref[:] = scratch[0:8, 0:1] + jnp.zeros((8, 128), jnp.float32)

run("2 slice-dma", k2,
    [pl.BlockSpec(memory_space=pl.ANY)],
    [pltpu.VMEM((CHUNK, 16), jnp.float32), pltpu.SemaphoreType.DMA(())])


# 3. slice DMA inside fori_loop
def k3(tab_hbm, out_ref, scratch, sem):
    def body(i, acc):
        dma = pltpu.make_async_copy(tab_hbm.at[pl.ds(0, CHUNK), :], scratch, sem)
        dma.start()
        dma.wait()
        return acc + scratch[0, 0]
    acc = jax.lax.fori_loop(0, 4, body, jnp.float32(0.0))
    out_ref[:] = jnp.full((8, 128), acc)

run("3 loop-dma", k3,
    [pl.BlockSpec(memory_space=pl.ANY)],
    [pltpu.VMEM((CHUNK, 16), jnp.float32), pltpu.SemaphoreType.DMA(())])


# 4. run_scoped variant (guide's double-buffer pattern)
def k4(tab_hbm, out_ref):
    def inner(scratch, sem):
        dma = pltpu.make_async_copy(tab_hbm.at[pl.ds(0, CHUNK), :], scratch, sem)
        dma.start()
        dma.wait()
        out_ref[:] = scratch[0:8, 0:1] + jnp.zeros((8, 128), jnp.float32)
    pl.run_scoped(inner, scratch=pltpu.VMEM((CHUNK, 16), jnp.float32),
                  sem=pltpu.SemaphoreType.DMA(()))

run("4 run-scoped", k4, [pl.BlockSpec(memory_space=pl.ANY)], [])


# 5. scalar SMEM out instead of VMEM (was the out spec the issue?)
def k5(tab_hbm, out_ref, scratch, sem):
    dma = pltpu.make_async_copy(tab_hbm.at[pl.ds(0, CHUNK), :], scratch, sem)
    dma.start()
    dma.wait()
    out_ref[0, 0] = scratch[0, 0]

run("5 smem-out", k5,
    [pl.BlockSpec(memory_space=pl.ANY)],
    [pltpu.VMEM((CHUNK, 16), jnp.float32), pltpu.SemaphoreType.DMA(())],
    out_space=pltpu.SMEM, out_shape=(1, 1))
