"""Sliced DMA crashes Mosaic here; find a working form of windowed HBM->VMEM."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, CHUNK = 4096, 256
NB = N // CHUNK
tab2 = jnp.asarray(np.random.rand(N, 16).astype(np.float32))
tab3 = tab2.reshape(NB, CHUNK, 16)
tab1 = tab2.reshape(-1)


def run(name, kernel, inputs, in_specs, scratch):
    f = jax.jit(lambda *a: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )(*a))
    try:
        r = f(*inputs)
        jax.block_until_ready(r)
        print(f"{name}: OK")
        return f
    except Exception as e:
        print(f"{name}: FAILED: {str(e)[:160]}")
        return None


# A. python-slice instead of pl.ds
def kA(tab_hbm, out_ref, scratch, sem):
    dma = pltpu.make_async_copy(tab_hbm.at[0:CHUNK], scratch, sem)
    dma.start(); dma.wait()
    out_ref[:] = scratch[0:8, 0:1] + jnp.zeros((8, 128), jnp.float32)

run("A py-slice", kA, (tab2,), [pl.BlockSpec(memory_space=pl.ANY)],
    [pltpu.VMEM((CHUNK, 16), jnp.float32), pltpu.SemaphoreType.DMA(())])


# B. leading-dim static block index on 3D table
def kB(tab_hbm, out_ref, scratch, sem):
    dma = pltpu.make_async_copy(tab_hbm.at[2], scratch, sem)
    dma.start(); dma.wait()
    out_ref[:] = scratch[0:8, 0:1] + jnp.zeros((8, 128), jnp.float32)

run("B static-block-3d", kB, (tab3,), [pl.BlockSpec(memory_space=pl.ANY)],
    [pltpu.VMEM((CHUNK, 16), jnp.float32), pltpu.SemaphoreType.DMA(())])


# C. leading-dim DYNAMIC block index on 3D table
def kC(tab_hbm, out_ref, scratch, sem, smem):
    smem[0] = 3
    b = smem[0]
    dma = pltpu.make_async_copy(tab_hbm.at[b], scratch, sem)
    dma.start(); dma.wait()
    out_ref[:] = scratch[0:8, 0:1] + jnp.zeros((8, 128), jnp.float32)

fC = run("C dyn-block-3d", kC, (tab3,), [pl.BlockSpec(memory_space=pl.ANY)],
         [pltpu.VMEM((CHUNK, 16), jnp.float32), pltpu.SemaphoreType.DMA(()),
          pltpu.SMEM((1,), jnp.int32)])


# D. dynamic block index from vector min
def kD(idx_ref, tab_hbm, out_ref, scratch, sem):
    b = jnp.min(idx_ref[:]) // CHUNK
    dma = pltpu.make_async_copy(tab_hbm.at[b], scratch, sem)
    dma.start(); dma.wait()
    out_ref[:] = scratch[0:8, 0:1] + jnp.zeros((8, 128), jnp.float32)

idx = jax.random.randint(jax.random.PRNGKey(0), (8, 128), 0, N).astype(jnp.int32)
run("D vmin-block-3d", kD, (idx, tab3),
    [pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pl.ANY)],
    [pltpu.VMEM((CHUNK, 16), jnp.float32), pltpu.SemaphoreType.DMA(())])


# E. 1D table with pl.ds
def kE(tab_hbm, out_ref, scratch, sem):
    dma = pltpu.make_async_copy(tab_hbm.at[pl.ds(0, CHUNK * 16)], scratch, sem)
    dma.start(); dma.wait()
    out_ref[:] = scratch[0:8, 0:1].reshape(8, 1) + jnp.zeros((8, 128), jnp.float32)

run("E 1d-ds", kE, (tab1,), [pl.BlockSpec(memory_space=pl.ANY)],
    [pltpu.VMEM((CHUNK * 16,), jnp.float32), pltpu.SemaphoreType.DMA(())])


# F. dynamic block DMA in a loop + timing (the real usage shape)
ITERS = 64
def kF(bs_ref, tab_hbm, out_ref, scratch, sem):
    def body(i, acc):
        b = bs_ref[i]
        dma = pltpu.make_async_copy(tab_hbm.at[b], scratch, sem)
        dma.start(); dma.wait()
        return acc + scratch[0, 0]
    acc = jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    out_ref[:] = jnp.full((8, 128), acc)

bs = jax.random.randint(jax.random.PRNGKey(1), (ITERS,), 0, NB).astype(jnp.int32)
fF = run("F loop-dyn-block", kF, (bs, tab3),
         [pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pl.ANY)],
         [pltpu.VMEM((CHUNK, 16), jnp.float32), pltpu.SemaphoreType.DMA(())])
if fF is not None:
    jax.block_until_ready(fF(bs, tab3))
    t0 = time.perf_counter()
    for _ in range(50):
        r = fF(bs, tab3)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 50
    print(f"   F timing: {dt*1e6:.1f} us / {ITERS} DMAs = {dt/ITERS*1e9:.0f} ns/dma (16KB)")
