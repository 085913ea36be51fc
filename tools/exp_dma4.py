"""More DMA workarounds: 1D ds (fixed), VMEM->VMEM slice copy, dst slicing."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, CHUNK = 4096, 256
tab1 = jnp.asarray(np.random.rand(N * 16).astype(np.float32))
tab2 = tab1.reshape(N, 16)


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


# E2. 1D ds DMA, fixed output math
def kE(tab_hbm, out_ref, scratch, sem):
    dma = pltpu.make_async_copy(tab_hbm.at[pl.ds(256, CHUNK * 16)], scratch, sem)
    dma.start(); dma.wait()
    out_ref[:] = jnp.full((8, 128), scratch[0])

run("E2 1d-static-ds", kE, (tab1,), [pl.BlockSpec(memory_space=pl.ANY)],
    [pltpu.VMEM((CHUNK * 16,), jnp.float32), pltpu.SemaphoreType.DMA(())])


# E3. 1D dynamic ds DMA
def kE3(lo_ref, tab_hbm, out_ref, scratch, sem):
    dma = pltpu.make_async_copy(tab_hbm.at[pl.ds(lo_ref[0] * 16, CHUNK * 16)],
                                scratch, sem)
    dma.start(); dma.wait()
    out_ref[:] = jnp.full((8, 128), scratch[0])

lo = jnp.array([128], jnp.int32)
run("E3 1d-dyn-ds", kE3, (lo, tab1),
    [pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pl.ANY)],
    [pltpu.VMEM((CHUNK * 16,), jnp.float32), pltpu.SemaphoreType.DMA(())])


# G. VMEM->VMEM slice "copy" via plain indexed read (dynamic slice read)
def kG(lo_ref, out_ref, vmem_tab, scratch, sem):
    # vmem_tab is scratch preloaded? use input in VMEM directly:
    pass

def kG2(lo_ref, tab_vmem, out_ref):
    lo = lo_ref[0]
    w = tab_vmem[pl.ds(lo, 8), 0:128]  # dynamic-slice read from VMEM input
    out_ref[:] = w

tabv = jnp.asarray(np.random.rand(N, 128).astype(np.float32))
run("G vmem-dyn-read", kG2, (lo, tabv),
    [pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    [])


# H. whole-ref DMA but source pre-sliced OUTSIDE via .at on the ref arg?
# (input_output trick not possible; skip)

# I. copy HBM->VMEM whole, slice inside VMEM (VMEM must hold whole table -> no)

# J. dst-sliced DMA: whole src, slice of dst
def kJ(tab_hbm, out_ref, scratch, sem):
    dma = pltpu.make_async_copy(tab_hbm, scratch.at[pl.ds(0, N)], sem)
    dma.start(); dma.wait()
    out_ref[:] = jnp.full((8, 128), scratch[0, 0])

run("J dst-slice", kJ, (tab2,), [pl.BlockSpec(memory_space=pl.ANY)],
    [pltpu.VMEM((N + 256, 16), jnp.float32), pltpu.SemaphoreType.DMA(())])
