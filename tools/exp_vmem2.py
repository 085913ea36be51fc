"""Probe real VMEM ceiling with raised vmem_limit_bytes + dynamic roll."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SHAPE = (8, 128)


def vmem_probe(mb):
    n = mb * 1024 * 1024 // 4 // 128
    def kernel(x_ref, out_ref, scratch):
        scratch[0, :] = x_ref[0, :]
        out_ref[:] = jnp.full(SHAPE, scratch[0, 0])
    f = jax.jit(lambda x: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(mb + 4) * 1024 * 1024),
    )(x))
    try:
        jax.block_until_ready(f(jnp.ones((8, 128), jnp.float32)))
        return True
    except Exception as e:
        return False


for mb in (16, 24, 32, 48, 64, 96, 110, 120):
    ok = vmem_probe(mb)
    print(f"vmem {mb} MB: {'OK' if ok else 'FAIL'}")
    if not ok:
        break


# dynamic roll test
def kernel_roll(x_ref, out_ref, sp):
    def body(i, acc):
        row = x_ref[i % 64]
        rolled = pltpu.roll(row, shift=-(i % 8) * 16, axis=0)
        return acc + sum(rolled[c] for c in range(16))
    acc = jax.lax.fori_loop(0, 256, body, jnp.float32(0.0))
    out_ref[:] = jnp.full(SHAPE, acc)

try:
    f = jax.jit(lambda x: pl.pallas_call(
        kernel_roll,
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(x))
    x = jnp.asarray(np.random.rand(64, 128).astype(np.float32))
    r = f(x); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(20):
        r = f(x)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 20
    print(f"dynamic roll+extract: OK {dt/256*1e9:.0f} ns/pop")
except Exception as e:
    print(f"dynamic roll: FAILED: {str(e)[:200]}")
