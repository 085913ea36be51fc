"""Round-2 experiment #2: pin down (a) what Mosaic's '2D gather' supports and
its speed for row gathers, (b) why the dynamic-offset DMA kernel failed to
compile."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SHAPE = (8, 128)
ITERS = 64
N = 160_000


def bench(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def report(name, fn, *args):
    try:
        dt = bench(fn, *args)
        print(f"{name}: {dt*1e6:.1f} us / {ITERS} = {dt/ITERS*1e9:.0f} ns/fetch")
    except Exception as e:
        print(f"{name}: FAILED: {str(e)[:250]}")


# --- in-kernel row gather from a VMEM-resident (M, 16) table --------------
def rowgather_vmem(M):
    tab = jnp.asarray(np.random.rand(M, 16).astype(np.float32))
    idx = jax.random.randint(jax.random.PRNGKey(0), (ITERS, 1024), 0, M)

    def kernel(tab_ref, idx_ref, out_ref):
        def body(i, acc):
            rows = jnp.take(tab_ref[:], idx_ref[i], axis=0)  # (1024, 16)
            return acc + rows.sum(-1).reshape(SHAPE)
        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros(SHAPE, jnp.float32))

    f = jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    report(f"rowgather VMEM M={M} (1024,16)", f, tab, idx)


# --- in-kernel lane gather: idx (8,128) into (X, 128) table along sublanes --
def sublane_gather(M):
    # table as (M, 128): gather along axis 0 with (8, 128) idx
    tab = jnp.asarray(np.random.rand(M, 128).astype(np.float32))
    idx = jax.random.randint(jax.random.PRNGKey(0), (ITERS, 8, 128), 0, M)

    def kernel(tab_ref, idx_ref, out_ref):
        def body(i, acc):
            v = jnp.take_along_axis(tab_ref[:], idx_ref[i], axis=0)  # (8,128)
            return acc + v
        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros(SHAPE, jnp.float32))

    f = jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    report(f"sublane take_along_axis (M={M},128)", f, tab, idx)


# --- minimal dynamic-offset DMA --------------------------------------------
def dma_test(chunk, dynamic):
    tab = jnp.asarray(np.random.rand(N, 16).astype(np.float32))
    los = jax.random.randint(jax.random.PRNGKey(0), (ITERS,), 0, N - chunk)

    def kernel(lo_ref, tab_hbm, out_ref, scratch, sem):
        def body(i, acc):
            lo = lo_ref[i] if dynamic else 0
            dma = pltpu.make_async_copy(
                tab_hbm.at[pl.ds(lo, chunk), :], scratch, sem)
            dma.start()
            dma.wait()
            return acc + scratch[0, 0]
        out_ref[0, 0] = jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    f = jax.jit(lambda l, t: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(l, t))
    name = f"dma chunk={chunk} dynamic={dynamic}"
    try:
        dt = bench(f, los, tab)
        print(f"{name}: {dt*1e6:.1f} us / {ITERS} = {dt/ITERS*1e9:.0f} ns/dma")
    except Exception as e:
        print(f"{name}: FAILED: {str(e)[:300]}")


# --- scratch-shaped dma + scan (isolate which part broke exp1 B/C) --------
def dma_scan(chunk):
    tab = jnp.asarray(np.random.rand(N, 16).astype(np.float32))
    idx_all = jax.random.randint(jax.random.PRNGKey(0), (ITERS, 8, 128), 0, 256)
    centers = jax.random.randint(jax.random.PRNGKey(1), (ITERS,), 0, N - 512)
    idx = (centers[:, None, None] + idx_all).astype(jnp.int32)

    def kernel(tab_hbm, idx_ref, out_ref, scratch, sem):
        def body(i, acc):
            ix = idx_ref[i]
            lo = jnp.minimum(jnp.min(ix), N - chunk)
            dma = pltpu.make_async_copy(
                tab_hbm.at[pl.ds(lo, chunk), :], scratch, sem)
            dma.start()
            dma.wait()
            rel = ix - lo
            def scan_body(j, a):
                return jnp.where(rel == j, scratch[j, 0], a)
            v = jax.lax.fori_loop(0, chunk, scan_body, jnp.zeros(SHAPE, jnp.float32))
            return acc + v
        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros(SHAPE, jnp.float32))

    f = jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((chunk, 16), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(t, i))
    report(f"dma+scan chunk={chunk}", f, tab, idx)


# --- dma + in-VMEM row gather of the chunk --------------------------------
def dma_rowgather(chunk):
    tab = jnp.asarray(np.random.rand(N, 16).astype(np.float32))
    spread = jax.random.randint(jax.random.PRNGKey(0), (ITERS, 1024), 0, chunk)
    centers = jax.random.randint(jax.random.PRNGKey(1), (ITERS,), 0, N - chunk)
    idx = (centers[:, None] + spread).astype(jnp.int32)

    def kernel(tab_hbm, idx_ref, out_ref, scratch, sem):
        def body(i, acc):
            ix = idx_ref[i]
            lo = jnp.minimum(jnp.min(ix), N - chunk)
            dma = pltpu.make_async_copy(
                tab_hbm.at[pl.ds(lo, chunk), :], scratch, sem)
            dma.start()
            dma.wait()
            rows = jnp.take(scratch[:], ix - lo, axis=0)  # (1024, 16)
            return acc + rows.sum(-1).reshape(SHAPE)
        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros(SHAPE, jnp.float32))

    f = jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((chunk, 16), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(t, i))
    report(f"dma+rowgather chunk={chunk}", f, tab, idx)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    for M in (1024, 8192, 65536):
        rowgather_vmem(M)
    for M in (8, 64):
        sublane_gather(M)
    dma_test(256, dynamic=False)
    dma_test(256, dynamic=True)
    dma_scan(256)
    dma_rowgather(256)
    dma_rowgather(512)
