"""Round-2 design experiment: which per-lane table-fetch mechanism scales to
Sponza-size node tables (~159k nodes) on a real TPU?

Candidates measured:
  A. dyngather: Mosaic per-lane gather (table_ref[idx] / jnp.take inside the
     kernel) — may not lower at all.
  B. onehot-mxu: DMA a CHUNK-row window HBM->VMEM, gather via
     one_hot(idx-lo, CHUNK) @ window on the MXU.
  C. select-scan: the round-1 scalar scan, bounded by [lo, hi) range.
  D. XLA gather baseline: jnp.take outside Pallas (what the while_loop path
     pays per iteration).

Run on the TPU host:  python tools/exp_gather.py
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 160_000          # Sponza-scale node count
ROWS = 16            # floats per node row
ITERS = 64           # fetches per kernel invocation (simulates traversal loop)
SHAPE = (8, 128)

table_np = np.random.rand(N, ROWS).astype(np.float32)
table = jnp.asarray(table_np)
table_T = jnp.asarray(table_np.T.copy())

key = jax.random.PRNGKey(0)
# Clustered indices (coherent rays): random center per iteration, spread 256
centers = jax.random.randint(key, (ITERS,), 0, N - 512)
spread = jax.random.randint(jax.random.PRNGKey(1), (ITERS,) + SHAPE, 0, 256)
idx_all = (centers[:, None, None] + spread).astype(jnp.int32)
# Incoherent indices
idx_rand = jax.random.randint(jax.random.PRNGKey(2), (ITERS,) + SHAPE, 0, N)


def bench(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


# --- A: Mosaic per-lane gather --------------------------------------------
def try_dyngather():
    def kernel(tab_ref, idx_ref, out_ref):
        def body(i, acc):
            idx = idx_ref[i]
            v = jnp.take(tab_ref[:, 0], idx.reshape(-1)).reshape(SHAPE)
            return acc + v
        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros(SHAPE, jnp.float32))

    f = jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    try:
        dt = bench(f, table[:8192], idx_all % 8192)
        print(f"A dyngather (8k-row VMEM table): {dt*1e6:.1f} us / {ITERS} fetches"
              f" = {dt/ITERS*1e9:.0f} ns/fetch")
    except Exception as e:
        print(f"A dyngather: FAILED: {str(e)[:300]}")


# --- A2: per-sublane gather on 2D (Mosaic dynamic_gather) ------------------
def try_dyngather2d():
    def kernel(tab_ref, idx_ref, out_ref):
        def body(i, acc):
            idx = idx_ref[i]  # (8, 128) int32
            v = jnp.take_along_axis(tab_ref[:], idx % 128, axis=1)
            return acc + v
        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros(SHAPE, jnp.float32))

    f = jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    try:
        dt = bench(f, jnp.zeros(SHAPE, jnp.float32), idx_all)
        print(f"A2 take_along_axis lane-gather: {dt*1e6:.1f} us / {ITERS} = "
              f"{dt/ITERS*1e9:.0f} ns/fetch")
    except Exception as e:
        print(f"A2 take_along_axis: FAILED: {str(e)[:300]}")


# --- B: chunked DMA + one-hot MXU gather ----------------------------------
def make_onehot(chunk, dtype):
    def kernel(tab_hbm, idx_ref, out_ref, scratch, sem):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1024, chunk), 1)

        def body(i, acc):
            idx = idx_ref[i].reshape(1024, 1)
            lo = jnp.min(idx)
            lo = jnp.minimum(lo, N - chunk)
            dma = pltpu.make_async_copy(
                tab_hbm.at[pl.ds(lo, chunk), :], scratch, sem)
            dma.start()
            dma.wait()
            onehot = (lanes == (idx - lo)).astype(dtype)
            vals = jnp.dot(onehot, scratch[:].astype(dtype),
                           preferred_element_type=jnp.float32)
            return acc + vals[:, 0].reshape(SHAPE)
        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros(SHAPE, jnp.float32))

    f = jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((chunk, ROWS), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(t, i))
    return f


def try_onehot(chunk, dtype, name, idx, label):
    f = make_onehot(chunk, dtype)
    try:
        dt = bench(f, table, idx)
        print(f"B onehot-mxu chunk={chunk} {name} [{label}]: {dt*1e6:.1f} us / "
              f"{ITERS} = {dt/ITERS*1e9:.0f} ns/fetch")
    except Exception as e:
        print(f"B onehot-mxu chunk={chunk} {name}: FAILED: {str(e)[:300]}")


# --- C: select-scan over [lo, hi) window after DMA -------------------------
def make_scan(chunk):
    def kernel(tab_hbm, idx_ref, out_ref, scratch, sem):
        def body(i, acc):
            idx = idx_ref[i]
            lo = jnp.minimum(jnp.min(idx), N - chunk)
            dma = pltpu.make_async_copy(
                tab_hbm.at[pl.ds(lo, chunk), :], scratch, sem)
            dma.start()
            dma.wait()
            rel = idx - lo
            def scan_body(j, a):
                return jnp.where(rel == j, scratch[j, 0], a)
            v = jax.lax.fori_loop(0, chunk, scan_body, jnp.zeros(SHAPE, jnp.float32))
            return acc + v
        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros(SHAPE, jnp.float32))

    return jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((chunk, ROWS), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(t, i))


def try_scan(chunk, idx, label):
    f = make_scan(chunk)
    try:
        dt = bench(f, table, idx)
        print(f"C dma+select-scan chunk={chunk} [{label}]: {dt*1e6:.1f} us / "
              f"{ITERS} = {dt/ITERS*1e9:.0f} ns/fetch")
    except Exception as e:
        print(f"C dma+select-scan chunk={chunk}: FAILED: {str(e)[:300]}")


# --- D: XLA gather baseline ------------------------------------------------
def try_xla():
    @jax.jit
    def f(tab_T, idx):
        def body(i, acc):
            g = tab_T[0][idx[i].reshape(-1)].reshape(SHAPE)
            return acc + g
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(SHAPE, jnp.float32))
    dt = bench(f, table_T, idx_rand)
    print(f"D xla row-gather (1 row, R=1024): {dt*1e6:.1f} us / {ITERS} = "
          f"{dt/ITERS*1e9:.0f} ns/fetch")

    @jax.jit
    def f14(tab_T, idx):
        def body(i, acc):
            flat = idx[i].reshape(-1)
            g = [tab_T[c][flat].reshape(SHAPE) for c in range(14)]
            return acc + sum(g)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(SHAPE, jnp.float32))
    dt = bench(f14, table_T, idx_rand)
    print(f"D xla row-gather (14 rows): {dt*1e6:.1f} us / {ITERS} = "
          f"{dt/ITERS*1e9:.0f} ns/fetch-of-14")

    @jax.jit
    def frow(tab, idx):
        def body(i, acc):
            g = tab[idx[i].reshape(-1)]  # (1024, 16) row gather
            return acc + g.sum(-1).reshape(SHAPE)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(SHAPE, jnp.float32))
    dt = bench(frow, table, idx_rand)
    print(f"D xla row-gather ((1024,16) rows): {dt*1e6:.1f} us / {ITERS} = "
          f"{dt/ITERS*1e9:.0f} ns/fetch")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    try_dyngather()
    try_dyngather2d()
    for chunk in (256, 512, 1024):
        try_onehot(chunk, jnp.bfloat16, "bf16", idx_all, "coherent-256")
    try_onehot(512, jnp.float32, "f32", idx_all, "coherent-256")
    try_scan(256, idx_all, "coherent-256")
    try_scan(512, idx_all, "coherent-256")
    try_xla()
