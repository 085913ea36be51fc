"""Prototype the block-synchronous pop loop: VMEM capacity, scalar dynamic
reads from VMEM tables, and per-pop cost for an 8-wide slab test."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SHAPE = (8, 128)


def bench(f, *args, n=20):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


# --- 1. VMEM capacity probe ------------------------------------------------
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
    )(x))
    try:
        jax.block_until_ready(f(jnp.ones((8, 128), jnp.float32)))
        return True
    except Exception:
        return False


# --- 2. per-pop cost prototype --------------------------------------------
# node table: (N, 64) f32 rows [48 child bounds | 8 meta | 8 pad]
# stack: SMEM scalars. Loop: pop, read row, 8 slab tests, push counting.
def make_pop_kernel(N, POPS):
    def kernel(tab_ref, o_refs, d_refs, out_ref, stack, sp):
        ox, oy, oz = o_refs[0][:], o_refs[1][:], o_refs[2][:]
        dx, dy, dz = d_refs[0][:], d_refs[1][:], d_refs[2][:]
        ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
        stack[0] = 0
        sp[0] = 1

        def body(it, carry):
            best_t, nvisit = carry
            top = jnp.maximum(sp[0] - 1, 0)
            node = stack[top]
            sp[0] = top
            row = tab_ref[node]  # (64,) dynamic scalar-indexed row read
            npush = jnp.int32(0)
            for c in range(8):
                bx0 = row[6 * c + 0]; by0 = row[6 * c + 1]; bz0 = row[6 * c + 2]
                bx1 = row[6 * c + 3]; by1 = row[6 * c + 4]; bz1 = row[6 * c + 5]
                tx0 = (bx0 - ox) * ix; tx1 = (bx1 - ox) * ix
                ty0 = (by0 - oy) * iy; ty1 = (by1 - oy) * iy
                tz0 = (bz0 - oz) * iz; tz1 = (bz1 - oz) * iz
                tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                             jnp.minimum(ty0, ty1)),
                                 jnp.minimum(tz0, tz1))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                             jnp.maximum(ty0, ty1)),
                                 jnp.maximum(tz0, tz1))
                hit = (tn <= tf) & (tf > 0.0) & (tn < best_t)
                anyhit = jnp.any(hit)
                child = row[48 + c]

                @pl.when(anyhit & (sp[0] < 64))
                def _():
                    stack[sp[0]] = (node * 8 + c + 1) % N
                    sp[0] = sp[0] + 1
                best_t = jnp.where(hit, jnp.minimum(best_t, tn + 1e30), best_t)
            # keep stack bounded for the benchmark: cap sp
            sp[0] = jnp.minimum(sp[0], 48)
            return best_t, nvisit + 1

        best_t = jnp.full(SHAPE, 1e30, jnp.float32)
        best_t, nv = jax.lax.fori_loop(0, POPS, body, (best_t, jnp.int32(0)))
        out_ref[:] = best_t

    def f(tab, o, d):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((64,), jnp.int32),
                            pltpu.SMEM((1,), jnp.int32)],
        )(tab, o[0], o[1], o[2], d[0], d[1], d[2])

    def wrapper(tab, o0, o1, o2, d0, d1, d2):
        return pl.pallas_call(
            kernel_flat,
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((64,), jnp.int32),
                            pltpu.SMEM((1,), jnp.int32)],
        )(tab, o0, o1, o2, d0, d1, d2)

    def kernel_flat(tab_ref, o0, o1, o2, d0, d1, d2, out_ref, stack, sp):
        return kernel(tab_ref, (o0, o1, o2), (d0, d1, d2), out_ref, stack, sp)

    return jax.jit(wrapper)


if __name__ == "__main__":
    lo_mb, hi_mb = 1, 256
    ok_mb = 0
    for mb in (8, 16, 32, 48, 64, 96, 128):
        if vmem_probe(mb):
            ok_mb = mb
        else:
            break
    print(f"VMEM scratch probe: {ok_mb} MB OK, {mb} MB fails" if ok_mb < mb
          else f"VMEM scratch probe: >= {ok_mb} MB OK")

    N, POPS = 20_000, 256
    tab = jnp.asarray(np.random.rand(N, 64).astype(np.float32) * 2 - 1)
    o = [jnp.zeros(SHAPE, jnp.float32) for _ in range(3)]
    d = [jnp.asarray(np.random.rand(*SHAPE).astype(np.float32) + 0.1)
         for _ in range(3)]
    f = make_pop_kernel(N, POPS)
    try:
        dt = bench(f, tab, *o, *d)
        print(f"pop loop: {dt*1e6:.1f} us / {POPS} pops = {dt/POPS*1e9:.0f} ns/pop")
    except Exception as e:
        print(f"pop loop FAILED: {str(e)[:300]}")
