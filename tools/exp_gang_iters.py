"""Where does the flat gang kernel's bounce time go? Counts node/tri
iterations per tile (count_iters=True packs them into the inst output),
sweeps QTRIG and sort-key variants on the cached Sponza wave
(/tmp/sponza_wave.npz from exp_gang_flat.py)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from gpu_raytracer_tpu.utils import compile_cache

compile_cache.enable()

import jax
import jax.numpy as jnp

from gpu_raytracer_tpu.ops import pallas_gang as pg
from gpu_raytracer_tpu.ops.ray_sort import morton30

T0 = time.time()


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


z = np.load("/tmp/sponza_wave_c12.npz")
nodes = jnp.asarray(z["nodes"])
rows = jnp.asarray(z["rows"])
o = jnp.asarray(z["o"])
d = jnp.asarray(z["d"])
tmax = jnp.asarray(z["tmax"])
bo = jnp.asarray(z["bo"])
bd = jnp.asarray(z["bd"])
btmax = jnp.asarray(z["btmax"])
lo = jnp.asarray(z["lo"])
hi = jnp.asarray(z["hi"])
jax.block_until_ready(rows)
log("tables on device")


def iters(name, ro, rd, tm):
    h = pg._trace_gang(nodes, rows, ro, rd, tm, flat=True, count_iters=True)
    packed = np.asarray(h.inst).reshape(-1, 1024)[:, 0]
    node_it = packed >> 16
    tri_it = packed & 0xFFFF
    log(f"{name:28s} tiles={len(packed)} node_it sum={node_it.sum()} "
        f"max={node_it.max()} mean={node_it.mean():.0f} | "
        f"tri_it sum={tri_it.sum()} max={tri_it.max()} "
        f"mean={tri_it.mean():.0f}")


def t(name, fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    log(f"{name:44s} {(time.time()-t0)/n*1000:8.1f} ms")
    return out


def key_current(ro, rd, tm):
    octant = ((rd[:, 0] < 0).astype(jnp.uint32) * 4
              + (rd[:, 1] < 0).astype(jnp.uint32) * 2
              + (rd[:, 2] < 0).astype(jnp.uint32))
    key = (octant << 28) | (morton30(ro, lo, hi) >> 2)
    return jnp.where(tm > 0.0, key, jnp.uint32(0x80000000))


def key_dirbits(bits):
    def f(ro, rd, tm):
        dm = morton30((rd + 1.0) * 0.5, jnp.zeros(3), jnp.ones(3))
        om = morton30(ro, lo, hi)
        key = ((dm >> (30 - bits)) << (31 - bits)) | (om >> bits >> 1)
        return jnp.where(tm > 0.0, key, jnp.uint32(0xFFFFFFFF))
    return f


def key_origin_first(ro, rd, tm):
    dm = morton30((rd + 1.0) * 0.5, jnp.zeros(3), jnp.ones(3))
    om = morton30(ro, lo, hi)
    key = ((om >> 18) << 19) | (dm >> 11 >> 1)  # origin 12 | dir 19
    return jnp.where(tm > 0.0, key, jnp.uint32(0xFFFFFFFF))


def sorted_trace(keyfn):
    @jax.jit
    def run(ro, rd, tm):
        key = keyfn(ro, rd, tm)
        order = jnp.argsort(key)
        h = pg._trace_gang(nodes, rows, ro[order], rd[order], tm[order],
                           flat=True)
        inv = jnp.argsort(order)
        return h.t[inv], h.tri[inv]
    return run


def sorted_iters(name, keyfn, ro, rd, tm):
    key = keyfn(ro, rd, tm)
    order = jnp.argsort(key)
    iters(name, ro[order], rd[order], tm[order])


# ---- iteration counts ----
iters("primary", o, d, tmax)
iters("bounce unsorted", bo, bd, btmax)
sorted_iters("bounce oct|om (current)", key_current, bo, bd, btmax)
sorted_iters("bounce dir6|om", key_dirbits(6), bo, bd, btmax)
sorted_iters("bounce dir9|om", key_dirbits(9), bo, bd, btmax)
sorted_iters("bounce dir12|om", key_dirbits(12), bo, bd, btmax)
sorted_iters("bounce om12|dir", key_origin_first, bo, bd, btmax)

# ---- timings of the better keys ----
t("flat sorted oct|om", sorted_trace(key_current), bo, bd, btmax)
t("flat sorted dir9|om", sorted_trace(key_dirbits(9)), bo, bd, btmax)
t("flat sorted om12|dir", sorted_trace(key_origin_first), bo, bd, btmax)

# ---- QTRIG sweep (monkeypatch + cache clear) ----
for q in (4, 8, 12):
    pg.QTRIG = q
    pg.LEAFQ_DEPTH = q + 7
    pg._trace_gang.clear_cache()
    t(f"flat sorted oct|om QTRIG={q}", sorted_trace(key_current),
      bo, bd, btmax)
log("ALL DONE")
