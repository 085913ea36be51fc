"""Leaf-capacity / SAH-node-cost sweep for the FLAT gang kernel on Sponza.

The wide-BVH collapse (bvh/collapse.py) uses the reference's cost model
(node 4 : leaf-tri 1), but the round-4 ablation (exp_gang_ablate.py) prices
a gang-kernel NODE phase at ~1.35 us vs a TRI phase (a whole <=LEAF_CAP-tri
row) at ~0.3 us — per-tri leaf cost is 30-50x cheaper than a node visit,
not 4x. Bigger leaves (row capacity allows 12: 16 + 12*9 = 124 <= 128) and
a higher node cost should trade cheap tri tests for expensive node phases.

Sweeps (LEAF_CAP, sah_cost_node), reporting table sizes, iteration counts
(count_iters) and chip time for primary + sorted bounce waves against the
cached /tmp/sponza_wave.npz rays.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from gpu_raytracer_tpu.utils import compile_cache

compile_cache.enable()

import jax
import jax.numpy as jnp

from gpu_raytracer_tpu.bvh import wide as wide_mod
from gpu_raytracer_tpu.bvh.cache import build_blas_cached
from gpu_raytracer_tpu.config import CPUConfig
from gpu_raytracer_tpu.ops import pallas_gang as pg
from gpu_raytracer_tpu.ops import pallas_wide as pw
from gpu_raytracer_tpu.ops.ray_sort import ray_sort_order
from gpu_raytracer_tpu.scene import Scene
from gpu_raytracer_tpu.scene.types import TriangleData

T0 = time.time()


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


z = np.load("/tmp/sponza_wave.npz")
o = jnp.asarray(z["o"])
d = jnp.asarray(z["d"])
tmax = jnp.asarray(z["tmax"])
bo = jnp.asarray(z["bo"])
bd = jnp.asarray(z["bd"])
btmax = jnp.asarray(z["btmax"])
lo = jnp.asarray(z["lo"])
hi = jnp.asarray(z["hi"])

# World-space merged soup (same prelude as buffers._pack_wide_merged).
scene = Scene.from_config(CPUConfig(
    scene_filenames=["/root/reference/Data/Sponza/scene.xml"]))
tris = []
for inst in scene.instances:
    md = scene.mesh_datas[inst.mesh_data_id]
    m = np.asarray(inst.transform, np.float32)
    p = md.triangles.positions
    tris.append(p @ m[:, :3].T + m[:, 3])
world = np.concatenate(tris).astype(np.float32)
log(f"world soup {world.shape[0]} tris")

_rng = np.random.default_rng(3)


@jax.jit
def _dsum(x):
    return jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0))


def _fresh(base):
    n = jnp.asarray(_rng.uniform(0, 1e-4, base.shape).astype(np.float32))
    return jax.block_until_ready(base + n)


def timed(fn, base, reps=3):
    float(_dsum(fn(_fresh(base))))  # compile
    vals = []
    for _ in range(reps):
        x = _fresh(base)
        t0 = time.time()
        float(_dsum(fn(x)))
        vals.append((time.time() - t0) * 1000.0)
    return sorted(vals)[len(vals) // 2]


base_ms = timed(lambda x: x, bo)
log(f"fetch baseline {base_ms:.1f} ms")


def iters_of(nodes, rows, ro, rd, tm):
    h = pg._trace_gang(nodes, rows, ro, rd, tm, flat=True, count_iters=True)
    packed = np.asarray(h.inst).reshape(-1, 1024)[:, 0]
    node_it = packed >> 16
    tri_it = packed & 0xFFFF
    return int(node_it.sum()), int(tri_it.sum())


for cap, cn in ((8, 4.0), (12, 4.0), (12, 10.0), (12, 20.0)):
    wide_mod.LEAF_CAP = cap
    pw.LEAF_CAP = cap
    pg.LEAF_CAP = cap
    # The kernel unroll reads the module global at TRACE time; identical
    # static args would otherwise reuse the previous cap's jitted program.
    pg._trace_gang.clear_cache()
    bvh = build_blas_cached(TriangleData(world), sah_cost_node=cn,
                            max_leaf_size=cap)
    wb = wide_mod.collapse_wide(bvh)
    geo9 = np.concatenate([world[:, 0], world[:, 1] - world[:, 0],
                           world[:, 2] - world[:, 0]],
                          axis=-1).astype(np.float32)
    packed = wide_mod.pack_wide_merged(wb, bvh.indices, geo9[bvh.indices])
    nodes = jnp.asarray(packed["nodes"])
    rows = jnp.asarray(packed["rows"])
    jax.block_until_ready(rows)
    mb = (packed["nodes"].shape[0] + packed["rows"].shape[0]) * 512 // 2**20
    log(f"cap={cap} cn={cn}: nodes {packed['nodes'].shape[0]} rows "
        f"{packed['rows'].shape[0]} ({mb} MB, max_stack "
        f"{packed['max_stack']})")

    p_ms = timed(lambda x: pg.trace_closest_gang(nodes, rows, x, d, tmax,
                                                 flat=True).t, o) - base_ms

    def bounce(x):
        order, inv = ray_sort_order(x, bd, btmax, lo, hi)
        h = pg.trace_closest_gang(nodes, rows, x[order], bd[order],
                                  btmax[order], flat=True)
        return h.t[inv]

    b_ms = timed(bounce, bo) - base_ms
    ni, ti = iters_of(nodes, rows, bo, bd, btmax)
    log(f"cap={cap} cn={cn}: primary {p_ms:7.1f} ms | bounce sorted "
        f"{b_ms:7.1f} ms | unsorted iters node {ni} tri {ti}")

log("ALL DONE")
