"""Profile the traversal hot loop on the live device: per-stage timing and
while-loop iteration counts (the analog of the reference's CUDAEvent kernel
profiler, Src/Device/CUDAEvent.h)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from gpu_raytracer_tpu.config import CPUConfig, GPUConfig
from gpu_raytracer_tpu.integrators.pathtracer import render_wave
from gpu_raytracer_tpu.ops.buffers import build_scene_buffers
from gpu_raytracer_tpu.ops.intersect import aabb_intersect, safe_inv_dir, triangle_intersect
from gpu_raytracer_tpu.ops.traverse import trace_closest_tlas
from gpu_raytracer_tpu.ops.camera_rays import generate_primary_rays
from gpu_raytracer_tpu.scene import Scene


def timed(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time() - t) / n * 1000:.1f} ms", flush=True)
    return out


def main():
    W = H = 512
    scene = Scene.from_config(CPUConfig(
        scene_filenames=["/root/reference/Data/cornellbox/scene.xml"]))
    scene.film_width, scene.film_height = W, H
    scene.camera.resize(W, H)
    bufs = build_scene_buffers(scene)
    cam = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
    idx = jnp.arange(W * H, dtype=jnp.int32)
    R = W * H

    from gpu_raytracer_tpu.config import ReconstructionFilter

    o, d = generate_primary_rays(cam, idx, W, 0, ReconstructionFilter.BOX)
    o = jax.block_until_ready(o)

    # Closest-hit traversal alone.
    tmax = jnp.full(R, jnp.inf)
    hit = timed("trace_closest_tlas (primary)",
                lambda o, d, tm: trace_closest_tlas(bufs["nodes"], bufs["tris"],
                                                    bufs["instances"], o, d, tm),
                o, d, tmax)

    # Iteration count: re-run with an instrumented variant.
    from gpu_raytracer_tpu.ops import traverse as tv

    @jax.jit
    def count_iters(o, d, tm):
        nodes, tris, instances = bufs["nodes"], bufs["tris"], bufs["instances"]
        rows = jnp.arange(R, dtype=jnp.int32)
        world_inv = safe_inv_dir(d)
        root_hit, _ = aabb_intersect(nodes["min"][0], nodes["max"][0], o, world_inv, tm)
        stack = jnp.zeros((R, tv.STACK_DEPTH), jnp.int32)
        ptr = root_hit.astype(jnp.int32)

        def cond(s):
            return jnp.any(s[1] > 0)

        def body(s):
            stack, ptr, it, pops = s
            active = ptr > 0
            top = jnp.maximum(ptr - 1, 0)
            entry = jnp.where(active, stack[rows, top], 0)
            ptr = ptr - active.astype(jnp.int32)
            node = jnp.maximum(entry, 0)
            left = nodes["left"][node]
            count = nodes["count"][node]
            is_restore = active & (entry == tv.RESTORE)
            is_interior = active & ~is_restore & (count == 0)
            is_inst = active & ~is_restore & (count == -1)
            # push both children unconditionally when interior (upper bound)
            push1 = is_interior | is_inst
            push2 = is_interior | is_inst
            node1 = jnp.where(is_inst, tv.RESTORE, left)
            node2 = jnp.where(is_inst, nodes["left"][0] * 0 + bufs["instances"]["blas_root"][jnp.where(is_inst, left, 0)], left + 1)
            col1 = jnp.where(push1, jnp.minimum(ptr, tv.STACK_DEPTH - 1), -2)
            col2 = jnp.where(push2, jnp.minimum(ptr + push1.astype(jnp.int32), tv.STACK_DEPTH - 1), -2)
            iota = jnp.arange(tv.STACK_DEPTH, dtype=jnp.int32)[None, :]
            stack = jnp.where(iota == col2[:, None], node2[:, None],
                              jnp.where(iota == col1[:, None], node1[:, None], stack))
            ptr = jnp.minimum(ptr + push1.astype(jnp.int32) + push2.astype(jnp.int32), tv.STACK_DEPTH)
            return stack, ptr, it + 1, pops + jnp.sum(active)

        _, _, it, pops = jax.lax.while_loop(cond, body, (stack, ptr, jnp.int32(0), jnp.float32(0)))
        return it, pops

    it, pops = count_iters(o, d, tmax)
    print(f"no-cull traversal: {int(it)} while-iterations, avg pops/ray {float(pops)/R:.1f}",
          flush=True)

    # Full sample.
    config = GPUConfig(num_bounces=6)
    timed("render_wave full sample (b6)",
          lambda s: render_wave(bufs, cam, idx, s, config, W, 0, True), 1, n=3)

    # Stack width experiment: elementwise (R, DEPTH) select cost.
    stack = jnp.zeros((R, tv.STACK_DEPTH), jnp.int32)
    colv = jnp.asarray(np.random.randint(0, 48, R).astype(np.int32))
    iota = jnp.arange(tv.STACK_DEPTH, dtype=jnp.int32)[None, :]

    @jax.jit
    def select100(stack, colv):
        def body(i, st):
            return jnp.where(iota == ((colv + i) % 48)[:, None], i, st)
        return jax.lax.fori_loop(0, 100, body, stack)

    timed("stack one-hot select x100", select100, stack, colv, n=3)

    # Pure leaf math cost: 4-wide triangle test + 2 AABB tests, 100x.
    ti = jnp.asarray(np.random.randint(0, 36, R).astype(np.int32))

    @jax.jit
    def leafmath100(o, d, ti):
        tris = bufs["tris"]
        inv = safe_inv_dir(d)
        acc = jnp.zeros(R)
        def body(i, acc):
            tj = (ti + i) % 36
            h, t, u, v = triangle_intersect(tris["p0"][tj], tris["e1"][tj],
                                            tris["e2"][tj], o, d, jnp.inf)
            hl, tl = aabb_intersect(bufs["nodes"]["min"][tj], bufs["nodes"]["max"][tj],
                                    o, inv, jnp.inf)
            return acc + t * hl + tl * h
        return jax.lax.fori_loop(0, 100, body, acc)

    timed("tri+aabb math x100", leafmath100, o, d, ti, n=3)


if __name__ == "__main__":
    main()
