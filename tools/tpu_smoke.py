"""Compile-and-parity smoke for every Pallas kernel on the REAL chip.

Interpret-mode CI can't see Mosaic lowering failures; run this first when
TPU access returns. Each section compiles the kernel at small shapes and
checks parity against its XLA twin. Exits non-zero on any failure.

  python tools/tpu_smoke.py            # all sections
  python tools/tpu_smoke.py svgf gather stream   # subset
"""

import sys
import time

import numpy as np


def _section(name):
    print(f"=== {name} ===", flush=True)
    return time.time()


def smoke_svgf():
    import jax.numpy as jnp

    from gpu_raytracer_tpu.ops import pallas_svgf as psv
    from gpu_raytracer_tpu.ops import svgf as svgf_ops

    t0 = _section("pallas_svgf")
    H, W = 128, 256
    rng = np.random.default_rng(0)
    n = rng.normal(size=(H, W, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    frame = {
        "normal": jnp.asarray(n),
        "depth": jnp.asarray(rng.uniform(1, 10, (H, W)).astype(np.float32)),
    }
    dz_x = jnp.abs(svgf_ops._shift(frame["depth"], 0, 1) - frame["depth"])
    frame["dz"] = jnp.clip(dz_x, 1e-4, 1e20)
    integ = {
        "direct": jnp.asarray(rng.uniform(0, 2, (H, W, 3)).astype(np.float32)),
        "indirect": jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32)),
        "var_direct": jnp.asarray(rng.uniform(0, .5, (H, W)).astype(np.float32)),
        "var_indirect": jnp.asarray(rng.uniform(0, .5, (H, W)).astype(np.float32)),
        "length": jnp.asarray(rng.uniform(1, 8, (H, W)).astype(np.float32)),
    }
    d_ref, i_ref, _ = svgf_ops.atrous(frame, integ, iterations=3)
    ref2 = svgf_ops.spatial_variance(frame, integ)
    d_p, i_p, _ = psv.svgf_spatial_pallas(frame, integ, iterations=3,
                                          spatial_variance=True)
    d_ref2, i_ref2, _ = svgf_ops.atrous(frame, ref2, iterations=3)
    err = float(jnp.abs(d_p - d_ref2).max())
    print(f"  compiled in {time.time()-t0:.1f}s, max|diff| vs XLA = {err:.2e}")
    assert err < 1e-3, err


def smoke_gather_shade():
    import jax.numpy as jnp

    from gpu_raytracer_tpu.config import CPUConfig, GPUConfig
    from gpu_raytracer_tpu.integrators.pathtracer import render_wave
    from gpu_raytracer_tpu.ops.buffers import build_scene_buffers
    from gpu_raytracer_tpu.scene import Scene

    t0 = _section("pallas_shade_gather")
    scene = Scene.from_config(CPUConfig(
        scene_filenames=["/root/reference/Data/cornellbox/scene.xml"]))
    scene.film_width = scene.film_height = 64
    scene.camera.resize(64, 64)
    bufs = build_scene_buffers(scene)
    camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
    pix = jnp.arange(64 * 64, dtype=jnp.int32)
    cfg = GPUConfig(num_bounces=4)
    a, _ = render_wave(bufs, camera, pix, 1, cfg, 64, 0, True, True)
    b, _ = render_wave(bufs, camera, pix, 1, cfg, 64, 0, True, True,
                       use_gather_shade=True)
    a, b = np.asarray(a), np.asarray(b)
    flips = float((np.abs(a - b).max(axis=1) > 1e-3).mean())
    print(f"  compiled in {time.time()-t0:.1f}s, mean {a.mean():.4f} vs "
          f"{b.mean():.4f}, flips {flips:.4f}")
    assert abs(a.mean() - b.mean()) < 0.01 * max(a.mean(), 1e-6)
    assert flips < 0.05, flips


def smoke_stream():
    import jax.numpy as jnp

    from gpu_raytracer_tpu.bvh import stream as stream_mod
    from gpu_raytracer_tpu.bvh import wide as wide_mod
    from gpu_raytracer_tpu.bvh.sah import build_bvh2
    from gpu_raytracer_tpu.ops import pallas_gang, pallas_stream
    from gpu_raytracer_tpu.scene.types import TriangleData

    t0 = _section("pallas_stream")
    rng = np.random.default_rng(0)
    m = 20000
    p0 = rng.uniform(-1, 1, (m, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.05, (m, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.05, (m, 3)).astype(np.float32)
    world = np.stack([p0, p0 + e1, p0 + e2], axis=1)
    bvh = build_bvh2(TriangleData(world), max_leaf_size=wide_mod.LEAF_CAP)
    wideb = wide_mod.collapse_wide(bvh)
    geo = np.concatenate([world[:, 0], world[:, 1] - world[:, 0],
                          world[:, 2] - world[:, 0]], axis=-1).astype(np.float32)
    leaf = geo[bvh.indices]
    resident = wide_mod.pack_wide_merged(wideb, bvh.indices, leaf)
    paged = stream_mod.pack_wide_stream(wideb, bvh.indices, leaf,
                                        page_rows=512)
    assert paged is not None
    tables = {k: jnp.asarray(v) for k, v in paged.items()
              if isinstance(v, np.ndarray)}
    R = 4096
    o = jnp.asarray(rng.uniform(-1.4, 1.4, (R, 3)).astype(np.float32))
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.full((R,), np.inf, jnp.float32)
    ref = pallas_gang.trace_closest_gang(jnp.asarray(resident["nodes"]),
                                         jnp.asarray(resident["rows"]),
                                         o, d, tmax)
    out = pallas_stream.trace_closest_stream(tables, o, d, tmax)
    rt, wt = np.asarray(ref.tri), np.asarray(out.tri)
    status = float((rt >= 0).mean()), float((wt >= 0).mean())
    match = float(np.mean(rt[rt >= 0] == wt[rt >= 0]))
    print(f"  compiled in {time.time()-t0:.1f}s, hit rates {status}, "
          f"tri match {match:.4f}")
    assert np.array_equal(rt >= 0, wt >= 0)
    assert match > 0.995


SECTIONS = {"svgf": smoke_svgf, "gather": smoke_gather_shade,
            "stream": smoke_stream}


def main(argv):
    import jax

    from gpu_raytracer_tpu.utils import compile_cache

    compile_cache.enable()
    print("backend:", jax.default_backend())
    names = argv or list(SECTIONS)
    failed = []
    for n in names:
        try:
            SECTIONS[n]()
        except Exception as e:  # noqa: BLE001
            print(f"  FAILED: {type(e).__name__}: {e}")
            failed.append(n)
    print("FAILED:" if failed else "ALL OK", failed or "")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
