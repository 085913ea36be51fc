"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric (BASELINE.json): Mrays/s on Sponza at 1080p with the full
pipeline (NEE+MIS, textures, ray cones), averaged over the first three
reference PerfTest POVs (Src/Util/PerfTest.h:30-60). Counts every ray
actually traced (primary + bounce + shadow). The north star is Sponza 1080p
1spp+SVGF at >= 30 FPS on one chip ~= 240 Mrays/s; `vs_baseline` is the
fraction of that target.

Extra fields record the Cornell proxy (round-1 continuity) and the
SVGF+TAA denoised-frame time at 1080p.
"""

import json
import sys
import time

from gpu_raytracer_tpu.utils import compile_cache

compile_cache.enable()

NORTH_STAR_MRAYS = 240.0


def bench_scene(scene_file, W, H, num_bounces, povs, samples=2):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpu_raytracer_tpu.config import CPUConfig, GPUConfig
    from gpu_raytracer_tpu.integrators.pathtracer import render_wave
    from gpu_raytracer_tpu.ops.buffers import build_scene_buffers
    from gpu_raytracer_tpu.ops.camera_rays import tile_order
    from gpu_raytracer_tpu.scene import Scene

    scene = Scene.from_config(CPUConfig(scene_filenames=[scene_file]))
    scene.film_width, scene.film_height = W, H
    scene.camera.resize(W, H)

    config = GPUConfig(num_bounces=num_bounces)
    buffers = build_scene_buffers(scene)
    mat_types = tuple(sorted({int(m.type) for m in scene.materials}))
    pixel_index = jnp.asarray(tile_order(W, H))

    on_tpu = jax.default_backend() == "tpu"
    use_pallas = buffers.get("pallas") is not None and on_tpu
    use_shade = (use_pallas and buffers.get("pallas_shade") is not None
                 and W % 32 == 0 and H % 32 == 0 and num_bounces <= 12)
    use_wide = (buffers.get("wide") is not None and on_tpu
                and not use_pallas)
    use_gather = (buffers.get("shade_gather") is not None and on_tpu
                  and not use_shade)
    use_stream = buffers.get("wide_stream") is not None and on_tpu

    def sample(camera, s):
        return render_wave(buffers, camera, pixel_index, s, config, W, 0,
                           scene.has_lights, True,
                           has_textures=len(scene.textures) > 0,
                           use_pallas=use_pallas, use_pallas_shade=use_shade,
                           use_wide=use_wide, use_gather_shade=use_gather,
                           use_stream=use_stream, mat_types=mat_types)

    import sys as _sys
    results = []
    if not povs:
        povs = [(tuple(scene.camera.position), tuple(scene.camera.rotation))]
    for pos, rot in povs:
        import numpy as np
        scene.camera.position = np.asarray(pos, np.float32)
        scene.camera.rotation = np.asarray(rot, np.float32)
        scene.camera.update(0.0)
        camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
        t_c = time.time()
        radiance, rays = sample(camera, 0)  # warmup/compile
        jax.block_until_ready(radiance)
        print(f"[bench] {scene_file.split('/')[-2]} warmup {time.time()-t_c:.0f}s",
              file=_sys.stderr, flush=True)
        t0 = time.time()
        for s in range(1, samples + 1):
            radiance, rays = sample(camera, s)
        jax.block_until_ready(radiance)
        elapsed = time.time() - t0
        results.append((float(rays) * samples / elapsed / 1e6,
                        elapsed / samples * 1000.0))
    mrays = sum(r[0] for r in results) / len(results)
    ms = sum(r[1] for r in results) / len(results)
    return mrays, ms, {"wide": use_wide, "pallas": use_pallas,
                       "shade": use_shade, "gather_shade": use_gather,
                       "stream": use_stream}


def bench_denoised(scene_file, W, H, frames=3):
    """SVGF+TAA interactive path: ms per denoised 1spp frame."""
    import dataclasses

    import jax
    import numpy as np

    from gpu_raytracer_tpu.config import CPUConfig, GPUConfig
    from gpu_raytracer_tpu.integrators.pathtracer import Pathtracer
    from gpu_raytracer_tpu.scene import Scene
    from gpu_raytracer_tpu.utils.perftest import POVS_SPONZA

    scene = Scene.from_config(CPUConfig(scene_filenames=[scene_file]))
    scene.film_width, scene.film_height = W, H
    scene.camera.resize(W, H)
    pos, rot = POVS_SPONZA[0]
    scene.camera.position = np.asarray(pos, np.float32)
    scene.camera.rotation = np.asarray(rot, np.float32)
    scene.camera.update(0.0)
    gpu = GPUConfig(num_bounces=3, enable_svgf=True, enable_taa=True)
    pt = Pathtracer(scene, gpu_config=gpu)
    pt.init_device()
    out = pt.render_frame_denoised()  # warmup/compile
    t0 = time.time()
    for _ in range(frames):
        out = pt.render_frame_denoised()
    jax.block_until_ready(out) if hasattr(out, "block_until_ready") else None
    return (time.time() - t0) / frames * 1000.0


def pallas_parity_check():
    """Mosaic-lowering regression guard (runs on the real chip only): trace
    one small wave through every Pallas kernel AND its XLA twin, compare.
    CI only exercises interpret=True; this catches compiled-path breaks."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from gpu_raytracer_tpu.config import CPUConfig
    from gpu_raytracer_tpu.ops.buffers import build_scene_buffers
    from gpu_raytracer_tpu.ops.camera_rays import generate_primary_rays, tile_order
    from gpu_raytracer_tpu.ops.pallas_traverse import trace_closest_pallas
    from gpu_raytracer_tpu.ops.pallas_wide import trace_closest_wide
    from gpu_raytracer_tpu.ops.traverse import trace_closest_tlas
    from gpu_raytracer_tpu.scene import Scene

    if jax.default_backend() != "tpu":
        return None
    scene = Scene.from_config(CPUConfig(
        scene_filenames=["/root/reference/Data/cornellbox/scene.xml"]))
    scene.film_width = scene.film_height = 64
    scene.camera.resize(64, 64)
    scene.camera.update(0.0)
    bufs = build_scene_buffers(scene)
    camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
    pix = jnp.asarray(tile_order(64, 64))
    from gpu_raytracer_tpu.config import ReconstructionFilter

    o, d = generate_primary_rays(camera, pix, 64, 0, ReconstructionFilter.BOX)
    tmax = jnp.full((64 * 64,), jnp.inf, jnp.float32)
    ref = trace_closest_tlas(bufs["nodes"], bufs["tris"], bufs["instances"],
                             o, d, tmax)
    ok = True
    if bufs.get("pallas") is not None:
        h = trace_closest_pallas(*bufs["pallas"], o, d, tmax)
        ok &= bool(np.allclose(np.asarray(h.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5, equal_nan=True))
    if bufs.get("wide") is not None:
        h = trace_closest_wide(*bufs["wide"], o, d, tmax)
        ok &= bool(np.allclose(np.asarray(h.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5, equal_nan=True))
    # Fused shade megakernel vs the XLA bounce body (diffuse Cornell:
    # bit-near parity expected; catches Mosaic breaks in the shade/BSDF/
    # in-kernel-sampler code the interpret-mode CI can't see).
    if bufs.get("pallas_shade") is not None:
        from gpu_raytracer_tpu.config import GPUConfig
        from gpu_raytracer_tpu.integrators.pathtracer import render_wave

        cfg = GPUConfig(num_bounces=4)
        a, _ = render_wave(bufs, camera, pix, 1, cfg, 64, 0, True, True,
                           use_pallas=True)
        b, _ = render_wave(bufs, camera, pix, 1, cfg, 64, 0, True, True,
                           use_pallas=True, use_pallas_shade=True)
        a, b = np.asarray(a), np.asarray(b)
        # Compiled-kernel float reordering flips a handful of RR/lobe
        # decisions -> chaotic per-pixel divergence; parity is statistical:
        # matching means and only isolated path flips.
        mean_ok = abs(a.mean() - b.mean()) < 0.01 * max(a.mean(), 1e-6)
        flips = (np.abs(a - b).max(axis=1) > 1e-3).mean()
        ok &= bool(mean_ok and flips < 0.05)
    return ok


def bench_mixed(W=512, num_bounces=6, samples=4):
    """BASELINE config #4 proxy (glass-of-water/candles class): rough
    dielectric + conductor + plastic with Kulla-Conty and a homogeneous
    medium. The reference Data/ snapshot ships no such scene, so a
    synthetic one stands in (tests/test_pallas_shade._mixed_scene +
    medium)."""
    import sys as _s

    import jax
    import jax.numpy as jnp
    import numpy as np

    _s.path.insert(0, ".")
    from tests.test_pallas_shade import _mixed_scene

    from gpu_raytracer_tpu.config import GPUConfig
    from gpu_raytracer_tpu.integrators.pathtracer import render_wave
    from gpu_raytracer_tpu.ops.buffers import build_scene_buffers
    from gpu_raytracer_tpu.ops.camera_rays import tile_order
    from gpu_raytracer_tpu.scene.types import Medium

    scene = _mixed_scene(W)
    # Homogeneous absorbing+scattering medium inside the glass sphere.
    scene.mediums.append(Medium.from_sigmas(
        "juice", [0.4, 0.1, 0.1], [0.2, 0.2, 0.2]))
    glass = next(m for m in scene.materials if m.name == "glass")
    glass.medium_id = 0
    scene.finalize()
    buffers = build_scene_buffers(scene)
    config = GPUConfig(num_bounces=num_bounces)
    mat_types = tuple(sorted({int(m.type) for m in scene.materials}))
    pix = jnp.asarray(tile_order(W, W))
    camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = buffers.get("pallas") is not None and on_tpu
    use_wide = (buffers.get("wide") is not None and on_tpu
                and not use_pallas)

    def sample(s):
        return render_wave(buffers, camera, pix, s, config, W, 0, True,
                           True, has_media=True, use_pallas=use_pallas,
                           use_wide=use_wide, mat_types=mat_types)
    radiance, rays = sample(0)
    jax.block_until_ready(radiance)
    t0 = time.time()
    for s in range(1, samples + 1):
        radiance, rays = sample(s)
    jax.block_until_ready(radiance)
    return float(rays) * samples / (time.time() - t0) / 1e6


def bench_stream(n_tris=5_000_000, R=1 << 20):
    """Beyond-VMEM streaming probe (VERDICT r2 item 5): a synthetic
    n_tris soup forced through the paged kernel vs a same-density
    VMEM-resident soup through the gang kernel. Returns
    (stream_mrays, resident_mrays)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from gpu_raytracer_tpu.bvh import stream as stream_mod
    from gpu_raytracer_tpu.bvh import wide as wide_mod
    from gpu_raytracer_tpu.bvh.cache import build_blas_cached
    from gpu_raytracer_tpu.ops import pallas_gang, pallas_stream
    from gpu_raytracer_tpu.scene.types import TriangleData

    if jax.default_backend() != "tpu":
        return None, None

    def soup(n, seed):
        rng = np.random.default_rng(seed)
        p0 = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        e1 = rng.normal(0, 0.4 * n ** (-1 / 3), (n, 3)).astype(np.float32)
        e2 = rng.normal(0, 0.4 * n ** (-1 / 3), (n, 3)).astype(np.float32)
        return np.stack([p0, p0 + e1, p0 + e2], axis=1)

    def pack(n, seed):
        world = soup(n, seed)
        bvh = build_blas_cached(TriangleData(world),
                                max_leaf_size=wide_mod.LEAF_CAP)
        wideb = wide_mod.collapse_wide(bvh)
        geo = np.concatenate([world[:, 0], world[:, 1] - world[:, 0],
                              world[:, 2] - world[:, 0]],
                             axis=-1).astype(np.float32)
        return wideb, bvh.indices, geo[bvh.indices]

    rng = np.random.default_rng(9)
    o = jnp.asarray(rng.uniform(-1.4, 1.4, (R, 3)).astype(np.float32))
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.full((R,), np.inf, jnp.float32)

    def rate(fn):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(3):
            out = fn()
        jax.block_until_ready(out)
        return R * 3 / (time.time() - t0) / 1e6

    # Resident baseline at a VMEM-sized soup (same ray wave).
    wv, idx, leaf = pack(400_000, 1)
    resident = wide_mod.pack_wide_merged(wv, idx, leaf)
    nodes = jnp.asarray(resident["nodes"])
    rows = jnp.asarray(resident["rows"])
    res_mrays = rate(lambda: pallas_gang.trace_closest_gang(
        nodes, rows, o, d, tmax))

    wv, idx, leaf = pack(n_tris, 2)
    paged = stream_mod.pack_wide_stream(wv, idx, leaf)
    tables = {k: jnp.asarray(v) for k, v in paged.items()
              if not isinstance(v, int)}
    st_mrays = rate(lambda: pallas_stream.trace_closest_stream(
        tables, o, d, tmax))
    _, _, ovf = pallas_stream._trace_stream(
        tables["resident"], tables["pages"], tables["portal_page"],
        tables["portal_root"], o, d, tmax)
    n_ovf = int((np.asarray(ovf) > 0).sum())
    if n_ovf:
        print(f"[bench] stream probe: {n_ovf} rays overflowed the "
              f"{pallas_stream.K_PORTALS}-portal list", file=sys.stderr)
    return st_mrays, res_mrays


def bench_anchor():
    """SSIM vs the reference renderer's own Sponza screenshot
    (/root/reference/Screenshots/atrium.png) — the external correctness
    anchor (tools/anchor_compare.py)."""
    import jax

    if jax.default_backend() != "tpu":
        return None
    sys.path.insert(0, ".")
    from tools.anchor_compare import compare, render_scene

    img = render_scene("/root/reference/Data/Sponza/scene.xml", 512, 16)
    return compare(img, "/root/reference/Screenshots/atrium.png")


def _tpu_reachable(timeout=180) -> bool:
    """Probe the axon TPU tunnel in a SUBPROCESS: when the tunnel is down,
    backend init hangs forever inside this process and no guard after the
    fact can help."""
    import os
    import subprocess

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return False
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices(); print('ok')"],
            timeout=timeout, capture_output=True)
        return r.returncode == 0 and b"ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main() -> int:
    import jax

    if not _tpu_reachable():
        jax.config.update("jax_platforms", "cpu")

    from gpu_raytracer_tpu.utils.perftest import POVS_SPONZA

    if jax.default_backend() != "tpu":
        # No chip (axon tunnel down): emit a clearly-flagged CPU smoke line
        # instead of hanging for hours on a 1080p CPU render.
        cor_mrays, cor_ms, paths = bench_scene(
            "/root/reference/Data/cornellbox/scene.xml", 128, 128, 3, None,
            samples=2)
        print(json.dumps({
            "metric": "Mrays/s cornell128 CPU-SMOKE (no TPU reachable)",
            "value": round(cor_mrays, 3),
            "unit": "Mrays/s",
            "vs_baseline": 0.0,
            "backend": jax.default_backend(),
            "paths": paths,
        }))
        return 0

    sponza = "/root/reference/Data/Sponza/scene.xml"
    cornell = "/root/reference/Data/cornellbox/scene.xml"

    try:
        parity = pallas_parity_check()
    except Exception as e:
        print(f"[bench] pallas parity check failed: {e}", file=sys.stderr)
        parity = False

    mrays, ms, paths = bench_scene(sponza, 1920, 1080, 3, POVS_SPONZA[:3])
    cor_mrays, cor_ms, _ = bench_scene(cornell, 512, 512, 6, None, samples=4)
    try:
        inst_mrays, _, _ = bench_scene(
            "/root/reference/Data/instancing/scene.xml", 512, 512, 4, None,
            samples=4)
    except Exception as e:
        print(f"[bench] instancing scene failed: {e}", file=sys.stderr)
        inst_mrays = None
    try:
        den_ms = bench_denoised(sponza, 1920, 1080)
    except Exception:
        den_ms = None
    try:
        st_mrays, res_mrays = bench_stream()
    except Exception as e:
        print(f"[bench] stream probe failed: {e}", file=sys.stderr)
        st_mrays = res_mrays = None
    try:
        mixed_mrays = bench_mixed()
    except Exception as e:
        print(f"[bench] mixed/media scene failed: {e}", file=sys.stderr)
        mixed_mrays = None
    try:
        anchor = bench_anchor()
    except Exception as e:
        print(f"[bench] anchor failed: {e}", file=sys.stderr)
        anchor = None

    print(json.dumps({
        "metric": "Mrays/s sponza1080p b3 NEE+MIS+tex (3 POV avg)",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / NORTH_STAR_MRAYS, 4),
        "sponza_ms_per_sample": round(ms, 1),
        "svgf_taa_1080p_ms_frame": round(den_ms, 1) if den_ms else None,
        "cornell512_mrays": round(cor_mrays, 3),
        "instancing512_mrays": round(inst_mrays, 3) if inst_mrays else None,
        "pallas_tpu_parity_ok": parity,
        "paths": paths,
        "mixed_media512_mrays": (round(mixed_mrays, 3)
                                 if mixed_mrays else None),
        "stream5M_mrays": round(st_mrays, 3) if st_mrays else None,
        "stream_vs_resident": (round(st_mrays / res_mrays, 3)
                               if st_mrays and res_mrays else None),
        "anchor_sponza": ({k: round(v, 4) for k, v in anchor.items()}
                          if anchor else None),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
