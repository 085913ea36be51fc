"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric (BASELINE.json): Mrays/s on Sponza at 1080p with the full
pipeline (NEE+MIS, textures, ray cones), averaged over the first three
reference PerfTest POVs (Src/Util/PerfTest.h:30-60). Counts every ray
actually traced (primary + bounce + shadow). The north star is Sponza 1080p
1spp+SVGF at >= 30 FPS on one chip ~= 240 Mrays/s; `vs_baseline` is the
fraction of that target.

Budget discipline (VERDICT r3 item 5): every probe checks a global deadline
(env BENCH_BUDGET_S, default 1500 s) before starting; skipped probes emit
null fields, and the JSON line ALWAYS prints. The Sponza scene/buffers are
built ONCE and shared by the Sponza probes (the build is the single most
expensive host step).

Anchors: the primary external anchor is Data/instancing vs the reference's
own instancing.png screenshot (same scene file, same scene.xml camera).
Sponza vs atrium.png is kept with an attribution: atrium.png is the
Dabrovic ATRIUM (enclosed barrel vault, no curtains/plants), a scene ABSENT
from the Data snapshot — the Crytek Sponza that Data/Sponza/scene.xml loads
cannot reproduce it from any POV (the 9-POV sweep quantifies that).
"""

import json
import os
import sys
import time

from gpu_raytracer_tpu.utils import compile_cache

compile_cache.enable()

NORTH_STAR_MRAYS = 240.0

_T0 = time.time()
_DEADLINE = _T0 + float(os.environ.get("BENCH_BUDGET_S", "1500"))


def _left() -> float:
    return _DEADLINE - time.time()


def _log(msg):
    print(f"[bench +{time.time() - _T0:.0f}s] {msg}", file=sys.stderr,
          flush=True)


def _load_scene(scene_file, W, H):
    import numpy as np

    from gpu_raytracer_tpu.config import CPUConfig
    from gpu_raytracer_tpu.ops.buffers import build_scene_buffers
    from gpu_raytracer_tpu.scene import Scene

    scene = Scene.from_config(CPUConfig(scene_filenames=[scene_file]))
    scene.film_width, scene.film_height = W, H
    scene.camera.resize(W, H)
    buffers = build_scene_buffers(scene)
    return scene, buffers


def _set_pov(scene, pov):
    import numpy as np

    if pov is not None:
        pos, rot = pov
        scene.camera.position = np.asarray(pos, np.float32)
        scene.camera.rotation = np.asarray(rot, np.float32)
    scene.camera.update(0.0)


def _paths(buffers, W, H, num_bounces):
    import jax

    on_tpu = jax.default_backend() == "tpu"
    use_pallas = buffers.get("pallas") is not None and on_tpu
    use_shade = (use_pallas and buffers.get("pallas_shade") is not None
                 and W % 32 == 0 and H % 32 == 0 and num_bounces <= 12)
    use_wide = buffers.get("wide") is not None and on_tpu and not use_pallas
    use_gather = (buffers.get("shade_gather") is not None and on_tpu
                  and not use_shade)
    use_stream = buffers.get("wide_stream") is not None and on_tpu
    return {"wide": use_wide, "pallas": use_pallas, "shade": use_shade,
            "gather_shade": use_gather, "stream": use_stream}


def bench_scene(scene, buffers, W, H, num_bounces, povs, samples=2):
    import jax
    import jax.numpy as jnp

    from gpu_raytracer_tpu.config import GPUConfig
    from gpu_raytracer_tpu.integrators.pathtracer import (
        default_compact_tiers,
        render_wave,
    )
    from gpu_raytracer_tpu.ops.camera_rays import tile_order

    scene.film_width, scene.film_height = W, H
    scene.camera.resize(W, H)
    config = GPUConfig(num_bounces=num_bounces)
    mat_types = tuple(sorted({int(m.type) for m in scene.materials}))
    pixel_index = jnp.asarray(tile_order(W, H))
    p = _paths(buffers, W, H, num_bounces)

    def sample(camera, s):
        return render_wave(buffers, camera, pixel_index, s, config, W, 0,
                           scene.has_lights, True,
                           has_textures=len(scene.textures) > 0,
                           use_pallas=p["pallas"],
                           use_pallas_shade=p["shade"],
                           use_wide=p["wide"],
                           use_gather_shade=p["gather_shade"],
                           use_stream=p["stream"], mat_types=mat_types,
                           compact_tiers=default_compact_tiers(W * H, config))

    results = []
    if not povs:
        povs = [None]
    for pov in povs:
        _set_pov(scene, pov)
        camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
        t_c = time.time()
        radiance, rays = sample(camera, 0)  # warmup/compile
        jax.block_until_ready(radiance)
        _log(f"scene {W}x{H} warmup {time.time() - t_c:.0f}s")
        t0 = time.time()
        for s in range(1, samples + 1):
            radiance, rays = sample(camera, s)
        # Forced scalar readback INSIDE the timed region: block_until_ready
        # does not reliably block on this backend (trusted protocol,
        # memory: tpu-tunnel-constraints).
        n_rays = float(rays)
        elapsed = time.time() - t0
        results.append((n_rays * samples / elapsed / 1e6,
                        elapsed / samples * 1000.0))
    mrays = sum(r[0] for r in results) / len(results)
    ms = sum(r[1] for r in results) / len(results)
    return mrays, ms, p


def bench_denoised(scene, buffers, W, H, frames=3):
    """SVGF+TAA interactive path: ms per denoised 1spp frame, plus the
    bare traced-sample ms on the same wave so the denoise overhead
    (frame - trace) is attributed in the output (VERDICT r3 item 2).

    Timed by the trusted protocol (memory: tpu-tunnel-constraints):
    fresh sample_index per call and a forced 4-byte scalar readback —
    block_until_ready alone over-reported the fused frame by ~800 ms in
    the round-4 validation run."""
    import jax
    import jax.numpy as jnp

    from gpu_raytracer_tpu.config import GPUConfig
    from gpu_raytracer_tpu.integrators.pathtracer import (
        _denoised_frame, render_wave,
    )
    from gpu_raytracer_tpu.integrators.pathtracer import (
        default_compact_tiers as _dct,
    )
    from gpu_raytracer_tpu.ops import svgf as svgf_ops
    from gpu_raytracer_tpu.ops.camera_rays import tile_order
    from gpu_raytracer_tpu.utils.perftest import POVS_SPONZA

    scene.film_width, scene.film_height = W, H
    scene.camera.resize(W, H)
    _set_pov(scene, POVS_SPONZA[0])
    gpu = GPUConfig(num_bounces=3, enable_svgf=True, enable_taa=True)
    camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
    idx = jnp.asarray(tile_order(W, H))
    p = _paths(buffers, W, H, 3)
    mat_types = tuple(sorted({int(m.type) for m in scene.materials}))

    dsum = jax.jit(lambda x: jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))
    history = svgf_ops.init_history(H, W)
    taa_prev = jnp.zeros((H, W, 3), jnp.float32)
    vp_prev = jnp.asarray(scene.camera.view_projection)

    def frame(s):
        colour, _, _ = _denoised_frame(
            buffers, camera, idx, s, history, vp_prev, taa_prev,
            jnp.asarray(s == 0), gpu, W, H, 0, scene.has_lights,
            len(scene.textures) > 0, len(scene.mediums) > 0,
            p["pallas"], p["wide"], mat_types,
            use_gather_shade=p["gather_shade"], use_stream=p["stream"])
        return colour

    float(dsum(frame(0)))  # warmup/compile
    vals = []
    for s in range(1, frames + 1):
        t0 = time.time()
        float(dsum(frame(s)))
        vals.append((time.time() - t0) * 1000.0)
    frame_ms = sorted(vals)[len(vals) // 2]

    # Bare traced 1spp sample with AOVs (the denoised frame's trace stage).
    def trace(s):
        return render_wave(buffers, camera, idx, s, gpu, W, 0,
                           scene.has_lights, with_aovs=True,
                           has_textures=len(scene.textures) > 0,
                           use_pallas=p["pallas"], use_wide=p["wide"],
                           use_gather_shade=p["gather_shade"],
                           use_stream=p["stream"], mat_types=mat_types,
                           compact_tiers=_dct(W * H, gpu))["direct"]

    float(dsum(trace(0)))
    vals = []
    for s in range(1, frames + 1):
        t0 = time.time()
        float(dsum(trace(s)))
        vals.append((time.time() - t0) * 1000.0)
    trace_ms = sorted(vals)[len(vals) // 2]
    return frame_ms, trace_ms


def pallas_parity_check():
    """Mosaic-lowering regression guard (runs on the real chip only): trace
    one small wave through every Pallas kernel AND its XLA twin, compare.
    CI only exercises interpret=True; this catches compiled-path breaks."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from gpu_raytracer_tpu.ops.camera_rays import generate_primary_rays, tile_order
    from gpu_raytracer_tpu.ops.pallas_traverse import trace_closest_pallas
    from gpu_raytracer_tpu.ops.pallas_wide import trace_closest_wide
    from gpu_raytracer_tpu.ops.pallas_gang import trace_closest_gang
    from gpu_raytracer_tpu.ops.traverse import trace_closest_tlas

    if jax.default_backend() != "tpu":
        return None
    scene, bufs = _load_scene(
        "/root/reference/Data/cornellbox/scene.xml", 64, 64)
    scene.camera.update(0.0)
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
        h = trace_closest_gang(
            *bufs["wide"], o, d, tmax,
            flat=bufs.get("wide_prim_map") is not None)
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


def fused_shade_image_gate(spp=64, W=64):
    """IMAGE-SPACE error bound for the fused gather-shade path (VERDICT r3
    item 9): mixed-BSDF scene accumulated to `spp` on BOTH the XLA bounce
    body and the compiled gather-shade kernel, gated on relative RMSE.
    The kernel evaluates degree-7 Kulla-Conty polynomial curves (~1e-2
    max fit error on E(mu)) where the XLA body taps trilinear LUTs; over
    many samples the borderline lobe flips average out, so the converged
    images must agree far more tightly than any single sample — this
    bounds the shipped energy error, which the mean/flip gate above
    cannot. Returns (rel_rmse, ok)."""
    import sys as _s

    import jax
    import jax.numpy as jnp
    import numpy as np

    if jax.default_backend() != "tpu":
        return None, None
    _s.path.insert(0, ".")
    from tests.test_pallas_shade import _mixed_scene

    from gpu_raytracer_tpu.config import GPUConfig
    from gpu_raytracer_tpu.integrators.pathtracer import render_wave
    from gpu_raytracer_tpu.ops.buffers import build_scene_buffers
    from gpu_raytracer_tpu.ops.camera_rays import tile_order

    scene = _mixed_scene(W)
    buffers = build_scene_buffers(scene)
    config = GPUConfig(num_bounces=6)
    mat_types = tuple(sorted({int(m.type) for m in scene.materials}))
    pix = jnp.asarray(tile_order(W, W))
    camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
    p = _paths(buffers, W, W, 6)

    acc_a = jnp.zeros((W * W, 3), jnp.float32)
    acc_b = jnp.zeros((W * W, 3), jnp.float32)
    for s in range(spp):
        acc_a = acc_a + render_wave(buffers, camera, pix, s, config, W, 0,
                                    True, use_pallas=p["pallas"],
                                    use_wide=p["wide"],
                                    mat_types=mat_types)
        acc_b = acc_b + render_wave(buffers, camera, pix, s, config, W, 0,
                                    True, use_pallas=p["pallas"],
                                    use_wide=p["wide"],
                                    use_gather_shade=True,
                                    mat_types=mat_types)
    a = np.asarray(acc_a) / spp
    b = np.asarray(acc_b) / spp
    rel_rmse = float(np.sqrt(np.mean((a - b) ** 2)) / max(a.mean(), 1e-6))
    return rel_rmse, rel_rmse < 3e-3


def bench_mixed(W=512, num_bounces=6, samples=4):
    """BASELINE config #4 proxy (glass-of-water/candles class): rough
    dielectric + conductor + plastic with Kulla-Conty and a homogeneous
    medium. The reference Data/ snapshot ships no such scene, so a
    synthetic one stands in (tests/test_pallas_shade._mixed_scene +
    medium)."""
    import sys as _s

    import jax
    import jax.numpy as jnp

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
    p = _paths(buffers, W, W, num_bounces)

    def sample(s):
        # Media scenes take the gather-shade megakernel since round 4
        # (supports_gather_shade allows media; the small-scene SMEM
        # megakernel does not do media, so it is NOT selected here).
        return render_wave(buffers, camera, pix, s, config, W, 0, True,
                           True, has_media=True, use_pallas=p["pallas"],
                           use_wide=p["wide"],
                           use_gather_shade=buffers.get("shade_gather")
                           is not None,
                           mat_types=mat_types)
    radiance, rays = sample(0)
    jax.block_until_ready(radiance)
    t0 = time.time()
    for s in range(1, samples + 1):
        radiance, rays = sample(s)
    jax.block_until_ready(radiance)
    return float(rays) * samples / (time.time() - t0) / 1e6


def bench_stream(n_tris=500_000, R=1 << 18):
    """Beyond-VMEM streaming probe: a synthetic n_tris soup forced through
    the paged kernel vs a same-density VMEM-resident soup through the gang
    kernel. Returns (stream_mrays, resident_mrays, residual_lanes) —
    residual must be 0 (the loss-free re-entry loop resolves every portal
    overflow, ops/pallas_stream.py).

    500k tris / 256k rays (round 4, down from 5M/1M): still genuinely
    beyond-VMEM (pages total 128 MB vs a 9-row resident top), but the
    loss-free loops now do ALL the portal work the round-3 kernel
    silently dropped at its 64-round cap, and at 2M+ the single-launch
    on-device time trips the TPU watchdog ('worker crashed or restarted',
    reproduced at 2M and 5M) — a real scale limit of the current
    portal-drain throughput, documented in ops/pallas_stream.py."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from gpu_raytracer_tpu.bvh import stream as stream_mod
    from gpu_raytracer_tpu.bvh import wide as wide_mod
    from gpu_raytracer_tpu.bvh.cache import build_blas_cached
    from gpu_raytracer_tpu.ops import pallas_gang, pallas_stream
    from gpu_raytracer_tpu.scene.types import TriangleData

    if jax.default_backend() != "tpu":
        return None, None, None

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

    # Unique origin per timed call: the axon backend memoizes same-input
    # executions (a repeat call with identical buffers returns in ~0.1 ms),
    # so timing loops must never reuse an input buffer.
    ovs = [jax.block_until_ready(o + (k + 1) * 1e-6) for k in range(3)]
    reps = 2  # the stream kernel runs 10s+ per call; 2 reps keeps the
    #           probe inside the driver's BENCH_BUDGET_S

    dsum = jax.jit(lambda x: jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))

    def rate(fn, force=lambda r: r):
        """Trusted protocol: a forced 4-byte scalar readback per timed
        call — block_until_ready does not reliably block here (this exact
        loop once reported 3441 Mrays/s for a 10-s kernel). `force`
        selects an f32 output array to sum-fetch."""
        float(dsum(force(fn(ovs[0]))))  # warmup/compile
        t0 = time.time()
        last = None
        for k in range(reps):
            last = fn(ovs[k + 1])
            float(dsum(force(last)))
        return R * reps / (time.time() - t0) / 1e6, last

    # Resident baseline at a VMEM-sized soup (same ray wave).
    wv, idx, leaf = pack(400_000, 1)
    resident = wide_mod.pack_wide_merged(wv, idx, leaf)
    nodes = jnp.asarray(resident["nodes"])
    rows = jnp.asarray(resident["rows"])
    res_mrays, _ = rate(lambda ov: pallas_gang.trace_closest_gang(
        nodes, rows, ov, d, tmax, flat=True), force=lambda h: h.t)

    wv, idx, leaf = pack(n_tris, 2)
    paged = stream_mod.pack_wide_stream(wv, idx, leaf)
    tables = {k: jnp.asarray(v) for k, v in paged.items()
              if not isinstance(v, int)}
    # The raw _trace_stream carries the residual output, so the timed
    # calls double as the loss-free check (no extra kernel launch).
    st_mrays, last = rate(
        lambda ov: pallas_stream._trace_stream(
            tables["resident"], tables["pages"], tables["portal_page"],
            tables["portal_root"], ov, d, tmax),
        force=lambda r: r[0])
    n_res = int((np.asarray(last[2]) > 0).sum())
    if n_res:
        _log(f"stream probe: {n_res} lanes UNRESOLVED after "
             f"{pallas_stream.MAX_PASSES} re-entry passes")
    return st_mrays, res_mrays, n_res


def _render_pov(scene, buffers, W, H, spp, pov=None):
    """Tone-mapped [0,1] render at a POV on the shared buffers."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from gpu_raytracer_tpu.config import GPUConfig
    from gpu_raytracer_tpu.integrators.pathtracer import render_wave
    from gpu_raytracer_tpu.ops.camera_rays import tile_order
    from gpu_raytracer_tpu.utils.image import tonemap_aces

    scene.film_width, scene.film_height = W, H
    scene.camera.resize(W, H)
    _set_pov(scene, pov)
    camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
    idx = jnp.asarray(tile_order(W, H))
    config = GPUConfig(num_bounces=6)
    mat_types = tuple(sorted({int(m.type) for m in scene.materials}))
    p = _paths(buffers, W, H, 6)
    acc = jnp.zeros((W * H, 3), jnp.float32)
    for s in range(spp):
        acc = acc + render_wave(buffers, camera, idx, s, config, W, 0,
                                scene.has_lights,
                                has_textures=len(scene.textures) > 0,
                                use_pallas=p["pallas"], use_wide=p["wide"],
                                use_pallas_shade=p["shade"],
                                use_gather_shade=p["gather_shade"],
                                use_stream=p["stream"], mat_types=mat_types)
    hdr = np.zeros((W * H, 3), np.float32)
    hdr[np.asarray(idx)] = np.asarray(acc) / spp
    return tonemap_aces(hdr.reshape(H, W, 3)) ** (1.0 / 2.2)


def bench_anchor_instancing():
    """External anchor attempt: Data/instancing at its scene.xml camera vs
    the reference's instancing.png. ATTRIBUTION (round 4): decomposing the
    sensor transform EXACTLY like the reference loader (rotate LEFT-
    multiplies translate, Matrix4::decompose forward=(0,0,-1)) puts the
    default camera at R*t = (-155, 28, 4) facing AWAY from the room — the
    reference's own loader yields the same void view, so instancing.png
    was hand-flown in its interactive viewer; it also shows 441 lucy
    statues whose lucy.obj is absent from the Data snapshot. No reference
    screenshot ships with a reproducible scene+camera; the numbers are
    recorded for continuity, not as a correctness bar."""
    import jax

    if jax.default_backend() != "tpu":
        return None
    sys.path.insert(0, ".")
    from tools.anchor_compare import compare

    scene, buffers = _load_scene(
        "/root/reference/Data/instancing/scene.xml", 512, 288)
    img = _render_pov(scene, buffers, 512, 288, 8)
    out = compare(img, "/root/reference/Screenshots/instancing.png",
                  size=(180, 320))
    out["note"] = ("scene.xml default camera faces empty space under the "
                   "reference loader's own transform semantics (verified "
                   "against MitsubaLoader.cpp parse_transform_matrix + "
                   "Matrix4::decompose); instancing.png was captured from "
                   "a hand-flown camera and shows lucy.obj geometry absent "
                   "from the Data snapshot")
    return out


def bench_anchor_sponza(scene, buffers):
    """Sponza vs atrium.png, with the scene-mismatch attribution: sweep
    the scene.xml default camera + all 9 PerfTest POVs at low cost and
    report the BEST SSIM any POV achieves (atrium.png is the Dabrovic
    atrium, not the Crytek Sponza the Data snapshot ships — no POV can
    match it; the sweep quantifies the ceiling)."""
    import jax

    if jax.default_backend() != "tpu":
        return None
    sys.path.insert(0, ".")
    from tools.anchor_compare import compare
    from gpu_raytracer_tpu.utils.perftest import POVS_SPONZA

    best = None
    best_pov = "default"
    povs = [("default", None)] + [(f"pov{i}", p)
                                  for i, p in enumerate(POVS_SPONZA)]
    for name, pov in povs:
        if _left() < 90 and best is not None:
            break
        img = _render_pov(scene, buffers, 256, 172, 4, pov)
        m = compare(img, "/root/reference/Screenshots/atrium.png")
        if best is None or m["ssim"] > best["ssim"]:
            best, best_pov = m, name
    best["best_pov"] = best_pov
    best["note"] = ("atrium.png is the Dabrovic atrium (enclosed vault, "
                    "no curtains/plants/lions), a scene absent from the "
                    "Data snapshot; Data/Sponza is Crytek Sponza, so no "
                    "POV can reproduce the screenshot. Best-of-10-POV "
                    "SSIM reported. Missing-texture materials render as "
                    "their scene.xml reflectance scale (white 1x1 "
                    "fallback), not pink.")
    return best


def main() -> int:
    import jax

    if not _tpu_reachable():
        jax.config.update("jax_platforms", "cpu")

    from gpu_raytracer_tpu.utils.perftest import POVS_SPONZA

    if jax.default_backend() != "tpu":
        # No chip (axon tunnel down): emit a clearly-flagged CPU smoke line
        # instead of hanging for hours on a 1080p CPU render.
        scene, buffers = _load_scene(
            "/root/reference/Data/cornellbox/scene.xml", 128, 128)
        cor_mrays, cor_ms, paths = bench_scene(scene, buffers, 128, 128, 3,
                                               None, samples=2)
        print(json.dumps({
            "metric": "Mrays/s cornell128 CPU-SMOKE (no TPU reachable)",
            "value": round(cor_mrays, 3),
            "unit": "Mrays/s",
            "vs_baseline": 0.0,
            "backend": jax.default_backend(),
            "paths": paths,
        }))
        return 0

    out = {
        "metric": "Mrays/s sponza1080p b3 NEE+MIS+tex (3 POV avg)",
        "value": None, "unit": "Mrays/s", "vs_baseline": None,
    }

    try:
        parity = pallas_parity_check()
    except Exception as e:
        _log(f"pallas parity check failed: {e}")
        parity = False
    out["pallas_tpu_parity_ok"] = parity

    try:
        rr, rr_ok = fused_shade_image_gate()
        out["fused_shade_rel_rmse"] = (round(rr, 6) if rr is not None
                                       else None)
        out["fused_shade_image_ok"] = rr_ok
    except Exception as e:
        _log(f"fused shade image gate failed: {e}")
        out["fused_shade_image_ok"] = False

    sponza_scene = sponza_buffers = None
    try:
        t0 = time.time()
        sponza_scene, sponza_buffers = _load_scene(
            "/root/reference/Data/Sponza/scene.xml", 1920, 1080)
        _log(f"sponza build {time.time() - t0:.0f}s")
        mrays, ms, paths = bench_scene(sponza_scene, sponza_buffers,
                                       1920, 1080, 3, POVS_SPONZA[:3])
        out.update(value=round(mrays, 3),
                   vs_baseline=round(mrays / NORTH_STAR_MRAYS, 4),
                   sponza_ms_per_sample=round(ms, 1), paths=paths)
    except Exception as e:
        _log(f"sponza bench failed: {e}")

    if sponza_buffers is not None and _left() > 240:
        try:
            den_ms, trace_ms = bench_denoised(sponza_scene, sponza_buffers,
                                              1920, 1080)
            out["svgf_taa_1080p_ms_frame"] = round(den_ms, 1)
            out["svgf_taa_trace_ms"] = round(trace_ms, 1)
            out["svgf_taa_denoise_overhead_ms"] = round(den_ms - trace_ms, 1)
        except Exception as e:
            _log(f"denoised bench failed: {e}")

    if sponza_buffers is not None and _left() > 200:
        # Honest interactive-demo intermediate (VERDICT r4 item 9): Sponza
        # denoised fps at 960x544 on the one real chip, trusted timing.
        try:
            den_ms, _ = bench_denoised(sponza_scene, sponza_buffers,
                                       960, 544)
            out["svgf_taa_960x544_ms_frame"] = round(den_ms, 1)
            out["svgf_taa_960x544_fps"] = round(1000.0 / max(den_ms, 1e-3),
                                                2)
        except Exception as e:
            _log(f"960x544 denoised bench failed: {e}")

    if _left() > 180:
        try:
            scene, buffers = _load_scene(
                "/root/reference/Data/cornellbox/scene.xml", 512, 512)
            cor_mrays, _, _ = bench_scene(scene, buffers, 512, 512, 6, None,
                                          samples=4)
            out["cornell512_mrays"] = round(cor_mrays, 3)
        except Exception as e:
            _log(f"cornell failed: {e}")

    if _left() > 180:
        try:
            from gpu_raytracer_tpu.assets.geometry import sphere
            from gpu_raytracer_tpu.config import CPUConfig
            from gpu_raytracer_tpu.ops.buffers import build_scene_buffers
            from gpu_raytracer_tpu.scene import Scene

            scene = Scene.from_config(CPUConfig(scene_filenames=[
                "/root/reference/Data/instancing/scene.xml"]))
            # lucy.obj is absent from the Data snapshot, so its mesh
            # degrades to a dummy micro-triangle and the 441 statue
            # instances render empty (round-4 weak #7: the probe measured
            # per-wave fixed cost, not traversal). Substitute an icosphere
            # stand-in so the probe traverses a real 444-instance
            # two-level TLAS/BLAS; the anchor image stays attributed as
            # data-blocked (bench_anchor_instancing).
            import numpy as np

            standins = 0
            for md in scene.mesh_datas:
                if len(md.triangles) <= 1:
                    md.triangles = sphere(
                        np.diag([0.5, 0.5, 0.5, 1.0]).astype(np.float32),
                        num_subdivisions=4)
                    md.bvh = None  # force a BLAS rebuild on the stand-in
                    standins += 1
            scene.film_width, scene.film_height = 512, 512
            scene.camera.resize(512, 512)
            scene.update(0.0)
            buffers = build_scene_buffers(scene)
            inst_mrays, inst_ms, _ = bench_scene(scene, buffers, 512, 512,
                                                 4, None, samples=4)
            out["instancing512_mrays"] = round(inst_mrays, 3)
            out["instancing_ms_per_sample"] = round(inst_ms, 1)
            out["instancing_note"] = (
                f"lucy.obj absent from Data snapshot; {standins} degraded "
                "mesh(es) replaced by a 5k-tri icosphere stand-in")
        except Exception as e:
            _log(f"instancing failed: {e}")

    if _left() > 150:
        try:
            out["mixed_media512_mrays"] = round(bench_mixed(), 3)
        except Exception as e:
            _log(f"mixed/media failed: {e}")

    if _left() > 150:
        try:
            a = bench_anchor_instancing()
            out["anchor_instancing"] = (
                {k: (round(v, 4) if isinstance(v, float) else v)
                 for k, v in a.items()} if a else None)
        except Exception as e:
            _log(f"instancing anchor failed: {e}")

    if sponza_buffers is not None and _left() > 120:
        try:
            a = bench_anchor_sponza(sponza_scene, sponza_buffers)
            if a:
                out["anchor_sponza"] = {
                    k: (round(v, 4) if isinstance(v, float) else v)
                    for k, v in a.items()}
        except Exception as e:
            _log(f"sponza anchor failed: {e}")

    # LAST on purpose: a mid-probe TPU device fault poisons every later
    # device call in this process (observed round 4: a stream-probe fault
    # took the anchor probes down with it).
    if _left() > 240:
        try:
            st, res, residual = bench_stream()
            out["stream5M_mrays"] = round(st, 3) if st else None
            out["stream_vs_resident"] = (round(st / res, 3)
                                         if st and res else None)
            out["stream_residual_lanes"] = residual
        except Exception as e:
            _log(f"stream probe failed: {e}")

    print(json.dumps(out))
    return 0


def _tpu_reachable(timeout=180) -> bool:
    """Probe the axon TPU tunnel in a SUBPROCESS: when the tunnel is down,
    backend init hangs forever inside this process and no guard after the
    fact can help."""
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


if __name__ == "__main__":
    sys.exit(main())
