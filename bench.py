"""Benchmark harness — prints ONE JSON line for the driver.

Metric: Mrays/s (primary + bounce + shadow rays actually traced) on the
Cornell box at 512x512 with the full diffuse+NEE+MIS pipeline. The reference
publishes no numbers (BASELINE.md); the north star is Sponza 1080p 1spp+SVGF
at >= 30 FPS on one chip, which at ~4 traced rays/pixel works out to ~240
Mrays/s — `vs_baseline` is the fraction of that target.

The benchmark scene will graduate to the Sponza PerfTest POVs
(reference: Src/Util/PerfTest.h:30-60) once textures + BVH cache land.
"""

import json
import sys
import time

NORTH_STAR_MRAYS = 240.0


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpu_raytracer_tpu.config import CPUConfig, GPUConfig
    from gpu_raytracer_tpu.integrators.pathtracer import render_wave
    from gpu_raytracer_tpu.ops.buffers import build_scene_buffers
    from gpu_raytracer_tpu.scene import Scene

    W = H = 512
    scene_file = "/root/reference/Data/cornellbox/scene.xml"
    scene = Scene.from_config(CPUConfig(scene_filenames=[scene_file]))
    scene.film_width, scene.film_height = W, H
    scene.camera.resize(W, H)

    config = GPUConfig(num_bounces=6)
    buffers = build_scene_buffers(scene)
    camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
    from gpu_raytracer_tpu.ops.camera_rays import tile_order

    # 32x32 screen tiles: keeps each traversal block's rays spatially
    # coherent so the kernel's adaptive scan windows stay small.
    pixel_index = jnp.asarray(tile_order(W, H))

    use_pallas = (buffers.get("pallas") is not None
                  and jax.default_backend() == "tpu")
    use_shade = use_pallas and buffers.get("pallas_shade") is not None

    def sample(s):
        return render_wave(buffers, camera, pixel_index, s, config, W, 0,
                           scene.has_lights, True, use_pallas=use_pallas,
                           use_pallas_shade=use_shade)

    # Warmup / compile.
    radiance, rays = sample(0)
    jax.block_until_ready(radiance)

    num_samples = 8
    total_rays = 0.0
    t0 = time.time()
    for s in range(1, num_samples + 1):
        radiance, rays = sample(s)
    jax.block_until_ready(radiance)
    elapsed = time.time() - t0
    # Ray count is sample-independent in expectation; use the last measured.
    total_rays = float(rays) * num_samples

    mrays = total_rays / elapsed / 1e6
    print(json.dumps({
        "metric": "Mrays/s cornell512 diffuse+NEE+MIS b6",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / NORTH_STAR_MRAYS, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
