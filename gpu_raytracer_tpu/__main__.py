"""Headless render CLI (reference: Src/Main.cpp batch path, SURVEY.md §3.5).

    python -m gpu_raytracer_tpu scene.xml -N 64 -o out.exr [-W w -H h ...]

Runs the configured integrator until `output_sample_index` samples are
accumulated, then writes the output and exits — the reference's de-facto
batch mode. Without -N/-o it renders a default sample count and prints stats
(no interactive window on a TPU host; the interactive shell lives in
utils/viewer.py).
"""

from __future__ import annotations

import sys
import time

from gpu_raytracer_tpu import args as cli
from gpu_raytracer_tpu.config import IntegratorType
from gpu_raytracer_tpu.scene import Scene
from gpu_raytracer_tpu.utils import compile_cache
from gpu_raytracer_tpu.utils import image as image_io


def main(argv=None) -> int:
    compile_cache.enable()
    cpu, gpu = cli.parse(argv)
    if not cpu.scene_filenames:
        print("no scene file given (see --help)", file=sys.stderr)
        return 2

    t0 = time.time()
    scene = Scene.from_config(cpu)
    if cpu.initial_width and "-W" in (argv or sys.argv):
        scene.film_width = cpu.initial_width
    if cpu.initial_height and "-H" in (argv or sys.argv):
        scene.film_height = cpu.initial_height
    scene.camera.resize(scene.film_width, scene.film_height)
    print(f"[scene] {len(scene.instances)} instances, {scene.triangle_count()} triangles, "
          f"{scene.film_width}x{scene.film_height} ({time.time() - t0:.2f}s)")

    if cpu.integrator == IntegratorType.AO:
        from gpu_raytracer_tpu.integrators.ao import AO as Integrator
    else:
        from gpu_raytracer_tpu.integrators.pathtracer import Pathtracer as Integrator

    t0 = time.time()
    integrator = Integrator(scene, cpu, gpu)
    integrator.init_device()
    print(f"[init] device buffers built in {time.time() - t0:.2f}s")

    if cpu.run_viewer:
        from gpu_raytracer_tpu.utils.viewer import run_viewer

        run_viewer(integrator, target_samples=cpu.output_sample_index or 0)
        return 0

    if cpu.run_perf_test:
        from gpu_raytracer_tpu.utils import perftest

        povs = perftest.povs_for_scene(" ".join(cpu.scene_filenames)) \
            or perftest.POVS_SPONZA
        perftest.run(integrator, povs)
        print("[perf] wrote perf.txt")
        return 0

    num_samples = cpu.output_sample_index or 16
    t0 = time.time()
    for s in range(num_samples):
        if gpu.enable_svgf:
            integrator.render_frame_denoised()
        else:
            integrator.render()
        if s == 0:
            import jax

            jax.block_until_ready(integrator.accumulator)
            print(f"[render] first sample (incl. compile) {time.time() - t0:.2f}s")
    import jax

    jax.block_until_ready(integrator.accumulator)
    dt = time.time() - t0
    print(f"[render] {num_samples} spp in {dt:.2f}s "
          f"({1000.0 * dt / num_samples:.1f} ms/sample)")

    if cpu.output_filename:
        image_io.save(cpu.output_filename, integrator.framebuffer())
        print(f"[output] wrote {cpu.output_filename}")
        if cpu.export_aovs and hasattr(integrator, "export_aovs"):
            for name, path in integrator.export_aovs(cpu.output_filename).items():
                print(f"[output] wrote {path} ({name})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
