"""Headless render CLI (reference: Src/Main.cpp batch path, SURVEY.md §3.5).

    python -m gpu_raytracer_tpu scene.xml -N 64 -o out.exr [-W w -H h ...]

Runs the configured integrator until `output_sample_index` samples are
accumulated, then writes the output and exits — the reference's de-facto
batch mode. Without -N/-o it renders a default sample count and prints stats
(no interactive window on a TPU host; the interactive shell lives in
utils/viewer.py).
"""

from __future__ import annotations

import os
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

    # ---- checkpoint/resume (SURVEY §5.4): a preempted batch render
    # restarts from the last saved accumulator instead of sample 0. The
    # fingerprint refuses a snapshot taken under any other render
    # configuration; SVGF batch mode is temporally filtered (history
    # pyramid, not a running mean), so only the plain path checkpoints. ----
    ckpt_path = cpu.checkpoint_filename
    fingerprint = repr((sorted(cpu.scene_filenames), scene.film_width,
                        scene.film_height, cpu.integrator.value, cpu.seed,
                        gpu))
    if ckpt_path and gpu.enable_svgf:
        print("[checkpoint] SVGF mode keeps filter history, not a running "
              "mean; checkpointing is disabled for it")
        ckpt_path = None
    if ckpt_path and os.path.exists(ckpt_path):
        import jax.numpy as jnp
        import numpy as np

        snap = np.load(ckpt_path, allow_pickle=False)
        if str(snap["fingerprint"]) != fingerprint:
            print(f"[checkpoint] {ckpt_path} was taken under a different "
                  f"render configuration; ignoring it")
        elif snap["accumulator"].shape != (scene.film_width * scene.film_height, 3):
            print(f"[checkpoint] {ckpt_path} resolution mismatch; ignoring it")
        else:
            integrator.accumulator = jnp.asarray(snap["accumulator"])
            integrator.sample_index = int(snap["sample_index"])
            print(f"[checkpoint] resumed {ckpt_path} at sample "
                  f"{integrator.sample_index}/{num_samples}")

    def save_checkpoint():
        import numpy as np

        tmp = ckpt_path + ".tmp.npz"
        # np.asarray is the device readback — keep it out of the sample
        # loop's critical path by saving only every checkpoint_interval_s.
        np.savez(tmp, accumulator=np.asarray(integrator.accumulator),
                 sample_index=integrator.sample_index,
                 fingerprint=fingerprint)
        os.replace(tmp, ckpt_path)

    t0 = time.time()
    last_save = t0
    start_index = integrator.sample_index
    first = start_index == 0
    while integrator.sample_index < num_samples:
        if gpu.enable_svgf:
            integrator.render_frame_denoised()
        else:
            integrator.render()
        if first:
            import jax

            jax.block_until_ready(integrator.accumulator)
            print(f"[render] first sample (incl. compile) {time.time() - t0:.2f}s")
            first = False
        if ckpt_path and time.time() - last_save >= cpu.checkpoint_interval_s \
                and integrator.sample_index < num_samples:
            save_checkpoint()
            last_save = time.time()
            print(f"[checkpoint] saved {ckpt_path} at sample "
                  f"{integrator.sample_index}")
    import jax

    jax.block_until_ready(integrator.accumulator)
    dt = time.time() - t0
    rendered = max(num_samples - start_index, 1)
    print(f"[render] {rendered} spp in {dt:.2f}s "
          f"({1000.0 * dt / rendered:.1f} ms/sample)")
    if ckpt_path and os.path.exists(ckpt_path):
        os.remove(ckpt_path)  # completed render: the snapshot is stale now

    if cpu.output_filename:
        image_io.save(cpu.output_filename, integrator.framebuffer())
        print(f"[output] wrote {cpu.output_filename}")
        if cpu.export_aovs and hasattr(integrator, "export_aovs"):
            for name, path in integrator.export_aovs(cpu.output_filename).items():
                print(f"[output] wrote {path} ({name})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
