"""Command-line argument parsing.

Reproduces the reference's CLI option surface (reference: Src/Args.cpp:38-184):
short/long names, the same semantics, auto-generated --help, and bare
positional arguments interpreted as scene files.
"""

from __future__ import annotations

import argparse
from typing import Optional, Sequence, Tuple

from gpu_raytracer_tpu.config import (
    BVHType,
    CPUConfig,
    GPUConfig,
    IntegratorType,
    MipmapFilterType,
    OutputFormat,
)

_BVH_NAMES = {
    "sah": BVHType.BVH2,
    "sbvh": BVHType.SBVH,
    "bvh4": BVHType.BVH4,
    "qbvh": BVHType.BVH4,
    "bvh8": BVHType.BVH8,
    "cwbvh": BVHType.BVH8,
}


def _output_format_from_filename(filename: str) -> OutputFormat:
    lower = filename.lower()
    if lower.endswith(".exr"):
        return OutputFormat.EXR
    if lower.endswith(".ppm"):
        return OutputFormat.PPM
    if lower.endswith(".png"):
        return OutputFormat.PNG
    return OutputFormat.EXR


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="gpu_raytracer_tpu",
        description="TPU-native wavefront path tracer "
        "(capabilities of jan-van-bergen/GPU-Raytracer, re-designed for JAX/TPU)",
    )
    p.add_argument("scenes", nargs="*", help="scene file(s): .obj, .ply, or Mitsuba .xml")
    p.add_argument("-W", "--width", type=int, default=None, help="window/render width")
    p.add_argument("-H", "--height", type=int, default=None, help="window/render height")
    p.add_argument("-I", "--integrator", choices=[i.value for i in IntegratorType],
                   default=None, help="integrator type")
    p.add_argument("-b", "--bounce", type=int, default=None, help="number of bounces")
    p.add_argument("-N", "--samples", type=int, default=None,
                   help="sample count at which the result is saved and the app exits")
    p.add_argument("-o", "--output", type=str, default=None, help="output filename (.exr/.ppm/.png)")
    p.add_argument("-s", "--scene", action="append", default=None, help="scene file (repeatable)")
    p.add_argument("-S", "--sky", type=str, default=None, help="sky HDR filename (equirectangular)")
    p.add_argument("--bvh", choices=sorted(_BVH_NAMES), default=None,
                   help="BVH type (host build/collapse width; on device, "
                        "bvh4/qbvh packs its 4-wide nodes into the same "
                        "8-slot rows the bvh8 kernels traverse, so it is "
                        "a build-quality choice, not a separate kernel)")
    p.add_argument("--nee", type=_parse_bool, default=None, metavar="{on,off}",
                   help="enable next-event estimation")
    p.add_argument("--mis", type=_parse_bool, default=None, metavar="{on,off}",
                   help="enable multiple importance sampling")
    p.add_argument("--force-rebuild", action="store_true", help="ignore the BVH disk cache")
    p.add_argument("-O", "--optimize", action="store_true",
                   help="enable Bittner BVH re-insertion optimization")
    p.add_argument("--opt-time", type=int, default=None,
                   help="BVH optimizer time budget (seconds; 0 = unbounded)")
    p.add_argument("--opt-batches", type=int, default=None,
                   help="BVH optimizer batch budget (0 = unbounded)")
    p.add_argument("--sah-node", type=float, default=None, help="SAH cost of an internal node")
    p.add_argument("--sah-leaf", type=float, default=None, help="SAH cost of a leaf triangle")
    p.add_argument("--sbvh-alpha", type=float, default=None,
                   help="SBVH spatial-split threshold (1 = full SBVH, 0 = full SAH)")
    p.add_argument("--mipmap", type=_parse_bool, default=None, metavar="{on,off}",
                   help="enable texture mipmapping")
    p.add_argument("--mip-filter", choices=[f.value for f in MipmapFilterType], default=None,
                   help="mip chain downsample filter")
    p.add_argument("-c", "--compress", action="store_true",
                   help="accepted for reference CLI parity; BC1 block compression is a "
                        "GPU memory format with no TPU equivalent (parsed and ignored)")
    p.add_argument("--seed", type=int, default=None, help="sampler seed")
    p.add_argument("--batch-size", type=int, default=None, help="wavefront ray-arena capacity")
    p.add_argument("--sampler", choices=["pmj", "pcg"], default=None,
                   help="sampler backend (low-discrepancy tables vs pure hash)")
    p.add_argument("--svgf", type=_parse_bool, default=None, metavar="{on,off}",
                   help="enable SVGF denoising (interactive 1spp mode)")
    p.add_argument("--perf", action="store_true",
                   help="run the PerfTest POV sweep (reference perf.txt harness)")
    p.add_argument("--aovs", action="store_true",
                   help="also export albedo/normal/position EXR AOVs")
    p.add_argument("--viewer", action="store_true",
                   help="interactive terminal viewer (WASD camera, pixel query)")
    p.add_argument("--checkpoint", type=str, default=None, metavar="FILE",
                   help="accumulator checkpoint (.npz) for long batch "
                        "renders: saved periodically, resumed when FILE "
                        "exists and matches the render configuration, "
                        "deleted on a completed render")
    p.add_argument("--checkpoint-every", type=int, default=None,
                   metavar="SECONDS",
                   help="seconds between checkpoint saves (default 300; "
                        "each save reads the accumulator back from device)")
    return p


def _parse_bool(text: str) -> bool:
    t = text.strip().lower()
    if t in ("on", "true", "1", "yes", "enabled"):
        return True
    if t in ("off", "false", "0", "no", "disabled"):
        return False
    raise argparse.ArgumentTypeError(f"expected on/off, got {text!r}")


def parse(argv: Optional[Sequence[str]] = None) -> Tuple[CPUConfig, GPUConfig]:
    """Parse argv into the (CPUConfig, GPUConfig) pair."""
    ns = build_parser().parse_args(argv)

    cpu = CPUConfig()
    gpu = GPUConfig()

    scenes = list(ns.scenes)
    if ns.scene:
        scenes.extend(ns.scene)
    if scenes:
        cpu.scene_filenames = scenes
    if ns.width is not None:
        cpu.initial_width = ns.width
    if ns.height is not None:
        cpu.initial_height = ns.height
    if ns.integrator is not None:
        cpu.integrator = IntegratorType(ns.integrator)
    if ns.samples is not None:
        cpu.output_sample_index = ns.samples
    if ns.output is not None:
        cpu.output_filename = ns.output
        cpu.output_format = _output_format_from_filename(ns.output)
    if ns.sky is not None:
        cpu.sky_filename = ns.sky
    if ns.bvh is not None:
        cpu.bvh_type = _BVH_NAMES[ns.bvh]
    cpu.bvh_force_rebuild = bool(ns.force_rebuild)
    cpu.enable_bvh_optimization = bool(ns.optimize)
    if ns.opt_time is not None:
        cpu.bvh_optimizer_max_time_ms = ns.opt_time * 1000
    if ns.opt_batches is not None:
        cpu.bvh_optimizer_max_num_batches = ns.opt_batches
    if ns.sah_node is not None:
        cpu.sah_cost_node = ns.sah_node
    if ns.sah_leaf is not None:
        cpu.sah_cost_leaf = ns.sah_leaf
    if ns.sbvh_alpha is not None:
        cpu.sbvh_alpha = ns.sbvh_alpha
    if ns.mipmap is not None:
        cpu.enable_mipmapping = ns.mipmap
    if ns.mip_filter is not None:
        cpu.mipmap_filter = MipmapFilterType(ns.mip_filter)
    cpu.enable_block_compression = bool(ns.compress)
    if ns.seed is not None:
        cpu.seed = ns.seed
    if ns.batch_size is not None:
        cpu.batch_size = ns.batch_size

    import dataclasses

    gpu_updates = {}
    if ns.bounce is not None:
        gpu_updates["num_bounces"] = ns.bounce
    if ns.nee is not None:
        gpu_updates["enable_nee"] = ns.nee
    if ns.mis is not None:
        gpu_updates["enable_mis"] = ns.mis
    if ns.sampler is not None:
        gpu_updates["sampler"] = ns.sampler
    if ns.svgf is not None:
        gpu_updates["enable_svgf"] = ns.svgf
    if gpu_updates:
        gpu = dataclasses.replace(gpu, **gpu_updates)

    cpu.run_perf_test = bool(ns.perf)
    cpu.export_aovs = bool(ns.aovs)
    cpu.run_viewer = bool(ns.viewer)
    if ns.checkpoint is not None:
        cpu.checkpoint_filename = ns.checkpoint
    if ns.checkpoint_every is not None:
        cpu.checkpoint_interval_s = ns.checkpoint_every
    return cpu, gpu
