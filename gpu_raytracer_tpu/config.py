"""Configuration for host and device sides.

Mirrors the reference's two-tier config split (reference: Src/Config.h:9-64 for
CPUConfig, Src/CUDA/Common.h:21-67 for GPUConfig).  `CPUConfig` holds settings
that only affect host-side work (BVH construction, asset processing, output);
`GPUConfig` holds settings consumed by device code.  In the reference GPUConfig
lives in a `__constant__` device global re-uploaded whenever dirty; here it is
a hashable static argument to the jitted render stages, so changing it triggers
an XLA re-specialisation (the TPU analog of the constant re-upload, with
caching via jit's static-argument dispatch).

The invalidation-flag protocol (reference: Src/Renderer/Integrators/
Integrator.h:59-65) is reproduced by `Invalidation`, a dirty-bit set consumed
by the integrators' `update()`.
"""

from __future__ import annotations

import dataclasses
import enum
from dataclasses import dataclass, field
from typing import List, Optional, Tuple


class BVHType(enum.Enum):
    """Which acceleration structure to build/traverse (reference: Src/Config.h:9-15)."""

    BVH2 = "bvh"      # binary SAH BVH
    SBVH = "sbvh"     # spatial-split BVH (Stich et al.)
    BVH4 = "qbvh"     # 4-wide collapsed BVH
    BVH8 = "cwbvh"    # compressed wide BVH (Ylitie et al.)


class IntegratorType(enum.Enum):
    """Render algorithm (reference: Src/Config.h:17-21)."""

    PATHTRACER = "pathtracer"
    AO = "ao"


class OutputFormat(enum.Enum):
    """Headless render output encoding (reference: Src/Config.h:23-27)."""

    EXR = "exr"
    PPM = "ppm"
    PNG = "png"


class MipmapFilterType(enum.Enum):
    """Downsample filter for texture mip generation (reference: Src/Config.h:29-33)."""

    BOX = "box"
    LANCZOS = "lanczos"
    KAISER = "kaiser"


class ReconstructionFilter(enum.Enum):
    """Pixel reconstruction filter for primary-ray jitter (reference: Src/CUDA/Common.h:21-26)."""

    BOX = "box"
    TENT = "tent"
    GAUSSIAN = "gaussian"


# AOV bit positions (reference: Src/CUDA/Common.h:28-37).
class AOV(enum.IntFlag):
    NONE = 0
    RADIANCE = 1 << 0
    RADIANCE_DIRECT = 1 << 1
    RADIANCE_INDIRECT = 1 << 2
    ALBEDO = 1 << 3
    NORMAL = 1 << 4
    POSITION = 1 << 5


# Wavefront capacity: number of rays processed per launch wave.  The reference
# uses 1080*720 (Src/CUDA/Common.h:69-71); we keep the same default but round
# to a multiple of the TPU lane count so every SoA buffer tiles cleanly onto
# the 8x128 VPU registers.
BATCH_SIZE = 1080 * 720  # 777_600 = 6075 * 128

MAX_BOUNCES = 128  # reference: Src/CUDA/Common.h:76

# Sampler table dimensions (reference: Src/CUDA/Common.h:80-96).
PMJ_NUM_SEQUENCES = 64
PMJ_NUM_SAMPLES_PER_SEQUENCE = 4096
BLUE_NOISE_NUM_TEXTURES = 16
BLUE_NOISE_TEXTURE_DIM = 128

# Kulla-Conty LUT dimensions (reference: Src/CUDA/Common.h:88-96).
LUT_DIELECTRIC_DIM_IOR = 16
LUT_DIELECTRIC_DIM_ROUGHNESS = 16
LUT_DIELECTRIC_DIM_COS_THETA = 16
LUT_CONDUCTOR_DIM_ROUGHNESS = 32
LUT_CONDUCTOR_DIM_COS_THETA = 32


@dataclass(frozen=True)
class GPUConfig:
    """Device-consumed render settings (reference: Src/CUDA/Common.h:39-67).

    Frozen + hashable so it can be a jit static argument: every distinct
    GPUConfig value compiles (and caches) its own specialised pipeline, which
    is the XLA-native equivalent of the reference's `__constant__ config`
    re-upload-on-dirty protocol.
    """

    reconstruction_filter: ReconstructionFilter = ReconstructionFilter.GAUSSIAN
    aov_mask: int = int(AOV.RADIANCE)
    num_bounces: int = 10
    enable_mipmapping: bool = True  # ray-cone texture LOD (reference Common.h)
    # Sampler backend: "pmj" = low-discrepancy tables + blue-noise Cranley-
    # Patterson rotation (the reference's primary path); "pcg" = pure hash
    # (the reference's >4096spp fallback, table-free).
    sampler: str = "pmj"
    enable_nee: bool = True            # next-event estimation
    enable_mis: bool = True            # multiple importance sampling
    enable_russian_roulette: bool = True
    enable_svgf: bool = False
    enable_spatial_variance: bool = True
    enable_taa: bool = True
    modulate_albedo: bool = True       # SVGF demodulation
    # SVGF parameters (reference: Src/CUDA/Common.h:59-66)
    svgf_atrous_iterations: int = 6
    svgf_alpha_colour: float = 0.1
    svgf_alpha_moments: float = 0.1
    svgf_sigma_z: float = 4.0
    svgf_sigma_n: float = 16.0
    svgf_sigma_l: float = 10.0
    # AO integrator
    ao_radius: float = 1.0

    def aov_enabled(self, aov: AOV) -> bool:
        return bool(self.aov_mask & int(aov))

    def with_aov(self, aov: AOV, enabled: bool = True) -> "GPUConfig":
        mask = (self.aov_mask | int(aov)) if enabled else (self.aov_mask & ~int(aov))
        return dataclasses.replace(self, aov_mask=mask)


@dataclass
class CPUConfig:
    """Host-side settings (reference: Src/Config.h:35-64)."""

    initial_width: int = 1024
    initial_height: int = 768

    scene_filenames: List[str] = field(default_factory=list)
    sky_filename: Optional[str] = None

    integrator: IntegratorType = IntegratorType.PATHTRACER

    # Headless output
    output_sample_index: Optional[int] = None
    output_filename: Optional[str] = None
    output_format: OutputFormat = OutputFormat.EXR

    # BVH construction
    bvh_type: BVHType = BVHType.BVH8
    bvh_force_rebuild: bool = False
    enable_bvh_optimization: bool = False
    bvh_optimizer_max_time_ms: int = 60_000
    bvh_optimizer_max_num_batches: int = 1000
    sah_cost_node: float = 4.0
    sah_cost_leaf: float = 1.0
    sbvh_alpha: float = 1e-4  # full SBVH when 1, full SAH when 0

    # Textures
    enable_mipmapping: bool = True
    mipmap_filter: MipmapFilterType = MipmapFilterType.BOX
    # The reference optionally block-compresses textures to BC1 (a GPU memory
    # format); TPUs have no BCn samplers so this maps to nothing and is
    # intentionally not implemented. Kept as a parsed-and-ignored flag for CLI
    # compatibility (reference: Src/Config.h:54, Args.cpp "-c/--compress").
    enable_block_compression: bool = False

    enable_scene_update: bool = False  # update scene graph every frame

    # Device batching
    batch_size: int = BATCH_SIZE

    # RNG seed for the whole render (sampler decorrelation)
    seed: int = 0

    # Tooling modes (CLI)
    run_perf_test: bool = False
    export_aovs: bool = False
    run_viewer: bool = False

    # Batch-render checkpoint/resume (SURVEY §5.4; no reference analog —
    # the reference renders interactively, a TPU batch job can be
    # preempted): accumulator + sample_index snapshot, fingerprint-gated.
    checkpoint_filename: Optional[str] = None
    checkpoint_interval_s: int = 300


@dataclass
class Invalidation:
    """Dirty-bit set driving selective re-upload/re-trace in `Integrator.update`
    (reference: Src/Renderer/Integrators/Integrator.h:59-65)."""

    scene: bool = True
    sky: bool = True
    materials: bool = True
    mediums: bool = True
    camera: bool = True
    gpu_config: bool = True
    aovs: bool = True

    def any(self) -> bool:
        return any(dataclasses.asdict(self).values())

    def clear(self) -> None:
        for f in dataclasses.fields(self):
            setattr(self, f.name, False)

    def set_all(self) -> None:
        for f in dataclasses.fields(self):
            setattr(self, f.name, True)
