"""Timing / profiling utilities (reference: Src/Device/CUDAEvent.h per-kernel
event timing + Main.cpp:252-305 frame statistics, Src/Util/Timer RAII).

Under XLA a whole sample is one fused program, so per-kernel CUDA events have
no direct analog; instead:
  * `FrameTimer` reproduces the GUI's rolling frame statistics (100-frame
    history, min/max-trimmed mean);
  * `ScopeTimer` is the host-side RAII timer;
  * `trace()` wraps `jax.profiler.trace` to capture a device trace for
    offline inspection (the deep equivalent of the per-kernel event tree);
  * `stage_times()` times the pipeline's stages as separately dispatched
    jitted calls (trace/shade split), the coarse analog of the reference's
    per-kernel event categories.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Dict, Optional

import numpy as np


class ScopeTimer:
    """RAII wall timer (reference: Src/Util/Timer ScopeTimer)."""

    def __init__(self, name: str, silent: bool = False):
        self.name = name
        self.silent = silent
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.time() - self._t0
        if not self.silent:
            print(f"[{self.name}] {self.elapsed * 1000:.2f} ms")
        return False


class FrameTimer:
    """Rolling frame stats with min/max-trimmed average
    (reference: Main.cpp calc_timing)."""

    def __init__(self, history: int = 100):
        self.times = deque(maxlen=history)
        self._last = None

    def tick(self) -> float:
        now = time.time()
        delta = 0.0 if self._last is None else now - self._last
        self._last = now
        if delta > 0:
            self.times.append(delta)
        return delta

    def stats(self) -> Dict[str, float]:
        if not self.times:
            return {"fps": 0.0, "avg_ms": 0.0, "min_ms": 0.0, "max_ms": 0.0}
        arr = np.asarray(self.times)
        trimmed = np.sort(arr)[1:-1] if len(arr) > 2 else arr
        avg = trimmed.mean()
        return {
            "fps": 1.0 / max(avg, 1e-9),
            "avg_ms": avg * 1000.0,
            "min_ms": arr.min() * 1000.0,
            "max_ms": arr.max() * 1000.0,
        }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/gpu_raytracer_tpu_trace"):
    """Capture a jax device profile (view with tensorboard/xprof)."""
    import jax

    with jax.profiler.trace(log_dir):
        yield
    print(f"[profiler] trace written to {log_dir}")


def stage_times(integrator, repeats: int = 3) -> Dict[str, float]:
    """Per-stage ms via separate dispatches on the integrator's PRODUCTION
    paths (wide/gang Pallas kernels when active, XLA otherwise) — the
    analog of the reference's per-kernel event-timing tree
    (Main.cpp:368-443): generate / primary trace / bounce trace / shadow
    trace / full sample / denoised frame."""
    import jax
    import jax.numpy as jnp

    from gpu_raytracer_tpu.config import ReconstructionFilter
    from gpu_raytracer_tpu.ops.camera_rays import generate_primary_rays
    from gpu_raytracer_tpu.ops.traverse import trace_closest_tlas

    W, H = integrator.width, integrator.height
    bufs = integrator.buffers
    camera = {k: jnp.asarray(v) for k, v in integrator.scene.camera.params().items()}
    idx = jnp.arange(W * H, dtype=jnp.int32)
    R = W * H

    out: Dict[str, float] = {}

    def timed(name, fn):
        fn()  # compile
        t0 = time.time()
        for _ in range(repeats):
            fn()
        out[name] = (time.time() - t0) / repeats * 1000.0

    timed("generate_ms", lambda: jax.block_until_ready(
        generate_primary_rays(camera, idx, W, 0, ReconstructionFilter.BOX)))
    o, d = generate_primary_rays(camera, idx, W, 0, ReconstructionFilter.BOX)
    jax.block_until_ready((o, d))
    tmax = jnp.full(R, jnp.inf)

    use_wide = getattr(integrator, "use_wide", False) \
        and not getattr(integrator, "use_pallas", False)
    if use_wide:
        from gpu_raytracer_tpu.ops.pallas_gang import (
            trace_any_gang,
            trace_closest_gang,
        )
        from gpu_raytracer_tpu.ops.pallas_wide import trace_closest_wide

        timed("trace_primary_ms", lambda: jax.block_until_ready(
            trace_closest_wide(*bufs["wide"], o, d, tmax)))
        hit = trace_closest_wide(*bufs["wide"], o, d, tmax)
        # Synthetic diffuse continuation wave from the primary hits: the
        # representative cost of the bounce-trace category.
        hp = o + jnp.where(jnp.isfinite(hit.t), hit.t, 0.0)[:, None] * d
        bd = -d + 0.3 * jnp.sign(jnp.sin(hp * 37.0))
        bd = bd / jnp.linalg.norm(bd, axis=-1, keepdims=True)
        btmax = jnp.where(jnp.isfinite(hit.t), jnp.inf, 0.0)
        bo = hp + 1e-3 * bd
        timed("trace_bounce_ms", lambda: jax.block_until_ready(
            trace_closest_gang(*bufs["wide"], bo, bd, btmax)))
        timed("trace_shadow_ms", lambda: jax.block_until_ready(
            trace_any_gang(*bufs["wide"], bo, bd,
                           jnp.where(jnp.isfinite(hit.t), 50.0, 0.0))))
    else:
        timed("trace_primary_ms", lambda: jax.block_until_ready(
            trace_closest_tlas(bufs["nodes"], bufs["tris"], bufs["instances"],
                               o, d, tmax)))
    timed("full_sample_ms", lambda: (integrator.render(),
                                     jax.block_until_ready(integrator.accumulator)))
    if integrator.gpu_config.enable_svgf:
        timed("denoised_frame_ms", lambda: (
            integrator.render_frame_denoised(),
            jax.block_until_ready(integrator.accumulator)))
        out["svgf_taa_ms"] = out["denoised_frame_ms"] - out["full_sample_ms"]
    return out


def format_stage_times(times: Dict[str, float]) -> str:
    """One-line per stage, indented tree like the reference's GUI panel."""
    return "\n".join(f"  {k:24s} {v:9.2f} ms" for k, v in times.items())
