"""Persistent XLA compilation cache (reference: the NVRTC PTX disk cache,
/root/reference/Src/Device/CUDAModule.cpp:118-124 — compiled device code is
cached on disk and reused across processes unless sources changed).

The XLA analog is `jax_compilation_cache_dir`: jitted executables are keyed
by HLO hash + compile flags + backend, so a second process rendering the
same scene config skips the 5-30 s Mosaic/XLA compiles entirely.

Call `enable()` before the first jit dispatch (it is a no-op if the user
already configured a cache dir via env/flags).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache",
    "xla",
)


def _host_tag() -> str:
    """Short hash of the host CPU's feature flags. XLA:CPU persists
    AOT-compiled executables keyed only by HLO; loading an entry compiled
    on a host with different vector extensions SEGFAULTS/SIGILLs mid-run
    (seen as the cpu_aot_loader machine-feature warnings followed by a
    suite crash). Keying the cache directory by CPU flags isolates hosts;
    TPU entries just land beside the CPU ones of the same host."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:10]


def enable(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at `cache_dir` (default:
    <repo>/.cache/xla). Returns the directory in use, or None on failure."""
    import jax

    # Honor an explicit JAX_PLATFORMS env var. Some site configurations
    # (the axon TPU tunnel) force-register their platform at interpreter
    # start and override the env var with jax_platforms="axon,cpu"; when the
    # user asked for a specific backend (JAX_PLATFORMS=cpu for a headless
    # CPU render, or while the tunnel is down), put their choice back before
    # any backend initializes. The test conftest does the same.
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms and jax.config.jax_platforms != env_platforms:
        try:
            jax.config.update("jax_platforms", env_platforms)
        except Exception:
            pass

    if cache_dir is None:
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") \
            or _DEFAULT_DIR + "-" + _host_tag()
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything: renders re-run identical programs, so even small
        # entries pay for themselves on the second process.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        return cache_dir
    except Exception as e:  # pragma: no cover - config name drift across jax versions
        print(f"[compile-cache] disabled ({e})")
        return None
