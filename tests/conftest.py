"""Test configuration: force the JAX CPU backend with 8 virtual devices so
sharding/multi-chip tests run without TPU hardware (SURVEY.md §4: the 'fake
backend' strategy). Must run before jax is imported anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize (TPU tunnel) force-registers its backend and sets
# jax_platforms="axon,cpu" at interpreter start, overriding the env var —
# override it back before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache (SURVEY §5.4: the PTX-cache analog): the suite
# is compile-dominated, and most tests re-run identical 48x48 pipelines across
# processes — cache hits cut whole-suite time by an order of magnitude.
from gpu_raytracer_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

import pytest  # noqa: E402

# The full suite accumulates ~60k memory maps (one compiled XLA executable
# and its constant buffers per unique jit signature, plus interpret-mode
# Pallas allocations); hitting vm.max_map_count (default 65530) makes mmap
# fail and the allocator SEGFAULT mid-suite (seen deterministically at
# ~112 tests). Best effort: raise the limit, and drop JAX's in-process
# executable caches whenever maps run high — the persistent compilation
# cache makes later re-compiles cheap disk loads.
try:  # pragma: no cover - environment-dependent
    import subprocess

    subprocess.run(["sysctl", "-w", "vm.max_map_count=524288"],
                   capture_output=True, timeout=10)
except Exception:
    pass


@pytest.fixture(autouse=True)
def _map_count_guard():
    yield
    try:
        with open("/proc/self/maps") as f:
            n = sum(1 for _ in f)
    except OSError:
        return
    if n > 45_000:
        jax.clear_caches()


REFERENCE_DATA = "/root/reference/Data"


@pytest.fixture(scope="session")
def reference_data():
    if not os.path.isdir(REFERENCE_DATA):
        pytest.skip("reference Data/ not available")
    return REFERENCE_DATA
