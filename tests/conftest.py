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

REFERENCE_DATA = "/root/reference/Data"


@pytest.fixture(scope="session")
def reference_data():
    if not os.path.isdir(REFERENCE_DATA):
        pytest.skip("reference Data/ not available")
    return REFERENCE_DATA
