"""Fused SVGF stencil kernels vs the XLA reference forms (interpret mode).
Reference: /root/reference/Src/CUDA/SVGF/SVGF.h:284-554."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpu_raytracer_tpu.config import GPUConfig
from gpu_raytracer_tpu.ops import pallas_svgf as psv
from gpu_raytracer_tpu.ops import svgf as svgf_ops


@pytest.fixture(autouse=True)
def _interpret():
    old = psv.FORCE_INTERPRET
    psv.FORCE_INTERPRET = True
    yield
    psv.FORCE_INTERPRET = old


def _fake_frame(H, W, seed=0):
    """Random frame with surface structure + a sky region (depth 1e30)."""
    rng = np.random.default_rng(seed)
    n = rng.normal(size=(H, W, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    depth = (rng.uniform(1.0, 10.0, (H, W))).astype(np.float32)
    depth[: H // 4] = 1e30  # sky band (sanitized inf)
    frame = {
        "normal": jnp.asarray(n),
        "depth": jnp.asarray(depth),
        "instance": jnp.zeros((H, W), jnp.int32),
    }
    dz_x = jnp.abs(svgf_ops._shift(frame["depth"], 0, 1) - frame["depth"])
    dz_y = jnp.abs(svgf_ops._shift(frame["depth"], 1, 0) - frame["depth"])
    frame["dz"] = jnp.clip(jnp.maximum(dz_x, dz_y), 1e-4, 1e20)
    integrated = {
        "direct": jnp.asarray(rng.uniform(0, 2, (H, W, 3)).astype(np.float32)),
        "indirect": jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32)),
        "var_direct": jnp.asarray(rng.uniform(0, 0.5, (H, W)).astype(np.float32)),
        "var_indirect": jnp.asarray(rng.uniform(0, 0.5, (H, W)).astype(np.float32)),
        "length": jnp.asarray(rng.uniform(1.0, 8.0, (H, W)).astype(np.float32)),
    }
    return frame, integrated


def test_atrous_matches_xla():
    H, W = 96, 160  # 2 row bands, non-multiple of the 64-row band height
    frame, integrated = _fake_frame(H, W)
    d_ref, i_ref, (fd_ref, fi_ref) = svgf_ops.atrous(
        frame, integrated, iterations=4, feedback_iteration=1)
    d_p, i_p, (fd_p, fi_p) = psv.svgf_spatial_pallas(
        frame, integrated, iterations=4, feedback_iteration=1,
        spatial_variance=False)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(i_p), np.asarray(i_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(fd_p), np.asarray(fd_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(fi_p), np.asarray(fi_ref),
                               rtol=2e-4, atol=2e-4)


def test_variance_plus_atrous_matches_xla():
    H, W = 64, 130  # ragged width exercises the 128-lane padding
    frame, integrated = _fake_frame(H, W, seed=3)
    ref_int = svgf_ops.spatial_variance(frame, integrated)
    d_ref, i_ref, _ = svgf_ops.atrous(frame, ref_int, iterations=2)
    d_p, i_p, _ = psv.svgf_spatial_pallas(frame, integrated, iterations=2,
                                          spatial_variance=True)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(i_p), np.asarray(i_ref),
                               rtol=2e-4, atol=2e-4)


def test_svgf_step_pallas_route_matches_xla():
    """Whole svgf_step with use_pallas routes only the spatial stages; the
    temporal reproject (gather) is shared, so outputs must agree."""
    H, W = 64, 128
    frame, integrated = _fake_frame(H, W, seed=5)
    frame = dict(frame)
    frame["direct"] = integrated["direct"]
    frame["indirect"] = integrated["indirect"]
    frame["albedo"] = jnp.full((H, W, 3), 0.8, jnp.float32)
    frame["position_prev"] = jnp.zeros((H, W, 3), jnp.float32)
    del frame["dz"]
    history = svgf_ops.init_history(H, W)
    config = GPUConfig(enable_svgf=True, svgf_atrous_iterations=3)
    vp = jnp.eye(4)
    c_ref, h_ref = svgf_ops.svgf_step(dict(frame), history, vp, config)
    c_p, h_p = svgf_ops.svgf_step(dict(frame), history, vp, config,
                                  use_pallas=True)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(h_p.direct),
                               np.asarray(h_ref.direct),
                               rtol=2e-4, atol=2e-4)


def test_iteration_guard():
    frame, integrated = _fake_frame(64, 128, seed=1)
    with pytest.raises(ValueError):
        psv.svgf_spatial_pallas(frame, integrated, iterations=7)


def test_width_guard():
    """Frames beyond the stencil kernels' scoped-VMEM budget must be
    rejected (ADVICE r3: the fixed 120 MB cap compile-fails at ~8K wide;
    svgf_step falls back to the XLA path via supports_width)."""
    assert psv.supports_width(1920)
    assert psv.supports_width(3840)
    assert not psv.supports_width(7680)
    frame, integrated = _fake_frame(8, 7680, seed=2)
    with pytest.raises(ValueError):
        psv.svgf_spatial_pallas(frame, integrated, iterations=2)
