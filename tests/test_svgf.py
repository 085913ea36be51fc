"""SVGF + TAA denoiser tests: temporal accumulation reduces variance,
history invalidation on disocclusion, TAA colour-space round trip."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gpu_raytracer_tpu.config import CPUConfig, GPUConfig  # noqa: E402
from gpu_raytracer_tpu.integrators.pathtracer import Pathtracer  # noqa: E402
from gpu_raytracer_tpu.ops import svgf as svgf_ops  # noqa: E402
from gpu_raytracer_tpu.ops import taa as taa_ops  # noqa: E402
from gpu_raytracer_tpu.scene import Scene  # noqa: E402


class TestTAASpace:
    def test_colour_space_roundtrip(self):
        rng = np.random.default_rng(0)
        rgb = jnp.asarray(rng.uniform(0, 4, (8, 8, 3)).astype(np.float32))
        back = taa_ops.from_taa_space(taa_ops.to_taa_space(rgb))
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), rtol=1e-3, atol=1e-4)

    def test_ycocg_roundtrip(self):
        rng = np.random.default_rng(1)
        rgb = jnp.asarray(rng.uniform(0, 1, (4, 4, 3)).astype(np.float32))
        back = taa_ops.ycocg_to_rgb(taa_ops.rgb_to_ycocg(rgb))
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-6)

    def test_mitchell_resample_preserves_dc(self):
        # Mitchell B=C=1/3 is a smoothing (non-interpolating) kernel; its
        # weights sum to 1, so constant images pass through exactly and
        # means are preserved.
        img = jnp.full((16, 16, 3), 0.37, jnp.float32)
        yy, xx = jnp.meshgrid(jnp.arange(16) + 0.5, jnp.arange(16) + 0.5, indexing="ij")
        pos = jnp.stack([xx, yy], axis=-1).astype(jnp.float32)
        out, ok = taa_ops.resample_mitchell(img, pos)
        assert np.asarray(ok).all()
        np.testing.assert_allclose(np.asarray(out), 0.37, atol=1e-5)
        # And on noise it smooths (variance must drop).
        noise = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (16, 16, 3)).astype(np.float32))
        sm, _ = taa_ops.resample_mitchell(noise, pos)
        assert np.asarray(sm).var() < np.asarray(noise).var()


@pytest.fixture(scope="module")
def cornell_pt(reference_data):
    import os

    cfg = CPUConfig(scene_filenames=[os.path.join(reference_data, "cornellbox", "scene.xml")])
    scene = Scene.from_config(cfg)
    scene.film_width = scene.film_height = 32
    scene.camera.resize(32, 32)
    # Spatial variance (a 7x7 bilateral) is disabled purely to keep the
    # single-core-CPU compile time of this test tolerable; the temporal +
    # atrous path is what these tests assert on.
    gpu = GPUConfig(num_bounces=2, enable_svgf=True, enable_taa=True,
                    enable_spatial_variance=False, svgf_atrous_iterations=3)
    pt = Pathtracer(scene, cfg, gpu)
    pt.init_device()
    return pt


class TestSVGF:
    def test_denoised_frames_converge(self, cornell_pt):
        pt = cornell_pt
        frames = [pt.render_frame_denoised() for _ in range(6)]
        for f in frames:
            assert np.isfinite(f).all()
            assert f.shape == (32, 32, 3)
        # Temporal accumulation: late frames differ less than early ones.
        d01 = np.abs(frames[1] - frames[0]).mean()
        d45 = np.abs(frames[5] - frames[4]).mean()
        assert d45 < d01 * 1.1, (d01, d45)
        # The image is lit and history is accumulating.
        assert frames[5].mean() > 0.02
        assert float(np.asarray(pt._svgf_history.length).mean()) > 2.0

    def test_denoised_less_noisy_than_raw(self, cornell_pt):
        pt = cornell_pt
        denoised = pt.render_frame_denoised()
        # Raw 1 spp frame for comparison.
        from gpu_raytracer_tpu.integrators.pathtracer import render_wave

        camera = {k: jnp.asarray(v) for k, v in pt.scene.camera.params().items()}
        idx = jnp.arange(32 * 32, dtype=jnp.int32)
        raw = np.asarray(render_wave(pt.buffers, camera, idx, 0, pt.gpu_config,
                                     32, 0, True)).reshape(32, 32, 3)

        def local_var(img):
            mu = img.mean(axis=-1)
            return np.var(np.diff(mu, axis=0)) + np.var(np.diff(mu, axis=1))

        assert local_var(denoised) < local_var(raw)

    def test_svgf_uses_frame_constant_halton_jitter(self, cornell_pt,
                                                    monkeypatch):
        """Under SVGF the filter jitter must be the frame-constant Halton
        point cycling with the frame index (reference Camera.h:26-29),
        not per-pixel random jitter."""
        import gpu_raytracer_tpu.integrators.pathtracer as ptmod

        pt = cornell_pt
        captured = []
        real = ptmod.generate_primary_rays

        def spy(*args, **kwargs):
            captured.append(kwargs.get("jitter_override"))
            return real(*args, **kwargs)

        monkeypatch.setattr(ptmod, "generate_primary_rays", spy)
        camera = {k: jnp.asarray(v) for k, v in pt.scene.camera.params().items()}
        idx = jnp.arange(32 * 32, dtype=jnp.int32)
        hx = [0.3, 0.7, 0.2, 0.8]
        hy = [0.2, 0.8, 0.7, 0.3]
        with jax.disable_jit():
            for s in (0, 1, 5):
                # Eager call so the override is a concrete array.
                ptmod.render_wave(pt.buffers, camera, idx, jnp.int32(s),
                                  pt.gpu_config, 32, 0, True)
                j = captured[-1]
                assert j is not None, "SVGF path did not pass jitter_override"
                assert j.shape == (2,)
                np.testing.assert_allclose(np.asarray(j),
                                           [hx[s & 3], hy[s & 3]], atol=1e-6)
            # And the non-SVGF path keeps per-pixel filter jitter.
            captured.clear()
            ptmod.render_wave(pt.buffers, camera, idx, jnp.int32(0),
                              GPUConfig(num_bounces=2), 32, 0, True)
            assert captured[-1] is None

    def test_history_reset_on_camera_cut(self, cornell_pt):
        pt = cornell_pt
        pt.render_frame_denoised()
        length_before = float(np.asarray(pt._svgf_history.length).mean())
        assert length_before >= 1.0
        # Teleport the camera: consistency tests must reject the history.
        pt.scene.camera.position = pt.scene.camera.position + np.array(
            [2.5, 0.0, 0.0], np.float32)
        pt.scene.camera.update(0.0)
        pt.render_frame_denoised()
        # History lengths restart near 1 for most pixels after the cut.
        length_after = np.asarray(pt._svgf_history.length)
        assert (length_after <= 2.0).mean() > 0.5


class TestTAAMotionCompensation:
    def test_moving_camera_uses_prev_view_projection(self, reference_data):
        """TAA history must be fetched at the pixel the surface point mapped
        to LAST frame: position_prev projected with vp_PREV (reference:
        SVGF.h:61-81 uses view_projection_prev). Regression test for the
        round-2 bug where the single-chip path projected with vp_curr,
        which under camera motion degenerates to 'fetch at the current
        pixel' (no motion compensation at all)."""
        import os

        cfg = CPUConfig(scene_filenames=[
            os.path.join(reference_data, "cornellbox", "scene.xml")])
        scene = Scene.from_config(cfg)
        W = H = 32
        scene.film_width = scene.film_height = W
        scene.camera.resize(W, H)
        gpu = GPUConfig(num_bounces=2, enable_svgf=True, enable_taa=True,
                        enable_spatial_variance=False,
                        svgf_atrous_iterations=2)
        pt = Pathtracer(scene, cfg, gpu)
        # The ctor adopts the scene's integrator maxDepth; recompute below
        # with the config the integrator actually uses.
        gpu = pt.gpu_config
        pt.init_device()
        pt.render_frame_denoised()

        # Snapshot the cross-frame state, then move the camera.
        vp_prev = pt._vp_prev
        h1 = pt._svgf_history
        t1 = pt._taa_prev
        sample_index = pt.sample_index
        scene.camera.position = scene.camera.position + np.array(
            [0.4, 0.0, 0.0], np.float32)
        scene.camera.update(0.0)
        vp_curr = jnp.asarray(scene.camera.view_projection)
        assert not np.allclose(np.asarray(vp_prev), np.asarray(vp_curr))

        actual = pt.render_frame_denoised()

        # Independent recomputation of frame 2 with the reference's
        # convention: TAA history fetched at project(position_prev, vp_PREV).
        from gpu_raytracer_tpu.integrators.pathtracer import render_wave

        camera = {k: jnp.asarray(v) for k, v in scene.camera.params().items()}
        idx = pt._tile_order
        aovs = render_wave(pt.buffers, camera, idx, sample_index, gpu, W, 0,
                           scene.has_lights, with_aovs=True,
                           mat_types=pt.mat_types)

        def img(x):
            out = jnp.zeros((H * W,) + x.shape[1:], x.dtype)
            return out.at[idx].set(x).reshape((H, W) + x.shape[1:])

        frame = {k: img(aovs[k]) for k in
                 ("direct", "indirect", "albedo", "normal", "depth",
                  "instance", "position_prev")}
        colour, _ = svgf_ops.svgf_step(frame, h1, vp_prev, gpu)
        taa_in = taa_ops.to_taa_space(jnp.maximum(colour, 0.0))
        screen_prev = svgf_ops.project_to_screen(frame["position_prev"],
                                                 vp_prev, W, H)
        expected = taa_ops.from_taa_space(
            taa_ops.taa_step(taa_in, t1, screen_prev))
        np.testing.assert_allclose(np.asarray(actual), np.asarray(expected),
                                   rtol=1e-4, atol=1e-5)
        # And the motion compensation is real: with the current matrix the
        # fetch would be ~uncompensated, which must NOT match.
        screen_wrong = svgf_ops.project_to_screen(frame["position_prev"],
                                                  vp_curr, W, H)
        shift = np.abs(np.asarray(screen_prev) - np.asarray(screen_wrong))
        assert shift.max() > 1.0  # the camera move displaces reprojection
        wrong = taa_ops.from_taa_space(
            taa_ops.taa_step(taa_in, t1, screen_wrong))
        assert np.abs(np.asarray(actual) - np.asarray(wrong)).max() > 1e-4


class TestProjectToScreen:
    def test_projection_matches_camera(self, reference_data):
        import os

        cfg = CPUConfig(scene_filenames=[os.path.join(reference_data, "cornellbox", "scene.xml")])
        scene = Scene.from_config(cfg)
        W = H = 64
        scene.camera.resize(W, H)
        scene.camera.update(0.0)
        vp = jnp.asarray(scene.camera.view_projection)
        # A point straight ahead of the camera projects to the image center.
        fwd_point = np.array([0.0, 1.0, 0.0], np.float32)  # box center
        pts = jnp.asarray(fwd_point.reshape(1, 1, 3))
        screen = np.asarray(svgf_ops.project_to_screen(pts, vp, W, H))[0, 0]
        assert abs(screen[0] - W / 2) < 1.5
        assert abs(screen[1] - H / 2) < 1.5


def test_taa_quad_resample_matches_reference_form():
    """The gather-free windowed Mitchell resample must be bit-exact vs the
    16-gather reference form whenever the per-pixel motion residual (after
    global alignment) fits the fetch window — the realistic TAA regime of
    sub-pixel jitter plus a global pan — including border footprints.
    Positions beyond the window must report a history miss (ok=False),
    never silently wrong data."""
    import numpy as np

    from gpu_raytracer_tpu.ops import taa

    rng = np.random.default_rng(0)
    H, W = 37, 53
    img = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))

    # Global pan of (+7, -3) px + sub-pixel jitter: residuals fit the
    # window, so the windowed form must agree exactly (borders included).
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    jitter = rng.uniform(-0.9, 0.9, (H, W, 2)).astype(np.float32)
    pos = np.stack([xx + 7.0 + 0.5, yy - 3.0 + 0.5], axis=-1) + jitter
    a, oka = taa.resample_mitchell(img, jnp.asarray(pos))
    b, okb = taa.resample_mitchell_quad(img, jnp.asarray(pos))
    # Values compare only where BOTH report a valid history (taa_step
    # discards the colour when ok=False, so miss-pixel values are
    # meaningless — the reference form divides near-zero Mitchell weight
    # sums there and emits garbage magnitudes by design).
    both = np.asarray(oka) & np.asarray(okb)
    # the pan legitimately drives ~20% of this small frame off-screen
    assert both.mean() > 0.75
    assert float(np.abs(np.asarray(a - b))[both].max()) < 1e-5
    # The quad form may only be MORE conservative than the reference form:
    # it degrades to a miss where the residual read would cross the frame
    # border after global alignment (an edge strip that scales with the
    # pan) — it must near-never claim ok where the reference form missed.
    assert (np.asarray(okb) & ~np.asarray(oka)).mean() < 0.01
    assert (np.asarray(oka) != np.asarray(okb)).mean() < 0.10

    # Arbitrary far positions: a pixel either reports a MISS or returns
    # exactly what the reference form returns — never silently wrong data.
    pos2 = rng.uniform(-2, max(H, W) + 2, (H, W, 2)).astype(np.float32)
    a2, _ = taa.resample_mitchell(img, jnp.asarray(pos2))
    b2, okc = taa.resample_mitchell_quad(img, jnp.asarray(pos2))
    hit = np.asarray(okc)
    assert float(np.abs(np.asarray(a2 - b2))[hit].max(initial=0.0)) < 1e-5


def test_windowed_fetch_far_motion_resets_history():
    """SVGF reproject through the gather-free windowed fetch: a pan far
    beyond the fetch window must report invalid history (length reset to
    1) rather than integrating wrong rows — the same degradation contract
    as off-screen reprojection."""
    import numpy as np

    from gpu_raytracer_tpu.config import GPUConfig
    from gpu_raytracer_tpu.ops import svgf as svgf_ops

    H = W = 48
    rng = np.random.default_rng(3)
    history = svgf_ops.SVGFHistory(
        direct=jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32)),
        indirect=jnp.zeros((H, W, 3), jnp.float32),
        moments=jnp.zeros((H, W, 4), jnp.float32),
        length=jnp.full((H, W), 8.0, jnp.float32),
        normal=jnp.tile(jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
                        (H, W, 1)),
        depth=jnp.full((H, W), 5.0, jnp.float32),
        instance=jnp.zeros((H, W), jnp.int32),
    )
    frame = {
        "direct": jnp.ones((H, W, 3), jnp.float32),
        "indirect": jnp.zeros((H, W, 3), jnp.float32),
        "normal": jnp.tile(jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
                           (H, W, 1)),
        "depth": jnp.full((H, W), 5.0, jnp.float32),
        "instance": jnp.zeros((H, W), jnp.int32),
    }
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)

    # In-window (identity) reprojection: history integrates (length 9).
    sp_ok = jnp.asarray(np.stack([xx + 0.5, yy + 0.5], axis=-1))
    out = svgf_ops.reproject(frame, history, sp_ok)
    assert float(np.median(np.asarray(out["length"]))) == 9.0

    # Uniform per-pixel scatter far beyond the residual window (no global
    # offset can align it): every pixel must reset to length 1.
    sp_far = jnp.asarray(np.stack(
        [(xx * 7.3 + 11.0) % W + 0.5, (yy * 5.1 + 3.0) % H + 0.5],
        axis=-1))
    out = svgf_ops.reproject(frame, history, sp_far)
    frac_reset = float((np.asarray(out["length"]) == 1.0).mean())
    assert frac_reset > 0.9, frac_reset


def test_windowed_fetch_border_crossing_residual_is_a_miss():
    """A residual read that crosses the frame border after global alignment
    must report in_window=False, not an edge-clamped neighbor (advisor
    round-4 finding: pixel wanting img[5] with residual -2 at column 0
    returned img[6] with ok=True)."""
    import numpy as np

    from gpu_raytracer_tpu.ops.svgf import windowed_fetch

    H, W = 4, 16
    img = jnp.asarray(
        np.broadcast_to(np.arange(W, dtype=np.float32)[None, :, None],
                        (H, W, 1)).copy())
    cols = np.broadcast_to(np.arange(W, dtype=np.int32)[None, :], (H, W))
    rows = np.broadcast_to(np.arange(H, dtype=np.int32)[:, None], (H, W))
    # Global pan of +7 columns... except column 0 wants x0=5 (residual -2,
    # aligned-space read at column -2: out of frame).
    x0 = np.where(cols == 0, 5, cols + 7).astype(np.int32)
    out, ok = windowed_fetch(img, jnp.asarray(x0), jnp.asarray(rows))
    ok = np.asarray(ok)
    out = np.asarray(out)[..., 0]
    # In-frame, in-window pixels are exact.
    exact = ok & (np.asarray(x0) < W)
    assert exact[:, 1:5].all()
    assert np.abs(out[exact] - x0[exact]).max() == 0.0
    # The border-crossing residual pixel is a MISS, never a wrong value.
    assert not ok[:, 0].any()

    # Absolute target outside the frame (x0 = -1 while the global shift
    # is negative): also a miss, not the edge-clamped img[0].
    x0b = np.where(cols == 2, -1, cols - 3).astype(np.int32)
    _, okb = windowed_fetch(img, jnp.asarray(x0b), jnp.asarray(rows))
    assert not np.asarray(okb)[:, 2].any()
