"""Unit tests for the host core: AABB algebra, transforms, config, CLI."""

import numpy as np
import pytest

from gpu_raytracer_tpu import args as cli
from gpu_raytracer_tpu.config import BVHType, GPUConfig, IntegratorType
from gpu_raytracer_tpu.core import transform as xf
from gpu_raytracer_tpu.core.aabb import AABB, cumulative_union, surface_area


class TestAABB:
    def test_empty_and_expand(self):
        box = AABB.create_empty()
        assert box.is_empty()
        box = box.expand_point(np.array([1, 2, 3], np.float32))
        box = box.expand_point(np.array([-1, 0, 1], np.float32))
        np.testing.assert_allclose(box.min, [-1, 0, 1])
        np.testing.assert_allclose(box.max, [1, 2, 3])

    def test_surface_area(self):
        box = AABB(np.zeros(3, np.float32), np.array([2, 3, 4], np.float32))
        assert box.surface_area() == pytest.approx(2 * (6 + 12 + 8))
        assert AABB.create_empty().surface_area() == 0.0

    def test_batched_surface_area_matches_scalar(self):
        rng = np.random.default_rng(0)
        mn = rng.standard_normal((16, 3)).astype(np.float32)
        mx = mn + rng.random((16, 3)).astype(np.float32)
        batched = surface_area(mn, mx)
        for i in range(16):
            assert batched[i] == pytest.approx(AABB(mn[i], mx[i]).surface_area(), rel=1e-5)

    def test_cumulative_union(self):
        pts = np.array([[0, 0, 0], [1, 1, 1], [-1, 2, 0]], np.float32)
        mn, mx = cumulative_union(pts, pts)
        np.testing.assert_allclose(mn[-1], [-1, 0, 0])
        np.testing.assert_allclose(mx[-1], [1, 2, 1])
        mn_r, mx_r = cumulative_union(pts, pts, reverse=True)
        np.testing.assert_allclose(mn_r[0], [-1, 0, 0])

    def test_transform(self):
        box = AABB(np.array([-1, -1, -1], np.float32), np.ones(3, np.float32))
        m = xf.translate([5, 0, 0])
        moved = box.transform(m)
        np.testing.assert_allclose(moved.min, [4, -1, -1])
        np.testing.assert_allclose(moved.max, [6, 1, 1])


class TestTransform:
    def test_compose_invert_roundtrip(self):
        rng = np.random.default_rng(1)
        q = rng.standard_normal(4).astype(np.float32)
        q /= np.linalg.norm(q)
        m = xf.trs(rng.standard_normal(3), q, 2.5)
        m_inv = xf.invert(m)
        pts = rng.standard_normal((10, 3)).astype(np.float32)
        out = xf.transform_points(m_inv, xf.transform_points(m, pts))
        np.testing.assert_allclose(out, pts, atol=1e-4)

    def test_look_rotation_maps_forward(self):
        rng = np.random.default_rng(2)
        for _ in range(20):
            fwd = rng.standard_normal(3)
            fwd /= np.linalg.norm(fwd)
            q = xf.look_rotation(fwd, [0, 1, 0])
            out = xf.quat_rotate(q, np.array([0, 0, 1], np.float32))
            np.testing.assert_allclose(out, fwd, atol=1e-5)

    def test_quat_multiply_composes(self):
        qa = xf.quat_axis_angle([0, 1, 0], 0.7)
        qb = xf.quat_axis_angle([1, 0, 0], -0.3)
        v = np.array([0.2, -0.5, 0.9], np.float32)
        lhs = xf.quat_rotate(xf.quat_multiply(qa, qb), v)
        rhs = xf.quat_rotate(qa, xf.quat_rotate(qb, v))
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    def test_is_identity(self):
        assert xf.is_identity(xf.identity())
        assert not xf.is_identity(xf.translate([1e-3, 0, 0]))


class TestArgs:
    def test_reference_flags(self):
        cpu, gpu = cli.parse(
            ["scene.xml", "-W", "1920", "-H", "1080", "-b", "4", "-N", "128",
             "-o", "out.ppm", "--bvh", "sbvh", "--nee", "off", "--mis", "on",
             "--sah-node", "6", "--sbvh-alpha", "0.5", "-O"]
        )
        assert cpu.scene_filenames == ["scene.xml"]
        assert cpu.initial_width == 1920 and cpu.initial_height == 1080
        assert gpu.num_bounces == 4
        assert cpu.output_sample_index == 128
        assert cpu.output_filename == "out.ppm"
        assert cpu.bvh_type == BVHType.SBVH
        assert gpu.enable_nee is False and gpu.enable_mis is True
        assert cpu.sah_cost_node == 6.0
        assert cpu.sbvh_alpha == 0.5
        assert cpu.enable_bvh_optimization is True

    def test_gpu_config_hashable(self):
        a = GPUConfig()
        b = GPUConfig(num_bounces=3)
        assert hash(a) != hash(b) or a != b
        assert a == GPUConfig()


class TestMedium:
    def test_van_de_hulst_roundtrip(self):
        from gpu_raytracer_tpu.scene.types import Medium

        m = Medium(C=np.array([0.8, 0.5, 0.2], np.float32),
                   mfp=np.array([1.0, 2.0, 0.5], np.float32), g=0.3)
        sigma_a, sigma_s = m.to_sigmas()
        back = Medium.from_sigmas("rt", sigma_a, sigma_s, 0.3)
        np.testing.assert_allclose(back.C, m.C, atol=1e-4)
        np.testing.assert_allclose(back.mfp, m.mfp, rtol=1e-4)
