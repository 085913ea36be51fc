"""SBVH builder + Bittner optimizer + native builder tests."""

import numpy as np
import pytest

from gpu_raytracer_tpu.assets import geometry
from gpu_raytracer_tpu.bvh import BVH2, build_bvh2, collapse
from gpu_raytracer_tpu.bvh.cpu_trace import intersect_tris_brute, traverse_bvh2
from gpu_raytracer_tpu.bvh.optimize import optimize
from gpu_raytracer_tpu.bvh.sbvh import SBVHBuilder
from gpu_raytracer_tpu.scene.types import TriangleData


def _random_tris(n, seed=0, spread=10.0, elongated=False):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-spread, spread, (n, 1, 3))
    offsets = rng.standard_normal((n, 3, 3)) * 0.5
    if elongated:
        # Long thin diagonal triangles: the case spatial splits exist for.
        offsets[:, :, 0] *= 8.0
    return TriangleData((centers + offsets).astype(np.float32))


def _oracle_check(bvh: BVH2, tris: TriangleData, n_rays=40, seed=1):
    pos = tris.positions[bvh.indices]
    p0 = pos[:, 0]
    e1 = pos[:, 1] - pos[:, 0]
    e2 = pos[:, 2] - pos[:, 0]
    cent = pos.mean(axis=1)
    rng = np.random.default_rng(seed)
    for _ in range(n_rays):
        o = rng.uniform(-15, 15, 3).astype(np.float32)
        tgt = cent[rng.integers(len(cent))]
        d = (tgt - o).astype(np.float32)
        d /= np.linalg.norm(d)
        t_b, _, _, _ = traverse_bvh2(bvh, o, d, p0, e1, e2)
        t_r, _, _, _ = intersect_tris_brute(o, d, p0, e1, e2)
        assert (np.isclose(t_b, t_r, rtol=1e-4)
                or (np.isinf(t_b) and np.isinf(t_r))), (t_b, t_r)


class TestSBVH:
    def test_elongated_scene_beats_sah(self):
        tris = _random_tris(300, seed=3, elongated=True)
        sbvh = SBVHBuilder(sbvh_alpha=1e-5).build(tris)
        sah = build_bvh2(tris)
        # Spatial splits must not be worse, and usually clearly better, on
        # long diagonal triangles.
        assert sbvh.sah_cost() <= sah.sah_cost() * 1.02
        # Duplicated references exist (that's the point of SBVH here).
        assert sbvh.num_prims >= len(tris)

    def test_traversal_with_duplicates(self):
        tris = _random_tris(200, seed=4, elongated=True)
        sbvh = SBVHBuilder(sbvh_alpha=1e-5).build(tris)
        collapsed = collapse(sbvh, max_leaf_size=4)
        _oracle_check(collapsed, tris)

    def test_alpha_zero_degenerates_to_object_splits(self):
        tris = _random_tris(100, seed=5)
        # alpha > 1: the overlap test can never exceed it -> pure object splits
        sbvh = SBVHBuilder(sbvh_alpha=2.0).build(tris)
        assert sbvh.num_prims == len(tris)  # no duplication

    def test_clipped_tri_aabb_exact(self):
        from gpu_raytracer_tpu.bvh.sbvh import clipped_tri_aabb

        # Diagonal triangle in the xy plane; clip to x-slab [0.25, 0.5].
        tri = np.array([[[0.0, 0.0, 0.0], [1.0, 1.0, 0.0], [1.0, 0.0, 0.0]]],
                       np.float32)
        mn, mx = clipped_tri_aabb(tri, 0, 0.25, 0.5)
        # Inside the slab the triangle's y spans [0, x]: exact hull is
        # y in [0, 0.5] — an AABB chop of the whole-triangle box would
        # report y in [0, 1].
        np.testing.assert_allclose(mn[0], [0.25, 0.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(mx[0], [0.5, 0.5, 0.0], atol=1e-6)
        # Slab entirely right of the triangle -> empty (inverted) box.
        mn, mx = clipped_tri_aabb(tri, 0, 1.5, 2.0)
        assert np.any(mn[0] > mx[0])
        # Half-space clip at x >= 0.5 keeps the right part.
        mn, mx = clipped_tri_aabb(tri, 0, 0.5, np.inf)
        np.testing.assert_allclose(mn[0], [0.5, 0.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(mx[0], [1.0, 1.0, 0.0], atol=1e-6)


class TestOptimizer:
    def test_cost_never_increases(self):
        tris = _random_tris(300, seed=6)
        bvh = build_bvh2(tris)
        before = bvh.sah_cost()
        opt = optimize(bvh, max_batches=20, max_time_ms=20_000)
        after = opt.sah_cost()
        assert after <= before * 1.001, (before, after)
        opt.validate()
        _oracle_check(opt, tris)

    def test_improves_bad_tree(self):
        # Median-split-quality tree: optimizer should find real gains.
        tris = _random_tris(400, seed=7, spread=50.0)
        bvh = build_bvh2(tris, sah_cost_node=0.0)  # degenerate cost params
        before = bvh.sah_cost()
        opt = optimize(bvh, max_batches=30, max_time_ms=20_000)
        assert opt.sah_cost() <= before
        _oracle_check(opt, tris)


class TestNativeBuilder:
    def test_matches_python_builder(self):
        from gpu_raytracer_tpu.bvh import native

        if not native.available():
            pytest.skip("no native toolchain")
        tris = _random_tris(500, seed=8)
        mn, mx = tris.aabbs()
        nb = native.build_sah_collapsed(mn, mx, tris.centroids(), 4.0, 1.0, 4)
        pb = collapse(build_bvh2(tris), max_leaf_size=4)
        assert nb.num_nodes == pb.num_nodes
        assert nb.sah_cost() == pytest.approx(pb.sah_cost(), rel=1e-5)
        np.testing.assert_array_equal(nb.indices, pb.indices)
        _oracle_check(nb, tris)


class TestWideBVHs:
    def test_bvh4_matches_oracle(self):
        from gpu_raytracer_tpu.bvh.bvh4 import convert_bvh4, traverse_bvh4
        from gpu_raytracer_tpu.bvh.cpu_trace import intersect_tris_brute

        tris = _random_tris(300, seed=10)
        bvh2 = collapse(build_bvh2(tris), max_leaf_size=4)
        bvh4 = convert_bvh4(bvh2)
        assert bvh4.num_nodes < bvh2.num_nodes
        pos = tris.positions[bvh4.indices]
        p0, e1, e2 = pos[:, 0], pos[:, 1] - pos[:, 0], pos[:, 2] - pos[:, 0]
        cent = pos.mean(axis=1)
        rng = np.random.default_rng(2)
        for _ in range(40):
            o = rng.uniform(-15, 15, 3).astype(np.float32)
            d = (cent[rng.integers(len(cent))] - o).astype(np.float32)
            d /= np.linalg.norm(d)
            t4, _ = traverse_bvh4(bvh4, o, d, p0, e1, e2)
            tr, _, _, _ = intersect_tris_brute(o, d, p0, e1, e2)
            assert np.isclose(t4, tr, rtol=1e-4) or (np.isinf(t4) and np.isinf(tr))

    def test_bvh8_quantized_boxes_conservative(self):
        from gpu_raytracer_tpu.bvh.bvh8 import convert_bvh8

        tris = _random_tris(200, seed=11)
        bvh2 = build_bvh2(tris)  # 1-tri leaves
        bvh8 = convert_bvh8(bvh2)
        assert bvh8.num_nodes < bvh2.num_nodes / 2
        # Every decoded child box must ENCLOSE the true geometry it leads to
        # (quantization rounds outward) — checked transitively by traversal.
        assert len(bvh8.indices) == len(tris)
        assert sorted(bvh8.indices.tolist()) == list(range(len(tris)))

    def test_bvh8_matches_oracle(self):
        from gpu_raytracer_tpu.bvh.bvh8 import convert_bvh8, traverse_bvh8
        from gpu_raytracer_tpu.bvh.cpu_trace import intersect_tris_brute

        tris = _random_tris(300, seed=12)
        bvh8 = convert_bvh8(build_bvh2(tris))
        pos = tris.positions[bvh8.indices]
        p0, e1, e2 = pos[:, 0], pos[:, 1] - pos[:, 0], pos[:, 2] - pos[:, 0]
        cent = pos.mean(axis=1)
        rng = np.random.default_rng(3)
        hits = 0
        for _ in range(60):
            o = rng.uniform(-15, 15, 3).astype(np.float32)
            d = (cent[rng.integers(len(cent))] - o).astype(np.float32)
            d /= np.linalg.norm(d)
            t8, _ = traverse_bvh8(bvh8, o, d, p0, e1, e2)
            tr, _, _, _ = intersect_tris_brute(o, d, p0, e1, e2)
            if np.isfinite(tr):
                hits += 1
            assert np.isclose(t8, tr, rtol=1e-4) or (np.isinf(t8) and np.isinf(tr))
        assert hits > 20
