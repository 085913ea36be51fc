"""BVH builder tests: structural invariants, SAH sanity, and traversal vs
brute-force oracle on random rays (SURVEY.md §4 test strategy)."""

import os

import numpy as np
import pytest

from gpu_raytracer_tpu.assets import geometry
from gpu_raytracer_tpu.bvh import BVH2, BVHStats, build_bvh2, collapse
from gpu_raytracer_tpu.bvh.cpu_trace import (
    edge_form,
    intersect_tris_brute,
    traverse_bvh2,
)
from gpu_raytracer_tpu.scene.types import TriangleData


def random_triangles(n: int, seed: int = 0, spread: float = 10.0) -> TriangleData:
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-spread, spread, (n, 1, 3))
    offsets = rng.standard_normal((n, 3, 3)) * 0.5
    return TriangleData((centers + offsets).astype(np.float32))


class TestSAHBuilder:
    def test_structure_valid(self):
        tris = random_triangles(257)
        bvh = build_bvh2(tris)
        bvh.validate()
        assert bvh.num_prims == 257
        # 1-triangle leaves by default (reference SAHBuilder.cpp:14-22)
        assert np.all(bvh.node_count[bvh.node_count > 0] == 1)

    def test_single_triangle(self):
        bvh = build_bvh2(random_triangles(1))
        bvh.validate()
        assert bvh.num_nodes == 1 and bvh.node_count[0] == 1

    def test_duplicate_centroids(self):
        # All triangles identical: the builder must still terminate.
        pos = np.tile(np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32), (33, 1, 1))
        bvh = build_bvh2(TriangleData(pos))
        bvh.validate()

    def test_sah_cost_beats_median_split(self):
        # Clustered geometry: SAH should produce a much cheaper tree than a
        # trivial flat split of the same primitives into two halves.
        tris = random_triangles(512, seed=3, spread=100.0)
        bvh = build_bvh2(tris)
        stats = BVHStats.of(bvh)
        assert stats.sah_cost < 512  # far cheaper than a root-leaf (n*c_leaf)
        assert stats.max_depth < 64

    def test_leaf_aabbs_contain_triangles(self):
        tris = random_triangles(64, seed=1)
        bvh = build_bvh2(tris)
        mn, mx = tris.aabbs()
        for node in range(bvh.num_nodes):
            count = bvh.node_count[node]
            if count == 0:
                continue
            first = bvh.node_left[node]
            prim_ids = bvh.indices[first:first + count]
            assert np.all(mn[prim_ids] >= bvh.node_min[node] - 1e-5)
            assert np.all(mx[prim_ids] <= bvh.node_max[node] + 1e-5)


class TestCollapse:
    def test_collapse_reduces_nodes_keeps_coverage(self):
        tris = random_triangles(300, seed=2)
        bvh = build_bvh2(tris)
        collapsed = collapse(bvh, max_leaf_size=8)
        collapsed.validate()
        assert collapsed.num_nodes < bvh.num_nodes
        assert np.all(collapsed.node_count <= 8)
        # SAH cost must not increase (reference collapse is cost-driven).
        assert collapsed.sah_cost() <= bvh.sah_cost() + 1e-6

    def test_collapse_traversal_equivalent(self):
        tris = random_triangles(128, seed=7)
        bvh = build_bvh2(tris)
        collapsed = collapse(bvh, max_leaf_size=4)
        ordered = tris.select(bvh.indices)
        p0, e1, e2 = edge_form(ordered)
        rng = np.random.default_rng(11)
        for _ in range(50):
            o = rng.uniform(-15, 15, 3).astype(np.float32)
            d = rng.standard_normal(3).astype(np.float32)
            d /= np.linalg.norm(d)
            t_a, _, _, _ = traverse_bvh2(bvh, o, d, p0, e1, e2)
            t_b, _, _, _ = traverse_bvh2(collapsed, o, d, p0, e1, e2)
            assert t_a == pytest.approx(t_b, abs=1e-5) or (np.isinf(t_a) and np.isinf(t_b))


class TestTraversalOracle:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_bvh_matches_brute_force(self, seed):
        tris = random_triangles(200, seed=seed)
        bvh = build_bvh2(tris)
        ordered = tris.select(bvh.indices)
        p0, e1, e2 = edge_form(ordered)
        rng = np.random.default_rng(100 + seed)
        centroids = ordered.centroids()
        hits = 0
        for _ in range(100):
            o = rng.uniform(-12, 12, 3).astype(np.float32)
            # Aim at a random triangle's centroid (with jitter) so a healthy
            # fraction of rays actually hit something.
            target = centroids[rng.integers(len(centroids))]
            d = (target - o + rng.standard_normal(3) * 0.3).astype(np.float32)
            d /= np.linalg.norm(d)
            t_ref, tri_ref, _, _ = intersect_tris_brute(o, d, p0, e1, e2)
            t_bvh, tri_bvh, _, _ = traverse_bvh2(bvh, o, d, p0, e1, e2)
            if tri_ref >= 0:
                hits += 1
                assert t_bvh == pytest.approx(t_ref, rel=1e-5)
                assert tri_bvh == tri_ref
            else:
                assert tri_bvh == -1
        assert hits > 10  # the test must actually exercise hits

    def test_cornell_walls(self):
        # Axis-aligned ray into the cornell-style rectangle must hit at z=0.
        rect = geometry.rectangle(np.eye(4, dtype=np.float32))
        bvh = build_bvh2(rect)
        ordered = rect.select(bvh.indices)
        p0, e1, e2 = edge_form(ordered)
        t, tri, _, _ = traverse_bvh2(bvh, np.array([0.3, -0.2, 5.0], np.float32),
                                     np.array([0.0, 0.0, -1.0], np.float32), p0, e1, e2)
        assert t == pytest.approx(5.0, rel=1e-5)
        assert tri >= 0
