"""BLAS disk cache (reference: Src/Assets/BVHLoader.cpp:19-260).

The reference writes `<mesh>.bvh` sidecars (miniz DEFLATE, header validated
against builder settings and source mtime). Here the cache is a compressed
npz keyed by a content hash of the triangle data plus the builder
configuration — content addressing subsumes the mtime check and makes the
cache safe for procedurally generated meshes too.
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional

import numpy as np

from gpu_raytracer_tpu.bvh.types import BVH2

CACHE_VERSION = 1

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".cache", "bvh")


def content_key(triangles, sah_cost_node: float, sah_cost_leaf: float,
                max_leaf_size: int, builder: str = "sah") -> str:
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(triangles.positions).tobytes())
    h.update(f"v{CACHE_VERSION}|{builder}|{sah_cost_node}|{sah_cost_leaf}|"
             f"{max_leaf_size}".encode())
    return h.hexdigest()[:24]


def try_load(key: str, cache_dir: Optional[str] = None) -> Optional[BVH2]:
    path = os.path.join(cache_dir or _DEFAULT_DIR, key + ".npz")
    if not os.path.exists(path):
        return None
    try:
        data = np.load(path)
        return BVH2(node_min=data["node_min"], node_max=data["node_max"],
                    node_left=data["node_left"], node_count=data["node_count"],
                    node_axis=data["node_axis"], indices=data["indices"])
    except Exception:
        return None  # corrupt cache entry: rebuild


def save(key: str, bvh: BVH2, cache_dir: Optional[str] = None) -> None:
    directory = cache_dir or _DEFAULT_DIR
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, key + ".npz")
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, node_min=bvh.node_min, node_max=bvh.node_max,
                        node_left=bvh.node_left, node_count=bvh.node_count,
                        node_axis=bvh.node_axis, indices=bvh.indices)
    os.replace(tmp, path)


def build_blas_cached(triangles, sah_cost_node: float = 4.0,
                      sah_cost_leaf: float = 1.0, max_leaf_size: int = 4,
                      force_rebuild: bool = False,
                      cache_dir: Optional[str] = None,
                      builder: str = "sah",
                      sbvh_alpha: float = 1e-4,
                      optimize_tree: bool = False,
                      optimize_max_batches: int = 1000,
                      optimize_max_time_ms: int = 60_000) -> BVH2:
    """BLAS pipeline with disk caching, mirroring the reference's
    (S)BVH2 -> [optimize] -> collapse chain (AssetManager.cpp:57-95).
    builder: "sah" (full-sweep object splits; prefers the native C++
    implementation) or "sbvh" (spatial splits, Python)."""
    from gpu_raytracer_tpu.bvh import build_bvh2, collapse
    from gpu_raytracer_tpu.bvh import native

    tag = f"{builder}a{sbvh_alpha}" if builder == "sbvh" else builder
    if optimize_tree:
        tag += f"|opt{optimize_max_batches}"
    key = content_key(triangles, sah_cost_node, sah_cost_leaf, max_leaf_size,
                      builder=tag)
    if not force_rebuild:
        cached = try_load(key, cache_dir)
        if cached is not None:
            return cached
    if builder == "sbvh":
        from gpu_raytracer_tpu.bvh.sbvh import SBVHBuilder

        bvh = SBVHBuilder(sah_cost_node, sah_cost_leaf, sbvh_alpha).build(triangles)
    else:
        mn, mx = triangles.aabbs()
        bvh = None
        if not optimize_tree:
            # Fast path: the native builder emits the collapsed tree directly.
            bvh = native.build_sah_collapsed(mn, mx, triangles.centroids(),
                                             sah_cost_node, sah_cost_leaf,
                                             max_leaf_size)
            if bvh is not None:
                save(key, bvh, cache_dir)
                return bvh
        bvh = build_bvh2(triangles, sah_cost_node, sah_cost_leaf)
    if optimize_tree:
        from gpu_raytracer_tpu.bvh.optimize import optimize

        bvh = optimize(bvh, optimize_max_batches, optimize_max_time_ms)
    bvh = collapse(bvh, sah_cost_node, sah_cost_leaf, max_leaf_size)
    save(key, bvh, cache_dir)
    return bvh
