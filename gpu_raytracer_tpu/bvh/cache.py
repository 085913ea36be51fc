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
                      cache_dir: Optional[str] = None) -> BVH2:
    """SAH build + collapse with disk caching. Prefers the native C++
    builder (native/bvh_builder.cpp, the reference's C++-toolchain analog)
    and falls back to the pure-Python builder."""
    from gpu_raytracer_tpu.bvh import build_bvh2, collapse
    from gpu_raytracer_tpu.bvh import native

    key = content_key(triangles, sah_cost_node, sah_cost_leaf, max_leaf_size)
    if not force_rebuild:
        cached = try_load(key, cache_dir)
        if cached is not None:
            return cached
    mn, mx = triangles.aabbs()
    bvh = native.build_sah_collapsed(mn, mx, triangles.centroids(),
                                     sah_cost_node, sah_cost_leaf, max_leaf_size)
    if bvh is None:
        bvh = build_bvh2(triangles, sah_cost_node, sah_cost_leaf)
        bvh = collapse(bvh, sah_cost_node, sah_cost_leaf, max_leaf_size)
    save(key, bvh, cache_dir)
    return bvh
