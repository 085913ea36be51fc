"""ctypes bindings for the native C++ BVH builder (native/bvh_builder.cpp).

Compiled on first use with g++ into the cache directory; every entry point
falls back to the pure-Python builders if the toolchain or compile is
unavailable, so the framework never hard-depends on native code.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from gpu_raytracer_tpu.bvh.types import BVH2

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "bvh_builder.cpp")
_SO = os.path.join(_REPO_ROOT, ".cache", "libbvh_builder.so")

_lib = None
_lib_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            os.makedirs(os.path.dirname(_SO), exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", _SRC, "-o", _SO],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.build_sah_bvh.restype = ctypes.c_int
        lib.build_sah_bvh.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        _lib = lib
    except Exception as exc:  # toolchain missing / compile error: fallback
        print(f"WARNING: native BVH builder unavailable ({exc}); "
              f"using the Python builder")
        _lib_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def build_sah_collapsed(aabb_min: np.ndarray, aabb_max: np.ndarray,
                        centroids: np.ndarray, sah_cost_node: float,
                        sah_cost_leaf: float, max_leaf_size: int) -> Optional[BVH2]:
    """Native SAH build + collapse. Returns None if native is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = int(aabb_min.shape[0])
    aabb_min = np.ascontiguousarray(aabb_min, np.float32)
    aabb_max = np.ascontiguousarray(aabb_max, np.float32)
    centroids = np.ascontiguousarray(centroids, np.float32)

    max_nodes = 2 * n
    out_min = np.empty((max_nodes, 3), np.float32)
    out_max = np.empty((max_nodes, 3), np.float32)
    out_left = np.empty(max_nodes, np.int32)
    out_count = np.empty(max_nodes, np.int32)
    out_indices = np.empty(n, np.int32)

    count = lib.build_sah_bvh(
        aabb_min.ctypes.data, aabb_max.ctypes.data, centroids.ctypes.data, n,
        ctypes.c_float(sah_cost_node), ctypes.c_float(sah_cost_leaf),
        max_leaf_size,
        out_min.ctypes.data, out_max.ctypes.data,
        out_left.ctypes.data, out_count.ctypes.data, out_indices.ctypes.data)
    if count <= 0:
        return None
    return BVH2(
        node_min=out_min[:count].copy(), node_max=out_max[:count].copy(),
        node_left=out_left[:count].copy(), node_count=out_count[:count].copy(),
        node_axis=np.zeros(count, np.int8), indices=out_indices,
    )
