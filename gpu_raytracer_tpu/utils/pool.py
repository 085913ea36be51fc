"""Shared asset-loading thread pool (reference: Src/Util/ThreadPool.h:4-16 +
AssetManager.cpp:57-95 — every mesh/texture load and BVH build is a job).

Python threads are the right tool here because the hot loaders release the
GIL: OBJ/PLY parsing is numpy batch conversion, texture decode is PIL, and
the native C++ BVH builder is a ctypes call. Set GPU_RAYTRACER_THREADS=1 to
force serial loading (useful when debugging loader errors)."""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

_pool: Optional[ThreadPoolExecutor] = None


def get_pool() -> Optional[ThreadPoolExecutor]:
    """The process-wide loader pool, or None when serial loading is forced."""
    global _pool
    workers = int(os.environ.get("GPU_RAYTRACER_THREADS",
                                 str(min(os.cpu_count() or 4, 16))))
    if workers <= 1:
        return None
    if _pool is None:
        _pool = ThreadPoolExecutor(max_workers=workers,
                                   thread_name_prefix="asset-loader")
    return _pool


def submit(fn, *args):
    """Submit a job; returns a Future, or runs inline when serial."""
    pool = get_pool()
    if pool is None:
        from concurrent.futures import Future

        f = Future()
        try:
            f.set_result(fn(*args))
        except BaseException as exc:  # noqa: BLE001 — mirror Future semantics
            f.set_exception(exc)
        return f
    return pool.submit(fn, *args)
