"""Mitsuba hair loader: binary ("BINARY_HAIR") and ASCII polyline strands
tessellated into tapering camera-less ribbons (reference: Src/Assets/Mitsuba/
MitshairLoader.cpp:10-123).

Each strand becomes a ribbon of two triangles per segment, with width `radius`
at the root linearly tapering to zero at the tip, and a per-strand random
twist angle around the strand direction. Zero-length shading normals make
TriangleData substitute geometric normals, matching the reference which emits
Vector3(0) normals and relies on the Triangle constructor fix-up.
"""

from __future__ import annotations

import struct

import numpy as np

from gpu_raytracer_tpu.scene.types import TriangleData


def load(filename: str, radius: float = 0.0025) -> TriangleData:
    with open(filename, "rb") as f:
        raw = f.read()

    strands = []
    if raw.startswith(b"BINARY_HAIR"):
        pos = len(b"BINARY_HAIR")
        (num_vertices,) = struct.unpack_from("<I", raw, pos)
        pos += 4
        floats = np.frombuffer(raw, "<f4", offset=pos)
        # +INF x marks the start of a new strand; a strand is a flat xyz run.
        strands = _split_binary(floats)
    else:
        current = []
        for line in raw.decode("ascii", errors="replace").splitlines():
            if not line.strip():
                if current:
                    strands.append(np.asarray(current, np.float32))
                    current = []
            else:
                current.append([float(v) for v in line.split()[:3]])
        if current:
            strands.append(np.asarray(current, np.float32))

    rng = np.random.default_rng(abs(hash(filename)) % (2**32))
    tris = []
    for strand in strands:
        if len(strand) < 2:
            continue
        angle = np.pi * rng.random()
        d0 = _normalize(strand[1] - strand[0])
        orth = _rotate_about(_orthogonal(d0), d0, angle)
        prev_begin = strand[0] + radius * orth
        prev_end = strand[0] - radius * orth
        n = len(strand)
        for v in range(1, n):
            d = _normalize(strand[v] - strand[v - 1])
            if np.any(np.isnan(d)):
                o = np.array([1.0, 0.0, 0.0], np.float32)
            else:
                o = _rotate_about(_orthogonal(d), d, angle)
            r = radius * (1.0 - v / (n - 1))
            curr_begin = strand[v] + r * o
            curr_end = strand[v] - r * o
            tris.append([prev_begin, prev_end, curr_begin])
            tris.append([prev_end, curr_end, curr_begin])
            prev_begin, prev_end = curr_begin, curr_end

    if not tris:
        dummy = np.zeros((1, 3, 3), np.float32)
        dummy[0, 1, 0] = 1e-6
        dummy[0, 2, 1] = 1e-6
        return TriangleData(dummy)

    positions = np.asarray(tris, np.float32)
    uvs = np.broadcast_to(
        np.array([[0, 0], [1, 0], [0, 1]], np.float32), (len(tris), 3, 2)
    ).copy()
    return TriangleData(positions, None, uvs)


def _split_binary(floats: np.ndarray):
    strands = []
    current = []
    i = 0
    n = len(floats)
    while i < n:
        x = floats[i]
        if np.isinf(x):
            if current:
                strands.append(np.asarray(current, np.float32))
                current = []
            i += 1
        else:
            if i + 2 >= n:
                break
            current.append([x, floats[i + 1], floats[i + 2]])
            i += 3
    if current:
        strands.append(np.asarray(current, np.float32))
    return strands


def _normalize(v: np.ndarray) -> np.ndarray:
    return v / np.linalg.norm(v)


def _orthogonal(v: np.ndarray) -> np.ndarray:
    """Any unit vector orthogonal to v (reference: Src/Math/Math.h orthogonal)."""
    if abs(v[0]) <= abs(v[1]) and abs(v[0]) <= abs(v[2]):
        o = np.array([0.0, -v[2], v[1]], np.float32)
    elif abs(v[1]) <= abs(v[2]):
        o = np.array([-v[2], 0.0, v[0]], np.float32)
    else:
        o = np.array([-v[1], v[0], 0.0], np.float32)
    return _normalize(o)


def _rotate_about(v: np.ndarray, axis: np.ndarray, angle: float) -> np.ndarray:
    """Rodrigues rotation of v around unit axis."""
    c, s = np.cos(angle), np.sin(angle)
    return (v * c + np.cross(axis, v) * s + axis * np.dot(axis, v) * (1 - c)).astype(np.float32)
