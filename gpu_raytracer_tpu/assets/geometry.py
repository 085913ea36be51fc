"""Analytic primitive tessellators (reference: Src/Util/Geometry.cpp).

Each function returns a TriangleData already transformed into world space by a
4x4 (or 3x4) matrix, matching the reference's unit-shape conventions:
rectangle = XY quad in [-1,1]^2 facing +z, cube = [-1,1]^3, disk = unit circle
in the XY plane facing +z, sphere = unit icosphere, cylinder = unit radius
from z=0 to z=1.
"""

from __future__ import annotations

import numpy as np

from gpu_raytracer_tpu.scene.types import TriangleData


def _affine(transform: np.ndarray) -> np.ndarray:
    t = np.asarray(transform, np.float32)
    if t.shape == (4, 4):
        return t[:3, :]
    assert t.shape == (3, 4), t.shape
    return t


def _xform_pts(m: np.ndarray, pts: np.ndarray) -> np.ndarray:
    return pts @ m[:, :3].T + m[:, 3]


def _xform_normals(m: np.ndarray, normals: np.ndarray) -> np.ndarray:
    # Cofactor transform = inverse-transpose up to scale; normalise after.
    cof = np.linalg.inv(m[:, :3].astype(np.float64)).T.astype(np.float32)
    n = normals @ cof.T
    return n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)


def _build(m, tri_pos, tri_normals, tri_uvs) -> TriangleData:
    pos = _xform_pts(m, np.asarray(tri_pos, np.float32).reshape(-1, 3)).reshape(-1, 3, 3)
    nrm = _xform_normals(m, np.asarray(tri_normals, np.float32).reshape(-1, 3)).reshape(-1, 3, 3)
    return TriangleData(pos, nrm, np.asarray(tri_uvs, np.float32).reshape(-1, 3, 2))


def rectangle(transform) -> TriangleData:
    m = _affine(transform)
    v = np.array([[-1, 1, 0], [1, 1, 0], [1, -1, 0], [-1, -1, 0]], np.float32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    n = np.array([0, 0, 1], np.float32)
    tri_pos = [v[0], v[1], v[2], v[0], v[2], v[3]]
    tri_uv = [uv[0], uv[1], uv[2], uv[0], uv[2], uv[3]]
    tri_n = [n] * 6
    return _build(m, tri_pos, tri_n, tri_uv)


_CUBE_FACES = [  # (vertex indices, outward normal) matching the reference's winding
    ([0, 1, 2, 3], [0, 1, 0]),
    ([0, 1, 5, 4], [0, 0, -1]),
    ([1, 2, 6, 5], [1, 0, 0]),
    ([2, 3, 7, 6], [0, 0, 1]),
    ([3, 0, 4, 7], [-1, 0, 0]),
    ([4, 5, 6, 7], [0, -1, 0]),
]

_CUBE_VERTS = np.array(
    [
        [-1, 1, -1], [1, 1, -1], [1, 1, 1], [-1, 1, 1],
        [-1, -1, -1], [1, -1, -1], [1, -1, 1], [-1, -1, 1],
    ],
    np.float32,
)


def cube(transform) -> TriangleData:
    m = _affine(transform)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    tri_pos, tri_n, tri_uv = [], [], []
    for idx, n in _CUBE_FACES:
        quad = _CUBE_VERTS[idx]
        tri_pos += [quad[0], quad[1], quad[2], quad[0], quad[2], quad[3]]
        tri_n += [n] * 6
        tri_uv += [uv[0], uv[1], uv[2], uv[0], uv[2], uv[3]]
    return _build(m, tri_pos, tri_n, tri_uv)


def disk(transform, num_segments: int = 32) -> TriangleData:
    m = _affine(transform)
    theta = np.linspace(0.0, 2.0 * np.pi, num_segments + 1)
    ring = np.stack([np.cos(theta), np.sin(theta), np.zeros_like(theta)], axis=-1)
    center = np.zeros(3, np.float32)
    n = np.array([0, 0, 1], np.float32)
    tri_pos, tri_n, tri_uv = [], [], []
    for i in range(num_segments):
        a, b = ring[i], ring[i + 1]
        tri_pos += [center, a, b]
        tri_n += [n] * 3
        tri_uv += [
            [0.5, 0.5],
            [0.5 + 0.5 * a[0], 0.5 + 0.5 * a[1]],
            [0.5 + 0.5 * b[0], 0.5 + 0.5 * b[1]],
        ]
    return _build(m, tri_pos, tri_n, tri_uv)


def cylinder(transform, p0=None, p1=None, radius: float = 1.0, num_segments: int = 32) -> TriangleData:
    """Open-ended cylinder from p0 to p1 (reference: Geometry.cpp cylinder)."""
    m = _affine(transform)
    p0 = np.zeros(3, np.float32) if p0 is None else np.asarray(p0, np.float32)
    p1 = np.array([0, 0, 1], np.float32) if p1 is None else np.asarray(p1, np.float32)
    axis = p1 - p0
    length = np.linalg.norm(axis)
    axis = axis / max(length, 1e-20)
    # Build an orthonormal frame around the axis.
    helper = np.array([1, 0, 0], np.float32) if abs(axis[0]) < 0.9 else np.array([0, 1, 0], np.float32)
    u = np.cross(axis, helper)
    u /= np.linalg.norm(u)
    v = np.cross(axis, u)

    theta = np.linspace(0.0, 2.0 * np.pi, num_segments + 1)
    circle = (np.outer(np.cos(theta), u) + np.outer(np.sin(theta), v)) * radius
    bottom = p0[None] + circle
    top = bottom + axis[None] * length
    normals = circle / radius

    tri_pos, tri_n, tri_uv = [], [], []
    for i in range(num_segments):
        b0, b1, t0, t1 = bottom[i], bottom[i + 1], top[i], top[i + 1]
        n0, n1 = normals[i], normals[i + 1]
        s0, s1 = i / num_segments, (i + 1) / num_segments
        tri_pos += [b0, t0, t1, b0, t1, b1]
        tri_n += [n0, n0, n1, n0, n1, n1]
        tri_uv += [[s0, 0], [s0, 1], [s1, 1], [s0, 0], [s1, 1], [s1, 0]]
    return _build(m, tri_pos, tri_n, tri_uv)


def sphere(transform, num_subdivisions: int = 2) -> TriangleData:
    """Unit icosphere by midpoint subdivision (reference: Geometry.cpp sphere)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = [
        (0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
        (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
        (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
        (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1),
    ]
    verts = [v for v in verts]

    def midpoint(cache, i, j):
        key = (min(i, j), max(i, j))
        if key not in cache:
            mid = (verts[i] + verts[j]) * 0.5
            mid = mid / np.linalg.norm(mid)
            verts.append(mid)
            cache[key] = len(verts) - 1
        return cache[key]

    for _ in range(num_subdivisions):
        cache: dict = {}
        new_faces = []
        for a, b, c in faces:
            ab = midpoint(cache, a, b)
            bc = midpoint(cache, b, c)
            ca = midpoint(cache, c, a)
            new_faces += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
        faces = new_faces

    varr = np.asarray(verts, np.float32)
    tri_pos, tri_n, tri_uv = [], [], []
    for a, b, c in faces:
        for i in (a, b, c):
            p = varr[i]
            tri_pos.append(p)
            tri_n.append(p)  # unit sphere: normal == position
            tri_uv.append([
                0.5 + np.arctan2(p[2], p[0]) / (2 * np.pi),
                0.5 - np.arcsin(np.clip(p[1], -1, 1)) / np.pi,
            ])
    return _build(m := _affine(transform), tri_pos, tri_n, tri_uv)
