"""Affine transforms and quaternions (reference: Src/Math/Matrix4.h, Quaternion.h).

All transforms in the framework are (3, 4) float32 affine matrices — rotation/
scale in the left 3x3, translation in column 3 — matching the layout uploaded
to the traversal kernels (reference: Src/CUDA/Raytracing/Mesh.h `Matrix3x4`).
Full 4x4 projective matrices only appear in the camera and SVGF reprojection.
"""

from __future__ import annotations

import numpy as np


def identity() -> np.ndarray:
    return np.eye(3, 4, dtype=np.float32)


def translate(t) -> np.ndarray:
    m = identity()
    m[:, 3] = np.asarray(t, np.float32)
    return m


def scale(s) -> np.ndarray:
    s = np.asarray(s, np.float32)
    if s.ndim == 0:
        s = np.full(3, s, np.float32)
    m = identity()
    m[0, 0], m[1, 1], m[2, 2] = s
    return m


def from_quaternion(q: np.ndarray) -> np.ndarray:
    """Rotation matrix from quaternion (x, y, z, w)."""
    x, y, z, w = (float(v) for v in q)
    m = identity()
    m[:3, :3] = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        np.float32,
    )
    return m


def axis_angle(axis, angle_rad: float) -> np.ndarray:
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    half = angle_rad * 0.5
    q = np.array([*(axis * np.sin(half)), np.cos(half)], np.float32)
    return from_quaternion(q)


def quat_multiply(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return np.array(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        np.float32,
    )


def quat_axis_angle(axis, angle_rad: float) -> np.ndarray:
    axis = np.asarray(axis, np.float64)
    n = np.linalg.norm(axis)
    if n == 0:
        return np.array([0, 0, 0, 1], np.float32)
    axis = axis / n
    half = angle_rad * 0.5
    return np.array([*(axis * np.sin(half)), np.cos(half)], np.float32)


def quat_rotate(q: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Rotate vector v by quaternion q=(x,y,z,w)."""
    u = np.asarray(q[:3], np.float32)
    w = np.float32(q[3])
    v = np.asarray(v, np.float32)
    return 2.0 * np.dot(u, v) * u + (w * w - np.dot(u, u)) * v + 2.0 * w * np.cross(u, v)


def compose(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Affine composition: (a ∘ b)(x) = a(b(x))."""
    m = np.empty((3, 4), np.float32)
    m[:, :3] = a[:, :3] @ b[:, :3]
    m[:, 3] = a[:, :3] @ b[:, 3] + a[:, 3]
    return m


def trs(translation, rotation_quat, scale_factor) -> np.ndarray:
    """Translate ∘ Rotate ∘ Scale, the per-mesh instance transform
    (reference: Src/Renderer/Mesh.cpp:16-24)."""
    return compose(translate(translation), compose(from_quaternion(rotation_quat), scale(scale_factor)))


def invert(m: np.ndarray) -> np.ndarray:
    """Invert a (3, 4) affine matrix."""
    r_inv = np.linalg.inv(m[:, :3].astype(np.float64)).astype(np.float32)
    out = np.empty((3, 4), np.float32)
    out[:, :3] = r_inv
    out[:, 3] = -r_inv @ m[:, 3]
    return out


def transform_points(m: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Apply affine (3, 4) to (..., 3) points."""
    return pts @ m[:, :3].T + m[:, 3]


def transform_directions(m: np.ndarray, dirs: np.ndarray) -> np.ndarray:
    return dirs @ m[:, :3].T


def transform_normals(m_inv: np.ndarray, normals: np.ndarray) -> np.ndarray:
    """Normals transform by the inverse-transpose: pass the inverse matrix."""
    n = normals @ m_inv[:, :3]
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    return (n / np.maximum(norm, 1e-20)).astype(np.float32)


def max_scale(m: np.ndarray) -> float:
    """Largest row length of the linear part; bounds distance scaling
    (reference: Src/CUDA/Raytracing/Mesh.h mesh_get_scale)."""
    return float(np.max(np.linalg.norm(m[:, :3], axis=1)))


def is_identity(m: np.ndarray, epsilon: float = 1e-6) -> bool:
    """Epsilon identity check used to skip TLAS->BLAS ray transforms
    (reference: Src/Renderer/Mesh.cpp:35-46)."""
    return bool(np.all(np.abs(m - identity()) < epsilon))


def look_rotation(forward, up) -> np.ndarray:
    """Quaternion (x,y,z,w) rotating +z onto `forward` with `up` hint
    (reference: Src/Math/Quaternion.h:38-67 — note the reference camera then
    asks for the rotation of M*(0,0,-1) so its own -z forward convention and
    Mitsuba's +z convention cancel; see MitsubaLoader sensor handling)."""
    f = np.asarray(forward, np.float64)
    f = f / np.linalg.norm(f)
    u = np.asarray(up, np.float64)
    r = np.cross(u, f)
    norm_r = np.linalg.norm(r)
    if norm_r < 1e-12:  # forward parallel to up: pick any perpendicular
        r = np.cross(np.array([1.0, 0.0, 0.0]), f)
        norm_r = np.linalg.norm(r)
        if norm_r < 1e-12:
            r = np.cross(np.array([0.0, 0.0, 1.0]), f)
            norm_r = np.linalg.norm(r)
    r = r / norm_r
    u2 = np.cross(f, r)
    m = np.stack([r, u2, f], axis=1)  # columns: R @ (0,0,1) = f
    return _quat_from_matrix(m)


def _quat_from_matrix(m: np.ndarray) -> np.ndarray:
    t = np.trace(m)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (m[2, 1] - m[1, 2]) / s
        y = (m[0, 2] - m[2, 0]) / s
        z = (m[1, 0] - m[0, 1]) / s
    elif m[0, 0] > m[1, 1] and m[0, 0] > m[2, 2]:
        s = np.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2
        w = (m[2, 1] - m[1, 2]) / s
        x = 0.25 * s
        y = (m[0, 1] + m[1, 0]) / s
        z = (m[0, 2] + m[2, 0]) / s
    elif m[1, 1] > m[2, 2]:
        s = np.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2
        w = (m[0, 2] - m[2, 0]) / s
        x = (m[0, 1] + m[1, 0]) / s
        y = 0.25 * s
        z = (m[1, 2] + m[2, 1]) / s
    else:
        s = np.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2
        w = (m[1, 0] - m[0, 1]) / s
        x = (m[0, 2] + m[2, 0]) / s
        y = (m[1, 2] + m[2, 1]) / s
        z = 0.25 * s
    q = np.array([x, y, z, w], np.float32)
    return q / np.linalg.norm(q)
