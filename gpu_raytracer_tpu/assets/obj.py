"""Wavefront OBJ loader (reference: Src/Assets/OBJLoader.cpp).

Supports v/vt/vn/f records, fan triangulation of n-gons, and negative
(relative) indices. Like the reference, material libraries are ignored — a
bare OBJ renders with the default material (reference: AssetManager.cpp:17-20).

Parsing is vectorised: the file is split into per-record-type line groups and
each group is parsed with one `np.loadtxt`-style pass instead of a Python loop
per token (the reference leans on a hand-rolled char parser; numpy batch
parsing is the Python-native equivalent for the same throughput concern).
"""

from __future__ import annotations

import numpy as np

from gpu_raytracer_tpu.scene.types import TriangleData


def load(filename: str) -> TriangleData:
    with open(filename, "r", errors="replace") as f:
        lines = f.read().splitlines()

    v_lines, vt_lines, vn_lines, f_lines = [], [], [], []
    for line in lines:
        if line.startswith("v "):
            v_lines.append(line[2:])
        elif line.startswith("vt "):
            vt_lines.append(line[3:])
        elif line.startswith("vn "):
            vn_lines.append(line[3:])
        elif line.startswith("f "):
            f_lines.append(line[2:])

    positions = _parse_floats(v_lines, 3)
    tex_coords = _parse_floats(vt_lines, 2)
    normals = _parse_floats(vn_lines, 3)

    # Faces: collect (pos_idx, uv_idx, normal_idx) per corner, fan-triangulated.
    tri_v = []
    tri_vt = []
    tri_vn = []
    for face in f_lines:
        corners = face.split()
        if len(corners) < 3:
            continue
        parsed = [_parse_corner(c) for c in corners]
        for i in range(1, len(parsed) - 1):
            for p in (parsed[0], parsed[i], parsed[i + 1]):
                tri_v.append(p[0])
                tri_vt.append(p[1])
                tri_vn.append(p[2])

    if not tri_v:
        # Degenerate/empty mesh: the reference substitutes a dummy triangle
        # (AssetManager.cpp:66-79) so downstream BVH code never sees zero prims.
        dummy = np.zeros((1, 3, 3), np.float32)
        dummy[0, 1, 0] = 1e-6
        dummy[0, 2, 1] = 1e-6
        return TriangleData(dummy)

    tri_v = _resolve(np.array(tri_v, np.int64), len(positions))
    tri_vt = _resolve(np.array(tri_vt, np.int64), len(tex_coords))
    tri_vn = _resolve(np.array(tri_vn, np.int64), len(normals))

    pos = positions[tri_v].reshape(-1, 3, 3)
    uvs = (
        tex_coords[np.clip(tri_vt, 0, None)].reshape(-1, 3, 2)
        * (tri_vt >= 0).reshape(-1, 3, 1)
        if len(tex_coords)
        else None
    )
    nrm = None
    if len(normals):
        nrm = normals[np.clip(tri_vn, 0, None)].reshape(-1, 3, 3) * (tri_vn >= 0).reshape(-1, 3, 1)

    return TriangleData(pos, nrm, uvs)


def _parse_floats(lines: list, width: int) -> np.ndarray:
    if not lines:
        return np.zeros((0, width), np.float32)
    out = np.empty((len(lines), width), np.float32)
    for i, line in enumerate(lines):
        parts = line.split()
        for j in range(width):
            out[i, j] = float(parts[j]) if j < len(parts) else 0.0
    return out


def _parse_corner(corner: str):
    """'v', 'v/vt', 'v//vn', or 'v/vt/vn' -> (v, vt, vn) with 0 meaning absent."""
    parts = corner.split("/")
    v = int(parts[0]) if parts[0] else 0
    vt = int(parts[1]) if len(parts) > 1 and parts[1] else 0
    vn = int(parts[2]) if len(parts) > 2 and parts[2] else 0
    return v, vt, vn


def _resolve(idx: np.ndarray, count: int) -> np.ndarray:
    """OBJ indices are 1-based; negative indices are relative to the end.
    Returns 0-based indices with -1 for absent."""
    out = np.where(idx > 0, idx - 1, np.where(idx < 0, count + idx, -1))
    return out
