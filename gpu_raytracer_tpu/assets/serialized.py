"""Mitsuba `.serialized` mesh loader (reference: Src/Assets/Mitsuba/
SerializedLoader.cpp:9-221).

Format: 0x041c magic + uint16 version, zlib-deflated per-shape streams, an
end-of-file dictionary of mesh offsets (32-bit for version <= 3, 64-bit
after), and per-mesh flags for normals/uvs/colours/face-normals/precision.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from gpu_raytracer_tpu.scene.types import TriangleData

FLAG_HAS_NORMALS = 0x0001
FLAG_HAS_TEX_COORDS = 0x0002
FLAG_HAS_COLOURS = 0x0008
FLAG_USE_FACE_NORMALS = 0x0010
FLAG_SINGLE_PRECISION = 0x1000
FLAG_DOUBLE_PRECISION = 0x2000


def load(filename: str, shape_index: int = 0) -> TriangleData:
    with open(filename, "rb") as f:
        raw = f.read()

    magic, version = struct.unpack_from("<HH", raw, 0)
    if magic != 0x041C:
        raise ValueError(f"{filename}: bad serialized magic {magic:#06x}")

    (num_meshes,) = struct.unpack_from("<I", raw, len(raw) - 4)
    if version <= 3:
        dict_offset = len(raw) - 4 - num_meshes * 4
        offsets = list(struct.unpack_from(f"<{num_meshes}I", raw, dict_offset))
    else:
        dict_offset = len(raw) - 4 - num_meshes * 8
        offsets = list(struct.unpack_from(f"<{num_meshes}Q", raw, dict_offset))
    offsets.append(dict_offset)

    if not (0 <= shape_index < num_meshes):
        raise ValueError(f"{filename}: shape index {shape_index} out of range ({num_meshes} meshes)")

    # Each stream starts with its own 4-byte (magic, version) header; skip it.
    start = offsets[shape_index] + 4
    end = offsets[shape_index + 1]
    data = zlib.decompress(raw[start:end])

    pos = 0
    (flags,) = struct.unpack_from("<I", data, pos)
    pos += 4

    single = bool(flags & FLAG_SINGLE_PRECISION)
    double = bool(flags & FLAG_DOUBLE_PRECISION)
    if version <= 3:
        single, double = True, False
    else:
        # Null-terminated mesh name.
        name_end = data.index(b"\x00", pos)
        pos = name_end + 1
    if not (single or double):
        raise ValueError(f"{filename}: neither single nor double precision flagged")

    num_vertices, num_triangles = struct.unpack_from("<QQ", data, pos)
    pos += 16
    if num_vertices == 0 or num_triangles == 0:
        dummy = np.zeros((1, 3, 3), np.float32)
        dummy[0, 1, 0] = 1e-6
        dummy[0, 2, 1] = 1e-6
        return TriangleData(dummy)

    elem = np.dtype("<f4") if single else np.dtype("<f8")

    def take(count):
        nonlocal pos
        arr = np.frombuffer(data, elem, count, pos)
        pos += count * elem.itemsize
        return arr.astype(np.float32)

    positions = take(num_vertices * 3).reshape(-1, 3)
    normals = None
    if flags & FLAG_HAS_NORMALS:
        normals = take(num_vertices * 3).reshape(-1, 3)
    uvs = None
    if flags & FLAG_HAS_TEX_COORDS:
        uvs = take(num_vertices * 2).reshape(-1, 2)
    if flags & FLAG_HAS_COLOURS:
        take(num_vertices * 3)  # unused

    idx_dtype = np.dtype("<u4") if num_vertices <= 0xFFFFFFFF else np.dtype("<u8")
    indices = np.frombuffer(data, idx_dtype, num_triangles * 3, pos).astype(np.int64).reshape(-1, 3)

    tri_pos = positions[indices]
    tri_nrm = None
    if flags & FLAG_USE_FACE_NORMALS:
        tri_nrm = None  # TriangleData derives geometric normals itself
    elif normals is not None:
        tri_nrm = normals[indices]
    tri_uv = uvs[indices] if uvs is not None else None

    return TriangleData(tri_pos, tri_nrm, tri_uv)
