"""PLY loader: ASCII and binary little/big endian with a typed element/property
schema (reference: Src/Assets/PLYLoader.cpp).

Vertex properties recognised: x/y/z, nx/ny/nz, u/v (or s/t, texture_u/
texture_v); face property: any list property (vertex_indices / vertex_index),
fan-triangulated.
"""

from __future__ import annotations

import numpy as np

from gpu_raytracer_tpu.scene.types import TriangleData

_TYPES = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}


class _Property:
    def __init__(self, name, dtype, is_list=False, count_dtype=None):
        self.name = name
        self.dtype = dtype
        self.is_list = is_list
        self.count_dtype = count_dtype


class _Element:
    def __init__(self, name, count):
        self.name = name
        self.count = count
        self.properties: list[_Property] = []


def load(filename: str) -> TriangleData:
    with open(filename, "rb") as f:
        raw = f.read()

    if not raw.startswith(b"ply"):
        raise ValueError(f"{filename}: not a PLY file")

    # --- header ---
    end = raw.index(b"end_header")
    header_end = raw.index(b"\n", end) + 1
    header = raw[:header_end].decode("ascii", errors="replace").splitlines()

    fmt = None
    elements: list[_Element] = []
    for line in header:
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            elements.append(_Element(parts[1], int(parts[2])))
        elif parts[0] == "property":
            if parts[1] == "list":
                prop = _Property(parts[4], _TYPES[parts[3]], True, _TYPES[parts[2]])
            else:
                prop = _Property(parts[2], _TYPES[parts[1]])
            elements[-1].properties.append(prop)

    body = raw[header_end:]
    if fmt == "ascii":
        data = _parse_ascii(body, elements)
    elif fmt in ("binary_little_endian", "binary_big_endian"):
        data = _parse_binary(body, elements, "<" if fmt == "binary_little_endian" else ">")
    else:
        raise ValueError(f"{filename}: unknown PLY format {fmt!r}")

    return _assemble(data)


def _parse_ascii(body: bytes, elements):
    tokens = body.split()
    pos = 0
    out = {}
    for elem in elements:
        scalars = {p.name: [] for p in elem.properties if not p.is_list}
        lists = {p.name: [] for p in elem.properties if p.is_list}
        for _ in range(elem.count):
            for p in elem.properties:
                if p.is_list:
                    n = int(tokens[pos]); pos += 1
                    lists[p.name].append([float(tokens[pos + i]) for i in range(n)])
                    pos += n
                else:
                    scalars[p.name].append(float(tokens[pos])); pos += 1
        out[elem.name] = (
            {k: np.asarray(v, np.float64) for k, v in scalars.items()},
            {k: v for k, v in lists.items()},
        )
    return out


def _parse_binary(body: bytes, elements, endian: str):
    out = {}
    offset = 0
    for elem in elements:
        has_list = any(p.is_list for p in elem.properties)
        if not has_list:
            dtype = np.dtype([(p.name, endian + p.dtype) for p in elem.properties])
            arr = np.frombuffer(body, dtype, count=elem.count, offset=offset)
            offset += dtype.itemsize * elem.count
            out[elem.name] = (
                {p.name: arr[p.name].astype(np.float64) for p in elem.properties},
                {},
            )
        else:
            # Mixed/list rows: walk row by row (faces are usually small counts).
            scalars = {p.name: [] for p in elem.properties if not p.is_list}
            lists = {p.name: [] for p in elem.properties if p.is_list}
            for _ in range(elem.count):
                for p in elem.properties:
                    if p.is_list:
                        cnt_dt = np.dtype(endian + p.count_dtype)
                        n = int(np.frombuffer(body, cnt_dt, 1, offset)[0])
                        offset += cnt_dt.itemsize
                        val_dt = np.dtype(endian + p.dtype)
                        vals = np.frombuffer(body, val_dt, n, offset)
                        offset += val_dt.itemsize * n
                        lists[p.name].append(vals.astype(np.float64).tolist())
                    else:
                        dt = np.dtype(endian + p.dtype)
                        scalars[p.name].append(float(np.frombuffer(body, dt, 1, offset)[0]))
                        offset += dt.itemsize
            out[elem.name] = (
                {k: np.asarray(v, np.float64) for k, v in scalars.items()},
                lists,
            )
    return out


def _assemble(data) -> TriangleData:
    if "vertex" not in data or "face" not in data:
        raise ValueError("PLY file missing vertex or face element")
    vscalar, _ = data["vertex"]
    _, flists = data["face"]

    pos = np.stack([vscalar["x"], vscalar["y"], vscalar["z"]], axis=-1).astype(np.float32)

    normals = None
    if all(k in vscalar for k in ("nx", "ny", "nz")):
        normals = np.stack([vscalar["nx"], vscalar["ny"], vscalar["nz"]], axis=-1).astype(np.float32)

    uvs = None
    for u_key, v_key in (("u", "v"), ("s", "t"), ("texture_u", "texture_v")):
        if u_key in vscalar and v_key in vscalar:
            uvs = np.stack([vscalar[u_key], vscalar[v_key]], axis=-1).astype(np.float32)
            break

    face_lists = None
    for key in ("vertex_indices", "vertex_index"):
        if key in flists:
            face_lists = flists[key]
            break
    if face_lists is None:  # take the first list property
        face_lists = next(iter(flists.values()))

    tri_idx = []
    for face in face_lists:
        idx = [int(i) for i in face]
        for i in range(1, len(idx) - 1):
            tri_idx += [idx[0], idx[i], idx[i + 1]]
    tri_idx = np.asarray(tri_idx, np.int64).reshape(-1, 3)

    return TriangleData(
        pos[tri_idx],
        normals[tri_idx] if normals is not None else None,
        uvs[tri_idx] if uvs is not None else None,
    )
