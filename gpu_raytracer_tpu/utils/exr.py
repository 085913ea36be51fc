"""Minimal OpenEXR scanline IO in pure Python.

The reference exports HDR via the vendored tinyexr library (Src/Exporters/
EXRExporter.cpp:10-59); no EXR library is available in this environment, so
this implements the subset of the format the framework needs:

  write: scanline float32 or half, RGB(A), ZIP compressed (or none)
  read : scanline float32/half RGB(A), NONE/ZIPS/ZIP compression

Enough to round-trip our own output, read golden images, and load .exr
environment maps.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = 20000630
PIXELTYPE_HALF = 1
PIXELTYPE_FLOAT = 2
COMPRESSION_NONE = 0
COMPRESSION_ZIPS = 2   # 1 scanline per block
COMPRESSION_ZIP = 3    # 16 scanlines per block


def _attr(name: bytes, type_: bytes, data: bytes) -> bytes:
    return name + b"\x00" + type_ + b"\x00" + struct.pack("<i", len(data)) + data


def write_exr(filename: str, image: np.ndarray, half: bool = True,
              compress: bool = True) -> None:
    """image: (H, W, 3|4) float array, top-down raster order."""
    img = np.asarray(image, np.float32)
    H, W = img.shape[:2]
    C = img.shape[2] if img.ndim == 3 else 1
    if img.ndim == 2:
        img = img[:, :, None]
    channel_names = {1: ["Y"], 3: ["B", "G", "R"], 4: ["A", "B", "G", "R"]}[C]
    src_index = {1: [0], 3: [2, 1, 0], 4: [3, 2, 1, 0]}[C]
    ptype = PIXELTYPE_HALF if half else PIXELTYPE_FLOAT
    dtype = np.float16 if half else np.float32

    chlist = b""
    for name in channel_names:  # already alphabetical
        chlist += name.encode() + b"\x00" + struct.pack("<i", ptype) + b"\x00\x00\x00\x00" \
            + struct.pack("<ii", 1, 1)
    chlist += b"\x00"

    compression = COMPRESSION_ZIP if compress else COMPRESSION_NONE
    lines_per_block = 16 if compress else 1

    header = b""
    header += _attr(b"channels", b"chlist", chlist)
    header += _attr(b"compression", b"compression", struct.pack("<B", compression))
    header += _attr(b"dataWindow", b"box2i", struct.pack("<4i", 0, 0, W - 1, H - 1))
    header += _attr(b"displayWindow", b"box2i", struct.pack("<4i", 0, 0, W - 1, H - 1))
    header += _attr(b"lineOrder", b"lineOrder", struct.pack("<B", 0))
    header += _attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
    header += _attr(b"screenWindowCenter", b"v2f", struct.pack("<2f", 0.0, 0.0))
    header += _attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
    header += b"\x00"

    preamble = struct.pack("<I", MAGIC) + struct.pack("<I", 2) + header

    num_blocks = (H + lines_per_block - 1) // lines_per_block
    offset_table_pos = len(preamble)
    data_start = offset_table_pos + 8 * num_blocks

    blocks = []
    for b in range(num_blocks):
        y0 = b * lines_per_block
        rows = min(lines_per_block, H - y0)
        # Block payload: per scanline, per channel (alphabetical), W values.
        raw = b"".join(
            img[y0 + r, :, src_index[c]].astype(dtype).tobytes()
            for r in range(rows)
            for c in range(len(channel_names))
        )
        if compress:
            packed = _zip_compress(raw)
            if len(packed) >= len(raw):
                packed = raw  # EXR rule: store raw when zip doesn't shrink
        else:
            packed = raw
        blocks.append(struct.pack("<ii", y0, len(packed)) + packed)

    offsets = []
    pos = data_start
    for blk in blocks:
        offsets.append(pos)
        pos += len(blk)

    with open(filename, "wb") as f:
        f.write(preamble)
        f.write(struct.pack(f"<{num_blocks}Q", *offsets))
        for blk in blocks:
            f.write(blk)


def read_exr(filename: str) -> np.ndarray:
    """-> (H, W, C) float32, channels in R,G,B[,A] order (Y -> 1 channel)."""
    with open(filename, "rb") as f:
        raw = f.read()

    magic, version = struct.unpack_from("<Ii", raw, 0)
    if magic != MAGIC:
        raise ValueError(f"{filename}: not an EXR file")
    if version & 0x200:
        raise ValueError(f"{filename}: tiled EXR not supported")

    pos = 8
    attrs = {}
    while raw[pos] != 0:
        name_end = raw.index(b"\x00", pos)
        name = raw[pos:name_end].decode()
        pos = name_end + 1
        type_end = raw.index(b"\x00", pos)
        pos = type_end + 1
        (size,) = struct.unpack_from("<i", raw, pos)
        pos += 4
        attrs[name] = raw[pos:pos + size]
        pos += size
    pos += 1  # header terminator

    # Channels
    chdata = attrs["channels"]
    channels = []
    cpos = 0
    while chdata[cpos] != 0:
        cname_end = chdata.index(b"\x00", cpos)
        cname = chdata[cpos:cname_end].decode()
        cpos = cname_end + 1
        ptype, = struct.unpack_from("<i", chdata, cpos)
        cpos += 4 + 4 + 8  # type + pLinear/reserved + sampling
        channels.append((cname, ptype))

    x0, y0, x1, y1 = struct.unpack_from("<4i", attrs["dataWindow"], 0)
    W = x1 - x0 + 1
    H = y1 - y0 + 1
    compression = attrs["compression"][0]
    if compression == COMPRESSION_NONE:
        lines_per_block = 1
    elif compression == COMPRESSION_ZIPS:
        lines_per_block = 1
    elif compression == COMPRESSION_ZIP:
        lines_per_block = 16
    else:
        raise ValueError(f"{filename}: unsupported EXR compression {compression}")

    num_blocks = (H + lines_per_block - 1) // lines_per_block
    offsets = struct.unpack_from(f"<{num_blocks}Q", raw, pos)

    out = {name: np.empty((H, W), np.float32) for name, _ in channels}
    bytes_per = {PIXELTYPE_HALF: 2, PIXELTYPE_FLOAT: 4}
    for off in offsets:
        y, size = struct.unpack_from("<ii", raw, off)
        payload = raw[off + 8: off + 8 + size]
        rows = min(lines_per_block, y1 - y + 1)
        expected = rows * W * sum(bytes_per[pt] for _, pt in channels)
        if compression != COMPRESSION_NONE and size != expected:
            payload = _zip_decompress(payload, expected)
        p = 0
        for r in range(rows):
            for cname, ptype in channels:
                n = W * bytes_per[ptype]
                dt = np.float16 if ptype == PIXELTYPE_HALF else np.float32
                out[cname][y - y0 + r] = np.frombuffer(payload, dt, W, p).astype(np.float32)
                p += n

    order = [c for c in ("R", "G", "B", "A") if c in out] or list(out)
    return np.stack([out[c] for c in order], axis=-1)


# --- EXR zip predictor + interleave (OpenEXR ImfZip) ---

def _zip_compress(raw: bytes) -> bytes:
    data = np.frombuffer(raw, np.uint8).astype(np.int16)
    half = (len(data) + 1) // 2
    # interleave split: even bytes -> first half, odd bytes -> second half
    reordered = np.concatenate([data[0::2], data[1::2]])
    # delta encode
    delta = np.empty_like(reordered)
    delta[0] = reordered[0]
    delta[1:] = reordered[1:] - reordered[:-1] + 128 + 256
    return zlib.compress(delta.astype(np.uint8).tobytes(), 6)


def _zip_decompress(payload: bytes, expected: int) -> bytes:
    data = np.frombuffer(zlib.decompress(payload), np.uint8).astype(np.int32)
    # undo delta
    recon = np.cumsum(np.concatenate([data[:1], data[1:] - 128]), dtype=np.int64) % 256
    recon = recon.astype(np.uint8)
    # undo interleave split
    half = (len(recon) + 1) // 2
    out = np.empty(len(recon), np.uint8)
    out[0::2] = recon[:half]
    out[1::2] = recon[half:]
    assert len(out) == expected, (len(out), expected)
    return out.tobytes()
