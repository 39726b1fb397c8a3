"""Minimal OpenEXR 2.0 scanline codec (uncompressed, float32).

The reference writes EXR disparity maps via OpenCV (`PyramidLevel::saveResults`
``output_formats exr``); this environment's OpenCV/imageio builds carry no EXR
plugin, so the subset the pipeline needs is implemented directly: single-part
scanline images, FLOAT channels, NO_COMPRESSION, INCREASING_Y. That is also
exactly what OpenCV writes for float Mats, so files interoperate.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = 20000630
VERSION = 2


def _attr(name: str, type_name: str, payload: bytes) -> bytes:
    return name.encode() + b"\x00" + type_name.encode() + b"\x00" + struct.pack("<i", len(payload)) + payload


def _channel_list(names) -> bytes:
    # channels sorted alphabetically per the spec
    out = b""
    for n in sorted(names):
        # pixel type 2 = FLOAT; pLinear 0; sampling 1,1
        out += n.encode() + b"\x00" + struct.pack("<iBBBBii", 2, 0, 0, 0, 0, 1, 1)
    return out + b"\x00"


def write_exr(path, img: np.ndarray) -> None:
    """Write (H, W) or (H, W, 3) float32 as an uncompressed scanline EXR."""
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        channels = {"Y": img}
    elif img.ndim == 3 and img.shape[2] == 3:
        channels = {"R": img[..., 0], "G": img[..., 1], "B": img[..., 2]}
    else:
        raise ValueError(f"unsupported shape {img.shape}")
    h, w = img.shape[:2]
    names = sorted(channels)

    header = b""
    header += _attr("channels", "chlist", _channel_list(names))
    header += _attr("compression", "compression", b"\x00")  # NO_COMPRESSION
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header += _attr("dataWindow", "box2i", box)
    header += _attr("displayWindow", "box2i", box)
    header += _attr("lineOrder", "lineOrder", b"\x00")  # INCREASING_Y
    header += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0))
    header += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\x00"  # end of header

    preamble = struct.pack("<ii", MAGIC, VERSION) + header
    # scanline offset table, then blocks: (y, bytesize, per-channel rows)
    row_bytes = 4 * w * len(names)
    block_size = 8 + row_bytes
    first_block = len(preamble) + 8 * h
    offsets = struct.pack("<%dQ" % h, *(first_block + i * block_size for i in range(h)))

    with open(path, "wb") as f:
        f.write(preamble)
        f.write(offsets)
        for y in range(h):
            f.write(struct.pack("<ii", y, row_bytes))
            for n in names:
                f.write(np.ascontiguousarray(channels[n][y]).tobytes())


def read_exr(path) -> np.ndarray:
    """Read an uncompressed FLOAT scanline EXR -> (H, W) or (H, W, 3)."""
    with open(path, "rb") as f:
        buf = f.read()
    magic, version = struct.unpack_from("<ii", buf, 0)
    if magic != MAGIC:
        raise ValueError(f"not an EXR file: {path}")
    pos = 8
    channels = []
    data_window = None
    compression = None
    while buf[pos] != 0:
        name_end = buf.index(b"\x00", pos)
        name = buf[pos:name_end].decode()
        pos = name_end + 1
        type_end = buf.index(b"\x00", pos)
        pos = type_end + 1
        (size,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        payload = buf[pos : pos + size]
        pos += size
        if name == "channels":
            cp = 0
            while payload[cp] != 0:
                ce = payload.index(b"\x00", cp)
                cname = payload[cp:ce].decode()
                (ptype,) = struct.unpack_from("<i", payload, ce + 1)
                if ptype != 2:
                    raise NotImplementedError("only FLOAT channels supported")
                channels.append(cname)
                cp = ce + 1 + 16
        elif name == "dataWindow":
            data_window = struct.unpack("<iiii", payload)
        elif name == "compression":
            compression = payload[0]
    pos += 1  # header terminator
    if compression != 0:
        raise NotImplementedError("only NO_COMPRESSION EXRs supported")
    x0, y0, x1, y1 = data_window
    w, h = x1 - x0 + 1, y1 - y0 + 1
    channels = sorted(channels)
    pos += 8 * h  # skip the offset table

    planes = {n: np.empty((h, w), np.float32) for n in channels}
    row_bytes = 4 * w
    for _ in range(h):
        y, size = struct.unpack_from("<ii", buf, pos)
        pos += 8
        for n in channels:
            planes[n][y - y0] = np.frombuffer(buf, np.float32, w, pos)
            pos += row_bytes
    if channels == ["Y"]:
        return planes["Y"]
    if set(channels) >= {"R", "G", "B"}:
        return np.stack([planes["R"], planes["G"], planes["B"]], axis=-1)
    return np.stack([planes[n] for n in channels], axis=-1)
