"""Minimal OpenEXR 2.0 scanline codec (NO_COMPRESSION / ZIPS / ZIP, float32+half).

The reference writes EXR disparity maps via OpenCV (`PyramidLevel::saveResults`
``output_formats exr``, `util/CvUtil.cpp:31-35`); OpenCV's default EXR encoder
emits ZIP-compressed scanline blocks, so the reader here handles ZIP (16
scanlines/chunk) and ZIPS (1 scanline/chunk) plus uncompressed, with FLOAT and
HALF channels. The writer emits single-part scanline images, FLOAT channels,
INCREASING_Y, either NO_COMPRESSION or ZIP — both readable by OpenCV/OpenEXR.

This environment's OpenCV/imageio builds carry no EXR plugin, so the subset
the pipeline needs is implemented directly.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = 20000630
VERSION = 2

# compression enum (OpenEXR ImfCompression.h)
NO_COMPRESSION = 0
ZIPS_COMPRESSION = 2  # 1 scanline per chunk
ZIP_COMPRESSION = 3  # 16 scanlines per chunk

_LINES_PER_CHUNK = {NO_COMPRESSION: 1, ZIPS_COMPRESSION: 1, ZIP_COMPRESSION: 16}
# channel pixel types (ImfPixelType.h): 0=UINT, 1=HALF, 2=FLOAT
_PIXEL_DTYPE = {1: np.float16, 2: np.float32}


def _attr(name: str, type_name: str, payload: bytes) -> bytes:
    return name.encode() + b"\x00" + type_name.encode() + b"\x00" + struct.pack("<i", len(payload)) + payload


def _channel_list(names) -> bytes:
    # channels sorted alphabetically per the spec
    out = b""
    for n in sorted(names):
        # pixel type 2 = FLOAT; pLinear 0; sampling 1,1
        out += n.encode() + b"\x00" + struct.pack("<iBBBBii", 2, 0, 0, 0, 0, 1, 1)
    return out + b"\x00"


def _zip_predict_interleave(raw: bytes) -> bytes:
    """OpenEXR ZIP pre-filter (ImfZip::compress): interleave the byte stream
    into two halves, then delta-encode with bias 128."""
    d = np.frombuffer(raw, np.uint8)
    n = d.size
    half = (n + 1) // 2
    t = np.empty(n, np.uint8)
    t[:half] = d[0::2]
    t[half:] = d[1::2]
    out = t.astype(np.int16)
    out[1:] = np.diff(t.astype(np.int16)) + 128
    return out.astype(np.uint8).tobytes()


def _zip_unpredict_deinterleave(filt: bytes, n: int) -> bytes:
    """Inverse of `_zip_predict_interleave` (ImfZip::uncompress)."""
    t = np.frombuffer(filt, np.uint8, n).astype(np.int64)
    t[1:] -= 128
    t = np.cumsum(t).astype(np.uint8)
    half = (n + 1) // 2
    out = np.empty(n, np.uint8)
    out[0::2] = t[:half]
    out[1::2] = t[half:]
    return out.tobytes()


def write_exr(path, img: np.ndarray, compression: str = "none") -> None:
    """Write (H, W) or (H, W, 3) float32 as a scanline EXR.

    compression: "none" (OpenCV-readable, also what this codec historically
    wrote) or "zip" (what OpenCV itself writes by default).
    """
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        channels = {"Y": img}
    elif img.ndim == 3 and img.shape[2] == 3:
        channels = {"R": img[..., 0], "G": img[..., 1], "B": img[..., 2]}
    else:
        raise ValueError(f"unsupported shape {img.shape}")
    h, w = img.shape[:2]
    names = sorted(channels)
    comp = {"none": NO_COMPRESSION, "zip": ZIP_COMPRESSION, "zips": ZIPS_COMPRESSION}[compression]
    lines_per_chunk = _LINES_PER_CHUNK[comp]

    header = b""
    header += _attr("channels", "chlist", _channel_list(names))
    header += _attr("compression", "compression", bytes([comp]))
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header += _attr("dataWindow", "box2i", box)
    header += _attr("displayWindow", "box2i", box)
    header += _attr("lineOrder", "lineOrder", b"\x00")  # INCREASING_Y
    header += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0))
    header += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\x00"  # end of header

    preamble = struct.pack("<ii", MAGIC, VERSION) + header
    num_chunks = (h + lines_per_chunk - 1) // lines_per_chunk

    chunks = []
    for c in range(num_chunks):
        y0 = c * lines_per_chunk
        ny = min(lines_per_chunk, h - y0)
        raw = b"".join(
            np.ascontiguousarray(channels[n][y]).tobytes()
            for y in range(y0, y0 + ny)
            for n in names
        )
        data = raw
        if comp != NO_COMPRESSION:
            z = zlib.compress(_zip_predict_interleave(raw))
            # OpenEXR stores raw if compression does not shrink the chunk
            data = z if len(z) < len(raw) else raw
        chunks.append((y0, data))

    with open(path, "wb") as f:
        f.write(preamble)
        pos = len(preamble) + 8 * num_chunks
        for y0, data in chunks:
            f.write(struct.pack("<Q", pos))
            pos += 8 + len(data)
        for y0, data in chunks:
            f.write(struct.pack("<ii", y0, len(data)))
            f.write(data)


def read_exr(path) -> np.ndarray:
    """Read a FLOAT/HALF scanline EXR (none/ZIP/ZIPS compression) ->
    (H, W) or (H, W, 3) float32."""
    with open(path, "rb") as f:
        buf = f.read()
    magic, version = struct.unpack_from("<ii", buf, 0)
    if magic != MAGIC:
        raise ValueError(f"not an EXR file: {path}")
    if version & 0x200:
        raise NotImplementedError("tiled EXRs not supported")
    pos = 8
    channels = []  # (name, dtype) in file (=alphabetical) order
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
                if ptype not in _PIXEL_DTYPE:
                    raise NotImplementedError(f"unsupported pixel type {ptype}")
                channels.append((cname, _PIXEL_DTYPE[ptype]))
                cp = ce + 1 + 16
        elif name == "dataWindow":
            data_window = struct.unpack("<iiii", payload)
        elif name == "compression":
            compression = payload[0]
    pos += 1  # header terminator
    if compression not in _LINES_PER_CHUNK:
        raise NotImplementedError(f"unsupported compression {compression}")
    lines_per_chunk = _LINES_PER_CHUNK[compression]
    x0, y0, x1, y1 = data_window
    w, h = x1 - x0 + 1, y1 - y0 + 1
    channels.sort(key=lambda c: c[0])
    num_chunks = (h + lines_per_chunk - 1) // lines_per_chunk
    pos += 8 * num_chunks  # skip the offset table

    planes = {n: np.empty((h, w), np.float32) for n, _ in channels}
    for _ in range(num_chunks):
        y, size = struct.unpack_from("<ii", buf, pos)
        pos += 8
        ny = min(lines_per_chunk, y1 - y + 1)
        raw_size = ny * w * sum(np.dtype(dt).itemsize for _, dt in channels)
        data = buf[pos : pos + size]
        pos += size
        if compression != NO_COMPRESSION and size < raw_size:
            data = _zip_unpredict_deinterleave(zlib.decompress(data), raw_size)
        dp = 0
        for dy in range(ny):
            for n, dt in channels:
                nbytes = w * np.dtype(dt).itemsize
                planes[n][y - y0 + dy] = np.frombuffer(data, dt, w, dp).astype(np.float32)
                dp += nbytes
    names = [n for n, _ in channels]
    if names == ["Y"]:
        return planes["Y"]
    if set(names) >= {"R", "G", "B"}:
        return np.stack([planes["R"], planes["G"], planes["B"]], axis=-1)
    return np.stack([planes[n] for n in names], axis=-1)
