"""Minimal OpenEXR 2.0 codec (scanline + single-level tiled; NONE / ZIPS /
ZIP / PIZ compression; float32 + half channels).

The reference writes EXR disparity maps via OpenCV (`PyramidLevel::saveResults`
``output_formats exr``, `util/CvUtil.cpp:31-35`); OpenCV's default EXR encoder
emits ZIP-compressed scanline blocks, so the reader here handles ZIP (16
scanlines/chunk) and ZIPS (1 scanline/chunk) plus uncompressed, with FLOAT and
HALF channels. Real-capture tooling commonly defaults to PIZ (wavelet +
Huffman, 32 scanlines/chunk) and sometimes writes tiled files, so the reader
also decodes PIZ chunks (via the native codec in ``stream/_native/piz.cpp``)
and single-level (ONE_LEVEL) tiled images in any of those compressions.

The writer emits single-part scanline images, FLOAT channels, INCREASING_Y,
NO_COMPRESSION / ZIP / PIZ — all readable by OpenCV/OpenEXR.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = 20000630
VERSION = 2
_TILED_BIT = 0x200

# compression enum (OpenEXR ImfCompression.h)
NO_COMPRESSION = 0
ZIPS_COMPRESSION = 2  # 1 scanline per chunk
ZIP_COMPRESSION = 3  # 16 scanlines per chunk
PIZ_COMPRESSION = 4  # 32 scanlines per chunk (wavelet + Huffman)

_LINES_PER_CHUNK = {
    NO_COMPRESSION: 1,
    ZIPS_COMPRESSION: 1,
    ZIP_COMPRESSION: 16,
    PIZ_COMPRESSION: 32,
}
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


def _piz_sizes(channels):
    """u16 units per pixel for each channel (HALF=1, FLOAT=2)."""
    return [np.dtype(dt).itemsize // 2 for _, dt in channels]


def _encode_chunk_piz(channels, rows_by_channel, w, ny) -> bytes:
    """Channel-major rows -> PIZ payload (falls back to caller if larger)."""
    from ..stream import native

    planes = np.concatenate([
        np.ascontiguousarray(rows).view(np.uint16).ravel() for rows in rows_by_channel
    ])
    return native.piz_compress(planes, w, ny, _piz_sizes(channels))


def write_exr(path, img: np.ndarray, compression: str = "none") -> None:
    """Write (H, W) or (H, W, 3) float32 as a scanline EXR.

    compression: "none" (OpenCV-readable, also what this codec historically
    wrote), "zip" (what OpenCV itself writes by default), "zips", or "piz"
    (OpenEXR wavelet + Huffman — the common capture-tooling default).
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
    comp = {
        "none": NO_COMPRESSION,
        "zip": ZIP_COMPRESSION,
        "zips": ZIPS_COMPRESSION,
        "piz": PIZ_COMPRESSION,
    }[compression]
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
    chan_dts = [(n, np.float32) for n in names]

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
        if comp == PIZ_COMPRESSION:
            z = _encode_chunk_piz(
                chan_dts, [channels[n][y0 : y0 + ny] for n in names], w, ny
            )
            data = z if len(z) < len(raw) else raw
        elif comp != NO_COMPRESSION:
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


def _fill_chunk(planes, channels, compression, data, x0, y0, w, ny):
    """Decode one chunk's payload into the channel planes.

    ``(x0, y0)`` is the chunk's top-left in plane coordinates; ``w`` its
    pixel width (tile width for tiled files), ``ny`` its scanline count.
    """
    raw_size = ny * w * sum(np.dtype(dt).itemsize for _, dt in channels)
    if len(data) < raw_size:  # compressed (OpenEXR stores raw when not smaller)
        if compression == PIZ_COMPRESSION:
            from ..stream import native

            sizes = _piz_sizes(channels)
            planes16 = native.piz_uncompress(data, w, ny, sizes)
            off = 0
            for (n, dt), sz in zip(channels, sizes):
                cnt = ny * w * sz
                arr = np.frombuffer(planes16[off : off + cnt].tobytes(), dt)
                planes[n][y0 : y0 + ny, x0 : x0 + w] = arr.reshape(ny, w).astype(np.float32)
                off += cnt
            return
        data = _zip_unpredict_deinterleave(zlib.decompress(data), raw_size)
    # per-scanline interleaved: for each row, each channel's row in order
    dp = 0
    for dy in range(ny):
        for n, dt in channels:
            planes[n][y0 + dy, x0 : x0 + w] = np.frombuffer(data, dt, w, dp).astype(np.float32)
            dp += w * np.dtype(dt).itemsize


def read_exr(path) -> np.ndarray:
    """Read a FLOAT/HALF EXR -> (H, W) or (H, W, 3) float32.

    Supports single-part scanline and ONE_LEVEL tiled images with
    none/ZIP/ZIPS/PIZ compression (the set OpenCV-written and common
    capture-tool EXRs use)."""
    with open(path, "rb") as f:
        buf = f.read()
    magic, version = struct.unpack_from("<ii", buf, 0)
    if magic != MAGIC:
        raise ValueError(f"not an EXR file: {path}")
    if version & ~(0xFF | _TILED_BIT):
        raise NotImplementedError(
            "multi-part / deep EXRs not supported (single-part scanline or "
            "ONE_LEVEL tiled, none/ZIP/ZIPS/PIZ only)"
        )
    tiled = bool(version & _TILED_BIT)
    pos = 8
    channels = []  # (name, dtype) in file (=alphabetical) order
    data_window = None
    compression = None
    tile_desc = None
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
        elif name == "tiles":
            tx, ty, mode = struct.unpack_from("<iiB", payload, 0)
            tile_desc = (tx, ty, mode)
    pos += 1  # header terminator
    if compression not in _LINES_PER_CHUNK:
        raise NotImplementedError(
            f"unsupported compression {compression} (supported: none=0, "
            "ZIPS=2, ZIP=3, PIZ=4)"
        )
    x0, y0, x1, y1 = data_window
    w, h = x1 - x0 + 1, y1 - y0 + 1
    channels.sort(key=lambda c: c[0])
    planes = {n: np.empty((h, w), np.float32) for n, _ in channels}

    if tiled:
        if tile_desc is None:
            raise ValueError("tiled EXR without a tiles attribute")
        tx, ty, mode = tile_desc
        if mode & 0x0F != 0:  # level mode: 0 = ONE_LEVEL
            raise NotImplementedError("only ONE_LEVEL tiled EXRs supported")
        ntx = (w + tx - 1) // tx
        nty = (h + ty - 1) // ty
        pos += 8 * ntx * nty  # offset table
        for _ in range(ntx * nty):
            dx, dy, _lx, _ly, size = struct.unpack_from("<iiiii", buf, pos)
            pos += 20
            data = buf[pos : pos + size]
            pos += size
            cx, cy = dx * tx, dy * ty
            _fill_chunk(
                planes, channels, compression, data,
                cx, cy, min(tx, w - cx), min(ty, h - cy),
            )
    else:
        lines_per_chunk = _LINES_PER_CHUNK[compression]
        num_chunks = (h + lines_per_chunk - 1) // lines_per_chunk
        pos += 8 * num_chunks  # skip the offset table
        for _ in range(num_chunks):
            y, size = struct.unpack_from("<ii", buf, pos)
            pos += 8
            ny = min(lines_per_chunk, y1 - y + 1)
            data = buf[pos : pos + size]
            pos += size
            _fill_chunk(planes, channels, compression, data, 0, y - y0, w, ny)

    names = [n for n, _ in channels]
    if names == ["Y"]:
        return planes["Y"]
    if set(names) >= {"R", "G", "B"}:
        return np.stack([planes["R"], planes["G"], planes["B"]], axis=-1)
    return np.stack([planes[n] for n in names], axis=-1)
