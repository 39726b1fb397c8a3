"""Image and disparity-map IO, bit-compatible with the reference contract.

- PFM float maps: the reference writes ``Pf\\n{w} {h}\\n-1.0\\n`` followed by
  raw float32 rows in cv::Mat order (row 0 = TOP row, unlike the PFM spec's
  bottom-up convention) — see ``util/CvUtil.cpp:39-73``. We match that byte
  layout exactly so outputs interchange with the reference binaries.
- PNG16 disparity: clamp [0,1] -> uint16 full range (``PyramidLevel.h:442-451``).
- EXR float via OpenCV.
- Color images load as float32 in [0,1], RGB channel order on the device path
  (the reference uses BGR OpenCV mats internally; channel order only matters
  for the R/G/B bilateral weights, which we map accordingly).
"""

from __future__ import annotations

import os
import re

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
    os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def write_pfm(path, m: np.ndarray) -> None:
    """util/CvUtil.cpp:39-49 (top-down row order, scale -1.0)."""
    m = np.ascontiguousarray(np.asarray(m, np.float32))
    assert m.ndim == 2, f"PFM expects a 2D float map, got {m.shape}"
    height, width = m.shape
    with open(path, "wb") as f:
        f.write(b"Pf\n")
        f.write(f"{width} {height}\n".encode())
        f.write(b"-1.0\n")
        f.write(m.tobytes())


def read_pfm(path) -> np.ndarray:
    """util/CvUtil.cpp:51-73."""
    with open(path, "rb") as f:
        header = f.readline().strip()
        assert header == b"Pf", f"expected 'Pf' header in {path}"
        dims = f.readline().split()
        width, height = int(dims[0]), int(dims[1])
        scale = float(f.readline().strip())
        data = np.frombuffer(f.read(width * height * 4), dtype="<f4" if scale <= 0 else ">f4")
    return data.reshape(height, width).copy()


def write_disparity(path, disparity: np.ndarray) -> None:
    """Write by extension: .pfm (bit-compatible), .exr (float), .png (uint16).

    PNG conversion clamps to [0,1] and maps NaN to 0 (PyramidLevel.h:442-451).
    """
    path = str(path)
    disparity = np.asarray(disparity, np.float32)
    if path.endswith(".pfm"):
        write_pfm(path, disparity)
    elif path.endswith(".exr"):
        from . import exr

        exr.write_exr(path, disparity)
    elif path.endswith(".png"):
        d = np.nan_to_num(disparity, nan=0.0)
        d16 = np.clip(d, 0.0, 1.0) * np.float32(65535.0)
        _write_image_u16(path, (d16 + 0.5).astype(np.uint16))
    else:
        raise ValueError(f"unsupported disparity format: {path}")


def read_disparity(path) -> np.ndarray:
    path = str(path)
    if path.endswith(".pfm"):
        return read_pfm(path)
    if path.endswith(".exr"):
        from . import exr

        img = exr.read_exr(path)
        return img[..., 0] if img.ndim == 3 else img
    assert _HAS_CV2, "non-PFM disparity IO requires OpenCV"
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    assert img is not None, f"cannot load {path}"
    if img.dtype == np.uint16:
        return img.astype(np.float32) / np.float32(65535.0)
    if img.dtype == np.uint8:
        return img.astype(np.float32) / np.float32(255.0)
    if img.ndim == 3:
        img = img[..., 0]
    return img.astype(np.float32)


def _write_image_u16(path, img: np.ndarray) -> None:
    assert _HAS_CV2, "PNG16 IO requires OpenCV"
    ok = cv2.imwrite(str(path), img)
    assert ok, f"failed to write {path}"


def read_color(path) -> np.ndarray:
    """Load a color image as float32 RGB(A) in [0,1], shape (H, W, C)."""
    assert _HAS_CV2
    img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    assert img is not None, f"cannot load {path}"
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / np.float32(255.0)
    elif img.dtype == np.uint16:
        img = img.astype(np.float32) / np.float32(65535.0)
    else:
        img = img.astype(np.float32)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    if img.shape[-1] >= 3:  # BGR(A) -> RGB(A)
        img = img[..., [2, 1, 0] + ([3] if img.shape[-1] == 4 else [])]
    return np.ascontiguousarray(img)


def write_color(path, img: np.ndarray, bit_depth: int = 8) -> None:
    """Save float [0,1] RGB(A) image as 8- or 16-bit PNG/JPEG."""
    assert _HAS_CV2
    img = np.asarray(img, np.float32)
    if img.ndim == 3 and img.shape[-1] >= 3:
        img = img[..., [2, 1, 0] + ([3] if img.shape[-1] == 4 else [])]
    scale = 255.0 if bit_depth == 8 else 65535.0
    out = np.clip(img, 0.0, 1.0) * np.float32(scale) + 0.5
    out = out.astype(np.uint8 if bit_depth == 8 else np.uint16)
    ok = cv2.imwrite(str(path), out)
    assert ok, f"failed to write {path}"


def read_mask(path) -> np.ndarray:
    """Boolean mask image (nonzero = true)."""
    assert _HAS_CV2
    img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
    assert img is not None, f"cannot load {path}"
    return img > 0


def write_mask(path, mask: np.ndarray) -> None:
    assert _HAS_CV2
    ok = cv2.imwrite(str(path), (np.asarray(mask) > 0).astype(np.uint8) * 255)
    assert ok, f"failed to write {path}"


def resize_image(img: np.ndarray, size_wh, interpolation: str = "area") -> np.ndarray:
    """Host-side resize (pyramid construction), matching scripts/render/resize.py."""
    assert _HAS_CV2
    interp = {
        "area": cv2.INTER_AREA,
        "linear": cv2.INTER_LINEAR,
        "nearest": cv2.INTER_NEAREST,
        "cubic": cv2.INTER_CUBIC,
        "lanczos": cv2.INTER_LANCZOS4,
    }[interpolation]
    return cv2.resize(np.asarray(img), tuple(int(v) for v in size_wh), interpolation=interp)


def frame_name(frame: int, pad: int = 6) -> str:
    """Zero-padded frame naming (image_util::intToStringZeroPad)."""
    return str(int(frame)).zfill(pad)


_IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".tif", ".tiff", ".exr", ".pfm")


def first_image_in(directory) -> str | None:
    try:
        entries = sorted(os.listdir(directory))
    except FileNotFoundError:
        return None
    for e in entries:
        if e.startswith("."):
            continue
        if os.path.splitext(e)[1].lower() in _IMAGE_EXTS:
            return os.path.join(directory, e)
    return None


def image_size(path) -> tuple[int, int]:
    """(width, height) without fully decoding where possible."""
    path = str(path)
    if path.endswith(".pfm"):
        with open(path, "rb") as f:
            f.readline()
            dims = f.readline().split()
            return int(dims[0]), int(dims[1])
    assert _HAS_CV2
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    assert img is not None, f"cannot load {path}"
    return img.shape[1], img.shape[0]


def get_pyramid_level_sizes(image_dir) -> dict[int, tuple[int, int]]:
    """Probe ``level_N`` subdirs for per-level (width, height). Derp.cpp:72-99."""
    sizes: dict[int, tuple[int, int]] = {}
    if not os.path.isdir(image_dir):
        return sizes
    for entry in os.listdir(image_dir):
        m = re.fullmatch(r"level_(\d+)", entry)
        if not m:
            continue
        level_dir = os.path.join(image_dir, entry)
        # images live one more level down, per-camera
        probe = None
        for cam_entry in sorted(os.listdir(level_dir)):
            sub = os.path.join(level_dir, cam_entry)
            probe = first_image_in(sub) if os.path.isdir(sub) else None
            if probe:
                break
        if probe:
            sizes[int(m.group(1))] = image_size(probe)
    return sizes
