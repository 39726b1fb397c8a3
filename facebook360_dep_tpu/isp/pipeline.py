"""Software ISP: RAW Bayer -> RGB, TPU-vectorized.

Reference: ``isp/CameraIsp.h:42-1299`` — companding LUT, black level,
vignetting (Bezier H/V rolloff), white balance, CCM, demosaic, saturation,
gamma/contrast tone curve, unsharp sharpening, configured from isp.json
("CameraIsp" object, :520-566). The per-pixel loops become fused image ops;
demosaic is mask-multiplied convolution (one normalized 3x3 kernel serves
all channels), an XLA-friendly formulation of the BILINEAR method.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

BAYER_OFFSETS = {
    # (y, x) offsets of R, G1, G2, B within each 2x2 tile
    "RGGB": {"r": (0, 0), "g": ((0, 1), (1, 0)), "b": (1, 1)},
    "GRBG": {"r": (0, 1), "g": ((0, 0), (1, 1)), "b": (1, 0)},
    "GBRG": {"r": (1, 0), "g": ((0, 0), (1, 1)), "b": (0, 1)},
    "BGGR": {"r": (1, 1), "g": ((0, 1), (1, 0)), "b": (0, 0)},
}


@dataclass
class IspConfig:
    """isp.json "CameraIsp" schema (CameraIsp.h:520-566)."""

    bits_per_pixel: int = 8
    bayer_pattern: str = "GBRG"
    black_level: tuple = (0.0, 0.0, 0.0)
    clamp_min: tuple = (0.0, 0.0, 0.0)
    clamp_max: tuple = (1.0, 1.0, 1.0)
    vignette_roll_off_h: list = field(default_factory=lambda: [(1.0, 1.0, 1.0)])
    vignette_roll_off_v: list = field(default_factory=lambda: [(1.0, 1.0, 1.0)])
    white_balance_gain: tuple = (1.0, 1.0, 1.0)
    ccm: tuple = ((1, 0, 0), (0, 1, 0), (0, 0, 1))
    saturation: float = 1.0
    gamma: tuple = (1.0, 1.0, 1.0)
    contrast: float = 1.0
    low_key_boost: tuple = (0.0, 0.0, 0.0)
    high_key_boost: tuple = (0.0, 0.0, 0.0)
    sharpening: tuple = (0.0, 0.0, 0.0)
    sharpening_support: float = 0.0
    stuck_pixel_threshold: int = 0

    @classmethod
    def from_json(cls, path) -> "IspConfig":
        with open(path) as f:
            obj = json.load(f).get("CameraIsp", {})

        def pt(key, default):
            v = obj.get(key)
            return tuple(v["x"], ) if False else (tuple(v.values()) if isinstance(v, dict) else tuple(v)) if v else default

        cfg = cls()
        cfg.bits_per_pixel = obj.get("bitsPerPixel", cfg.bits_per_pixel)
        cfg.bayer_pattern = obj.get("bayerPattern", cfg.bayer_pattern).upper()[:4]
        for name, attr in [
            ("blackLevel", "black_level"),
            ("clampMin", "clamp_min"),
            ("clampMax", "clamp_max"),
            ("whiteBalanceGain", "white_balance_gain"),
            ("gamma", "gamma"),
            ("lowKeyBoost", "low_key_boost"),
            ("highKeyBoost", "high_key_boost"),
            ("sharpening", "sharpening"),
        ]:
            if name in obj:
                v = obj[name]
                setattr(cfg, attr, tuple(v.values()) if isinstance(v, dict) else tuple(v))
        if "ccm" in obj:
            cfg.ccm = tuple(tuple(row) for row in obj["ccm"])
        for name, attr in [
            ("vignetteRollOffH", "vignette_roll_off_h"),
            ("vignetteRollOffV", "vignette_roll_off_v"),
        ]:
            if name in obj:
                setattr(cfg, attr, [tuple(p.values()) if isinstance(p, dict) else tuple(p) for p in obj[name]])
        cfg.saturation = obj.get("saturation", cfg.saturation)
        cfg.contrast = obj.get("contrast", cfg.contrast)
        cfg.sharpening_support = obj.get("sharpeningSupport", cfg.sharpening_support)
        return cfg


def bayer_masks(pattern: str, height: int, width: int):
    """(H, W) boolean masks for the R/G/B sites of a Bayer pattern."""
    off = BAYER_OFFSETS[pattern]
    ys = jnp.arange(height)[:, None] % 2
    xs = jnp.arange(width)[None, :] % 2

    def site(yx):
        return (ys == yx[0]) & (xs == yx[1])

    r = site(off["r"])
    g = site(off["g"][0]) | site(off["g"][1])
    b = site(off["b"])
    return r, g, b


def demosaic_bilinear(raw: jnp.ndarray, pattern: str) -> jnp.ndarray:
    """Mask-multiplied convolution demosaic: for each channel, convolve the
    masked mosaic and the mask with one normalized 3x3 kernel and divide
    (the BILINEAR method of CameraIsp.h:32-38, vectorized)."""
    h, w = raw.shape
    masks = bayer_masks(pattern, h, w)
    kernel = jnp.asarray([[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]], raw.dtype)

    def conv(img):
        return jax.lax.conv_general_dilated(
            img[None, None], kernel[None, None], (1, 1), "SAME"
        )[0, 0]

    channels = []
    for m in masks:
        mf = m.astype(raw.dtype)
        val = conv(raw * mf)
        weight = conv(mf)
        channels.append(val / jnp.maximum(weight, 1e-12))
    return jnp.stack(channels, axis=-1)


def bezier(control_points: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """De Casteljau evaluation; control_points (K, C), t (...,) -> (..., C).
    Mirrors math_util::BezierCurve used for vignette rolloff (MathUtil.h)."""
    pts = [jnp.broadcast_to(p, t.shape + p.shape) for p in control_points]
    while len(pts) > 1:
        pts = [(1 - t[..., None]) * a + t[..., None] * b for a, b in zip(pts[:-1], pts[1:])]
    return pts[0]


def process(raw: jnp.ndarray, cfg: IspConfig) -> jnp.ndarray:
    """RAW mosaic float [0,1] (H, W) -> RGB float [0,1] (H, W, 3)."""
    raw = jnp.asarray(raw, jnp.float32)
    h, w = raw.shape

    # vignetting correction: separable H/V Bezier rolloff (CameraIsp.h:84-85)
    roll_h = bezier(jnp.asarray(cfg.vignette_roll_off_h, jnp.float32), jnp.arange(w) / max(w - 1, 1))
    roll_v = bezier(jnp.asarray(cfg.vignette_roll_off_v, jnp.float32), jnp.arange(h) / max(h - 1, 1))
    vignette = roll_v[:, None, :] * roll_h[None, :, :]  # (H, W, 3)

    rgb = demosaic_bilinear(raw, cfg.bayer_pattern)
    black = jnp.asarray(cfg.black_level, jnp.float32)
    rgb = (rgb - black) / jnp.maximum(1.0 - black, 1e-6)
    rgb = rgb / jnp.maximum(vignette, 1e-6)
    rgb = rgb * jnp.asarray(cfg.white_balance_gain, jnp.float32)
    rgb = jnp.clip(rgb, jnp.asarray(cfg.clamp_min), jnp.asarray(cfg.clamp_max))
    rgb = jnp.einsum("ij,hwj->hwi", jnp.asarray(cfg.ccm, jnp.float32), rgb)

    # saturation in Y/chroma space (CameraIsp saturation stage)
    if cfg.saturation != 1.0:
        y = jnp.sum(rgb * jnp.asarray([0.299, 0.587, 0.114]), axis=-1, keepdims=True)
        rgb = y + (rgb - y) * cfg.saturation

    # tone curve: gamma + contrast S-curve around mid-gray
    rgb = jnp.power(jnp.clip(rgb, 0.0, 1.0), jnp.asarray(cfg.gamma, jnp.float32))
    if cfg.contrast != 1.0:
        rgb = jnp.clip((rgb - 0.5) * cfg.contrast + 0.5, 0.0, 1.0)

    # unsharp-mask sharpening
    sharp = jnp.asarray(cfg.sharpening, jnp.float32)
    if np.any(np.asarray(cfg.sharpening) != 0):
        from ..ops import sampling

        blurred = sampling.box_mean(rgb, 1)
        rgb = jnp.clip(rgb + sharp * (rgb - blurred), 0.0, 1.0)
    return rgb


def mosaic(rgb: np.ndarray, pattern: str) -> np.ndarray:
    """RGB -> Bayer mosaic (testing helper / RigSimulator RAW output)."""
    h, w = rgb.shape[:2]
    r, g, b = (np.asarray(m) for m in bayer_masks(pattern, h, w))
    out = np.zeros((h, w), np.float32)
    out[r] = rgb[..., 0][r]
    out[g] = rgb[..., 1][g]
    out[b] = rgb[..., 2][b]
    return out
