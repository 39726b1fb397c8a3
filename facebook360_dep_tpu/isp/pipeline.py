"""Software ISP: RAW Bayer -> RGB, TPU-vectorized.

Reference: ``isp/CameraIsp.h:42-1299``. Stage order mirrors
``executePipeline`` (CameraIsp.h:1227-1237): black level -> anti-vignette ->
white balance -> clamp/stretch -> stuck-pixel removal -> demosaic ->
color correct (CCM + saturation + gamma/key-boost/contrast tone curve,
:360-415) -> sharpen. All mosaic-domain stages are per-Bayer-site gains
expressed through channel masks; the per-pixel loops become fused image ops.

Demosaic filters (CameraIsp.h:32-38): BILINEAR (mask-multiplied
convolution), EDGE_AWARE (directional green + homogeneity vote + chroma
suppression, :161-247), FREQUENCY (DCT-space Butterworth filtering of the
zero-stuffed channel planes, :129-159), CHROMA_SUPPRESSED
(CHROMA_SUPRESSED_BILINEAR: cross-neighbor bilinear green + constant-hue
chroma reconstruction, :227-248).
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sampling
from ..utils.hostmath import on_host

BAYER_OFFSETS = {
    # (y, x) offsets of R, G1, G2, B within each 2x2 tile
    "RGGB": {"r": (0, 0), "g": ((0, 1), (1, 0)), "b": (1, 1)},
    "GRBG": {"r": (0, 1), "g": ((0, 0), (1, 1)), "b": (1, 0)},
    "GBRG": {"r": (1, 0), "g": ((0, 0), (1, 1)), "b": (0, 1)},
    "BGGR": {"r": (1, 1), "g": ((0, 1), (1, 0)), "b": (0, 0)},
}

DEMOSAIC_FILTERS = ("BILINEAR", "EDGE_AWARE", "FREQUENCY", "CHROMA_SUPPRESSED")


@dataclass
class IspConfig:
    """isp.json "CameraIsp" schema (CameraIsp.h:520-566)."""

    bits_per_pixel: int = 8
    width: int = 0  # sensor dims; 0 = take from the image
    height: int = 0
    bayer_pattern: str = "GBRG"
    companding_lut: list = field(default_factory=lambda: [(0.0, 0.0), (1.0, 1.0)])
    black_level: tuple = (0.0, 0.0, 0.0)
    clamp_min: tuple = (0.0, 0.0, 0.0)
    clamp_max: tuple = (1.0, 1.0, 1.0)
    stuck_pixel_threshold: float = 0.0
    stuck_pixel_darkness_threshold: float = 0.0
    stuck_pixel_radius: int = 0
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
    sharpening_support: float = 10.0 / 2048.0
    noise_core: float = 1000.0
    demosaic_filter: str = "BILINEAR"
    apply_tone_curve: bool = True

    @classmethod
    def from_json(cls, path) -> "IspConfig":
        with open(path) as f:
            obj = json.load(f).get("CameraIsp", {})
        cfg = cls()
        cfg.bits_per_pixel = obj.get("bitsPerPixel", cfg.bits_per_pixel)
        cfg.width = obj.get("width", cfg.width)
        cfg.height = obj.get("height", cfg.height)
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
            ("compandingLut", "companding_lut"),
        ]:
            if name in obj:
                setattr(
                    cfg, attr,
                    [tuple(p.values()) if isinstance(p, dict) else tuple(p) for p in obj[name]],
                )
        cfg.saturation = obj.get("saturation", cfg.saturation)
        cfg.contrast = obj.get("contrast", cfg.contrast)
        cfg.sharpening_support = obj.get("sharpeningSupport", cfg.sharpening_support)
        cfg.noise_core = obj.get("noiseCore", cfg.noise_core)
        cfg.stuck_pixel_threshold = obj.get("stuckPixelThreshold", cfg.stuck_pixel_threshold)
        cfg.stuck_pixel_darkness_threshold = obj.get(
            "stuckPixelDarknessThreshold", cfg.stuck_pixel_darkness_threshold
        )
        cfg.stuck_pixel_radius = obj.get("stuckPixelRadius", cfg.stuck_pixel_radius)
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


def per_site(pattern: str, height: int, width: int, rgb_triple) -> jnp.ndarray:
    """(H, W) map holding the per-channel value at each Bayer site."""
    r, g, b = bayer_masks(pattern, height, width)
    v = jnp.asarray(rgb_triple, jnp.float32)
    return r * v[0] + g * v[1] + b * v[2]


def companding(raw: jnp.ndarray, lut_points) -> jnp.ndarray:
    """Piecewise-linear companding curve (compandingLut, CameraIsp.h:53)."""
    pts = np.asarray(lut_points, np.float32)
    if len(pts) < 2 or (len(pts) == 2 and np.allclose(pts, [[0, 0], [1, 1]])):
        return raw
    return jnp.interp(raw, jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]))


def _conv(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        img[None, None], kernel[None, None].astype(img.dtype), (1, 1), "SAME"
    )[0, 0]


def demosaic_bilinear(raw: jnp.ndarray, pattern: str) -> jnp.ndarray:
    """Mask-multiplied convolution demosaic: for each channel, convolve the
    masked mosaic and the mask with one normalized 3x3 kernel and divide
    (the BILINEAR method of CameraIsp.h:93-127, vectorized)."""
    h, w = raw.shape
    masks = bayer_masks(pattern, h, w)
    kernel = jnp.asarray([[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]], raw.dtype)

    channels = []
    for m in masks:
        mf = m.astype(raw.dtype)
        val = _conv(raw * mf, kernel)
        weight = _conv(mf, kernel)
        channels.append(val / jnp.maximum(weight, 1e-12))
    return jnp.stack(channels, axis=-1)


def _chroma_suppressed(raw, green, rm, bm):
    """R/B reconstruction by spreading chroma differences over the full
    green plane (demosaicChromaSuppressed, CameraIsp.h:250+)."""
    kernel = jnp.asarray([[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]], raw.dtype)

    def spread(chroma, mask):
        mf = mask.astype(raw.dtype)
        return _conv(chroma * mf, kernel) / jnp.maximum(_conv(mf, kernel), 1e-12)

    red = green + spread(raw - green, rm)
    blue = green + spread(raw - green, bm)
    return jnp.stack([red, green, blue], axis=-1)


def demosaic_chroma_suppressed(raw: jnp.ndarray, pattern: str) -> jnp.ndarray:
    """CHROMA_SUPRESSED_BILINEAR demosaic (CameraIsp.h:32-38 enum, dispatch
    :1161-1163, demosaicGreenBilinear :227-248).

    Green at non-green sites is the bilinear average of the 4 cross
    neighbors (all of which are green on a Bayer grid); R/B then finish
    with the same constant-hue chroma-suppressed reconstruction the
    EDGE_AWARE path uses (demosaicChromaSuppressed, :250+)."""
    h, w = raw.shape
    rm, gm, bm = bayer_masks(pattern, h, w)

    # reflect-padded cross average (not roll): wrap-around green at the
    # frame edge leaks through _chroma_suppressed's window into interior rows
    pad = jnp.pad(raw, 1, mode="reflect")
    cross = (pad[:-2, 1:-1] + pad[2:, 1:-1] + pad[1:-1, :-2] + pad[1:-1, 2:]) * 0.25
    green = jnp.where(gm, raw, cross)
    return _chroma_suppressed(raw, green, rm, bm)


def demosaic_edge_aware(raw: jnp.ndarray, pattern: str, homogeneity_radius: int = 4) -> jnp.ndarray:
    """Edge-aware demosaic (EDGE_AWARE, CameraIsp.h:161-226), vectorized.

    Per the reference: directional green estimates gV/gH at non-green sites
    (neighbor average plus the co-site channel's Laplacian correction),
    directional activity measures dV/dH, then a (2r+1)^2 homogeneity vote
    of (dH <= dV) blends gV toward gH; R/B finish with chroma suppression.
    The scalar double loop becomes shifts + one box sum.
    """
    h, w = raw.shape
    rm, gm, bm = bayer_masks(pattern, h, w)

    # reflect-padded shifts (not roll): wrap-around corrupts the directional
    # green/Laplacian estimates at frame edges, and the error propagates
    # ~homogeneity_radius columns inward through the vote + chroma spread
    pad2 = jnp.pad(raw, 2, mode="reflect")

    def shift(dy, dx):
        return jax.lax.dynamic_slice(pad2, (2 + dy, 2 + dx), (h, w))

    up, down = shift(-1, 0), shift(1, 0)
    left, right = shift(0, -1), shift(0, 1)
    up2, down2 = shift(-2, 0), shift(2, 0)
    left2, right2 = shift(0, -2), shift(0, 2)

    # at green sites: identity green, activity from 2-step green diffs
    gv_g = raw
    gh_g = raw
    dv_g = (jnp.abs(down2 - raw) + jnp.abs(raw - up2)) * 0.5
    dh_g = (jnp.abs(right2 - raw) + jnp.abs(raw - left2)) * 0.5

    # at R/B sites: neighbor-average green + own-channel Laplacian correction
    gv_c = (up + down) * 0.5 + (2.0 * raw - up2 - down2) * 0.25
    gh_c = (left + right) * 0.5 + (2.0 * raw - left2 - right2) * 0.25
    dv_c = jnp.abs(up - down) * 0.5 + jnp.abs(-2.0 * raw + up2 + down2) * 0.5
    dh_c = jnp.abs(left - right) * 0.5 + jnp.abs(-2.0 * raw + left2 + right2) * 0.5

    gv = jnp.where(gm, gv_g, gv_c)
    gh = jnp.where(gm, gh_g, gh_c)
    dv = jnp.where(gm, dv_g, dv_c)
    dh = jnp.where(gm, dh_g, dh_c)

    # homogeneity vote over the (2r+1)^2 window: fraction preferring H
    votes = (dh <= dv).astype(raw.dtype)
    frac_h = sampling.box_mean(votes, homogeneity_radius)
    green = gv + (gh - gv) * frac_h  # lerp(gV, gH, hCount/diameter^2)

    return _chroma_suppressed(raw, green, rm, bm)


def _butterworth(d, cutoff, order):
    """|H(d)| of a Butterworth low-pass over normalized distance."""
    return 1.0 / jnp.sqrt(1.0 + (d / cutoff) ** (2.0 * order))


@on_host
def demosaic_frequency(raw: jnp.ndarray, pattern: str) -> jnp.ndarray:
    """Frequency-domain demosaic (FREQUENCY, CameraIsp.h:129-159).

    Runs on the host: the DCT is unimplemented on the TPU backend, and this
    mode is an offline alternative (the production default is EDGE_AWARE).

    Green from its quincunx sites via bilinear fill, then DCT-space
    filtering: a 4th-order Butterworth low-pass with diagonal-distance
    sharpening on luma and a 2nd-order crossover that blends R/B toward
    green at high frequencies (chroma alias suppression).
    """
    import jax.scipy.fft as jfft

    h, w = raw.shape
    rm, gm, bm = bayer_masks(pattern, h, w)
    # zero-stuffed channel planes: green on its quincunx (half density, DC
    # halved) and R/B on quarter-density grids — the 2x/4x gains below
    # restore amplitude while the low-pass removes the stuffing's
    # modulation spectra (the reference's formulation)
    r0 = raw * rm
    g0 = raw * gm
    b0 = raw * bm

    ys = jnp.linspace(0.0, 1.0, h)[:, None]
    xs = jnp.linspace(0.0, 1.0, w)[None, :]
    d = (xs + ys) * 1.2  # kDScale diagonal distance
    sharpen = d / 2.5 + 1.0
    g_gain = 2.0 * _butterworth(d, 2.0, 4.0) * sharpen
    rb_gain = 4.0 * _butterworth(d, 2.0, 4.0)
    alpha = _butterworth(d * 2.0 * 3.0, 2.0, 2.0)  # crossover

    def dct2(a):
        return jfft.dctn(a, type=2, norm="ortho")

    def idct2(a):
        return jfft.idctn(a, type=2, norm="ortho")

    gd = dct2(g0) * g_gain
    g_f = idct2(gd)
    r_f = idct2(gd * (1 - alpha) + dct2(r0) * rb_gain * alpha)
    b_f = idct2(gd * (1 - alpha) + dct2(b0) * rb_gain * alpha)
    return jnp.clip(jnp.stack([r_f, g_f, b_f], axis=-1), 0.0, 1.0)


def remove_stuck_pixels(
    raw: jnp.ndarray, pattern: str, radius: int, threshold: float, darkness_threshold: float = 0.0
) -> jnp.ndarray:
    """Replace outlier sensels with the median of same-color neighbors
    (removeStuckPixels, CameraIsp.h — vectorized redesign of its
    boustrophedonic scalar walk). Same-color Bayer neighbors sit at even
    offsets, so the window is a strided gather.
    """
    if radius <= 0:
        return raw
    offs = [
        (dy, dx)
        for dy in range(-2 * radius, 2 * radius + 1, 2)
        for dx in range(-2 * radius, 2 * radius + 1, 2)
        if not (dy == 0 and dx == 0)
    ]
    stack = jnp.stack([jnp.roll(raw, (dy, dx), (0, 1)) for dy, dx in offs])
    med = jnp.median(stack, axis=0)
    deviates = jnp.abs(raw - med) > threshold
    dark_ok = med >= darkness_threshold if darkness_threshold > 0 else True
    return jnp.where(deviates & dark_ok, med, raw)


def bezier(control_points: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """De Casteljau evaluation; control_points (K, C), t (...,) -> (..., C).
    Mirrors math_util::BezierCurve used for vignette rolloff (MathUtil.h)."""
    pts = [jnp.broadcast_to(p, t.shape + p.shape) for p in control_points]
    while len(pts) > 1:
        pts = [(1 - t[..., None]) * a + t[..., None] * b for a, b in zip(pts[:-1], pts[1:])]
    return pts[0]


def _key_bezier(a, b, c, d, t):
    """Cubic bezier through 4 scalar controls, elementwise t."""
    ab = a + (b - a) * t
    bc = b + (c - b) * t
    cd = c + (d - c) * t
    abc = ab + (bc - ab) * t
    bcd = bc + (cd - bc) * t
    return abc + (bcd - abc) * t


def tone_curve(x: jnp.ndarray, cfg: IspConfig) -> jnp.ndarray:
    """Gamma -> low/high key boost beziers -> contrast S-slope
    (buildToneCurveLut, CameraIsp.h:382-415) applied directly (no LUT —
    the VPU evaluates the curve cheaper than a gather)."""
    gamma = jnp.asarray(cfg.gamma, jnp.float32)
    v = jnp.power(jnp.clip(x, 0.0, 1.0), gamma)

    lo = jnp.asarray(cfg.low_key_boost, jnp.float32)
    hi = jnp.asarray(cfg.high_key_boost, jnp.float32)
    b_lo = jnp.clip(0.1666 + lo, 0.0, 1.0)
    c_hi = jnp.clip(0.8333 + hi, 0.0, 1.0)
    low = _key_bezier(0.0, b_lo, 0.3333, 0.5, jnp.clip(v * 2.0, 0.0, 1.0))
    high = _key_bezier(0.5, 0.6666, c_hi, 1.0, jnp.clip((v - 0.5) * 2.0, 0.0, 1.0))
    v = jnp.where(v <= 0.5, low, high)

    slope = math.tan(math.pi * 0.25 * cfg.contrast)
    bias = 0.5 * (1.0 - slope)
    return jnp.clip(slope * v + bias, 0.0, 1.0)


def iir_low_pass(img: jnp.ndarray, support: float) -> jnp.ndarray:
    """Separable low pass with the support fraction of the reference's IIR
    blur (CameraIsp sharpen; isp/Filter.h iirLowPass), realized as a
    Gaussian-like box cascade sized from the support."""
    h, w = img.shape[:2]
    radius = max(int(round(support * max(h, w))), 1)
    out = img
    for _ in range(3):  # box^3 ~ Gaussian
        out = sampling.box_mean(out, radius)
    return out


def sharpen(rgb: jnp.ndarray, cfg: IspConfig) -> jnp.ndarray:
    """Noise-cored unsharp mask (sharpenWithIirLowPass)."""
    sharp = np.asarray(cfg.sharpening, np.float32)
    if not np.any(sharp != 0):
        return rgb
    low = iir_low_pass(rgb, cfg.sharpening_support)
    detail = rgb - low
    # noise coring: suppress amplification of tiny (noise) details
    core = 1.0 - jnp.exp(-jnp.abs(detail) * cfg.noise_core)
    return jnp.clip(rgb + jnp.asarray(sharp) * detail * core, 0.0, 1.0)


def process(raw: jnp.ndarray, cfg: IspConfig) -> jnp.ndarray:
    """RAW mosaic float [0,1] (H, W) -> RGB float [0,1] (H, W, 3).

    Stage order = executePipeline (CameraIsp.h:1227-1237)."""
    raw = jnp.asarray(raw, jnp.float32)
    h, w = raw.shape

    raw = companding(raw, cfg.companding_lut)

    # black level (per channel, on the mosaic)
    black = per_site(cfg.bayer_pattern, h, w, cfg.black_level)
    raw = (raw - black) / jnp.maximum(1.0 - black, 1e-6)

    # anti-vignette: separable H/V Bezier rolloff (CameraIsp.h:1096)
    roll_h = bezier(jnp.asarray(cfg.vignette_roll_off_h, jnp.float32), jnp.arange(w) / max(w - 1, 1))
    roll_v = bezier(jnp.asarray(cfg.vignette_roll_off_v, jnp.float32), jnp.arange(h) / max(h - 1, 1))
    vignette = roll_v[:, None, :] * roll_h[None, :, :]  # (H, W, 3)
    r_m, g_m, b_m = bayer_masks(cfg.bayer_pattern, h, w)
    vig_site = (
        r_m * vignette[..., 0] + g_m * vignette[..., 1] + b_m * vignette[..., 2]
    )
    raw = raw / jnp.maximum(vig_site, 1e-6)

    # white balance (on the mosaic)
    raw = raw * per_site(cfg.bayer_pattern, h, w, cfg.white_balance_gain)

    # clamp and stretch
    cmin = per_site(cfg.bayer_pattern, h, w, cfg.clamp_min)
    cmax = per_site(cfg.bayer_pattern, h, w, cfg.clamp_max)
    raw = jnp.clip(raw, cmin, cmax)

    raw = remove_stuck_pixels(
        raw, cfg.bayer_pattern, cfg.stuck_pixel_radius,
        cfg.stuck_pixel_threshold, cfg.stuck_pixel_darkness_threshold,
    )

    filt = cfg.demosaic_filter.upper()
    if filt == "EDGE_AWARE":
        rgb = demosaic_edge_aware(raw, cfg.bayer_pattern)
    elif filt == "FREQUENCY":
        rgb = demosaic_frequency(raw, cfg.bayer_pattern)
    elif filt in ("CHROMA_SUPPRESSED", "CHROMA_SUPRESSED_BILINEAR"):
        rgb = demosaic_chroma_suppressed(raw, cfg.bayer_pattern)
    else:
        rgb = demosaic_bilinear(raw, cfg.bayer_pattern)

    # color correct: CCM then saturation in Y/chroma space (colorCorrect)
    rgb = jnp.einsum("ij,hwj->hwi", jnp.asarray(cfg.ccm, jnp.float32), rgb)
    if cfg.saturation != 1.0:
        y = jnp.sum(rgb * jnp.asarray([0.299, 0.587, 0.114]), axis=-1, keepdims=True)
        rgb = y + (rgb - y) * cfg.saturation

    if cfg.apply_tone_curve:
        rgb = tone_curve(rgb, cfg)
    else:
        rgb = jnp.clip(rgb, 0.0, 1.0)

    return sharpen(rgb, cfg)


def mosaic(rgb: np.ndarray, pattern: str) -> np.ndarray:
    """RGB -> Bayer mosaic (testing helper / RigSimulator RAW output)."""
    h, w = rgb.shape[:2]
    r, g, b = (np.asarray(m) for m in bayer_masks(pattern, h, w))
    out = np.zeros((h, w), np.float32)
    out[r] = rgb[..., 0][r]
    out[g] = rgb[..., 1][g]
    out[b] = rgb[..., 2][b]
    return out
