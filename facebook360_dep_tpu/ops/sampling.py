"""Vectorized image sampling and windowed filters.

These replace the reference's per-pixel scalar loops (``util/CvUtil.h:107-120``
``getPixelBilinear``, ``cv::blur`` calls) with whole-image XLA ops: the
bilinear gather is 4 flat gathers + lerp, and box sums are separable
reduce-windows that XLA fuses with surrounding elementwise work.

Coordinate convention: pixel (i, j)'s center sits at (j + 0.5, i + 0.5) —
identical to the reference's ``getPixelBilinear`` (round + half-texel shift)
with clamp-to-edge.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_center_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 2) array of (x + 0.5, y + 0.5) pixel-center coordinates."""
    ys = jax.lax.broadcasted_iota(dtype, (height, width), 0) + 0.5
    xs = jax.lax.broadcasted_iota(dtype, (height, width), 1) + 0.5
    return jnp.stack([xs, ys], axis=-1)


def bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Clamp-to-edge bilinear sampling.

    img: (H, W) or (H, W, C); coords: (..., 2) as (x, y) in the pixel-center
    convention. Non-finite coords produce NaN outputs (the reference skips
    such samples; callers mask instead).
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape

    x = coords[..., 0] - 0.5
    y = coords[..., 1] - 0.5
    finite = jnp.isfinite(x) & jnp.isfinite(y)
    x = jnp.where(finite, x, 0.0)
    y = jnp.where(finite, y, 0.0)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    # clamp each tap independently (off-edge taps collapse onto the edge pixel,
    # matching the reference's clampToEdge per-sample semantics)
    x0u = x0.astype(jnp.int32)
    y0u = y0.astype(jnp.int32)
    x0i = jnp.clip(x0u, 0, w - 1)
    x1i = jnp.clip(x0u + 1, 0, w - 1)
    y0i = jnp.clip(y0u, 0, h - 1)
    y1i = jnp.clip(y0u + 1, 0, h - 1)

    flat = img.reshape(h * w, c)

    def take(yi, xi):
        return jnp.take(flat, yi * w + xi, axis=0)

    top = take(y0i, x0i) * (1 - wx) + take(y0i, x1i) * wx
    bot = take(y1i, x0i) * (1 - wx) + take(y1i, x1i) * wx
    out = top * (1 - wy) + bot * wy
    out = jnp.where(finite[..., None], out, jnp.nan)
    return out[..., 0] if squeeze else out


def _pad_reflect101(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """OpenCV BORDER_DEFAULT (reflect without repeating the edge sample)."""
    return jnp.pad(img, [(radius, radius), (radius, radius)] + [(0, 0)] * (img.ndim - 2), mode="reflect")


def box_sum(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """(2r+1)^2 windowed sum with reflect-101 borders; separable.

    Small radii unroll to shifted adds (fuses into neighbors on TPU —
    reduce_window lowers an order of magnitude slower for 3x3 windows).
    """
    if radius == 0:
        return img
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    padded = _pad_reflect101(img, radius)
    k = 2 * radius + 1
    if radius <= 3:
        h, w = img.shape[:2]
        out = padded[:h + 2 * radius]
        acc = None
        for dy in range(k):
            term = padded[dy : dy + h]
            acc = term if acc is None else acc + term
        out2 = None
        for dx in range(k):
            term = acc[:, dx : dx + w]
            out2 = term if out2 is None else out2 + term
        out = out2
    else:
        out = jax.lax.reduce_window(
            padded, 0.0, jax.lax.add, (k, 1, 1), (1, 1, 1), "VALID"
        )
        out = jax.lax.reduce_window(out, 0.0, jax.lax.add, (1, k, 1), (1, 1, 1), "VALID")
    return out[..., 0] if squeeze else out


def box_mean(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    k = 2 * radius + 1
    return box_sum(img, radius) / (k * k)


def dilate_bool(mask: jnp.ndarray, radius: int = 1) -> jnp.ndarray:
    """8-connected boolean dilation (cv_util::dilate equivalent)."""
    m = mask.astype(jnp.float32)
    return box_sum(m, radius) > 0


def erode_bool(mask: jnp.ndarray, radius: int = 1) -> jnp.ndarray:
    m = mask.astype(jnp.float32)
    k = 2 * radius + 1
    return box_sum(m, radius) >= k * k


def rgb_variance(img: jnp.ndarray, radius: int = 1) -> jnp.ndarray:
    """Per-channel windowed variance, combined with the reference's RGB
    weights. DerpUtil.cpp:214-237 (kVarWinRadius=1, weights ~1/3 each)."""
    rgb = img[..., :3]
    mean = box_mean(rgb, radius)
    mean_sq = box_mean(rgb * rgb, radius)
    var = mean_sq - mean * mean
    weights = jnp.asarray([0.3333, 0.3334, 0.3333], dtype=img.dtype)
    return jnp.sum(var * weights, axis=-1)
