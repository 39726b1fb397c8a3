"""Edge-aware disparity filters: joint bilateral (spatial + temporal) and
masked median, vectorized over whole images.

Reference kernels: ``depth_estimation/TemporalBilateralFilter.h:39-215``
(generalizedJointBilateralFilter / temporalJointBilateralFilter) and
``util/CvUtil.h:336-385`` (maskedMedianBlur). The scalar window loops become
an on-device loop over window offsets of fused shifted-image ops, so each
offset is one multiply-add sweep over the image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Spatial bilateral constants (Derp.h:43-48); weights in RGB channel order.
BILATERAL_SPACE_RADIUS_MIN = 1
BILATERAL_SPACE_RADIUS_MAX = 5
BILATERAL_SIGMA = 0.005
BILATERAL_WEIGHTS_RGB = (1.0, 1.0, 0.5)


def _shift(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Clamp-to-edge shifted view: out[y, x] = img[clip(y+dy), clip(x+dx)].

    Static shifts compile to edge-pad + slice (no gathers), which XLA fuses;
    fancy indexing here would emit two gather ops per tap and blow up both
    compile and run time in the 121-tap bilateral unroll.
    """
    h, w = img.shape[:2]
    pad = [(max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0))] + [(0, 0)] * (img.ndim - 2)
    padded = jnp.pad(img, pad, mode="edge")
    y0, x0 = max(dy, 0), max(dx, 0)
    return jax.lax.slice(
        padded, (y0, x0) + (0,) * (img.ndim - 2), (y0 + h, x0 + w) + padded.shape[2:]
    )


def joint_bilateral(
    image: jnp.ndarray,  # (H, W) values to filter
    guide: jnp.ndarray,  # (H, W, 3) color guide in [0,1]
    mask: jnp.ndarray,  # (H, W) bool
    radius: int,
    sigma: float = BILATERAL_SIGMA,
    weights=BILATERAL_WEIGHTS_RGB,
) -> jnp.ndarray:
    """Color-guided joint bilateral filter.

    TemporalBilateralFilter.h:39-124: weight = exp(-(sum_c w_c dc^2 / 3) /
    (2 sigma^2)); masked-out samples skipped; masked-out centers pass through.
    """
    w_c = jnp.asarray(weights, guide.dtype)
    maskf = mask.astype(image.dtype)
    sum_w = jnp.zeros_like(image)
    sum_wv = jnp.zeros_like(image)
    inv = 1.0 / (2.0 * sigma * sigma)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            g = _shift(guide, dy, dx)
            m = _shift(maskf, dy, dx)
            v = _shift(image, dy, dx)
            d = guide - g
            dist = jnp.sum(w_c * d * d, axis=-1) / 3.0
            weight = jnp.exp(-dist * inv) * m
            sum_w += weight
            sum_wv += weight * v
    filtered = sum_wv / jnp.where(sum_w == 0, 1.0, sum_w)
    out = jnp.where(sum_w == 0, image, filtered)
    return jnp.where(mask, out, image)


def _sorting_network_pairs(n: int) -> list[tuple[int, int]]:
    """Batcher odd-even mergesort comparator pairs for ``n`` inputs.

    Built over the next power of two with out-of-range comparators dropped
    (the dropped lanes behave as +inf padding, which never needs to move
    down); validated exhaustively by the 0-1 principle in the test suite.
    """
    size = 1
    while size < n:
        size <<= 1
    pairs: list[tuple[int, int]] = []
    p = 1
    while p < size:
        k = p
        while k >= 1:
            for j in range(k % p, size - k, 2 * k):
                for i in range(k):
                    if (i + j) // (p * 2) == (i + j + k) // (p * 2):
                        if i + j + k < n:
                            pairs.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return pairs


def masked_median(
    image: jnp.ndarray,  # (H, W)
    background: jnp.ndarray | None,  # (H, W) or None
    mask: jnp.ndarray,  # (H, W) bool
    radius: int,
    ignore_nan: bool = True,
) -> jnp.ndarray:
    """Median over in-bounds, masked, non-NaN/non-zero window samples.

    util/CvUtil.h:336-385: unmasked centers take the background value (or 0);
    masked centers with an empty window take 0.
    """
    h, w = image.shape
    k = 2 * radius + 1
    vals = []
    valid = []
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            in_bounds = ((ys + dy >= 0) & (ys + dy < h))[:, None] & (
                (xs + dx >= 0) & (xs + dx < w)
            )[None, :]
            v = _shift(image, dy, dx)
            m = _shift(mask, dy, dx) & in_bounds
            if ignore_nan:
                m &= jnp.isfinite(v) & (v != 0)
            vals.append(v)
            valid.append(m)
    # Sort the K planes with a Batcher odd-even network of elementwise
    # min/max (VPU-only) instead of jnp.sort + take_along_axis: the variadic
    # K-way sort plus two gathers was ~107 ms/map at 2K on the TPU, the
    # network runs in a few ms. Invalid samples become +FLT_MAX first, so
    # the network never sees NaNs (min/max would propagate them).
    big = jnp.asarray(jnp.finfo(image.dtype).max)
    planes = [jnp.where(m, v, big) for v, m in zip(vals, valid)]
    for i, j in _sorting_network_pairs(len(planes)):
        planes[i], planes[j] = jnp.minimum(planes[i], planes[j]), jnp.maximum(
            planes[i], planes[j]
        )
    n = jnp.sum(jnp.stack(valid), axis=0)
    half = n // 2
    # rank select without gathers: planes are sorted ascending per pixel, so
    # successively overwrite while the rank is still ahead
    upper = planes[0]
    lower = planes[0]
    for i in range(1, len(planes)):
        upper = jnp.where(half >= i, planes[i], upper)  # planes[half]
        lower = jnp.where(half - 1 >= i, planes[i], lower)  # planes[max(half-1, 0)]
    median = jnp.where(n % 2 == 1, upper, (lower + upper) / 2.0)
    out = jnp.where(n > 0, median, 0.0)
    passthrough = jnp.zeros_like(image) if background is None else background
    return jnp.where(mask, out, passthrough)


def temporal_bilateral(
    guides: jnp.ndarray,  # (T, H, W, 3)
    images: jnp.ndarray,  # (T, H, W)
    masks: jnp.ndarray,  # (T, H, W) bool
    frame_offset: int,
    sigma: float,
    spatial_radius: int,
    weights=BILATERAL_WEIGHTS_RGB,
) -> jnp.ndarray:
    """Cross-frame joint bilateral filter for one output frame.

    TemporalBilateralFilter.h:126-215. NOTE (reference parity): the value
    averaged is each frame's CENTER pixel; spatial offsets only shape the
    guide-difference weights.
    """
    w_c = jnp.asarray(weights, guides.dtype)
    ref_guide = guides[frame_offset]  # (H, W, 3)
    center_mask = masks[frame_offset]
    sum_w = jnp.zeros_like(images[0])
    sum_wv = jnp.zeros_like(images[0])
    inv_sigma_sq = 1.0 / (sigma * sigma)
    t_count = guides.shape[0]
    for t in range(t_count):
        center_val = images[t]
        for dy in range(-spatial_radius, spatial_radius + 1):
            for dx in range(-spatial_radius, spatial_radius + 1):
                g = _shift(guides[t], dy, dx)
                m = _shift(masks[t], dy, dx).astype(images.dtype)
                d = ref_guide - g
                dist = jnp.sum(w_c * d * d, axis=-1)
                weight = jnp.exp(-dist * inv_sigma_sq) * m
                sum_w += weight
                sum_wv += weight * center_val
    filtered = sum_wv / jnp.where(sum_w == 0, 1.0, sum_w)
    return jnp.where(center_mask, filtered, images[frame_offset])
