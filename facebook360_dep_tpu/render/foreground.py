"""Foreground mask generation via background subtraction.

Reference: ``render/BackgroundSubtractionUtil.h:20-88`` — Gaussian blur both
images, threshold the RGB L2 difference, morphological closing to fill holes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import sampling
from . import rephoto


def generate_foreground_mask(
    background: jnp.ndarray,  # (H, W, 3) float [0,1]
    frame: jnp.ndarray,  # (H, W, 3)
    blur_radius: int = 1,
    threshold: float = 0.04,
    morph_closing_size: int = 4,
) -> jnp.ndarray:
    bg = rephoto.gaussian_blur(background[..., :3], blur_radius, sigma=0.0) if blur_radius > 0 else background[..., :3]
    fr = rephoto.gaussian_blur(frame[..., :3], blur_radius, sigma=0.0) if blur_radius > 0 else frame[..., :3]
    diff = jnp.abs(bg - fr)
    mask = jnp.linalg.norm(diff, axis=-1) > threshold
    if morph_closing_size > 0:
        r = morph_closing_size // 2
        if r > 0:
            mask = sampling.erode_bool(sampling.dilate_bool(mask, r), r)
    return mask


def generate_foreground_masks(backgrounds, frames, **kw):
    return jax.vmap(lambda b, f: generate_foreground_mask(b, f, **kw))(
        jnp.asarray(backgrounds), jnp.asarray(frames)
    )
