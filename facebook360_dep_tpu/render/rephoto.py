"""Rephotography quality metric: MSSIM / NCC score maps.

Reference: ``render/RephotographyUtil.h:20-183`` (Wang et al. 2004 SSIM with
Gaussian window sigma=1.5; NCC = SSIM with alpha=beta=0, gamma=1). The
"TOTAL average MSSIM" this produces is the reference's headline quality
number (90.0% on the test dataset, BASELINE.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

SSIM_SIGMA = 1.5  # RephotographyUtil.h:24-27
C1 = 0.0001  # (0.01 * L)^2, L = 1
C2 = 0.0009  # (0.03 * L)^2
C3 = C2 / 2.0


def gaussian_kernel(radius: int, sigma: float = SSIM_SIGMA, dtype=jnp.float32):
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    if sigma <= 0:  # OpenCV's default sigma from kernel size
        sigma = 0.3 * ((2 * radius + 1 - 1) * 0.5 - 1) + 0.8
    k = np.exp(-(x * x) / (2 * sigma * sigma))
    return jnp.asarray(k / k.sum(), dtype)


def gaussian_blur(img: jnp.ndarray, radius: int, sigma: float = SSIM_SIGMA) -> jnp.ndarray:
    """Separable Gaussian with reflect-101 borders (cv::GaussianBlur default).

    Implemented as weighted sums over shifted images (radius is small — the
    metric's stat_radius default is 1), which XLA fuses into two sweeps.
    """
    if radius < 1:
        return img
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    k = gaussian_kernel(radius, sigma, img.dtype)
    p = jnp.pad(img, [(radius, radius), (radius, radius), (0, 0)], mode="reflect")
    h, w = img.shape[:2]
    out_rows = sum(k[i + radius] * p[radius + i : radius + i + h, :, :] for i in range(-radius, radius + 1))
    out = sum(k[j + radius] * out_rows[:, radius + j : radius + j + w, :] for j in range(-radius, radius + 1))
    return out[..., 0] if squeeze else out


def compute_ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    blur_radius: int = 1,
    alpha: float = 1.0,
    beta: float = 1.0,
    gamma: float = 1.0,
) -> jnp.ndarray:
    """Per-pixel, per-channel SSIM map for float RGB images in [0, 1].

    RephotographyUtil.h:56-106. NCC: alpha=beta=0, gamma=1.
    """
    mu_x = gaussian_blur(x, blur_radius)
    mu_y = gaussian_blur(y, blur_radius)
    mu2_x, mu2_y, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sig2_x = gaussian_blur((x - mu_x) * (x - mu_x), blur_radius)
    sig2_y = gaussian_blur((y - mu_y) * (y - mu_y), blur_radius)
    sig_xy = gaussian_blur((x - mu_x) * (y - mu_y), blur_radius)
    sig_x = jnp.sqrt(jnp.maximum(sig2_x, 0.0))
    sig_y = jnp.sqrt(jnp.maximum(sig2_y, 0.0))

    luminance = (2 * mu_xy + C1) / (mu2_x + mu2_y + C1)
    contrast = (2 * sig_x * sig_y + C2) / (sig2_x + sig2_y + C2)
    structure = (sig_xy + C3) / (sig_x * sig_y + C3)
    return (
        jnp.power(luminance, alpha) * jnp.power(contrast, beta) * jnp.power(structure, gamma)
    )


def compute_score_map(method: str, x, y, blur_radius: int = 1) -> jnp.ndarray:
    if method == "MSSIM":
        return compute_ssim(x, y, blur_radius, 1.0, 1.0, 1.0)
    if method == "NCC":
        return compute_ssim(x, y, blur_radius, 0.0, 0.0, 1.0)
    raise ValueError(f"invalid method {method}")


def average_score(score_map, mask=None) -> np.ndarray:
    """Per-channel mean over (mask & non-NaN) pixels (RephotographyUtil.h:108-127)."""
    s = np.asarray(score_map)
    out = np.zeros(s.shape[-1])
    for c in range(s.shape[-1]):
        ch = s[..., c]
        m = np.isfinite(ch)
        if mask is not None:
            m &= np.asarray(mask) > 0
        out[c] = ch[m].mean() if m.any() else 0.0
    return out


def format_results(avg_rgb) -> str:
    return f"R {100*avg_rgb[0]:.2f}%, G {100*avg_rgb[1]:.2f}%, B {100*avg_rgb[2]:.2f}%"
