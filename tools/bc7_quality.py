"""BC7 encoder quality harness (VERDICT #9).

Measures the native mode-6 encoder's PSNR on photo-like content and compares
it against a *mode-6 upper bound*: per block, the least-squares-optimal
16-level palette along the PCA axis with UNQUANTIZED endpoints (everything a
mode-6 encoder could do, minus the 7+1-bit endpoint rounding). The dB gap to
that bound is the encoder's true headroom — a known-good encoder (e.g. the
reference's vendored ispc_texcomp, ISPC.cmake:1-70) operates inside the same
bound, so a small gap certifies quality without shipping a second encoder.

Usage: python tools/bc7_quality.py  ->  one JSON line of metrics.
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

BC7_WEIGHTS4 = np.array(
    [0, 4, 9, 13, 17, 21, 26, 30, 34, 38, 43, 47, 51, 55, 60, 64], np.float32
)


def photo_block_set(size: int = 256, seed: int = 5) -> np.ndarray:
    """Photo-like RGBA8 test image: smooth multi-frequency texture with
    occasional hard edges (the regime ConvertToBinary feeds the encoder)."""
    from facebook360_dep_tpu.render.raytrace import perlin_fbm

    import jax.numpy as jnp

    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    pts = np.stack([xx * 4, yy * 4, np.zeros_like(xx)], axis=-1)
    r = np.asarray(perlin_fbm(jnp.asarray(pts), octaves=5))
    g = np.asarray(perlin_fbm(jnp.asarray(pts + 11.0), octaves=5))
    b = np.asarray(perlin_fbm(jnp.asarray(pts + 23.0), octaves=5))
    img = np.stack([r, g, b], axis=-1) * 0.5 + 0.5
    # hard depth-edge style discontinuity + specular-ish highlights
    img[yy > 0.6 + 0.1 * np.sin(xx * 9)] *= 0.35
    rng = np.random.RandomState(seed)
    img += rng.randn(size, size, 3) * 0.01  # sensor noise
    rgba = np.concatenate(
        [np.clip(img * 255, 0, 255), np.full((size, size, 1), 255.0)], axis=-1
    )
    return rgba.astype(np.uint8)


def _blocks(img: np.ndarray) -> np.ndarray:
    h, w = img.shape[:2]
    return (
        img.reshape(h // 4, 4, w // 4, 4, 4)
        .transpose(0, 2, 1, 3, 4)
        .reshape(-1, 16, 4)
        .astype(np.float32)
    )


def mode6_upper_bound(img: np.ndarray, ls_rounds: int = 8) -> np.ndarray:
    """Best achievable mode-6 reconstruction with unquantized endpoints:
    PCA axis -> 16-level assignment -> least-squares endpoint refit, iterated.
    Vectorized over all blocks. Returns the reconstructed image (float)."""
    px = _blocks(img)  # (B, 16, 4)
    mean = px.mean(axis=1, keepdims=True)
    d = px - mean
    cov = np.einsum("bik,bil->bkl", d, d)
    _, vecs = np.linalg.eigh(cov)
    axis = vecs[..., -1]  # (B, 4) principal axis
    t = np.einsum("bik,bk->bi", d, axis)
    e0 = mean[:, 0] + t.min(axis=1, keepdims=True).transpose(0, 1) * axis
    e1 = mean[:, 0] + t.max(axis=1, keepdims=True).transpose(0, 1) * axis
    w_pal = BC7_WEIGHTS4 / 64.0
    for _ in range(ls_rounds):
        dirv = e1 - e0  # (B, 4)
        len2 = np.maximum(np.einsum("bk,bk->b", dirv, dirv), 1e-10)
        tt = np.einsum("bik,bk->bi", px - e0[:, None], dirv) / len2[:, None]
        idx = np.clip(np.searchsorted(
            (w_pal[1:] + w_pal[:-1]) / 2.0, np.clip(tt, 0, 1).ravel()
        ).reshape(tt.shape), 0, 15)
        w = w_pal[idx]  # (B, 16)
        a00 = ((1 - w) ** 2).sum(axis=1)
        a01 = ((1 - w) * w).sum(axis=1)
        a11 = (w**2).sum(axis=1)
        b0 = np.einsum("bi,bik->bk", 1 - w, px)
        b1 = np.einsum("bi,bik->bk", w, px)
        det = a00 * a11 - a01 * a01
        ok = np.abs(det) > 1e-8
        e0n = (a11[:, None] * b0 - a01[:, None] * b1) / np.where(ok, det, 1.0)[:, None]
        e1n = (a00[:, None] * b1 - a01[:, None] * b0) / np.where(ok, det, 1.0)[:, None]
        e0 = np.where(ok[:, None], np.clip(e0n, 0, 255), e0)
        e1 = np.where(ok[:, None], np.clip(e1n, 0, 255), e1)
    recon = e0[:, None] + w[..., None] * (e1 - e0)[:, None]
    h, wd = img.shape[:2]
    return (
        recon.reshape(h // 4, wd // 4, 4, 4, 4)
        .transpose(0, 2, 1, 3, 4)
        .reshape(h, wd, 4)
    )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64)[..., :3] - b.astype(np.float64)[..., :3]) ** 2)
    return float(10.0 * np.log10(255.0**2 / max(mse, 1e-12)))


def run(size: int = 256) -> dict:
    from facebook360_dep_tpu.stream import native

    img = photo_block_set(size)
    h, w = img.shape[:2]
    blocks = native.compress_bc7(img)
    decoded = native.decompress_bc7(blocks, w, h)
    encoder_psnr = psnr(img, decoded)
    bound = mode6_upper_bound(img)
    bound_psnr = psnr(img, np.clip(bound + 0.5, 0, 255).astype(np.uint8))
    return {
        "metric": "bc7_mode6_psnr_db",
        "value": round(encoder_psnr, 2),
        "unit": "dB",
        "detail": {
            "mode6_unquantized_bound_db": round(bound_psnr, 2),
            "gap_to_bound_db": round(bound_psnr - encoder_psnr, 2),
            "image": f"{w}x{h} perlin photo set + edges + noise",
            "bytes_per_texel": 1,
        },
    }


if __name__ == "__main__":
    print(json.dumps(run()))
