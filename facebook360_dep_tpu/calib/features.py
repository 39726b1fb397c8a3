"""Corner detection and epipolar ZNCC matching for rig calibration.

Reference: ``calibration/FeatureDetector.cpp:55-183`` (cv::goodFeaturesToTrack
per octave inside the FOV circle), ``calibration/FeatureMatcher.cpp`` (walk
depth samples along the epipolar curve, reproject the corner patch, ZNCC >=
0.75, mutual best match), ``calibration/MatchCorners.cpp`` (orchestration +
matches.json).

TPU-native redesign: Shi-Tomasi corner response as fused convolutions with
max-pool non-max suppression; all-pairs ZNCC as one normalized-patch matmul
on the MXU, gated by an epipolar proximity mask built from a vectorized depth
sweep (the reference's per-corner scalar walk, batched over every corner and
depth sample at once).
"""

from __future__ import annotations

import logging
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import camera as cam
from ..ops import sampling
from ..utils.hostmath import on_host

log = logging.getLogger("features")

MATCH_SCORE_THRESHOLD = 0.75  # FeatureMatcher flag default
PATCH_RADIUS = 5  # ZNCC patch 11x11 (Keypoint.h)
EPIPOLAR_RADIUS_PX = 4.0
NUM_DEPTH_SAMPLES = 32


class Corners(NamedTuple):
    xy: np.ndarray  # (N, 2) pixel centers, full-resolution units
    score: np.ndarray  # (N,)


def shi_tomasi_response(gray: jnp.ndarray, window_radius: int = 1) -> jnp.ndarray:
    """Min-eigenvalue corner response (what goodFeaturesToTrack maximizes)."""
    gx = (sampling.box_sum(jnp.roll(gray, -1, 1) - jnp.roll(gray, 1, 1), 0)) * 0.5
    gy = (sampling.box_sum(jnp.roll(gray, -1, 0) - jnp.roll(gray, 1, 0), 0)) * 0.5
    ixx = sampling.box_mean(gx * gx, window_radius)
    iyy = sampling.box_mean(gy * gy, window_radius)
    ixy = sampling.box_mean(gx * gy, window_radius)
    tr = ixx + iyy
    det = ixx * iyy - ixy * ixy
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
    return tr / 2.0 - disc  # min eigenvalue


@on_host
def detect_corners(
    gray: np.ndarray,
    max_corners: int = 2000,
    quality_level: float = 0.01,
    min_distance: int = 5,
    octaves: int = 1,
    fov_mask: np.ndarray | None = None,
) -> Corners:
    """Top-N corners with NMS, optionally over a scale pyramid
    (FeatureDetector.cpp:55-183)."""
    all_xy, all_score = [], []
    img = np.asarray(gray, np.float32)
    scale = 1.0
    for _ in range(max(octaves, 1)):
        resp = np.asarray(shi_tomasi_response(jnp.asarray(img)))
        if fov_mask is not None:
            from ..core import io as _io

            m = fov_mask
            if m.shape != resp.shape:
                m = _io.resize_image(m.astype(np.uint8), (resp.shape[1], resp.shape[0])) > 0
            resp = np.where(m, resp, -np.inf)
        # NMS: keep local maxima over a (2r+1)^2 window
        r = max(min_distance, 1)
        from scipy.ndimage import maximum_filter

        local_max = resp == maximum_filter(resp, size=2 * r + 1, mode="nearest")
        thresh = quality_level * np.nanmax(np.where(np.isfinite(resp), resp, 0))
        ys, xs = np.nonzero(local_max & (resp > thresh))
        scores = resp[ys, xs]
        order = np.argsort(-scores)[:max_corners]
        ys, xs = ys[order], xs[order]
        # subpixel refine: 1D quadratic fit through the response peak per axis
        # (the reference runs cv::cornerSubPix, FeatureDetector.cpp:55-183)
        rf = np.where(np.isfinite(resp), resp, 0.0)
        hgt, wid = rf.shape
        interior = (ys > 0) & (ys < hgt - 1) & (xs > 0) & (xs < wid - 1)
        yc, xc = np.clip(ys, 1, hgt - 2), np.clip(xs, 1, wid - 2)
        dx = 0.5 * (rf[yc, xc + 1] - rf[yc, xc - 1])
        dy = 0.5 * (rf[yc + 1, xc] - rf[yc - 1, xc])
        dxx = rf[yc, xc + 1] - 2 * rf[yc, xc] + rf[yc, xc - 1]
        dyy = rf[yc + 1, xc] - 2 * rf[yc, xc] + rf[yc - 1, xc]
        off_x = np.where(interior & (dxx < 0), -dx / np.where(dxx < 0, dxx, -1.0), 0.0)
        off_y = np.where(interior & (dyy < 0), -dy / np.where(dyy < 0, dyy, -1.0), 0.0)
        off_x, off_y = np.clip(off_x, -0.5, 0.5), np.clip(off_y, -0.5, 0.5)
        all_xy.append(np.stack([(xs + 0.5 + off_x) * scale, (ys + 0.5 + off_y) * scale], -1))
        all_score.append(scores[order])
        if img.shape[0] < 64 or img.shape[1] < 64:
            break
        img = img[::2, ::2]
        scale *= 2.0
    xy = np.concatenate(all_xy)
    score = np.concatenate(all_score)
    order = np.argsort(-score)[:max_corners]
    return Corners(xy[order], score[order])


def extract_patches(gray: jnp.ndarray, xy: jnp.ndarray, radius: int = PATCH_RADIUS) -> jnp.ndarray:
    """(N, (2r+1)^2) zero-mean unit-norm patches (Keypoint ZNCC form)."""
    offs = jnp.stack(
        jnp.meshgrid(
            jnp.arange(-radius, radius + 1, dtype=jnp.float32),
            jnp.arange(-radius, radius + 1, dtype=jnp.float32),
            indexing="xy",
        ),
        axis=-1,
    ).reshape(-1, 2)
    coords = xy[:, None, :] + offs[None, :, :]  # (N, P^2, 2)
    patches = sampling.bilinear_sample(gray, coords)  # (N, P^2)
    patches = patches - jnp.mean(patches, axis=1, keepdims=True)
    norm = jnp.linalg.norm(patches, axis=1, keepdims=True)
    return patches / jnp.maximum(norm, 1e-12)


def epipolar_proximity(
    cam_a: cam.Camera,
    cam_b: cam.Camera,
    xy_a: jnp.ndarray,  # (Na, 2) full-res pixels
    xy_b: jnp.ndarray,  # (Nb, 2)
    min_depth: float = 0.5,
    max_depth: float = 1e4,
    num_samples: int = NUM_DEPTH_SAMPLES,
    radius_px: float = EPIPOLAR_RADIUS_PX,
) -> jnp.ndarray:
    """(Na, Nb) bool: does corner b lie near the projection of corner a's ray
    at any sampled depth (the reference's getNextDepthSample walk, batched)."""
    fractions = jnp.arange(num_samples, dtype=jnp.float32) / (num_samples - 1)
    disparities = fractions * (1.0 / max_depth) + (1 - fractions) * (1.0 / min_depth)
    depths = 1.0 / disparities  # (D,)
    world = cam.rig_point(cam_a, xy_a[:, None, :], depths[None, :, None][..., 0])  # (Na, D, 3)
    proj, valid = cam.sees(cam_b, world)  # (Na, D, 2)
    d2 = jnp.sum((proj[:, None, :, :] - xy_b[None, :, None, :]) ** 2, axis=-1)  # (Na, Nb, D)
    d2 = jnp.where(valid[:, None, :], d2, jnp.inf)
    return jnp.min(d2, axis=-1) <= radius_px * radius_px


@on_host
def camera_overlap(cam_a: cam.Camera, cam_b: cam.Camera, probe_count: int = 10) -> float:
    """Fraction of cam_a's frame seen by cam_b at infinity (Camera::overlap,
    util/Camera.h:198-211)."""
    ys = jnp.linspace(0, 1, probe_count) * cam_a.resolution[1]
    xs = jnp.linspace(0, 1, probe_count) * cam_a.resolution[0]
    pix = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1).reshape(-1, 2)
    inside = ~cam.is_outside_image_circle(cam_a, pix)
    world = cam.rig_near_infinity(cam_a, pix)
    _, seen = cam.sees(cam_b, world)
    return float(jnp.mean(inside & seen))


@on_host
def match_pair(
    cam_a, cam_b, gray_a, gray_b, corners_a: Corners, corners_b: Corners,
    min_depth=0.5, max_depth=1e4, score_threshold=MATCH_SCORE_THRESHOLD,
):
    """Mutual-best ZNCC matches gated by the epipolar depth sweep.

    Returns (idx_a, idx_b, score) arrays.
    """
    xy_a = jnp.asarray(corners_a.xy, jnp.float32)
    xy_b = jnp.asarray(corners_b.xy, jnp.float32)
    pa = extract_patches(jnp.asarray(gray_a, jnp.float32), xy_a)
    pb = extract_patches(jnp.asarray(gray_b, jnp.float32), xy_b)
    zncc = pa @ pb.T  # (Na, Nb) on the MXU
    near = epipolar_proximity(cam_a, cam_b, xy_a, xy_b, min_depth, max_depth)
    score = jnp.where(near, zncc, -jnp.inf)

    best_b = jnp.argmax(score, axis=1)  # (Na,)
    best_a = jnp.argmax(score, axis=0)  # (Nb,)
    ia = jnp.arange(score.shape[0])
    mutual = best_a[best_b] == ia
    best_score = jnp.take_along_axis(score, best_b[:, None], axis=1)[:, 0]
    keep = mutual & (best_score >= score_threshold)

    keep = np.asarray(keep)
    idx_a = np.nonzero(keep)[0]
    idx_b = np.asarray(best_b)[idx_a]
    return idx_a, idx_b, np.asarray(best_score)[idx_a]


@on_host
def match_corners(
    rig: cam.Rig,
    grays: np.ndarray,  # (N, H, W) float gray images (green channel per ref)
    frame: str = "000000",
    min_depth: float = 0.5,
    max_depth: float = 1e4,
    max_corners: int = 2000,
    min_overlap: float = 0.05,
) -> dict:
    """Detect + match over all overlapping pairs; returns the matches.json
    dict (MatchCorners.cpp:258 schema)."""
    n = len(rig.ids)
    h, w = grays.shape[1:3]
    # cameras rescaled to image resolution: pixel units flow end to end
    cams = [
        jax.tree.map(
            lambda v: jnp.asarray(v, jnp.float32) if jnp.asarray(v).dtype.kind == "f" else jnp.asarray(v),
            cam.rescale(rig.camera(i), [w, h]),
        )
        for i in range(n)
    ]

    corners = []
    for i in range(n):
        c = detect_corners(grays[i], max_corners=max_corners, octaves=2)
        corners.append(c)
        log.info("%s: %d corners", rig.ids[i], len(c.xy))

    def image_id(i):
        return f"video/color/{rig.ids[i]}/{frame}.png"

    images = {
        image_id(i): [{"x": float(x), "y": float(y)} for x, y in corners[i].xy]
        for i in range(n)
    }
    all_matches = []
    for a in range(n):
        for b in range(a + 1, n):
            if camera_overlap(cams[a], cams[b]) < min_overlap:
                continue
            idx_a, idx_b, score = match_pair(
                cams[a], cams[b], grays[a], grays[b], corners[a], corners[b],
                min_depth, max_depth,
            )
            if len(idx_a) == 0:
                continue
            log.info("%s-%s: %d matches", rig.ids[a], rig.ids[b], len(idx_a))
            all_matches.append(
                {
                    "image1": image_id(a),
                    "image2": image_id(b),
                    "matches": [
                        {"idx1": int(i1), "idx2": int(i2), "score": float(s)}
                        for i1, i2, s in zip(idx_a, idx_b, score)
                    ],
                }
            )
    return {"images": images, "all_matches": all_matches}
