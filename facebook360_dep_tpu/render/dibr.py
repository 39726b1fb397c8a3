"""Depth-image-based rendering: novel-view cubemaps/equirects from per-camera
color + disparity.

TPU-native replacement for the reference's GL rasterization path
(``render/CanopyScene.h:19-74``: per-camera disparity meshes rendered with
alpha accumulation; ``render/RigScene.cpp`` fragment cone weights +
exponential alpha blend). Instead of rasterizing triangles we:

  1. forward-splat every camera's per-pixel world points into the target
     view's z-buffer (scatter-min over ray distance, 2x2 footprints),
  2. close small z-buffer holes with a max-radius neighborhood fill,
  3. inverse-gather color: unproject each target pixel at the splatted depth,
     sample every camera that sees the point, weight by the reference's
     radial cone alpha (RigScene.cpp:244-259) gated by per-camera occlusion
     (the camera's own depth must agree with the sample depth).

Same inputs/outputs as the reference's offline renderers; exact pixels differ
(splat vs raster) but the rephotography metric is computed identically on both.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import camera as cam
from ..ops import sampling

# GL cubemap face order: +x, -x, +y, -y, +z, -z
_FACE_AXES = [
    # (major axis, sign, u expression index+sign, v expression index+sign)
    (0, +1, (2, -1), (1, -1)),
    (0, -1, (2, +1), (1, -1)),
    (1, +1, (0, +1), (2, +1)),
    (1, -1, (0, +1), (2, -1)),
    (2, +1, (0, +1), (1, -1)),
    (2, -1, (0, -1), (1, -1)),
]


def dir_to_cube(v: jnp.ndarray, face_size: int):
    """Directions (..., 3) -> (face, x, y) cube coordinates (pixel centers)."""
    av = jnp.abs(v)
    major = jnp.argmax(av, axis=-1)
    sign = jnp.take_along_axis(jnp.sign(v), major[..., None], axis=-1)[..., 0]
    face = major * 2 + (sign < 0)
    m = jnp.take_along_axis(av, major[..., None], axis=-1)[..., 0]
    m = jnp.maximum(m, 1e-20)

    u = jnp.zeros_like(m)
    w = jnp.zeros_like(m)
    for f, (axis, s, (ui, us), (vi, vs)) in enumerate(_FACE_AXES):
        sel = face == f
        u = jnp.where(sel, us * v[..., ui] / m, u)
        w = jnp.where(sel, vs * v[..., vi] / m, w)
    x = (u + 1.0) * 0.5 * face_size
    y = (w + 1.0) * 0.5 * face_size
    return face, x, y


def cube_dirs(face_size: int, dtype=jnp.float32) -> jnp.ndarray:
    """(6, S, S, 3) unit view directions for every cube pixel."""
    grid = sampling.pixel_center_grid(face_size, face_size, dtype)
    u = grid[..., 0] / face_size * 2.0 - 1.0
    w = grid[..., 1] / face_size * 2.0 - 1.0
    faces = []
    for axis, s, (ui, us), (vi, vs) in _FACE_AXES:
        v = [None, None, None]
        v[axis] = jnp.full_like(u, float(s))
        v[ui] = us * u
        v[vi] = vs * w
        faces.append(jnp.stack(v, axis=-1))
    d = jnp.stack(faces)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def equirect_dirs(width: int, height: int, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 3) directions matching worldToEquirect (util/ImageUtil.cpp:127-140)."""
    grid = sampling.pixel_center_grid(height, width, dtype)
    u = grid[..., 0] / width
    v = grid[..., 1] / height
    theta = -u * 2.0 * jnp.pi
    phi = v * jnp.pi
    return jnp.stack(
        [jnp.sin(phi) * jnp.cos(theta), jnp.sin(phi) * jnp.sin(theta), jnp.cos(phi)], axis=-1
    )


def world_to_equirect(v: jnp.ndarray, width: int, height: int):
    depth = jnp.linalg.norm(v, axis=-1)
    d = v / jnp.maximum(depth, 1e-20)[..., None]
    phi = jnp.arccos(jnp.clip(d[..., 2], -1.0, 1.0))
    theta = jnp.arctan2(d[..., 1], d[..., 0])
    theta = jnp.where(theta > 0, theta - 2 * jnp.pi, theta)
    return (-theta / (2 * jnp.pi)) * width, (phi / jnp.pi) * height


def _splat_depth(flat_idx, dist, valid, num_pixels):
    zbuf = jnp.full((num_pixels,), jnp.inf, dist.dtype)
    idx = jnp.where(valid, flat_idx, 0)
    d = jnp.where(valid, dist, jnp.inf)
    return zbuf.at[idx.reshape(-1)].min(d.reshape(-1))


def _fill_holes(zbuf2d: jnp.ndarray, iterations: int = 2) -> jnp.ndarray:
    """Replace inf holes with the min of their 3x3 neighborhood, iterated."""
    def body(z, _):
        neg = jnp.where(jnp.isinf(z), -jnp.inf, -z)
        grown = -jax.lax.reduce_window(
            neg, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
        )
        return jnp.where(jnp.isinf(z), grown, z), None

    out, _ = jax.lax.scan(body, zbuf2d, None, length=iterations)
    return out


# --- Omni-directional-stereo (ODS) IPD warp --------------------------------
#
# The reference renders stereo by warping mono geometry per vertex so each
# viewing ray originates on a pupil circle in the equatorial plane whose
# diameter fades with latitude (RigScene.cpp:86-131; the same shader block in
# CanopyScene.cpp:77-133 drives the offline tbstereo/lr180 exports, fed
# halfIpdM = +-0.032 by SimpleMeshRenderer.cpp:407-427 — note the uniform
# carries HALF the average human IPD there; we mirror that convention).
# ``ipd_m`` below is that uniform: positive = left eye, negative = right.

_IPD_FALLOFF_SHARPNESS = 25.0  # kA (RigScene.cpp:89)
_IPD_FALLOFF_ONSET = 0.17  # kB: rolloff begins ~60 deg from the equator


def ods_ipd(lat, ipd_m):
    """Latitude-dependent pupil-circle diameter: ``ipd_m`` on an equatorial
    band, double-exponential (Gumbel-like) rolloff to 0 at both poles
    (RigScene.cpp:88-95). ``lat`` in radians, +pi/2 = +z pole."""
    a, b = _IPD_FALLOFF_SHARPNESS, _IPD_FALLOFF_ONSET
    t = lat / jnp.pi
    return ipd_m * jnp.exp(-jnp.exp(a * (b - 0.5 - t)) - jnp.exp(a * (b - 0.5 + t)))


def ods_eye_offset(points, ipd_m):
    """Per-point ODS pupil position (viewer-centered coords, z up).

    For a point p, the eye lies on the circle of radius ipd(lat)/2 in the
    z=0 plane such that the view ray e->p is tangent to the circle:
    |p.xy|^2 = |e|^2 + d^2 with d the in-plane ray length and
    lat = atan(p.z / d). Solved like the reference (RigScene.cpp:97-131):
    initial estimate from lat ~ atan(z / |p.xy|), two Newton iterations on
    the tangency residual, then the 2x2 linear solve for e — here in the
    multiplied-through form e = s*(s*p.x - d*p.y, d*p.x + s*p.y)/(s^2+d^2)
    (s = signed ipd/2), which is exact and pole-stable (s -> 0 => e -> 0)
    where the reference's mat2 inverse would divide by zero.
    Returns (..., 3) eye positions with z = 0.
    """
    p = jnp.asarray(points, jnp.float32)
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    rxy2 = x * x + y * y

    def half_ipd(d):
        return 0.5 * ods_ipd(jnp.arctan2(z, d), ipd_m)

    def residual(d):
        e = half_ipd(d)
        return rxy2 - e * e - d * d

    e0 = half_ipd(jnp.sqrt(rxy2))
    d = jnp.sqrt(jnp.maximum(rxy2 - e0 * e0, 1e-12))
    for _ in range(2):  # the reference's iteration count (RigScene.cpp:113)
        step = 1e-3 * d + 1e-12
        slope = (residual(d + step) - residual(d)) / step
        # residual' ~ -2d for slowly-varying ipd; never divide by ~0
        slope = jnp.where(jnp.abs(slope) > 1e-12, slope, -2.0 * jnp.maximum(d, 1e-6))
        d = jnp.maximum(d - residual(d) / slope, 0.0)

    s = half_ipd(d)
    denom = jnp.maximum(s * s + d * d, 1e-20)
    ex = s * (s * x - d * y) / denom
    ey = s * (d * x + s * y) / denom
    return jnp.stack([ex, ey, jnp.zeros_like(ex)], axis=-1)


def ods_warp(points, ipd_m):
    """Mono -> stereo geometry: p' = p - eye(p) (cameraVS, RigScene.cpp:152-155)."""
    return points - ods_eye_offset(points, ipd_m)


def ods_unwarp(warped, ipd_m, iterations: int = 2):
    """Inverse of :func:`ods_warp` by fixed point: p = p' + eye(p). The eye
    offset is <= ipd/2 (~3 cm) and varies slowly, so two iterations recover
    p to sub-micron error at scene scale."""
    p = warped
    for _ in range(iterations):
        p = warped + ods_eye_offset(p, ipd_m)
    return p


def exp_alpha(cone):
    """RigScene's exponential accumulation weight ``a' = exp(30 a) - 1``
    (exponentialFS, RigScene.cpp:281-292; applied per subframe by
    updateAccumulation :1009). cone in [0, 1]."""
    return jnp.exp(30.0 * cone) - 1.0


def resolve_fade(displacement_m):
    """Displacement-based resolve fade (RigScene::render :1087-1095):
    1 until 0.5 m from the rig center, ramps to 0.05 at 0.75 m; squared at
    resolve time to die off faster."""
    k_begin, k_end, k_min = 0.5, 0.75, 0.05
    f = k_min + (1.0 - k_min) * jnp.clip((displacement_m - k_end) / (k_begin - k_end), 0.0, 1.0)
    return f * f


def accumulate_resolve(colors, cones, fade=1.0):
    """The exact updateAccumulation + resolveAccumulation chain
    (RigScene.cpp:1009-1035): per-subframe weight exp(30*cone)-1,
    premultiplied additive blend, resolve divide by accumulated alpha with
    ``fade``. colors (N, H, W, 3); cones (N, H, W) in [0, 1] (0 = subframe
    does not cover the pixel). Returns (rgb (H, W, 3), alpha (H, W))."""
    colors = jnp.asarray(colors, jnp.float32)
    w = jnp.where(jnp.asarray(cones) > 0.0, exp_alpha(jnp.asarray(cones, jnp.float32)), 0.0)
    acc_rgb = jnp.sum(w[..., None] * colors, axis=0)
    acc_a = jnp.sum(w, axis=0)
    rgb = jnp.where(acc_a[..., None] > 0.0, fade * acc_rgb / jnp.maximum(acc_a, 1e-20)[..., None], 0.0)
    return rgb, acc_a


@partial(jax.jit, static_argnames=("face_size", "mode", "width", "height", "ipd"))
def render_view(
    rig_cams: cam.Camera,  # stacked (N,), normalized
    colors: jnp.ndarray,  # (N, H, W, 3)
    disparities: jnp.ndarray,  # (N, H, W)
    center: jnp.ndarray,  # (3,)
    face_size: int = 0,
    mode: str = "cube",
    width: int = 0,
    height: int = 0,
    ipd: float = 0.0,
):
    """Render (color, disparity, alpha) of the scene seen from ``center``.

    mode="cube": returns (6, S, S, ...) faces; mode="equirect": (H, W, ...).
    Nonzero ``ipd`` renders one ODS stereo eye (positive = left, negative =
    right; value = the reference's half-IPD uniform, see ods_eye_offset):
    geometry is warped by :func:`ods_warp` before the splat (the vertex-
    shader side, RigScene.cpp:152-155) and camera correspondence/occlusion
    run on the unwarped mono points (the reference samples the unmodified
    texVar for the warped vertex)."""
    n, h, w = colors.shape[:3]
    grid = sampling.pixel_center_grid(h, w) / jnp.asarray([w, h], jnp.float32)
    center = jnp.asarray(center, jnp.float32)

    if mode == "cube":
        out_hw = (6 * face_size, face_size)
        target_dirs = cube_dirs(face_size).reshape(-1, face_size, 3)
    else:
        out_hw = (height, width)
        target_dirs = equirect_dirs(width, height)
    num_pixels = out_hw[0] * out_hw[1]

    def project_out(v):
        """world-offset vectors -> (flat index, in-bounds) in the target view."""
        if mode == "cube":
            face, x, y = dir_to_cube(v, face_size)
            xi = jnp.clip(x.astype(jnp.int32), 0, face_size - 1)
            yi = jnp.clip(y.astype(jnp.int32), 0, face_size - 1)
            return (face * face_size + yi) * face_size + xi, jnp.isfinite(x) & jnp.isfinite(y)
        x, y = world_to_equirect(v, width, height)
        xi = jnp.clip(x.astype(jnp.int32), 0, width - 1)
        yi = jnp.clip(y.astype(jnp.int32), 0, height - 1)
        return yi * width + xi, jnp.isfinite(x) & jnp.isfinite(y)

    # --- stage 1: forward splat depths ------------------------------------
    def one_cam_splat(carry, inputs):
        zbuf = carry
        c, disp = inputs
        depth = 1.0 / jnp.maximum(disp, 1e-12)
        world = cam.rig_point(c, grid, depth)
        v = world - center
        if ipd:
            v = ods_warp(v, ipd)
        dist = jnp.linalg.norm(v, axis=-1)
        valid = jnp.isfinite(dist) & (disp > 0)
        idx, ok = project_out(v)
        zb = _splat_depth(idx, dist, valid & ok, num_pixels)
        return jnp.minimum(zbuf, zb), None

    zbuf0 = jnp.full((num_pixels,), jnp.inf, jnp.float32)
    zbuf, _ = jax.lax.scan(one_cam_splat, zbuf0, (rig_cams, disparities))
    zbuf = _fill_holes(zbuf.reshape(out_hw))

    # --- stage 2: inverse gather colors ------------------------------------
    world = center + target_dirs.reshape(out_hw + (3,)) * zbuf[..., None]
    if ipd:
        # the z-buffer lives in warped (stereo) space; cameras see the mono
        # scene, so invert the warp before correspondence/occlusion
        world = center + ods_unwarp(world - center, ipd)
    alpha_valid = jnp.isfinite(zbuf)

    def one_cam_gather(carry, inputs):
        sum_w, sum_wc = carry
        c, color, disp = inputs
        pix, sees_ok = cam.sees(c, world)
        coords = pix * jnp.asarray([w, h], jnp.float32)
        sampled = sampling.bilinear_sample(color, coords)
        # occlusion: the camera's own surface along this ray must agree
        cam_disp = sampling.bilinear_sample(disp, coords)
        cam_depth = 1.0 / jnp.maximum(cam_disp, 1e-12)
        point_depth = jnp.linalg.norm(world - c.position, axis=-1)
        visible = cam_depth >= 0.9 * point_depth
        # radial cone alpha: 1 at image center -> ~0 at the image edge
        # (cameraFS), then the reference's exponential accumulation weight
        # a' = exp(30 a) - 1 (exponentialFS / updateAccumulation,
        # RigScene.cpp:281-292,1009) — sharpens camera blending strongly
        # toward whichever camera sees the point most centrally
        centered = pix - 0.5
        r = 2.0 * jnp.linalg.norm(centered, axis=-1)
        cone = jnp.maximum(1.0 - r, 1.0 / 255.0)
        wgt = jnp.where(sees_ok & visible & jnp.isfinite(sampled[..., 0]), exp_alpha(cone), 0.0)
        return (sum_w + wgt, sum_wc + wgt[..., None] * jnp.nan_to_num(sampled)), None

    init = (jnp.zeros(out_hw, jnp.float32), jnp.zeros(out_hw + (3,), jnp.float32))
    (sum_w, sum_wc), _ = jax.lax.scan(one_cam_gather, init, (rig_cams, colors, disparities))
    color_out = sum_wc / jnp.maximum(sum_w, 1e-12)[..., None]
    alpha = alpha_valid & (sum_w > 0)
    disparity_out = jnp.where(alpha, 1.0 / jnp.maximum(zbuf, 1e-12), jnp.nan)
    color_out = jnp.where(alpha[..., None], color_out, 0.0)

    if mode == "cube":
        s = face_size
        return (
            color_out.reshape(6, s, s, 3),
            disparity_out.reshape(6, s, s),
            alpha.reshape(6, s, s),
        )
    return color_out, disparity_out, alpha


def render_cubemap(rig: cam.Rig, colors, disparities, center, face_size: int):
    """Convenience wrapper: normalized rig -> stacked (6S, S) cubemap images."""
    nrig = cam.normalize_rig(rig) if not cam.is_normalized(rig.camera(0)) else rig
    cams = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float32) if jnp.asarray(a).dtype.kind == "f" else jnp.asarray(a),
        nrig.cameras,
    )
    color, disp, alpha = render_view(
        cams,
        jnp.asarray(colors, jnp.float32),
        jnp.asarray(disparities, jnp.float32),
        jnp.asarray(center, jnp.float32),
        face_size=face_size,
        mode="cube",
    )
    return np.asarray(color), np.asarray(disp), np.asarray(alpha)


def render_equirect(rig: cam.Rig, colors, disparities, center, width: int, height: int,
                    ipd: float = 0.0):
    nrig = cam.normalize_rig(rig) if not cam.is_normalized(rig.camera(0)) else rig
    cams = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float32) if jnp.asarray(a).dtype.kind == "f" else jnp.asarray(a),
        nrig.cameras,
    )
    color, disp, alpha = render_view(
        cams,
        jnp.asarray(colors, jnp.float32),
        jnp.asarray(disparities, jnp.float32),
        jnp.asarray(center, jnp.float32),
        mode="equirect",
        width=width,
        height=height,
        ipd=float(ipd),
    )
    return np.asarray(color), np.asarray(disp), np.asarray(alpha)
