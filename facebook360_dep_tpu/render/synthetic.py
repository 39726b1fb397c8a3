"""Synthetic ground-truth scenes for end-to-end accuracy testing.

The reference uses RigSimulator (``rig/RigSimulator.cpp:37-64``) to raytrace a
textured world into rig cameras with true inverse-depth outputs — its
substitute for fixture-based testing. Here: vectorized ray casting against
procedurally-textured spheres/boxes using the same camera model the solver
uses, producing (color, ground-truth disparity) per camera.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..core import camera as cam
from ..ops import sampling


def procedural_texture(dirs: jnp.ndarray, seed: int = 7, octaves: int = 6) -> jnp.ndarray:
    """Smooth multi-frequency RGB texture over unit directions (...,3) -> (...,3) in [0,1]."""
    rng = np.random.RandomState(seed)
    color = jnp.zeros(dirs.shape[:-1] + (3,), dirs.dtype)
    total = 0.0
    for octave in range(octaves):
        freq = 2.0**octave
        amp = 1.0 / (octave + 1)
        vecs = jnp.asarray(rng.randn(3, 3) * freq, dirs.dtype)
        phase = jnp.asarray(rng.rand(3) * 2 * np.pi, dirs.dtype)
        color = color + amp * jnp.sin(dirs @ vecs.T * 3.0 + phase)
        total += amp
    return (color / total + 1.0) * 0.5


def ray_sphere_depth(origins, dirs, center, radius):
    """Distance along each ray to a sphere (rays assumed to start inside).

    origins/dirs: (..., 3); returns (...,) t > 0 (NaN if no hit).
    """
    oc = origins - jnp.asarray(center, dirs.dtype)
    b = jnp.sum(oc * dirs, axis=-1)
    c0 = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = b * b - c0
    t = -b + jnp.sqrt(jnp.maximum(disc, 0.0))
    return jnp.where(disc >= 0, t, jnp.nan)


def render_sphere_scene(rig: cam.Rig, size_wh, radius: float = 5.0, as_numpy: bool = True, center=(0.0, 0.0, 0.0), seed: int = 7):
    """Render every rig camera against a textured sphere.

    Returns (colors (N, H, W, 3), gt_disparity (N, H, W)). Cameras must sit
    inside the sphere; disparity = 1 / (camera-to-hit distance), matching the
    solver's definition (DerpUtil.cpp:38-52).

    With ``as_numpy=False`` the results stay on the default device — large
    benchmark fixtures should be generated and consumed on-device (a 2K
    16-camera stack is >0.5 GB; host round-trips through the device tunnel
    dominate wall-clock otherwise).
    """
    w, h = int(size_wh[0]), int(size_wh[1])
    nrig = cam.normalize_rig(rig)

    cams = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a), jnp.float32)
        if np.asarray(a).dtype.kind == "f"
        else jnp.asarray(np.asarray(a)),
        nrig.cameras,
    )

    @partial(jax.jit, static_argnames=("w", "h", "seed"))
    def render(cams, center, radius, w, h, seed):
        # grid built in-trace: an eagerly-captured (H, W, 2) constant makes
        # the remote-compile payload minutes-slow at 2K (see pipeline._fov_masks)
        grid = sampling.pixel_center_grid(h, w) / jnp.asarray([w, h], jnp.float32)

        def one(c):
            d = cam.ray_dir(c, grid)
            t = ray_sphere_depth(c.position, d, center, radius)
            hit = c.position + d * t[..., None]
            tex_dir = hit - center
            tex_dir = tex_dir / jnp.linalg.norm(tex_dir, axis=-1, keepdims=True)
            color = procedural_texture(tex_dir, seed)
            return color, 1.0 / t

        return jax.vmap(one)(cams)

    colors, disparity = render(
        cams, jnp.asarray(center, jnp.float32), jnp.float32(radius), w, h, seed
    )
    if as_numpy:
        return np.asarray(colors), np.asarray(disparity)
    return colors, disparity


def make_test_rig(
    num_cameras: int = 4,
    resolution=(64, 48),
    focal_scale: float = 0.45,
    ring_radius: float = 0.15,
    type_name: str = "RECTILINEAR",
) -> cam.Rig:
    """A small inward-facing... rather, forward-facing ring rig with parallax,
    for solver tests: cameras on a circle in the XY plane, all looking -Z."""
    w, h = resolution
    cams, ids = [], []
    for i in range(num_cameras):
        angle = 2 * np.pi * i / num_cameras
        pos = [ring_radius * np.cos(angle), ring_radius * np.sin(angle), 0.0]
        rotation = np.eye(3)  # right=+x, up=+y, backward=+z (looking -z)
        c = cam.make_camera(
            type_code=getattr(cam, type_name),
            position=pos,
            rotation=rotation,
            resolution=[w, h],
            focal=[focal_scale * w, -focal_scale * w],
        )
        cams.append(c)
        ids.append(f"cam{i}")
    return cam.Rig(cameras=cam.stack_cameras(cams), ids=tuple(ids), groups=("",) * num_cameras)


def make_outward_ring_rig(
    num_cameras: int = 16,
    resolution=(64, 48),
    focal_scale: float = 0.45,
    ring_radius: float = 0.3,
) -> cam.Rig:
    """The PRODUCTION 360 rig shape: cameras on a ring facing radially
    outward (the reference's 6DoF capture rigs, util/Camera.h rig JSONs).
    Only adjacent cameras overlap, so ~80% of (source, dst-tile) pairs are
    mutually invisible — the regime the sampler's visibility skip targets."""
    w, h = resolution
    cams, ids = [], []
    up = np.array([0.0, 0.0, 1.0])
    for k in range(num_cameras):
        a = 2 * np.pi * k / num_cameras
        fwd = np.array([np.cos(a), np.sin(a), 0.0])
        rot = np.stack([np.cross(up, fwd), up, -fwd], axis=0)
        cams.append(cam.make_camera(
            type_code=cam.RECTILINEAR,
            position=ring_radius * fwd,
            rotation=rot,
            resolution=[w, h],
            focal=[focal_scale * w, -focal_scale * w],
        ))
        ids.append(f"cam{k}")
    return cam.Rig(cameras=cam.stack_cameras(cams), ids=tuple(ids), groups=("",) * num_cameras)


def _looking_camera(type_code, fwd, position, resolution, focal,
                    distortion=(0.0, 0.0, 0.0), cos_fov=None):
    """Camera with rotation rows [right, up, -fwd] from a forward direction
    and world-up z (ringOfClones / makeFThetaCameraOnSphere, RigSimulator)."""
    fwd = np.asarray(fwd, np.float64)
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 0.0, 1.0])
    if abs(np.dot(up, fwd)) > 0.99:
        up = np.array([1.0, 0.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    return cam.make_camera(
        type_code=type_code,
        position=position,
        rotation=np.stack([right, up, -fwd], axis=0),
        resolution=list(resolution),
        focal=focal,
        distortion=distortion,
        cos_fov=cos_fov,
    )


# reference production-rig distortion (res/test/rigs/rig.json, 16-cam FTHETA):
# sensor-unit radial polynomial coefficients, resolution independent
PRODUCTION_FTHETA_DISTORTION = (-0.03413328161902581, 0.0004374554953464843,
                                -0.0018843963208481174)


def _ftheta_focal(resolution, image_circle_radius_px, circle_fov_deg):
    """makeGenericFTheta (RigSimulator.cpp:389-398): focal such that the
    image circle radius lands at half the circle FOV: f = 2 R / fov_rad."""
    f = 2.0 * image_circle_radius_px / np.radians(circle_fov_deg)
    return [f, -f]


def make_ftheta_ring_rig(
    num_cameras: int = 14,
    ring_radius: float = 0.33,
    resolution=(300, 400),
    image_circle_radius_px: float | None = None,
    circle_fov_deg: float = 166.667,
    distortion=(0.0, 0.0, 0.0),
    add_top: bool = True,
    top_offset: float = 0.13,
) -> cam.Rig:
    """Outward FTHETA fisheye ring + optional up-facing top camera — the
    reference's production rig shape (RigSimulator makeHorizontalRingOf
    FThetaCameras + addTopCamera; res/test/rigs/rig.json is this with 16
    side cameras). The fisheye FOV exceeds a hemisphere (166.7 deg at the
    image circle), so adjacent cameras share wide overlap bands exactly
    where the FTHETA Jacobian stretches."""
    w, h = resolution
    r_px = image_circle_radius_px if image_circle_radius_px is not None else 0.83 * min(w, h) / 2
    focal = _ftheta_focal(resolution, r_px, circle_fov_deg)
    cos_fov = float(np.cos(np.radians(circle_fov_deg) / 2))
    cams, ids = [], []
    for k in range(num_cameras):
        a = -2 * np.pi * k / num_cameras  # clockwise, ringOfClones
        fwd = np.array([np.cos(a), np.sin(a), 0.0])
        cams.append(_looking_camera(
            cam.FTHETA, fwd, ring_radius * fwd, resolution, focal,
            distortion, cos_fov))
        ids.append(f"cam{k}")
    if add_top:
        cams.append(_looking_camera(
            cam.FTHETA, (0.0, 0.0, 1.0), (0.0, 0.0, top_offset), resolution,
            focal, distortion, cos_fov))
        ids.append(f"cam{num_cameras}")
    return cam.Rig(cameras=cam.stack_cameras(cams), ids=tuple(ids), groups=("",) * len(ids))


# icosahedron vertices (unit-ish): cyclic permutations of (0, +-1, +-phi)
_PHI = (1.0 + np.sqrt(5.0)) / 2.0
ICOSAHEDRON_VERTS = np.array(
    [(0, s1, s2 * _PHI) for s1 in (-1, 1) for s2 in (-1, 1)]
    + [(s2 * _PHI, 0, s1) for s1 in (-1, 1) for s2 in (-1, 1)]
    + [(s1, s2 * _PHI, 0) for s1 in (-1, 1) for s2 in (-1, 1)],
    np.float64,
)
# dodecahedron vertices: (+-1,+-1,+-1) + cyclic perms of (0, +-1/phi, +-phi)
DODECAHEDRON_VERTS = np.array(
    [(a, b, c) for a in (-1, 1) for b in (-1, 1) for c in (-1, 1)]
    + [(0, s1 / _PHI, s2 * _PHI) for s1 in (-1, 1) for s2 in (-1, 1)]
    + [(s2 * _PHI, 0, s1 / _PHI) for s1 in (-1, 1) for s2 in (-1, 1)]
    + [(s1 / _PHI, s2 * _PHI, 0) for s1 in (-1, 1) for s2 in (-1, 1)],
    np.float64,
)


def make_polyhedron_rig(
    kind: str = "dodecahedron",
    sphere_radius: float = 0.25,
    resolution=(300, 400),
    image_circle_radius_px: float | None = None,
    circle_fov_deg: float = 166.667,
    distortion=(0.0, 0.0, 0.0),
) -> cam.Rig:
    """FTHETA cameras at platonic-solid vertices pointing outward
    (RigSimulator makeDodecahedronOfFThetaCameras: 12 cams at icosahedron
    vertices; makeIcosahedronOfFThetaCameras: 20 at dodecahedron verts)."""
    verts = ICOSAHEDRON_VERTS if kind == "dodecahedron" else DODECAHEDRON_VERTS
    w, h = resolution
    r_px = image_circle_radius_px if image_circle_radius_px is not None else 0.83 * min(w, h) / 2
    focal = _ftheta_focal(resolution, r_px, circle_fov_deg)
    cos_fov = float(np.cos(np.radians(circle_fov_deg) / 2))
    cams, ids = [], []
    for k, v in enumerate(verts):
        n = v / np.linalg.norm(v)
        cams.append(_looking_camera(
            cam.FTHETA, n, sphere_radius * n, resolution, focal, distortion, cos_fov))
        ids.append(f"cam{k}")
    return cam.Rig(cameras=cam.stack_cameras(cams), ids=tuple(ids), groups=("",) * len(ids))


def render_ods_equirect(width: int, height: int, ipd_radius: float = 0.032,
                        scene: str = "sphere", radius: float = 5.0,
                        half_extents=(6.0, 6.0, 3.0), seed: int = 7):
    """Omni-directional-stereo equirect pair (RigSimulator stereo_eqr mode,
    renderStereoEquirect): each column's eye sits on the view circle of
    radius ``ipd_radius``, offset along the local horizontal tangent."""
    from . import dibr

    dirs = dibr.equirect_dirs(width, height)  # (H, W, 3) unit
    up = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    tang = jnp.cross(jnp.broadcast_to(up, dirs.shape), dirs)
    tn = jnp.linalg.norm(tang, axis=-1, keepdims=True)
    tang = jnp.where(tn > 1e-6, tang / jnp.maximum(tn, 1e-6), 0.0)  # poles: mono

    def eye(sign):
        origins = sign * ipd_radius * tang
        if scene == "box":
            t = ray_box_depth(origins, dirs, half_extents)
        else:
            t = ray_sphere_depth(origins, dirs, (0.0, 0.0, 0.0), radius)
        hit = origins + dirs * t[..., None]
        tex = hit / jnp.maximum(jnp.linalg.norm(hit, axis=-1, keepdims=True), 1e-9)
        return procedural_texture(tex, seed, octaves=7 if scene == "box" else 6)

    return np.asarray(eye(-1.0)), np.asarray(eye(1.0))


def ray_box_depth(origins, dirs, half_extents=(6.0, 6.0, 3.0), center=(0.0, 0.0, 0.0)):
    """Distance along each ray to the inside of an axis-aligned box
    (rays start inside; the reference's textured box/ceiling world,
    rig/RigSimulator.cpp:37-64).

    origins/dirs: (..., 3); returns (...,) t > 0.
    """
    he = jnp.asarray(half_extents, dirs.dtype)
    oc = origins - jnp.asarray(center, dirs.dtype)
    # exit distance per axis: the positive root of |oc + t d| = he
    safe_d = jnp.where(jnp.abs(dirs) < 1e-12, 1e-12, dirs)
    t_pos = (he - oc) / safe_d
    t_neg = (-he - oc) / safe_d
    t_exit = jnp.maximum(t_pos, t_neg)  # per-axis exit
    return jnp.min(t_exit, axis=-1)


def render_box_scene(rig: cam.Rig, size_wh, half_extents=(6.0, 6.0, 3.0), as_numpy: bool = True,
                     center=(0.0, 0.0, 0.0), seed: int = 7):
    """Render every rig camera against a procedurally-textured box room
    (RigSimulator's box/ceiling world). Returns (colors, gt_disparity)."""
    w, h = int(size_wh[0]), int(size_wh[1])
    nrig = cam.normalize_rig(rig)
    cams = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a), jnp.float32)
        if np.asarray(a).dtype.kind == "f"
        else jnp.asarray(np.asarray(a)),
        nrig.cameras,
    )
    @partial(jax.jit, static_argnames=("w", "h", "seed"))
    def render(cams, center, half_extents, w, h, seed):
        grid = sampling.pixel_center_grid(h, w) / jnp.asarray([w, h], jnp.float32)

        def one(c):
            d = cam.ray_dir(c, grid)
            t = ray_box_depth(c.position, d, half_extents, center)
            hit = c.position + d * t[..., None]
            # texture by position on the box surface (normalized direction
            # from the center gives seams at edges only)
            tex_dir = hit - center
            tex_dir = tex_dir / jnp.maximum(jnp.linalg.norm(tex_dir, axis=-1, keepdims=True), 1e-9)
            color = procedural_texture(tex_dir, seed, octaves=7)
            return color, 1.0 / t

        return jax.vmap(one)(cams)

    colors, disparity = render(
        cams, jnp.asarray(center, jnp.float32), jnp.asarray(half_extents, jnp.float32), w, h, seed
    )
    if as_numpy:
        return np.asarray(colors), np.asarray(disparity)
    return colors, disparity


def ground_truth_equirect(rig: cam.Rig, width: int, height: int, scene: str = "sphere",
                          radius: float = 5.0, half_extents=(6.0, 6.0, 3.0), seed: int = 7):
    """True (color, disparity) equirects from the rig center — the
    reference RigSimulator's equirect truth outputs."""
    from . import dibr

    dirs = dibr.equirect_dirs(width, height)
    origin = jnp.zeros((3,), jnp.float32)
    if scene == "box":
        t = ray_box_depth(origin, dirs, half_extents)
    else:
        t = ray_sphere_depth(origin, dirs, (0.0, 0.0, 0.0), radius)
    hit = dirs * t[..., None]
    tex = hit / jnp.maximum(jnp.linalg.norm(hit, axis=-1, keepdims=True), 1e-9)
    color = procedural_texture(tex, seed, octaves=7 if scene == "box" else 6)
    return np.asarray(color), np.asarray(1.0 / t)
