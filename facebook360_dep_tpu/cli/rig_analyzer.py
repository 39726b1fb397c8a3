"""RigAnalyzer equivalent: rig geometry reports (rig/RigAnalyzer.cpp:30-45).

Coverage equirects (how many cameras see each direction at a given depth),
per-camera geometry table, and an OBJ export of camera frusta for inspection.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

import jax
import jax.numpy as jnp

from ..core import camera as cam, io
from ..render import dibr

log = logging.getLogger("rig_analyzer")


def coverage_equirect(rig: cam.Rig, width: int, height: int, depth: float) -> np.ndarray:
    """(H, W) int: number of cameras seeing each equirect direction at depth."""
    dirs = dibr.equirect_dirs(width, height)
    world = dirs * depth
    cams = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float32) if jnp.asarray(a).dtype.kind == "f" else jnp.asarray(a),
        cam.normalize_rig(rig).cameras,
    )

    def one(c):
        _, seen = cam.sees(c, world)
        return seen

    return np.asarray(jnp.sum(jax.vmap(one)(cams), axis=0))


def frusta_obj(rig: cam.Rig, scale: float = 0.1) -> tuple[np.ndarray, np.ndarray]:
    """Camera frusta as a wireframe-ish triangle mesh for OBJ export."""
    verts, faces = [], []
    for i in range(len(rig.ids)):
        c = jax.tree.map(np.asarray, rig.camera(i))
        base = len(verts)
        origin = c.position
        fwd, up, right = -c.rotation[2], c.rotation[1], c.rotation[0]
        verts.append(origin)
        for sy in (-1, 1):
            for sx in (-1, 1):
                verts.append(origin + scale * (fwd + 0.6 * sx * right + 0.45 * sy * up))
        for a, b in [(1, 2), (2, 4), (4, 3), (3, 1)]:
            faces.append([base, base + a, base + b])
    return np.asarray(verts), np.asarray(faces, np.uint32)


def cross_section_coverage(rig: cam.Rig, size: int, extent: float) -> np.ndarray:
    """(size, size) int: cameras seeing each point of the vertical (x, z)
    slice through the rig center (RigAnalyzer cross sections)."""
    lin = np.linspace(-extent, extent, size, dtype=np.float32)
    xs, zs = np.meshgrid(lin, lin)
    world = jnp.asarray(np.stack([xs, np.zeros_like(xs), zs], axis=-1))
    cams = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float32) if jnp.asarray(a).dtype.kind == "f" else jnp.asarray(a),
        cam.normalize_rig(rig).cameras,
    )

    def one(c):
        _, seen = cam.sees(c, world)
        return seen

    return np.asarray(jnp.sum(jax.vmap(one)(cams), axis=0))


def camera_overlap_image(rig: cam.Rig, cam_id: str, depth: float) -> np.ndarray:
    """(H, W) int: for each pixel of ``cam_id``, how many OTHER cameras see
    the world point it hits at ``depth`` (RigAnalyzer --output_camera)."""
    nrig = cam.normalize_rig(rig)
    i = nrig.find(cam_id)
    c = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float32) if jnp.asarray(a).dtype.kind == "f" else jnp.asarray(a),
        nrig.camera(i),
    )
    w, h = (int(v) for v in np.asarray(rig.cameras.resolution)[i])
    w, h = min(w, 1024), min(h, 1024)
    from ..ops import sampling

    grid = sampling.pixel_center_grid(h, w) / jnp.asarray([w, h], jnp.float32)
    world = cam.rig_point(c, grid, jnp.asarray(float(depth)))
    cams = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float32) if jnp.asarray(a).dtype.kind == "f" else jnp.asarray(a),
        nrig.cameras,
    )

    def one(j):
        cj = jax.tree.map(lambda a: a[j], cams)
        _, seen = cam.sees(cj, world)
        return seen & (j != i)

    return np.asarray(jnp.sum(jax.vmap(one)(jnp.arange(nrig.num_cameras)), axis=0))


def make_named_arrangement(name: str, rig: cam.Rig) -> cam.Rig:
    """Clone camera 0 into a named arrangement (RigAnalyzer.cpp:487-488
    makeNamedArrangement; subset: ring4, tetra, cube)."""
    c0 = jax.tree.map(np.asarray, rig.camera(0))
    radius = float(np.linalg.norm(c0.position)) or 0.2

    def looking(fwd, up_hint=(0.0, 0.0, 1.0)):
        fwd = np.asarray(fwd, np.float64)
        fwd /= np.linalg.norm(fwd)
        up = np.asarray(up_hint, np.float64)
        if abs(np.dot(up, fwd)) > 0.9:
            up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        rot = np.stack([right, up, -fwd], axis=0)
        return c0._replace(position=radius * fwd, rotation=rot)

    if name == "ring4":
        dirs = [(1, 0, 0), (0, 1, 0), (-1, 0, 0), (0, -1, 0)]
    elif name == "tetra":
        dirs = [(1, 1, 1), (1, -1, -1), (-1, 1, -1), (-1, -1, 1)]
    elif name == "cube":
        dirs = [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]
    else:
        raise SystemExit(
            f"--rearrange {name}: supported arrangements are ring4, tetra, cube "
            "(reference also names ballcam24/carbon0/carbon1/diamond)")
    cams = [looking(d) for d in dirs]
    ids = tuple(f"cam{k}" for k in range(len(cams)))
    return cam.Rig(cameras=cam.stack_cameras(cams), ids=ids, groups=("",) * len(cams))


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--rig", required=True)
    p.add_argument("--output", default="", help="report directory (coverage pngs + rig.obj)")
    p.add_argument("--depths", default="1,5,50", help="coverage sweep depths (m)")
    p.add_argument("--eqr_width", type=int, default=512)
    p.add_argument("--eqr_height", type=int, default=256)
    p.add_argument("--min_distance", type=float, default=0.5, help="test depth (m)")
    p.add_argument("--output_equirect", default="", help="coverage equirect image path (.ppm/.png)")
    p.add_argument("--output_cross_section", default="", help="vertical-slice coverage image path")
    p.add_argument("--output_camera", default="", help="per-camera overlap-count image path")
    p.add_argument("--output_camera_id", default="", help="camera id for --output_camera")
    p.add_argument("--output_obj", default="", help="camera-frusta OBJ path")
    p.add_argument("--output_rig", default="", help="write the (rearranged) rig json here")
    p.add_argument("--rearrange", default="", help=(
        "clone camera 0 into a named arrangement: ring4, tetra, cube "
        "(RigAnalyzer.cpp:487)"))
    args = p.parse_args(argv)

    rig = cam.load_rig(args.rig)
    if args.rearrange:
        rig = make_named_arrangement(args.rearrange, rig)
        log.info("rearranged into %s: %d cameras", args.rearrange, rig.num_cameras)
    if args.output_rig:
        cam.save_rig(args.output_rig, rig)
        log.info("wrote %s", args.output_rig)
    if args.output_equirect:
        cov = coverage_equirect(rig, args.eqr_width, args.eqr_height, args.min_distance)
        vis = np.repeat((cov / max(cov.max(), 1))[..., None], 3, axis=-1)
        io.write_color(args.output_equirect, vis)
        log.info("wrote %s", args.output_equirect)
    if args.output_cross_section:
        cov = cross_section_coverage(rig, args.eqr_height, 2.0 * args.min_distance + 1.0)
        vis = np.repeat((cov / max(cov.max(), 1))[..., None], 3, axis=-1)
        io.write_color(args.output_cross_section, vis)
        log.info("wrote %s", args.output_cross_section)
    if args.output_camera:
        cam_id = args.output_camera_id or rig.ids[0]
        cov = camera_overlap_image(rig, cam_id, args.min_distance)
        vis = np.repeat((cov / max(cov.max(), 1))[..., None], 3, axis=-1)
        io.write_color(args.output_camera, vis)
        log.info("wrote %s (%s)", args.output_camera, cam_id)
    if args.output_obj:
        from ..stream import mesh as mesh_mod

        v, f = frusta_obj(rig)
        mesh_mod.write_obj(args.output_obj, v, f)
        log.info("wrote %s", args.output_obj)
    if not args.output:
        return
    os.makedirs(args.output, exist_ok=True)

    for i, cam_id in enumerate(rig.ids):
        c = jax.tree.map(np.asarray, rig.camera(i))
        log.info(
            "%s: position %s forward %s fov %.3f rad focal %.1f",
            cam_id, c.position, -c.rotation[2], float(np.arccos(np.clip(c.cos_fov, -1, 1))),
            float(c.focal[0]),
        )

    for depth in (float(d) for d in args.depths.split(",") if d):
        cov = coverage_equirect(rig, args.eqr_width, args.eqr_height, depth)
        log.info(
            "depth %.1f m: min coverage %d, mean %.2f, %%>=2 cams: %.1f%%",
            depth, cov.min(), cov.mean(), 100.0 * (cov >= 2).mean(),
        )
        vis = np.repeat((cov / max(cov.max(), 1))[..., None], 3, axis=-1)
        io.write_color(os.path.join(args.output, f"coverage_{depth:g}m.png"), vis)

    from ..stream import mesh as mesh_mod

    v, f = frusta_obj(rig)
    mesh_mod.write_obj(os.path.join(args.output, "rig.obj"), v, f)
    log.info("wrote rig.obj with %d cameras", len(rig.ids))


if __name__ == "__main__":
    main()
