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


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--rig", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--depths", default="1,5,50", help="coverage sweep depths (m)")
    p.add_argument("--eqr_width", type=int, default=512)
    p.add_argument("--eqr_height", type=int, default=256)
    args = p.parse_args(argv)

    rig = cam.load_rig(args.rig)
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
