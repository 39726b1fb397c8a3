"""ConvertToBinary equivalent: disparity -> simplified mesh (.vtx/.idx),
color -> BC7/RGBA, plus striped fusion + catalog.

Flags mirror ``mesh_stream/ConvertToBinary.cpp:63-86``; flow follows
convertDepth/convertColor (:118-230) and the fusion step (:281-301).
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from ..core import camera as cam, io
from ..stream import fusion, mesh, native

log = logging.getLogger("convert")

FLT_MIN = float(np.finfo(np.float32).tiny)


def convert_depth(
    camera, cam_id, disparity, bin_dir, triangles=150000, tear_ratio=0.95,
    depth_scale=1.0, foreground_mask=None, save_obj=False, adaptive=True,
    mesh_tol_rel=1e-3,
):
    depth = 1.0 / disparity
    if depth_scale < 1:
        import cv2

        depth = cv2.resize(
            depth, None, fx=depth_scale, fy=depth_scale, interpolation=cv2.INTER_NEAREST
        )
    h, w = depth.shape
    vertexes = mesh.get_vertexes_equi_error(depth, camera)
    vertex_mask = np.isfinite(depth)
    if foreground_mask is not None:
        import cv2

        fg = cv2.resize(
            foreground_mask.astype(np.uint8), (w, h), interpolation=cv2.INTER_NEAREST
        ).astype(bool)
        vertex_mask &= fg
    if adaptive:
        # tiled-LOD pre-decimation (stream/adaptive.py): full res at tears
        # and mask edges, coarse crack-free tiles on smooth surface — cuts
        # the serial QEM stage's input ~10-100x at 2K
        from ..stream import adaptive as adaptive_mod

        z = vertexes.reshape(h, w, 3)[..., 2]
        faces = adaptive_mod.build_adaptive_faces(
            z, vertex_mask, tear_ratio=tear_ratio, tol_rel=mesh_tol_rel
        )
        vertexes, faces = mesh.apply_mask(vertexes, faces, vertex_mask)
    else:
        faces = mesh.get_faces(vertexes, w, h, tear_ratio=tear_ratio)
        vertexes, faces = mesh.apply_mask(vertexes, faces, vertex_mask)
    if triangles > 0 and len(faces) > triangles:
        vertexes, faces = native.simplify_mesh(vertexes, faces, triangles, strictness=0.2)
        # slightly negative depths blow up to -inf in the viewer's inverse
        vertexes[:, 2] = np.where(vertexes[:, 2] < 0, FLT_MIN, vertexes[:, 2])
    out_dir = os.path.join(bin_dir, cam_id)
    os.makedirs(out_dir, exist_ok=True)
    frame = None  # caller writes by filename below
    return vertexes, faces


def gamma_correct_to_rgba8(color: np.ndarray, gamma_correction: float) -> np.ndarray:
    """Float RGB [0,1] -> gamma-corrected RGBA8 (BC7Util.h:41-66)."""
    rgb = (np.power(np.clip(color[..., :3], 0, 1), gamma_correction) * 255.0 + 0.5).astype(np.uint8)
    alpha = np.full(rgb.shape[:2] + (1,), 255, np.uint8)
    return np.concatenate([rgb, alpha], axis=-1)


def jax_free_camera(rig, i):
    """One camera as a pure-numpy pytree — picklable for worker processes."""
    import jax

    return jax.tree.map(lambda a: np.asarray(a), rig.camera(i))


def _load(root, cam_id, frame, loader):
    d = os.path.join(root, cam_id)
    probe = io.first_image_in(d)
    assert probe, f"no images in {d}"
    ext = os.path.splitext(probe)[1]
    return loader(os.path.join(d, frame + ext))


def convert_one(argd: dict, camera, cam_id: str, frame: str) -> str:
    """Full per-(frame, camera) conversion: mesh (+QEM simplify) and/or BC7 —
    one ThreadPool task of the reference's ConvertToBinary.cpp, here one
    process-pool task. ``argd`` is the parsed flag dict, ``camera`` a numpy
    camera pytree (picklable)."""
    args = argparse.Namespace(**argd)
    formats = {f.strip() for f in args.output_formats.split(",") if f.strip()}
    out_dir = os.path.join(args.bin, cam_id)
    os.makedirs(out_dir, exist_ok=True)
    report = []
    if args.disparity and formats & {"vtx", "idx", "obj", "pfm"}:
        disp = _load(args.disparity, cam_id, frame, io.read_disparity)
        fg = (
            _load(args.foreground_masks, cam_id, frame, io.read_mask)
            if args.foreground_masks
            else None
        )
        v, f = convert_depth(
            camera, cam_id, disp, args.bin,
            triangles=args.triangles, tear_ratio=args.tear_ratio,
            depth_scale=args.depth_scale, foreground_mask=fg,
            adaptive=getattr(args, "adaptive_mesh", True),
            mesh_tol_rel=getattr(args, "mesh_tol_rel", 1e-3),
        )
        report.append(f"{len(v)} vertices, {len(f)} faces")
        if formats & {"vtx", "idx"}:
            mesh.write_vtx_idx(
                os.path.join(out_dir, frame + ".vtx"),
                os.path.join(out_dir, frame + ".idx"),
                v, f,
            )
        if "obj" in formats:
            mesh.write_obj(os.path.join(out_dir, frame + ".obj"), v, f)
    if args.color and formats & {"bc7", "rgba"}:
        color = _load(args.color, cam_id, frame, io.read_color)
        if args.color_scale < 1:
            color = io.resize_image(
                color,
                (int(color.shape[1] * args.color_scale), int(color.shape[0] * args.color_scale)),
            )
        # crop to 4px multiples for block compression
        h4, w4 = color.shape[0] // 4 * 4, color.shape[1] // 4 * 4
        rgba = gamma_correct_to_rgba8(color[:h4, :w4], args.gamma_correction)
        if "bc7" in formats:
            blocks = native.compress_bc7(rgba)
            blocks.tofile(os.path.join(out_dir, frame + ".bc7"))
        if "rgba" in formats:
            rgba.tofile(os.path.join(out_dir, frame + ".rgba"))
        # sidecar with the true texture dims: normalized rigs carry
        # resolution [1,1], so consumers cannot infer them from the camera
        # aspect (fusion records this in the catalog; viewer/server reads it)
        import json

        with open(os.path.join(out_dir, frame + ".meta.json"), "w") as f:
            json.dump({"color_wh": [int(rgba.shape[1]), int(rgba.shape[0])]}, f)
        report.append("color blocks")
    return f"{cam_id} {frame}: " + ", ".join(report)


def _convert_one_star(t):
    return convert_one(*t)


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--rig", required=True)
    p.add_argument("--bin", required=True, help="output binary directory")
    p.add_argument("--color", default="")
    p.add_argument("--disparity", default="")
    p.add_argument("--foreground_masks", default="")
    p.add_argument("--fused", default="", help="output fused directory (enables fusion)")
    p.add_argument("--cameras", default="")
    p.add_argument("--first", default="000000")
    p.add_argument("--last", default="000000")
    p.add_argument("--output_formats", default="vtx,idx,bc7", help="vtx,idx,pfm,obj,bc7,rgba")
    p.add_argument("--triangles", type=int, default=150000)
    p.add_argument(
        "--adaptive_mesh", type=lambda v: str(v).lower() in ("1", "true"), default=True,
        help="tiled-LOD pre-decimation before QEM (full-res grid when false)",
    )
    p.add_argument(
        "--mesh_tol_rel", type=float, default=1e-3,
        help="adaptive pre-decimation depth tolerance, relative to |z| "
             "(default sized to the solver's refinement quantum; see "
             "stream/adaptive.py)",
    )
    p.add_argument("--tear_ratio", type=float, default=0.95)
    p.add_argument("--color_scale", type=float, default=1.0)
    p.add_argument("--depth_scale", type=float, default=1.0)
    p.add_argument("--gamma_correction", type=float, default=2.2 / 1.8)
    p.add_argument("--run_conversion", type=lambda v: str(v).lower() in ("1", "true"), default=True)
    p.add_argument("--fuse_strip", type=int, default=0,
                   help="number of strip files (ConvertToBinary.cpp:74); overrides --num_disks")
    p.add_argument("--num_disks", type=int, default=1)
    p.add_argument("--threads", type=int, default=-1)
    args = p.parse_args(argv)

    rig = cam.filter_destinations(cam.load_rig(args.rig), args.cameras)
    formats = {f.strip() for f in args.output_formats.split(",") if f.strip()}
    frames = [io.frame_name(f) for f in range(int(args.first), int(args.last) + 1)]

    if args.run_conversion:
        tasks = [
            (vars(args), jax_free_camera(rig, i), cam_id, frame)
            for frame in frames
            for i, cam_id in enumerate(rig.ids)
        ]
        workers = os.cpu_count() if args.threads < 0 else args.threads
        workers = max(1, min(workers or 1, len(tasks)))
        if workers == 1:
            for t in tasks:
                log.info("%s", convert_one(*t))
        else:
            # per-(frame, camera) process pool — the reference threads
            # ConvertToBinary the same way (ThreadPool over frames/cameras,
            # mesh_stream/ConvertToBinary.cpp)
            from concurrent.futures import ProcessPoolExecutor

            with ProcessPoolExecutor(workers) as pool:
                for msg in pool.map(_convert_one_star, tasks):
                    log.info("%s", msg)

    if args.fused:
        exts = [f".{f}" for f in ("vtx", "idx", "bc7", "rgba") if f in formats]
        num_disks = args.fuse_strip if args.fuse_strip > 0 else args.num_disks
        fusion.fuse_frames(args.bin, args.fused, rig.ids, frames, exts, num_disks)
        log.info("fused %d frames into %s", len(frames), args.fused)


if __name__ == "__main__":
    main()
