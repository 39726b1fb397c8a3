"""SimpleMeshRenderer equivalent: offline exports from per-camera
color + disparity.

Formats (render/SimpleMeshRenderer.cpp:92-112): cubecolor, cubedisp,
eqrcolor, eqrdisp, snapshot, tbstereo, lr180, tb3dof. Rendering uses the
DIBR splat+gather path instead of the reference's GL CanopyScene raster.
Stereo formats use fixed left/right eye offsets (the reference's per-vertex
latitude-dependent IPD warp, RigScene.cpp:86-131, is approximated by a
constant-baseline pair; full ODS is a planned refinement).
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from ..core import camera as cam, io
from ..render import dibr

log = logging.getLogger("render")

FORMATS = ["cubecolor", "cubedisp", "eqrcolor", "eqrdisp", "lr180", "tb3dof", "tbstereo", "snapshot"]


def load_frame(color_dir, disp_dir, rig, frame):
    colors, disps = [], []
    for cam_id in rig.ids:
        ddir = os.path.join(disp_dir, cam_id)
        probe = io.first_image_in(ddir)
        assert probe, f"no disparity in {ddir}"
        disp = io.read_disparity(os.path.join(ddir, frame + os.path.splitext(probe)[1]))
        cdir = os.path.join(color_dir, cam_id)
        probe_c = io.first_image_in(cdir)
        color = io.read_color(os.path.join(cdir, frame + os.path.splitext(probe_c)[1]))[..., :3]
        if color.shape[:2] != disp.shape:
            color = io.resize_image(color, (disp.shape[1], disp.shape[0]))
        colors.append(color)
        disps.append(disp)
    return np.stack(colors), np.stack(disps)


def render_format(fmt, rig, colors, disps, width, height, ipd, position):
    center = np.asarray(position, np.float32)
    if fmt in ("cubecolor", "cubedisp"):
        face = height
        color, disp, _ = dibr.render_cubemap(rig, colors, disps, center, face)
        img = color.reshape(6 * face, face, 3) if fmt == "cubecolor" else disp.reshape(6 * face, face)
        return img
    if fmt in ("eqrcolor", "eqrdisp"):
        color, disp, _ = dibr.render_equirect(rig, colors, disps, center, width, height)
        return color if fmt == "eqrcolor" else disp
    if fmt == "snapshot":
        color, _, _ = dibr.render_equirect(rig, colors, disps, center, width, height)
        return color
    # stereo: ODS latitude-faded IPD warp, one render per eye. The
    # reference feeds halfIpdM = +-ipd/2 as the shader uniform
    # (SimpleMeshRenderer.cpp:407-427 -> CanopyScene.cpp:77-133); positive
    # is the left eye. Both eyes render from the SAME center — the pupil
    # offset happens per point inside the warp (dibr.ods_warp).
    if fmt == "tb3dof":
        # color over disparity, single (mono) view
        cl, dl, _ = dibr.render_equirect(rig, colors, disps, center, width, height)
        disp_vis = np.repeat(np.nan_to_num(dl)[..., None], 3, axis=-1)
        return np.concatenate([cl, disp_vis], axis=0)
    half = ipd / 2.0
    cl, _, _ = dibr.render_equirect(rig, colors, disps, center, width, height, ipd=+half)
    cr, _, _ = dibr.render_equirect(rig, colors, disps, center, width, height, ipd=-half)
    if fmt == "tbstereo":
        return np.concatenate([cl, cr], axis=0)  # top-bottom
    if fmt == "lr180":
        # central 180 degrees side by side
        q = width // 4
        return np.concatenate([cl[:, q : 3 * q], cr[:, q : 3 * q]], axis=1)
    raise ValueError(f"unknown format {fmt}")


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--rig", required=True)
    p.add_argument("--color", required=True)
    p.add_argument("--disparity", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--format", required=True, choices=FORMATS)
    p.add_argument("--first", default="000000")
    p.add_argument("--last", default="000000")
    p.add_argument("--width", type=int, default=2048)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--ipd", type=float, default=0.064)
    p.add_argument("--position", default="0,0,0")
    args = p.parse_args(argv)

    rig = cam.load_rig(args.rig)
    position = [float(v) for v in args.position.split(",")]
    os.makedirs(args.output, exist_ok=True)
    for f in range(int(args.first), int(args.last) + 1):
        frame = io.frame_name(f)
        colors, disps = load_frame(args.color, args.disparity, rig, frame)
        img = render_format(
            args.format, rig, colors, disps, args.width, args.height, args.ipd, position
        )
        out = os.path.join(args.output, frame + ".png")
        if img.ndim == 2:  # disparity map
            io.write_disparity(out, img)
        else:
            io.write_color(out, img)
        log.info("%s %s -> %s", args.format, frame, out)


if __name__ == "__main__":
    main()
