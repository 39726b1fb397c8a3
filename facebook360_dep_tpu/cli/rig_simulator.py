"""RigSimulator equivalent: synthetic ground-truth dataset generator.

Raytraces a procedurally-textured scene into every rig camera and writes the
project tree (color pyramid + true disparity) so the full pipeline can be
validated end-to-end against known depth (rig/RigSimulator.cpp:37-64 — the
reference raytraces a textured box world; scenes: textured sphere shell or
box room). Optional equirect ground-truth outputs mirror the reference's
true 1/depth equirects.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from ..core import camera as cam, imagetypes, io
from ..render import synthetic

log = logging.getLogger("simulator")


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--rig", default="", help="rig json (empty = built-in test ring rig)")
    p.add_argument("--dest", required=True, help="output project root")
    p.add_argument("--first", default="000000")
    p.add_argument("--last", default="000000")
    p.add_argument("--radius", type=float, default=5.0, help="scene sphere radius (m)")
    p.add_argument("--scene", default="sphere", choices=["sphere", "box", "occluders"])
    p.add_argument("--num_occluders", type=int, default=4,
                   help="floating occluder boxes in the occluders scene")
    p.add_argument("--box_half_extents", default="6,6,3", help="box room half extents (m)")
    p.add_argument("--eqr_width", type=int, default=0,
                   help="if > 0, also write true color/disparity equirects this wide")
    p.add_argument("--num_cameras", type=int, default=8, help="built-in rig size")
    p.add_argument("--resolution", type=int, default=512, help="built-in rig width")
    p.add_argument("--levels", type=int, default=4, help="pyramid levels to emit")
    p.add_argument("--seed", type=int, default=7)
    args = p.parse_args(argv)

    if args.rig:
        rig = cam.load_rig(args.rig)
        w, h = (int(v) for v in np.asarray(rig.cameras.resolution)[0])
    else:
        w = args.resolution
        h = int(args.resolution * 0.75)
        rig = synthetic.make_test_rig(args.num_cameras, (w, h), ring_radius=0.25)

    os.makedirs(os.path.join(args.dest, "rigs"), exist_ok=True)
    cam.save_rig(os.path.join(args.dest, "rigs/rig_calibrated.json"), rig)

    sizes = []
    lw, lh = w, h
    for _ in range(args.levels):
        sizes.append((lw, lh))
        lw, lh = max(lw * 2 // 3, 4), max(lh * 2 // 3, 4)

    half_extents = tuple(float(v) for v in args.box_half_extents.split(","))
    for f in range(int(args.first), int(args.last) + 1):
        frame = io.frame_name(f)
        if args.scene == "occluders":
            # BVH-raytraced room + floating boxes: geometry the analytic
            # sphere/box path cannot render (BoundingVolumeHierarchy.h)
            from ..render import raytrace

            mesh = raytrace.box_room_with_occluders(
                room_half_extents=half_extents,
                seed=args.seed + f,
                num_occluders=args.num_occluders,
            )
            bvh = raytrace.build_bvh(np.asarray(mesh.vertices))
            colors, gt = raytrace.render_mesh_scene(rig, (w, h), mesh, bvh)
        elif args.scene == "box":
            colors, gt = synthetic.render_box_scene(
                rig, (w, h), half_extents=half_extents, seed=args.seed + f
            )
        else:
            colors, gt = synthetic.render_sphere_scene(
                rig, (w, h), radius=args.radius, seed=args.seed + f
            )
        for level, (sw, sh) in enumerate(sizes):
            for i, cam_id in enumerate(rig.ids):
                cdir = imagetypes.image_dir(args.dest, "color_levels", level, cam_id)
                os.makedirs(cdir, exist_ok=True)
                img = colors[i] if (sw, sh) == (w, h) else io.resize_image(colors[i], (sw, sh))
                io.write_color(os.path.join(cdir, frame + ".png"), img, bit_depth=16)
        # ground-truth disparity at full res
        for i, cam_id in enumerate(rig.ids):
            tdir = os.path.join(args.dest, "truth", cam_id)
            os.makedirs(tdir, exist_ok=True)
            io.write_disparity(os.path.join(tdir, frame + ".pfm"), gt[i])
        if args.eqr_width > 0:
            ew = args.eqr_width
            if args.scene == "occluders":
                from ..render import raytrace

                ecolor, edisp = raytrace.ground_truth_equirect_mesh(mesh, ew, ew // 2, bvh)
            else:
                ecolor, edisp = synthetic.ground_truth_equirect(
                    rig, ew, ew // 2, args.scene, args.radius, half_extents, args.seed + f
                )
            edir = os.path.join(args.dest, "truth_eqr")
            os.makedirs(edir, exist_ok=True)
            io.write_color(os.path.join(edir, frame + "_color.png"), ecolor, bit_depth=16)
            io.write_disparity(os.path.join(edir, frame + "_disparity.pfm"), edisp)
        log.info("rendered frame %s (%d cameras, %d levels)", frame, len(rig.ids), args.levels)


if __name__ == "__main__":
    main()
