"""ComputeRephotographyErrors equivalent: the pipeline's quality metric.

For each camera, render a cubemap at its position twice — once from its own
(color, disparity) and once from all OTHER cameras — and score them with
MSSIM/NCC. Logs per-camera and "TOTAL average" scores in the reference's
format (``render/ComputeRephotographyErrors.cpp:46-195``), which the test
harness parses.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from ..core import camera as cam, io
from ..render import dibr, rephoto

log = logging.getLogger("rephoto")


def load_rig_images(color_dir, disp_dir, rig, frame, size_wh=None):
    colors, disps = [], []
    for cam_id in rig.ids:
        ddir = os.path.join(disp_dir, cam_id)
        probe = io.first_image_in(ddir)
        assert probe, f"no disparity in {ddir}"
        ext = os.path.splitext(probe)[1]
        disp = io.read_disparity(os.path.join(ddir, frame + ext))
        cdir = os.path.join(color_dir, cam_id)
        probe_c = io.first_image_in(cdir)
        assert probe_c, f"no color in {cdir}"
        ext_c = os.path.splitext(probe_c)[1]
        color = io.read_color(os.path.join(cdir, frame + ext_c))[..., :3]
        if color.shape[:2] != disp.shape:
            color = io.resize_image(color, (disp.shape[1], disp.shape[0]))
        colors.append(color)
        disps.append(disp)
    return np.stack(colors), np.stack(disps)


def rephotography_scores(rig: cam.Rig, colors, disps, method="MSSIM", stat_radius=1, face_size=None):
    """Per-camera (R, G, B) scores; returns (scores list, total average)."""
    nrig = cam.normalize_rig(rig)
    face_size = face_size or colors.shape[1]
    scores = []
    for i, cam_id in enumerate(rig.ids):
        center = np.asarray(nrig.cameras.position)[i]
        ref_c, _, ref_a = dibr.render_cubemap(nrig.subset([i]), colors[i : i + 1], disps[i : i + 1], center, face_size)
        others = [j for j in range(len(rig.ids)) if j != i]
        ren_c, _, _ = dibr.render_cubemap(nrig.subset(others), colors[others], disps[others], center, face_size)
        x = ref_c.reshape(-1, face_size, 3)
        y = ren_c.reshape(-1, face_size, 3)
        score_map = np.asarray(rephoto.compute_score_map(method, x, y, stat_radius))
        avg = rephoto.average_score(score_map, ref_a.reshape(-1, face_size))
        log.info("%s %s: %s", cam_id, method, rephoto.format_results(avg))
        scores.append(avg)
    total = np.mean(scores, axis=0)
    log.info("TOTAL average %s: %s", method, rephoto.format_results(total))
    return scores, total


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--color", required=True)
    p.add_argument("--disparity", required=True)
    p.add_argument("--rig", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--first", required=True)
    p.add_argument("--last", required=True)
    p.add_argument("--cameras", default="")
    p.add_argument("--method", default="MSSIM", choices=["MSSIM", "NCC"])
    p.add_argument("--stat_radius", type=int, default=1)
    p.add_argument("--threads", type=int, default=-1)
    args = p.parse_args(argv)

    rig = cam.load_rig(args.rig)
    if args.cameras:
        rig = cam.filter_destinations(rig, args.cameras)
    os.makedirs(args.output, exist_ok=True)

    totals = []
    for f in range(int(args.first), int(args.last) + 1):
        frame = io.frame_name(f)
        colors, disps = load_rig_images(args.color, args.disparity, rig, frame)
        _, total = rephotography_scores(rig, colors, disps, args.method, args.stat_radius)
        totals.append(total)
    grand = np.mean(totals, axis=0)
    log.info("TOTAL average %s: %s", args.method, rephoto.format_results(grand))


if __name__ == "__main__":
    main()
