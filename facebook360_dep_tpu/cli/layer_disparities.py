"""LayerDisparities equivalent: composite foreground over background
disparity (NaN/0 foreground = background). LayerDisparities.cpp:45-80."""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from ..core import camera as cam, imagetypes, io

log = logging.getLogger("layer")


def layer_disparities(foreground: np.ndarray, background: np.ndarray) -> np.ndarray:
    assert foreground.shape == background.shape
    mask = np.nan_to_num(foreground, nan=0.0) > 0.0
    return np.where(mask, foreground, background)


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--background_disp", required=True)
    p.add_argument("--background_frame", default="000000")
    p.add_argument("--foreground_disp", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--rig", required=True)
    p.add_argument("--cameras", default="")
    p.add_argument("--first", default="000000")
    p.add_argument("--last", default="000000")
    p.add_argument("--threads", type=int, default=-1)
    args = p.parse_args(argv)

    rig = cam.filter_destinations(cam.load_rig(args.rig), args.cameras)

    def load(root, cam_id, frame):
        d = os.path.join(root, cam_id)
        probe = io.first_image_in(d)
        assert probe, f"no disparity in {d}"
        ext = os.path.splitext(probe)[1]
        return io.read_disparity(os.path.join(d, frame + ext))

    for f in range(int(args.first), int(args.last) + 1):
        frame = io.frame_name(f)
        for cam_id in rig.ids:
            bg = load(args.background_disp, cam_id, args.background_frame)
            fg = load(args.foreground_disp, cam_id, frame)
            layered = layer_disparities(fg, bg)
            out_dir = imagetypes.image_dir(args.output, "disparity", cam_id=cam_id)
            os.makedirs(out_dir, exist_ok=True)
            io.write_disparity(os.path.join(out_dir, frame + ".pfm"), layered)
            log.info("layered %s %s", cam_id, frame)


if __name__ == "__main__":
    main()
