"""AlignColors equivalent: per-channel chromatic-aberration correction.

Warps the R and B channels onto the green-calibrated rig using per-camera
infinity warp fields between the three single-channel rig calibrations
(calibration/AlignColors.cpp:26-200).
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

import jax
import jax.numpy as jnp

from ..core import camera as cam, io
from ..ops import sampling

log = logging.getLogger("align_colors")


def channel_warp(cam_green: cam.Camera, cam_channel: cam.Camera, size_hw):
    """(H, W, 2) coords sampling the channel image at each green-rig pixel
    (computeWarpDstToSrc between the per-channel calibrations at infinity)."""
    h, w = size_hw
    grid = sampling.pixel_center_grid(h, w) / jnp.asarray([w, h], jnp.float32)
    world = cam.rig_near_infinity(cam_green, grid)
    pix, valid = cam.sees(cam_channel, world)
    coords = pix * jnp.asarray([w, h], jnp.float32)
    return jnp.where(valid[..., None], coords, jnp.nan)


def align_image(img_rgb, cam_r, cam_g, cam_b):
    h, w = img_rgb.shape[:2]
    out = jnp.asarray(img_rgb[..., :3]).copy()
    for ch, cam_ch in ((0, cam_r), (2, cam_b)):
        coords = channel_warp(cam_g, cam_ch, (h, w))
        warped = sampling.bilinear_sample(jnp.asarray(img_rgb[..., ch]), coords)
        out = out.at[..., ch].set(jnp.where(jnp.isfinite(warped), warped, img_rgb[..., ch]))
    return np.asarray(out)


def derive_channel_rig(calibrated_green: cam.Rig, ref_green: cam.Camera,
                       ref_channel: cam.Camera) -> cam.Rig:
    """Per-channel rig from the calibrated green rig + single-camera channel
    reference: transfer the channel/green focal ratio and the channel's
    distortion onto each calibrated camera (AlignColors.cpp:80-95)."""
    ratio = float(np.asarray(ref_channel.focal)[0] / np.asarray(ref_green.focal)[0])
    cams = calibrated_green.cameras
    n = np.asarray(cams.focal).shape[0]
    cams = cams._replace(
        focal=np.asarray(cams.focal) * ratio,
        distortion=np.broadcast_to(
            np.asarray(ref_channel.distortion)[None], np.asarray(cams.distortion).shape
        ).copy(),
        distortion_max=np.broadcast_to(np.asarray(ref_channel.distortion_max), (n,)).copy(),
    )
    return calibrated_green._replace(cameras=cams)


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--rig_red", required=True, help="red-channel rig calibration")
    p.add_argument("--rig_green", required=True, help="green-channel rig calibration")
    p.add_argument("--rig_blue", required=True, help="blue-channel rig calibration")
    p.add_argument("--calibrated_rig", default="", help=(
        "calibrated green rig: per-camera R/B rigs are derived from it via "
        "the channel/green focal ratio + channel distortion "
        "(AlignColors.cpp:35,80-95); empty = treat rig_red/blue as full rigs"))
    p.add_argument("--color", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--first", default="000000")
    p.add_argument("--last", default="000000")
    p.add_argument("--cameras", default="")
    args = p.parse_args(argv)

    rig_r = cam.normalize_rig(cam.filter_destinations(cam.load_rig(args.rig_red), args.cameras))
    rig_g = cam.normalize_rig(cam.filter_destinations(cam.load_rig(args.rig_green), args.cameras))
    rig_b = cam.normalize_rig(cam.filter_destinations(cam.load_rig(args.rig_blue), args.cameras))
    if args.calibrated_rig:
        cal_g = cam.normalize_rig(
            cam.filter_destinations(cam.load_rig(args.calibrated_rig), args.cameras))
        rig_r = derive_channel_rig(cal_g, rig_g.camera(0), rig_r.camera(0))
        rig_b = derive_channel_rig(cal_g, rig_g.camera(0), rig_b.camera(0))
        rig_g = cal_g

    def f32(c):
        return jax.tree.map(
            lambda a: jnp.asarray(a, jnp.float32) if jnp.asarray(a).dtype.kind == "f" else jnp.asarray(a), c
        )

    for f in range(int(args.first), int(args.last) + 1):
        frame = io.frame_name(f)
        for i, cam_id in enumerate(rig_g.ids):
            d = os.path.join(args.color, cam_id)
            probe = io.first_image_in(d)
            assert probe, f"no images in {d}"
            img = io.read_color(os.path.join(d, frame + os.path.splitext(probe)[1]))
            aligned = align_image(
                img,
                f32(rig_r.camera(rig_r.find(cam_id))),
                f32(rig_g.camera(i)),
                f32(rig_b.camera(rig_b.find(cam_id))),
            )
            out_dir = os.path.join(args.output, cam_id)
            os.makedirs(out_dir, exist_ok=True)
            io.write_color(os.path.join(out_dir, frame + ".png"), aligned, bit_depth=16)
            log.info("aligned %s %s", cam_id, frame)


if __name__ == "__main__":
    main()
