"""RawToRgb equivalent: software ISP over RAW frames (isp/RawToRgb.cpp:36-51)."""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from ..core import io
from ..isp import pipeline as isp

log = logging.getLogger("isp")


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_image_path", required=True, help="RAW mosaic image (or dir)")
    p.add_argument("--output_image_path", required=True)
    p.add_argument("--isp_config_path", required=True, help="isp.json")
    p.add_argument("--black_level_offset", type=float, default=0.0)
    p.add_argument("--output_bpp", type=int, default=8, choices=[8, 16])
    args = p.parse_args(argv)

    cfg = isp.IspConfig.from_json(args.isp_config_path)
    if args.black_level_offset:
        cfg.black_level = tuple(b + args.black_level_offset for b in cfg.black_level)

    def one(in_path, out_path):
        raw = io.read_color(in_path)
        if raw.ndim == 3:
            raw = raw[..., 0]
        rgb = np.asarray(isp.process(raw, cfg))
        io.write_color(out_path, rgb, bit_depth=args.output_bpp)
        log.info("%s -> %s", in_path, out_path)

    if os.path.isdir(args.input_image_path):
        os.makedirs(args.output_image_path, exist_ok=True)
        for name in sorted(os.listdir(args.input_image_path)):
            if name.startswith("."):
                continue
            out = os.path.splitext(name)[0] + ".png"
            one(os.path.join(args.input_image_path, name), os.path.join(args.output_image_path, out))
    else:
        one(args.input_image_path, args.output_image_path)


if __name__ == "__main__":
    main()
