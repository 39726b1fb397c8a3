"""Offline 6DoF viewer: decode fused streaming data and render novel views.

The file-format compatibility surface of GlViewer (viewer/GlViewer.cpp:57 +
render/VideoFile.h): reads fused.json + stripe files, decodes each camera's
.vtx/.idx equi-error mesh and .bc7 color, rasterizes meshes back to dense
disparity (native z-buffer raster), and DIBR-renders the requested viewpoint
path to PNG frames — proving the published data round-trips without GL.
"""

from __future__ import annotations

import argparse
import json
import logging
import os

import numpy as np

from ..core import camera as cam, io
from ..render import dibr
from ..stream import fusion, native

log = logging.getLogger("viewer")


def decode_camera(fused_dir, catalog, frame, cam_id, camera, num_disks, color_wh):
    """(color float RGB [0,1], disparity) decoded from the fused stream."""
    raw_v = fusion.read_fused_entry(fused_dir, catalog, frame, cam_id, ".vtx", num_disks)
    raw_i = fusion.read_fused_entry(fused_dir, catalog, frame, cam_id, ".idx", num_disks)
    verts = np.frombuffer(raw_v, np.float32).reshape(-1, 3)
    faces = np.frombuffer(raw_i, np.uint32).reshape(-1, 3)

    w, h = color_wh
    res = np.asarray(camera.resolution, np.float64)
    # vertex xy are in full-camera pixel units; z = focal/depth
    z = native.rasterize_mesh(verts, faces, w, h, w / res[0], h / res[1])
    focal = float(np.asarray(camera.focal)[0])
    disparity = z / focal  # z = focal * disparity

    entry = catalog["frames"][frame][cam_id]
    if ".bc7" in entry:
        raw_c = fusion.read_fused_entry(fused_dir, catalog, frame, cam_id, ".bc7", num_disks)
        rgba = native.decompress_bc7(np.frombuffer(raw_c, np.uint8), w, h)
    else:  # uncompressed RGBA subframes (ConvertToBinary --output_formats rgba)
        raw_c = fusion.read_fused_entry(fused_dir, catalog, frame, cam_id, ".rgba", num_disks)
        rgba = np.frombuffer(raw_c, np.uint8).reshape(h, w, 4)
    color = np.power(rgba[..., :3].astype(np.float32) / 255.0, 1.0 / (2.2 / 1.8))
    return color, disparity


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--rig", required=True)
    p.add_argument("--catalog", required=True, help="fused.json")
    p.add_argument("--output", required=True, help="rendered frames directory")
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--position", default="0,0,0", help="view position (m), comma separated")
    p.add_argument("--num_disks", type=int, default=1)
    p.add_argument("--first", default="")
    p.add_argument("--last", default="")
    args = p.parse_args(argv)

    rig = cam.load_rig(args.rig)
    with open(args.catalog) as f:
        catalog = json.load(f)
    fused_dir = os.path.dirname(os.path.abspath(args.catalog))
    frames = sorted(catalog["frames"])
    if args.first:
        frames = [f for f in frames if args.first <= f <= (args.last or frames[-1])]
    position = [float(v) for v in args.position.split(",")]
    os.makedirs(args.output, exist_ok=True)

    for frame in frames:
        colors, disps = [], []
        # color resolution from the payload size (bc7: 1 byte/px, rgba: 4)
        res = np.asarray(rig.cameras.resolution)[0]
        entry0 = catalog["frames"][frame][rig.ids[0]]
        if ".bc7" in entry0:
            npix = entry0[".bc7"]["size"]
        else:
            npix = entry0[".rgba"]["size"] / 4.0
        scale = np.sqrt(npix / (res[0] * res[1]))
        w = int(round(res[0] * scale)) // 4 * 4
        h = int(round(npix / w)) // 4 * 4
        for i, cam_id in enumerate(rig.ids):
            color, disp = decode_camera(
                fused_dir, catalog, frame, cam_id, rig.camera(i), args.num_disks, (w, h)
            )
            colors.append(color)
            disps.append(disp)
        color_out, _, _ = dibr.render_equirect(
            rig, np.stack(colors), np.stack(disps), position, args.width, args.height
        )
        out = os.path.join(args.output, frame + ".png")
        io.write_color(out, color_out)
        log.info("rendered %s -> %s", frame, out)


if __name__ == "__main__":
    main()
