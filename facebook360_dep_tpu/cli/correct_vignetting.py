"""CorrectVignetting equivalent: undo lens vignetting in a single image.

Flags mirror ``isp/CorrectVignetting.cpp:30-35``: comma-separated Bezier
control values for the x and y rolloff curves, evaluated around the principal
point and divided out of the image.
"""

from __future__ import annotations

import argparse
import logging

import jax.numpy as jnp
import numpy as np

from ..core import io
from ..isp import pipeline as isp
from ..utils.hostmath import on_host

log = logging.getLogger("correct_vignetting")


@on_host
def correct_vignetting(img: np.ndarray, vx, vy, principal=None) -> np.ndarray:
    """Divide out the separable Bezier rolloff. The curves are parameterized
    over [0,1] across the image, recentered on the principal point (the
    reference evaluates distance from the principal; a recentred separable
    curve matches its tables)."""
    h, w = img.shape[:2]
    px = principal[0] if principal and principal[0] >= 0 else w / 2.0
    py = principal[1] if principal and principal[1] >= 0 else h / 2.0
    # parameter 0 at the left/top edge, 0.5 at the principal, 1 at right/bottom
    tx = np.clip((np.arange(w) - px) / max(w, 1) + 0.5, 0.0, 1.0)
    ty = np.clip((np.arange(h) - py) / max(h, 1) + 0.5, 0.0, 1.0)
    cx = jnp.asarray(np.asarray(vx, np.float32)[:, None])
    cy = jnp.asarray(np.asarray(vy, np.float32)[:, None])
    roll_x = np.asarray(isp.bezier(cx, jnp.asarray(tx, jnp.float32)))[:, 0]
    roll_y = np.asarray(isp.bezier(cy, jnp.asarray(ty, jnp.float32)))[:, 0]
    gain = roll_y[:, None] * roll_x[None, :]
    if img.ndim == 3:
        gain = gain[..., None]
    return np.clip(img / np.maximum(gain, 1e-6), 0.0, 1.0)


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--raw", required=True, help="path to input image")
    p.add_argument("--out", required=True, help="path to output image")
    p.add_argument("--principal_x", type=float, default=-1)
    p.add_argument("--principal_y", type=float, default=-1)
    p.add_argument("--vignetting_x", required=True, help="comma-separated Bezier controls")
    p.add_argument("--vignetting_y", required=True)
    args = p.parse_args(argv)

    img = io.read_color(args.raw)
    vx = [float(v) for v in args.vignetting_x.split(",")]
    vy = [float(v) for v in args.vignetting_y.split(",")]
    out = correct_vignetting(img, vx, vy, (args.principal_x, args.principal_y))
    io.write_color(args.out, out)
    log.info("%s -> %s", args.raw, args.out)


if __name__ == "__main__":
    main()
