"""Profile the publish path's per-phase split (VERDICT round-3 directive #1).

Times each phase of convert_one at the exact bench workload (2048x1536
disparity + color, 150k-triangle budget): mesh vertex/face build, QEM
simplify, vtx/idx write, color load+gamma, BC7 encode, file IO. Prints one
JSON line so the split can be recorded in BENCH detail.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from facebook360_dep_tpu.cli.convert_to_binary import gamma_correct_to_rgba8
from facebook360_dep_tpu.core import camera as cam
from facebook360_dep_tpu.stream import fusion, mesh, native


def make_camera(w=2048, h=1536):
    return cam.make_camera(
        type_code=cam.RECTILINEAR,
        position=np.zeros(3), rotation=np.eye(3),
        resolution=[float(w), float(h)],
        focal=[w / 2.0, w / 2.0],
    )


def main():
    smooth = "--smooth" in sys.argv
    w, h = 2048, 1536
    rng = np.random.default_rng(0)
    # bench-like disparity: smooth field + discontinuities (sphere-ish)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    disp = 0.05 + 0.3 / (1.0 + ((xx - w / 2) ** 2 + (yy - h / 2) ** 2) / (w / 4) ** 2)
    if not smooth:
        disp += 0.002 * rng.standard_normal((h, w)).astype(np.float32)
    disp[h // 3 : h // 3 + 40] *= 2.0  # a tear band
    depth = (1.0 / disp).astype(np.float64)
    color = np.clip(rng.random((h, w, 3), dtype=np.float32), 0, 1)

    camera = make_camera(w, h)
    t = {}

    adaptive = "--full" not in sys.argv

    t0 = time.perf_counter()
    vertexes = mesh.get_vertexes_equi_error(depth, camera)
    t["mesh_vertexes_s"] = time.perf_counter() - t0

    if adaptive:
        from facebook360_dep_tpu.stream import adaptive as adaptive_mod

        t0 = time.perf_counter()
        faces = adaptive_mod.build_adaptive_faces(
            vertexes.reshape(h, w, 3)[..., 2], np.isfinite(depth), tear_ratio=0.95
        )
        t["mesh_faces_s"] = time.perf_counter() - t0
    else:
        t0 = time.perf_counter()
        faces = mesh.get_faces(vertexes, w, h, tear_ratio=0.95)
        t["mesh_faces_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    vertexes2, faces2 = mesh.apply_mask(vertexes, faces, np.isfinite(depth))
    t["mesh_mask_s"] = time.perf_counter() - t0

    nf_in = len(faces2)
    t0 = time.perf_counter()
    v, f = native.simplify_mesh(vertexes2, faces2, 150000, strictness=0.2)
    t["simplify_s"] = time.perf_counter() - t0
    t["simplify_faces_in"] = nf_in
    t["simplify_faces_out"] = len(f)

    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.perf_counter()
        mesh.write_vtx_idx(os.path.join(tmp, "a.vtx"), os.path.join(tmp, "a.idx"), v, f)
        t["write_vtx_idx_s"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        rgba = gamma_correct_to_rgba8(color, 2.2 / 1.8)
        t["gamma_rgba_s"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        blocks = native.compress_bc7(rgba)
        t["bc7_encode_s"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        blocks.tofile(os.path.join(tmp, "a.bc7"))
        t["write_bc7_s"] = time.perf_counter() - t0

    total = sum(v for k, v in t.items() if k.endswith("_s"))
    t["total_s"] = total
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v) for k, v in t.items()}))


if __name__ == "__main__":
    main()
