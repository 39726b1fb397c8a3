"""Golden-tree generation + diff, mirroring the reference harness's
``check_against_truth`` / ``dir_trees_equal`` (scripts/test/
test_master_class.py:76,344): byte compare per file, order-insensitive JSON
compare for .json. The golden tree is committed; tests regenerate the same
outputs from fixed inputs and diff the trees."""

from __future__ import annotations

import json
import os

import numpy as np


def generate_publish_tree(dest: str) -> None:
    """Deterministic mini publish run: fixed synthetic disparity + color ->
    mesh (.vtx/.idx via the C++ QEM simplifier) -> BC7 blocks -> striped
    fusion + catalog.json + rig JSON. Pure numpy/C++ — no XLA in the loop."""
    from facebook360_dep_tpu.cli import convert_to_binary as ctb
    from facebook360_dep_tpu.core import camera as cam
    from facebook360_dep_tpu.stream import fusion, mesh, native

    w, h = 64, 48
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    disparity = (0.15 + 0.05 * np.sin(xx / 7.0) * np.cos(yy / 5.0)).astype(np.float32)
    color = np.stack(
        [
            0.5 + 0.4 * np.sin(xx / 3.0),
            0.5 + 0.4 * np.cos(yy / 4.0),
            0.5 + 0.3 * np.sin((xx + yy) / 6.0),
        ],
        axis=-1,
    ).astype(np.float32)

    camera = cam.make_camera(
        type_code=cam.RECTILINEAR,
        position=[0.1, 0.0, 0.0],
        rotation=np.eye(3),
        resolution=[w, h],
        focal=[0.45 * w, -0.45 * w],
    )
    rig = cam.Rig(cameras=cam.stack_cameras([camera]), ids=("cam0",), groups=("",))
    os.makedirs(os.path.join(dest, "rigs"), exist_ok=True)
    cam.save_rig(os.path.join(dest, "rigs/rig.json"), rig)

    bin_dir = os.path.join(dest, "bin")
    vertexes, faces = ctb.convert_depth(camera, "cam0", disparity, bin_dir, triangles=800)
    out_dir = os.path.join(bin_dir, "cam0")
    mesh.write_vtx_idx(
        os.path.join(out_dir, "000000.vtx"), os.path.join(out_dir, "000000.idx"),
        vertexes, faces,
    )
    rgba = ctb.gamma_correct_to_rgba8(color, 1.0 / 2.2)
    blocks = native.compress_bc7(rgba)
    with open(os.path.join(out_dir, "000000.bc7"), "wb") as f:
        f.write(blocks.tobytes())
    fusion.fuse_frames(bin_dir, os.path.join(dest, "fused"), ["cam0"], ["000000"])


def tree_files(root: str) -> dict[str, str]:
    out = {}
    for dirpath, _, files in os.walk(root):
        for fn in files:
            p = os.path.join(dirpath, fn)
            out[os.path.relpath(p, root)] = p
    return out


def dir_trees_equal(a: str, b: str) -> list[str]:
    """Returns a list of differences (empty = equal). JSON files compare
    structurally; everything else byte-for-byte."""
    fa, fb = tree_files(a), tree_files(b)
    diffs = [f"only in {a}: {k}" for k in sorted(set(fa) - set(fb))]
    diffs += [f"only in {b}: {k}" for k in sorted(set(fb) - set(fa))]
    for k in sorted(set(fa) & set(fb)):
        if k.endswith(".json"):
            with open(fa[k]) as f1, open(fb[k]) as f2:
                if json.load(f1) != json.load(f2):
                    diffs.append(f"json differs: {k}")
        else:
            with open(fa[k], "rb") as f1, open(fb[k], "rb") as f2:
                if f1.read() != f2.read():
                    diffs.append(f"bytes differ: {k}")
    return diffs
