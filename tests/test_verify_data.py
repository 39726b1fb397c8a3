"""Project-tree validator tests."""

import os

import numpy as np

from facebook360_dep_tpu.cli import verify_data
from facebook360_dep_tpu.core import camera as cam, io
from facebook360_dep_tpu.render import synthetic


def _project(tmp_path, num_frames=2, size=(50, 38)):
    rig = synthetic.make_test_rig(num_cameras=3, resolution=size, ring_radius=0.1)
    colors, _ = synthetic.render_sphere_scene(rig, size, radius=5.0)
    os.makedirs(tmp_path / "rigs", exist_ok=True)
    cam.save_rig(str(tmp_path / "rigs" / "rig.json"), rig)
    for i, cam_id in enumerate(rig.ids):
        d = tmp_path / "video" / "color" / cam_id
        os.makedirs(d, exist_ok=True)
        for f in range(num_frames):
            io.write_color(str(d / f"{f:06d}.png"), np.clip(colors[i], 0, 1))
    return rig


def test_ok_tree(tmp_path):
    _project(tmp_path)
    problems, info = verify_data.verify_project(str(tmp_path))
    assert problems == [], problems
    assert len(info["color_frames"]) == 2
    assert verify_data.main(["--project_root", str(tmp_path)]) == 0


def test_detects_missing_camera_and_gaps(tmp_path):
    rig = _project(tmp_path, num_frames=3)
    # remove one camera's dir and punch a frame gap in another
    import shutil

    shutil.rmtree(tmp_path / "video" / "color" / rig.ids[2])
    os.remove(tmp_path / "video" / "color" / rig.ids[0] / "000001.png")
    problems, _ = verify_data.verify_project(str(tmp_path))
    assert any("no frames for camera" in p for p in problems)
    assert any("gaps" in p for p in problems)
    assert any("differ across cameras" in p for p in problems)
    assert verify_data.main(["--project_root", str(tmp_path)]) == 1


def test_detects_wrong_resolution(tmp_path):
    rig = _project(tmp_path)
    # overwrite one image at the wrong size
    io.write_color(
        str(tmp_path / "video" / "color" / rig.ids[0] / "000000.png"),
        np.zeros((10, 10, 3), np.float32),
    )
    problems, _ = verify_data.verify_project(str(tmp_path))
    assert any("!= rig resolution" in p for p in problems)


def test_json_report(tmp_path):
    import json

    _project(tmp_path)
    out = tmp_path / "report.json"
    verify_data.main(["--project_root", str(tmp_path), "--json_out", str(out)])
    rep = json.load(open(out))
    assert rep["problems"] == []
    assert len(rep["info"]["cameras"]) == 3
