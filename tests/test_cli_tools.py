"""CLI coverage for the filter/export tools on tiny synthetic projects."""

import os

import numpy as np
import pytest

from facebook360_dep_tpu.core import camera as cam, io
from facebook360_dep_tpu.render import synthetic


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tools"))
    rig = synthetic.make_test_rig(num_cameras=2, resolution=(32, 24), ring_radius=0.2)
    cam.save_rig(os.path.join(root, "rig.json"), rig)
    frames = ["000000", "000001", "000002"]
    for fi, frame in enumerate(frames):
        colors, gt = synthetic.render_sphere_scene(rig, (32, 24), radius=5.0, seed=3)
        for i, cid in enumerate(rig.ids):
            cdir = os.path.join(root, "color/level_0", cid)
            ddir = os.path.join(root, "disp/level_0", cid)
            os.makedirs(cdir, exist_ok=True)
            os.makedirs(ddir, exist_ok=True)
            io.write_color(os.path.join(cdir, frame + ".png"), colors[i])
            noisy = gt[i] * (1 + 0.05 * np.random.RandomState(fi).randn(*gt[i].shape)).astype(np.float32)
            io.write_disparity(os.path.join(ddir, frame + ".pfm"), noisy)
    return root, rig, gt


def test_temporal_bilateral_filter_cli(project):
    from facebook360_dep_tpu.cli import temporal_bilateral_filter as tbf

    root, rig, gt = project
    out_root = os.path.join(root, "out_tf")
    tbf.main(
        [
            "--input_root", root,
            "--output_root", out_root,
            "--rig", os.path.join(root, "rig.json"),
            "--color", os.path.join(root, "color"),
            "--disparity", os.path.join(root, "disp"),
            "--first", "000001", "--last", "000001",
            "--level", "0", "--time_radius", "1",
        ]
    )
    filtered = io.read_disparity(
        os.path.join(out_root, "disparity_time_filtered_levels/level_0", rig.ids[0], "000001.pfm")
    )
    raw = io.read_disparity(os.path.join(root, "disp/level_0", rig.ids[0], "000001.pfm"))
    # temporal averaging over a static scene must reduce noise vs ground truth
    err_f = np.abs(filtered - gt[0]).mean()
    err_r = np.abs(raw - gt[0]).mean()
    assert err_f < err_r


@pytest.mark.slow
def test_upsample_disparity_cli(project):
    from facebook360_dep_tpu.cli import upsample_disparity

    root, rig, gt = project
    out = os.path.join(root, "up")
    upsample_disparity.main(
        [
            "--disparity", os.path.join(root, "disp/level_0"),
            "--output", out,
            "--resolution", "64",
            "--rig", os.path.join(root, "rig.json"),
            "--color", os.path.join(root, "color/level_0"),
            "--first", "000000", "--last", "000000",
        ]
    )
    up = io.read_disparity(os.path.join(out, rig.ids[0], "000000.pfm"))
    assert up.shape[1] == 64
    assert np.isfinite(up).all()


def test_layer_disparities_cli(project, tmp_path):
    from facebook360_dep_tpu.cli import layer_disparities

    root, rig, gt = project
    fg_dir = tmp_path / "fg"
    for cid in rig.ids:
        os.makedirs(fg_dir / cid)
        fg = np.full((24, 32), np.nan, np.float32)
        fg[8:16, 8:16] = 0.9  # foreground blob
        io.write_disparity(fg_dir / cid / "000000.pfm", fg)
    out = tmp_path / "layered"
    layer_disparities.main(
        [
            "--background_disp", os.path.join(root, "disp/level_0"),
            "--foreground_disp", str(fg_dir),
            "--output", str(out),
            "--rig", os.path.join(root, "rig.json"),
        ]
    )
    layered = io.read_disparity(out / "disparity" / rig.ids[0] / "000000.pfm")
    assert layered[12, 12] == pytest.approx(0.9)
    assert np.isfinite(layered[2, 2])  # background filled in


def test_simple_mesh_renderer_cli(project, tmp_path):
    from facebook360_dep_tpu.cli import simple_mesh_renderer

    root, rig, gt = project
    for fmt in ("eqrcolor", "cubedisp", "tbstereo"):
        out = tmp_path / fmt
        simple_mesh_renderer.main(
            [
                "--rig", os.path.join(root, "rig.json"),
                "--color", os.path.join(root, "color/level_0"),
                "--disparity", os.path.join(root, "disp/level_0"),
                "--output", str(out),
                "--format", fmt,
                "--width", "32", "--height", "16",
            ]
        )
        assert (out / "000000.png").exists()


def test_resize_images_cli(project, tmp_path):
    from facebook360_dep_tpu.cli import resize_images

    root, rig, gt = project
    out = tmp_path / "levels"
    resize_images.main(
        [
            "--rig", os.path.join(root, "rig.json"),
            "--color", os.path.join(root, "color/level_0"),
            "--output", str(out),
            "--widths", "32,16",
        ]
    )
    img = io.read_color(out / "level_1" / rig.ids[0] / "000000.png")
    assert img.shape[1] == 16
