"""End-to-end DerpCLI test: synthetic scene written to the reference's
directory contract, solved coarse-to-fine through the CLI, outputs compared
against raytraced ground truth (the reference's DerpCLITest shape, with
RigSimulator-style data instead of the S3 dataset)."""

import json
import os

import numpy as np
import pytest

from facebook360_dep_tpu.core import camera as cam, imagetypes, io
from facebook360_dep_tpu.render import synthetic


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    """A tiny project tree: 3 pyramid levels of a 4-camera synthetic scene."""
    root = tmp_path_factory.mktemp("derp_project")
    rig = synthetic.make_test_rig(num_cameras=4, resolution=(80, 60), ring_radius=0.3)
    # render full-size, then resize down for levels (mirrors resize.py)
    colors, gt = synthetic.render_sphere_scene(rig, (80, 60), radius=5.0)
    level_sizes = {0: (80, 60), 1: (56, 42), 2: (40, 30)}
    for level, size in level_sizes.items():
        for i, cam_id in enumerate(rig.ids):
            d = imagetypes.image_dir(root, "color_levels", level, cam_id)
            os.makedirs(d, exist_ok=True)
            img = colors[i] if size == (80, 60) else io.resize_image(colors[i], size)
            io.write_color(os.path.join(d, "000000.png"), img, bit_depth=16)
    os.makedirs(os.path.join(root, "rigs"), exist_ok=True)
    cam.save_rig(os.path.join(root, "rigs/rig_calibrated.json"), rig)
    return str(root), rig, gt


@pytest.mark.slow
def test_derp_cli_end_to_end(project):
    from facebook360_dep_tpu.cli import derp_cli

    root, rig, gt = project
    out_root = os.path.join(root, "out")
    derp_cli.main(
        [
            "--input_root", root,
            "--output_root", out_root,
            "--min_depth_m", "1.0",
            "--max_depth_m", "100.0",
            "--output_formats", "pfm,png",
            "--resolution", "80",
        ]
    )
    # outputs exist for every camera at every level, both formats
    for level in (2, 1, 0):
        for cam_id in rig.ids:
            pfm = imagetypes.gen_filename(out_root, "disparity_levels", level, cam_id, "000000", "pfm")
            assert os.path.exists(pfm), pfm
    disp = io.read_disparity(
        imagetypes.gen_filename(out_root, "disparity_levels", 0, cam_id, "000000", "pfm")
    )
    assert disp.shape == (60, 80)
    i = rig.ids.index(cam_id)
    m = np.zeros(disp.shape, bool)
    m[6:-6, 6:-6] = True
    valid = np.isfinite(disp) & m
    rel = np.abs(disp[valid] - gt[i][valid]) / gt[i][valid]
    assert np.median(rel) < 0.05, f"median rel disparity err {np.median(rel):.4f}"


@pytest.mark.slow
def test_derp_cli_resume_from_level(project):
    """level_start resume (DerpCLI.cpp:50-51): rerun finest level only."""
    from facebook360_dep_tpu.cli import derp_cli

    root, rig, gt = project
    out_root = os.path.join(root, "out")  # reuse previous outputs
    derp_cli.main(
        [
            "--input_root", root,
            "--output_root", out_root,
            "--min_depth_m", "1.0",
            "--max_depth_m", "100.0",
            "--level_start", "0",
            "--resolution", "80",
            "--save_debug_images", "true",
        ]
    )
    disp = io.read_disparity(
        imagetypes.gen_filename(out_root, "disparity_levels", 0, rig.ids[0], "000000", "pfm")
    )
    assert np.isfinite(disp).any()
    # --save_debug_images dumps cost/confidence/mismatch-overlay/disparity PNGs
    # per dst camera (PyramidLevel.h:454-461 saveDebugImages)
    import cv2

    for cam_id in rig.ids:
        for image_type in ("cost", "confidence", "mismatches", "disparity_levels"):
            p = imagetypes.gen_filename(out_root, image_type, 0, cam_id, "000000", "png")
            assert os.path.exists(p), p
    overlay = cv2.imread(
        imagetypes.gen_filename(out_root, "mismatches", 0, rig.ids[0], "000000", "png"),
        cv2.IMREAD_UNCHANGED,
    )
    assert overlay.shape == (60, 80, 4)  # BGRA overlay


def test_partial_coverage_policy():
    """Insufficient coverage at the brute-force level is fatal unless
    --partial_coverage or --use_foreground_masks (Derp.cpp:334-348)."""
    from facebook360_dep_tpu.depth import pipeline as dp

    h, w = 8, 10
    fov = np.ones((2, h, w), bool)
    cost = np.full((2, h, w), 1.0, np.float32)
    cost[0, :2, :3] = np.nan  # 6 uncovered pixels inside the FOV
    result = {"cost": cost}

    est = dp.DepthEstimator.__new__(dp.DepthEstimator)

    class Opts:
        partial_coverage = False
        use_foreground_masks = False

    est.opts = Opts()
    with pytest.raises(RuntimeError, match="Insufficient coverage"):
        est.check_coverage(0, "000000", result, fov)

    est.opts.partial_coverage = True
    est.check_coverage(0, "000000", result, fov)  # warns, does not raise

    est.opts.partial_coverage = False
    est.opts.use_foreground_masks = True
    est.check_coverage(0, "000000", result, fov)  # warns, does not raise

    cost2 = np.ones((2, h, w), np.float32)  # fully covered: silent
    est.opts.use_foreground_masks = False
    est.check_coverage(0, "000000", {"cost": cost2}, fov)


@pytest.mark.slow
def test_plot_matches_debug(project):
    """plotMatches (Derp.cpp:28-70): one PNG per src showing where the debug
    dst pixel's solved depth lands."""
    import glob

    from facebook360_dep_tpu.cli import derp_cli

    root, rig, gt = project
    out_root = os.path.join(root, "out_plot")
    debug = os.path.join(root, "debug_plot")
    derp_cli.main(
        [
            "--input_root", root,
            "--output_root", out_root,
            "--min_depth_m", "1.0",
            "--max_depth_m", "100.0",
            "--resolution", "80",
            "--debug_dir", debug,
            "--debug_plot_match_dst", rig.ids[0],
            "--debug_plot_match_x", "40",
            "--debug_plot_match_y", "30",
            "--debug_plot_match_level", "0",
        ]
    )
    files = glob.glob(os.path.join(debug, "*.png"))
    assert files, "no plotMatches output"
    # landing coords are embedded in the filename (DerpUtil.cpp:186-195)
    assert any(f"{rig.ids[0]}_x=40_y=30->" in os.path.basename(f) for f in files)


@pytest.mark.slow
def test_profile_dir_writes_trace(project, tmp_path):
    """--profile_dir (SURVEY 5.1): the solve runs under jax.profiler.trace
    and leaves a non-empty trace tree."""
    from facebook360_dep_tpu.cli import derp_cli

    root, rig, gt = project
    out_root = os.path.join(root, "out_prof")
    prof = str(tmp_path / "trace")
    derp_cli.main(
        [
            "--input_root", root,
            "--output_root", out_root,
            "--min_depth_m", "1.0",
            "--max_depth_m", "100.0",
            "--level_start", "2",
            "--level_end", "2",
            "--resolution", "80",
            "--profile_dir", prof,
        ]
    )
    files = [os.path.join(dp, f) for dp, _, fns in os.walk(prof) for f in fns]
    assert files, "profiler trace directory is empty"
    assert any(f.endswith((".pb", ".json.gz", ".trace.json.gz", ".xplane.pb")) for f in files), files


def test_sigterm_dumps_stack():
    """initDep parity: SIGTERM produces a faulthandler stack dump on stderr
    (util/SystemUtil.cpp signal handlers)."""
    import signal
    import subprocess
    import sys
    import time

    code = (
        "import facebook360_dep_tpu.cli, os, sys, time\n"
        "print('READY', flush=True)\n"
        "time.sleep(30)\n"
        "print('SURVIVED', flush=True)\n"
    )
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-c", code], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    assert proc.stdout.readline().strip() == "READY"
    proc.send_signal(signal.SIGTERM)
    time.sleep(1.0)
    proc.kill()
    _, err = proc.communicate(timeout=30)
    assert "Current thread" in err or "Stack (most recent call first)" in err, err
