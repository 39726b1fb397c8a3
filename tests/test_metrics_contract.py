"""Metrics-contract tests mirroring the reference integration harness.

The reference's scripts/test suite runs real binaries and asserts metrics
parsed from their logs with tolerances (res/test/translator.json;
test_master_class.py check_metrics). Same shape here: run the CLI flows on
the bundled synthetic data and hold the quality contract:

- DerpCLI -> ComputeRephotographyErrors: rephoto MSSIM above a floor
  (reference contract: 90.0 +-0.05 on its S3 dataset; our floor is scaled
  to the tiny synthetic scene)
- Calibration (artificial points + perturbation): median reprojection
  error under --max_error (reference: 0.4 +-0.125 px, threshold 0.5)
- RigCompare on perturb/recover: diffs match the perturbation magnitudes
"""

import logging
import os

import numpy as np
import pytest

from facebook360_dep_tpu.cli import (
    compute_rephotography_errors,
    derp_cli,
    log_reader,
    rig_simulator,
)
from facebook360_dep_tpu.core import camera as cam, io


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("proj"))
    rig_simulator.main([
        "--dest", root, "--num_cameras", "4", "--resolution", "96", "--levels", "2",
    ])
    return root


@pytest.mark.slow
def test_derp_rephoto_contract(project, caplog):
    out = os.path.join(project, "out")
    derp_cli.main([
        "--input_root", project, "--output_root", out,
        "--min_depth_m", "1.0", "--max_depth_m", "100.0", "--resolution", "96",
    ])

    rephoto_dir = os.path.join(project, "rephoto")
    with caplog.at_level(logging.INFO):
        compute_rephotography_errors.main([
            "--color", os.path.join(project, "video/color_levels/level_0"),
            "--disparity", os.path.join(out, "disparity_levels/level_0"),
            "--rig", os.path.join(project, "rigs/rig_calibrated.json"),
            "--output", rephoto_dir,
            "--first", "000000", "--last", "000000",
        ])
    # logs are the metrics transport (SURVEY §5.5): parse the MSSIM line
    metrics, progress = {}, {}
    for rec in caplog.records:
        log_reader.scan_line(rec.getMessage(), metrics, progress)
    assert "rephoto_mssim_r" in metrics, [r.getMessage() for r in caplog.records][-5:]
    mssim = np.mean([
        metrics["rephoto_mssim_r"][-1],
        metrics["rephoto_mssim_g"][-1],
        metrics["rephoto_mssim_b"][-1],
    ])
    # tiny 2-level synthetic run: hold a floor rather than the reference's
    # 90.0 +-0.05 contract (which binds to its S3 dataset and resolution —
    # MSSIM's 11 px window penalizes 96 px images). Deterministic solve
    # measures 87.1 here; 85 leaves platform margin. At 2K the bench
    # reports ~99.4 (BENCH detail rephoto_mssim_pct); the reference's own
    # 90-contract binds at 256 px in test_derp_rephoto_reference_contract.
    assert mssim > 85.0, mssim


@pytest.mark.slow
def test_derp_rephoto_reference_contract(tmp_path, caplog):
    """The reference's ACTUAL quality bar — rephoto MSSIM >= 90.0 - 0.05
    (res/test/translator.json DerpCLITest) — at a resolution where MSSIM's
    11 px window is no longer the binding constraint. Measured 92.85 at
    256 px (round 4), so the reference tolerance holds with real margin."""
    root = str(tmp_path / "proj")
    rig_simulator.main([
        "--dest", root, "--num_cameras", "4", "--resolution", "256", "--levels", "3",
    ])
    out = os.path.join(root, "out")
    derp_cli.main([
        "--input_root", root, "--output_root", out,
        "--min_depth_m", "1.0", "--max_depth_m", "100.0", "--resolution", "256",
    ])
    with caplog.at_level(logging.INFO):
        compute_rephotography_errors.main([
            "--color", os.path.join(root, "video/color_levels/level_0"),
            "--disparity", os.path.join(out, "disparity_levels/level_0"),
            "--rig", os.path.join(root, "rigs/rig_calibrated.json"),
            "--output", os.path.join(root, "rephoto"),
            "--first", "000000", "--last", "000000",
        ])
    metrics, progress = {}, {}
    for rec in caplog.records:
        log_reader.scan_line(rec.getMessage(), metrics, progress)
    mssim = np.mean([
        metrics["rephoto_mssim_r"][-1],
        metrics["rephoto_mssim_g"][-1],
        metrics["rephoto_mssim_b"][-1],
    ])
    assert mssim >= 90.0 - 0.05, mssim


def test_calibration_artificial_points_contract(tmp_path):
    from facebook360_dep_tpu.cli import calibration as calib_cli
    from facebook360_dep_tpu.render import synthetic

    rig = synthetic.make_test_rig(num_cameras=6, resolution=(640, 480), ring_radius=0.15)
    rig_path = str(tmp_path / "rig.json")
    cam.save_rig(rig_path, rig)
    # direct API call with artificial points (GeometricCalibration --matches="")
    import argparse

    p = argparse.ArgumentParser()
    calib_cli.add_geo_flags(p)
    args = p.parse_args([
        "--rig_in", rig_path, "--matches", "", "--rig_out", str(tmp_path / "out.json"),
        "--pass_count", "3", "--perturb_rotations", "0.005", "--seed", "3",
        "--point_error_stddev", "0.3", "--point_count", "3000",
        "--lock_principals", "true", "--lock_focal", "true",
    ])
    median = calib_cli.run_geometric_calibration(args)
    # reference contract: median error 0.4 +-0.125, validity threshold 0.5 px
    assert median < 0.5, median


def test_rig_compare_contract(tmp_path):
    from facebook360_dep_tpu.calib import rig_tools
    from facebook360_dep_tpu.render import synthetic

    rig = synthetic.make_test_rig(num_cameras=4, resolution=(64, 48), ring_radius=0.2)
    pert = cam.perturb_cameras(rig, pos_amount=0.05, rot_amount=0.0, seed=11)
    diffs = rig_tools.compare_rigs(pert, rig)
    # perturbation of +-0.05 uniform per axis: average position diff in
    # [0.02, 0.09] (norm of 3 uniforms), rotation untouched
    assert 0.02 < diffs["position"] < 0.09, diffs
    assert diffs["forward"] < 1e-6 and diffs["focal"] == 0.0


@pytest.mark.slow
def test_occluder_scene_contract(tmp_path):
    """VERDICT #10: a BVH-raytraced scene the analytic path can't render
    (room + floating occluder boxes -> depth discontinuities + occlusion),
    solved coarse-to-fine under 5% median rel err vs raytraced truth."""
    root = str(tmp_path / "proj")
    rig_simulator.main([
        "--dest", root, "--num_cameras", "4", "--resolution", "96",
        "--levels", "2", "--scene", "occluders", "--num_occluders", "3",
    ])
    out = os.path.join(root, "out")
    derp_cli.main([
        "--input_root", root, "--output_root", out,
        "--min_depth_m", "1.0", "--max_depth_m", "50.0", "--resolution", "96",
    ])
    rig = cam.load_rig(os.path.join(root, "rigs/rig_calibrated.json"))
    rels = []
    for cam_id in rig.ids:
        disp = io.read_disparity(
            os.path.join(out, "disparity_levels/level_0", cam_id, "000000.pfm")
        )
        gt = io.read_disparity(os.path.join(root, "truth", cam_id, "000000.pfm"))
        m = np.zeros(disp.shape, bool)
        m[6:-6, 6:-6] = True
        valid = np.isfinite(disp) & np.isfinite(gt) & m
        rels.append(np.abs(disp[valid] - gt[valid]) / gt[valid])
    med = float(np.median(np.concatenate(rels)))
    assert med < 0.05, f"median rel err {med:.4f} on the occluder scene"
