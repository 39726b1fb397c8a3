"""Calibration solver tests using the reference's own validation strategy:
artificial points with known ground truth + perturb/recover
(GeometricCalibration.cpp generateArtificalPoints + perturb_* flags)."""

import numpy as np
import pytest

import jax

from facebook360_dep_tpu.calib import ba, calibration
from facebook360_dep_tpu.core import camera as cam
from facebook360_dep_tpu.render import synthetic


@pytest.fixture(scope="module")
def rig():
    return synthetic.make_test_rig(num_cameras=6, resolution=(640, 480), ring_radius=0.2, type_name="FTHETA")


def test_rodrigues_roundtrip():
    rv = np.asarray([0.1, -0.2, 0.3])
    r = np.asarray(ba.rodrigues(rv))
    back = ba.rotation_to_rotvec(r)
    np.testing.assert_allclose(back, rv, atol=1e-12)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)


def test_triangulate_exact(rig):
    pts = np.asarray([[0.5, 1.0, -4.0], [-1.0, 0.3, -6.0]])
    cams64 = jax.tree.map(
        lambda a: np.asarray(a, np.float64) if np.asarray(a).dtype.kind == "f" else np.asarray(a),
        rig.cameras,
    )
    n = len(rig.ids)
    obs_cam = np.tile(np.arange(n), (2, 1))
    obs_pix = np.zeros((2, n, 2))
    obs_valid = np.zeros((2, n), bool)
    for t in range(2):
        for i in range(n):
            pix, valid = cam.sees(rig.camera(i), pts[t])
            obs_pix[t, i] = np.asarray(pix)
            obs_valid[t, i] = bool(valid)
    assert obs_valid.sum(axis=1).min() >= 2
    recon = ba.triangulate(cams64, obs_cam, obs_pix, obs_valid)
    np.testing.assert_allclose(recon, pts, atol=1e-6)


def test_calibration_recovers_rotation_perturbation(rig):
    """Perturb rotations, recover with artificial points (the reference's
    CalibrationTest analogue; positions locked as in the default flags)."""
    features, overlaps = calibration.generate_artificial_points(
        rig, count=800, min_dist=1.0, error_stddev=0.0, seed=3
    )
    perturbed = cam.perturb_cameras(rig, rot_amount=0.01, seed=4)
    opts = calibration.CalibrationOptions(pass_count=3, robust=True)
    solved, median = calibration.geometric_calibration(perturbed, features, overlaps, opts)

    report_before = calibration.rig_rmse_report(perturbed, rig)
    report_after = calibration.rig_rmse_report(solved, rig)
    assert median < 0.05, f"median reprojection error {median}"
    assert report_after["forward"] < report_before["forward"] * 0.1, (
        report_before,
        report_after,
    )


def test_calibration_with_noise_stays_bounded(rig):
    features, overlaps = calibration.generate_artificial_points(
        rig, count=600, min_dist=1.0, error_stddev=0.5, seed=5
    )
    perturbed = cam.perturb_cameras(rig, rot_amount=0.005, principal_amount=2.0, seed=6)
    opts = calibration.CalibrationOptions(pass_count=3)
    solved, median = calibration.geometric_calibration(perturbed, features, overlaps, opts)
    # with 0.5 px keypoint noise the reference expects ~0.4 px median
    assert median < 0.8, f"median reprojection error {median}"


def test_matches_json_roundtrip(tmp_path, rig):
    import json

    features, overlaps = calibration.generate_artificial_points(rig, count=50, seed=7)
    obj = {
        "images": {
            f"video/{cid}/000000.png": [{"x": float(x), "y": float(y)} for x, y in feats]
            for cid, feats in features.items()
        },
        "all_matches": [
            {
                "image1": f"video/{i0}/000000.png",
                "image2": f"video/{i1}/000000.png",
                "matches": [{"idx1": a, "idx2": b, "score": 0.9} for a, b in pairs],
            }
            for i0, i1, pairs in overlaps
        ],
    }
    p = tmp_path / "matches.json"
    p.write_text(json.dumps(obj))
    feats2, overlaps2 = calibration.load_matches_json(p, rig)
    assert len(feats2) == len([k for k, v in features.items() if len(v)])
    total_pairs = sum(len(pairs) for _, _, pairs in overlaps)
    total_pairs2 = sum(len(pairs) for _, _, pairs in overlaps2)
    assert total_pairs == total_pairs2


@pytest.mark.slow
def test_calibration_debug_overlays(tmp_path):
    """showMatches/showReprojections (GeometricCalibration.cpp:821-872):
    --debug_dir writes pass0 match overlays + per-camera reprojection
    renders."""
    import glob
    import os

    import numpy as np

    from facebook360_dep_tpu.calib import calibration as geo
    from facebook360_dep_tpu.core import camera as cam
    from facebook360_dep_tpu.render import synthetic

    rig = synthetic.make_test_rig(num_cameras=4, resolution=(320, 240), ring_radius=0.15)
    feats, overlaps = geo.generate_artificial_points(rig, 300, 1.0, 0.3, seed=1)
    debug = str(tmp_path / "debug")
    opts = geo.CalibrationOptions(pass_count=2, debug_dir=debug)
    geo.geometric_calibration(rig, feats, overlaps, opts)
    matches = glob.glob(os.path.join(debug, "pass0_*.png"))
    assert matches, "no match overlays written"
    for cam_id in rig.ids:
        assert os.path.exists(os.path.join(debug, f"{cam_id}.png")), cam_id
    import cv2

    img = cv2.imread(matches[0])
    assert img is not None and img.shape[1] == 640  # side-by-side pair
    assert img.any()  # lines/circles drawn
