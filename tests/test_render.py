"""Tests for rendering: SSIM metric, DIBR novel-view synthesis, foreground masks."""

import numpy as np
import pytest

from facebook360_dep_tpu.core import camera as cam
from facebook360_dep_tpu.render import dibr, foreground, rephoto, synthetic


def test_ssim_identical_images():
    img = np.random.RandomState(0).rand(16, 16, 3).astype(np.float32)
    s = np.asarray(rephoto.compute_ssim(img, img, blur_radius=1))
    np.testing.assert_allclose(s, 1.0, atol=1e-4)


def test_ssim_decreases_with_noise():
    rng = np.random.RandomState(1)
    img = rng.rand(32, 32, 3).astype(np.float32)
    a = rephoto.average_score(rephoto.compute_ssim(img, img, 1))
    noisy = np.clip(img + 0.2 * rng.randn(32, 32, 3).astype(np.float32), 0, 1)
    b = rephoto.average_score(rephoto.compute_ssim(img, noisy, 1))
    assert np.all(b < a)
    # NCC = SSIM with alpha=beta=0
    ncc = np.asarray(rephoto.compute_score_map("NCC", img, img, 1))
    np.testing.assert_allclose(ncc, 1.0, atol=1e-4)


def test_cube_dir_roundtrip():
    s = 16
    dirs = np.asarray(dibr.cube_dirs(s))  # (6, S, S, 3)
    face, x, y = dibr.dir_to_cube(dirs.reshape(-1, 3), s)
    face = np.asarray(face).reshape(6, s, s)
    x = np.asarray(x).reshape(6, s, s)
    y = np.asarray(y).reshape(6, s, s)
    for f in range(6):
        assert (face[f] == f).all(), f"face {f} misassigned"
    grid = np.arange(s) + 0.5
    np.testing.assert_allclose(x[0], np.tile(grid, (s, 1)), atol=1e-4)
    np.testing.assert_allclose(y[0], np.tile(grid[:, None], (1, s)), atol=1e-4)


def test_equirect_dir_roundtrip():
    w, h = 32, 16
    dirs = np.asarray(dibr.equirect_dirs(w, h))
    x, y = dibr.world_to_equirect(dirs, w, h)
    grid_x = np.tile(np.arange(w) + 0.5, (h, 1))
    grid_y = np.tile((np.arange(h) + 0.5)[:, None], (1, w))
    np.testing.assert_allclose(np.asarray(x), grid_x, atol=1e-3)
    np.testing.assert_allclose(np.asarray(y), grid_y, atol=1e-3)


@pytest.fixture(scope="module")
def scene():
    rig = synthetic.make_test_rig(num_cameras=4, resolution=(48, 36), ring_radius=0.2)
    colors, gt = synthetic.render_sphere_scene(rig, (48, 36), radius=5.0)
    return rig, colors, gt


def test_dibr_rephoto_self_consistency(scene):
    """Rendering a camera's own view vs the others' views of the same static
    sphere must score high MSSIM (the metric's happy path)."""
    rig, colors, gt = scene
    from facebook360_dep_tpu.cli.compute_rephotography_errors import rephotography_scores

    scores, total = rephotography_scores(rig, colors, gt, method="MSSIM", face_size=24)
    # splat-based DIBR at 24 px faces scores ~0.70; guard against regressions
    assert np.all(total > 0.6), f"TOTAL MSSIM too low: {total}"


def test_dibr_equirect_runs(scene):
    rig, colors, gt = scene
    color, disp, alpha = dibr.render_equirect(rig, colors, gt, [0.0, 0.0, 0.0], 64, 32)
    assert color.shape == (32, 64, 3)
    # forward hemisphere should be covered by the ring rig
    assert np.asarray(alpha).mean() > 0.2
    # rendered disparity approximates 1/sphere distance where defined
    d = np.asarray(disp)
    valid = np.isfinite(d)
    assert valid.any()
    np.testing.assert_allclose(np.nanmedian(d[valid]), 1.0 / 5.0, rtol=0.15)


def test_foreground_mask():
    bg = np.full((32, 32, 3), 0.5, np.float32)
    frame = bg.copy()
    frame[10:20, 12:22] = 0.9
    mask = np.asarray(foreground.generate_foreground_mask(bg, frame))
    assert mask[15, 15]
    assert not mask[2, 2]
    # roughly the painted square, allowing morphology slack
    assert 60 <= mask.sum() <= 200


def test_box_scene_and_equirect_truth(tmp_path):
    import os

    import numpy as np

    from facebook360_dep_tpu.cli import rig_simulator
    from facebook360_dep_tpu.core import io
    from facebook360_dep_tpu.render import synthetic

    rig = synthetic.make_test_rig(num_cameras=3, resolution=(48, 36), ring_radius=0.1)
    colors, gt = synthetic.render_box_scene(rig, (48, 36), half_extents=(4, 4, 2))
    assert colors.shape == (3, 36, 48, 3) and np.isfinite(gt).all()
    # box depths along axes reach the faces
    assert gt.min() > 1.0 / 7.0  # no hit farther than the box diagonal
    ec, ed = synthetic.ground_truth_equirect(rig, 64, 32, scene="box", half_extents=(4, 4, 2))
    assert ec.shape == (32, 64, 3) and np.isfinite(ed).all()

    rig_simulator.main([
        "--dest", str(tmp_path), "--num_cameras", "3", "--resolution", "48",
        "--levels", "2", "--scene", "box", "--box_half_extents", "4,4,2",
        "--eqr_width", "64",
    ])
    assert os.path.exists(tmp_path / "truth_eqr" / "000000_disparity.pfm")
    d = io.read_disparity(str(tmp_path / "truth" / "cam0" / "000000.pfm"))
    assert np.isfinite(d).all()
