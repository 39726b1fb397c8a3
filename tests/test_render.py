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


def test_ods_eye_offset_tangency_invariants():
    """The ODS pupil solve (RigScene.cpp:86-131 re-derivation): for every
    point p the returned eye e must satisfy |e| = ipd(lat)/2, the view ray
    (p - e) tangent to the pupil circle (e . (p.xy - e) = 0), and the
    Pythagorean split |p.xy|^2 = |e|^2 + d^2."""
    rng = np.random.default_rng(3)
    ipd_m = 0.032
    p = rng.uniform(-5, 5, (256, 3)).astype(np.float32)
    p = p[np.linalg.norm(p[:, :2], axis=1) > 0.2]  # outside the pupil circle
    e = np.asarray(dibr.ods_eye_offset(p, ipd_m))
    assert (e[:, 2] == 0).all()
    ray_xy = p[:, :2] - e[:, :2]
    d = np.linalg.norm(ray_xy, axis=1)
    lat = np.arctan2(p[:, 2], d)
    expect_radius = 0.5 * np.asarray(dibr.ods_ipd(lat, ipd_m))
    np.testing.assert_allclose(np.linalg.norm(e[:, :2], axis=1), expect_radius, atol=1e-5)
    # tangency: the in-plane view ray is perpendicular to the pupil offset
    dots = np.abs(np.sum(e[:, :2] * ray_xy, axis=1))
    np.testing.assert_array_less(dots, 1e-4)
    np.testing.assert_allclose(
        np.sum(p[:, :2] ** 2, axis=1),
        np.linalg.norm(e[:, :2], axis=1) ** 2 + d * d,
        rtol=1e-4,
    )
    # the right eye is the OTHER tangent point: same pupil radius, same
    # tangency, opposite handedness of (p x e) about z
    e_r = np.asarray(dibr.ods_eye_offset(p, -ipd_m))
    np.testing.assert_allclose(
        np.linalg.norm(e_r[:, :2], axis=1), expect_radius, atol=1e-5
    )
    cross_l = p[:, 0] * e[:, 1] - p[:, 1] * e[:, 0]
    cross_r = p[:, 0] * e_r[:, 1] - p[:, 1] * e_r[:, 0]
    assert (cross_l * cross_r < 0).all()
    assert np.abs(np.asarray(dibr.ods_eye_offset(p, 0.0))).max() == 0.0
    # poles: ipd fades to zero
    poles = np.asarray([[1e-3, 0, 5.0], [0, 1e-3, -5.0]], np.float32)
    assert np.abs(np.asarray(dibr.ods_eye_offset(poles, ipd_m))).max() < 1e-6


def test_ods_warp_equator_parallax_and_inverse():
    """On the equator the warp rotates azimuth by -atan(|e|/d) per eye, so the
    left/right views of a point at range R differ by 2*atan(s/sqrt(R^2-s^2))
    — the stereo baseline the viewer shows. ods_unwarp must invert the warp."""
    ipd_m = 0.032
    s = 0.016  # |e| at the equator (~falloff 1)
    R = 0.5
    theta = np.linspace(0, 2 * np.pi, 16, endpoint=False)
    p = np.stack([R * np.cos(theta), R * np.sin(theta), np.zeros_like(theta)], -1)
    wl = np.asarray(dibr.ods_warp(p, +ipd_m))
    wr = np.asarray(dibr.ods_warp(p, -ipd_m))
    az = lambda v: np.arctan2(v[:, 1], v[:, 0])  # noqa: E731
    dphi = (az(wl) - az(wr) + np.pi) % (2 * np.pi) - np.pi
    expect = 2 * np.arctan(s / np.sqrt(R * R - s * s))
    np.testing.assert_allclose(np.abs(dphi), expect, rtol=2e-3)
    # both eyes see the point at in-plane range d = sqrt(R^2 - s^2)
    np.testing.assert_allclose(
        np.linalg.norm(wl[:, :2], axis=1), np.sqrt(R * R - s * s), rtol=1e-4
    )
    # fixed-point inverse recovers the mono geometry
    back = np.asarray(dibr.ods_unwarp(wl, +ipd_m))
    np.testing.assert_allclose(back, p, atol=1e-6)


def test_render_equirect_stereo_pair(scene):
    rig, colors, gt = scene
    cl, _, al = dibr.render_equirect(rig, colors, gt, [0.0, 0.0, 0.0], 64, 32, ipd=+0.016)
    cr, _, ar = dibr.render_equirect(rig, colors, gt, [0.0, 0.0, 0.0], 64, 32, ipd=-0.016)
    cm, _, _ = dibr.render_equirect(rig, colors, gt, [0.0, 0.0, 0.0], 64, 32)
    assert cl.shape == cr.shape == cm.shape
    assert np.asarray(al).mean() > 0.2 and np.asarray(ar).mean() > 0.2
    # the eyes must actually differ (parallax), mono must sit between them
    assert np.abs(cl - cr).max() > 1e-4
    assert np.abs(cl - cm).max() > 0 and np.abs(cr - cm).max() > 0


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
