"""AlignPointCloud recovery + threshold-report tool tests."""

import os

import numpy as np
import pytest

from facebook360_dep_tpu.cli import align_point_cloud as apc


def _random_cloud(n=3000, seed=0):
    rng = np.random.RandomState(seed)
    # points on a box shell around the origin, 2-6 m away
    pts = rng.uniform(-1, 1, (n, 3))
    pts /= np.abs(pts).max(axis=1, keepdims=True)
    return pts * rng.uniform(2.0, 6.0, (n, 1))


def test_icp_recovers_similarity():
    from scipy.spatial.transform import Rotation

    cloud = _random_cloud()
    r_true = Rotation.from_rotvec([0.04, -0.03, 0.05]).as_matrix()
    s_true, t_true = 1.05, np.asarray([0.2, -0.1, 0.15])
    # rig points = cloud mapped by the INVERSE transform (rig frame)
    rig_pts = (np.linalg.inv(r_true) @ ((cloud - t_true) / s_true).T).T

    r, t, s, median = apc.align_points_icp(rig_pts, cloud, iterations=30)
    assert median < 1e-3, median
    assert s == pytest.approx(s_true, abs=1e-3)
    assert np.allclose(r, r_true, atol=1e-3)
    assert np.allclose(t, t_true, atol=5e-3)


def test_icp_respects_locks():
    cloud = _random_cloud(seed=1)
    rig_pts = (cloud - np.asarray([0.3, 0.0, 0.0])) / 1.1
    r, t, s, _ = apc.align_points_icp(
        rig_pts, cloud, iterations=10, lock_rotation=True
    )
    assert np.allclose(r, np.eye(3))
    r, t, s, _ = apc.align_points_icp(
        rig_pts, cloud, iterations=10, lock_scale=True, lock_rotation=True
    )
    assert s == 1.0


def test_align_point_cloud_cli(tmp_path):
    import jax
    import jax.numpy as jnp

    from facebook360_dep_tpu.core import camera as cam, io
    from facebook360_dep_tpu.ops import sampling
    from facebook360_dep_tpu.render import synthetic

    size = (64, 48)
    rig = synthetic.make_test_rig(num_cameras=4, resolution=size, ring_radius=0.1)
    _, gt_disp = synthetic.render_sphere_scene(rig, size, radius=5.0)
    for i, cam_id in enumerate(rig.ids):
        d = tmp_path / "disparity" / cam_id
        os.makedirs(d, exist_ok=True)
        io.write_disparity(str(d / "000000.pfm"), gt_disp[i])
    cam.save_rig(str(tmp_path / "rig.json"), rig)

    # cloud = the sphere scene geometry sampled from camera 0's ground truth,
    # shifted: CLI should find the shift
    c0 = cam.rescale(rig.camera(0), [size[0], size[1]])
    grid = sampling.pixel_center_grid(size[1], size[0])
    world = np.asarray(cam.rig_point(
        jax.tree.map(jnp.asarray, c0), grid, jnp.asarray(1.0 / gt_disp[0])
    )).reshape(-1, 3)
    shift = np.asarray([0.05, -0.02, 0.03])
    np.savetxt(str(tmp_path / "cloud.xyz"), world + shift)

    median = apc.main([
        "--point_cloud", str(tmp_path / "cloud.xyz"),
        "--rig_in", str(tmp_path / "rig.json"),
        "--rig_out", str(tmp_path / "rig_aligned.json"),
        "--disparity", str(tmp_path / "disparity"),
        "--cameras", rig.ids[0],
        "--max_points_per_cam", "5000",
        "--iterations", "15",
    ])
    assert median < 0.02
    aligned = cam.load_rig(str(tmp_path / "rig_aligned.json"))
    moved = np.asarray(aligned.camera(0).position) - np.asarray(rig.camera(0).position)
    assert np.allclose(moved, shift, atol=0.02), (moved, shift)


def test_view_thresholds_cli(tmp_path):
    import json

    from facebook360_dep_tpu.cli import view_thresholds as vt
    from facebook360_dep_tpu.core import io

    rng = np.random.RandomState(3)
    img = rng.rand(32, 48, 3).astype(np.float32)
    io.write_color(str(tmp_path / "img.png"), img)
    vt.main([
        "color_variance", "--fullsize_image", str(tmp_path / "img.png"),
        "--width", "0", "--steps", "3", "--output_dir", str(tmp_path / "var"),
    ])
    report = json.load(open(tmp_path / "var" / "variance_sweep.json"))
    assert len(report["sweep"]) == 3
    fr = report["sweep"][0]
    assert fr["frac_below"] + fr["frac_between"] + fr["frac_above"] == pytest.approx(1.0, abs=1e-6)

    bg = np.zeros((32, 48, 3), np.float32)
    fg = bg.copy()
    fg[8:24, 16:32] = 0.8  # a bright foreground box
    io.write_color(str(tmp_path / "bg.png"), bg)
    io.write_color(str(tmp_path / "fg.png"), fg)
    vt.main([
        "foreground_masks",
        "--fullsize_bg_image", str(tmp_path / "bg.png"),
        "--fullsize_fg_image", str(tmp_path / "fg.png"),
        "--width", "0", "--steps", "2", "--blur_radius_max", "2",
        "--morph_closing_size_max", "4", "--output_dir", str(tmp_path / "fgm"),
    ])
    sweep = json.load(open(tmp_path / "fgm" / "mask_sweep.json"))
    assert any(0.05 < s["foreground_frac"] < 0.6 for s in sweep)
