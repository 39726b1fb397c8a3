"""Viewer rendering cross-check (VERDICT r2 #5): the server-fed mesh/color
buffers, rasterized offline and pushed through the EXACT reference
accumulate/resolve chain (dibr.accumulate_resolve = exponentialFS +
updateAccumulation + resolveAccumulation), must reproduce an independently
rendered golden view of the same scene. No browser exists in this image, so
this is the testable surface of the WebGL page's math: the page runs the
same buffers through the same formulas on the GPU.
"""

import os
import struct

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from facebook360_dep_tpu.core import camera as cam, io
from facebook360_dep_tpu.ops import sampling
from facebook360_dep_tpu.render import dibr, synthetic
from facebook360_dep_tpu.viewer import server


def test_exp_accumulate_resolve_math():
    """Unit-check the accumulate/resolve chain against the shader formulas."""
    cones = np.zeros((2, 4, 4), np.float32)
    cones[0] = 1.0    # camera A sees centrally
    cones[1] = 0.3    # camera B peripherally
    colors = np.zeros((2, 4, 4, 3), np.float32)
    colors[0] = 1.0
    colors[1] = 0.0
    rgb, acc = dibr.accumulate_resolve(colors, cones, fade=1.0)
    wa, wb = np.exp(30.0) - 1, np.exp(9.0) - 1
    np.testing.assert_allclose(np.asarray(acc), wa + wb, rtol=1e-5)
    # exponential weighting makes the central camera dominate ~e^21 : 1
    np.testing.assert_allclose(np.asarray(rgb)[..., 0], wa / (wa + wb), rtol=1e-5)
    assert np.asarray(rgb)[0, 0, 0] > 0.999999
    # fade scales the resolve linearly (resolveFS)
    rgb2, _ = dibr.accumulate_resolve(colors, cones, fade=0.25)
    np.testing.assert_allclose(np.asarray(rgb2), 0.25 * np.asarray(rgb), rtol=1e-5)
    # displacement fade ramp (render() :1087-1095)
    assert float(dibr.resolve_fade(0.0)) == pytest.approx(1.0)
    assert float(dibr.resolve_fade(1.0)) == pytest.approx(0.05 ** 2)
    assert 0.05 ** 2 < float(dibr.resolve_fade(0.6)) < 1.0


def _rasterize_equirect(pos, uv, faces, center, width, height):
    """Z-buffered barycentric rasterization of a world mesh into an equirect
    view from ``center``: returns (uv map (H, W, 2) NaN where uncovered)."""
    rel = pos - center
    px, py = dibr.world_to_equirect(jnp.asarray(rel), width, height)
    px, py = np.asarray(px), np.asarray(py)
    depth = np.linalg.norm(rel, axis=1)
    zbuf = np.full((height, width), np.inf, np.float32)
    uvmap = np.full((height, width, 2), np.nan, np.float32)
    for (a, b, c) in faces:
        xs = np.asarray([px[a], px[b], px[c]])
        ys = np.asarray([py[a], py[b], py[c]])
        if not (np.isfinite(xs).all() and np.isfinite(ys).all()):
            continue
        if xs.max() - xs.min() > width / 2:  # equirect seam wrap
            continue
        x0, x1 = int(np.floor(xs.min() - 0.5)), int(np.ceil(xs.max() - 0.5))
        y0, y1 = int(np.floor(ys.min() - 0.5)), int(np.ceil(ys.max() - 0.5))
        x0, x1 = max(x0, 0), min(x1, width - 1)
        y0, y1 = max(y0, 0), min(y1, height - 1)
        if x1 < x0 or y1 < y0:
            continue
        gx, gy = np.meshgrid(np.arange(x0, x1 + 1) + 0.5, np.arange(y0, y1 + 1) + 0.5)
        d = (ys[1] - ys[2]) * (xs[0] - xs[2]) + (xs[2] - xs[1]) * (ys[0] - ys[2])
        if abs(d) < 1e-12:
            continue
        l0 = ((ys[1] - ys[2]) * (gx - xs[2]) + (xs[2] - xs[1]) * (gy - ys[2])) / d
        l1 = ((ys[2] - ys[0]) * (gx - xs[2]) + (xs[0] - xs[2]) * (gy - ys[2])) / d
        l2 = 1.0 - l0 - l1
        inside = (l0 >= 0) & (l1 >= 0) & (l2 >= 0)
        if not inside.any():
            continue
        z = l0 * depth[a] + l1 * depth[b] + l2 * depth[c]
        sub_z = zbuf[y0:y1 + 1, x0:x1 + 1]
        win = inside & (z < sub_z)
        sub_z[win] = z[win]
        u = l0 * uv[a, 0] + l1 * uv[b, 0] + l2 * uv[c, 0]
        v = l0 * uv[a, 1] + l1 * uv[b, 1] + l2 * uv[c, 1]
        sub_uv = uvmap[y0:y1 + 1, x0:x1 + 1]
        sub_uv[win] = np.stack([u[win], v[win]], axis=-1)
    return uvmap


@pytest.mark.slow
def test_server_buffers_reproduce_offline_golden(tmp_path):
    """2-camera synthetic rig published end-to-end (mesh + BC7 + fusion); the
    server's mesh/color buffers rasterized + exp-accumulated must match the
    golden DIBR render of the same scene from the same eye."""
    import cv2

    from facebook360_dep_tpu.cli import convert_to_binary as ctb

    size = (64, 48)
    rig = synthetic.make_test_rig(num_cameras=2, resolution=size, ring_radius=0.1)
    nrig = cam.normalize_rig(rig)
    colors, gt = synthetic.render_sphere_scene(rig, size, radius=5.0)

    disp_dir, color_dir = str(tmp_path / "disp"), str(tmp_path / "color")
    for i, cid in enumerate(nrig.ids):
        os.makedirs(os.path.join(disp_dir, cid))
        os.makedirs(os.path.join(color_dir, cid))
        io.write_pfm(os.path.join(disp_dir, cid, "000000.pfm"), np.asarray(gt[i], np.float32))
        io.write_color(os.path.join(color_dir, cid, "000000.png"), np.asarray(colors[i]), bit_depth=8)
    rig_path = str(tmp_path / "rig.json")
    cam.save_rig(rig_path, nrig)
    ctb.main([
        "--rig", rig_path, "--bin", str(tmp_path / "bin"),
        "--color", color_dir, "--disparity", disp_dir,
        "--fused", str(tmp_path / "fused"),
        "--triangles", "3000", "--threads", "1", "--gamma_correction", "1.0",
    ])

    sd = server.SceneData(rig_path, str(tmp_path / "fused"))
    width, height = 96, 48
    center = np.mean(np.asarray(nrig.cameras.position), axis=0)

    cams_colors, cams_cones = [], []
    for cid in nrig.ids:
        buf = sd.mesh("000000", cid)
        nv, nf = struct.unpack_from("<II", buf)
        pos = np.frombuffer(buf, np.float32, nv * 3, 8).reshape(-1, 3).astype(np.float64)
        uv = np.frombuffer(buf, np.float32, nv * 2, 8 + nv * 12).reshape(-1, 2).astype(np.float64)
        faces = np.frombuffer(buf, np.uint32, nf * 3, 8 + nv * 20).reshape(-1, 3)
        png = sd.color_png("000000", cid)
        img = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_COLOR)[..., ::-1]
        img = img.astype(np.float32) / 255.0

        uvmap = _rasterize_equirect(pos, uv, faces, center, width, height)
        covered = np.isfinite(uvmap[..., 0])
        coords = np.stack(
            [uvmap[..., 0] * img.shape[1], uvmap[..., 1] * img.shape[0]], axis=-1
        )
        sampled = np.asarray(sampling.bilinear_sample(
            jnp.asarray(img), jnp.asarray(np.nan_to_num(coords, nan=0.5), jnp.float32)
        ))
        # cameraFS cone from the interpolated uv
        r = 2.0 * np.linalg.norm(uvmap - 0.5, axis=-1)
        cone = np.where(covered, np.maximum(1.0 - r, 1.0 / 255.0), 0.0)
        cams_colors.append(np.nan_to_num(sampled))
        cams_cones.append(cone.astype(np.float32))

    rgb, acc = dibr.accumulate_resolve(np.stack(cams_colors), np.stack(cams_cones), fade=1.0)
    rgb = np.asarray(rgb)
    acc = np.asarray(acc)

    golden_rgb, _, golden_alpha = dibr.render_equirect(
        nrig, np.asarray(colors)[..., :3], np.asarray(gt), center, width, height
    )

    both = (acc > 0) & np.asarray(golden_alpha)
    # two forward-facing rectilinear cameras cover ~24% of the equirect
    assert both.mean() > 0.15, both.mean()
    diff = np.abs(rgb - golden_rgb)[both]
    assert np.median(diff) < 0.05, np.median(diff)
    assert diff.mean() < 0.12, diff.mean()
