"""Camera model tests mirroring the reference suites
(source/test/util/{FTheta,Rectilinear,Orthographic}Test.cpp) plus EQUISOLID,
validated against the JSON fixtures in the reference's res/test/cameras.
"""

import json
import math
import os

import numpy as np
import pytest

from facebook360_dep_tpu.core import camera as cam

REF_CAMERAS = "/root/reference/res/test/cameras"

FTHETA_JSON = {
    "version": 1,
    "type": "FTHETA",
    "origin": [-10.51814, 13.00734, -4.22656],
    "forward": [-0.6096207796429852, 0.7538922995778138, -0.24496715221587234],
    "up": [0.7686134846014325, 0.6376793279268061, 0.050974366338976666],
    "right": [0.19502945167097138, -0.15702371237098722, -0.9681462011153862],
    "resolution": [2448, 2048],
    "focal": [1240, -1240],
    "id": "cam1",
}

EPS = 1.0 / cam.KNEAR_INFINITY


def make(type_name, **overrides):
    obj = dict(FTHETA_JSON, type=type_name)
    obj.update(overrides)
    c, cam_id, _ = cam.camera_from_json(obj)
    return c, cam_id


def ref_fixture(name):
    path = os.path.join(REF_CAMERAS, f"{name}.json")
    if not os.path.exists(path):
        pytest.skip(f"no reference fixture {path}")
    with open(path) as f:
        return json.load(f)


ALL_TYPES = ["FTHETA", "RECTILINEAR", "EQUISOLID", "ORTHOGRAPHIC"]


@pytest.mark.parametrize("type_name", ALL_TYPES)
def test_initialization(type_name):
    c, cam_id = make(type_name)
    assert cam_id == "cam1"
    np.testing.assert_allclose(np.asarray(c.position), FTHETA_JSON["origin"])
    np.testing.assert_allclose(np.asarray(c.right), FTHETA_JSON["right"], atol=1e-3)
    # forward projects to the principal point
    center = cam.pixel(c, np.asarray(c.position) + np.asarray(c.forward))
    np.testing.assert_allclose(np.asarray(center), [2448 / 2, 2048 / 2], atol=1e-9)


@pytest.mark.parametrize("type_name", ALL_TYPES)
def test_undo_pixel(type_name):
    c, _ = make(type_name)
    d = 3.1
    direction = np.asarray([-2.0, 3.0, -1.0])
    direction /= np.linalg.norm(direction)
    target = np.asarray(c.position) + d * direction
    pix, valid = cam.sees(c, target)
    assert bool(valid)
    recon = cam.rig_point(c, pix, d)
    np.testing.assert_allclose(np.asarray(recon), target, atol=1e-9)


@pytest.mark.parametrize("type_name", ALL_TYPES)
def test_undo_pixel_batched(type_name):
    """Whole-image vectorization: (H, W) pixels round-trip in one call."""
    c, _ = make(type_name)
    c = cam.normalize(c)
    h, w = 16, 24
    ys, xs = np.mgrid[0:h, 0:w]
    pix = np.stack([(xs + 0.5) / w, (ys + 0.5) / h], axis=-1)
    depth = 5.0
    pts = cam.rig_point(c, pix, depth)
    pix2 = cam.pixel(c, pts)
    inside = ~np.asarray(cam.is_outside_image_circle(c, pix))
    # for hemisphere cams only test forward-hemisphere pixels
    infov = ~np.asarray(cam.is_outside_fov(c, pts))
    sel = inside & infov
    if type_name == "ORTHOGRAPHIC":
        # r = sin(theta) saturates at the sensor unit circle; stay inside it
        sensor = (pix - np.asarray(c.principal)) / np.asarray(c.focal)
        sel &= np.linalg.norm(sensor, axis=-1) < 0.95
    assert sel.sum() > h * w // 4
    np.testing.assert_allclose(np.asarray(pix2)[sel], pix[sel], atol=1e-7)


def test_fov_ftheta():
    c, _ = make("FTHETA")
    assert bool(cam.is_default_fov(c))
    corner = np.asarray([1.0, 1.0])
    pt = cam.rig_near_infinity(c, corner)
    _, valid = cam.sees(c, pt)
    assert bool(valid)

    c09 = c._replace(cos_fov=np.cos(0.9 * math.pi))
    assert abs(math.acos(float(c09.cos_fov)) - 0.9 * math.pi) < 1e-10

    c01 = c._replace(cos_fov=np.cos(0.1 * math.pi))
    pt = cam.rig_near_infinity(c01, corner)
    _, valid = cam.sees(c01, pt)
    assert not bool(valid)
    assert bool(cam.is_outside_image_circle(c01, corner))

    center_ish = np.asarray([1200.0, 1000.0])
    pt = cam.rig_near_infinity(c01, center_ish)
    _, valid = cam.sees(c01, pt)
    assert bool(valid)
    assert not bool(cam.is_outside_image_circle(c01, center_ish))

    # back to default
    pt = cam.rig_near_infinity(c, corner)
    _, valid = cam.sees(c, pt)
    assert bool(valid)
    assert not bool(cam.is_outside_image_circle(c, corner))


def test_distort_undistort_nop():
    c, _ = make("FTHETA")
    x = np.asarray(3.0)
    assert abs(float(cam.undistort(c, cam.distort(c, x))) - 3.0) < EPS


def test_distort_undistort():
    c, _ = make("FTHETA", distortion=[0.20, 0.02])
    x = np.asarray(2.0)
    distorted = cam.distort(c, x)
    undistorted = cam.undistort(c, distorted)
    assert abs(float(undistorted) - 2.0) < EPS

    # negative real roots of the derivative -> unbounded distortion
    c2, _ = make("FTHETA", distortion=[2 / 3.0, 1 / 5.0])
    assert math.isinf(float(c2.distortion_max))
    # imaginary roots -> unbounded
    c3, _ = make("FTHETA", distortion=[1.0, 1.0])
    assert math.isinf(float(c3.distortion_max))


def test_undistort_monotonic():
    c, _ = make("FTHETA", distortion=[-0.03658484692522479, -0.004515457470690702])
    ys = np.arange(0.0, 3.0, 0.1)
    xs = np.asarray(cam.undistort(c, ys))
    assert np.all(np.diff(xs) >= -EPS)


def test_normalize_and_rescale():
    c, _ = make("FTHETA")
    n = cam.normalize(c)
    np.testing.assert_allclose(
        np.asarray(n.principal), np.asarray(c.principal) / np.asarray(c.resolution), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(n.focal), np.asarray(c.focal) / np.asarray(c.resolution), atol=1e-12
    )
    assert cam.is_normalized(n)

    r = cam.rescale(c, np.asarray(c.resolution) * 1.2)
    np.testing.assert_allclose(np.asarray(r.principal), np.asarray(c.principal) * 1.2, atol=1e-10)
    np.testing.assert_allclose(np.asarray(r.focal), np.asarray(c.focal) * 1.2, atol=1e-10)


@pytest.mark.parametrize("name", ["ftheta", "rectilinear", "orthographic"])
def test_reference_fixture_roundtrip(name):
    obj = ref_fixture(name)
    c, cam_id, _ = cam.camera_from_json(obj)
    assert cam_id == obj["id"]
    d = 7.3
    direction = np.asarray([-1.0, 2.0, -0.5])
    direction /= np.linalg.norm(direction)
    target = np.asarray(c.position) + d * direction
    pix, valid = cam.sees(c, target)
    if bool(valid):
        recon = cam.rig_point(c, pix, d)
        np.testing.assert_allclose(np.asarray(recon), target, atol=1e-8)
    # serialization roundtrip
    back = cam.camera_to_json(c, cam_id)
    c2, _, _ = cam.camera_from_json(back)
    np.testing.assert_allclose(np.asarray(c2.rotation), np.asarray(c.rotation), atol=1e-12)
    np.testing.assert_allclose(np.asarray(c2.focal), np.asarray(c.focal))


def test_rig_load_save_filter(tmp_path):
    cams = []
    for i, t in enumerate(ALL_TYPES):
        obj = dict(FTHETA_JSON, type=t, id=f"cam{i}")
        cams.append(obj)
    rig_path = tmp_path / "rig.json"
    rig_path.write_text(json.dumps({"cameras": cams}))
    rig = cam.load_rig(rig_path)
    assert len(rig.ids) == 4
    assert rig.ids == ("cam0", "cam1", "cam2", "cam3")

    sub = cam.filter_destinations(rig, "cam2,cam0")
    assert sub.ids == ("cam2", "cam0")
    idxs = cam.map_src_to_dst_indexes(rig, sub)
    np.testing.assert_array_equal(idxs, [2, 0])

    out = tmp_path / "rig_out.json"
    cam.save_rig(out, rig)
    rig2 = cam.load_rig(out)
    np.testing.assert_allclose(
        np.asarray(rig2.cameras.rotation), np.asarray(rig.cameras.rotation), atol=1e-12
    )


def test_perturb_cameras():
    objs = [dict(FTHETA_JSON, id=f"cam{i}") for i in range(3)]
    rig = cam.load_rig_from_json_str(json.dumps({"cameras": objs}))
    p = cam.perturb_cameras(rig, pos_amount=0.1, rot_amount=0.01, seed=1)
    # first camera pose is never perturbed (util/Camera.cpp:266-272)
    np.testing.assert_allclose(
        np.asarray(p.cameras.position[0]), np.asarray(rig.cameras.position[0])
    )
    assert not np.allclose(np.asarray(p.cameras.position[1]), np.asarray(rig.cameras.position[1]))


def test_vmap_over_rig():
    import jax

    objs = [dict(FTHETA_JSON, id=f"cam{i}") for i in range(4)]
    rig = cam.load_rig_from_json_str(json.dumps({"cameras": objs}))
    pts = np.asarray([[0.0, 0.0, 0.0], [1.0, 2.0, 3.0]])
    pix = jax.vmap(lambda c: cam.pixel(c, pts))(rig.cameras)
    assert pix.shape == (4, 2, 2)
