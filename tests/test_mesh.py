"""Mesh generation / .vtx/.idx contract tests (render/MeshUtil.h parity)."""

import numpy as np

from facebook360_dep_tpu.render import synthetic
from facebook360_dep_tpu.stream import mesh


def test_vertexes_equi_error():
    rig = synthetic.make_test_rig(num_cameras=1, resolution=(8, 6))
    c = rig.camera(0)
    depth = np.full((6, 8), 2.0, np.float32)
    v = mesh.get_vertexes_equi_error(depth, c)
    assert v.shape == (48, 3)
    focal = float(np.asarray(c.focal)[0])
    np.testing.assert_allclose(v[:, 2], focal / 2.0)
    np.testing.assert_allclose(v[0, :2], [0.5, 0.5])  # res == grid size here


def test_faces_flat_surface_no_tears():
    h, w = 4, 5
    v = np.zeros((h * w, 3))
    v[:, 2] = 1.0  # constant depth proxy
    faces = mesh.get_faces(v, w, h, tear_ratio=0.95)
    # every quad emits exactly 2 triangles
    assert len(faces) == (h - 1) * (w - 1) * 2
    assert faces.dtype == np.uint32
    assert faces.max() < h * w


def test_faces_tear_on_discontinuity():
    h, w = 2, 2
    v = np.zeros((4, 3))
    v[:, 2] = [1.0, 1.0, 1.0, 100.0]  # br far away
    faces = mesh.get_faces(v, 2, 2, tear_ratio=0.95)
    # only the triangle avoiding the far corner survives (mask = idx of max ^ 3)
    assert len(faces) == 1
    assert 3 not in faces  # br vertex not referenced


def test_apply_mask():
    h, w = 3, 3
    v = np.random.RandomState(0).rand(9, 3) + 1.0
    v[:, 2] = 1.0
    faces = mesh.get_faces(v, w, h, tear_ratio=0.0)
    mask = np.ones((h, w), bool)
    mask[0, 0] = False
    v2, f2 = mesh.apply_mask(v, faces, mask)
    assert len(v2) < 9
    assert f2.max() < len(v2)


def test_vtx_idx_roundtrip(tmp_path):
    v = np.random.RandomState(1).rand(10, 3).astype(np.float32)
    f = np.random.RandomState(2).randint(0, 10, (6, 3)).astype(np.uint32)
    mesh.write_vtx_idx(tmp_path / "a.vtx", tmp_path / "a.idx", v, f)
    np.testing.assert_array_equal(mesh.read_vtx(tmp_path / "a.vtx"), v)
    np.testing.assert_array_equal(mesh.read_idx(tmp_path / "a.idx"), f)
    # byte layout: row-major float32
    raw = (tmp_path / "a.vtx").read_bytes()
    assert raw == v.tobytes()


def test_equirect_vertexes():
    disp = np.full((4, 8), 0.5, np.float32)
    v = mesh.get_vertexes_equirect(disp, max_depth=100.0)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 2.0, atol=1e-6)
