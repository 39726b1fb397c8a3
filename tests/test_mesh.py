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


def test_native_build_faces_matches_numpy_oracle():
    """The single-pass native emitter (_native/mesh_faces.cpp) must produce
    byte-identical faces to the vectorized get_triangle_masks path over
    random depths, ties, NaNs, zeros, and negatives."""
    from facebook360_dep_tpu.stream import native

    rng = np.random.default_rng(11)
    h, w = 23, 37
    for trial in range(6):
        proxy = rng.uniform(0.5, 3.0, (h, w)).astype(np.float32)
        if trial >= 1:  # quantize hard to force ties
            proxy = np.round(proxy * 4) / 4
        if trial >= 2:
            proxy[rng.uniform(size=(h, w)) < 0.05] = np.nan
        if trial >= 3:
            proxy[rng.uniform(size=(h, w)) < 0.05] = 0.0
        if trial >= 4:
            proxy[rng.uniform(size=(h, w)) < 0.05] *= -1
        tear = [0.95, 0.5, 0.0][trial % 3]

        got = native.build_faces(proxy, tear)

        tl, tr = proxy[:-1, :-1], proxy[:-1, 1:]
        bl, br = proxy[1:, :-1], proxy[1:, 1:]
        corners = np.stack([tl, tr, bl, br], axis=-1).reshape(-1, 4)
        masks = mesh.get_triangle_masks(corners, tear)
        base = (
            np.arange(h - 1, dtype=np.uint32)[:, None] * np.uint32(w)
            + np.arange(w - 1, dtype=np.uint32)
        ).reshape(-1)
        offsets = {"tl": 0, "tr": 1, "bl": w, "br": w + 1}
        pat = np.asarray(
            [[offsets[p] for p in mesh._TRIANGLES[t]] for t in range(4)], np.uint32
        )
        emit = np.flatnonzero(masks.reshape(-1))
        expect = base[emit >> 2][:, None] + pat[emit & 3]
        np.testing.assert_array_equal(got, expect, err_msg=f"trial {trial}")


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
