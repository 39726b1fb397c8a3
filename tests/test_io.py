"""IO tests: PFM byte-compat with the reference writer, PNG16 disparity
clamping (PyramidLevel.h:442-451), color/mask round trips."""

import numpy as np

from facebook360_dep_tpu.core import io


def test_pfm_roundtrip(tmp_path):
    m = np.random.RandomState(0).rand(7, 5).astype(np.float32)
    p = tmp_path / "d.pfm"
    io.write_pfm(p, m)
    back = io.read_pfm(p)
    np.testing.assert_array_equal(back, m)


def test_pfm_byte_layout(tmp_path):
    """Match util/CvUtil.cpp:39-49 exactly: Pf, w h, -1.0, raw top-down rows."""
    m = np.arange(6, dtype=np.float32).reshape(2, 3)
    p = tmp_path / "d.pfm"
    io.write_pfm(p, m)
    raw = p.read_bytes()
    header = b"Pf\n3 2\n-1.0\n"
    assert raw[: len(header)] == header
    assert raw[len(header) :] == m.tobytes()  # row 0 first (cv::Mat order)


def test_png16_disparity_clamp(tmp_path):
    d = np.asarray([[0.5, 2.0], [-1.0, np.nan]], np.float32)
    p = tmp_path / "d.png"
    io.write_disparity(p, d)
    back = io.read_disparity(p)
    np.testing.assert_allclose(back, [[0.5, 1.0], [0.0, 0.0]], atol=1 / 65535)


def test_color_roundtrip(tmp_path):
    img = np.random.RandomState(1).rand(4, 6, 3).astype(np.float32)
    p = tmp_path / "c.png"
    io.write_color(p, img, bit_depth=16)
    back = io.read_color(p)
    assert back.shape == (4, 6, 3)
    np.testing.assert_allclose(back, img, atol=1 / 65535)


def test_mask_roundtrip(tmp_path):
    m = np.random.RandomState(2).rand(5, 5) > 0.5
    p = tmp_path / "m.png"
    io.write_mask(p, m)
    np.testing.assert_array_equal(io.read_mask(p), m)


def test_pyramid_level_sizes(tmp_path):
    from facebook360_dep_tpu.core import imagetypes

    root = tmp_path
    for level, w in [(0, 16), (1, 8)]:
        d = root / f"level_{level}" / "cam0"
        d.mkdir(parents=True)
        io.write_color(d / "000000.png", np.zeros((w // 2, w, 3), np.float32))
    sizes = io.get_pyramid_level_sizes(root)
    assert sizes == {0: (16, 8), 1: (8, 4)}
    assert imagetypes.image_dir("/r", "color_levels", 2, "cam1") == "/r/video/color_levels/level_2/cam1"


def test_frame_name():
    assert io.frame_name(7) == "000007"


def test_exr_roundtrip(tmp_path):
    import numpy as np

    from facebook360_dep_tpu.core import exr, io

    rng = np.random.RandomState(0)
    d = rng.rand(17, 23).astype(np.float32)
    p = str(tmp_path / "d.exr")
    io.write_disparity(p, d)
    back = io.read_disparity(p)
    assert np.array_equal(back, d)

    rgb = rng.rand(9, 13, 3).astype(np.float32)
    p3 = str(tmp_path / "c.exr")
    exr.write_exr(p3, rgb)
    assert np.array_equal(exr.read_exr(p3), rgb)
