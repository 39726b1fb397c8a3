"""RAW/DNG container IO + widened ISP stage tests."""

import numpy as np
import pytest

from facebook360_dep_tpu.core import rawio
from facebook360_dep_tpu.isp import pipeline as isp


def test_raw_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    mosaic = rng.rand(24, 32).astype(np.float32)
    for bpp in (8, 16):
        p = str(tmp_path / f"img{bpp}.raw")
        rawio.write_raw(p, mosaic, bpp)
        back = rawio.read_raw(p, 32, 24, bpp)
        tol = 1.0 / ((1 << bpp) - 1)
        assert np.abs(back - mosaic).max() <= tol


def test_raw_truncated_raises(tmp_path):
    p = str(tmp_path / "short.raw")
    np.zeros(10, np.uint8).tofile(p)
    with pytest.raises(IOError):
        rawio.read_raw(p, 32, 24, 8)


def test_dng_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    mosaic = rng.rand(20, 28).astype(np.float32)
    p = str(tmp_path / "img.dng")
    rawio.write_dng(p, mosaic, "GBRG", 16, black_level=0.1)
    back, tags = rawio.read_dng(p)
    assert back.shape == mosaic.shape
    assert np.abs(back - mosaic).max() <= 1.0 / 65535
    assert rawio.TAG_CFA_PATTERN in tags
    assert tags[rawio.TAG_CFA_PATTERN][2][:4] == rawio.CFA_PATTERN_BYTES["GBRG"]
    # ascending tag order (TIFF requirement)
    # (read_dng collects into a dict; verify by re-parsing order)
    import struct

    buf = open(p, "rb").read()
    (n,) = struct.unpack_from("<H", buf, 8)
    tag_ids = [struct.unpack_from("<H", buf, 10 + 12 * i)[0] for i in range(n)]
    assert tag_ids == sorted(tag_ids)


def test_edge_aware_demosaic_flat_field():
    rgb = np.tile(np.asarray([0.25, 0.5, 0.75], np.float32), (16, 16, 1))
    raw = isp.mosaic(rgb, "RGGB")
    out = np.asarray(isp.demosaic_edge_aware(raw, "RGGB"))
    inner = out[3:-3, 3:-3]
    assert np.abs(inner - rgb[3:-3, 3:-3]).max() < 1e-4


def test_edge_aware_beats_bilinear_on_edges():
    # vertical step edge: edge-aware green should show less zippering
    rgb = np.zeros((32, 32, 3), np.float32)
    rgb[:, 16:] = 0.9
    rgb[:, :16] = 0.1
    raw = isp.mosaic(rgb, "GBRG")
    ea = np.asarray(isp.demosaic_edge_aware(raw, "GBRG"))
    bl = np.asarray(isp.demosaic_bilinear(raw, "GBRG"))
    band = slice(4, -4)
    err_ea = np.abs(ea[band, band, 1] - rgb[band, band, 1]).mean()
    err_bl = np.abs(bl[band, band, 1] - rgb[band, band, 1]).mean()
    assert err_ea <= err_bl + 1e-5


def test_stuck_pixel_removal():
    rng = np.random.RandomState(2)
    raw = np.full((16, 16), 0.5, np.float32)
    raw[6, 7] = 1.0  # stuck bright sensel
    out = np.asarray(isp.remove_stuck_pixels(raw, "GBRG", radius=1, threshold=0.2))
    assert abs(out[6, 7] - 0.5) < 1e-5
    # healthy pixels untouched
    assert np.abs(out[np.abs(raw - 0.5) < 1e-9] - 0.5).max() < 1e-6


def test_tone_curve_monotone_and_contrast():
    cfg = isp.IspConfig(gamma=(0.5, 0.5, 0.5), contrast=1.2)
    x = np.linspace(0, 1, 64, dtype=np.float32)[:, None, None] * np.ones((1, 1, 3), np.float32)
    y = np.asarray(isp.tone_curve(x, cfg))
    assert np.all(np.diff(y[:, 0, 0]) >= -1e-6)  # monotone
    assert y.min() >= 0 and y.max() <= 1


def test_companding_identity_and_curve():
    x = np.linspace(0, 1, 11, dtype=np.float32)
    same = np.asarray(isp.companding(x, [(0, 0), (1, 1)]))
    assert np.allclose(same, x)
    curved = np.asarray(isp.companding(x, [(0, 0), (0.5, 0.8), (1, 1)]))
    assert curved[5] == pytest.approx(0.8, abs=1e-6)


def test_process_full_stage_order():
    rng = np.random.RandomState(3)
    rgb = rng.rand(24, 24, 3).astype(np.float32) * 0.5 + 0.25
    cfg = isp.IspConfig(
        bayer_pattern="RGGB",
        black_level=(0.02, 0.02, 0.02),
        white_balance_gain=(1.1, 1.0, 1.2),
        gamma=(0.9, 0.9, 0.9),
        saturation=1.1,
        contrast=1.05,
        sharpening=(0.2, 0.2, 0.2),
        stuck_pixel_radius=1,
        stuck_pixel_threshold=0.5,
        demosaic_filter="EDGE_AWARE",
    )
    out = np.asarray(isp.process(isp.mosaic(rgb, "RGGB"), cfg))
    assert out.shape == (24, 24, 3)
    assert np.isfinite(out).all() and out.min() >= 0 and out.max() <= 1


def test_correct_vignetting_cli(tmp_path):
    import jax.numpy as jnp

    from facebook360_dep_tpu.cli import correct_vignetting as cv
    from facebook360_dep_tpu.core import io

    h, w = 32, 48
    # rolloff < 1 at the edges models light falloff; correction divides it out
    vx, vy = [0.6, 1.0, 1.0, 0.6], [0.7, 1.0, 1.0, 0.7]
    rx = np.asarray(isp.bezier(jnp.asarray(np.asarray(vx, np.float32)[:, None]),
                               jnp.asarray(np.clip((np.arange(w) - w / 2) / w + 0.5, 0, 1), jnp.float32)))[:, 0]
    ry = np.asarray(isp.bezier(jnp.asarray(np.asarray(vy, np.float32)[:, None]),
                               jnp.asarray(np.clip((np.arange(h) - h / 2) / h + 0.5, 0, 1), jnp.float32)))[:, 0]
    gain = (ry[:, None] * rx[None, :])[..., None]
    flat = np.full((h, w, 3), 0.5, np.float32)
    vignetted = (flat * gain).astype(np.float32)

    corrected = cv.correct_vignetting(vignetted, vx, vy)
    assert np.abs(corrected - flat).max() < 1e-3

    p_in, p_out = str(tmp_path / "in.png"), str(tmp_path / "out.png")
    io.write_color(p_in, vignetted)
    cv.main([
        "--raw", p_in, "--out", p_out,
        "--vignetting_x", ",".join(map(str, vx)), "--vignetting_y", ",".join(map(str, vy)),
    ])
    out = io.read_color(p_out)
    assert np.abs(out - flat).max() < 0.01  # 8-bit quantization headroom


def test_raw_to_rgb_cli_raw_and_dng(tmp_path):
    import json

    from facebook360_dep_tpu.cli import raw_to_rgb
    from facebook360_dep_tpu.core import io

    rng = np.random.RandomState(4)
    rgb = rng.rand(16, 16, 3).astype(np.float32)
    raw = isp.mosaic(rgb, "GBRG")
    rawio.write_raw(str(tmp_path / "f.raw"), raw, 16)
    cfg = {"CameraIsp": {"bitsPerPixel": 16, "width": 16, "height": 16, "bayerPattern": "GBRG"}}
    (tmp_path / "isp.json").write_text(json.dumps(cfg))

    raw_to_rgb.main([
        "--input_image_path", str(tmp_path / "f.raw"),
        "--output_image_path", str(tmp_path / "f.png"),
        "--isp_config_path", str(tmp_path / "isp.json"),
    ])
    out = io.read_color(str(tmp_path / "f.png"))
    assert out.shape == (16, 16, 3)

    raw_to_rgb.main([
        "--input_image_path", str(tmp_path / "f.raw"),
        "--output_image_path", str(tmp_path / "f.dng"),
        "--isp_config_path", str(tmp_path / "isp.json"),
        "--dng",
    ])
    back, _ = rawio.read_dng(str(tmp_path / "f.dng"))
    assert np.abs(back - raw).max() <= 2.0 / 65535


def test_frequency_demosaic_flat_field():
    rgb = np.tile(np.asarray([0.3, 0.5, 0.7], np.float32), (32, 32, 1))
    raw = isp.mosaic(rgb, "RGGB")
    out = np.asarray(isp.demosaic_frequency(raw, "RGGB"))
    inner = out[8:-8, 8:-8]
    # frequency-domain filtering is not exact on flat fields (Butterworth
    # rolloff at DC ~1), but must stay close and channel-ordered
    assert np.abs(inner.mean(axis=(0, 1)) - [0.3, 0.5, 0.7]).max() < 0.08
    assert np.isfinite(out).all()


def test_edge_aware_full_algorithm_flat_and_edge():
    rgb = np.tile(np.asarray([0.25, 0.5, 0.75], np.float32), (24, 24, 1))
    raw = isp.mosaic(rgb, "GBRG")
    out = np.asarray(isp.demosaic_edge_aware(raw, "GBRG"))
    inner = out[5:-5, 5:-5]
    assert np.abs(inner - rgb[5:-5, 5:-5]).max() < 1e-3

    # vertical edge: green reconstruction should stay monotone across it
    rgb2 = np.zeros((32, 32, 3), np.float32)
    rgb2[:, :16] = 0.2
    rgb2[:, 16:] = 0.8
    out2 = np.asarray(isp.demosaic_edge_aware(isp.mosaic(rgb2, "RGGB"), "RGGB"))
    band = out2[10:-10, 10:-10, 1]
    assert band.min() > 0.1 and band.max() < 0.9
