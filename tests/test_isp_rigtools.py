"""ISP pipeline and rig tool tests."""

import numpy as np
import pytest

from facebook360_dep_tpu.calib import rig_tools
from facebook360_dep_tpu.core import camera as cam
from facebook360_dep_tpu.isp import pipeline as isp
from facebook360_dep_tpu.render import synthetic


@pytest.mark.parametrize("pattern", ["RGGB", "GRBG", "GBRG", "BGGR"])
def test_demosaic_recovers_flat_color(pattern):
    rgb = np.zeros((16, 16, 3), np.float32)
    rgb[...] = [0.7, 0.4, 0.2]
    raw = isp.mosaic(rgb, pattern)
    out = np.asarray(isp.demosaic_bilinear(raw, pattern))
    np.testing.assert_allclose(out, rgb, atol=1e-5)


def test_demosaic_gradient():
    h, w = 16, 16
    rgb = np.zeros((h, w, 3), np.float32)
    rgb[..., 0] = np.linspace(0, 1, w)[None, :]
    rgb[..., 1] = 0.5
    rgb[..., 2] = np.linspace(1, 0, h)[:, None]
    raw = isp.mosaic(rgb, "GBRG")
    out = np.asarray(isp.demosaic_bilinear(raw, "GBRG"))
    # interior pixels reconstruct the smooth gradient closely
    np.testing.assert_allclose(out[2:-2, 2:-2], rgb[2:-2, 2:-2], atol=0.05)


@pytest.mark.parametrize("pattern", ["RGGB", "GBRG"])
def test_demosaic_chroma_suppressed(pattern):
    """CHROMA_SUPPRESSED is a first-class selectable mode
    (CameraIsp.h:32-38 CHROMA_SUPRESSED_BILINEAR, dispatch :1161-1163):
    flat-field exactness, gradient fidelity, and agreement with the
    EDGE_AWARE path's shared chroma stage on smooth content."""
    rgb = np.zeros((16, 16, 3), np.float32)
    rgb[...] = [0.7, 0.4, 0.2]
    raw = isp.mosaic(rgb, pattern)
    out = np.asarray(isp.demosaic_chroma_suppressed(raw, pattern))
    np.testing.assert_allclose(out, rgb, atol=1e-5)

    h, w = 32, 32
    grad = np.zeros((h, w, 3), np.float32)
    grad[..., 0] = np.linspace(0, 1, w)[None, :]
    grad[..., 1] = 0.5
    grad[..., 2] = np.linspace(1, 0, h)[:, None]
    raw = isp.mosaic(grad, pattern)
    out = np.asarray(isp.demosaic_chroma_suppressed(raw, pattern))
    np.testing.assert_allclose(out[2:-2, 2:-2], grad[2:-2, 2:-2], atol=0.05)
    # on smooth content the mode agrees with EDGE_AWARE (same chroma stage,
    # near-identical green): golden cross-check of the shared helper
    ea = np.asarray(isp.demosaic_edge_aware(raw, pattern))
    np.testing.assert_allclose(out[2:-2, 2:-2], ea[2:-2, 2:-2], atol=0.02)


def test_demosaic_chroma_suppressed_dispatch():
    """IspConfig.demosaic_filter = CHROMA_SUPPRESSED routes through process()."""
    assert "CHROMA_SUPPRESSED" in isp.DEMOSAIC_FILTERS
    cfg = isp.IspConfig(bayer_pattern="RGGB", demosaic_filter="CHROMA_SUPPRESSED",
                        apply_tone_curve=False)
    rgb_in = np.full((8, 8, 3), 0.5, np.float32)
    raw = isp.mosaic(rgb_in, "RGGB")
    out = np.asarray(isp.process(raw, cfg))
    np.testing.assert_allclose(out, rgb_in, atol=1e-5)


def test_isp_process_stages():
    cfg = isp.IspConfig(
        bayer_pattern="RGGB",
        black_level=(0.1, 0.1, 0.1),
        white_balance_gain=(2.0, 1.0, 1.5),
        gamma=(0.5, 0.5, 0.5),
    )
    rgb_in = np.full((8, 8, 3), 0.0, np.float32)
    rgb_in[...] = [0.55, 0.55, 0.55]
    raw = isp.mosaic(rgb_in, "RGGB")
    out = np.asarray(isp.process(raw, cfg))
    # (0.55 - 0.1)/0.9 = 0.5; R: *2 -> 1.0 clamp; G: 0.5; B: 0.75; gamma 0.5 = sqrt
    np.testing.assert_allclose(out[4, 4], [1.0, np.sqrt(0.5), np.sqrt(0.75)], atol=0.02)


def test_isp_config_json(tmp_path):
    p = tmp_path / "isp.json"
    p.write_text(
        '{"CameraIsp": {"bayerPattern": "rggb", "blackLevel": [0.02, 0.02, 0.02],'
        ' "whiteBalanceGain": [1.5, 1.0, 1.2], "gamma": [0.4545, 0.4545, 0.4545],'
        ' "ccm": [[1,0,0],[0,1,0],[0,0,1]], "saturation": 1.1}}'
    )
    cfg = isp.IspConfig.from_json(p)
    assert cfg.bayer_pattern == "RGGB"
    assert cfg.white_balance_gain == (1.5, 1.0, 1.2)
    assert cfg.saturation == 1.1


def test_align_rig_recovers_similarity():
    rig = synthetic.make_test_rig(num_cameras=6, resolution=(64, 48), ring_radius=0.3)
    from facebook360_dep_tpu.calib import ba

    rot = np.asarray(ba.rodrigues(np.asarray([0.3, -0.2, 0.5])))
    transformed = rig_tools.transform_rig(rig, rot, [1.0, -2.0, 3.0], 1.7)
    aligned = rig_tools.align_rig(transformed, rig)
    avg = rig_tools.compare_rigs(aligned, rig)
    assert avg["position"] < 1e-9
    assert avg["forward"] < 1e-6


def test_rig_aligner_cli_randomize(tmp_path):
    from facebook360_dep_tpu.cli import rig_aligner

    rig = synthetic.make_test_rig(num_cameras=5, resolution=(64, 48), ring_radius=0.3)
    rig_path = tmp_path / "rig.json"
    cam.save_rig(rig_path, rig)
    out_path = tmp_path / "aligned.json"
    rig_aligner.main(
        [
            "--rig_in", str(rig_path),
            "--rig_reference", str(rig_path),
            "--rig_out", str(out_path),
            "--randomize_rig", "true",
        ]
    )
    aligned = cam.load_rig(out_path)
    avg = rig_tools.compare_rigs(aligned, rig)
    assert avg["position"] < 1e-6


def test_rig_simulator_cli(tmp_path):
    from facebook360_dep_tpu.cli import rig_simulator
    from facebook360_dep_tpu.core import imagetypes, io

    rig_simulator.main(
        ["--dest", str(tmp_path), "--num_cameras", "2", "--resolution", "32", "--levels", "2"]
    )
    assert (tmp_path / "rigs/rig_calibrated.json").exists()
    d = imagetypes.image_dir(tmp_path, "color_levels", 0, "cam0")
    assert io.first_image_in(d)
    truth = io.read_disparity(tmp_path / "truth" / "cam0" / "000000.pfm")
    assert np.isfinite(truth).all()
