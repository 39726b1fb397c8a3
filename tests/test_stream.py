"""Streaming/publish-path tests: native QEM simplifier, BC7 codec, striped
fusion + catalog (mesh_stream parity)."""

import json
import os

import numpy as np
import pytest

from facebook360_dep_tpu.stream import fusion, mesh, native


def test_simplify_reduces_faces_preserves_shape():
    rng = np.random.RandomState(0)
    h, w = 30, 30
    v = np.zeros((h * w, 3))
    ys, xs = np.mgrid[0:h, 0:w]
    v[:, 0], v[:, 1] = xs.ravel(), ys.ravel()
    v[:, 2] = 10.0 + 0.05 * np.sin(xs.ravel() / 3.0)
    f = mesh.get_faces(v, w, h, tear_ratio=0.9)
    v2, f2 = native.simplify_mesh(v, f, target_faces=200)
    assert len(f2) <= 220
    assert len(f2) > 100
    # surface height must stay within the original band
    assert v2[:, 2].min() > 9.8 and v2[:, 2].max() < 10.2
    # indices valid
    assert f2.max() < len(v2)


def test_bc7_roundtrip_quality():
    rng = np.random.RandomState(1)
    img = np.zeros((16, 16, 4), np.uint8)
    img[..., :3] = rng.randint(0, 255, (16, 16, 3)).astype(np.uint8)
    img[..., 3] = 255
    blocks = native.compress_bc7(img)
    assert blocks.nbytes == 16 * 16  # 1 byte per texel
    back = native.decompress_bc7(blocks, 16, 16)
    err = np.abs(back[..., :3].astype(int) - img[..., :3].astype(int)).mean()
    # pure random noise is unrepresentable in any BC7 mode — loose sanity bound
    assert err < 60, f"BC7 mean error too high: {err}"
    # smooth gradient should compress nearly losslessly
    grad = np.zeros((8, 8, 4), np.uint8)
    grad[..., 0] = np.linspace(0, 255, 8)[None, :].astype(np.uint8)
    grad[..., 1] = 128
    grad[..., 3] = 255
    back2 = native.decompress_bc7(native.compress_bc7(grad), 8, 8)
    err2 = np.abs(back2[..., :3].astype(int) - grad[..., :3].astype(int)).max()
    assert err2 <= 8, f"gradient max err {err2}"


def test_stripe_math():
    # StripedFile.h:100-104 semantics
    local, disk = fusion.calc_stripe(0, 3)
    assert (local, disk) == (0, 0)
    local, disk = fusion.calc_stripe(fusion.STRIPE_SIZE, 3)
    assert (local, disk) == (0, 1)
    local, disk = fusion.calc_stripe(3 * fusion.STRIPE_SIZE + 100, 3)
    assert (local, disk) == (fusion.STRIPE_SIZE + 100, 0)


@pytest.mark.parametrize("num_disks", [1, 3])
def test_fusion_roundtrip(tmp_path, num_disks):
    rng = np.random.RandomState(2)
    bin_dir = tmp_path / "bin"
    payloads = {}
    frames = ["000000", "000001"]
    cams = ["cam0", "cam1"]
    for c in cams:
        os.makedirs(bin_dir / c)
        for fr in frames:
            for ext in (".vtx", ".idx"):
                data = rng.bytes(rng.randint(100, 2000))
                (bin_dir / c / (fr + ext)).write_bytes(data)
                payloads[(fr, c, ext)] = data
    fused_dir = tmp_path / "fused"
    catalog = fusion.fuse_frames(
        str(bin_dir), str(fused_dir), cams, frames, (".vtx", ".idx"), num_disks
    )
    # catalog file exists and parses
    on_disk = json.loads((fused_dir / "fused.json").read_text())
    assert on_disk["metadata"]["isLittleEndian"] is True
    # every payload reads back exactly
    for (fr, c, ext), data in payloads.items():
        got = fusion.read_fused_entry(str(fused_dir), catalog, fr, c, ext, num_disks)
        assert got == data, (fr, c, ext)
    # per-camera sections are stripe-aligned (pad() in BinaryFusionUtil.h)
    for fr in frames:
        for c in cams:
            assert catalog["frames"][fr][c]["offset"] % fusion.STRIPE_SIZE == 0


def test_convert_to_binary_cli(tmp_path):
    from facebook360_dep_tpu.cli import convert_to_binary
    from facebook360_dep_tpu.core import camera as cam, io
    from facebook360_dep_tpu.render import synthetic

    rig = synthetic.make_test_rig(num_cameras=2, resolution=(32, 24))
    colors, gt = synthetic.render_sphere_scene(rig, (32, 24), radius=5.0)
    rig_path = tmp_path / "rig.json"
    cam.save_rig(rig_path, rig)
    for i, cid in enumerate(rig.ids):
        os.makedirs(tmp_path / "disp" / cid)
        os.makedirs(tmp_path / "color" / cid)
        io.write_disparity(tmp_path / "disp" / cid / "000000.pfm", gt[i])
        io.write_color(tmp_path / "color" / cid / "000000.png", colors[i])
    convert_to_binary.main(
        [
            "--rig", str(rig_path),
            "--bin", str(tmp_path / "bin"),
            "--disparity", str(tmp_path / "disp"),
            "--color", str(tmp_path / "color"),
            "--fused", str(tmp_path / "fused"),
            "--triangles", "300",
        ]
    )
    for cid in rig.ids:
        v = mesh.read_vtx(tmp_path / "bin" / cid / "000000.vtx")
        f = mesh.read_idx(tmp_path / "bin" / cid / "000000.idx")
        assert len(f) <= 330 and len(f) > 50
        assert f.max() < len(v)
        assert (tmp_path / "bin" / cid / "000000.bc7").exists()
    assert (tmp_path / "fused" / "fused.json").exists()


def test_bc7_quality_harness():
    """VERDICT #9: mode-6 PSNR on a photo block set is high in absolute terms
    AND within ~1 dB of the mode-6 unquantized-endpoint upper bound (the
    ceiling any mode-6 encoder, incl. the reference's ispc_texcomp, sits
    under)."""
    import sys

    sys.path.insert(0, "tools")
    import bc7_quality

    result = bc7_quality.run(size=128)
    assert result["value"] > 38.0, result
    assert result["detail"]["gap_to_bound_db"] < 1.5, result
