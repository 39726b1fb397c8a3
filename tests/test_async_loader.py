"""Async striped reads + readahead frame loader + log reader tests."""

import json
import os

import numpy as np

from facebook360_dep_tpu.stream import async_loader, fusion


def test_async_striped_file_matches_sync(tmp_path):
    rng = np.random.RandomState(0)
    data = rng.bytes(3 * async_loader.STRIPE_SIZE + 12345)
    paths = [str(tmp_path / f"stripe_{i}.bin") for i in range(2)]
    w = fusion.StripedWriter(paths)
    w.write(data)
    w.close()

    f = async_loader.AsyncStripedFile(paths)
    try:
        # spans crossing stripe boundaries
        for off, size in [(0, 100), (async_loader.STRIPE_SIZE - 50, 200),
                          (async_loader.STRIPE_SIZE * 2 - 1, async_loader.STRIPE_SIZE + 2),
                          (17, len(data) - 17)]:
            assert f.read(off, size) == data[off : off + size], (off, size)
        # async begin/end API
        futs = f.read_begin(0, len(data))
        assert async_loader.AsyncStripedFile.read_end(futs) == data
    finally:
        f.close()


def test_frame_loader_readahead(tmp_path):
    # build a small fused stream: 4 frames x 2 cams with .vtx payloads
    rng = np.random.RandomState(1)
    frames = [f"{i:06d}" for i in range(4)]
    cams = ["cam0", "cam1"]
    payloads = {}
    bin_dir = tmp_path / "bin"
    for fr in frames:
        for cam_id in cams:
            blob = rng.bytes(1000 + 64 * int(fr))
            payloads[(fr, cam_id)] = blob
            os.makedirs(bin_dir / cam_id, exist_ok=True)
            (bin_dir / cam_id / f"{fr}.vtx").write_bytes(blob)
    fused_dir = tmp_path / "fused"
    catalog = fusion.fuse_frames(str(bin_dir), str(fused_dir), cams, frames,
                                 extensions=(".vtx",), num_disks=2)

    loader = async_loader.AsyncFrameLoader(str(fused_dir), catalog, num_disks=2, readahead=2)
    try:
        for fr in frames:
            out = loader.get(fr)
            for cam_id in cams:
                assert out[(cam_id, ".vtx")] == payloads[(fr, cam_id)]
    finally:
        loader.close()


def test_log_reader_metrics(tmp_path):
    from facebook360_dep_tpu.cli import log_reader

    logf = tmp_path / "derp.INFO"
    logf.write_text(
        "I0101 frame 000003 level 2 (512x384): 12.3s\n"
        "-- Elapsed time: 12.30s\n"
        "-- TOTAL: 99.50s\n"
        "TOTAL average MSSIM: R 90.1%, G 90.0%, B 89.9%\n"
        "pass 3: median reprojection error: 0.4012 px\n"
    )
    out = tmp_path / "summary.json"
    summary = log_reader.main(["--logs", str(logf), "--json_out", str(out)])
    m = summary["metrics"]
    assert m["total_s"]["last"] == 99.5
    assert m["rephoto_mssim_r"]["last"] == 90.1
    assert m["median_reprojection_error_px"]["last"] == 0.4012
    assert summary["progress"] == {"frame": "000003", "level": 2}
    assert json.load(open(out))["metrics"]["total_s"]["last"] == 99.5
