"""End-to-end publish path: depth -> ConvertToBinary -> fusion -> viewer.

The reference's compatibility surface is the fused stream format: GlViewer
plays back what ConvertToBinary+fusion publish (SURVEY §3.4-3.5). This test
walks the whole chain on synthetic data and checks the novel-view render.
"""

import os

import numpy as np
import pytest

from facebook360_dep_tpu.cli import convert_to_binary, derp_cli, rig_simulator, view_fused
from facebook360_dep_tpu.core import io


@pytest.mark.slow
def test_depth_to_viewer_roundtrip(tmp_path):
    root = str(tmp_path)
    rig_simulator.main([
        "--dest", root, "--num_cameras", "4", "--resolution", "64", "--levels", "2",
    ])
    rig = os.path.join(root, "rigs/rig_calibrated.json")
    derp_cli.main([
        "--input_root", root, "--output_root", root,
        "--min_depth_m", "1.0", "--max_depth_m", "100.0", "--resolution", "64",
    ])
    convert_to_binary.main([
        "--rig", rig,
        "--bin", os.path.join(root, "bin"),
        "--color", os.path.join(root, "video/color_levels/level_0"),
        "--disparity", os.path.join(root, "disparity_levels/level_0"),
        "--fused", os.path.join(root, "fused"),
        "--output_formats", "vtx,idx,rgba",
        "--triangles", "2000",
    ])
    catalog = os.path.join(root, "fused", "fused.json")
    assert os.path.exists(catalog)

    out_dir = os.path.join(root, "views")
    view_fused.main([
        "--rig", rig,
        "--catalog", catalog,
        "--output", out_dir,
        "--width", "128", "--height", "64",
        "--position", "0.02,0,0",
    ])
    rendered = [f for f in os.listdir(out_dir) if f.endswith(".png")]
    assert rendered, os.listdir(out_dir)
    img = io.read_color(os.path.join(out_dir, rendered[0]))
    assert img.shape == (64, 128, 3)
    # the novel view must contain actual scene content
    assert img.std() > 0.02, img.std()
