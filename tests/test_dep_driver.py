"""Project-driver (UI tab workflow) tests."""

import json
import os

import numpy as np
import pytest

from facebook360_dep_tpu.cli import dep, rig_simulator
from facebook360_dep_tpu.core import io


def test_init_and_status(tmp_path):
    root = str(tmp_path)
    assert dep.main(["init", "--project_root", root]) == 0
    assert os.path.isdir(os.path.join(root, "video/color"))
    assert os.path.isdir(os.path.join(root, "rigs"))
    state = json.load(open(os.path.join(root, "project.json")))
    assert state["version"] == 1
    # status flags the missing rig
    assert dep.main(["status", "--project_root", root]) == 1


@pytest.mark.slow
def test_depth_workflow_and_state(tmp_path):
    root = str(tmp_path / "proj")
    rig_simulator.main([
        "--dest", root, "--num_cameras", "3", "--resolution", "64", "--levels", "2",
    ])
    rc = dep.main([
        "depth", "--project_root", root,
        "--first", "000000", "--last", "000000",
        "--resolution", "64", "--min_depth_m", "1.0", "--max_depth_m", "100.0",
    ])
    assert rc in (0, None)
    d = io.read_disparity(
        os.path.join(root, "disparity_levels/level_0/cam0/000000.pfm")
    )
    assert np.isfinite(d).any()
    state = dep.load_state(root)
    assert state["depth"]["last"] == "000000"


@pytest.mark.slow
def test_export_workflow(tmp_path):
    root = str(tmp_path / "proj")
    rig_simulator.main([
        "--dest", root, "--num_cameras", "3", "--resolution", "64", "--levels", "2",
    ])
    dep.main([
        "depth", "--project_root", root, "--first", "000000", "--last", "000000",
        "--resolution", "64", "--min_depth_m", "1.0", "--max_depth_m", "100.0",
    ])
    rc = dep.main([
        "export", "--project_root", root, "--format", "eqrcolor",
        "--first", "000000", "--last", "000000", "--resolution", "64",
        "--min_depth_m", "1.0", "--max_depth_m", "100.0",
    ])
    assert rc in (0, None)
    exports = os.path.join(root, "exports")
    assert os.path.isdir(exports)
    found = []
    for base, _, files in os.walk(exports):
        found += [os.path.join(base, f) for f in files]
    assert found, "no export outputs written"
