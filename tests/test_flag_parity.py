"""Flag-surface parity vs the reference's canonical .flags files.

The reference ships 40 flag files in ``res/flags/*.flags`` plus 20 test
overrides in ``res/test/*.flags``; its farm and integration harness build
command lines straight from them (``scripts/test/test_master_class.py:161``,
``scripts/render/run.py --flagfile``). This test parses every one of those
files, maps each to the repo CLI that replaces the corresponding binary, and
asserts the CLI's argparse surface accepts every flag — the mechanical
contract that job specs and flag files carry over unchanged.

Exceptions are explicit and documented per flag below: either the feature is
a documented cut (Rift HMD, AWS-credential plumbing replaced by the TPU
fleet) or the flag is stale in the UPSTREAM file itself (the reference
binary never defined it; verified against the DEFINE_* blocks cited).
"""

from __future__ import annotations

import argparse
import glob
import importlib
import os

import pytest

REF = "/root/reference/res"

# Universal gflags/glog flags every reference binary accepts via initDep;
# the repo handles logging through `logging` + the shared CLI bootstrap.
GFLAGS_UNIVERSAL = {
    "alsologtostderr", "stderrthreshold", "log_dir", "logtostderr",
    "colorlogtostderr", "minloglevel", "logbuflevel", "v", "vmodule",
    "flagfile", "helpshort",
}

# flag-file stem -> (repo module, entry callable, argv prefix for subcommand
# dispatch). None = documented whole-file exception (reason in EXCEPTIONS).
SPECS = {
    "align_colors": ("facebook360_dep_tpu.cli.align_colors", "main", []),
    "align_point_cloud": ("facebook360_dep_tpu.cli.align_point_cloud", "main", []),
    "calibration": ("facebook360_dep_tpu.cli.calibration", "main", []),
    "match_corners": ("facebook360_dep_tpu.cli.calibration", "main_match_corners", []),
    "geometric_calibration": ("facebook360_dep_tpu.cli.calibration", "main_geometric", []),
    "geometric_calibration_main": ("facebook360_dep_tpu.cli.calibration", "main_geometric", []),
    "compute_rephotography_errors": (
        "facebook360_dep_tpu.cli.compute_rephotography_errors", "main", []),
    "convert_to_binary": ("facebook360_dep_tpu.cli.convert_to_binary", "main", []),
    "correct_vignetting": ("facebook360_dep_tpu.cli.correct_vignetting", "main", []),
    "create_obj_from_disparity_equirect": (
        "facebook360_dep_tpu.cli.conversions", "main", ["create_obj_from_disparity_equirect"]),
    "derp_cli": ("facebook360_dep_tpu.cli.derp_cli", "main", []),
    "export_point_cloud": ("facebook360_dep_tpu.cli.conversions", "main", ["export_point_cloud"]),
    "import_point_cloud": ("facebook360_dep_tpu.cli.conversions", "main", ["import_point_cloud"]),
    "project_cameras_to_equirects": (
        "facebook360_dep_tpu.cli.conversions", "main", ["project_cameras_to_equirects"]),
    "project_equirects_to_cameras": (
        "facebook360_dep_tpu.cli.conversions", "main", ["project_equirects_to_cameras"]),
    "generate_camera_overlaps": (
        "facebook360_dep_tpu.cli.render_tools", "main", ["generate_camera_overlaps"]),
    "generate_equirect": ("facebook360_dep_tpu.cli.render_tools", "main", ["generate_equirect"]),
    "generate_keypoint_projections": (
        "facebook360_dep_tpu.cli.render_tools", "main", ["generate_keypoint_projections"]),
    "geometric_consistency": (
        "facebook360_dep_tpu.cli.render_tools", "main", ["geometric_consistency"]),
    "generate_foreground_masks": (
        "facebook360_dep_tpu.cli.generate_foreground_masks", "main", []),
    "gl_viewer": ("facebook360_dep_tpu.cli.gl_viewer", "main", []),
    "layer_disparities": ("facebook360_dep_tpu.cli.layer_disparities", "main", []),
    "raw_to_rgb": ("facebook360_dep_tpu.cli.raw_to_rgb", "main", []),
    "render": ("facebook360_dep_tpu.cli.render_pipeline", "main", []),
    "rig_aligner": ("facebook360_dep_tpu.cli.rig_aligner", "main", []),
    "rig_analyzer": ("facebook360_dep_tpu.cli.rig_analyzer", "main", []),
    "rig_compare": ("facebook360_dep_tpu.cli.rig_compare", "main", []),
    "rig_simulator": ("facebook360_dep_tpu.cli.rig_simulator", "main", []),
    "run": ("facebook360_dep_tpu.cli.dep", "main", ["depth"]),
    "simple_mesh_renderer": ("facebook360_dep_tpu.cli.simple_mesh_renderer", "main", []),
    "temporal_bilateral_filter": (
        "facebook360_dep_tpu.cli.temporal_bilateral_filter", "main", []),
    "bilateral_filter": ("facebook360_dep_tpu.cli.temporal_bilateral_filter", "main", []),
    "upsample_disparity": ("facebook360_dep_tpu.cli.upsample_disparity", "main", []),
    "upscale_disparity": ("facebook360_dep_tpu.cli.upsample_disparity", "main", []),
    "view_color_variance_thresholds": (
        "facebook360_dep_tpu.cli.view_thresholds", "main", ["color_variance"]),
    "view_foreground_mask_thresholds": (
        "facebook360_dep_tpu.cli.view_thresholds", "main", ["foreground_masks"]),
    # documented whole-file cuts:
    "rift_viewer": None,   # Oculus HMD viewer — no HMD path on TPU hosts
    "aws_create": None,    # AWS EC2/kops credential plumbing — replaced by
    "clean": None,         # the GCP TPU fleet (farm/cluster.py); csv_path/
                           # ec2_file/key_dir/key_name have no equivalent
}

# Per-file flags that are STALE IN THE UPSTREAM FILE (the reference binary
# never defines them — cite the DEFINE_* block) or cut with the feature.
EXCEPTIONS = {
    "bilateral_filter": {
        # No BilateralFilter binary exists in the reference tree; the file
        # predates TemporalBilateralFilter.cpp:40-59, which defines neither
        # --frame nor --radius.
        "frame", "radius",
    },
    "upsample_disparity": {
        # UpsampleDisparity.cpp:37-55 defines foreground_masks_in/_out and
        # first/last — the upstream file's --foreground_masks/--frame would
        # not parse against the reference binary either.
        "foreground_masks", "frame",
    },
    "upscale_disparity": {"foreground_masks", "frame"},
}


def _flags_in_file(path: str) -> list[str]:
    names = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("--"):
                continue
            name = line[2:].split("=", 1)[0].strip()
            if name and name not in GFLAGS_UNIVERSAL:
                names.append(name)
    return names


class _Captured(Exception):
    def __init__(self, parser):
        self.parser = parser


def _capture_parser(module_name: str, entry: str) -> argparse.ArgumentParser:
    """Build the CLI's parser by running main() up to parse_args."""
    mod = importlib.import_module(module_name)
    orig = argparse.ArgumentParser.parse_args

    def trap(self, *a, **k):
        raise _Captured(self)

    argparse.ArgumentParser.parse_args = trap
    try:
        getattr(mod, entry)([])
    except _Captured as c:
        return c.parser
    finally:
        argparse.ArgumentParser.parse_args = orig
    raise AssertionError(f"{module_name}.{entry} never called parse_args")


def _known_options(parser: argparse.ArgumentParser, prefix: list[str]) -> set[str]:
    """Option strings of the parser, descending into the prefix subcommand."""
    opts = set()
    for a in parser._actions:
        for s in a.option_strings:
            if s.startswith("--"):
                opts.add(s[2:])
        if isinstance(a, argparse._SubParsersAction) and prefix:
            sub = a.choices.get(prefix[0])
            assert sub is not None, f"no subcommand {prefix[0]}"
            opts |= _known_options(sub, prefix[1:])
    return opts


def _all_flag_files() -> list[str]:
    files = sorted(glob.glob(os.path.join(REF, "flags", "*.flags")))
    files += sorted(glob.glob(os.path.join(REF, "test", "*.flags")))
    return files


@pytest.mark.parametrize(
    "path", _all_flag_files(), ids=lambda p: os.path.relpath(p, REF).replace("/", ":"))
def test_flag_file_parses(path):
    stem = os.path.splitext(os.path.basename(path))[0]
    assert stem in SPECS, f"no CLI mapping for {stem}"
    spec = SPECS[stem]
    if spec is None:
        pytest.skip("documented cut (Rift HMD / AWS credential plumbing)")
    module, entry, prefix = spec
    wanted = set(_flags_in_file(path)) - EXCEPTIONS.get(stem, set())
    parser = _capture_parser(module, entry)
    known = _known_options(parser, prefix)
    missing = sorted(wanted - known)
    assert not missing, f"{stem}: CLI {module} missing flags {missing}"


def test_every_mapped_cli_importable():
    for stem, spec in SPECS.items():
        if spec is None:
            continue
        mod = importlib.import_module(spec[0])
        assert hasattr(mod, spec[1]), f"{spec[0]} lacks {spec[1]}"
