"""Project driver: the UI's tab workflows as subcommands.

Reference: ``scripts/ui/dep.py:95-278`` — a PyQt app with Background /
Calibration / DepthEstimation / Export tabs wrapping the farm, input
validation (verify_data), progress from logs, and pickled project state.
Headless equivalent: one ``dep`` command per tab over the same project
tree, with state in ``<root>/project.json`` instead of a pickle and
progress via ``log_reader``.

    dep init        --project_root R            create the skeleton + verify
    dep background  --project_root R [--frame F] depth on the background frame
    dep calibration --project_root R [--frame F] match corners + calibrate
    dep depth       --project_root R --first A --last B   video depth (+ masks)
    dep export      --project_root R --format eqrcolor ... offline exports
    dep status      --project_root R            tree check + metric summary
"""

from __future__ import annotations

import argparse
import json
import logging
import os

from ..core import camera as cam, imagetypes
from . import render_pipeline, verify_data

log = logging.getLogger("dep")

STATE_FILE = "project.json"


def load_state(root: str) -> dict:
    path = os.path.join(root, STATE_FILE)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def save_state(root: str, state: dict) -> None:
    with open(os.path.join(root, STATE_FILE), "w") as f:
        json.dump(state, f, indent=2, sort_keys=True)


def _remember(root: str, section: str, values: dict) -> None:
    state = load_state(root)
    state.setdefault(section, {}).update(values)
    save_state(root, state)


def cmd_init(args):
    root = args.project_root
    for t in ("color", "background_color"):
        os.makedirs(imagetypes.image_dir(root, t), exist_ok=True)
    os.makedirs(os.path.join(root, "rigs"), exist_ok=True)
    os.makedirs(os.path.join(root, "logs"), exist_ok=True)
    save_state(root, load_state(root) or {"version": 1})
    problems, info = verify_data.verify_project(root, check_sizes=False)
    for prob in problems:
        log.warning("PROBLEM: %s", prob)
    log.info("project initialized at %s (%d problems)", root, len(problems))
    return 0


def cmd_background(args):
    """Full-quality depth on the background frame (UI Background tab)."""
    root = args.project_root
    rig = args.rig or os.path.join(root, "rigs/rig_calibrated.json")
    _remember(root, "background", {"frame": args.frame})
    # the background tree is its own tiny project: color lives under
    # background/color; results land under background/disparity
    return render_pipeline.main([
        "--input_root", os.path.join(root, "background"),
        "--output_root", os.path.join(root, "background"),
        "--rig", rig,
        "--first", args.frame, "--last", args.frame,
        "--resolution", str(args.resolution),
        "--min_depth_m", str(args.min_depth_m),
        "--max_depth_m", str(args.max_depth_m),
        "--run_convert_to_binary", "false",
    ])


def cmd_calibration(args):
    from . import calibration as calib_cli

    root = args.project_root
    rig_in = args.rig or os.path.join(root, "rigs/rig.json")
    rig_out = os.path.join(root, "rigs/rig_calibrated.json")
    matches = os.path.join(root, "matches.json")
    _remember(root, "calibration", {"frame": args.frame, "rig_in": rig_in})
    calib_cli.main([
        "--color", imagetypes.image_dir(root, "color"),
        "--rig_in", rig_in,
        "--rig_out", rig_out,
        "--matches", matches,
        "--frame", args.frame,
        "--min_depth_m", str(args.min_depth_m),
        "--max_depth_m", str(args.max_depth_m),
    ])
    log.info("wrote %s", rig_out)
    return 0


def cmd_depth(args):
    root = args.project_root
    rig = args.rig or os.path.join(root, "rigs/rig_calibrated.json")
    _remember(root, "depth", {"first": args.first, "last": args.last})
    flags = [
        "--input_root", root,
        "--output_root", args.output_root or root,
        "--rig", rig,
        "--first", args.first, "--last", args.last,
        "--resolution", str(args.resolution),
        "--min_depth_m", str(args.min_depth_m),
        "--max_depth_m", str(args.max_depth_m),
        "--use_foreground_masks", str(args.use_foreground_masks).lower(),
        "--do_temporal_filter", str(args.do_temporal_filter).lower(),
        "--workers", str(args.workers),
        "--run_convert_to_binary", "false",
    ]
    return render_pipeline.main(flags)


def cmd_export(args):
    root = args.project_root
    rig = args.rig or os.path.join(root, "rigs/rig_calibrated.json")
    _remember(root, "export", {"format": args.format})
    return render_pipeline.main([
        "--input_root", root,
        "--output_root", args.output_root or root,
        "--rig", rig,
        "--first", args.first, "--last", args.last,
        "--format", args.format,
        "--resolution", str(args.resolution),
        "--run_depth_estimation", "false",
    ])


def cmd_status(args):
    from . import log_reader

    root = args.project_root
    problems, info = verify_data.verify_project(root, check_sizes=False)
    state = load_state(root)
    log.info("state: %s", json.dumps(state, sort_keys=True))
    for prob in problems:
        log.warning("PROBLEM: %s", prob)
    logs_dir = os.path.join(root, "logs")
    if os.path.isdir(logs_dir) and os.listdir(logs_dir):
        log_reader.main(["--logs", logs_dir])
    log.info("status: %d problems, %d color frames",
             len(problems), len(info.get("color_frames", [])))
    return 1 if problems else 0


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(required=True)

    def common(sp, frames=False):
        sp.add_argument("--project_root", required=True)
        sp.add_argument("--rig", default="")
        sp.add_argument("--resolution", type=int, default=2048)
        sp.add_argument("--min_depth_m", type=float, default=0.5)
        sp.add_argument("--max_depth_m", type=float, default=1e4)
        if frames:
            sp.add_argument("--first", default="000000")
            sp.add_argument("--last", default="000000")

    s = sub.add_parser("init"); s.add_argument("--project_root", required=True)
    s.set_defaults(fn=cmd_init)

    s = sub.add_parser("background"); common(s)
    s.add_argument("--frame", default="000000")
    s.set_defaults(fn=cmd_background)

    s = sub.add_parser("calibration"); common(s)
    s.add_argument("--frame", default="000000")
    s.set_defaults(fn=cmd_calibration)

    s = sub.add_parser("depth"); common(s, frames=True)
    s.add_argument("--output_root", default="")
    s.add_argument("--use_foreground_masks", action="store_true")
    s.add_argument("--do_temporal_filter", action="store_true")
    s.add_argument("--workers", type=int, default=1)
    s.set_defaults(fn=cmd_depth)

    s = sub.add_parser("export"); common(s, frames=True)
    s.add_argument("--output_root", default="")
    s.add_argument("--format", default="eqrcolor",
                   choices=["6dof", "eqrcolor", "eqrdisp", "cubecolor", "cubedisp", "lr180", "tb3dof", "tbstereo"])
    s.set_defaults(fn=cmd_export)

    s = sub.add_parser("status"); s.add_argument("--project_root", required=True)
    s.set_defaults(fn=cmd_status)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
