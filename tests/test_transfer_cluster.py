"""Data-plane transfer + TPU fleet provisioning tests (all offline)."""

import os

import numpy as np

from facebook360_dep_tpu.farm import cluster, transfer


def test_address_parse():
    a = transfer.Address.parse("gs://bucket/path/x")
    assert a.protocol == "gs" and a.path == "bucket/path/x" and a.is_remote
    assert a.join("color", "cam0").uri() == "gs://bucket/path/x/color/cam0"
    b = transfer.Address.parse("/local/dir")
    assert not b.is_remote and b.uri() == "/local/dir"
    s = transfer.Address.parse("s3://b/k")
    assert s.protocol == "s3"


def test_local_transfer(tmp_path):
    src = tmp_path / "src" / "a.txt"
    os.makedirs(src.parent)
    src.write_text("hello")
    transfer.transfer(str(src), str(tmp_path / "dst" / "a.txt"))
    assert (tmp_path / "dst" / "a.txt").read_text() == "hello"
    transfer.transfer(str(tmp_path / "src"), str(tmp_path / "dst2"))
    assert (tmp_path / "dst2" / "a.txt").read_text() == "hello"


def test_remote_transfer_commands():
    cmd = transfer.transfer("gs://b/x", "/local", sync=True, dry_run=True)
    assert cmd[0] == "gsutil" and "rsync" in cmd
    cmd = transfer.transfer("s3://b/x", "/local", sync=True, dry_run=True)
    assert cmd[:3] == ["aws", "s3", "sync"]


def test_frame_tar_roundtrip(tmp_path):
    from facebook360_dep_tpu.core import imagetypes, io

    root = tmp_path / "proj"
    for cam_id in ("cam0", "cam1"):
        d = imagetypes.image_dir(str(root), "color", None, cam_id)
        os.makedirs(d)
        io.write_color(os.path.join(d, "000003.png"), np.zeros((4, 4, 3), np.float32))
        io.write_color(os.path.join(d, "000004.png"), np.zeros((4, 4, 3), np.float32))
    tar = transfer.pack_frame_tar(str(root), "000003", str(tmp_path / "f.tar"), ["color"])
    names = transfer.unpack_frame_tar(tar, str(tmp_path / "out"))
    assert sorted(names) == [
        "video/color/cam0/000003.png",
        "video/color/cam1/000003.png",
    ]
    assert os.path.exists(tmp_path / "out" / "video" / "color" / "cam1" / "000003.png")


def test_fleet_dry_run_lifecycle():
    cfg = cluster.ClusterConfig(name="t", workers=2, gcs_root="gs://b/proj")
    fleet = cluster.TpuFleet(cfg, dry_run=True)
    fleet.create()
    fleet.run_render("gs://b/proj/in", "gs://b/proj/out", first=0, last=9, chunk_size=2)
    fleet.terminate()
    plan = fleet.plan()
    assert plan.count("tpu-vm create") == 2
    assert "--accelerator-type=v5litepod-8" in plan
    # frame range sharded across the two workers
    assert "--first=000000" in plan and "--last=000004" in plan
    assert "--first=000005" in plan and "--last=000009" in plan
    assert plan.count("tpu-vm delete") == 2


def test_fleet_cli_dry_run(capsys):
    fleet = cluster.main([
        "--workers", "2", "--input_root", "gs://b/in", "--output_root", "gs://b/out",
        "--first", "0", "--last", "3", "--dry_run", "--gcs_root", "gs://b/ws",
    ])
    out = capsys.readouterr().out
    assert "tpu-vm create" in out and "render_pipeline" in out
    assert len(fleet.issued) >= 4


def test_fleet_against_fake_gcloud(tmp_path, monkeypatch):
    """Run the REAL (non-dry-run) fleet lifecycle against a fake gcloud
    binary: create -> deploy -> run_render -> idle-terminate. The fake logs
    every argv and serves /proc/loadavg reads busy-then-idle so the
    auto-terminate clock (config.py:86-87 semantics) actually runs."""
    import os
    import stat
    import sys

    from facebook360_dep_tpu.farm import cluster

    calls = tmp_path / "calls.log"
    counter = tmp_path / "load_calls"
    counter.write_text("0")
    fake = tmp_path / "gcloud"
    fake.write_text(f"""#!/bin/sh
echo "$@" >> {calls}
case "$@" in
  *"cat /proc/loadavg"*)
    n=$(cat {counter}); echo $((n+1)) > {counter}
    if [ "$n" -lt 2 ]; then echo "1.50 1.2 1.0 1/100 42"; else echo "0.01 0.1 0.1 1/100 42"; fi
    ;;
esac
exit 0
""")
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")

    cfg = cluster.ClusterConfig(name="t", workers=2, gcs_root="")
    fleet = cluster.TpuFleet(cfg, dry_run=False)
    fleet.create()
    fleet.deploy(str(tmp_path))
    fleet.run_render("gs://in", "gs://out", first=0, last=3, chunk_size=1)

    # busy worker (load 1.5) resets the idle clock; after it drops to 0.01
    # for idle_minutes the fleet terminates
    import time as _time

    t0 = _time.time()
    fleet.monitor_and_terminate(poll_s=0, idle_minutes=0.002)
    assert _time.time() - t0 < 30

    logged = calls.read_text().splitlines()
    assert sum("tpu-vm create t-w0" in l for l in logged) == 1
    assert sum("tpu-vm create t-w1" in l for l in logged) == 1
    # each worker got a deploy ssh and a render ssh with its frame shard
    assert any("render_pipeline" in l and "--first=000000 --last=000001" in l for l in logged)
    assert any("render_pipeline" in l and "--first=000002 --last=000003" in l for l in logged)
    # idle polling happened more than once (busy -> idle transition)
    assert sum("cat /proc/loadavg" in l for l in logged) >= 4
    # and the fleet was deleted
    assert sum("tpu-vm delete t-w0 --quiet" in l.replace("  ", " ") or "delete t-w0" in l for l in logged) == 1
    assert any("delete t-w1" in l for l in logged)
