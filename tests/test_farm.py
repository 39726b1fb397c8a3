"""Farm runner tests: chunking, missing-chunk resume, retry semantics."""

import os

import pytest

from facebook360_dep_tpu.farm import runner


def test_chunk_frames():
    chunks = runner.chunk_frames(0, 9, 4)
    assert [(c.first, c.last) for c in chunks] == [(0, 3), (4, 7), (8, 9)]
    assert chunks[0].name == "000000_000003"
    assert chunks[2].frames() == ["000008", "000009"]


def test_resume_skips_complete_chunks(tmp_path):
    ran = []

    def outputs(chunk):
        return [str(tmp_path / f"{chunk.name}.out")]

    def run(chunk):
        ran.append(chunk.name)
        (tmp_path / f"{chunk.name}.out").write_text("done")

    stage = runner.Stage(name="s", outputs=outputs, run=run)
    chunks = runner.chunk_frames(0, 5, 2)
    pipeline = runner.Pipeline(workers=1)
    pipeline.run_stage(stage, chunks)
    assert len(ran) == 3
    # second run: everything cached (pipeline.py:120-171 semantics)
    pipeline.run_stage(stage, chunks)
    assert len(ran) == 3
    # delete one output -> only that chunk reruns
    os.unlink(tmp_path / "000002_000003.out")
    pipeline.run_stage(stage, chunks)
    assert ran.count("000002_000003") == 2


def test_retry_then_fail(tmp_path):
    attempts = {"n": 0}

    def outputs(chunk):
        return [str(tmp_path / "never.out")]

    def run(chunk):
        attempts["n"] += 1
        raise ValueError("boom")

    stage = runner.Stage(name="s", outputs=outputs, run=run)
    pipeline = runner.Pipeline(workers=1, max_retries=2)
    with pytest.raises(RuntimeError, match="exhausted retries"):
        pipeline.run_stage(stage, runner.chunk_frames(0, 0, 1))
    assert attempts["n"] == 3  # initial + 2 retries


def test_flaky_chunk_recovers(tmp_path):
    """At-least-once: a transient failure is requeued and succeeds."""
    state = {"fails_left": 1}

    def outputs(chunk):
        return [str(tmp_path / f"{chunk.name}.out")]

    def run(chunk):
        if state["fails_left"] > 0:
            state["fails_left"] -= 1
            raise ValueError("transient")
        (tmp_path / f"{chunk.name}.out").write_text("done")

    stage = runner.Stage(name="s", outputs=outputs, run=run)
    runner.Pipeline(workers=1, max_retries=2).run_stage(stage, runner.chunk_frames(0, 0, 1))
    assert (tmp_path / "000000_000000.out").exists()


def test_python_module_command():
    argv = runner.python_module_command("derp_cli", {"input_root": "/a", "first": "000000"})
    assert argv[-2:] == ["--input_root=/a", "--first=000000"]
    assert "facebook360_dep_tpu.cli.derp_cli" in argv


# ---- cross-process broker (farm.broker + farm.worker) -----------------------

import json
import signal
import subprocess
import sys
import time

from facebook360_dep_tpu.farm import broker


def _spawn_worker(queue_dir, worker_id, once=True, max_retries=1):
    env = dict(os.environ, PYTHONPATH="/root/repo")
    argv = [
        sys.executable, "-m", "facebook360_dep_tpu.farm.worker",
        "--queue_dir", str(queue_dir), "--worker_id", worker_id,
        "--max_retries", str(max_retries),
    ]
    if once:
        argv.append("--once")
    return subprocess.Popen(argv, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)


def test_broker_two_workers_split_jobs(tmp_path):
    """Two separate worker PROCESSES drain one queue; each job runs exactly
    once (atomic rename claim = RabbitMQ prefetch-1 + ack)."""
    q = broker.FileQueue(str(tmp_path / "q"))
    out = tmp_path / "out"
    out.mkdir()
    for i in range(6):
        q.publish(
            f"job{i}",
            {"argv": [sys.executable, "-c",
                      f"open(r'{out}/j{i}', 'w').write('x')"]},
        )
    w1 = _spawn_worker(tmp_path / "q", "w1")
    w2 = _spawn_worker(tmp_path / "q", "w2")
    q.await_drain(expected_done=6, timeout=60, no_worker_timeout=30)
    w1.wait(timeout=30)
    w2.wait(timeout=30)
    for i in range(6):
        assert (out / f"j{i}").exists()
    # every job acked exactly once, results carry the worker id
    done = sorted(os.listdir(tmp_path / "q" / "done"))
    assert len(done) == 6
    workers = set()
    for fn in done:
        with open(tmp_path / "q" / "done" / fn) as f:
            workers.add(json.load(f)["result"]["worker"])
    assert workers <= {"w1", "w2"}


def test_worker_sigkilled_mid_chunk_is_requeued(tmp_path):
    """Fault injection (VERDICT #7): SIGKILL a worker while it holds a chunk;
    the master's lease expiry requeues it and another worker completes it
    (reference reject-requeue, worker.py:458-481)."""
    q = broker.FileQueue(str(tmp_path / "q"))
    out = tmp_path / "done_marker"
    q.publish(
        "slowjob",
        {"argv": [sys.executable, "-c",
                  f"import time; time.sleep(120); open(r'{out}', 'w').write('x')"]},
    )
    victim = _spawn_worker(tmp_path / "q", "victim", once=False)
    # wait until the victim has claimed the job
    deadline = time.time() + 30
    claimed_dir = tmp_path / "q" / "claimed"
    while time.time() < deadline and not os.listdir(claimed_dir):
        time.sleep(0.05)
    assert os.listdir(claimed_dir), "worker never claimed the job"
    victim.kill()  # SIGKILL mid-chunk
    victim.wait(timeout=30)
    # lease expires -> master requeues
    time.sleep(1.2)
    requeued = q.requeue_stale_claims(lease=1.0)
    assert requeued == ["slowjob"]
    # message survives with its payload; repoint it at a fast command and
    # let a fresh worker finish it
    with open(tmp_path / "q" / "queue" / "slowjob.json", "r+") as f:
        msg = json.load(f)
        msg["argv"] = [sys.executable, "-c", f"open(r'{out}', 'w').write('x')"]
        f.seek(0); json.dump(msg, f); f.truncate()
    rescuer = _spawn_worker(tmp_path / "q", "rescuer")
    q.await_drain(expected_done=1, timeout=60, no_worker_timeout=30, lease=3600)
    rescuer.wait(timeout=30)
    assert out.exists()
    with open(tmp_path / "q" / "done" / "slowjob.json") as f:
        assert json.load(f)["result"]["worker"] == "rescuer"


def test_failed_job_requeued_then_parked(tmp_path):
    """A deterministically failing job is retried max_retries times then
    parked in failed/ and surfaces as a master error."""
    q = broker.FileQueue(str(tmp_path / "q"))
    q.publish("bad", {"argv": [sys.executable, "-c", "raise SystemExit(3)"]})
    w = _spawn_worker(tmp_path / "q", "w", once=True, max_retries=1)
    w.wait(timeout=60)
    # --once exits when queue is empty; run again for the requeued attempt
    w2 = _spawn_worker(tmp_path / "q", "w", once=True, max_retries=1)
    w2.wait(timeout=60)
    with pytest.raises(RuntimeError, match="failed permanently"):
        q.await_drain(expected_done=1, timeout=10, no_worker_timeout=5)
    with open(tmp_path / "q" / "failed" / "bad.json") as f:
        msg = json.load(f)
    assert msg["attempts"] == 2 and "rc=3" in msg["last_error"]


def test_master_watchdog_no_workers(tmp_path):
    """pipeline.py:238-246: master aborts when no worker shows up."""
    q = broker.FileQueue(str(tmp_path / "q"))
    q.publish("lonely", {"argv": ["true"]})
    with pytest.raises(RuntimeError, match="no live workers"):
        q.await_drain(expected_done=1, timeout=30, no_worker_timeout=0.5)


def test_distributed_pipeline_end_to_end(tmp_path):
    """DistributedPipeline master + real worker processes: publish, drain,
    then resume-skip on rerun."""
    out = tmp_path / "out"
    out.mkdir()

    def outputs(chunk):
        return [str(out / f"{chunk.name}.txt")]

    def command(chunk):
        return [sys.executable, "-c",
                f"open(r'{out}/{chunk.name}.txt', 'w').write('ok')"]

    stage = runner.Stage(name="write", outputs=outputs, command=command)
    chunks = runner.chunk_frames(0, 7, 2)
    master = runner.DistributedPipeline(
        str(tmp_path / "q"), no_worker_timeout=30, stage_timeout=60
    )
    w = _spawn_worker(tmp_path / "q" / "write", "w1")
    master.run([stage], chunks)
    w.wait(timeout=30)
    assert sorted(os.listdir(out)) == [f"{c.name}.txt" for c in chunks]
    # rerun with no workers alive: all cached, publishes nothing, returns fast
    master.run([stage], chunks)


def test_render_pipeline_selects_distributed_master(tmp_path, monkeypatch):
    """--queue_dir flips the orchestrator into broker-master mode
    (reference render.py master role)."""
    from facebook360_dep_tpu.cli import render_pipeline
    from facebook360_dep_tpu.core import camera as cam
    from facebook360_dep_tpu.render import synthetic

    root = tmp_path / "proj"
    (root / "rigs").mkdir(parents=True)
    rig = synthetic.make_test_rig(num_cameras=2, resolution=(16, 12))
    cam.save_rig(str(root / "rigs/rig_calibrated.json"), rig)

    created = {}

    class FakeDist:
        def __init__(self, queue_root, force_recompute=False, no_worker_timeout=None):
            created.update(queue_root=queue_root, nwt=no_worker_timeout)

        def run(self, stages, chunks):
            created["stages"] = [s.name for s in stages]
            created["chunks"] = len(chunks)

    monkeypatch.setattr(runner, "DistributedPipeline", FakeDist)
    render_pipeline.main([
        "--input_root", str(root), "--output_root", str(root / "out"),
        "--first", "000000", "--last", "000003", "--chunk_size", "2",
        "--queue_dir", str(tmp_path / "q"), "--no_worker_timeout", "7",
    ])
    assert created["queue_root"] == str(tmp_path / "q")
    assert created["nwt"] == 7.0
    assert created["chunks"] == 2
    assert any("depth" in s for s in created["stages"]), created["stages"]


def test_dotted_worker_id_parses_jobs_correctly(tmp_path):
    """ADVICE r2 (medium): worker ids default to os.uname().nodename, often a
    dotted FQDN. Claim filenames are '.'-separated, so dots in the worker id
    used to corrupt the job name extracted by ack/requeue."""
    q = broker.FileQueue(str(tmp_path / "q"))
    q.publish("jobA", {"argv": ["true"]})
    claim = q.claim("host.sub.example.com")
    assert claim is not None
    path, msg = claim
    assert msg["job_id"] == "jobA"
    # requeue parses the right job back out of the claim filename
    time.sleep(0.01)
    requeued = q.requeue_stale_claims(lease=0.0)
    assert requeued == ["jobA"]
    assert sorted(os.listdir(tmp_path / "q" / "queue")) == ["jobA.json"]
    # and ack dedupes by job id, not by worker-prefixed name
    path, _ = q.claim("other.host.example.com")
    q.ack(path, {"worker": "other"})
    assert sorted(os.listdir(tmp_path / "q" / "done")) == ["jobA.json"]


def test_stale_done_entries_do_not_satisfy_rerun(tmp_path):
    """ADVICE r2 (medium): a master rerun against a reused queue root must not
    count a previous run's done/ files toward this run's drain."""
    q = broker.FileQueue(str(tmp_path / "q"))
    # previous run left two done entries (one for a job this run re-publishes)
    for stale in ("jobA.json", "jobZ.json"):
        with open(tmp_path / "q" / "done" / stale, "w") as f:
            json.dump({"job_id": stale[:-5]}, f)
    q.publish("jobA", {"argv": ["true"]})  # re-published: stale done cleared
    assert not os.path.exists(tmp_path / "q" / "done" / "jobA.json")
    # the leftover jobZ done file alone must NOT satisfy a jobs=['jobA'] wait
    with pytest.raises(TimeoutError):
        q.await_drain(expected_done=1, timeout=0.5, no_worker_timeout=30,
                      jobs=["jobA"])
    # once a worker acks jobA, the scoped wait completes
    path, _ = q.claim("w1")
    q.ack(path, {"worker": "w1"})
    q.await_drain(expected_done=1, timeout=5, no_worker_timeout=30, jobs=["jobA"])
    # stale failed entries from other jobs are ignored by a scoped wait too
    with open(tmp_path / "q" / "failed" / "jobQ.json", "w") as f:
        json.dump({"job_id": "jobQ"}, f)
    q.await_drain(expected_done=1, timeout=5, no_worker_timeout=30, jobs=["jobA"])
