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
