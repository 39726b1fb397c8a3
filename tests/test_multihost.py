"""Multi-host (multi-controller) JAX: two separate OS processes form one
global mesh via ``jax.distributed`` and run a cross-process collective —
the TPU-pod execution model (SURVEY.md §5.8) exercised on CPU+gloo."""

import os
import socket
import subprocess
import sys
import time

import pytest

from facebook360_dep_tpu.parallel import multihost

CHILD = r"""
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
from facebook360_dep_tpu.parallel import multihost
import argparse
p = argparse.ArgumentParser()
multihost.add_flags(p)
args = p.parse_args()
ok = multihost.maybe_initialize(args)
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
assert ok and jax.process_count() == 2, (ok, jax.process_count())
assert len(jax.devices()) == 2 and len(jax.local_devices()) == 1
mesh = multihost.global_camera_mesh()
assert mesh.devices.size == 2
# cross-process ICI-analog collective: psum over the camera axis
f = jax.jit(jax.shard_map(lambda x: jax.lax.psum(x, "cam"),
                          mesh=mesh, in_specs=P("cam"), out_specs=P()))
x = jnp.arange(4.0).reshape(2, 2)
gx = jax.make_array_from_callback((2, 2), NamedSharding(mesh, P("cam")), lambda i: x[i])
out = f(gx)
expect = [[2.0, 4.0]]
got = out.addressable_shards[0].data.tolist()
assert got == expect, got
print("MULTIHOST_OK", jax.process_index())
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_mesh_psum(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ, PYTHONPATH="/root/repo")
    procs = []
    for pid in (0, 1):
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script), "--coordinator_address", coord,
                 "--num_processes", "2", "--process_id", str(pid)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
        time.sleep(1.0)  # let the coordinator bind first
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=150)
        assert p.returncode == 0, f"proc {i} rc={p.returncode}:\n{err[-2000:]}"
        assert f"MULTIHOST_OK {i}" in out


def test_single_host_is_noop():
    class Args:
        coordinator_address = ""
        num_processes = -1
        process_id = -1

    assert multihost.maybe_initialize(Args()) is False


def test_initialize_wiring(monkeypatch):
    """Flag values reach jax.distributed.initialize verbatim."""
    import jax

    calls = {}
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: calls.update(kw)
    )
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "local_devices", lambda: [None])
    monkeypatch.setattr(multihost, "_initialized", False)

    class Args:
        coordinator_address = "10.0.0.1:1234"
        num_processes = 4
        process_id = 3

    assert multihost.maybe_initialize(Args()) is True
    assert calls == {
        "coordinator_address": "10.0.0.1:1234",
        "num_processes": 4,
        "process_id": 3,
    }
    # idempotent second call does not re-init
    calls.clear()
    assert multihost.maybe_initialize(Args()) is True
    assert calls == {}
    monkeypatch.setattr(multihost, "_initialized", False)
