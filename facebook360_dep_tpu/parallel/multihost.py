"""Multi-host (multi-controller) JAX initialization.

The reference spans hosts with a RabbitMQ farm of independent processes
(``scripts/render/worker.py:532-556``); the TPU-native equivalent for work
that must share one global device mesh (e.g. a rig too large for one slice's
HBM, or frame-sharded solves with a cross-host mismatch all-gather) is
multi-controller JAX: every host runs the same program, calls
``jax.distributed.initialize`` against a shared coordinator, and
``jax.devices()`` then spans the full pod so ``Mesh``/``pjit`` collectives
ride ICI within a slice and DCN across slices (SURVEY.md §5.8).

Enabled per-CLI via ``--coordinator_address host:port --num_processes N
--process_id i`` (or the standard env vars a TPU pod provides). Single-host
runs skip initialization entirely — nothing changes for the 1-chip path.
"""

from __future__ import annotations

import argparse
import logging

log = logging.getLogger("multihost")

_initialized = False


def add_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--coordinator_address",
        default="",
        help="host:port of process 0 for multi-controller JAX (empty = single host)",
    )
    p.add_argument("--num_processes", type=int, default=-1, help="total JAX processes (-1 = auto)")
    p.add_argument("--process_id", type=int, default=-1, help="this process's rank (-1 = auto)")


def maybe_initialize(args=None, **overrides) -> bool:
    """Call ``jax.distributed.initialize`` iff a coordinator is configured.

    Accepts an argparse namespace carrying ``add_flags`` values and/or keyword
    overrides. Returns True if distributed init ran (now or earlier); False
    for the single-host path. Idempotent — CLIs call it unconditionally.
    """
    global _initialized
    coord = overrides.get("coordinator_address") or getattr(args, "coordinator_address", "")
    if not coord:
        return _initialized
    if _initialized:
        return True
    kwargs = {"coordinator_address": coord}
    nproc = overrides.get("num_processes", getattr(args, "num_processes", -1))
    pid = overrides.get("process_id", getattr(args, "process_id", -1))
    if nproc is not None and int(nproc) >= 0:
        kwargs["num_processes"] = int(nproc)
    if pid is not None and int(pid) >= 0:
        kwargs["process_id"] = int(pid)
    import jax

    log.info("jax.distributed.initialize(%s)", kwargs)
    jax.distributed.initialize(**kwargs)
    _initialized = True
    log.info(
        "multi-host up: process %d/%d, %d global / %d local devices",
        jax.process_index(),
        jax.process_count(),
        len(jax.devices()),
        len(jax.local_devices()),
    )
    return True


def global_camera_mesh(axis_name: str = "cam"):
    """A mesh over every device visible across all processes — the multi-host
    extension of ``parallel.sharding.camera_mesh``."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis_name,))


def shutdown() -> None:
    global _initialized
    if _initialized:
        import jax

        jax.distributed.shutdown()
        _initialized = False
