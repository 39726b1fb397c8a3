"""Pin host-side math to the CPU backend.

Some subsystems are host-side solves on tiny data — calibration bundle
adjustment (the reference runs Ceres in double on the CPU,
``calibration/GeometricCalibration.cpp``), feature matching, rig tools,
test-fixture rendering. Tracing those through the accelerator wastes
compile time on dozens of tiny kernels and, for float64 work, targets
hardware without native double support. ``on_host`` routes uncommitted
(numpy-input) computations to CPU without touching committed device arrays,
so the depth/render hot paths keep running on the TPU in the same process.
"""

from __future__ import annotations

import functools

import jax


def cpu_device():
    return jax.devices("cpu")[0]


def on_host(fn):
    """Decorator: run ``fn``'s JAX ops on the CPU backend."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_device(cpu_device()):
            return fn(*args, **kwargs)

    return wrapper
