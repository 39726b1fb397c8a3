"""Test config: force an 8-device virtual CPU mesh (multi-chip sharding tests
run everywhere) and enable x64 for camera-math precision tests."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_enable_x64", True)
