"""Test config: 8 virtual CPU devices (multi-chip sharding tests run anywhere)
and x64 enabled for camera-math precision tests.

NOTE: this environment force-sets jax_platforms to "axon,cpu" (TPU tunnel)
regardless of JAX_PLATFORMS, so we override the config directly.
"""

import os

# farm-worker subprocesses spawned by the CLIs must also stay on CPU
os.environ["DEP_JAX_PLATFORM"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
