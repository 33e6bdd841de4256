"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; sharding tests validate against
8 virtual CPU devices (the driver separately dry-runs the multi-chip path).

Note: this box's sitecustomize imports jax at interpreter start (axon TPU
plugin), so plain env vars are captured too early — use jax.config.update.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
