"""Test configuration: force an 8-virtual-device CPU platform BEFORE any
backend initialization so multi-device sharding (data-parallel step,
cross-replica batch norm) is exercised without TPU hardware.

The environment's sitecustomize pins JAX_PLATFORMS to the TPU tunnel, so a
plain env override is not enough — use jax.config, which wins as long as no
backend has been created yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
