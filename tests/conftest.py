"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
and collective code paths are exercised without TPU hardware.

Note: the environment's sitecustomize registers a TPU backend and pins
JAX_PLATFORMS before pytest starts, so we override via jax.config (which is
honored until the first backend initialization)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
