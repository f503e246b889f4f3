"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
and collective code paths are exercised without TPU hardware.

Note: the environment's sitecustomize registers a TPU backend and pins
JAX_PLATFORMS before pytest starts, so we override via jax.config (which is
honored until the first backend initialization).

Set MERGENET_TPU_TESTS=1 to keep the real TPU backend instead: the
tpu-marked tests (e.g. the MERGENET_TGATHER bit-identity gate in
tests/test_tgather.py) then run on hardware; everything else still passes
but much slower — select with `-m tpu` (see the verify skill)."""

import os

if os.environ.get("MERGENET_TPU_TESTS", "0") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
