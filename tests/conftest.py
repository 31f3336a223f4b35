"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on `xla_force_host_platform_device_count`
virtual CPU devices (real hardware is exercised by bench.py, not unit
tests).  NOTE: the environment's sitecustomize imports jax at interpreter
start with JAX_PLATFORMS=axon, so env vars are too late here — we override
through jax.config, which works as long as no backend is initialized yet.
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
