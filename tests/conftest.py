"""Test harness: force the virtual 8-device CPU platform.

NOTE: this container's sitecustomize imports jax (axon TPU plugin) before
any test code runs, so JAX_PLATFORMS from os.environ is already frozen —
jax.config.update is the only reliable override. Without it, "CPU" tests
silently run through the remote TPU tunnel and every compile-time constant
fetch costs minutes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", "tests must run on the CPU platform"
