"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment pins JAX_PLATFORMS=axon via sitecustomize, so plain env vars
are overridden; use jax.config before the backend initializes instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.device_count() == 8, jax.devices()
