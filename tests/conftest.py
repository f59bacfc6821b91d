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

# the suite is compile-dominated (~20 tests x 45-150 s of XLA CPU compiles,
# 48 min cold on this 1-core box); persist executables so re-runs skip them.
# Separate dir from the TPU cache: test programs never hit the chip.
import perf_tpu  # noqa: E402

perf_tpu.enable_persistent_compilation_cache(
    os.path.join(os.path.expanduser("~"), ".cache", "perf_tpu_xla_cpu_tests"),
    min_compile_secs=0.3)   # test programs compile in many sub-2 s pieces

assert jax.device_count() == 8, jax.devices()
