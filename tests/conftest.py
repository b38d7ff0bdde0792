"""Test harness: force an 8-device CPU platform.

This is the JAX-native "fake backend" for multi-chip tests (SURVEY.md §4): the same
mesh/pjit code that runs on a TPU slice executes on 8 virtual CPU devices.

Note: sitecustomize imports jax at interpreter startup (the axon TPU plugin), so
JAX_PLATFORMS in os.environ is read too late — jax.config.update is required.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
