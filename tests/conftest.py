"""Test configuration.

Forces JAX onto a virtual 8-device CPU backend (SURVEY.md §4.3: distributed
tests without a pod). Note: the env var JAX_PLATFORMS is ignored when the
axon TPU plugin is present, so we must use jax.config.update before any
backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
