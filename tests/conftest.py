"""Test configuration.

Default: forces JAX onto a virtual 8-device CPU backend (SURVEY.md §4.3:
distributed tests without a pod). Note: the env var JAX_PLATFORMS is
ignored when the axon TPU plugin is present, so we must use
jax.config.update before any backend is initialized.

Escape hatch: set LOWCUT_TPU_TESTS=1 to keep the real backend (one TPU
chip) — used to assert the hardware fidelity gate (<= 1 LSB @ 24-bit,
BASELINE.md) on the chip itself. Multi-device tests skip themselves when
fewer than 8 devices are visible.
"""

import os

TPU_TESTS = os.environ.get("LOWCUT_TPU_TESTS", "") not in ("", "0")

if not TPU_TESTS:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not TPU_TESTS:
    jax.config.update("jax_platforms", "cpu")


def pytest_collection_modifyitems(config, items):
    """Under LOWCUT_TPU_TESTS, skip tests that need >= 8 devices."""
    if not TPU_TESTS:
        return
    import pytest

    if len(jax.devices()) >= 8:
        return
    skip = pytest.mark.skip(reason="needs 8 devices; running on real TPU")
    for item in items:
        if "sharded" in item.nodeid or "distributed" in item.nodeid:
            item.add_marker(skip)
