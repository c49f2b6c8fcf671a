"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding tests use XLA's
host-platform device virtualization instead, and numeric tests run on CPU
for determinism and float64 support.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU site hook rewrites JAX_PLATFORMS to "axon,cpu"; override the
# config directly (backends are not initialized yet at conftest import).
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE)


requires_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)
