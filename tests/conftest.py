"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding/collective tests use
XLA's host-platform device partitioning, and all numeric kernels are
backend-agnostic (Pallas kernels run in interpreter mode on CPU).
"""

import os

# Force CPU: the session environment pins JAX to the axon TPU tunnel, which
# has ~25ms/dispatch latency — unusable for eager-mode unit tests.  The axon
# sitecustomize hook force-sets jax_platforms="axon,cpu" at import time, so
# the env var alone is not enough; override via jax.config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs[:8]
