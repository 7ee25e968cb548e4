"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's test strategy of exercising all collective paths
with mpirun -np 1..4 on one box (/root/reference/CMakeLists.txt:851-910):
correctness must hold for any device count, and 8 virtual CPU devices
exercise every sharded path without TPU hardware.
"""

import os

# Force the CPU backend: the session environment pins JAX_PLATFORMS to a
# (single-chip, tunneled) TPU whose PJRT plugin registers itself at
# interpreter start and wins over the env var — only a config update after
# import reliably selects CPU (verified: env alone leaves the TPU default).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_DATA = pathlib.Path("/root/reference/test/data")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: exercises compiled paths on attached TPU hardware "
        "(subprocess; auto-skips when no TPU)")


@pytest.fixture(scope="session")
def ref_data_dir():
    if not REFERENCE_DATA.is_dir():
        pytest.skip("reference test data not available")
    return REFERENCE_DATA
