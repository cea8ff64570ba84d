"""Test harness config: run everything on a virtual 8-device CPU mesh.

TPU access goes through a shared tunnel (the axon PJRT plugin registers itself
in sitecustomize and pins JAX_PLATFORMS=axon, so the env var alone is not
enough — we must flip jax's config after import). Tests must be hermetic and
exercise multi-device sharding, so: 8 virtual CPU devices via XLA_FLAGS, then
force the cpu platform (SURVEY.md §4 test plan, item d).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


def pytest_sessionstart(session):
    assert jax.device_count() == 8, (
        f"expected 8 virtual CPU devices, got {jax.devices()}")


@pytest.fixture(scope="session")
def reference_cfg_dir():
    return os.path.join(REFERENCE_DIR, "config")
