"""Test harness config: run everything on a virtual 8-device CPU mesh.

TPU access goes through a shared tunnel; tests must be hermetic and exercise
multi-device sharding, so we force the CPU backend with 8 virtual devices
before JAX initializes (SURVEY.md §4 test plan, item d).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def reference_cfg_dir():
    return os.path.join(REFERENCE_DIR, "config")
