"""Test configuration: force an 8-device virtual CPU mesh for JAX tests.

Multi-device sharding tests run on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``) exactly as SURVEY.md section 4.2
prescribes; real-TPU runs happen only via ``bench.py``.
"""

import os
import sys

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"
TEST_VECTOR_DIR = os.path.join(REFERENCE_ROOT, "test-vectors")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tv_dir():
    if not os.path.isdir(TEST_VECTOR_DIR):
        pytest.skip("reference test-vectors not available")
    return TEST_VECTOR_DIR
