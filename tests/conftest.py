"""Test configuration: force an 8-device virtual CPU mesh for JAX tests.

Multi-device sharding tests run on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``) exactly as SURVEY.md section 4.2
prescribes; real-TPU runs happen only via ``bench.py``.
"""

import os
import sys

# Must be set before jax is imported anywhere. Unconditional: the sandbox
# pins JAX_PLATFORMS=axon (real TPU over a tunnel), which would silently route
# every test op through the tunnel; tests always run on local CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# The sandbox's sitecustomize registers the axon TPU platform at interpreter
# startup and rewrites jax_platforms to "axon,cpu"; env vars alone cannot
# undo that, so pin the config explicitly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The suite is XLA-compile-bound; a persistent cache makes re-runs fast.
_CACHE_DIR = os.path.join(REPO_ROOT, ".jax_compile_cache_tests")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_ROOT = "/root/reference"
TEST_VECTOR_DIR = os.path.join(REFERENCE_ROOT, "test-vectors")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tv_dir():
    if not os.path.isdir(TEST_VECTOR_DIR):
        pytest.skip("reference test-vectors not available")
    return TEST_VECTOR_DIR


# --- two-tier suite: fast (host-path, seconds) vs slow (XLA-compile-bound) --
#
# The slow tier is enumerated by module: everything that jit-compiles real
# device graphs (sharded meshes, MXU/Pallas kernels, succinct/FRI device
# pipelines). `make test-fast` runs `-m "not slow"` (~20 s warm);
# `make test-slow` runs the rest (~4 min warm, ~20 min on a cold compile
# cache); `make test` runs both.

SLOW_MODULES = {
    "test_aggregate.py",
    "test_fri_device.py",
    "test_graft_entry.py",
    "test_keccak.py",
    "test_limb_jax.py",
    "test_ntt_large.py",
    "test_ntt_mxu.py",
    "test_ntt_mxu_q45.py",
    "test_ntt_pallas.py",
    "test_pipeline.py",
    "test_pipeline_sharded.py",
    "test_quotient_pallas.py",
    "test_ring_mxu.py",
    "test_ring_pallas.py",
    "test_service.py",
    "test_sharded.py",
    "test_stream.py",
    "test_succinct.py",
    "test_succinct_batch.py",
    "test_zk.py",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: XLA-compile-bound device-path tests"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
