"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated here without TPU hardware; the
driver's dryrun does the same via __graft_entry__.dryrun_multichip.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The sandbox presets JAX_PLATFORMS=axon (remote TPU tunnel) and its
# sitecustomize imports jax at interpreter start, so the env var cannot be
# overridden — flip the platform via jax.config instead. Set
# WHEAT3DGS_TEST_TPU=1 to opt in to running tests on the real TPU.
if not os.environ.get("WHEAT3DGS_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)
# Persistent compile cache: raster compiles dominate test wall time otherwise.
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache", "cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (full suite; ~18 min)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long interpret-mode kernel / end-to-end tests "
        "(skipped by default; enable with --runslow or "
        "WHEAT3DGS_FULL_TESTS=1)")


def pytest_collection_modifyitems(config, items):
    import pytest

    if config.getoption("--runslow") or os.environ.get(
            "WHEAT3DGS_FULL_TESTS"):
        return
    skip = pytest.mark.skip(reason="slow: use --runslow for the full suite")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
