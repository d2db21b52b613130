"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device behavior (pjit sharding, collectives, sub-mesh refresh) is tested
without TPU hardware via XLA's host-platform device splitting — the moral
equivalent the reference lacks entirely (it has no tests, SURVEY.md §4).

Must set the env vars before jax is imported anywhere.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (a real TPU
# behind a tunnel), and sitecustomize's axon register() additionally calls
# jax.config.update("jax_platforms", "axon,cpu") at interpreter startup,
# overriding the env var. Tests must never touch the TPU tunnel: override the
# env AND re-update the config after import (backends initialize lazily, so
# this takes effect as long as nothing called jax.devices() yet).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, not the axon TPU tunnel"
)
assert jax.device_count() == 8, "expected 8 virtual CPU devices"

import pytest  # noqa: E402

# Modules whose tests form the <2-minute core subset (pure functions, small
# jits): run with `pytest -m fast`. The excluded modules drive full train
# loops / decoders on the 8-device mesh and dominate the ~20-minute suite.
FAST_MODULES = {
    "test_foundations.py",
    "test_losses.py",
    "test_postprocess.py",
    "test_native.py",
    "test_mips.py",
    "test_index.py",
    "test_engine_unit.py",
    "test_checkpointing.py",
    "test_convert.py",
    "test_fid_attention.py",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "fast: quick core subset (select with -m fast)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.fspath.basename in FAST_MODULES:
            item.add_marker(pytest.mark.fast)
