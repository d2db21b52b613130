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

# Three speed tiers (VERDICT r2 item 9 — keep the suite something people
# actually run):
#   `pytest -m fast`        <3 min: pure functions + small jits
#   `pytest` (default)      ~10 min: everything except the multi-process /
#                           full-train-loop modules (marked slow, skipped)
#   `pytest --runslow`      the whole suite (~35 min) — run before shipping
FAST_MODULES = {
    "test_foundations.py",
    "test_losses.py",
    "test_postprocess.py",
    "test_native.py",
    "test_mips.py",
    "test_index.py",
    "test_engine_unit.py",
    "test_checkpointing.py",
}

# Multi-process spawns and full train/refresh loops: minutes each on the
# CPU mesh. Skipped by default; selected with --runslow or -m slow.
SLOW_MODULES = {
    "test_multihost.py",
    "test_e2e_train.py",
    "test_async_refresh.py",
    "test_submesh.py",
    "test_flash_integration.py",   # whole-model flash-vs-XLA train parity
    "test_cli.py",                 # full CLI train loops on the toy world
    "test_recipes.py",             # the shipped bash recipes as subprocesses
}

# Individual long-running tests inside otherwise-default modules
# (durations from `pytest -m "not slow" --durations` on the 8-device mesh).
SLOW_TESTS = {
    "test_unbiased_in_expectation",        # 196s: dropout statistics sweep
    "test_training_improves_accuracy",     # 80s: DPR training loop
    "test_state_checkpoint_roundtrip",     # 51s: DPR train + orbax roundtrip
}


@pytest.fixture(autouse=True)
def _restore_global_jax_config():
    """Undo global jax.config mutations a test makes in-process.

    tests/test_cli.py drives ``emdr2_tpu.tasks.run.main`` in-process, which
    sets ``jax_default_prng_impl`` (default "rbg") for the CLI run. Left
    leaked, every later test in the same pytest process inits params with a
    different PRNG than a fresh interpreter — test_multihost's in-process
    single-host reference then silently diverges from its spawned workers
    (same PRNGKey(0), different impl, ~1% different losses / disjoint
    embeddings). Snapshot + restore around every test keeps such CLI-side
    config local to the test that set it.
    """
    impl = jax.config.jax_default_prng_impl
    yield
    if jax.config.jax_default_prng_impl != impl:
        jax.config.update("jax_default_prng_impl", impl)


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run the slow multi-process/train-loop tests")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "fast: quick core subset (select with -m fast)")
    config.addinivalue_line(
        "markers", "slow: multi-process / full-loop tests "
                   "(skipped unless --runslow or -m slow)")


def pytest_collection_modifyitems(config, items):
    run_slow = (config.getoption("--runslow")
                or "slow" in (config.getoption("-m") or ""))
    skip_slow = pytest.mark.skip(
        reason="slow: select with --runslow or -m slow")
    for item in items:
        base = item.fspath.basename
        if base in FAST_MODULES:
            item.add_marker(pytest.mark.fast)
        if base in SLOW_MODULES or item.name.split("[")[0] in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
            if not run_slow:
                item.add_marker(skip_slow)
