"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device behavior (pjit sharding, collectives, sub-mesh refresh) is tested
without TPU hardware via XLA's host-platform device splitting — the moral
equivalent the reference lacks entirely (it has no tests, SURVEY.md §4).

Must set the env vars before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
