"""Platform selection helper.

Some environments register JAX plugins at interpreter startup (via
sitecustomize) and call ``jax.config.update("jax_platforms", ...)``, which
silently overrides the user's ``JAX_PLATFORMS`` environment variable. CLI
entry points call :func:`respect_jax_platforms_env` first so the env var
behaves the way JAX documents it.
"""

from __future__ import annotations

import os


def respect_jax_platforms_env() -> None:
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    import jax

    if jax.config.jax_platforms != env:
        jax.config.update("jax_platforms", env)
