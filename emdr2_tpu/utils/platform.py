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


def enable_compilation_cache(cache_dir: str = None) -> None:
    """Persistent XLA compilation cache for the CLI paths.

    The flagship train step takes ~10 min to compile cold on a v5e; the
    cache cuts warm starts to seconds. Harmless on CPU/tests (entries are
    keyed by program + platform). ``EMDR2_TPU_CACHE=''`` disables.
    """
    env = os.environ.get("EMDR2_TPU_CACHE")
    if env == "":
        return
    if cache_dir is None:
        cache_dir = env or os.path.expanduser("~/.cache/emdr2_tpu/jax")
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
