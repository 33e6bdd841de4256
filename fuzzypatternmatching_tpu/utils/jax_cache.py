"""Persistent XLA compilation cache setup.

Search programs at production scale take minutes to compile (especially
through remote-compile relays); caching them across processes makes repeat
CLI invocations start fast.
"""

from __future__ import annotations

import os


def enable_persistent_cache(directory: str | None = None) -> None:
    import jax

    if directory is None:
        directory = os.environ.get(
            "FPM_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "fpm_tpu", "jax"),
        )
    try:
        jax.config.update("jax_compilation_cache_dir", directory)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax without the knobs
