"""Persistent XLA compile-cache setup, shared by every entry point.

Full-frame render and train-step programs take minutes to compile cold on
the tunneled TPU; the persistent cache loads them in seconds. One helper so
the location logic cannot drift between entry points (cli/eval once carried
hand-copied blocks).
"""

from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at the repo-level default.

    Resolution order: explicit argument → ``CVNERF_JAX_CACHE`` env var →
    ``.jax_cache`` next to the package's parent (the repo root in a source
    checkout). Returns the resolved path.
    """
    import jax
    if cache_dir is None:
        cache_dir = os.environ.get(
            "CVNERF_JAX_CACHE",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))),
                ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
