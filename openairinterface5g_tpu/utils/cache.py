"""Persistent XLA compilation cache helper.

First compiles over the remote-compile tunnel take minutes; the cache
brings warm starts down to seconds.  Call early in any CLI entry point.
"""
from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          path or os.path.join(os.path.dirname(__file__),
                                               "..", "..", ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization only
