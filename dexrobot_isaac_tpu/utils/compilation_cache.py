"""Persistent XLA compilation cache setup.

The env step graph is large (26-body FK/CRBA under nested scans); first
compiles take minutes. Enabling jax's persistent compilation cache makes
every subsequent run of the same config near-instant. Called by train.py,
bench.py, and tests' conftest.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".jax_cache",
        ),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization; never fail a run over it
