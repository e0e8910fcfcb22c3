"""Persistent XLA compilation cache.

Full-model TPU compiles take 13-20 minutes through this environment's
remote-compile tunnel (CLAUDE.md gotcha #3); the JAX persistent cache
makes every re-compile of an unchanged graph a sub-second disk hit, across
processes (verified on the axon backend: 0.93s -> 0.03s for a probe jit).
Entry points call ``enable()`` before their first compile; safe to call on
any backend and harmless if the config knob is missing.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/hoisdf_tpu_xla")


def enable(cache_dir: str = DEFAULT_DIR, min_compile_secs: float = 5.0) -> bool:
    """Turn on the persistent compilation cache; returns False if this JAX
    build doesn't support it."""
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
        return True
    except Exception:  # noqa: BLE001 — optional acceleration only
        return False
