"""Persistent XLA compilation cache.

First compiles of the large fused programs take tens of minutes through this
box's remote-compile tunnel; the persistent cache makes every subsequent
process (benchmarks, CLI, driver runs) reuse the compiled binaries.
"""
from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(directory: str | None = None):
    d = directory or os.environ.get("STYLETTS_JAX_CACHE", DEFAULT_DIR)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return d
