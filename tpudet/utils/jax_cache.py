"""Persistent XLA compilation cache helper.

The env-var spellings are ignored by this jax build, so call this early in
every entry point. Safe to call multiple times.
"""
from __future__ import annotations


def enable_persistent_cache(path: str = '/root/.cache/jax'):
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    except Exception:
        pass
