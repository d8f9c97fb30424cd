"""Persistent JAX compilation-cache setup shared by all CLIs.

Full-model compiles take minutes through a remote-TPU tunnel; every
driver-facing entry point pins a persistent cache.  The directory is
derived from the package checkout (repo root) rather than hardcoded, so
the tools work from any checkout path; COBEVT_JAX_CACHE overrides.
"""

from __future__ import annotations

import os


def repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def enable_compilation_cache(subdir: str = ".jax_cache",
                             min_compile_secs: float = 2.0) -> str:
    import jax

    path = os.environ.get("COBEVT_JAX_CACHE") or os.path.join(
        repo_root(), subdir)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
