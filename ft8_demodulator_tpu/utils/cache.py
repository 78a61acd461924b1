"""Persistent XLA compilation cache.

Every test session and benchmark run re-traces the same fixed-shape
programs; without a persistent cache XLA recompiles them from scratch
each time — minutes per program on this image's single CPU core, and
multi-minute remote compiles for large programs on the tunneled TPU
backend.  Pointing JAX's compilation cache at a directory makes the
second run of ANY identical program load in milliseconds.

Wired into tests/conftest.py, bench.py, and the benchmarks/ entry
points.  The directory defaults to `.jax_cache/` at the repo root
(gitignored) and can be moved with FT8_JAX_CACHE_DIR; FT8_JAX_CACHE=0
disables it.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache() -> str | None:
    """Turn on the persistent compile cache; returns the directory."""
    if os.environ.get("FT8_JAX_CACHE", "1") == "0":
        return None
    import jax

    path = os.environ.get("FT8_JAX_CACHE_DIR", _DEFAULT)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that took meaningful compile time
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path


def select_platform() -> None:
    """Honour FT8_PLATFORM before any backend initialisation.

    The axon TPU plugin ignores the JAX_PLATFORMS env var, and a wedged
    tunnel makes device init hang indefinitely — a benchmark that meant
    to run on CPU instead blocks forever.  FT8_PLATFORM=cpu routes the
    process to the host backend via jax.config (the only override the
    plugin respects); unset keeps the default (TPU when healthy).
    """
    plat = os.environ.get("FT8_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def setup() -> None:
    """Benchmark-entry preamble: platform override + compile cache.

    One call replaces the select_platform()/enable_compilation_cache()
    pair every benchmark needs — forgetting select_platform reintroduces
    the indefinite hang on a wedged TPU tunnel.
    """
    select_platform()
    enable_compilation_cache()
