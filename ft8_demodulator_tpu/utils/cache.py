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


def ensure_live_backend(timeout_s: float | None = None) -> str | None:
    """Fall back to the CPU backend if TPU device init would hang.

    A wedged axon tunnel makes ``jax.devices()`` block INDEFINITELY (not
    slowly — observed >1 h), so an unattended benchmark run dies with the
    tunnel.  This probes device init in a SUBPROCESS with a timeout long
    enough for a healthy cold start (first tunneled init is 3–4 min;
    default 360 s, FT8_TPU_PROBE_TIMEOUT overrides) and, on timeout or
    failure, routes THIS process to the CPU backend.  Returns a
    human-readable note when the fallback fired, else None.  No-op when
    FT8_PLATFORM is already set (the caller chose a backend) or
    FT8_TPU_PROBE=0.

    Known cost: on a HEALTHY tunnel the probe subprocess pays the full
    cold device init (~3–4 min) and the parent then re-initialises from
    scratch (tunnel sessions are per-process, nothing can be handed
    over) — accepted for an unattended once-per-round benchmark, where a
    wedged-tunnel hang loses the round's numbers entirely.  Interactive
    runs that know the tunnel is fine can skip it with FT8_TPU_PROBE=0.
    """
    if os.environ.get("FT8_PLATFORM") or \
            os.environ.get("FT8_TPU_PROBE", "1") == "0":
        return None
    import subprocess
    import sys

    if timeout_s is None:
        timeout_s = float(os.environ.get("FT8_TPU_PROBE_TIMEOUT", "360"))
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "raise SystemExit(0 if d else 1)"],
            timeout=timeout_s, capture_output=True)
        if r.returncode == 0:
            return None
        reason = f"device init failed (rc {r.returncode})"
    except subprocess.TimeoutExpired:
        reason = f"device init hung > {timeout_s:.0f} s (wedged tunnel)"
    import jax

    jax.config.update("jax_platforms", "cpu")
    return f"TPU backend unavailable — {reason}; ran on CPU instead"


def setup() -> None:
    """Benchmark-entry preamble: platform override + compile cache.

    One call replaces the select_platform()/enable_compilation_cache()
    pair every benchmark needs — forgetting select_platform reintroduces
    the indefinite hang on a wedged TPU tunnel.
    """
    select_platform()
    enable_compilation_cache()
