"""Shared backend-preference resolution for env-switchable compute paths.

Several hot-path ops ship two implementations — a platform-tuned default
(MXU sync matmuls, the fused Pallas waterfall) and a portable/exact one —
selected by an env var with a per-platform default.  The probe is lazy:
``jax.default_backend()`` initialises the platform, which must never
happen at library import time.

Callers layer their own APPLICABILITY checks on top of the preference
(e.g. ops/waterfall_pallas.py ``fused_waterfall_ok`` gates on geometry
VMEM fit); this helper only answers "what does the user/platform want".
"""

from __future__ import annotations

__all__ = ["resolve_backend"]


def resolve_backend(env_value: str, accel_default: str, cpu_default: str,
                    allowed: tuple[str, ...] | None = None) -> str:
    """env override if set, else per-platform default (CPU vs anything
    else); `cpu_default` also covers the no-backend-available case.

    `allowed` (recommended) validates the override: a typo like
    ``FT8_SYNC_BACKEND=mxuu`` or a stray trailing space would otherwise
    silently fail every downstream equality check and fall back to the
    other backend, defeating the override the operator thought they set
    (ADVICE r4).  Whitespace is stripped; unknown values raise.
    """
    env_value = env_value.strip()
    if env_value:
        if allowed is not None and env_value not in allowed:
            raise ValueError(
                f"unknown backend override {env_value!r}: expected one of "
                f"{sorted(allowed)}")
        return env_value
    try:
        import jax
        plat = jax.default_backend()
    except Exception:
        return cpu_default
    return cpu_default if plat == "cpu" else accel_default
