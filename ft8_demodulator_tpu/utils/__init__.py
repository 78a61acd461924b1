"""Utilities: metrics, profiling."""

from .metrics import SlotMetrics, summarize_slot
from .profiling import time_jitted, trace

__all__ = ["SlotMetrics", "summarize_slot", "time_jitted", "trace"]
